"""HTML → text extraction (text.extract_html_text, X165)."""

from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import text as T


FULL_PAGE = (
    '<html><head><title>Doc 1</title><style>body { color: red; }</style>'
    '<script>var x = 1; if (x > 0) { x = 2; }</script></head><body>'
    '<nav><a href="/">home</a> <a href="/d">docs</a> <a href="/a">about</a></nav>'
    '<h1>Document 1</h1>'
    '<p>alpha beta gamma delta epsilon zeta</p>'
    '<div class="share">share &amp; <a href="#">tweet</a> <a href="#">post</a>'
    ' <a href="#">mail</a></div>'
    '<p>second paragraph with <b>bold</b> and &lt;angle&gt; text here</p>'
    '<footer>&copy; example.com</footer></body></html>'
)


def _extract(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, html string")
    return {r.doc_id: r for r in T.extract_html_text(df).collect()}


def test_full_page_keeps_content_drops_boilerplate(spark):
    got = _extract(spark, [(1, FULL_PAGE)])
    assert got[1].text == (
        "alpha beta gamma delta epsilon zeta\n"
        "second paragraph with bold and <angle> text here"
    )
    assert got[1].n_lines_kept == 2


def test_script_style_comment_content_never_leaks(spark):
    page = (
        "<script>leak one two three four five</script>"
        "<style>leak six seven eight nine ten</style>"
        "<!-- leak eleven twelve thirteen fourteen -->"
        "<p>real content words here</p>"
    )
    got = _extract(spark, [(1, page)])
    assert got[1].text == "real content words here"


def test_inline_tags_do_not_split_words(spark):
    got = _extract(spark, [(1, "<p>fo<b>o</b> bar baz qux</p>")])
    assert got[1].text == "foo bar baz qux"


def test_link_density_drops_link_farms(spark):
    # 4 words 3 anchors -> 0.75 > 0.5 dropped; 6 words 3 anchors = 0.5 kept
    farm = '<p><a href="#">one</a> <a href="#">two</a> <a href="#">three</a> four</p>'
    ok = '<p><a href="#">one</a> <a href="#">two</a> <a href="#">three</a> four five six</p>'
    got = _extract(spark, [(1, farm), (2, ok)])
    assert got[1].text == ""
    assert got[2].text == "one two three four five six"


def test_min_words_drops_short_lines(spark):
    got = _extract(spark, [(1, "<p>two words</p><p>now three words</p>")])
    assert got[1].text == "now three words"


def test_entity_decode_amp_last(spark):
    # &amp;lt; must decode to the literal "&lt;", never to "<"
    got = _extract(spark, [(1, "<p>x &amp;lt; y &nbsp; z</p>")])
    assert got[1].text == "x &lt; y z"


def test_empty_and_tagless_inputs(spark):
    got = _extract(spark, [(1, "<p></p>"), (2, "plain words without any tags")])
    assert got[1].text == "" and got[1].n_lines_kept == 0
    assert got[2].text == "plain words without any tags"
    assert got[2].n_lines_total == 1


def test_pipeline_extract_html_step(spark):
    from safedata_pipeline_spark.corpus_pipeline import CorpusPipeline

    df = spark.createDataFrame(
        [(1, FULL_PAGE, "web"), (2, "<p></p>", "web")],
        "doc_id bigint, html string, source string",
    )
    pipe = CorpusPipeline(df).extract_html()
    assert pipe.funnel == {"input": 2, "html_extract": 1}
    out = pipe.df.collect()
    assert [r.doc_id for r in out] == [1]
    assert "source" in pipe.df.columns and "html" not in pipe.df.columns


# --- URL / domain curation (X171) ------------------------------------------


def test_registered_domain_parsing(spark):
    from safedata_pipeline_spark.operators.text import registered_domain

    rows = [
        (1, "https://www.example.com/path?q=1"),
        (2, "http://user:pw@blog.example.co.uk:8080/x#frag"),
        (3, "example.org"),
        (4, "HTTPS://A.B.Example.COM/"),
        (5, "ftp://deep.sub.site.com.au/file"),
        (6, ""),
        (7, None),
        (8, "https:///nopath"),
        (9, "localhost"),
    ]
    df = spark.createDataFrame(rows, "id bigint, url string")
    got = {
        r.id: r.d
        for r in df.select("id", registered_domain(F.col("url")).alias("d")).collect()
    }
    assert got[1] == "example.com"
    assert got[2] == "example.co.uk"   # multi-label suffix + userinfo + port
    assert got[3] == "example.org"     # bare host, no scheme
    assert got[4] == "example.com"     # case folded, subdomains collapsed
    assert got[5] == "site.com.au"
    assert got[6] is None and got[7] is None and got[8] is None
    assert got[9] is None  # dotless host has no registrable domain


def test_domain_stats_and_blocklist_filter(spark):
    from safedata_pipeline_spark.operators.text import domain_stats, filter_domains

    df = spark.createDataFrame(
        [
            (1, "https://www.spam.com/a"),
            (2, "https://blog.spam.com/b"),
            (3, "https://good.org/c"),
            (4, "not a url at all ::"),
        ],
        "doc_id bigint, url string",
    )
    stats = {r.domain: (r.n_docs, r.share) for r in domain_stats(df).collect()}
    assert stats["spam.com"] == (2, round(2 / 3, 6))  # subdomains aggregate
    assert stats["good.org"][0] == 1
    kept = {r.doc_id for r in filter_domains(df, ["spam.com"]).collect()}
    assert kept == {3, 4}  # both spam subdomains drop; unparseable kept
    kept2 = {
        r.doc_id
        for r in filter_domains(df, ["spam.com"], keep_unparseable=False).collect()
    }
    assert kept2 == {3}
    # DataFrame blocklist path (broadcast anti-join)
    bl = spark.createDataFrame([("spam.com",)], "domain string")
    kept3 = {r.doc_id for r in filter_domains(df, bl).collect()}
    assert kept3 == {3, 4}
