from safedata_pipeline_spark.sources.tables import load_table
from safedata_pipeline_spark.streaming import corpus as SC


def test_scored_stream_matches_batch(spark, sf_dir):
    batch = SC.scored_documents(load_table(spark, sf_dir, "documents"))
    expected = {r.doc_id: (r.n_ws_tokens, r.lang_guess, r.content_md5, r.quality)
                for r in batch.collect()}
    streamed = SC.run_scored_stream_once(
        spark, f"{sf_dir}/documents*.parquet", "t_scored_docs"
    )
    got = {r.doc_id: (r.n_ws_tokens, r.lang_guess, r.content_md5, r.quality)
           for r in streamed.collect()}
    assert got == expected and len(got) > 0


def test_scored_stream_threshold_filter(spark, sf_dir):
    streamed = SC.run_scored_stream_once(
        spark, f"{sf_dir}/documents*.parquet", "t_scored_docs_thr", min_quality=0.5
    )
    rows = streamed.collect()
    assert rows and all(r.quality >= 0.5 for r in rows)
    full = SC.run_scored_stream_once(
        spark, f"{sf_dir}/documents*.parquet", "t_scored_docs_full"
    )
    assert len(rows) < full.count()


def test_stream_extract_html_equals_batch(spark, tmp_path):
    """X165 streaming twin: the map-only HTML extraction produces
    bit-identical rows over a file stream and over the same files read
    as a batch."""
    from safedata_pipeline_spark.operators.text import extract_html_text
    from safedata_pipeline_spark.streaming.corpus import run_extract_stream_once

    rows = [
        (1, "<p>alpha beta gamma delta</p><nav><a href='/'>x</a> <a href='/'>y</a></nav>"),
        (2, "<p></p>"),
        (3, "<h1>tiny</h1><p>plain words kept here fine</p>"),
    ]
    src = str(tmp_path / "html_src")
    spark.createDataFrame(rows, "doc_id bigint, html string").write.parquet(src)
    batch = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_total)
        for r in extract_html_text(spark.read.parquet(src)).collect()
        if r.text != ""
    }
    streamed = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_total)
        for r in run_extract_stream_once(spark, src).collect()
    }
    assert streamed == batch and set(batch) == {1, 3}
