"""Trained character-n-gram language identification.

Multinomial Naive Bayes over sliding character n-grams — the public
Cavnar & Trenkle (1994) n-gram text-categorization construction, the
same feature family fastText-style language identifiers use. Unlike
the marker-stopword heuristic (``text.lang_id``), the model is FIT
from labeled data, so it adapts to whatever languages the labels
carry, and scoring stays a pure column-expression pipeline.

Everything is deterministic (counts + add-one smoothing + fixed
rounding), so fit→score compositions are oracle-checkable end to end
— no rows-only channel needed despite this being a trained model.

100 TB shape:
- ``langid_fit`` runs on the LABELED SAMPLE only (labeled corpora are
  thousands-to-millions of docs, not the 100 TB corpus): two shuffles
  — (lang, ngram) counts and per-lang totals — both map-side
  combinable.
- The fitted model is a few-thousand-row table: ``langid_score``
  BROADCASTS it, so the apply pass over the full corpus is one
  map-only n-gram explode + broadcast join + one (doc, lang) groupBy
  + one per-doc window; the corpus shuffles once on doc_id, text
  never shuffles at all (only n-gram rows, which die in the
  aggregation).
- Per-n-gram log-probs are fixed to 6 decimals and summed as
  DECIMAL(38,6) (exact, order-independent), the same discipline as
  ``text._unigram_neg_logprob_per_doc`` — double-sum ulp drift cannot
  split the argmax across engines.

No reference counterpart (the reference has no language handling);
extension operator in the SURVEY §2.8 inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from safedata_pipeline_spark.partitioning import spread_small

ROUND_N = 6


def _char_ngrams(col, n: int):
    """Array of all length-n sliding substrings of ``col`` (empty when
    the string is shorter than n). Pure expressions — no UDF."""
    cnt = F.length(col) - (n - 1)
    return F.when(
        cnt >= 1,
        F.transform(F.sequence(F.lit(1), cnt), lambda i: F.substr(col, i, F.lit(n))),
    ).otherwise(F.array().cast("array<string>"))


def langid_fit(
    labeled: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
) -> DataFrame:
    """Fit the n-gram NB model from ``(text, lang)`` rows.

    Returns one frame carrying both kinds of parameters:
    ``(lang, ngram, logp)`` — per-(lang, n-gram) smoothed log-prob
    ``round(ln((c+1)/(total_l+V)), 6)`` for observed n-grams, plus one
    floor row per language with ``ngram = NULL`` and
    ``logp = round(ln(1/(total_l+V)), 6)`` — the add-one probability
    of any n-gram UNSEEN for that language. V is the train-corpus
    distinct-n-gram count (shared smoothing denominator)."""
    from safedata_pipeline_spark.checkpoint import pin_lazy

    # spread the gram explode across cores: a small labeled sample
    # often arrives as a handful of input splits, and the explode
    # multiplies each row ~len(text)-fold (no-op once the scan already
    # has >= defaultParallelism splits — never coalesces at scale)
    ex = spread_small(labeled).select(
        F.col(lang_col).alias("lang"),
        F.explode(_char_ngrams(F.lower(F.col(text_col)), n)).alias("ngram"),
    )
    # the (lang, ngram) count table feeds THREE consumers (totals,
    # vocab size, the log-prob join) — pin it so the corpus-side gram
    # explode+shuffle runs once, not once per consumer
    counts = (
        ex.groupBy("lang", "ngram").agg(F.count(F.lit(1)).alias("c")).transform(pin_lazy)
    )
    totals = counts.groupBy("lang").agg(F.sum("c").alias("total"))
    vocab = counts.select("ngram").distinct().agg(F.count(F.lit(1)).alias("v"))
    model = (
        counts.join(totals, "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "ngram",
            F.round(F.log((F.col("c") + 1.0) / (F.col("total") + F.col("v"))), ROUND_N)
            .cast("decimal(38,6)")
            .alias("logp"),
        )
    )
    floors = (
        totals.crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            F.lit(None).cast("string").alias("ngram"),
            F.round(F.log(1.0 / (F.col("total") + F.col("v"))), ROUND_N)
            .cast("decimal(38,6)")
            .alias("logp"),
        )
    )
    return model.unionByName(floors)


def _scored_grid(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str | list[str],
    n: int,
) -> DataFrame:
    """The shared per-(unit, lang) score grid ``langid_score``,
    ``langid_margin`` and ``langid_segments`` aggregate over: gram
    explode → broadcast model join → (unit, lang) partial sums →
    floor fill-in for the unseen grams. One place, so a scoring fix
    can never silently split the argmax from the margin. ``id_col``
    is one column name or a composite key list (the segments path
    scores (doc, paragraph) units). Output: ``(*keys, lang,
    score DECIMAL(38,6))`` — exactly |langs| rows per input unit."""
    keys = [id_col] if isinstance(id_col, str) else list(id_col)
    # spread the explode fan-out across cores (scan splits of a small
    # fixture underestimate the post-explode row count); no-op at scale
    grams = spread_small(df).select(
        *[F.col(k) for k in keys],
        F.explode(_char_ngrams(F.lower(F.col(text_col)), n)).alias("g"),
    )
    # total gram count per doc is just max(len−(n−1), 0) — a column
    # expression, no second explode-aggregate over the corpus
    m = df.select(
        *[F.col(k) for k in keys],
        F.greatest(F.length(F.col(text_col)) - (n - 1), F.lit(0))
        .cast("bigint")
        .alias("m"),
    )
    floors = model.where(F.col("ngram").isNull()).select(
        "lang", F.col("logp").alias("floor_logp")
    )
    mt = model.where(F.col("ngram").isNotNull())
    matched = (
        grams.join(F.broadcast(mt), grams.g == mt.ngram)
        .groupBy(*keys, "lang")
        .agg(F.sum("logp").alias("s"), F.count(F.lit(1)).cast("bigint").alias("mc"))
    )
    zero = F.lit(0).cast("decimal(38,6)")
    return (
        m.crossJoin(F.broadcast(floors))
        .join(matched, [*keys, "lang"], "left")
        .select(
            *keys,
            "lang",
            (
                F.coalesce("s", zero)
                + (F.col("m") - F.coalesce("mc", F.lit(0))) * F.col("floor_logp")
            ).cast("decimal(38,6)").alias("score"),
        )
    )


def langid_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Score every document against the fitted model and pick the
    argmax language. Output: ``(id, lang_pred, score)`` with
    ``score = Σ_observed logp + (m − matched)·floor_l`` summed as
    exact DECIMAL(38,6); ties break on ascending language code (a
    zero-gram doc ties every language at 0 and predicts the first)."""
    scored = _scored_grid(df, model, text_col, id_col, n)
    # argmax as a hash-aggregate struct-min (no per-doc sort): smallest
    # (−score, lang) == highest score, ties broken on ascending lang
    best = scored.groupBy(id_col).agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("lang").alias("l"))).alias(
            "b"
        )
    )
    return best.select(
        id_col,
        F.col("b.l").alias("lang_pred"),
        (-F.col("b.ns")).cast("double").alias("score"),
    )


def langid_margin(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Prediction margin per document: the top language's score minus
    the runner-up's — the ambiguity/code-switching signal production
    language ID pipelines threshold on (a confident monolingual doc
    has a wide margin; mixed-language or too-short docs sit near 0).
    Exact DECIMAL difference of the two scores, so the margin is as
    engine-stable as the argmax itself. Output:
    ``(id, lang_pred, lang_second, margin)``; a single-language model
    yields margin 0 with a NULL runner-up.

    Same grid as ``langid_score`` (shared ``_scored_grid`` builder)
    plus one tiny per-doc array sort: the per-(doc, lang) score grid
    is |langs| rows per doc, so the top-2 selection is a collect_list
    + array_sort over ≤ |langs| elements inside the existing doc-keyed
    aggregate — no extra shuffle, no window."""
    scored = _scored_grid(df, model, text_col, id_col, n)
    ranked = scored.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("score")).alias("ns"), F.col("lang").alias("l")))
        ).alias("r")
    )
    best = F.col("r")[0]
    second = F.when(F.size("r") >= 2, F.col("r")[1])
    return ranked.select(
        id_col,
        best.getField("l").alias("lang_pred"),
        second.getField("l").alias("lang_second"),
        F.coalesce(
            (second.getField("ns") - best.getField("ns")).cast("double"), F.lit(0.0)
        ).alias("margin"),
    )


def langid_segments(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    sep: str = "\n\n",
) -> DataFrame:
    """Document-level language SEGMENT spans: split each document into
    paragraphs (``sep``-delimited, blank paragraphs dropped), predict
    each paragraph's language with the fitted n-gram NB model, then
    merge CONSECUTIVE same-language paragraphs into spans — the
    code-switch localization step production curation runs after
    whole-doc language ID flags a low-margin document (per-paragraph
    fastText is the standard form; same model family here).

    Output: ``(id, seg_idx, lang, start_para, end_para, n_paras)`` —
    one row per maximal same-language run, ``seg_idx`` 1-based in
    document order, ``start_para``/``end_para`` 0-based paragraph
    indices (inclusive). A monolingual document yields one row.

    Shape at 100 TB: the paragraph explode is map-only; scoring is the
    shared ``_scored_grid`` (broadcast model join + (doc, para,
    lang)-keyed partial sums — map-side combinable, text never
    shuffles); the run-merge is the gaps-and-islands construction
    (para_idx − per-(doc, lang) row_number) under windows PARTITIONED
    BY document — no global window, and a document's paragraph count
    bounds every task. Argmax ties break on ascending language code
    (the ``langid_score`` discipline), so spans are engine-stable.
    """
    from pyspark.sql import Window

    keys = [id_col, "para_idx"]
    # \Q...\E-quote the separator: F.split takes a Java REGEX, and a
    # literal separator like "|" or "." would otherwise explode the
    # text at every position (seps containing \E are not supported)
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\\Q" + sep + "\\E")).alias(
            "para_idx", "__para"
        ),
    ).where(F.trim(F.col("__para")) != "")
    scored = _scored_grid(paras, model, "__para", keys, n)
    best = scored.groupBy(*keys).agg(
        F.min(
            F.struct((-F.col("score")).alias("ns"), F.col("lang").alias("l"))
        ).alias("b")
    )
    pred = best.select(*keys, F.col("b.l").alias("lang"))
    # gaps-and-islands: consecutive same-lang paragraphs share
    # (para_idx − per-(doc, lang) sequence number)
    w_lang = Window.partitionBy(id_col, "lang").orderBy("para_idx")
    grp = pred.withColumn("__grp", F.col("para_idx") - F.row_number().over(w_lang))
    segs = grp.groupBy(id_col, "lang", "__grp").agg(
        F.min("para_idx").alias("start_para"),
        F.max("para_idx").alias("end_para"),
        F.count(F.lit(1)).cast("bigint").alias("n_paras"),
    )
    w_doc = Window.partitionBy(id_col).orderBy("start_para")
    return segs.select(
        id_col,
        F.row_number().over(w_doc).alias("seg_idx"),
        "lang",
        "start_para",
        "end_para",
        "n_paras",
    )
