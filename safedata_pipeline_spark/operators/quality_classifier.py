"""Trained quality-classifier fit/apply for corpus filtering
(SURVEY §2.8 extension surface; no reference counterpart).

The filter real pretraining pipelines actually run (CCNet, FineWeb-Edu
lineage): a supervised "looks-like-the-reference-corpus" classifier —
fit once on a labeled reference-vs-crawl sample, then applied MAP-ONLY
to the whole crawl. The heuristic scores this engine already computes
(quality blend, LM surprise, repetition, readability) become the
FEATURES; logistic regression turns them into one calibrated keep
score instead of a stack of hand-tuned per-feature thresholds.

Scale shape — the fit/apply split is the whole point at 100 TB:

  * ``text_features``    — one row per doc; each feature column comes
    from an existing map-only/aggregate operator, joined on the id.
  * ``classifier_fit``   — Spark ML LogisticRegression on a labeled
    SAMPLE (the labeled set is small by construction — someone had to
    label it); the model collapses to O(features) driver-side floats.
  * ``classifier_score`` — the fit artifact baked into a pure
    sigmoid(w·x + b) Column expression: scoring 100 TB is scan-bound,
    whole-stage codegen, zero Python, zero shuffles beyond the feature
    joins.

Randomized/iterative fit ⇒ the query is rows-only in the harness; the
discrimination contract is stat-gated instead (held-out AUC recorded
per round in STATS via ``tools/stat_gates.py``, floor in GATES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_N = 6

FEATURE_COLS = [
    "f_quality",
    "f_neg_logprob",
    "f_dup_word",
    "f_top_bigram",
    "f_flesch",
    "f_ws_tokens",
]


def text_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document feature table (id, f_*): the engine's heuristic
    text scores as classifier inputs. NULLs (short/degenerate docs)
    are imputed to 0 HERE so fit and apply see identical features.

    FUSED single-scan shape (the X37 ``text_profile`` discipline): the
    corpus text is read ONCE — a first projection computes every
    map-only feature (quality blend, dup-word fraction, Flesch, token
    count) AND the lowered token array, pinned so the two aggregate
    feature paths (corpus-unigram surprise, per-doc bigram mode) read
    the narrow pinned table instead of re-scanning and re-tokenizing
    the corpus. 2 id-joins reassemble (down from 5 scans + 4 joins).
    Values are bit-identical to the standalone operators — the
    aggregate paths run through the SAME helpers
    (``text._unigram_neg_logprob_per_doc``, ``text._top_bigram_per_doc``)
    and the map expressions mirror ``quality_score`` /
    ``repetition_stats`` / ``readability_scores`` / ``token_count``
    term for term (equality-pinned by
    ``test_text_features_equals_standalone_ops``)."""
    from safedata_pipeline_spark.checkpoint import pin_lazy
    from safedata_pipeline_spark.operators.text import (
        STOPWORDS_EN,
        _count_in,
        _top_bigram_per_doc,
        _unigram_neg_logprob_per_doc,
        _ws_tokens,
    )

    # Tokens materialize FIRST (quality_score's two-step shape: token
    # counts over a captured split re-tokenize per use — measured 3×
    # slower), then every feature reads the materialized arrays.
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        _ws_tokens(F.col(text_col)).alias("__toks"),  # original case
        _ws_tokens(F.lower(F.col(text_col))).alias("__tk"),  # lowered
    )
    t = F.col("__t")
    toks = F.col("__toks")
    n_tok = F.size(toks)
    # quality_score's blend, term for term
    n_stop = _count_in(toks, STOPWORDS_EN)
    length = F.length(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit("[^a-zA-Z0-9\\s]"), F.lit(0)))
    len_score = F.least(length / F.lit(500.0), F.lit(1.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(length > 0, n_punct / length).otherwise(F.lit(0.0))
    quality = F.round(
        F.lit(0.4) * len_score
        + F.lit(0.4) * F.least(F.lit(5.0) * stop_ratio, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio),
        ROUND_N,
    )
    # repetition_stats' dup-word fraction (lowered tokens)
    n_w = F.size(F.col("__tk"))
    n_wd = F.size(F.array_distinct(F.col("__tk")))
    dup_word = F.when(n_w > 0, F.round(F.lit(1.0) - n_wd / n_w, ROUND_N))
    # readability_scores' Flesch, term for term
    n_sent = F.greatest(F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0)), F.lit(1))
    n_syl = F.size(F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), 0))
    flesch = F.when(
        n_tok > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (n_tok.cast("double") / n_sent.cast("double"))
            - F.lit(84.6) * (n_syl.cast("double") / n_tok.cast("double")),
            4,
        ),
    )
    # ONE corpus scan: all map-only features + the lowered token array,
    # pinned so the two aggregate paths below don't re-read the corpus
    staged = base.select(
        F.col(id_col),
        F.col("__tk"),
        quality.alias("f_quality"),
        dup_word.alias("f_dup_word"),
        flesch.alias("f_flesch"),
        n_tok.cast("double").alias("f_ws_tokens"),
    ).transform(pin_lazy)
    ex = staged.select(F.col(id_col), F.explode("__tk").alias("tok"))
    lp = _unigram_neg_logprob_per_doc(ex, id_col).select(
        id_col, F.col("avg_neg_logprob").alias("f_neg_logprob")
    )
    bg = _top_bigram_per_doc(staged, id_col, tk_col="__tk").select(
        id_col, F.col("top_bigram_fraction").alias("f_top_bigram")
    )
    out = staged.drop("__tk").join(lp, id_col, "left").join(bg, id_col, "left")
    return out.select(
        id_col, *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in FEATURE_COLS]
    )


def classifier_fit(
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
    feature_cols: list[str] | None = None,
    max_iter: int = 100,
    reg_param: float = 0.01,
) -> dict:
    """Fit the reference-vs-crawl classifier on labeled rows
    (``labels``: (id, label 0/1), label 1 = looks-like-reference).
    Returns the fit ARTIFACT — a plain dict
    ``{"intercept": float, "coef": {feature: float}}`` — not a model
    object: O(features) floats that serialize into a config, diff in
    code review, and bake into a scoring expression on any engine."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    cols = feature_cols or FEATURE_COLS
    train = features.join(
        labels.select(id_col, F.col(label_col).cast("double").alias("__y")), id_col
    )
    asm = VectorAssembler(inputCols=cols, outputCol="__fv")
    lr = LogisticRegression(
        featuresCol="__fv", labelCol="__y", maxIter=max_iter, regParam=reg_param,
        standardization=True,
    )
    model = lr.fit(asm.transform(train))
    return {
        "intercept": float(model.intercept),
        "coef": {c: float(w) for c, w in zip(cols, model.coefficients)},
    }


def classifier_score(
    features: DataFrame, model: dict, id_col: str = "doc_id"
) -> DataFrame:
    """Map-only apply: (id, clf_score) with score = sigmoid(w·x + b)
    from the fit artifact — a pure codegen expression, the 100 TB
    scoring path."""
    z = F.lit(float(model["intercept"]))
    for c, w in model["coef"].items():
        z = z + F.lit(float(w)) * F.coalesce(F.col(c), F.lit(0.0))
    return features.select(
        id_col, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), ROUND_N).alias("clf_score")
    )


def classifier_auc(
    features: DataFrame, labels: DataFrame, model: dict, id_col: str = "doc_id"
) -> float:
    """Held-out discrimination: exact Mann–Whitney AUC of the scores
    against the labels (``ml_utility.binary_auc``). Driver-side float —
    the stat-gate metric."""
    from safedata_pipeline_spark.operators.ml_utility import binary_auc

    scored = classifier_score(features, model, id_col).join(
        labels.select(id_col, "label"), id_col
    )
    row = binary_auc(scored, "clf_score", F.col("label")).collect()[0]
    return float(row["auc"]) if row["auc"] is not None else float("nan")
