"""Sequence packing for LLM training-data pipelines (SURVEY §2.8
extension surface; no reference counterpart).

Training consumes fixed-length token windows; feeding one short
document per window wastes most of it. The standard fix is to
concatenate documents into a token stream and cut it every ``budget``
tokens ("packing with document concatenation", as in public GPT/T5
data pipelines). ``pack_sequences`` assigns every document its pack:
which window its FIRST token lands in.

Scale shape — the whole point of this operator: a single concatenation
order would be a global sort (one task owns the cumulative sum).
Instead documents hash into ``buckets`` independent streams via an
md5-derived key (engine-reproducible, so the assignment is
oracle-checkable), and each stream packs independently with a
cumulative-sum window partitioned by bucket. ``buckets`` is the
parallelism knob: at 100 TB raise it until one bucket's documents fit
an executor's sort budget (the assignment stays deterministic at any
bucket count; packs never span buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from safedata_pipeline_spark.functions.hashing import md5_slot32


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Assign each document to a fixed-token-budget pack.

    Within its md5 bucket, documents order by ``id_col``; each doc's
    ``start_offset`` is the running token count before it, and its pack
    is ``floor(start_offset / budget)`` — i.e. the training window its
    first token falls into once the bucket's stream is cut every
    ``budget`` tokens. Documents longer than ``budget`` simply span
    multiple windows, as in real packing.

    The token unit defaults to the whitespace proxy. Two real-unit
    alternatives: pass a fitted ``build_vocab`` table (``vocab=``) to
    budget in greedy-encode units (``text.token_count_vocab``), or
    pass any precomputed ``counts=`` table ``(id, n_tokens)`` — e.g.
    ``bpe.bpe_segment(df, merges)`` renamed, the actual
    merge-rank BPE unit — which adds only a doc-keyed join in front of
    the same packing shape. ``vocab`` and ``counts`` are mutually
    exclusive.

    Output: (id, bucket, n_tokens, start_offset, pack_no) — one row
    per document, deterministic at any parallelism.
    """
    if vocab is not None and counts is not None:
        raise ValueError("pass at most one of vocab= or counts=")
    bucket_expr = (
        (md5_slot32(F.col(id_col).cast("string"), 0) % buckets).cast("bigint").alias("bucket")
    )
    if vocab is not None:
        from safedata_pipeline_spark.operators.text import token_count_vocab

        counts = token_count_vocab(df, vocab, text_col, id_col)
    if counts is not None:
        base = df.select(F.col(id_col), bucket_expr).join(
            counts.select(id_col, "n_tokens"), on=id_col, how="inner"
        )
    else:
        t = F.col(text_col)
        toks = F.when(F.trim(t) == "", F.array().cast("array<string>")).otherwise(
            F.split(F.trim(t), "\\s+")
        )
        base = df.select(
            F.col(id_col),
            bucket_expr,
            F.size(toks).cast("bigint").alias("n_tokens"),
        )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        id_col,
        "bucket",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint").alias("start_offset"),
    ).withColumn(
        "pack_no", F.floor(F.col("start_offset") / F.lit(budget)).cast("bigint")
    )


def pack_windows(
    df: DataFrame,
    budget: int = 256,
    buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the per-window token slices a training loader
    actually consumes: one row per (document, window) overlap —
    ``(id, bucket, window_no, start_tok, end_tok)`` where the loader
    copies the doc's tokens[start_tok:end_tok] into bucket-local
    window ``window_no``. ``pack_sequences`` says which window a doc
    STARTS in; this explodes docs longer than ``budget`` across every
    window they span (pack_no == the doc's first window_no).

    Shape: the ``pack_sequences`` assignment + one ``sequence``/
    ``explode`` over each doc's window range — output rows =
    Σ ceil-ish spans, bounded by n_docs + total_tokens/budget. All
    integers, deterministic at any parallelism (oracle-hashable).
    Zero-token documents occupy no window and emit nothing.
    """
    packed = pack_sequences(df, budget, buckets, text_col, id_col).where(
        F.col("n_tokens") > 0
    )
    first_w = F.floor(F.col("start_offset") / F.lit(budget))
    last_w = F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / F.lit(budget))
    staged = packed.select(
        id_col,
        "bucket",
        "n_tokens",
        "start_offset",
        F.sequence(first_w, last_w).alias("__ws"),
    )
    ex = staged.select(
        id_col, "bucket", "n_tokens", "start_offset",
        F.explode("__ws").alias("window_no"),
    )
    return ex.select(
        id_col,
        "bucket",
        F.col("window_no").cast("bigint").alias("window_no"),
        F.greatest(
            F.lit(0), F.col("window_no") * budget - F.col("start_offset")
        ).cast("bigint").alias("start_tok"),
        F.least(
            F.col("n_tokens"), (F.col("window_no") + 1) * budget - F.col("start_offset")
        ).cast("bigint").alias("end_tok"),
    )


def pack_stats(
    df: DataFrame,
    budget: int = 256,
    buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Packing-efficiency summary → 1 row ``(n_docs, total_tokens,
    n_buckets, n_windows, avg_window_fill, wasted_fraction)`` — the
    "how much GPU time does this packing waste" dashboard number.

    With document concatenation, waste only occurs in each bucket
    stream's final partial window: n_windows = Σ_bucket ceil(tokens/
    budget), fill = total/(n_windows·budget). Composes on the
    ``pack_sequences`` assignment (same token counts); one grouped sum
    per bucket + a scalar aggregate.
    """
    packed = pack_sequences(df, budget, buckets, text_col, id_col)
    per_bucket = packed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("toks")
    )
    windows = F.ceil(F.col("toks") / F.lit(float(budget))).cast("bigint")
    agg = per_bucket.select("docs", "toks", windows.alias("w")).agg(
        F.sum("docs").cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("w").cast("bigint").alias("n_windows"),
    )
    cap = F.col("n_windows") * F.lit(budget)
    return agg.select(
        "n_docs",
        "total_tokens",
        "n_buckets",
        "n_windows",
        F.round(F.try_divide(F.col("total_tokens"), cap), 6).alias("avg_window_fill"),
        F.round(F.try_divide(cap - F.col("total_tokens"), cap), 6).alias("wasted_fraction"),
    )
