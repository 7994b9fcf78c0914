"""Streaming twin of ``operators.drift.drift_timeline`` (SURVEY §2.8;
no reference counterpart — the "when did the data change?" monitor as
a Structured Streaming job).

Deployment shape mirrors how drift monitoring actually runs: the
reference distribution is FIT ONCE on history (``fit_reference`` — an
O(bins) fit-parameter table, the same class as one-hot's category
list), then the stream maintains only per-(hour, bin) counts under a
watermark (bounded state: open hours × ≤bins rows). The per-hour KS
against the fixed reference CDF is a FINISHING step over that tiny
state table (``finish_timeline``) — cumulative window functions are
not allowed inside a streaming aggregation, and don't need to be: the
sink table is dashboard-sized.

Equivalence to the batch operator: when the reference is fit on the
same data the stream consumed, ``finish_timeline`` over the drained
counts reproduces ``drift_timeline``'s rows exactly (all-integer
cumulative arithmetic, identical double divisions) — that equality is
the test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROUND_N = 6


def fit_reference(
    df: DataFrame, val_col: str = "value", bins: int = 100
) -> dict:
    """Fit the reference distribution of ``val_col``: global lo/width
    plus the cumulative fraction at each OCCUPIED bin — O(bins) driver
    rows, the broadcastable fit parameters a monitoring job pins at
    deploy time. Returns {"lo", "width", "bins", "cdf": [(bin, cum_frac)]}.
    """
    lohi = df.agg(F.min(val_col).alias("lo"), F.max(val_col).alias("hi")).collect()[0]
    if lohi["lo"] is None:
        return {"lo": 0.0, "width": 1.0, "bins": bins, "cdf": []}
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    width = (hi - lo) / bins or 1.0
    g = (
        df.where(F.col(val_col).isNotNull())
        .select(
            F.least(
                F.floor((F.col(val_col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    counts = sorted((r["b"], r["c"]) for r in g)
    total = sum(c for _, c in counts)
    cdf, run = [], 0
    for b, c in counts:
        run += c
        cdf.append((int(b), run / total))
    pdf = [(int(b), c / total) for b, c in counts]
    return {"lo": lo, "width": width, "bins": bins, "cdf": cdf, "pdf": pdf}


def hourly_bin_counts(
    events: DataFrame,
    lo: float,
    width: float,
    bins: int,
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Per-(hour, bin) counts of ``val_col`` — the ONE aggregation the
    streaming job maintains (groupBy time-window + bin, watermark-
    evictable). Identical expression runs on a batch frame; the
    stream/batch pair is the correctness check."""
    b = F.least(
        F.floor((F.col(val_col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
    )
    return (
        events.where(F.col(val_col).isNotNull())
        .groupBy(F.window(ts_col, "1 hour").alias("w"), b.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("hour_start"), "b", "c"
        )
    )


def finish_timeline(counts: DataFrame, ref: dict) -> DataFrame:
    """Per-hour KS against the fixed reference CDF, from the (hour,
    bin, c) state table → ``(hour_start, n_rows, ks_stat)`` — the same
    output contract as the batch ``drift_timeline``.

    The grid is hours × occupied-reference-bins (both dashboard-sized,
    reference broadcast); each hour's ECDF is a cumulative window over
    ≤bins rows, compared against the reference cumulative fraction at
    the same bin. All counts integer until the final division.
    """
    spark = counts.sparkSession
    refdf = spark.createDataFrame(
        [(b, f) for b, f in ref["cdf"]], "b bigint, ref_cdf double"
    )
    hours = counts.groupBy("hour_start").agg(F.sum("c").alias("nh"))
    grid = hours.crossJoin(F.broadcast(refdf))
    # rename the right side's keys: grid derives from counts, and a
    # raw self-join on shared names trips conflicting-reference
    # resolution when counts is a sink-table view
    c2 = counts.withColumnRenamed("hour_start", "__h").withColumnRenamed("b", "__b")
    j = grid.join(
        c2,
        on=(F.col("hour_start") == F.col("__h")) & (F.col("b") == F.col("__b")),
        how="left",
    ).select(
        "hour_start", "b", "nh", "ref_cdf", F.coalesce("c", F.lit(0)).alias("c")
    )
    w_cum_h = Window.partitionBy("hour_start").orderBy("b")
    cum = j.select(
        "hour_start",
        "nh",
        "ref_cdf",
        F.sum("c").over(w_cum_h).alias("ch"),
    )
    return cum.groupBy("hour_start").agg(
        F.max("nh").cast("bigint").alias("n_rows"),
        F.round(
            F.max(F.abs(F.col("ch") / F.col("nh") - F.col("ref_cdf"))), ROUND_N
        ).alias("ks_stat"),
    )


def finish_timeline_psi(counts: DataFrame, ref: dict, eps: float = 1e-6) -> DataFrame:
    """Per-hour Population Stability Index against the reference
    distribution, from the same (hour, bin, c) state table the KS
    finish consumes → ``(hour_start, n_rows, psi)``. KS answers "did
    the shape move?"; PSI weights the move by magnitude — dashboards
    watch both, and both finish from ONE streaming aggregation.

    Conventions mirror ``operators.drift.psi_drift``: proportions
    clamp to ``eps`` (empty bins contribute finitely), per-bin terms
    round@10 → DECIMAL-sum so the ln-bearing float total is order-
    and engine-independent.
    """
    spark = counts.sparkSession
    refdf = spark.createDataFrame(
        [(b, p) for b, p in ref["pdf"]], "b bigint, ref_p double"
    )
    hours = counts.groupBy("hour_start").agg(F.sum("c").alias("nh"))
    grid = hours.crossJoin(F.broadcast(refdf))
    c2 = counts.withColumnRenamed("hour_start", "__h").withColumnRenamed("b", "__b")
    j = grid.join(
        c2,
        on=(F.col("hour_start") == F.col("__h")) & (F.col("b") == F.col("__b")),
        how="left",
    ).select(
        "hour_start", "nh", "ref_p", F.coalesce("c", F.lit(0)).alias("c")
    )
    pa = F.greatest(F.col("c") / F.col("nh"), F.lit(eps))
    pb = F.greatest(F.col("ref_p"), F.lit(eps))
    contrib = F.round((pa - pb) * F.log(pa / pb), 10).cast("decimal(38,10)")
    return j.groupBy("hour_start").agg(
        F.max("nh").cast("bigint").alias("n_rows"),
        F.round(F.sum(contrib).cast("double"), ROUND_N).alias("psi"),
    )


def stream_hourly_bin_counts(
    spark: SparkSession,
    path_glob: str,
    ref: dict,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """``hourly_bin_counts`` over a file stream: watermark closes each
    hour once event time passes, so state holds only open hours ×
    ≤bins rows — the bounded-state 100 TB posture. Same schema
    normalization as the other event streams (nanos-as-long and NTZ
    vintages both map to TimestampType; watermarks reject NTZ)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path_glob).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(path_glob)
    )
    ts_type = dict(stream.dtypes).get(ts_col)
    if ts_type == "bigint":
        stream = stream.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return hourly_bin_counts(
        stream.withWatermark(ts_col, watermark),
        ref["lo"],
        ref["width"],
        ref["bins"],
        ts_col,
        val_col,
    )


def run_drift_stream_once(
    spark: SparkSession,
    path_glob: str,
    ref: dict,
    table: str = "drift_timeline_stream",
) -> DataFrame:
    """Drain the source through the streaming bin counter into a
    memory table (availableNow), then finish the KS timeline from the
    drained state — the stream-vs-batch twin harness."""
    q = (
        stream_hourly_bin_counts(spark, path_glob, ref)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return finish_timeline(spark.table(table), ref)


def finish_bands(
    counts: DataFrame,
    lo: float,
    width: float,
    probs: tuple = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Per-hour percentile BANDS from the same (hour, bin, c) state
    table the drift monitor streams — p50/p95/p99 dashboards without a
    second streaming aggregation or an approx-sketch whose insertion
    order makes stream and batch disagree.

    Estimator: linear interpolation within the first bin whose
    cumulative count reaches p·n (uniform-within-bin assumption —
    error ≤ one bin width, the binned-KS trade). All-integer
    cumulative arithmetic + the same double finish on stream-drained
    or batch-computed counts → stream == batch EXACTLY, which
    ``tests/test_drift_stream_bands.py`` pins. Output:
    ``(hour_start, n, p50, p95, ...)``.
    """
    w_cum = Window.partitionBy("hour_start").orderBy("b")
    w_h = Window.partitionBy("hour_start")
    cum = counts.select(
        "hour_start",
        "b",
        "c",
        F.sum("c").over(w_cum).alias("ch"),
        F.sum("c").over(w_h).alias("n"),
    )
    aggs = [F.max("n").cast("bigint").alias("n")]
    for p in probs:
        target = F.lit(float(p)) * F.col("n")
        hit = F.col("ch") >= target
        # first qualifying bin: min over (b, cum, c) among hits
        pick = F.min(
            F.when(hit, F.struct(F.col("b"), F.col("ch"), F.col("c")))
        ).alias(f"__pk{int(round(p * 100)):02d}")
        aggs.append(pick)
    g = cum.groupBy("hour_start").agg(*aggs)
    outs = ["hour_start", "n"]
    for p in probs:
        name = f"p{int(round(p * 100)):02d}"
        pk = F.col(f"__pk{name[1:]}")
        frac = (F.lit(float(p)) * F.col("n") - (pk["ch"] - pk["c"])) / pk["c"]
        frac = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
        val = F.lit(lo) + (pk["b"].cast("double") + frac) * F.lit(width)
        outs.append(F.round(val, ROUND_N).alias(name))
    return g.select(*outs)
