"""Distribution-drift operators (SURVEY §2.7 U1–U3).

Behavior parity targets (reference: /root/reference/modules/utility.py):
  * ``ks_statistic``       — utility.py:92-97 (scipy ks_2samp two-sample
                             statistic; NaN→NULL when either side has
                             <5 non-null values)
  * ``chi2_categorical``   — utility.py:99-110 (align category counts,
                             Σ (oa-ob)²/(oa+ob+1e-9); nulls → "NA";
                             NULL when either side is empty)
  * ``distribution_drift`` — utility.py:112-123 (per shared column:
                             numeric → KS, else → chi²)

KS construction (no Spark builtin is two-sample): tag both sides, group
by value (ties merge, so the ECDF is evaluated at distinct points — the
window then runs over |distinct values| rows, not |rows|), cumulative
per-side counts via an ordered window, statistic = max |ca/na - cb/nb|.
All counts stay integer until the final division, so the cumulative
arithmetic is exact and engine-independent.

Scale notes: exact ECDF needs a global order, but NOT a global window.
``_two_phase_cum`` range-partitions the distinct-value table, computes
per-partition cumulative sums in parallel, and broadcasts per-partition
prefix offsets (an O(partitions) collected fit-parameter table) — the
same trick as ``protect._with_row_index``. No stage ever sorts more
than one partition's values in one task. For 100 TB continuous data
``ks_statistic_binned`` (fixed-width bins, pure groupBy) bounds the
window input to ≤``bins`` rows per column with error ≤ one bin width;
``distribution_drift(exact=False)`` routes every numeric column through
that construction. χ² sums per-category contributions as
DECIMAL(38,12) so the sum is order-independent (float sums are not
associative; a shuffle could otherwise flip the last ulp between runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from safedata_pipeline_spark.checkpoint import pin_eager, pin_lazy
from pyspark.sql.types import NumericType

ROUND_N = 6
MIN_KS_ROWS = 5  # utility.py:95


def _tagged_union(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    a = df_a.select(F.col(col).alias("v")).where(F.col(col).isNotNull()).withColumn(
        "ka", F.lit(1)
    ).withColumn("kb", F.lit(0))
    b = df_b.select(F.col(col).alias("v")).where(F.col(col).isNotNull()).withColumn(
        "ka", F.lit(0)
    ).withColumn("kb", F.lit(1))
    return a.unionByName(b)


def _two_phase_cum(
    g: DataFrame, key_col: str, val_col: str, keep_val: bool = False
) -> DataFrame:
    """Exact per-key cumulative (ka, kb) counts with NO single-task
    window — the scale fix for the ECDF construction.

    Phase 1: range-partition the distinct-value table on (key, value)
    and pin partition ids (``localCheckpoint`` materializes the rows
    WITH their ``spark_partition_id``, so both downstream jobs see the
    same placement). Per-partition (key, pid) totals are collected —
    an O(partitions × keys-spanning-boundaries) fit-parameter table,
    same class as one-hot's category list.

    Phase 2: prefix offsets per (key, pid) are computed driver-side and
    broadcast back; the cumulative window is ``partitionBy(key, pid)``
    — every task sorts only its own contiguous value range. All counts
    stay integer, so results are bit-identical to the single-window
    form. Output: (key, ca, cb, na, nb), one row per distinct value.
    """
    spark = g.sparkSession
    npart = max(int(spark.conf.get("spark.sql.shuffle.partitions", "8")), 1)
    # ONE materialization total: g is persisted lazily so
    # repartitionByRange's boundary-sampling job (which executes the
    # child lineage) doubles as the cache fill; the single eager
    # checkpoint then reads the cache, and both downstream jobs (the
    # per-partition totals collect and the final join) read the
    # checkpoint with pinned partition ids. r3 shipped TWO eager
    # checkpoints here — the extra blocking job dominated ks_drift.
    g = g.persist()
    rp = (
        g.repartitionByRange(npart, F.col(key_col), F.col(val_col))
        .withColumn("__pid", F.spark_partition_id())
        .transform(pin_eager)
    )
    g.unpersist()
    # prefix offsets per (key, pid) as a WINDOW over the tiny totals
    # frame (O(partitions × keys) rows) instead of a driver collect +
    # createDataFrame round-trip — one less blocking barrier per use
    # (ks_drift pays this chain every run); integers throughout, so
    # results stay bit-identical to the collected form
    tot = rp.groupBy(key_col, "__pid").agg(
        F.sum("ka").alias("tka"), F.sum("kb").alias("tkb")
    )
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(key_col)
    off = tot.select(
        key_col,
        "__pid",
        F.coalesce(F.sum("tka").over(w_prev), F.lit(0)).alias("offa"),
        F.coalesce(F.sum("tkb").over(w_prev), F.lit(0)).alias("offb"),
        F.sum("tka").over(w_all).alias("na"),
        F.sum("tkb").over(w_all).alias("nb"),
    )
    w_local = Window.partitionBy(key_col, "__pid").orderBy(val_col)
    # keep_val lets callers join the cumulative counts back by value
    # (quantile_rank); the drift paths only need the aggregates
    extra = [val_col] if keep_val else []
    return rp.join(F.broadcast(off), [key_col, "__pid"]).select(
        key_col,
        *extra,
        (F.sum("ka").over(w_local) + F.col("offa")).alias("ca"),
        (F.sum("kb").over(w_local) + F.col("offb")).alias("cb"),
        "na",
        "nb",
    )


def ks_statistic(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic on ``col`` → 1 row
    ``(ks_stat double)``; NULL when either side has <5 non-null rows.
    Cumulative ECDF counts come from ``_two_phase_cum`` — parallel
    across value ranges, never a one-task global window."""
    u = _tagged_union(df_a, df_b, col)
    g = (
        u.groupBy("v")
        .agg(F.sum("ka").alias("ka"), F.sum("kb").alias("kb"))
        .withColumn("column", F.lit("_"))
    )
    c = _two_phase_cum(g, "column", "v")
    return c.agg(
        F.when(
            (F.max("na") >= MIN_KS_ROWS) & (F.max("nb") >= MIN_KS_ROWS),
            F.round(
                F.max(
                    F.abs(
                        F.col("ca") / F.col("na") - F.col("cb") / F.col("nb")
                    )
                ),
                ROUND_N,
            ),
        ).alias("ks_stat")
    )


def _bounded_cum(
    g: DataFrame, val_col: str, cols: list[str], span: int = 256
) -> DataFrame:
    """Parallel cumulative sums over a BOUNDED binned table (≤ bins
    rows) with no unpartitioned window anywhere: rows split into
    ``span``-wide blocks of the (integer) ``val_col``; per-block prefix
    offsets come from a bounded range self-join of the block-total
    table (≤ (bins/span)² pairs — tiny, broadcast), and the in-block
    running sum is a window PARTITIONED by block. Integer math — bit
    identical to the single-window form. Adds ``__cum_<col>`` columns.

    This is the expression-only sibling of ``_two_phase_cum`` (which
    handles unbounded distinct-value tables via pinned partition ids);
    binned constructions are bounded by design, so the offsets can be
    a join instead of a driver round-trip."""
    gb = g.withColumn("__blk", F.floor(F.col(val_col) / F.lit(span)))
    n = list(range(len(cols)))
    bt = gb.groupBy("__blk").agg(*[F.sum(cols[i]).alias(f"__t{i}") for i in n])
    bt2 = bt.select(
        F.col("__blk").alias("__b2"), *[F.col(f"__t{i}") for i in n]
    )
    off = (
        bt.select(F.col("__blk").alias("__b1"))
        .join(F.broadcast(bt2), F.col("__b2") < F.col("__b1"), "left")
        .groupBy("__b1")
        .agg(*[F.coalesce(F.sum(f"__t{i}"), F.lit(0)).alias(f"__o{i}") for i in n])
    )
    w_in = Window.partitionBy("__blk").orderBy(val_col)
    out = gb.join(F.broadcast(off), F.col("__blk") == F.col("__b1"))
    for i, c in enumerate(cols):
        out = out.withColumn(f"__cum_{c}", F.sum(c).over(w_in) + F.col(f"__o{i}"))
    return out.drop("__blk", "__b1", *[f"__o{i}" for i in n])


def ks_statistic_binned(df_a: DataFrame, df_b: DataFrame, col: str, bins: int = 10000) -> DataFrame:
    """100 TB path: KS over fixed-width bins — one groupBy (map-side
    combinable) + a window over ≤``bins`` rows; error ≤ max bin width of
    the true ECDF step. No global sort of the data."""
    lohi = (
        _tagged_union(df_a, df_b, col)
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()[0]
    )
    if lohi["lo"] is None:
        # both inputs empty/all-null: NULL statistic, like ks_statistic
        # and the SQL twin (float(None) would crash at plan build)
        return df_a.sparkSession.range(1).select(
            F.lit(None).cast("double").alias("ks_stat")
        )
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    width = (hi - lo) / bins or 1.0
    u = _tagged_union(df_a, df_b, col).withColumn(
        "v", F.least(F.floor((F.col("v") - F.lit(lo)) / F.lit(width)), F.lit(bins - 1))
    )
    g = u.groupBy("v").agg(F.sum("ka").alias("ka"), F.sum("kb").alias("kb"))
    # side totals as a broadcast 1-row aggregate instead of an
    # unpartitioned total window, and the cumulative via _bounded_cum's
    # block-partitioned windows — no WindowExec anywhere in this plan
    # runs unpartitioned (the ≤bins-row input parallelizes per block).
    tot = g.agg(F.sum("ka").alias("na"), F.sum("kb").alias("nb"))
    c = (
        _bounded_cum(g, "v", ["ka", "kb"])
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("__cum_ka").alias("ca"),
            F.col("__cum_kb").alias("cb"),
            "na",
            "nb",
        )
    )
    return c.agg(
        F.when(
            (F.max("na") >= MIN_KS_ROWS) & (F.max("nb") >= MIN_KS_ROWS),
            F.round(F.max(F.abs(F.col("ca") / F.col("na") - F.col("cb") / F.col("nb"))), ROUND_N),
        ).alias("ks_stat")
    )


def chi2_categorical(df_a: DataFrame, df_b: DataFrame, col: str, na_label: str = "NA") -> DataFrame:
    """χ²-like categorical drift → 1 row ``(chi2 double)``.

    Parity (utility.py:99-110): nulls become the "NA" category, counts
    are aligned by full outer join (missing → 0), statistic is
    Σ (oa-ob)²/(oa+ob+1e-9); NULL when either side is empty.
    """
    def counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.select(F.coalesce(F.col(col).cast("string"), F.lit(na_label)).alias("cat"))
            .groupBy("cat")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    ta, tb = counts(df_a, "oa"), counts(df_b, "ob")
    joined = ta.join(tb, on="cat", how="full_outer").select(
        F.coalesce("oa", F.lit(0)).alias("oa"), F.coalesce("ob", F.lit(0)).alias("ob")
    )
    contrib = (
        ((F.col("oa") - F.col("ob")) * (F.col("oa") - F.col("ob")))
        / (F.col("oa") + F.col("ob") + F.lit(1e-9))
    ).cast("decimal(38,12)")
    return joined.agg(
        F.when(
            (F.sum("oa") > 0) & (F.sum("ob") > 0),
            F.round(F.sum(contrib).cast("double"), ROUND_N),
        ).alias("chi2")
    )


def _melt_numeric(df: DataFrame, cols: list[str], ka: int, kb: int) -> DataFrame:
    """One scan → (column, vnum, ka, kb) rows for all numeric drift
    columns at once (nulls dropped, mirroring ``_tagged_union``)."""
    structs = [
        F.struct(F.lit(c).alias("column"), F.col(c).cast("double").alias("vnum"))
        for c in cols
    ]
    return (
        df.select(F.inline(F.array(*structs)))
        .where(F.col("vnum").isNotNull())
        .withColumn("ka", F.lit(ka))
        .withColumn("kb", F.lit(kb))
    )


def _melt_categorical(df: DataFrame, cols: list[str], ka: int, kb: int, na_label: str) -> DataFrame:
    """One scan → (column, cat, ka, kb) rows for all categorical drift
    columns at once (nulls → the "NA" category, like the reference)."""
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.coalesce(F.col(c).cast("string"), F.lit(na_label)).alias("cat"),
        )
        for c in cols
    ]
    return (
        df.select(F.inline(F.array(*structs)))
        .withColumn("ka", F.lit(ka))
        .withColumn("kb", F.lit(kb))
    )


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    cols: list[str] | None = None,
    na_label: str = "NA",
    exact: bool = True,
    bins: int = 10000,
) -> DataFrame:
    """Per-column drift table (utility.py:112-123): numeric columns →
    KS, everything else → χ². Output one row per shared column:
    ``(column, type, ks_stat, chi2)`` with the inapplicable metric NULL.

    Single-pass shape: instead of one KS/χ² subplan per column (2 scans
    of each input PER COLUMN), all numeric columns are melted into one
    ``(column, value)`` frame and all categorical columns into another —
    each input is scanned exactly twice total (once per melt) no matter
    how many columns drift is computed over. Per-column χ² is one
    grouped sum. Semantics (min-row guards, "NA" nulls, DECIMAL χ² sum,
    rounding) are identical to the per-column operators above.

    ``exact=True`` computes exact per-column ECDFs via
    ``_two_phase_cum`` (parallel over value ranges — no per-column
    single-task window). ``exact=False`` is the 100 TB continuous-data
    route: each column's values collapse into ≤``bins`` fixed-width
    bins first (the ``ks_statistic_binned`` construction, error ≤ one
    bin width), so the cumulative window input is bounded at
    ``bins`` rows per column regardless of cardinality.
    """
    types_a = {f.name: f.dataType for f in df_a.schema.fields}
    types_b = {f.name: f.dataType for f in df_b.schema.fields}
    shared = [c for c in df_a.columns if c in types_b] if cols is None else cols
    num_cols = [
        c
        for c in shared
        if isinstance(types_a[c], NumericType) and isinstance(types_b[c], NumericType)
    ]
    cat_cols = [c for c in shared if c not in num_cols]

    parts: list[DataFrame] = []
    if num_cols:
        u = _melt_numeric(df_a, num_cols, 1, 0).unionByName(_melt_numeric(df_b, num_cols, 0, 1))
        if not exact:
            # per-column lo/width: one tiny agg (O(columns) rows) over
            # the melt, applied as a broadcast join + floor — the bin id
            # replaces the raw value and the distinct-value table is
            # bounded at bins rows per column
            lohi = (
                u.groupBy("column")
                .agg(F.min("vnum").alias("lo"), F.max("vnum").alias("hi"))
                .collect()
            )
            brows = [
                (r["column"], float(r["lo"]), ((float(r["hi"]) - float(r["lo"])) / bins) or 1.0)
                for r in lohi
                if r["lo"] is not None
            ]
            bounds = u.sparkSession.createDataFrame(
                brows, "column string, lo double, width double"
            )
            u = u.join(F.broadcast(bounds), "column").select(
                "column",
                F.least(
                    F.floor((F.col("vnum") - F.col("lo")) / F.col("width")),
                    F.lit(bins - 1),
                ).cast("double").alias("vnum"),
                "ka",
                "kb",
            )
        g = u.groupBy("column", "vnum").agg(F.sum("ka").alias("ka"), F.sum("kb").alias("kb"))
        c = _two_phase_cum(g, "column", "vnum")
        ks = c.groupBy("column").agg(
            F.when(
                (F.max("na") >= MIN_KS_ROWS) & (F.max("nb") >= MIN_KS_ROWS),
                F.round(F.max(F.abs(F.col("ca") / F.col("na") - F.col("cb") / F.col("nb"))), ROUND_N),
            ).alias("ks_stat")
        )
        parts.append(
            ks.select(
                "column",
                F.lit("numeric").alias("type"),
                "ks_stat",
                F.lit(None).cast("double").alias("chi2"),
            )
        )
    if cat_cols:
        u = _melt_categorical(df_a, cat_cols, 1, 0, na_label).unionByName(
            _melt_categorical(df_b, cat_cols, 0, 1, na_label)
        )
        g = u.groupBy("column", "cat").agg(F.sum("ka").alias("oa"), F.sum("kb").alias("ob"))
        contrib = (
            ((F.col("oa") - F.col("ob")) * (F.col("oa") - F.col("ob")))
            / (F.col("oa") + F.col("ob") + F.lit(1e-9))
        ).cast("decimal(38,12)")
        chi = g.groupBy("column").agg(
            F.when(
                (F.sum("oa") > 0) & (F.sum("ob") > 0),
                F.round(F.sum(contrib).cast("double"), ROUND_N),
            ).alias("chi2")
        )
        parts.append(
            chi.select(
                "column",
                F.lit("categorical").alias("type"),
                F.lit(None).cast("double").alias("ks_stat"),
                "chi2",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index over fixed-width bins → 1 row
    ``(psi double)`` — the monitoring-dashboard drift metric
    (PSI = Σ (p_a − p_b)·ln(p_a/p_b); rule of thumb: <0.1 stable,
    >0.25 shifted). Complements KS (distribution shape) and χ²
    (categorical) with a magnitude-weighted score.

    Construction mirrors ``ks_statistic_binned``: shared lo/hi from one
    tiny agg, bin ids via floor (map-only), ONE grouped count per side,
    proportions clamped to ``eps`` so empty bins contribute finitely
    (the standard PSI smoothing). All counts integer until the final
    expression; NULL when either side is empty.
    """
    lohi = (
        _tagged_union(df_a, df_b, col)
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()[0]
    )
    if lohi["lo"] is None:
        return df_a.sparkSession.range(1).select(F.lit(None).cast("double").alias("psi"))
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    width = (hi - lo) / bins or 1.0
    u = _tagged_union(df_a, df_b, col).withColumn(
        "b", F.least(F.floor((F.col("v") - F.lit(lo)) / F.lit(width)), F.lit(bins - 1))
    )
    g = u.groupBy("b").agg(F.sum("ka").alias("ca"), F.sum("kb").alias("cb"))
    # try_divide: a fully-empty side has total 0 — the guard below
    # yields NULL psi for that case, but ANSI mode would raise first.
    # Totals come from a broadcast 1-row aggregate, not a total window
    # (one WindowExec + sort fewer; integer sums, so hashes unchanged).
    tot = g.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    p = g.crossJoin(F.broadcast(tot)).select(
        F.greatest(F.try_divide(F.col("ca"), F.col("na")), F.lit(eps)).alias("pa"),
        F.greatest(F.try_divide(F.col("cb"), F.col("nb")), F.lit(eps)).alias("pb"),
        "na",
        "nb",
    )
    # per-bin contributions round to 10 decimals and sum as DECIMAL so
    # the (ln-bearing) float sum is partition-order and engine
    # independent before the final 6-decimal round
    contrib = F.round(
        (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")), 10
    ).cast("decimal(38,10)")
    return p.agg(
        F.when(
            (F.max("na") > 0) & (F.max("nb") > 0),
            F.round(F.sum(contrib).cast("double"), ROUND_N),
        ).alias("psi")
    )


def jsd_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    bins: int = 10,
) -> DataFrame:
    """Jensen–Shannon divergence over fixed-width bins → 1 row
    ``(jsd double)`` — the bounded, symmetric drift metric
    (0 ≤ JSD ≤ ln 2; no eps smoothing needed because 0·ln(0/m) := 0
    and the mixture m is positive wherever either side has mass).

    Same binned construction as PSI; per-bin KL terms round@10 →
    DECIMAL-sum. NULL when either side is empty."""
    lohi = (
        _tagged_union(df_a, df_b, col)
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()[0]
    )
    if lohi["lo"] is None:
        return df_a.sparkSession.range(1).select(F.lit(None).cast("double").alias("jsd"))
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    width = (hi - lo) / bins or 1.0
    u = _tagged_union(df_a, df_b, col).withColumn(
        "b", F.least(F.floor((F.col("v") - F.lit(lo)) / F.lit(width)), F.lit(bins - 1))
    )
    g = u.groupBy("b").agg(F.sum("ka").alias("ca"), F.sum("kb").alias("cb"))
    # broadcast 1-row totals instead of a total window (see psi_drift)
    tot = g.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    p = g.crossJoin(F.broadcast(tot)).select(
        F.coalesce(F.try_divide(F.col("ca"), F.col("na")), F.lit(0.0)).alias("pa"),
        F.coalesce(F.try_divide(F.col("cb"), F.col("nb")), F.lit(0.0)).alias("pb"),
        "na",
        "nb",
    )
    m = (F.col("pa") + F.col("pb")) / 2
    kl_a = F.when(F.col("pa") > 0, F.col("pa") * F.log(F.col("pa") / m)).otherwise(F.lit(0.0))
    kl_b = F.when(F.col("pb") > 0, F.col("pb") * F.log(F.col("pb") / m)).otherwise(F.lit(0.0))
    contrib = F.round(F.lit(0.5) * (kl_a + kl_b), 10).cast("decimal(38,10)")
    return p.agg(
        F.when(
            (F.max("na") > 0) & (F.max("nb") > 0),
            F.round(F.sum(contrib).cast("double"), ROUND_N),
        ).alias("jsd")
    )


def drift_timeline(
    df: DataFrame,
    ts_col: str = "ts",
    val_col: str = "value",
    bins: int = 100,
) -> DataFrame:
    """Hour-by-hour distribution drift of ``val_col`` against the
    WHOLE dataset's distribution — the monitoring query for "when did
    the data change?". One row per hour: ``(hour_start, n_rows,
    ks_stat)`` with ks = max |ECDF_hour − ECDF_global| over fixed-width
    bins.

    Shape: one pass bins every row (global lo/hi from a tiny agg);
    per-(hour, bin) counts and per-bin global counts come from the
    same grouped table; each hour's cumulative runs in a window
    partitioned by hour over ≤``bins`` rows. Everything is integer
    until the final division — engine-exact.
    """
    lohi = df.agg(
        F.min(val_col).alias("lo"), F.max(val_col).alias("hi")
    ).collect()[0]
    if lohi["lo"] is None:
        return df.sparkSession.createDataFrame(
            [], "hour_start timestamp_ntz, n_rows bigint, ks_stat double"
        )
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    width = (hi - lo) / bins or 1.0
    binned = df.where(F.col(val_col).isNotNull()).select(
        F.date_trunc("hour", F.col(ts_col)).cast("timestamp_ntz").alias("hour_start"),
        F.least(
            F.floor((F.col(val_col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
        ).alias("b"),
    )
    # the per-(hour, bin) count table feeds THREE branches (global bin
    # sums, per-hour totals, the grid join) — materialize it once
    # (bounded at hours × bins rows, dashboard-sized) so the final
    # plan reads the events data exactly once instead of per branch
    g = (
        binned.groupBy("hour_start", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(pin_eager)
    )
    # explicit hour × global-bin grid: an hour MISSING a bin still
    # advances the global cumulative there, so the grid (bounded at
    # hours × bins rows — both dashboard-sized) left-joins the hour
    # counts with 0-fill rather than skipping absent bins
    gb = g.groupBy("b").agg(F.sum("c").alias("cg"))
    hours = g.groupBy("hour_start").agg(F.sum("c").alias("nh"))
    grid = hours.crossJoin(F.broadcast(gb))
    j = grid.join(g, on=["hour_start", "b"], how="left").select(
        "hour_start", "b", "nh", "cg", F.coalesce("c", F.lit(0)).alias("c")
    )
    w_cum_h = Window.partitionBy("hour_start").orderBy("b")
    w_h = Window.partitionBy("hour_start")
    # the global total is Σ cg within any one hour's grid rows — no
    # extra scan of df for a number the grid already contains
    cum = j.select(
        "hour_start",
        "nh",
        F.sum("c").over(w_cum_h).alias("ch"),
        F.sum("cg").over(w_cum_h).alias("cgc"),
        F.sum("cg").over(w_h).alias("total"),
    )
    return (
        cum.groupBy("hour_start")
        .agg(
            F.max("nh").cast("bigint").alias("n_rows"),
            F.round(
                F.max(
                    F.abs(
                        F.col("ch") / F.col("nh") - F.col("cgc") / F.col("total")
                    )
                ),
                ROUND_N,
            ).alias("ks_stat"),
        )
    )
