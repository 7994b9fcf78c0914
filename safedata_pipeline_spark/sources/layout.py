"""File-layout optimization for scan pruning — range-clustered writes
plus a parquet data-skipping audit.

The 100 TB mechanism this packages: parquet footers carry per-row-
group min/max statistics, and Spark's scan skips row groups whose
range can't match the filter. That skipping is only effective if the
file layout CLUSTERS the filter column — a randomly-laid-out table
has every file spanning the full value range, so nothing prunes.

  * ``write_range_clustered(df, path, cols, n_files)`` —
    ``repartitionByRange`` on the cluster columns +
    ``sortWithinPartitions`` before the write: each output file owns a
    narrow, mostly-disjoint slice of the key space (the poor man's
    Z-order for single-dimension predicates; multi-col clustering
    nests lexicographically).
  * ``skipping_stats(spark, path, col)`` — the audit: per-file
    min/max of ``col`` from the parquet footers (pyarrow, driver-side
    — O(files) metadata reads, the metadata plane, never data). One
    summary row: file count, average fraction of the global value
    range a file spans (``avg_span``), and the expected fraction of
    files a random point-predicate must read (``hit_fraction``).
    Clustered layout → both near 1/n_files; unclustered → near 1.

``tests/test_layout.py`` pins the contract end to end: after a
range-clustered write the same filter reads fewer files than after a
round-robin write, and the physical scan confirms it (number of files
read drops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_range_clustered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 32
) -> None:
    """Range-partition on ``cols`` into ``n_files`` slices, sort
    within each, write parquet: every file owns a narrow key slice so
    footer min/max stats actually prune."""
    if not cols:
        raise ValueError("no cluster columns")
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def skipping_stats(spark: SparkSession, path: str, col: str) -> DataFrame:
    """Audit how prunable a parquet layout is for ``col``. Returns one
    row: ``(n_files, global_min, global_max, avg_span,
    hit_fraction)`` where ``avg_span`` is the mean of
    (file_max-file_min)/(global_max-global_min) and ``hit_fraction``
    is the expected fraction of files whose [min,max] contains a
    uniformly random point in the global range — the cost of an
    average equality predicate.

    Footer metadata only (pyarrow, driver-side, O(files)); no data is
    read. Constant layouts (global_max == global_min) report span 1.
    """
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    files = sorted(
        f
        for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.basename(f)[0] not in "._"
    )
    ranges: list[tuple[float, float]] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema != col or c.statistics is None:
                    continue
                st = c.statistics
                if not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            ranges.append((float(lo), float(hi)))
    if not ranges:
        raise ValueError(f"no footer statistics for column {col!r} under {path}")
    gmin = min(lo for lo, _ in ranges)
    gmax = max(hi for _, hi in ranges)
    width = gmax - gmin
    if width <= 0:
        spans = [1.0] * len(ranges)
    else:
        spans = [(hi - lo) / width for lo, hi in ranges]
    avg_span = sum(spans) / len(spans)
    hit = avg_span  # P(point in [lo,hi]) for uniform point = span
    return spark.createDataFrame(
        [(len(ranges), gmin, gmax, round(avg_span, 6), round(hit, 6))],
        "n_files int, global_min double, global_max double, avg_span double, hit_fraction double",
    )


def zorder_value(cols: list, bits: int = 16):
    """Z-order (Morton) interleave of 2+ numeric columns as a pure
    Column expression: each column rank-normalizes into ``bits``-bit
    integers via the caller-supplied (lo, hi) ranges, and the bits
    interleave round-robin into one bigint. Rows close in Z-value are
    close in EVERY clustered dimension, so range-partitioning by
    Z-value gives multi-dimensional data skipping — the Delta/Iceberg
    OPTIMIZE ZORDER mechanism, reproduced with stock expressions.

    ``cols``: list of (column, lo, hi) triples; values clamp into
    [lo, hi]. 2 cols × 16 bits or 3 × 10 fit comfortably in int64.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs >= 2 columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds int64")
    scaled = []
    for col, lo, hi in cols:
        lo_f, hi_f = float(lo), float(hi)
        width = hi_f - lo_f if hi_f > lo_f else 1.0
        unit = F.least(
            F.greatest((col.cast("double") - F.lit(lo_f)) / F.lit(width), F.lit(0.0)),
            F.lit(1.0),
        )
        scaled.append(
            F.least(
                F.floor(unit * F.lit(float(1 << bits))).cast("long"),
                F.lit((1 << bits) - 1),
            )
        )
    z = F.lit(0).cast("long")
    # interleave: output bit (b*n + i) takes bit b of column i
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftrightunsigned(s, b) % 2
            z = z + F.shiftleft(bit, b * n + i)
    return z


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: list[tuple[str, float, float]],
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Multi-dimensional clustered write: range-partition + sort on
    the Z-order value of ``cols`` (list of (name, lo, hi)), drop the
    helper column, write parquet. Unlike lexicographic
    ``write_range_clustered(cols=[a, b])`` — which prunes only on the
    leading column — every clustered dimension's footer min/max
    tightens, so predicates on b alone skip files too."""
    from pyspark.sql import functions as F

    z = zorder_value([(F.col(c), lo, hi) for c, lo, hi in cols], bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
