"""Custom join operators Spark lacks as built-ins (SURVEY §2.8
extension surface; no reference counterpart — the reference's only
join is the kNN linkage join, risk.py:26-35).

  * ``asof_join``  — for every left row, the most recent right row of
    the same key at-or-before the left timestamp (backward, inclusive).
    NOT a join under the hood: both sides union into one stream,
    shuffle ONCE on the key, and a per-key ordered window carries the
    last right payload forward. No pair explosion, no range condition
    for the optimizer to degrade to nested-loop; cost is one shuffle +
    one sort, independent of match density. (The pattern time-series
    stores call "last observation carried forward".)
  * ``range_join_bucketed`` — left value ∈ [lo, hi) against a ranges
    table. Naive non-equi joins become broadcast-nested-loop scans of
    |left|·|ranges|; bucketing each range into fixed-width buckets and
    exploding turns it into an EQUI-join on the bucket id + a residual
    predicate — shuffle-partitionable, AQE-skew-splittable, linear in
    |left| + Σ range-widths/W.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Backward inclusive as-of join (left outer): each left row gets
    the payload of the latest right row with the same ``key`` and
    ``right_ts`` <= ``left_ts``; nulls when no prior right row exists.

    Output: all left columns + ``prefix``-ed ``right_cols``.

    Scale: one hash shuffle on ``key`` and one per-key sort — at any
    |left|, |right|; a hot key degrades the window sort, so pre-split
    hot keys (salt + re-asof per salt, keeping the max) if key skew is
    extreme. Right-row atomicity is preserved by carrying ONE struct,
    not per-column last() calls (a null right column must not inherit
    an older row's value).
    """
    right_cols = right_cols or [c for c in right.columns if c != key]
    r_payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        r_payload.alias("__r"),
    )
    payload_type = r.schema["__r"].dataType
    l = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__r"),
    )
    l_type = l.schema["__l"].dataType
    r = r.select(F.lit(None).cast(l_type).alias("__l"), "__k", "__t", "__side", "__r")

    # right rows sort BEFORE left rows at equal timestamps ⇒ inclusive
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return carried.where(F.col("__side") == 1).select(*out_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for EXTREME skew — when one key holds
    so many rows that even AQE's skew-split (which only splits the
    probe side's oversized partitions) leaves a straggler task.

    The left (skewed) side scatters each row to a random salt bucket;
    the right side replicates each row ``salt`` times; joining on
    (key, salt) spreads the hot key over ``salt`` tasks. Cost: the
    right side is ×salt — use only when |right| ≪ |left| and skew is
    measured, not suspected. Result is row-identical to the plain join
    (the salt is a partitioning artifact, dropped before returning).

    Only ``inner`` and ``left`` joins are supported: the right side is
    replicated ×salt, so right/full-outer (and semi/anti) variants
    would emit ``salt`` copies of every unmatched right row — the
    replication is only sound when unmatched RIGHT rows never surface.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner' or 'left', got {how!r}: the right side "
            "is replicated per salt bucket, so outer/semi/anti variants that surface "
            "unmatched right rows would duplicate them"
        )
    l = left.withColumn("__salt", (F.rand(42) * salt).cast("int")).alias("l")
    r = (
        right.withColumnRenamed(key, "__rkey")
        .withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        .alias("r")
    )
    out = l.join(
        r,
        on=(F.col(f"l.{key}") == F.col("r.__rkey")) & (F.col("l.__salt") == F.col("r.__salt")),
        how=how,
    )
    return out.drop("__salt", "__rkey")


def range_join_bucketed(
    left: DataFrame,
    ranges: DataFrame,
    val_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 10.0,
) -> DataFrame:
    """Left-outer range join: left rows pick up the columns of the
    (non-overlapping) range row with ``lo <= val < hi``.

    Each range explodes into ceil((hi-lo)/W) bucket rows; the join is
    then an equi-join on ``floor(val/W)`` plus the residual bounds
    check — never a nested-loop over |left|·|ranges|. Pick ``W`` near
    the median range width: too small multiplies the ranges side, too
    large puts many ranges in one bucket (both only degrade, never
    break, correctness).
    """
    lo, hi = F.col(lo_col), F.col(hi_col)
    w = float(bucket_width)
    exploded = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(lo / w).cast("long"),
                # floor(hi/w) with NO exclusive-end epsilon: when hi
                # sits exactly on a bucket boundary this explodes one
                # bucket the half-open range doesn't occupy (the
                # residual val < hi check discards it), but an epsilon
                # subtraction can cut the bucket of a val within 1e-9
                # of hi at fine granularities — dropping a qualifying
                # match. One spare row per range is the safe price.
                F.floor(hi / w).cast("long"),
            )
        ),
    )
    lb = F.floor(F.col(val_col) / w).cast("long")
    cond = (
        (lb == exploded["__bucket"])
        & (F.col(val_col) >= exploded[lo_col])
        & (F.col(val_col) < exploded[hi_col])
    )
    return left.join(exploded, cond, "left").drop("__bucket")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width: float,
) -> DataFrame:
    """INNER join of two interval tables on OVERLAP (half-open
    semantics: ``a_start < b_end AND b_start < a_end``) — the classic
    big×big temporal join (sessions × incidents, shipments × promo
    windows) that a naive planner turns into a nested loop over
    |a|·|b| because there is no equality key.

    Spark-first shape: both sides explode their interval onto a fixed
    time grid (``floor(t / W)`` buckets, ceil(span/W)+1 rows per
    interval), the join becomes a plain EQUI-join on the bucket id,
    and the exact overlap predicate filters residually. Overlapping
    pairs co-bucket at least where the later interval starts, so the
    pair is emitted ONLY from the bucket containing
    ``greatest(a_start, b_start)`` — each qualifying pair appears in
    exactly one bucket, which kills duplicates WITHOUT a
    ``dropDuplicates`` shuffle over the pair stream. Cost is
    (rows · span/W) exploded rows per side; pick ``W`` near the median
    interval span (degrades, never breaks, away from that). Skewed
    hot buckets are ordinary equi-join skew — AQE splits them.

    Interval columns must be numeric (cast timestamps to epoch
    seconds / dates to epoch days first). Output: all columns of ``a``
    then ``b`` (names must be disjoint). Empty/inverted intervals
    (start ≥ end) never match, matching the half-open contract.
    """
    w = float(bucket_width)

    def buckets(df, s_col, e_col):
        s, e = F.col(s_col).cast("double"), F.col(e_col).cast("double")
        # last bucket is floor(e/w) with NO exclusive-end adjustment:
        # when e sits exactly on a bucket boundary this explodes one
        # bucket the half-open interval doesn't truly occupy (the
        # residual predicate discards it), but it guarantees the
        # single-emission bucket floor(later_start/w) — later_start < e
        # ⇒ floor(later_start/w) ≤ floor(e/w) — is ALWAYS covered, at
        # every numeric granularity. An epsilon subtraction here
        # (floor((e-1e-9)/w)) is wrong twice over: below one ulp of
        # epoch-scale doubles it no-ops, and at sub-1e-9 granularity it
        # can cut the emission bucket and silently drop a qualifying
        # pair.
        return df.where(s < e).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(s / w).cast("long"),
                    F.floor(e / w).cast("long"),
                )
            ),
        )
    ae = buckets(a, a_start, a_end).alias("a")
    be = buckets(b, b_start, b_end).alias("b")
    later_start = F.greatest(
        F.col(f"a.{a_start}").cast("double"), F.col(f"b.{b_start}").cast("double")
    )
    cond = (
        (F.col("a.__bucket") == F.col("b.__bucket"))
        & (F.col(f"a.{a_start}") < F.col(f"b.{b_end}"))
        & (F.col(f"b.{b_start}") < F.col(f"a.{a_end}"))
        # emit from exactly one bucket: the one holding the later start
        & (F.col("a.__bucket") == F.floor(later_start / w).cast("long"))
    )
    return ae.join(be, cond).select(
        *[F.col(f"a.{c}") for c in a.columns],
        *[F.col(f"b.{c}") for c in b.columns],
    )
