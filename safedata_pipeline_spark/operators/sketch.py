"""Engine-reproducible sketches (SURVEY §2.8 extension surface).

``kmv_distinct`` — K-Minimum-Values distinct-count sketch: keep the k
smallest md5-derived hash values of a column; if fewer than k distinct
hashes exist the count is exact, otherwise estimate (k-1)/h_(k) where
h_(k) is the k-th smallest hash normalized into (0,1).

Why not ``approx_count_distinct``? Spark's HLL++ is neither seedable
nor reproducible outside Spark. KMV built on md5 is deterministic and
any SQL engine recomputes the identical sketch — so the *sketch
itself* is oracle-checkable, and at 100 TB it replaces exact
count_distinct wherever a ~k^-1/2 relative error is acceptable.

Scale shape: the k minima survive any pre-filter that keeps hash <
t ≫ E[h_(k)], so at scale a cheap ``h < t`` predicate (t from a coarse
row-count estimate) drops ~all rows before the distinct-shuffle; the
remaining distinct+sort touches ~t·n values. Fixture scale skips the
pre-filter (exactness of the sketch, not of the estimate, is what the
oracle checks).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from safedata_pipeline_spark.checkpoint import pin_eager, pin_lazy

from safedata_pipeline_spark.functions.hashing import md5_unit_interval as _hash01

ROUND_N = 6


def kmv_distinct(
    df: DataFrame, cols: list[str], k: int = 64, prefilter: float | None = None
) -> DataFrame:
    """KMV distinct-count estimate per column. Output: one row per
    column — (column, k_used, kmv_estimate).

    ``prefilter`` is the 100 TB path: keep only ``hash < prefilter``
    before the distinct shuffle. The k minima are unchanged whenever
    h_(k) < prefilter (prefilter ≫ k/n_distinct — e.g. 1e-4 drops
    99.99% of rows pre-shuffle and still yields the identical sketch
    for any column with ≥ ~640k distincts at k=64). When fewer than k
    hashes survive the filter, the estimate scales by the kept
    hash-space fraction (n_h/prefilter) instead of claiming an exact
    count — the filtered set is a uniform hash-space sample.
    """
    outs = []
    for c in cols:
        hashed = df.where(F.col(c).isNotNull()).select(_hash01(F.col(c)).alias("hv"))
        if prefilter is not None:
            hashed = hashed.where(F.col("hv") < prefilter)
        mins = hashed.distinct().orderBy("hv").limit(k)
        agg = mins.agg(
            F.count(F.lit(1)).alias("n_h"), F.max("hv").alias("hk")
        )
        below_k = (
            F.col("n_h").cast("double") / prefilter
            if prefilter is not None
            else F.col("n_h").cast("double")
        )
        outs.append(
            agg.select(
                F.lit(c).alias("column"),
                F.col("n_h").cast("bigint").alias("k_used"),
                F.round(
                    F.when(F.col("n_h") < k, below_k).otherwise(
                        F.lit(float(k - 1)) / F.col("hk")
                    ),
                    ROUND_N,
                ).alias("kmv_estimate"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def hll_rollup(
    df: DataFrame,
    group_col,
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count rollup on Datasketches HLL (Spark's
    ``hll_sketch_agg`` family, public Apache DataSketches format).

    Output: one row per ``group_col`` value — (group, ndv_estimate,
    sketch) — where ``sketch`` is the serialized HLL binary. Keeping
    the sketch in the output is the point: a coarser rollup
    re-aggregates the SKETCHES (``hll_rollup_merge``) instead of
    re-scanning the data — the pre-aggregation contract that makes
    hierarchical distinct counts (hour→day→month) feasible at 100 TB,
    where exact count_distinct cannot be re-aggregated at all.

    vs ``kmv_distinct``: KMV is the engine-reproducible, oracle-
    checkable sketch; HLL is the industrial-strength one (fixed ~1.5%
    error at lg_k=12, compact binary, cross-system Apache format). The
    estimate is engine-specific, so queries built on this are
    rows-only in the harness — the accuracy contract is unit-tested
    against exact counts instead.
    """
    g = group_col if isinstance(group_col, Column) else F.col(group_col)
    return df.groupBy(g.alias("grp")).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias("sketch")
    ).select(
        "grp",
        F.hll_sketch_estimate("sketch").alias("ndv_estimate"),
        "sketch",
    )


def hll_rollup_merge(fine: DataFrame, coarse_group: Column) -> DataFrame:
    """Merge a finer ``hll_rollup`` to a coarser grain WITHOUT touching
    the base data: union the sketches per coarse group. Input must
    carry the ``sketch`` column from ``hll_rollup``."""
    return fine.groupBy(coarse_group.alias("grp")).agg(
        F.hll_union_agg("sketch").alias("sketch")
    ).select(
        "grp",
        F.hll_sketch_estimate("sketch").alias("ndv_estimate"),
        "sketch",
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — md5-seeded, so the
# sketch STATE is bit-identical across engines (oracle-checkable, like
# KMV and unlike library CM implementations with private seeds).
# ---------------------------------------------------------------------------

from safedata_pipeline_spark.functions.hashing import md5_slot32 as _slot32


def count_min_state(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Fit a Count-Min sketch over a (possibly huge-cardinality)
    column: state table (d, slot, n) with ≤ depth·width rows.

    One pass: each value fans out to ``depth`` (row, slot) cells via
    slot-seeded md5 — an explode of a tiny literal-built struct array,
    then ONE groupBy with map-side partial agg, so the shuffle carries
    at most depth·width rows per partition regardless of input size.
    The classic 100 TB heavy-hitter screen: the state is mergeable
    across batches/sources by ADDING cell counts
    (``count_min_merge``), and point queries never rescan the data."""
    if depth < 1 or width < 1:
        raise ValueError("need depth >= 1 and width >= 1")
    v = F.col(col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), (_slot32(v, d) % F.lit(width)).alias("slot")
            )
            for d in range(depth)
        ]
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.slot").alias("slot"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def count_min_merge(*states: DataFrame) -> DataFrame:
    """Monoid merge: cell counts add (states must share depth/width —
    the fit parameters, pinned like a drift reference's grid)."""
    if not states:
        raise ValueError("no states")
    allp = reduce(lambda a, b: a.unionByName(b), states)
    return allp.groupBy("d", "slot").agg(F.sum("n").cast("bigint").alias("n"))


def count_min_query(
    state: DataFrame,
    probes: DataFrame,
    probe_col: str = "value",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for a probe set: (value, cm_estimate)
    with estimate = min over rows d of cell(d, slot_d(value)) — the
    canonical CM upper bound (never under-counts; over-counts only on
    collisions). The probe table is small by contract (a watchlist /
    candidate heavy-hitter set) and broadcasts; the state is ≤
    depth·width rows, so the join is dashboard-cheap."""
    v = F.col(probe_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), (_slot32(v, d) % F.lit(width)).alias("slot"))
            for d in range(depth)
        ]
    )
    pr = probes.select(v.alias("value"), F.explode(cells).alias("c")).select(
        "value", F.col("c.d").alias("d"), F.col("c.slot").alias("slot")
    )
    return (
        pr.join(state, ["d", "slot"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("bigint").alias("cm_estimate"))
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """EXACT heavy hitters — every value with true count ≥ min_count —
    via the CM-prefilter two-pass pattern: (value, n).

    Pass 1 fits the Count-Min state (≤ depth·width cells). Because CM
    NEVER undercounts, any value whose sketch estimate is below the
    threshold provably misses it — so pass 2 recomputes each row's
    cells MAP-SIDE against the broadcast state (a python dict closed
    over a pandas UDF would work, but the state is small enough for a
    pure-expression lookup: one array literal per sketch row) and
    keeps only candidate rows. The exact groupBy then shuffles ONLY
    candidate values — at 100 TB with a high threshold that is a
    vanishing fraction of the column, turning exact heavy-hitters
    into one scan + one tiny shuffle. False positives (collision
    inflation) die in the final HAVING; false negatives are
    impossible, so the result is EXACTLY `GROUP BY value HAVING
    count(*) >= min_count` — oracle-checkable despite the sketch in
    the middle.

    NOTE on execution semantics: building the operator EAGERLY runs
    pass 1 (the state fit launches a Spark job via localCheckpoint) so
    that the returned plan is a pure pass-2 lazy pipeline. The state
    lookup is `depth` BROADCAST hash joins on the ≤width-row per-depth
    state slices — all map-side, no shuffle, and the plan stays O(depth)
    regardless of `width` (a 64k-wide sketch no longer inflates
    codegen the way the former per-cell literal arrays did)."""
    # ≤ depth·width rows; checkpoint once so the depth broadcast joins
    # below don't each re-run the pass-1 aggregation.
    state = count_min_state(df, col, depth, width).transform(pin_eager)
    v = F.col(col).cast("string")
    out = df.where(F.col(col).isNotNull()).select(
        v.alias("value"),
        *[(_slot32(v, d) % F.lit(width)).alias(f"__slot_{d}") for d in range(depth)],
    )
    for d in range(depth):
        sd = state.where(F.col("d") == d).select(
            F.col("slot").alias(f"__slot_{d}"), F.col("n").alias(f"__n_{d}")
        )
        out = out.join(F.broadcast(sd), f"__slot_{d}", "left")
    ests = [F.coalesce(F.col(f"__n_{d}"), F.lit(0)) for d in range(depth)]
    est = ests[0] if depth == 1 else F.least(*ests)
    return (
        out.where(est >= F.lit(min_count))
        .groupBy("value")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .where(F.col("n") >= min_count)
    )


def bloom_build(
    df: DataFrame, col: str, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Bloom filter over a column as MERGEABLE, engine-reproducible
    state (public Bloom 1970 construction): ``k`` md5-slot-seeded bit
    positions per value, packed into 32-bit words stored as BIGINT
    rows ``(word_idx, bits)``.

    Design notes:
      * md5-derived positions (``functions/hashing.py`` contract) ⇒
        the state itself hash-checks against a SQL oracle.
      * 32-bit words (not 64) keep every word value non-negative, so
        no engine disagrees about sign bits or shift overflow
        (DuckDB range-checks ``1::BIGINT << 63``).
      * ``bit_or`` aggregation is map-side combinable and associative:
        partial filters from any partitioning — or from separate
        corpora — merge by the same groupBy(word_idx)+bit_or, the
        union-of-sets property real dedup prefilters rely on.
    At the defaults (m=4096, k=3) a ~900-distinct-value set sits near
    the classic 1.5%-false-positive regime; size m per corpus."""
    pos = F.explode(
        F.array(*[(_slot32(F.col(col).cast("string"), s) % m_bits) for s in range(k)])
    ).alias("p")
    ex = df.where(F.col(col).isNotNull()).select(pos)
    return (
        ex.select(
            (F.col("p") / 32).cast("int").alias("word_idx"),
            (F.col("p") % 32).cast("int").alias("__bit"),
        )
        .select("word_idx", F.expr("shiftleft(CAST(1 AS BIGINT), __bit)").alias("__w"))
        .groupBy("word_idx")
        .agg(F.bit_or("__w").cast("bigint").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    id_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Probe a built Bloom filter: ``(id, maybe_present)`` per row,
    with the Bloom guarantee — ``maybe_present`` is TRUE for every
    value that was in the build set (no false negatives), and true
    for a small false-positive fraction of absent values. The filter
    state broadcasts (m/32 rows); the probe is one explode + broadcast
    join + per-id count — the cheap pre-screen that keeps exact dedup
    joins from shuffling the 100 TB clean majority."""
    pos = F.explode(
        F.array(*[(_slot32(F.col(col).cast("string"), s) % m_bits) for s in range(k)])
    ).alias("p")
    probes = df.select(F.col(id_col), pos).select(
        id_col,
        (F.col("p") / 32).cast("int").alias("word_idx"),
        (F.col("p") % 32).cast("int").alias("__bit"),
    )
    hit = probes.join(F.broadcast(bloom), "word_idx").where(
        F.expr("(bits & shiftleft(CAST(1 AS BIGINT), __bit)) != 0")
    )
    agg = hit.groupBy(id_col).agg(F.count(F.lit(1)).alias("__hits"))
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col, (F.coalesce("__hits", F.lit(0)) == k).alias("maybe_present")
    )


# ---------------------------------------------------------------------------
# md5-register HyperLogLog (Flajolet et al. 2007) — unlike the
# Datasketches-backed hll_rollup (engine-specific binary, rows-only),
# every piece here is engine-recomputable: the register table derives
# from md5 (bucket = first b hash bits, rank = leading zeros of the
# next 32 + 1), the harmonic sum Σ2^(−rank) is EXACTLY representable
# in a double (≤256 terms, each a power of two ≥ 2^−33 → 41 bits of
# span < 53), and the bias constant / linear-counting branch are the
# published formulas. An APPROXIMATE distinct count whose value
# hash-matches a SQL oracle — and whose partials merge with plain
# max(), so merge(hour registers) == day-direct is certified by the
# same hash.
# ---------------------------------------------------------------------------

HLL_B = 8  # 2^8 = 256 registers, ~6.5% relative error


def hll_md5_registers(
    df: DataFrame, value_col: str, group_cols: list[str], b: int = HLL_B
) -> DataFrame:
    """Per-group HLL register table ``(*group_cols, bucket, r)`` from
    md5 bits: bucket = first b bits (b ∈ {4,8,12,...} — hex-aligned),
    r = leading-zero rank of the next 32 bits (1..33). Registers are
    the MERGEABLE state: coarser grains take max(r) per bucket, and
    because md5 is engine-shared the state is bit-identical anywhere.
    One map pass + one (group, bucket) max aggregate — map-side
    combinable, ≤ 2^b surviving rows per group."""
    if b % 4:
        raise ValueError("b must be a multiple of 4 (hex-aligned)")
    h = F.md5(F.col(value_col).cast("string").cast("binary"))
    bucket = F.conv(F.substring(h, 1, b // 4), 16, 10).cast("int")
    w = F.conv(F.substring(h, 1 + b // 4, 8), 16, 10).cast("bigint")
    # bit_length(w) as a sum of 32 exact integer comparisons (float
    # log2 would mis-round near powers of two); rank = 33 − bit_length
    bl = None
    for k in range(32):
        ind = (w >= F.lit(1 << k)).cast("int")
        bl = ind if bl is None else bl + ind
    rank = (F.lit(33) - bl).cast("int")
    base = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, bucket.alias("bucket"), rank.alias("r")
    )
    return base.groupBy(*group_cols, "bucket").agg(F.max("r").alias("r"))


def hll_md5_estimate(
    registers: DataFrame, group_cols: list[str], b: int = HLL_B
) -> DataFrame:
    """Finish a register table into ``(*group_cols, n_registers,
    ndv_estimate)``: harmonic-mean raw estimate α_m·m²/Σ2^(−M_j)
    (empty registers contribute 2^0 = 1) with the standard
    linear-counting switch for the small range (E ≤ 2.5m and zero
    registers remain). The finish runs on ≤ 2^b rows per group;
    every float step is either exact (powers of two, exact sums) or
    snapped (4dp floor-snap on the estimate), so the number is
    engine-stable."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(0.5), F.col("r"))).alias("sp"),
        F.count(F.lit(1)).cast("bigint").alias("present"),
    )
    s = F.col("sp") + (F.lit(m) - F.col("present"))
    raw = F.lit(alpha * m * m) / s
    zeros = F.lit(m) - F.col("present")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lc).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("present").alias("n_registers"),
        (F.floor(est * 1e4 + F.lit(0.5)) / 1e4).alias("ndv_estimate"),
    )
