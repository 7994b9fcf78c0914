"""Ordered time-series analytics over the events stream (SURVEY §2.8
extension surface; no reference counterpart — the reference has no
event-time data at all, so these are pure Spark analytic-window
idioms).

Scale shape: every window here partitions by ``user_id`` — millions of
small per-user partitions spread across executors; no global ordered
window anywhere. The ordering key is (ts, event_id): (user_id, ts) is
unique in the fixtures, but event_id breaks any tie deterministically,
so the rolling frames are a total order and the results are
engine-exact (the oracle runs the identical ROWS BETWEEN frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND_N = 6


def rolling_user_stats(
    events: DataFrame,
    n: int = 3,
    ts_col: str = "ts",
    user_col: str = "user_id",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event rolling statistics over each user's last ``n`` events
    (inclusive): mean, max, and the actual frame size — the
    feature-engineering / anomaly-baseline query ("is this event far
    from this user's recent behavior?").

    One analytic window, ROWS-framed (never RANGE: row frames are
    O(1) memory per step and deterministic under the total order).
    The rolling mean sums DECIMAL and divides by the frame count so
    the float result is frame-order independent. Output: one row per
    event — (event_id, user_id, ts, value, roll_mean, roll_max,
    roll_n).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    v_dec = F.col(val_col).cast("decimal(38,12)")
    return events.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col).cast("timestamp_ntz").alias(ts_col),
        F.col(val_col),
        # exact DECIMAL sum → double ONCE, then double/bigint divide:
        # decimal÷int result scales differ between engines, double
        # division does not
        F.round(
            F.sum(v_dec).over(w).cast("double") / F.count(F.lit(1)).over(w),
            ROUND_N,
        ).alias("roll_mean"),
        F.max(F.col(val_col)).over(w).alias("roll_max"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("roll_n"),
    )


def hourly_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Hour-over-hour user retention: for each hour, how many distinct
    users were active, and how many of them return in the NEXT hour —
    the cohort-retention dashboard shape. Output one row per hour:
    ``(hour_start, n_users, n_retained, retention_rate)``.

    Shape: distinct (user, hour) pairs (one groupBy — the only shuffle
    touching event rows), a per-user ``lead`` over their ordered hour
    list (per-user partitions, total order: hours are distinct within
    a user), then a per-hour count. Retained = the user's next active
    hour is exactly +1h. The last hour has no next hour to look into
    and still reports its (possibly zero) retention honestly.
    """
    uh = (
        events.select(
            F.col(user_col).alias("u"),
            F.date_trunc("hour", F.col(ts_col)).cast("timestamp_ntz").alias("h"),
        )
        .groupBy("u", "h")
        .agg(F.lit(1).alias("__one"))
    )
    w = Window.partitionBy("u").orderBy("h")
    flagged = uh.select(
        "u",
        "h",
        (
            F.lead("h").over(w) == F.col("h") + F.expr("INTERVAL 1 HOUR")
        ).cast("bigint").alias("ret"),
    )
    return flagged.groupBy(F.col("h").alias("hour_start")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.coalesce(F.sum("ret"), F.lit(0)).cast("bigint").alias("n_retained"),
        F.round(
            F.coalesce(F.sum("ret"), F.lit(0)) / F.count(F.lit(1)), ROUND_N
        ).alias("retention_rate"),
    )


def rolling_anomalies(
    events: DataFrame,
    n: int = 5,
    factor: float = 3.0,
    min_baseline_n: int = 3,
    ts_col: str = "ts",
    user_col: str = "user_id",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Events whose value exceeds ``factor ×`` the mean of the user's
    PREVIOUS ``n`` events — the per-entity anomaly monitor. The frame
    is strictly preceding (``[-n, -1]``): the current row never
    contaminates its own baseline. Events with fewer than
    ``min_baseline_n`` prior events are skipped — no evidence is not
    an anomaly. Output: (event_id, user_id, ts, value, baseline_mean,
    baseline_n), anomalies only.

    Same scale shape as ``rolling_user_stats``: one per-user ROWS
    window under a total order, DECIMAL-exact baseline sums.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-n, -1)
    )
    v_dec = F.col(val_col).cast("decimal(38,12)")
    staged = events.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col).cast("timestamp_ntz").alias(ts_col),
        F.col(val_col),
        F.round(
            F.sum(v_dec).over(w).cast("double") / F.count(F.lit(1)).over(w),
            ROUND_N,
        ).alias("baseline_mean"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("baseline_n"),
    )
    return staged.where(
        (F.col("baseline_n") >= min_baseline_n)
        & (F.col(val_col) > F.lit(float(factor)) * F.col("baseline_mean"))
    )


def per_key_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    min_points: int = 2,
) -> DataFrame:
    """Per-key least-squares trend of ``value_col`` over event time —
    the "which users/sources are drifting up or down?" monitor.
    Output: one row per key — (key, n_points, slope_per_hour,
    intercept) with x = hours since 2024-01-01 UTC, so the slope unit
    is value-per-hour (shift-invariant) and the intercept is the fitted
    value at that origin. Keys with fewer than ``min_points`` points
    (or a degenerate constant x) report NULL slope.

    Shape: ONE groupBy accumulating the four regression moment sums
    (Σx, Σy, Σxy, Σx²) as DECIMAL(38,10) of round@10 inputs — exact,
    order-independent, map-side combinable — then the closed-form
    slope/intercept in double. Spark's built-in ``regr_slope`` is the
    obvious alternative, but its streaming float sums differ from
    other engines in the 6th decimal (measured vs DuckDB); the exact
    decimal moments make the result engine-independent, the same
    discipline as the χ²/PSI sums. No window, no Python.
    """
    # hours since a FIXED 2024-01-01 origin, not the unix epoch: the
    # slope is shift-invariant, and the small origin keeps x² within
    # decimal range and the double-side algebra well-conditioned
    # cast-to-double keeps the microsecond fraction (unix_timestamp
    # truncates to whole seconds and would disagree with SQL epoch())
    xr = F.round(
        (F.col(ts_col).cast("double") - F.lit(1704067200.0)) / F.lit(3600.0),
        ROUND_N,
    )
    yr = F.round(F.col(value_col).cast("double"), ROUND_N)
    dec = "decimal(38,10)"
    g = df.where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()).groupBy(
        F.col(key_col).alias("key")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum(xr.cast(dec)).cast("double").alias("sx"),
        F.sum(yr.cast(dec)).cast("double").alias("sy"),
        F.sum(F.round(xr * yr, 10).cast(dec)).cast("double").alias("sxy"),
        F.sum(F.round(xr * xr, 10).cast(dec)).cast("double").alias("sxx"),
    )
    n = F.col("n_points").cast("double")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    fit_ok = (F.col("n_points") >= min_points) & (den != 0)
    return g.select(
        "key",
        "n_points",
        F.when(fit_ok, F.round(slope, ROUND_N)).alias("slope_per_hour"),
        F.when(fit_ok, F.round(intercept, ROUND_N)).alias("intercept"),
    )


def hourly_percentiles(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    probs: tuple = (0.5, 0.95, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Percentile bands per event-time hour — the latency/size
    dashboard query. Output: (hour_start, n, p50, p95, p99 ...) with
    one column per requested prob.

    ONE grouped percentile-array aggregate (no per-prob jobs);
    ``exact=True`` is the oracle-parity path (``F.percentile``),
    ``exact=False`` the 100 TB one-pass sketch (``percentile_approx``)
    — same switch discipline as ``numeric_profile``."""
    y = F.col(value_col).cast("double")
    fn = F.percentile if exact else F.percentile_approx
    arr = fn(y, F.array(*[F.lit(p) for p in probs]))
    g = df.where(F.col(ts_col).isNotNull() & y.isNotNull()).groupBy(
        F.date_trunc("hour", F.col(ts_col)).cast("timestamp_ntz").alias("hour_start")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"), arr.alias("__p"))
    cols = [
        F.round(F.element_at(F.col("__p"), i + 1), ROUND_N).alias(
            f"p{int(round(p * 100)):02d}"
        )
        for i, p in enumerate(probs)
    ]
    return g.select("hour_start", "n", *cols)


def growth_accounting(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "day",
) -> DataFrame:
    """Growth-accounting dashboard: per period, how many active users
    are NEW (first period ever), RETAINED (active in the immediately
    preceding period), or RESURRECTED (active before, but not in the
    preceding period) — the standard DAU decomposition
    (new + retained + resurrected = active).

    Shape: one distinct (user, period) aggregation over the events
    (the only pass that touches event rows), then a per-user ``lag``
    window on that much smaller activity table, then one groupBy per
    period. All counts integer; period boundaries via ``date_trunc``
    so the oracle computes identical buckets.
    """
    # gap math on TimestampType (ntz refuses the double cast); output
    # casts to ntz for oracle parity like every other hour/day grid
    p = F.date_trunc(period, F.col(ts_col))
    act = (
        df.where(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("u"), p.alias("p"))
        .distinct()
    )
    w = Window.partitionBy("u").orderBy("p")
    step = {"day": 86400, "hour": 3600}.get(period)
    if step is None:
        raise ValueError(f"unsupported period {period!r} (day or hour)")
    gap = F.col("p").cast("double") - F.lag("p").over(w).cast("double")
    tagged = act.select(
        "p",
        F.when(gap.isNull(), F.lit("new"))
        .when(gap <= step, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("status"),
    )
    return tagged.groupBy(
        F.col("p").cast("timestamp_ntz").alias("period_start")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum((F.col("status") == "new").cast("bigint")).alias("n_new"),
        F.sum((F.col("status") == "retained").cast("bigint")).alias("n_retained"),
        F.sum((F.col("status") == "resurrected").cast("bigint")).alias("n_resurrected"),
    )


def trending_per_period(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    period: str = "hour",
    top_k: int = 3,
) -> DataFrame:
    """Top-k keys per period by event count — the "trending now"
    dashboard. Aggregate-FIRST (groupBy period × key, map-side
    combinable), then rank within each period on the tiny aggregate
    table (periods × keys rows, never event rows). Deterministic ties:
    (count desc, key asc). Output: (period_start, rank, key, n)."""
    p = F.date_trunc(period, F.col(ts_col)).cast("timestamp_ntz")
    counts = (
        df.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(p.alias("period_start"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("period_start").orderBy(F.desc("n"), F.asc("key"))
    return (
        counts.select(
            "period_start", F.row_number().over(w).alias("rank"), "key", "n"
        )
        .where(F.col("rank") <= top_k)
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle: users grouped by FIRST active day
    (their cohort); for each (cohort_day, day_offset) cell, how many
    of that cohort were active ``offset`` days later and what fraction
    of the cohort that is — the classic retention heatmap. Output:
    (cohort_day, day_offset, n_users, retention_rate); offset 0 rows
    carry the cohort size with rate 1.

    Shape: one distinct (user, day) pass over events; cohorts via a
    min-aggregate on that table; one join of activity-days against
    the (user, cohort) table keyed on user (narrow build side); one
    groupBy on the (cohort, offset) grid. Event rows are touched
    once; everything after runs on user- or grid-sized tables.
    """
    act = (
        df.where(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("u"),
            F.date_trunc("day", F.col(ts_col)).alias("d"),
        )
        .distinct()
    )
    cohorts = act.groupBy("u").agg(F.min("d").alias("c0"))
    sizes = cohorts.groupBy("c0").agg(F.count(F.lit(1)).cast("bigint").alias("cohort_n"))
    joined = act.join(cohorts, "u").select(
        "c0", F.datediff(F.col("d"), F.col("c0")).alias("day_offset")
    )
    grid = joined.groupBy("c0", "day_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    return grid.join(sizes, "c0").select(
        F.col("c0").cast("timestamp_ntz").alias("cohort_day"),
        F.col("day_offset").cast("int").alias("day_offset"),
        "n_users",
        F.round(F.col("n_users") / F.col("cohort_n"), ROUND_N).alias("retention_rate"),
    )


def cusum_hourly(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    k: float = 0.5,
) -> DataFrame:
    """Two-sided CUSUM change-point timeline over the hourly mean of a
    metric — the sequential drift detector that fires on small
    sustained shifts a per-hour z-test misses: S⁺ₜ = max(0, S⁺ₜ₋₁ +
    zₜ − k), S⁻ₜ = max(0, S⁻ₜ₋₁ − zₜ − k), with zₜ the hourly mean
    standardized against the hourly-mean population and k the
    allowance in std units. Output: (hour_start, n, z, s_pos, s_neg)
    — a downstream `WHERE s_pos > h` picks alarm hours for any h.

    Aggregate-FIRST like every timeline operator: events collapse to
    the hour grid in one DECIMAL-sum groupBy; mean/std of the grid
    ride a broadcast 1-row aggregate; the inherently-sequential CUSUM
    recursion then runs as ONE expression fold (`F.aggregate`) over
    the sorted hour array — bounded by the grid size (dashboard-
    scale: a year is 8760 rows), never by event rows. Each fold step
    rounds to 9 dp, so the trajectory is engine-deterministic — the
    oracle replays the identical recurrence as a recursive CTE.
    """
    dec = "decimal(38,6)"
    g = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("hour_start"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col(value_col).cast("double"), 6).cast(dec)).alias("s"),
        )
        .select(
            "hour_start", "n", F.round(F.col("s").cast("double") / F.col("n"), 9).alias("m")
        )
    )
    stats = g.agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum(F.col("m").cast(dec)).alias("sm"),
        F.sum(F.round(F.col("m") * F.col("m"), 6).cast(dec)).alias("sm2"),
    ).select(
        (F.col("sm").cast("double") / F.col("cnt")).alias("mu"),
        F.sqrt(
            F.greatest(
                F.col("sm2").cast("double") / F.col("cnt")
                - (F.col("sm").cast("double") / F.col("cnt"))
                * (F.col("sm").cast("double") / F.col("cnt")),
                F.lit(0.0),
            )
        ).alias("sigma"),
    )
    z = F.when(F.col("sigma") > 0, F.round((F.col("m") - F.col("mu")) / F.col("sigma"), 9)).otherwise(
        F.lit(0.0)
    )
    zg = g.crossJoin(F.broadcast(stats)).select("hour_start", "n", z.alias("z"))
    row_t = "struct<hour_start:timestamp,n:bigint,z:double,s_pos:double,s_neg:double>"
    arr = zg.agg(
        F.array_sort(F.collect_list(F.struct("hour_start", "n", "z"))).alias("xs")
    )
    init = F.struct(
        F.array().cast(f"array<{row_t}>").alias("rows"),
        F.lit(0.0).alias("sp"),
        F.lit(0.0).alias("sn"),
    )

    def step(acc, x):
        sp = F.round(F.greatest(F.lit(0.0), acc["sp"] + x["z"] - F.lit(k)), 9)
        sn = F.round(F.greatest(F.lit(0.0), acc["sn"] - x["z"] - F.lit(k)), 9)
        row = F.struct(
            x["hour_start"].alias("hour_start"),
            x["n"].alias("n"),
            x["z"].alias("z"),
            sp.alias("s_pos"),
            sn.alias("s_neg"),
        )
        return F.struct(
            F.concat(acc["rows"], F.array(row)).alias("rows"), sp.alias("sp"), sn.alias("sn")
        )

    folded = arr.select(F.aggregate("xs", init, step).alias("acc"))
    return folded.select(F.explode(F.col("acc.rows")).alias("r")).select(
        F.col("r.hour_start").alias("hour_start"),
        F.col("r.n").alias("n"),
        F.col("r.z").alias("z"),
        F.col("r.s_pos").alias("s_pos"),
        F.col("r.s_neg").alias("s_neg"),
    )


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (prev_type, next_type, n, prob) with prob normalized
    per prev_type row — the path-analysis view behind funnel design
    ('what actually follows a signup?') and bot detection (spikes on
    impossible transitions).

    One per-user window (lag under (ts, tiebreak) total order — the
    tiebreak makes same-timestamp sequences deterministic) + one
    (prev, next)-keyed groupBy; the per-row normalizer joins a tiny
    per-prev aggregate back by broadcast. |types|² output rows —
    dashboard-sized. Scale: windows partition by user (bounded per
    key); no global sort."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    seq = df.select(
        F.col(user_col),
        F.col(type_col).alias("next_type"),
        F.lag(F.col(type_col)).over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    g = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = g.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        g.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("row_total"), ROUND_N).alias("prob"),
        )
    )


def attribute_conversions(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    lookback_hours: float = 24.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Marketing-style conversion attribution: for every conversion
    event, the FIRST and LAST touch event of the same user inside the
    lookback window — (conversion_id, user, conversion_ts, n_touches,
    first_touch_id, first_touch_ts, last_touch_id, last_touch_ts);
    conversions with no in-window touch keep a row with NULLs (they
    are the unattributable share a dashboard must show, not hide).

    Shape: candidate (conversion, touch) pairs come from ONE
    user-keyed equi-join with the half-open window predicate
    ``conv_ts − lookback < touch_ts ≤ conv_ts`` riding it — never a
    time-unbounded pair stream — then one groupBy(conversion) takes
    min/max ``(ts, id)`` structs (map-side combinable; the struct
    tiebreak makes simultaneous touches deterministic). At 100 TB the
    user-keyed join is the same shuffle the sessionizer pays, and AQE
    splits hot users; pair count is bounded by touches-per-user-per-
    window, the quantity attribution is ABOUT.
    """
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(id_col).alias("conversion_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("conversion_ts"),
    )
    touch = events.where(F.col(type_col).isin(touch_types)).select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
    )
    # fractional hours via a seconds interval (HOURS literals must be
    # integral); make_interval keeps it a pure expression
    win = F.make_interval(secs=F.lit(float(lookback_hours) * 3600.0))
    pairs = conv.join(
        touch,
        on=[
            conv["user_id"] == touch["user_id"],
            touch["touch_ts"] <= conv["conversion_ts"],
            touch["touch_ts"] > conv["conversion_ts"] - win,
        ],
        how="left",
    ).select(
        "conversion_id",
        conv["user_id"].alias("user_id"),
        "conversion_ts",
        "touch_id",
        "touch_ts",
    )
    first = F.min(F.when(F.col("touch_id").isNotNull(), F.struct("touch_ts", "touch_id")))
    last = F.max(F.when(F.col("touch_id").isNotNull(), F.struct("touch_ts", "touch_id")))
    return pairs.groupBy("conversion_id", "user_id", "conversion_ts").agg(
        F.sum(F.col("touch_id").isNotNull().cast("bigint")).cast("bigint").alias("n_touches"),
        first.getField("touch_id").alias("first_touch_id"),
        first.getField("touch_ts").alias("first_touch_ts"),
        last.getField("touch_id").alias("last_touch_id"),
        last.getField("touch_ts").alias("last_touch_ts"),
    )
