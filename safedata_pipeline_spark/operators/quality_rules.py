"""Declarative data-quality expectations (Deequ-style rule suite).

Extension surface: the reference's compliance module scores a fixed
checklist (/root/reference/modules/compliance.py:18-42 — presence /
nulls / duplicate checks hard-coded against one table); production
pipelines need the general form: a user-declared RULE SUITE evaluated
in one pass, emitting one verdict row per rule plus a violations
worklist. The design follows the public Deequ / Great Expectations
model (Schelter et al., VLDB 2018: "Automating Large-Scale Data
Quality Verification"): rules compile to aggregate expressions so the
whole suite costs ONE scan regardless of rule count.

Rule kinds (each a dict; ``name`` optional, defaulted):
  * ``completeness``  — non-null fraction of ``col`` ≥ ``min_ratio``
  * ``uniqueness``    — distinct / non-null count of ``col`` ≥ ``min_ratio``
  * ``min`` / ``max`` / ``mean`` — the aggregate of ``col`` within
    [``low``, ``high``] (either bound optional)
  * ``pattern``       — fraction of non-null ``col`` matching regex
    ``regex`` ≥ ``min_ratio``
  * ``in_set``        — fraction of non-null ``col`` within ``allowed``
    ≥ ``min_ratio``
  * ``row_count``     — table rows within [``low``, ``high``]

Scale shape: ``check_rules`` compiles every rule to expressions inside
ONE wide aggregate (map-side combinable; count_distinct adds the usual
expand, still a single pass) and explodes the 1-row result into one
row per rule — no per-rule jobs, no collect. ``rule_violations`` is a
map-only filter producing the offending rows for row-level kinds.
Metrics round @6 so verdicts are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROUND_N = 6

_ROW_LEVEL = ("completeness", "pattern", "in_set", "min", "max")


def _metric_expr(df: DataFrame, rule: dict, idx: int) -> tuple[Column, str]:
    """Compile one rule to (metric aggregate, metric label)."""
    kind = rule["kind"]
    col = rule.get("col")
    if kind == "completeness":
        m = F.try_divide(F.count(F.col(col)), F.count(F.lit(1)))
    elif kind == "uniqueness":
        m = F.try_divide(F.count_distinct(F.col(col)), F.count(F.col(col)))
    elif kind == "min":
        m = F.min(F.col(col)).cast("double")
    elif kind == "max":
        m = F.max(F.col(col)).cast("double")
    elif kind == "mean":
        m = F.avg(F.col(col))
    elif kind == "pattern":
        hit = F.col(col).rlike(rule["regex"]).cast("bigint")
        m = F.try_divide(F.sum(hit), F.count(F.col(col)))
    elif kind == "in_set":
        hit = F.col(col).isin(list(rule["allowed"])).cast("bigint")
        m = F.try_divide(F.sum(hit), F.count(F.col(col)))
    elif kind == "row_count":
        m = F.count(F.lit(1)).cast("double")
    else:
        raise ValueError(f"unknown rule kind {kind!r}")
    return F.round(m.cast("double"), ROUND_N).alias(f"__m{idx}"), kind


def _bounds(rule: dict) -> tuple[float | None, float | None]:
    kind = rule["kind"]
    if kind in ("completeness", "uniqueness", "pattern", "in_set"):
        return float(rule.get("min_ratio", 1.0)), None
    return (
        float(rule["low"]) if "low" in rule else None,
        float(rule["high"]) if "high" in rule else None,
    )


def _rule_name(rule: dict) -> str:
    return rule.get("name") or f"{rule['kind']}_{rule.get('col', 'table')}"


def check_rules(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate the whole suite in one aggregate pass → one row per
    rule: ``(rule, col, metric, value, low, high, passed)``.

    ``low``/``high`` are the inclusive bounds the metric must fall in
    (ratio kinds get low=min_ratio, high NULL). ``passed`` is NULL-safe:
    a NULL metric (e.g. min of an all-null column) fails the rule.
    """
    if not rules:
        raise ValueError("empty rule suite")
    aggs = [_metric_expr(df, r, i)[0] for i, r in enumerate(rules)]
    m = df.agg(*aggs)
    structs = []
    for i, r in enumerate(rules):
        low, high = _bounds(r)
        v = F.col(f"__m{i}")
        ok = F.lit(True)
        if low is not None:
            ok = ok & (v >= F.lit(low))
        if high is not None:
            ok = ok & (v <= F.lit(high))
        structs.append(
            F.struct(
                F.lit(_rule_name(r)).alias("rule"),
                F.lit(r.get("col", "")).alias("col"),
                F.lit(r["kind"]).alias("metric"),
                v.alias("value"),
                F.lit(low).cast("double").alias("low"),
                F.lit(high).cast("double").alias("high"),
                F.coalesce(ok, F.lit(False)).alias("passed"),
            )
        )
    return m.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def rule_violations(df: DataFrame, rule: dict) -> DataFrame:
    """The offending rows for a row-level rule — the remediation
    worklist ``check_rules`` verdicts point at. Map-only filter:
      * completeness → rows with NULL ``col``
      * pattern / in_set → non-null rows failing the predicate
      * min / max → rows outside [low, high]
    Aggregate-only kinds (uniqueness, mean, row_count) have no
    per-row witness and raise."""
    kind = rule["kind"]
    col = rule.get("col")
    if kind not in _ROW_LEVEL:
        raise ValueError(f"rule kind {kind!r} has no row-level violations")
    if kind == "completeness":
        return df.where(F.col(col).isNull())
    if kind == "pattern":
        return df.where(F.col(col).isNotNull() & ~F.col(col).rlike(rule["regex"]))
    if kind == "in_set":
        return df.where(
            F.col(col).isNotNull() & ~F.col(col).isin(list(rule["allowed"]))
        )
    low, high = _bounds(rule)
    cond = F.lit(False)
    if low is not None:
        cond = cond | (F.col(col) < F.lit(low))
    if high is not None:
        cond = cond | (F.col(col) > F.lit(high))
    return df.where(F.col(col).isNotNull() & cond)


def check_rules_by(
    df: DataFrame, group_cols: list[str], rules: list[dict]
) -> DataFrame:
    """Per-group rule evaluation — the suite applied independently to
    every ``group_cols`` slice (per-source corpus gating, per-tenant
    QA). Output: group columns + the same verdict columns as
    ``check_rules``, one row per (group × rule).

    Shape: ONE groupBy pass — the rules compile into the same wide
    aggregate, keyed by the group; the per-rule explode multiplies the
    (small) group table, never the data. ``row_count`` here means rows
    per group."""
    if not rules:
        raise ValueError("empty rule suite")
    if not group_cols:
        raise ValueError("empty group_cols; use check_rules")
    aggs = [_metric_expr(df, r, i)[0] for i, r in enumerate(rules)]
    m = df.groupBy(*group_cols).agg(*aggs)
    structs = []
    for i, r in enumerate(rules):
        low, high = _bounds(r)
        v = F.col(f"__m{i}")
        ok = F.lit(True)
        if low is not None:
            ok = ok & (v >= F.lit(low))
        if high is not None:
            ok = ok & (v <= F.lit(high))
        structs.append(
            F.struct(
                F.lit(_rule_name(r)).alias("rule"),
                F.lit(r.get("col", "")).alias("col"),
                F.lit(r["kind"]).alias("metric"),
                v.alias("value"),
                F.lit(low).cast("double").alias("low"),
                F.lit(high).cast("double").alias("high"),
                F.coalesce(ok, F.lit(False)).alias("passed"),
            )
        )
    return m.select(*group_cols, F.explode(F.array(*structs)).alias("r")).select(
        *group_cols, "r.*"
    )


def referential_integrity(
    child: DataFrame, parent: DataFrame, keys: dict[str, str]
) -> DataFrame:
    """Cross-table FK check: every non-null ``keys`` tuple in ``child``
    must exist in ``parent``. ``keys`` maps child column → parent
    column. Output (1 row): ``(n_child, n_null_keys, n_orphans,
    orphan_ratio, ri_ok)`` — rows whose key tuple contains a NULL are
    counted separately (SQL FK semantics: NULL keys don't violate).

    Shape: distinct parent keys (a groupBy on the parent's key — at
    100 TB the dimension side, typically broadcastable after distinct)
    + ONE left join and one aggregate over the child; no second child
    scan."""
    if not keys:
        raise ValueError("empty key mapping")
    ccols = list(keys.keys())
    pk = (
        parent.select(*[F.col(p).alias(c) for c, p in keys.items()])
        .dropDuplicates()
        .withColumn("__hit", F.lit(1))
    )
    has_null = None
    for c in ccols:
        n = F.col(c).isNull()
        has_null = n if has_null is None else (has_null | n)
    j = child.select(*ccols).join(pk, on=ccols, how="left")
    orphan = (~has_null) & F.col("__hit").isNull()
    zero = F.lit(0).cast("bigint")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_child"),
        F.coalesce(F.sum(has_null.cast("bigint")), zero).alias("n_null_keys"),
        F.coalesce(F.sum(orphan.cast("bigint")), zero).alias("n_orphans"),
        F.round(
            F.try_divide(F.sum(orphan.cast("bigint")), F.count(F.lit(1))), ROUND_N
        ).alias("orphan_ratio"),
        F.coalesce(F.sum(orphan.cast("bigint")) == 0, F.lit(True)).alias("ri_ok"),
    )


def benford_screen(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit screen — the classic fabricated-data
    / unit-mixing detector for naturally-spanning numeric columns
    (amounts, populations): observed leading-significant-digit
    frequencies vs log₁₀(1+1/d), with the χ² distance.

    The leading digit comes from the STRING form (first [1-9] of the
    value's decimal rendering), not from floor(x/10^floor(log10 x)) —
    the float-log route misclassifies exact powers of ten when libm
    returns 2.999… for log10(1000). One map-side extract + a 9-key
    groupBy; the total rides a broadcast 1-row aggregate. Output per
    digit: (digit, n, observed_freq, expected_freq, chi2_term)."""
    d = F.regexp_extract(F.abs(F.col(col)).cast("string"), "[1-9]", 0)
    g = (
        df.where(F.col(col).isNotNull() & (F.col(col) != 0))
        .where(d != "")
        .groupBy(d.cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = g.agg(F.sum("n").cast("double").alias("tot"))
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    obs = F.col("n") / F.col("tot")
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("observed_freq"),
            F.round(exp, 6).alias("expected_freq"),
            F.round((obs - exp) * (obs - exp) / exp * F.col("tot"), 6).alias("chi2_term"),
        )
    )
