"""Anonymity metrics — k-anonymity / l-diversity over quasi-identifier
groups (extension surface: the canonical SDC audit the reference's
privacy pipeline stops short of; its suppression/generalization steps
are exactly the remedies these metrics gate. Reference context:
/root/reference/modules/privacy.py transforms columns but never
measures the resulting equivalence classes).

Definitions (public literature — Sweeney 2002 for k-anonymity,
Machanavajjhala et al. 2007 for l-diversity):
  * An *equivalence class* is a group of rows sharing every
    quasi-identifier value. A table is k-anonymous iff every class has
    ≥ k rows.
  * A class is l-diverse for a sensitive column iff it contains ≥ l
    distinct sensitive values; the table's l is the minimum.

Scale shape: both metrics are ONE groupBy over the QI columns
(map-side combinable count / distinct-count) followed by a tiny
aggregate — no join, no window, no collect beyond the scalar result
row. NULL QI values form their own class (Spark groupBy keeps null
groups), matching the treatment of NaN as a category in
``sdc_suppress``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equivalence_classes(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """One row per equivalence class: the QI values + class size.
    The building block both metrics share."""
    return df.groupBy(*qi_cols).agg(F.count(F.lit(1)).cast("bigint").alias("class_size"))


def k_anonymity(df: DataFrame, qi_cols: list[str], k: int = 5) -> DataFrame:
    """Table-level k-anonymity audit → 1 row:
    ``(k_anonymity, n_classes, n_violating_classes, n_rows_at_risk,
    satisfies_k)`` where ``k_anonymity`` is the smallest class size
    (the largest k the table satisfies), violating classes are those
    under the requested ``k``, and rows-at-risk counts rows in them."""
    cls = equivalence_classes(df, qi_cols)
    viol = F.col("class_size") < k
    return cls.agg(
        F.min("class_size").alias("k_anonymity"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(viol.cast("bigint")).alias("n_violating_classes"),
        F.sum(F.when(viol, F.col("class_size")).otherwise(F.lit(0))).alias("n_rows_at_risk"),
        F.max(F.lit(k)).alias("k_required"),
        (F.min("class_size") >= k).alias("satisfies_k"),
    )


def k_anonymity_violations(df: DataFrame, qi_cols: list[str], k: int = 5) -> DataFrame:
    """The violating equivalence classes themselves (QI values +
    class_size < k), for remediation — feed these to ``sdc_suppress``
    / ``generalize_numeric`` parameters. Sorted output is the caller's
    concern; this stays a plain filtered aggregate."""
    return equivalence_classes(df, qi_cols).where(F.col("class_size") < k)


def l_diversity(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """Table-level l-diversity audit → 1 row:
    ``(l_diversity, n_classes, n_violating_classes, satisfies_l)``.
    ``l_diversity`` = min over classes of the exact count of distinct
    non-null sensitive values (distinct l-diversity, the standard
    baseline form)."""
    per_class = df.groupBy(*qi_cols).agg(
        F.count_distinct(F.col(sensitive_col)).cast("bigint").alias("n_sensitive")
    )
    viol = F.col("n_sensitive") < l
    return per_class.agg(
        F.min("n_sensitive").alias("l_diversity"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(viol.cast("bigint")).alias("n_violating_classes"),
        F.max(F.lit(l)).alias("l_required"),
        (F.min("n_sensitive") >= l).alias("satisfies_l"),
    )


def enforce_k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    mask: str = "*",
    residual: str = "keep",
) -> DataFrame:
    """Suppression-based k-anonymity ENFORCEMENT — the remedy the
    audits gate: every row in an equivalence class smaller than ``k``
    gets ALL its quasi-identifier values replaced by ``mask``, merging
    the risky rows into one suppressed class (QI columns come back as
    strings; non-QI columns pass through untouched).

    ``residual`` controls the corner where the merged suppressed class
    is ITSELF still smaller than k: ``"keep"`` returns it (callers
    re-audit with ``k_anonymity``), ``"drop"`` removes those rows so
    the output is unconditionally k-anonymous.

    Shape: one analytic count over the QI partition (classes are many
    and small — spreads well) + a map-side CASE per QI column; the
    ``drop`` path reuses the same windowed counts, no second scan.
    """
    if residual not in ("keep", "drop"):
        raise ValueError(f"residual must be 'keep' or 'drop', got {residual!r}")
    w = Window.partitionBy(*qi_cols)
    cnt = F.count(F.lit(1)).over(w)
    out_cols = [
        F.when(cnt < k, F.lit(mask)).otherwise(F.col(c).cast("string")).alias(c)
        if c in qi_cols
        else F.col(c)
        for c in df.columns
    ]
    masked = df.select(*out_cols, (cnt < k).alias("__was_masked"))
    if residual == "drop":
        w2 = Window.partitionBy(*[F.col(c) for c in qi_cols])
        masked = masked.withColumn("__n2", F.count(F.lit(1)).over(w2)).where(
            (~F.col("__was_masked")) | (F.col("__n2") >= k)
        ).drop("__n2")
    return masked.drop("__was_masked")


def t_closeness(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, t: float = 0.2
) -> DataFrame:
    """Table-level t-closeness audit (Li, Li & Venkatasubramanian 2007
    — the third leg of the SDC triad: k bounds class size, l bounds
    sensitive diversity, t bounds how much a class's sensitive-value
    DISTRIBUTION deviates from the global one). Categorical sensitive
    attribute; distance = total variation (= the Earth Mover's
    Distance under uniform ground distance, the paper's categorical
    case). → 1 row ``(t_closeness, n_classes, n_violating_classes,
    t_required, satisfies_t)`` with t_closeness = max over classes of
    ½ Σ_v |p_class(v) − p_global(v)|.

    Scale shape: one groupBy over (QI, sensitive), from which class
    sizes AND the global distribution both derive (no second scan).
    The comparison grid is classes × |sensitive categories| — the
    global distribution is O(categories) and broadcast, so the grid is
    a bounded-width blowup of the class table, never of the data.
    NULL sensitive values form their own category, like NULL QIs.
    Per-term |Δp| rounds @10 → DECIMAL-sum so the per-class float sum
    is partition-order and engine independent.
    """
    d = df.select(
        *qi_cols,
        F.coalesce(F.col(sensitive_col).cast("string"), F.lit("__NULL__")).alias("__s"),
    )
    cs = d.groupBy(*qi_cols, "__s").agg(F.count(F.lit(1)).alias("c"))
    classes = cs.groupBy(*qi_cols).agg(F.sum("c").alias("n_c"))
    w_all = Window.partitionBy()
    glob = (
        cs.groupBy("__s")
        .agg(F.sum("c").alias("g"))
        .select("__s", "g", F.sum("g").over(w_all).alias("N"))
    )
    grid = classes.crossJoin(F.broadcast(glob))
    # rename the count side's keys: grid derives from cs, and a raw
    # self-join on shared names trips conflicting-reference resolution
    c2 = cs
    for i, q in enumerate(qi_cols):
        c2 = c2.withColumnRenamed(q, f"__q{i}")
    c2 = c2.withColumnRenamed("__s", "__s2")
    cond = F.col("__s") == F.col("__s2")
    for i, q in enumerate(qi_cols):
        cond = cond & F.col(q).eqNullSafe(F.col(f"__q{i}"))
    j = grid.join(c2, on=cond, how="left").select(
        *qi_cols, "n_c", "g", "N", F.coalesce("c", F.lit(0)).alias("c")
    )
    term = F.round(
        F.abs(F.col("c") / F.col("n_c") - F.col("g") / F.col("N")), 10
    ).cast("decimal(38,10)")
    per_class = j.groupBy(*qi_cols).agg(
        F.round(F.sum(term).cast("double") / 2, 6).alias("tv")
    )
    return per_class.agg(
        F.round(F.max("tv"), 6).alias("t_closeness"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum((F.col("tv") > t).cast("bigint")).alias("n_violating_classes"),
        F.max(F.lit(float(t))).alias("t_required"),
        (F.max("tv") <= t).alias("satisfies_t"),
    )
