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

from pyspark.sql import DataFrame
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
