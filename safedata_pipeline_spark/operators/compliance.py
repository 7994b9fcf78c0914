"""Compliance checklist (SURVEY §2.3 A10; reference modules/compliance.py).

The checklist is static metadata (12 items: 7 DPDP + 5 GDPR,
compliance.py:3-19); the only data operation is the completion score
``mean(status)`` (compliance.py:25-28). We keep the items as plain
tuples and expose both a tiny DataFrame and the score aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (key, description, regime) — items mirror compliance.py:3-19.
CHECKLIST_ITEMS = [
    ("lawful_purpose_documented", "Lawful purpose documented for processing/sharing", "DPDP"),
    ("consent_or_legal_basis", "Consent or other legal basis recorded", "DPDP"),
    ("pii_identified", "PII fields identified and cataloged", "DPDP"),
    ("minimization_applied", "Data minimization applied (only necessary fields retained)", "DPDP"),
    ("privacy_techniques", "Privacy techniques applied (SDC/DP/Synthetic)", "DPDP"),
    ("logging_enabled", "Logging/Audit trail enabled for data transformations", "DPDP"),
    ("retention_policy", "Retention period defined & enforced", "DPDP"),
    ("dpa_dpia_done", "DPA/DPIA performed when required", "GDPR"),
    ("dpo_contact", "Data Protection Officer contact available (if required)", "GDPR"),
    ("data_subject_rights", "Mechanism for data subject rights (access, rectification, erasure)", "GDPR"),
    ("cross_border_checks", "Cross-border transfer checks (SCCs/adequacy)", "GDPR"),
    ("privacy_by_design", "Privacy by design/defaults considered", "GDPR"),
]


def default_checklist(
    spark: SparkSession,
    done_keys: set[str] | frozenset[str] = frozenset(),
    notes: dict[str, str] | None = None,
) -> DataFrame:
    """Checklist table; ``status`` true for keys in ``done_keys``
    (reference default: all False, compliance.py:23). ``notes`` carries
    free-text per key, defaulting to "" exactly like the reference
    schema (key, description, status, notes); ``regime`` is our
    extension column tagging DPDP vs GDPR items."""
    notes = notes or {}
    rows = [(k, d, r, k in done_keys, notes.get(k, "")) for k, d, r in CHECKLIST_ITEMS]
    return spark.createDataFrame(
        rows, "key string, description string, regime string, status boolean, notes string"
    )


def checklist_score(checklist: DataFrame) -> DataFrame:
    """Completion score = mean(status) (compliance.py:25-28), plus item
    counts; empty checklist scores 0.0."""
    return checklist.agg(
        F.round(F.coalesce(F.avg(F.col("status").cast("double")), F.lit(0.0)), 6).alias("score"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("status").cast("long")).alias("n_done"),
    )
