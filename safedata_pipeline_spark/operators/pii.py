"""PII detection and redaction over text columns — the reference's
privacy mission (suppression/generalization, privacy.py:4-22) extended
to unstructured text, which is what an LLM training corpus needs
scrubbed before use.

Both operators are pure ``regexp_*`` column expressions: JVM-side,
whole-stage codegen, embarrassingly parallel over documents — the same
scale profile as the text-analysis family. Patterns deliberately use
only the regex subset Java and RE2 agree on (no backrefs, no
lookaround), so the DuckDB oracle evaluates the identical semantics.

At 100 TB: redaction is a map-only pass (no shuffle anywhere); the
scan's per-type counts aggregate map-side. Pattern sophistication
(checksums, context windows, learned NER) plugs in behind the same
schema as a Pandas-UDF variant without changing the pipeline shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters for redaction: longer/more-specific first so e.g. an
# SSN inside a longer digit run isn't partially masked
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "card16": r"\b\d{16}\b",
}


def pii_scan(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts per type + total.
    Output: (doc_id, n_email, n_ssn, n_phone, n_ipv4, n_card16, n_pii)."""
    t = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }
    total = None
    cols = [F.col(id_col)]
    for name, c in counts.items():
        cols.append(c.cast("bigint").alias(f"n_{name}"))
        total = c if total is None else total + c
    cols.append(total.cast("bigint").alias("n_pii"))
    return df.select(*cols)


def pii_redact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Replace every PII match with a typed placeholder token.
    Output: (doc_id, text) with e.g. ``[EMAIL]`` substituted."""
    t = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        t = F.regexp_replace(t, pat, f"[{name.upper()}]")
    return df.select(id_col, t.alias(text_col))
