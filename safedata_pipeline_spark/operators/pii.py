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


# Credential material in a training corpus is worse than PII: a model
# memorizes and replays it verbatim. Same regex discipline (Java∩RE2,
# no backrefs/lookaround); patterns target structured token FORMATS,
# not entropy heuristics, so both engines agree exactly.
SECRET_PATTERNS: dict[str, str] = {
    # AWS access key id: fixed AKIA prefix + 16 uppercase base32 chars
    "aws_key": r"\bAKIA[0-9A-Z]{16}\b",
    # JWT: three dot-separated base64url segments, header always eyJ
    "jwt": r"\beyJ[A-Za-z0-9_-]{10,}\.[A-Za-z0-9_-]{10,}\.[A-Za-z0-9_-]{10,}\b",
    # GitHub personal access token (classic)
    "github_pat": r"\bghp_[A-Za-z0-9]{36}\b",
    # generic assigned secret: key-ish name = long opaque token
    "assigned_secret": r"(?i)\b(?:api[_-]?key|secret|token|passwd|password)\s*[=:]\s*['\"]?[A-Za-z0-9_\-/+]{16,}",
    # PEM private-key header
    "pem_key": r"-----BEGIN [A-Z ]*PRIVATE KEY-----",
}


def secrets_scan(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document credential hit counts per type + total — the
    pre-training secret screen (memorized live credentials are a
    disclosure incident, not a quality problem). Output:
    (doc_id, n_aws_key, n_jwt, n_github_pat, n_assigned_secret,
    n_pem_key, n_secrets). Map-only, codegen, zero shuffles."""
    t = F.col(text_col)
    cols = [F.col(id_col)]
    total = None
    for name, pat in SECRET_PATTERNS.items():
        c = F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        cols.append(c.cast("bigint").alias(f"n_{name}"))
        total = c if total is None else total + c
    cols.append(total.cast("bigint").alias("n_secrets"))
    return df.select(*cols)


def secrets_redact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Replace every credential match with a typed placeholder
    (``[AWS_KEY]`` …), same map-only shape as ``pii_redact``; pattern
    order is the dict order (prefix-anchored formats don't overlap)."""
    t = F.col(text_col)
    for name, pat in SECRET_PATTERNS.items():
        t = F.regexp_replace(t, pat, f"[{name.upper()}]")
    return df.select(id_col, t.alias(text_col))


def luhn_valid(col):
    """Luhn mod-10 checksum predicate over a digit string (ISO/IEC
    7812 — the public card-number check digit). From the RIGHT, every
    second digit doubles (subtract 9 when the double exceeds 9); the
    string validates iff the digit sum is ≡ 0 (mod 10). Pure
    ``F.aggregate`` fold — JVM-side, codegen, no UDF — and the same
    arithmetic is a ``list_transform``/``list_sum`` in the DuckDB
    oracle."""
    n = F.length(col)

    def term(acc, i):
        d = F.substr(col, i, F.lit(1)).cast("int")
        dd = d * 2
        doubled = F.when(dd > 9, dd - 9).otherwise(dd)
        # position from the right is n - i + 1; doubled when even
        return acc + F.when(((n - i + 1) % 2) == 0, doubled).otherwise(d)

    total = F.aggregate(F.sequence(F.lit(1), n), F.lit(0), term)
    return (n > 0) & (total % 10 == 0)


def card_luhn_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Checksum-VALIDATED card detection (X208): the bare 16-digit
    regex of ``pii_scan`` over-fires on order ids, hashes, and phone
    blobs — a 16-digit run is only card-shaped if its Luhn check digit
    holds (~10% of random digit runs pass, so validation cuts the
    false-positive rate ~10×, the published screen every DLP scanner
    applies). Output per document:
    ``(doc_id, n_card_candidates, n_card_luhn_valid)``.

    Map-only over documents (regexp_extract_all + an array filter whose
    predicate is the ``luhn_valid`` fold) — no shuffle, no Python; the
    scale profile of the rest of the PII family."""
    t = F.col(text_col)
    cands = F.regexp_extract_all(t, F.lit(PII_PATTERNS["card16"]), F.lit(0))
    valid = F.filter(cands, lambda c: luhn_valid(c))
    return df.select(
        F.col(id_col),
        F.size(cands).cast("bigint").alias("n_card_candidates"),
        F.size(valid).cast("bigint").alias("n_card_luhn_valid"),
    )
