"""Report + config sinks (SURVEY §2.1 S3–S5; reference
modules/reporting.py and app.py:124-130).

These are driver-side by design: reports consume only already-computed
small result tables (risk scalar, drift table, profile table,
checklist), so the engine collects those few rows and templates them —
no Spark operation belongs here. The 100 TB posture is that the
*inputs* to this module are aggregates; nothing row-level is ever
collected.

Parity notes:
  * HTML template/sections mirror reporting.py:5-28 (summary, risk,
    utility tables, compliance).
  * ``df_to_html`` guards render failures like reporting.py:30-34.
  * ``try_make_pdf`` returns None when reportlab/bs4 are unavailable,
    exactly like reporting.py:51-64's import guard.
  * YAML config round-trip mirrors app.py:124-130 (safe_dump/safe_load).
"""

from __future__ import annotations

import datetime
import json
from typing import Any

from pyspark.sql import DataFrame

# Report sections match the reference's report (reporting.py:5-28):
# Run Summary, Risk Assessment, Utility Metrics, Compliance Checklist.
# The document itself is assembled programmatically with our own
# structure and styling — section parity, not template parity.
_CSS = "\n".join(
    [
        ":root { --ink: #1a2b22; --line: #d8dee3; --dim: #7a8288; }",
        "body { font: 14px/1.5 system-ui, sans-serif; color: var(--ink);",
        "       max-width: 60rem; margin: 2rem auto; padding: 0 1rem; }",
        "section { margin-bottom: 1.5rem; }",
        "h1 { border-bottom: 2px solid var(--ink); padding-bottom: .3rem; }",
        "table { border-collapse: collapse; min-width: 50%; }",
        "td, th { border-bottom: 1px solid var(--line); padding: .3rem .8rem; }",
        "thead th { border-bottom-width: 2px; text-align: left; }",
        "pre { background: #f6f7f8; padding: .8rem; overflow-x: auto; }",
        ".meta { color: var(--dim); font-size: .85em; }",
    ]
)


def _html_doc(title: str, meta_line: str, sections: list[tuple[str, str]]) -> str:
    """Assemble the report document from (heading, body-html) sections."""
    body = [f"<h1>{title}</h1>", f"<p class='meta'>{meta_line}</p>"]
    body += [f"<section>\n<h2>{h}</h2>\n{b}\n</section>" for h, b in sections]
    return (
        "<!doctype html>\n<html lang='en'>\n<head>\n<meta charset='utf-8'>\n"
        f"<title>{title}</title>\n<style>\n{_CSS}\n</style>\n</head>\n<body>\n"
        + "\n".join(body)
        + "\n</body>\n</html>\n"
    )


MAX_REPORT_ROWS = 1000  # hard cap: report tables must be aggregates


def df_to_html(df: DataFrame, limit: int = MAX_REPORT_ROWS) -> str:
    """Collect a (small!) result table and render it as an HTML table;
    never raises (reporting.py:30-34 parity)."""
    try:
        return df.limit(limit).toPandas().to_html(index=False)
    except Exception:
        return "<pre>Could not render table.</pre>"


def save_html_report(
    path: str,
    summary: dict[str, Any],
    risk_summary: dict[str, Any],
    util_tables: dict[str, DataFrame],
    compliance_df: DataFrame,
) -> str:
    util_html = "\n".join(
        f"<h3>{name}</h3>\n{df_to_html(df)}" for name, df in util_tables.items()
    )
    sections = [
        ("Run Summary", f"<pre>{json.dumps(summary, indent=2, default=str)}</pre>"),
        ("Risk Assessment", f"<pre>{json.dumps(risk_summary, indent=2, default=str)}</pre>"),
        ("Utility Metrics", util_html),
        ("Compliance Checklist", df_to_html(compliance_df)),
    ]
    stamp = f"Generated {datetime.datetime.now(datetime.timezone.utc).isoformat()}"
    html = _html_doc("SafeData Pipeline Report (Spark engine)", stamp, sections)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    return path


def save_audit_report(
    path: str,
    summary: dict[str, Any],
    k_anonymity_df: DataFrame | None = None,
    k_violations_df: DataFrame | None = None,
    l_diversity_df: DataFrame | None = None,
    skew_df: DataFrame | None = None,
    drift_timeline_df: DataFrame | None = None,
    t_closeness_df: DataFrame | None = None,
    quality_rules_df: DataFrame | None = None,
    iqr_outliers_df: DataFrame | None = None,
    completeness_timeline_df: DataFrame | None = None,
    dedup_rate_df: DataFrame | None = None,
    split_leakage_df: DataFrame | None = None,
    curation_funnel: dict[str, int] | None = None,
    benford_df: DataFrame | None = None,
    cusum_df: DataFrame | None = None,
    cusum_alarm: float = 4.0,
    secrets_df: DataFrame | None = None,
    domain_stats_df: DataFrame | None = None,
    domain_cap: float = 0.1,
) -> str:
    """The operator-era audit report — the numbers a privacy officer
    or pipeline operator actually reads, assembled from the round-3
    audit operators: k-anonymity/l-diversity (with the violating
    equivalence classes as a remediation worklist), join-key skew, and
    the hourly drift timeline. Every input is an aggregate (the
    operators return 1-row or dashboard-sized tables); rendering
    collects at most ``MAX_REPORT_ROWS`` rows per section. Sections
    whose DataFrame is None are omitted, so the report composes with
    whatever audits a run actually executed."""
    sections: list[tuple[str, str]] = [
        ("Run Summary", f"<pre>{json.dumps(summary, indent=2, default=str)}</pre>")
    ]
    if k_anonymity_df is not None:
        body = df_to_html(k_anonymity_df)
        if k_violations_df is not None:
            body += (
                "\n<h3>Violating equivalence classes (remediation worklist)</h3>\n"
                + df_to_html(k_violations_df)
            )
        sections.append(("K-Anonymity", body))
    if l_diversity_df is not None:
        sections.append(("L-Diversity", df_to_html(l_diversity_df)))
    if t_closeness_df is not None:
        sections.append(("T-Closeness", df_to_html(t_closeness_df)))
    if skew_df is not None:
        sections.append(("Key Skew", df_to_html(skew_df)))
    if drift_timeline_df is not None:
        sections.append(("Drift Timeline", df_to_html(drift_timeline_df)))
    if quality_rules_df is not None:
        sections.append(("Data-Quality Rules", df_to_html(quality_rules_df)))
    if iqr_outliers_df is not None:
        sections.append(("Outlier Fences (IQR)", df_to_html(iqr_outliers_df)))
    if completeness_timeline_df is not None:
        sections.append(("Completeness Timeline", df_to_html(completeness_timeline_df)))
    # -- dedup / curation KPIs (the corpus-health numbers a curation
    # dashboard watches between runs) ---------------------------------
    if dedup_rate_df is not None:
        sections.append(("Duplicate Rate by Source", df_to_html(dedup_rate_df)))
    if split_leakage_df is not None:
        sections.append(
            ("Split Leakage (near-dup edges crossing splits)", df_to_html(split_leakage_df))
        )
    if benford_df is not None:
        sections.append(("Benford First-Digit Screen", df_to_html(benford_df)))
    if cusum_df is not None:
        from pyspark.sql import functions as F

        alarms = cusum_df.where(
            (F.col("s_pos") > cusum_alarm) | (F.col("s_neg") > cusum_alarm)
        )
        body = (
            f"<p>Alarm threshold h = {cusum_alarm} (std units). "
            "Hours where either CUSUM side exceeds h:</p>\n" + df_to_html(alarms)
        )
        sections.append(("CUSUM Change-Points", body))
    if secrets_df is not None:
        from pyspark.sql import functions as F

        hits = secrets_df.where(F.col("n_secrets") > 0)
        n_hit = hits.count()
        body = (
            f"<p>Documents containing credential material: <b>{n_hit}</b> "
            "(every one is a disclosure incident to scrub before training):</p>\n"
            + df_to_html(hits)
        )
        sections.append(("Credential / Secret Scan", body))
    if domain_stats_df is not None:
        from pyspark.sql import functions as F

        heavy = domain_stats_df.where(F.col("share") > domain_cap).orderBy(
            F.desc("share")
        )
        body = (
            f"<p>Domains above the {domain_cap:.0%} concentration cap "
            "(single-template farms dominating the crawl):</p>\n" + df_to_html(heavy)
        )
        sections.append(("Domain Concentration", body))
    if curation_funnel is not None:
        rows = "".join(
            f"<tr><td>{step}</td><td>{n}</td></tr>" for step, n in curation_funnel.items()
        )
        sections.append(
            (
                "Curation Funnel",
                "<table><thead><tr><th>step</th><th>docs</th></tr></thead>"
                f"<tbody>{rows}</tbody></table>",
            )
        )
    stamp = f"Generated {datetime.datetime.now(datetime.timezone.utc).isoformat()}"
    html = _html_doc("SafeData Audit Report (Spark engine)", stamp, sections)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    return path


def try_make_pdf(html_path: str, pdf_path: str) -> str | None:
    """Best-effort text PDF; None when reportlab/bs4 are missing
    (reporting.py:51-64 parity — the import guard IS the behavior).
    Rendering uses platypus flowables (wrapping + pagination handled by
    the layout engine), not a manual canvas cursor."""
    try:
        from bs4 import BeautifulSoup  # noqa: F401
        from reportlab.lib.pagesizes import A4
        from reportlab.lib.styles import getSampleStyleSheet
        from reportlab.platypus import Paragraph, SimpleDocTemplate, Spacer
    except Exception:
        return None
    try:
        with open(html_path, encoding="utf-8") as f:
            text = BeautifulSoup(f.read(), "html.parser").get_text("\n")
    except Exception:
        text = "SafeData Report (text fallback)."

    from xml.sax.saxutils import escape

    style = getSampleStyleSheet()["BodyText"]
    story: list[Any] = []
    for raw in text.splitlines():
        line = raw.strip()
        story.append(Paragraph(escape(line), style) if line else Spacer(1, 6))
    SimpleDocTemplate(pdf_path, pagesize=A4).build(story)
    return pdf_path


# --- S3: YAML config round-trip (app.py:124-130) ---------------------------

def save_config(path: str, config: dict[str, Any]) -> str:
    import yaml

    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(config, f)
    return path


def load_config(path: str) -> dict[str, Any]:
    import yaml

    with open(path, encoding="utf-8") as f:
        return yaml.safe_load(f)
