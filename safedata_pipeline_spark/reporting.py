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

HTML_TEMPLATE = """<html>
<head><meta charset='utf-8'><title>SafeData Spark Report</title>
<style>
body {{ font-family: Arial, sans-serif; margin: 24px; }}
h1, h2, h3 {{ color: #163; }}
table {{ border-collapse: collapse; width: 100%; margin: 12px 0; }}
th, td {{ border: 1px solid #ccc; padding: 6px 8px; text-align: left; }}
.small {{ color: #666; font-size: 12px; }}
</style>
</head>
<body>
<h1>SafeData Pipeline Report (Spark engine)</h1>
<p class='small'>Generated: {generated}</p>
<h2>Run Summary</h2>
<pre>{summary}</pre>
<h2>Risk Assessment</h2>
<pre>{risk_summary}</pre>
<h2>Utility Metrics</h2>
{utility_tables}
<h2>Compliance Checklist</h2>
{compliance_table}
</body></html>
"""

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
    util_html = ""
    for name, df in util_tables.items():
        util_html += f"<h3>{name}</h3>" + df_to_html(df)
    html = HTML_TEMPLATE.format(
        generated=str(datetime.datetime.now(datetime.timezone.utc)),
        summary=json.dumps(summary, indent=2, default=str),
        risk_summary=json.dumps(risk_summary, indent=2, default=str),
        utility_tables=util_html,
        compliance_table=df_to_html(compliance_df),
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    return path


def try_make_pdf(html_path: str, pdf_path: str) -> str | None:
    """Best-effort text PDF; None when reportlab/bs4 are missing
    (reporting.py:51-64 parity — the import guard IS the behavior)."""
    try:
        from bs4 import BeautifulSoup  # noqa: F401
        from reportlab.lib.pagesizes import A4
        from reportlab.pdfgen import canvas
    except Exception:
        return None
    try:
        with open(html_path, encoding="utf-8") as f:
            text = BeautifulSoup(f.read(), "html.parser").get_text("\n")
    except Exception:
        text = "SafeData Report (text fallback)."
    c = canvas.Canvas(pdf_path, pagesize=A4)
    _, height = A4
    x, y = 40, height - 40
    for line in text.split("\n"):
        if y < 40:
            c.showPage()
            y = height - 40
        c.drawString(x, y, line[:110])
        y -= 14
    c.save()
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
