"""Physical-plan introspection helpers.

The engine's scale guarantees are plan properties, not hopes: filters
must reach the parquet scan (PushedFilters), projections must prune the
read schema (ReadSchema), and hot expressions must stay inside
whole-stage codegen. These helpers extract those facts from
``explain("formatted")`` output so tests can assert them — every
operator family has at least one plan-shape test.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the parquet scan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read by the scan (column pruning check)."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def scans_whole_stage_codegen(df: DataFrame) -> bool:
    """True when the plan contains at least one whole-stage-codegen span
    (hot path compiled, not interpreted). Formatted explain marks them
    ``[codegen id : N]``; note AQE hides the markers pre-execution —
    check with adaptive disabled."""
    return "codegen id" in formatted_plan(df)
