from safedata_pipeline_spark.plans.explain import (
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    scans_whole_stage_codegen,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "scans_whole_stage_codegen",
]
