from simplex_mapreduce_spark.plans.explain import (
    formatted_plan,
    has_pushed_filters,
    scan_read_schema,
    wholestage_codegen_spans,
)

__all__ = [
    "formatted_plan",
    "has_pushed_filters",
    "scan_read_schema",
    "wholestage_codegen_spans",
]
