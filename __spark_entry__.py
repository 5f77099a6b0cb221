"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`simplex_mapreduce_spark.registry` — every operator
module registers its Spark callable and DuckDB oracle there; see
SURVEY.md §2 for the inventory this covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simplex_mapreduce_spark import registry  # noqa: E402

registry.load_all()

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-style pricing summary — scan with pushed-down predicate,
    hash aggregate with partial aggregation (the map-side combine the
    reference engine lacks, src/mapreduce.go:193)."""
    return registry.QUERIES["q1_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 — oracled
    queries first so every one of them lands inside the driver's
    50-query correctness window (see registry.ordered_queries)."""
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(registry.ORACLES)
