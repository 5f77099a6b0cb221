"""Every registered query with a SQL oracle, checked Spark-vs-DuckDB at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from simplex_mapreduce_spark import registry
from tests.conftest import SF_DIR
from tests.oracle_utils import check_query

ORACLE_QUERIES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    check_query(spark, duck, name, SF_DIR)


ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema is not None
