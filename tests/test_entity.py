"""Blocked fuzzy matching: equivalence against the UNBLOCKED naive
DuckDB join (proving the block loses no pairs), plan shape (hash join,
no cartesian product), and recall edge cases."""

from __future__ import annotations

from simplex_mapreduce_spark import registry
from simplex_mapreduce_spark.operators.entity import (
    FUZZY_SQL,
    blocked_fuzzy_self_join,
)
from tests.conftest import SF_DIR
from tests.oracle_utils import compare_frames


def test_fuzzy_matches_equal_naive_duckdb(spark, duck):
    """The blocked join must find EXACTLY the pairs the naive O(n^2)
    join finds — blocking is a pure optimization."""
    spark_pdf = registry.QUERIES["fuzzy_name_matches"](spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(FUZZY_SQL).df()
    assert len(spark_pdf) > 0
    compare_frames(spark_pdf, duck_pdf, "fuzzy_name_matches")


def test_fuzzy_join_plan_is_hash_join_not_cartesian(spark):
    """The whole point: the similarity predicate must ride on an
    equi-join (block keys), never a CartesianProduct / BNL join."""
    out = registry.QUERIES["fuzzy_name_matches"](spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_length_band_recall(spark):
    """Pairs that differ by an insertion (length differs by 1) must be
    found — the band explode covers the neighbor lengths."""
    df = spark.createDataFrame(
        [
            (1, "prefix###abc"),
            (2, "prefix###abcd"),   # one insertion from 1
            (3, "prefix###abxd"),   # distance 2 from 1 -> excluded
            (4, "different#abc"),   # other block, never compared
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in blocked_fuzzy_self_join(
            df, "id", "name", max_distance=1, prefix_len=9
        ).collect()
    }
    assert (1, 2, 1) in got
    assert all(p[:2] != (1, 3) for p in got)
    assert all(4 not in p[:2] for p in got)
    # distance-1 substitution within same length also present
    assert (2, 3, 1) in got
