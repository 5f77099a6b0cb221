"""HLL incremental distinct (union == recompute identity) and the
VARIANT props query (typed extraction vs DuckDB JSON)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplex_mapreduce_spark import registry
from tests.conftest import SF_DIR
from tests.oracle_utils import compare_frames


def test_incremental_union_equals_recompute(spark):
    """The identity that makes stored sketches correct: estimating the
    union of per-day sketches must equal estimating one sketch built
    over all events — and at this cardinality (tens of users, HLL still
    exact) both must equal the exact COUNT(DISTINCT)."""
    from simplex_mapreduce_spark.functions.sketches import (
        daily_user_sketches,
        merged_distinct_estimate,
    )
    from simplex_mapreduce_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "events").select("ts", "user_id")
    merged = merged_distinct_estimate(daily_user_sketches(e))
    direct = int(
        e.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))).first()[0]
    )
    exact = e.select("user_id").distinct().count()
    assert merged == direct == exact > 0


def test_incremental_distinct_users_rows(spark):
    """Per-day rows + the ALL row; daily estimates exact at this
    cardinality; the ALL row covers every event."""
    out = registry.QUERIES["incremental_distinct_users"](spark, SF_DIR).collect()
    days = [r for r in out if r["day"] != "ALL"]
    total = [r for r in out if r["day"] == "ALL"]
    assert len(days) >= 1 and len(total) == 1
    assert total[0]["n_events"] == sum(r["n_events"] for r in days)

    from simplex_mapreduce_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "events")
    exact_by_day = {
        str(r["day"]): r["n"]
        for r in e.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in days:
        assert r["distinct_users_est"] == exact_by_day[r["day"]]


def test_variant_props_matches_duckdb(spark, duck):
    spark_pdf = registry.QUERIES["variant_props"](spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(registry.ORACLES["variant_props"]).df()
    assert len(spark_pdf) > 0
    compare_frames(spark_pdf, duck_pdf, "variant_props")
