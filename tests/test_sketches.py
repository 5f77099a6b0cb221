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


def test_hll_relative_error_at_high_cardinality(spark):
    """VERDICT r11 item 5: the sketch's ACCURACY — not just its merge
    algebra — as a gated property.  At the driver sfs every HLL surface
    is exact (tiny cardinalities), so this pin runs where estimation
    genuinely kicks in: synthetic corpora of 200k and 2M distinct keys.
    Stored sketches use HLL_LGK=14 (RSE ~0.8%; the default lgK=12
    measured 2.2% off at 200k keys — why the module pins its own
    precision); the estimate is deterministic for a fixed key set, and
    both tested sets must land inside the 2% relative-error budget the
    module promises.  The union identity must ALSO hold at this scale:
    merging 16 partial sketches estimates exactly what the single
    whole-set sketch estimates."""
    from simplex_mapreduce_spark.functions.sketches import (
        HLL_LGK,
        merged_distinct_estimate,
    )

    for n in (200_000, 2_000_000):
        ids = spark.range(n).select(
            F.concat(F.lit("user_"), F.col("id")).alias("user_id"),
            (F.col("id") % 16).alias("part"),
        )
        direct = int(
            ids.agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
                )
            ).first()[0]
        )
        assert abs(direct - n) / n <= 0.02, (
            f"n={n}: direct estimate {direct} off by "
            f"{abs(direct - n) / n:.4f} > 2%"
        )
        parts = ids.groupBy("part").agg(
            F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sketch")
        )
        merged = merged_distinct_estimate(parts)
        assert merged == direct, (
            f"n={n}: union-of-parts {merged} != whole-set {direct}"
        )


def test_approx_count_distinct_relative_error(spark):
    """The HLL++ surface (approx_count_distinct, rsd=0.01): estimates
    within 2% of the exact distinct counts on the real bench tables —
    the accuracy contract behind table_profile's cardinality column
    too."""
    row = registry.QUERIES["approx_count_distinct"](spark, SF_DIR).first()
    from simplex_mapreduce_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem", convert_ts=False)
    exact = li.agg(
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_suppkey").alias("s"),
    ).first()
    for est, ex, col in (
        (row["approx_parts"], exact["p"], "l_partkey"),
        (row["approx_supps"], exact["s"], "l_suppkey"),
    ):
        assert ex > 0 and abs(est - ex) / ex <= 0.02, (
            f"{col}: estimate {est} vs exact {ex} off by "
            f"{abs(est - ex) / ex:.4f} > 2%"
        )
