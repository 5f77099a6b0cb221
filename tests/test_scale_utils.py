"""Scale-posture utilities: salted joins return identical results;
bucketed joins eliminate the exchange; the applyInPandas custom
operator agrees with the built-in regression aggregate."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from simplex_mapreduce_spark.functions.skew import salted_join
from simplex_mapreduce_spark.operators.custom import customer_spend_trend_df
from simplex_mapreduce_spark.plans.explain import simple_plan
from simplex_mapreduce_spark.sources.bucketing import read_bucketed, write_bucketed
from simplex_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_DIR, "orders", convert_ts=False).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    plain = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name"
    )
    salted = salted_join(o, c, "o_custkey", "c_custkey", salt=4).select(
        "o_orderkey", "c_custkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "rk long, rv string")
    out = salted_join(left, right, "k", "rk", salt=4, how="left").collect()
    assert len(out) == 3
    assert {r["v"]: r["rv"] for r in out}["zz"] is None


def test_salted_join_rejects_dim_preserving_modes(spark):
    import pytest

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1, "x")], "rk long, rv string")
    for how in ("right", "full_outer", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, "k", "rk", salt=4, how=how)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_DIR, "orders", convert_ts=False).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        li = load_table(spark, SF_DIR, "lineitem", convert_ts=False).select(
            "l_orderkey", "l_quantity"
        )
        write_bucketed(o, "orders_b", "o_orderkey", 8)
        write_bucketed(li, "lineitem_b", "l_orderkey", 8)
        ob, lb = read_bucketed(spark, "orders_b"), read_bucketed(spark, "lineitem_b")
        j = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = simple_plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() == o.join(li, o.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_broadcast_if_small_applies_hint_only_under_bound(spark):
    """The probe-guarded broadcast (functions/scale.py): a frame under
    the row bound gets the hint, one over it does not (AQE decides), and
    join results are identical either way."""
    from simplex_mapreduce_spark.functions.scale import broadcast_if_small
    from simplex_mapreduce_spark.plans.explain import broadcast_hint_count

    small = spark.range(100).withColumnRenamed("id", "k")
    big = spark.range(5000).withColumnRenamed("id", "k")
    assert broadcast_hint_count(broadcast_if_small(small, max_rows=1000)) == 1
    assert broadcast_hint_count(broadcast_if_small(big, max_rows=1000)) == 0

    fact = spark.range(2000).withColumnRenamed("id", "fk")
    guarded = fact.join(
        broadcast_if_small(small, max_rows=1000), F.col("fk") == F.col("k")
    )
    plain = fact.join(small, F.col("fk") == F.col("k"))
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_custom_trend_matches_builtin_regr_slope(spark):
    o = load_table(spark, SF_DIR, "orders")
    custom = customer_spend_trend_df(o).toPandas().set_index("o_custkey")
    x = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).cast("double")
    builtin = (
        o.groupBy("o_custkey")
        .agg(F.regr_slope(F.col("o_totalprice"), x).alias("slope"))
        .toPandas()
        .set_index("o_custkey")
    )
    joined = custom.join(builtin, how="inner")
    assert len(joined) == len(custom)
    both = joined.dropna(subset=["spend_trend", "slope"])
    assert (
        (pd.Series(both["spend_trend"]) - pd.Series(both["slope"])).abs() < 1e-3
    ).all()


def test_clean_corpus_observed_metrics(spark):
    """Observation metrics must report per-stage row counts from the ONE
    pipeline action — input = corpus size, deduped = distinct hashes,
    output = the returned row count — with no extra counting jobs."""
    from simplex_mapreduce_spark.operators.text import clean_corpus_with_metrics
    from simplex_mapreduce_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    df, obs = clean_corpus_with_metrics(spark, SF_DIR)
    out_rows = df.count()  # the single action that also fills the metrics

    n_input = load_table(spark, SF_DIR, "documents").count()
    from pyspark.sql import functions as F

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    n_distinct = (
        load_table(spark, SF_DIR, "documents")
        .select(F.md5(norm).alias("h"))
        .distinct()
        .count()
    )
    assert obs["input"].get["n"] == n_input
    assert obs["deduped"].get["n"] == n_distinct
    assert obs["output"].get["n"] == out_rows > 0
