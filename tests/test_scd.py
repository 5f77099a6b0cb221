"""SCD2 dimension builder: DuckDB equivalence (rows-only in the driver
— the 50 oracled slots are full), interval invariants, and the
single-exchange plan guarantee."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from simplex_mapreduce_spark import registry
from simplex_mapreduce_spark.operators.scd import SCD2_SQL, scd2_from_changelog
from tests.conftest import SF_DIR
from tests.oracle_utils import compare_frames


def test_scd2_matches_duckdb(spark, duck):
    spark_pdf = registry.QUERIES["scd2_customer_priority"](spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(SCD2_SQL).df()
    assert len(spark_pdf) > 0
    compare_frames(spark_pdf, duck_pdf, "scd2_customer_priority")


def test_scd2_interval_invariants(spark):
    import datetime

    pdf = registry.QUERIES["scd2_customer_priority"](spark, SF_DIR).toPandas()
    sentinel = datetime.date(9999, 12, 31)
    # exactly one open (is_current) interval per key, flagged by the
    # high-date sentinel
    open_rows = pdf[pdf["is_current"]]
    assert (open_rows["valid_to"] == sentinel).all()
    open_per_key = open_rows.groupby("custkey").size()
    assert (open_per_key == 1).all()
    assert set(open_per_key.index) == set(pdf["custkey"].unique())
    # intervals are well-formed (>=: two changes on one date give a
    # zero-length interval under a date-grained log) and chain without
    # gaps or overlap: sorted by (valid_from, valid_to), each interval's
    # valid_to equals the next valid_from
    for _, grp in pdf.groupby("custkey"):
        g = grp.sort_values(["valid_from", "valid_to"]).reset_index(drop=True)
        assert (g["valid_to"] >= g["valid_from"]).all()
        assert (
            g["valid_to"].iloc[:-1].reset_index(drop=True)
            == g["valid_from"].iloc[1:].reset_index(drop=True)
        ).all()
        # consecutive intervals always change the attribute
        assert (g["priority"].iloc[:-1].values != g["priority"].iloc[1:].values).all()


def test_scd2_single_exchange(spark):
    """Both window passes share partitioning+ordering, so the physical
    plan must contain exactly one hash-partitioning Exchange."""
    out = registry.QUERIES["scd2_customer_priority"](spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_generic_collapse(spark):
    """Tiny hand-built change log: runs of equal attr collapse, ties at
    one timestamp break deterministically by the tiebreak column."""
    log = spark.createDataFrame(
        [
            (1, "a", 10, 100),
            (1, "a", 20, 101),  # same attr: collapsed into the first run
            (1, "b", 30, 102),
            (1, "a", 40, 103),  # attr returns: a NEW interval, not merged
            (2, "x", 10, 104),
            (2, "y", 10, 105),  # same ts: order pinned by tiebreak 104<105
        ],
        "k long, attr string, ts long, seq long",
    )
    got = (
        scd2_from_changelog(log, "k", "attr", "ts", "seq")
        .select("k", "attr", "valid_from", "valid_to", "is_current")
        .orderBy("k", "valid_from", "attr")
        .collect()
    )
    rows = [tuple(r) for r in got]
    assert rows == [
        (1, "a", 10, 30, False),
        (1, "b", 30, 40, False),
        (1, "a", 40, None, True),
        (2, "x", 10, 10, False),
        (2, "y", 10, None, True),
    ]


def test_scd2_point_in_time_lookup(spark):
    """Joining the log back against its own SCD2 output on
    valid_from <= ts < valid_to recovers each row's attribute — the
    point-in-time correctness property the table shape exists for."""
    dim = registry.QUERIES["scd2_customer_priority"](spark, SF_DIR)
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").cast("date").alias("d"),
            "o_orderpriority",
            "o_orderkey",
        )
    )
    # one attribute per (custkey, date): the last change that day wins,
    # matching the builder's (change_date, o_orderkey) ordering
    w_last = (
        orders.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("custkey", "d").orderBy(F.desc("o_orderkey"))
            ),
        )
        .filter("rn = 1")
        .drop("rn")
    )
    # no IS NULL branch: the high-date sentinel makes the predicate a
    # plain half-open range
    joined = w_last.join(
        dim,
        (w_last["custkey"] == dim["custkey"])
        & (w_last["d"] >= dim["valid_from"])
        & (w_last["d"] < dim["valid_to"]),
    )
    assert joined.filter(F.col("o_orderpriority") != F.col("priority")).count() == 0
    assert joined.count() == w_last.count()


def test_compact_latest_matches_window_twin(spark):
    """max_by compaction must equal the row_number()=1 window
    formulation on the real orders log, and the plan must carry a
    partial (map-side) aggregate — the reason max_by is the scale
    shape."""
    from simplex_mapreduce_spark.operators.scd import compact_latest

    log = spark.read.parquet(f"{SF_DIR}/orders.parquet").selectExpr(
        "o_custkey", "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    got = compact_latest(log, ["o_custkey"], "o_orderkey")

    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderkey"))
    want = (
        log.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan.lower() or "partial" in plan.lower()
    # exactly one row per key
    assert got.count() == log.select("o_custkey").distinct().count()
