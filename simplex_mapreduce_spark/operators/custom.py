"""Custom batch operators via ``applyInPandas`` — the escape hatch for
semantics the built-in operators can't express (the batch analog of the
reference's arbitrary Reduce closure, src/worker.go:12).

Rule of thumb encoded here: reach for applyInPandas ONLY when a JVM
expression can't express the computation; the unit test pins this
implementation against Spark's built-in ``regr_slope`` to prove the
custom path agrees with the declarative one.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table

TREND_SCHEMA = "o_custkey bigint, n_orders bigint, spend_trend double"


def _fit_trend(pdf: pd.DataFrame) -> pd.DataFrame:
    """Least-squares slope of totalprice over order day, one customer
    per group (NaN slope for a single order / zero variance)."""
    x = pdf["day"].astype("float64")
    y = pdf["o_totalprice"].astype("float64")
    n = len(pdf)
    vx = ((x - x.mean()) ** 2).sum()
    slope = float("nan") if vx == 0.0 else float(((x - x.mean()) * (y - y.mean())).sum() / vx)
    return pd.DataFrame(
        {
            "o_custkey": [int(pdf["o_custkey"].iloc[0])],
            "n_orders": [n],
            "spend_trend": [round(slope, 6) if slope == slope else None],
        }
    )


def customer_spend_trend_df(orders: DataFrame) -> DataFrame:
    """Arrow-batched grouped custom aggregation: one pandas call per
    customer group, schema declared up front."""
    prepped = orders.select(
        "o_custkey",
        "o_totalprice",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("double")
        .alias("day"),
    )
    return prepped.groupBy("o_custkey").applyInPandas(_fit_trend, TREND_SCHEMA)


@register("customer_spend_trend")  # rows-only: Python custom-operator path
def customer_spend_trend(spark, sf_dir):
    return customer_spend_trend_df(load_table(spark, sf_dir, "orders"))
