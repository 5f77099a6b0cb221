"""Window functions: row_number / rank / lag / running aggregates.

Not present in the reference (SURVEY.md §2.2 — no window functions).
All four shuffle once on the partition key and sort within partitions;
at 100 TB the partition key (custkey / mktsegment) is high-cardinality,
so state per key stays small and skew is handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table


@register(
    "window_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def window_row_number(spark, sf_dir):
    """First 3 orders per customer (deterministic tie-break on orderkey)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@register(
    "window_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal, rnk FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               rank() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer)
    WHERE rnk <= 5
    """,
)
def window_rank(spark, sf_dir):
    """Top-5 customers by account balance within each market segment."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        c.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            "rnk",
        )
    )


@register(
    "window_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     CAST(lag(CAST(o_orderdate AS TIMESTAMP)) OVER w AS DATE),
                     CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE)) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey)
    """,
)
def window_lag(spark, sf_dir):
    """Days between consecutive orders per customer (NULL for the first)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).alias(
            "days_since_prev"
        ),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    """Running spend per customer in order-date order.  Both engines sum
    in the identical (date, orderkey) order, so values match bit-for-bit
    before rounding."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "window_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           dense_rank() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_nationkey)            AS nation_rank,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey)  AS bal_quartile
    FROM customer
    """,
)
def window_dense_ntile(spark, sf_dir):
    """dense_rank (ties share a rank, no gaps) + ntile quartiles."""
    c = load_table(spark, sf_dir, "customer")
    seg = Window.partitionBy("c_mktsegment")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(seg.orderBy("c_nationkey")).alias("nation_rank"),
        F.ntile(4)
        .over(seg.orderBy(F.col("c_acctbal").desc(), "c_custkey"))
        .alias("bal_quartile"),
    )
