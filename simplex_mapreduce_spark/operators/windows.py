"""Window functions: row_number / rank / dense_rank / ntile / lag /
running aggregates.

Not present in the reference (SURVEY.md §2.2 — no window functions).
Consolidated into two queries (round 2): the sequencing functions share
one window spec over orders, the ranking functions share one partition
key over customer — each query shuffles ONCE on its partition key and
evaluates every window function in that single sorted pass.  At 100 TB
the partition key (custkey / mktsegment) is high-cardinality, so state
per key stays small and skew is handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table


@register(
    "window_order_seq",
    deprioritized=True,  # late-round-7 rotation: hash-green r1-r6 (and a
    # headline bench query regardless of window slot); slot yielded to
    # the newborn format_roundtrip_nation
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           date_diff('day',
                     CAST(lag(CAST(o_orderdate AS TIMESTAMP)) OVER w AS DATE),
                     CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE))
               AS days_since_prev,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend,
           first_value(o_orderkey) OVER w AS first_order,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg_3,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE)
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2)
               AS spend_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey)
    """,
)
def window_order_seq(spark, sf_dir):
    """Per-customer order sequence in one windowed pass: position
    (row_number), days since the previous order (lag, NULL for the
    first), and running spend (cumulative frame).  All three share the
    (o_custkey, order-date) spec, so Spark plans ONE exchange + ONE sort.
    Both engines sum in the identical (date, orderkey) order, so running
    sums match bit-for-bit before rounding.

    ``spend_30d`` adds the RANGE (value-based) frame family: trailing
    30-day spend over event time — the frame includes every row whose
    order date falls in the interval, regardless of row count, and all
    peers of a tied date (vs the ROWS frames above, which count rows).
    Spark range frames need a numeric sort key; epoch seconds via the
    session timezone would drift across DST vs DuckDB's naive epoch, so
    the key is the tz-independent DAY NUMBER (datediff from 1970-01-01 —
    order dates are midnight-aligned) with a [-30, 0] bound — exactly
    DuckDB's ``RANGE BETWEEN INTERVAL 30 DAY PRECEDING`` over DATE.
    Same single exchange on o_custkey (one extra in-partition sort for
    the coarser key).
    [round-1 queries: window_row_number + window_lag + window_running_sum]"""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wmov = w.rowsBetween(-2, Window.currentRow)
    w30 = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")))
        .rangeBetween(-30, 0)
    )
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).alias(
            "days_since_prev"
        ),
        F.round(F.sum("o_totalprice").over(wcum), 2).alias("running_spend"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.round(F.avg("o_totalprice").over(wmov), 4).alias("moving_avg_3"),
        F.round(F.sum("o_totalprice").over(w30), 2).alias("spend_30d"),
    )


@register(
    "window_ranking",
    deprioritized=True,  # round-6 rotation: hash-green r1-r5; slot
    # yielded to a never-driver-hashed query (VERDICT r5 item 1)
    oracle="""
    SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal,
           rnk, nation_rank, bal_quartile, pct_rank, cume
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               rank() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey)   AS rnk,
               dense_rank() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_nationkey)           AS nation_rank,
               ntile(4) OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile,
               round(percent_rank() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey), 6)        AS pct_rank,
               round(cume_dist() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey), 6)        AS cume
        FROM customer)
    WHERE rnk <= 5
    """,
)
def window_ranking(spark, sf_dir):
    """Ranking-function family on one partition key: rank (top-5
    customers by balance per segment), dense_rank (ties share a rank, no
    gaps) and ntile quartiles — computed over the full partitions, then
    filtered to the top-5 rows.  One exchange on c_mktsegment; the two
    orderings are two sorts within the same partitioning.
    [round-1 queries: window_rank + window_dense_ntile]"""
    c = load_table(spark, sf_dir, "customer")
    seg = Window.partitionBy("c_mktsegment")
    by_bal = seg.orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(by_bal).alias("rnk"),
            F.dense_rank().over(seg.orderBy("c_nationkey")).alias("nation_rank"),
            F.ntile(4).over(by_bal).alias("bal_quartile"),
            F.round(F.percent_rank().over(by_bal), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(by_bal), 6).alias("cume"),
        )
        .filter(F.col("rnk") <= 5)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            "rnk",
            "nation_rank",
            "bal_quartile",
            "pct_rank",
            "cume",
        )
    )
