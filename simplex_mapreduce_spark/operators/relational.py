"""Relational core: scan, project, filter, aggregate, distinct, top-k,
set ops, grouping sets, scalar functions.

The reference has none of these as engine operators — projection/filter
exist only *inside* user map closures (SURVEY.md §2.2) and aggregation
only as the one groupByKey+reduce shape (src/mapreduce.go:218-259).
Here each is a declarative DataFrame query Catalyst can optimize
(pushdown, pruning, partial aggregation), with a DuckDB oracle.

Conventions (driver hash-compare contract):
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded identically on both sides (summation
  order differs between engines; rounding removes last-bit noise);
- no raw timestamps in outputs — only derived ints/strings/dates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import epoch_nanos, load_table

# --------------------------------------------------------------------- #
# q1: TPC-H Q1-style pricing summary — the flagship aggregation.
# Filter is applied to the RAW epoch-nanos shipdate column so it reaches
# the parquet scan as a pushed filter (see sources/tables.py note);
# partial aggregation (map-side combine) is automatic for hash-agg —
# the optimization the reference lacks (mapreduce.go:193).
# --------------------------------------------------------------------- #

_Q1_CUTOFF = "1998-09-02"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", convert_ts=False)
    # shipdate arrives as timestamp_ntz (ms-unit parquet) — a literal NTZ
    # comparison is pushed to the parquet scan; were it nanos->long (like
    # events.ts), the epoch_nanos long comparison would be the pushdown path.
    if dict(li.dtypes)["l_shipdate"] == "bigint":
        pred = F.col("l_shipdate") <= F.lit(epoch_nanos(_Q1_CUTOFF))
    else:
        pred = F.col("l_shipdate") <= F.lit(f"{_Q1_CUTOFF} 00:00:00").cast(
            "timestamp_ntz"
        )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(pred)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount < 0.05
    """,
)
def scan_filter_project(spark, sf_dir):
    """Projection + predicate; both should reach the parquet scan
    (PushedFilters + pruned ReadSchema — asserted in tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem", convert_ts=False)
    return li.filter((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@register(
    "groupby_agg",
    oracle="""
    SELECT o_orderstatus,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS total_price,
           round(avg(o_totalprice), 4) AS avg_price,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def groupby_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders", convert_ts=False)
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "distinct_op",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_op(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@register(
    "count_distinct",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*)                  AS n_rows
    FROM lineitem
    """,
)
def count_distinct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", convert_ts=False)
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_orders(spark, sf_dir):
    """Top-k = orderBy + limit; Spark plans TakeOrderedAndProject —
    per-partition heap + driver merge of k rows, no global sort.
    Tie-break on o_orderkey keeps the result deterministic."""
    o = load_table(spark, sf_dir, "orders", convert_ts=False)
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


@register(
    "union_op",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_op(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@register(
    "intersect_op",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_op(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "except_op",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def except_op(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", convert_ts=False)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders", convert_ts=False)
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                  AS pri_upper,
           substr(o_orderpriority, 1, 1)           AS pri_code,
           year(CAST(o_orderdate AS TIMESTAMP))    AS o_year,
           month(CAST(o_orderdate AS TIMESTAMP))   AS o_month,
           round(o_totalprice * 1.07, 2)           AS gross,
           round(sqrt(o_totalprice), 4)            AS price_sqrt,
           o_orderkey % 7                          AS key_mod
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def scalar_functions(spark, sf_dir):
    """String/date/math scalar-function surface (the reference delegates
    all of this to Go-stdlib calls inside user closures, test_test.go:59,71)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.round(F.col("o_totalprice") * 1.07, 2).alias("gross"),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@register(
    "conditional_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2)
               AS discounted_rev,
           count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk,
           round(avg(CASE WHEN l_tax > 0.04 THEN l_extendedprice END), 4) AS avg_taxed_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def conditional_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", convert_ts=False)
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(
                F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(
                    0
                )
            ),
            2,
        ).alias("discounted_rev"),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_bulk"),
        F.round(
            F.avg(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 4
        ).alias("avg_taxed_price"),
    )
