"""Extended relational surface: consolidated aggregate profiles
(percentiles + regression moments, min_by/max_by + HAVING, conditional +
statistical aggregates), scalar subqueries, pivot, array functions,
approximate distinct counts.

All planned-extensions (the reference has none of these — SURVEY.md
§2.2); each stays a single declarative plan for Catalyst.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import epoch_nanos, load_table


_PROFILE_AGGS_DUCK = """
           count(*)                                    AS n_orders,
           round(sum(o_totalprice), 2)                 AS total_price,
           round(avg(o_totalprice), 4)                 AS avg_price,
           round(min(o_totalprice), 2)                 AS min_price,
           round(max(o_totalprice), 2)                 AS max_price,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           round(regr_slope(o_totalprice, day), 6) + 0.0 AS price_trend,
           round(regr_intercept(o_totalprice, day), 2) AS price_intercept
"""


@register(
    "orders_profile",
    deprioritized=True,  # round-5 rotation: slot yielded to a newer query
    oracle=f"""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 0 THEN 'status'
                ELSE 'month' END                       AS gset,
           o_orderstatus,
           month,
           {_PROFILE_AGGS_DUCK}
    FROM (SELECT o_orderstatus,
                 strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
                 o_totalprice,
                 CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS DOUBLE) AS day
          FROM orders)
    GROUP BY GROUPING SETS ((o_orderstatus), (month))
    """,
)
def orders_profile(spark, sf_dir):
    """Order profile at two granularities in ONE pass — per status and
    per calendar month via GROUPING SETS (one Expand + one partial-
    aggregated shuffle, never two jobs): basic aggregates, exact
    interpolated percentiles (both engines implement percentile_cont
    semantics: linear interpolation at p*(n-1)), and linear-regression
    moments (price trend over epoch day).  ``GROUPING()`` tags which
    grouping set a row belongs to, identically in Spark and DuckDB.
    [round-1 queries: groupby_agg + percentiles + regression_agg +
    date_rollup; round-2/3 queries: orders_status_profile +
    orders_by_month — merged round 4 to free an oracled driver slot]"""
    o = load_table(spark, sf_dir, "orders")
    prepared = o.select(
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_totalprice",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("double")
        .alias("day"),
    )
    # the DataFrame is passed as a spark.sql template argument — no
    # session-global temp view, so concurrent plan construction cannot
    # rebind a shared name under an unexecuted plan
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(o_orderstatus) = 0 THEN 'status'
                    ELSE 'month' END                        AS gset,
               o_orderstatus,
               month,
               count(*)                                     AS n_orders,
               round(sum(o_totalprice), 2)                  AS total_price,
               round(avg(o_totalprice), 4)                  AS avg_price,
               round(min(o_totalprice), 2)                  AS min_price,
               round(max(o_totalprice), 2)                  AS max_price,
               round(percentile(o_totalprice, 0.5), 4)      AS p50,
               round(percentile(o_totalprice, 0.9), 4)      AS p90,
               round(percentile(o_totalprice, 0.99), 4)     AS p99,
               round(regr_slope(o_totalprice, day), 6) + 0.0 AS price_trend,
               round(regr_intercept(o_totalprice, day), 2)  AS price_intercept
        FROM {orders_prepared}
        GROUP BY GROUPING SETS ((o_orderstatus), (month))
        """,
        orders_prepared=prepared,
    )


@register(
    "customer_order_stats",
    deprioritized=True,  # round-6 rotation: hash-green 4+ rounds; slot
    # yielded to a never-driver-hashed query (VERDICT r5 item 1)
    oracle="""
    SELECT o_custkey,
           count(*)                         AS n_orders,
           round(sum(o_totalprice), 2)      AS spend,
           max_by(o_orderkey, o_totalprice) AS biggest_order,
           min_by(o_orderkey, o_totalprice) AS smallest_order,
           round(max(o_totalprice), 2)      AS max_price,
           round(regr_slope(o_totalprice,
                 date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))), 6)
               + 0.0                        AS spend_trend
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 12 AND sum(o_totalprice) > 500000
    """,
)
def customer_order_stats(spark, sf_dir):
    """argmax/argmin aggregates + HAVING post-aggregation filter in one
    pass per customer.  NB: ties on o_totalprice would be nondeterministic
    in both engines; the testdata's continuous prices make ties
    improbable (and the driver compares on this data).

    ``spend_trend`` comes from the Arrow-batched ``applyInPandas``
    custom operator (operators/custom.customer_spend_trend_df — a
    least-squares slope fitted in pandas per customer group) and is
    hash-checked against DuckDB's declarative ``regr_slope`` — the
    driver-verified proof that the grouped-map Python execution path
    computes correctly (round 4; previously only a local pinned test).
    The ``+ 0.0`` on the oracle side normalizes IEEE -0.0 after
    rounding; the pandas side rounds via Python round() whose only
    divergence from SQL round (banker's ties) needs the unrounded
    slope to land exactly on a 5e-7 boundary — measure-zero on
    continuous prices.
    [round-1 queries: min_by_max_by + having_filter; round-3 query:
    customer_spend_trend — column-merged round 4]"""
    from simplex_mapreduce_spark.operators.custom import customer_spend_trend_df

    o = load_table(spark, sf_dir, "orders", convert_ts=False)
    o_ts = load_table(spark, sf_dir, "orders")
    trend = customer_spend_trend_df(o_ts).select(
        F.col("o_custkey").alias("t_custkey"),
        (F.col("spend_trend") + F.lit(0.0)).alias("spend_trend"),
    )
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_spend"),
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("_spend") > 500000))
        .join(trend, F.col("o_custkey") == F.col("t_custkey"))
        .select(
            "o_custkey",
            "n_orders",
            F.round("_spend", 2).alias("spend"),
            "biggest_order",
            "smallest_order",
            "max_price",
            "spend_trend",
        )
    )


# the scalar-subquery surface lives in relational.scalar_functions
# (pct_of_avg / above_2x_avg — merged round 4; the broadcast-1-row-
# aggregate plan shape is unchanged)

# GROUPING SETS lives in relational.grouping_analytics (merged with
# ROLLUP/CUBE — one tagged result, still via the SQL entry point)

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "pivot_events",
    # oracled round 7 (deprioritized: local strict gate; ALSO
    # driver-verified transitively as unpivot_events' input).  The
    # oracle is the conditional-aggregation formulation of PIVOT.
    oracle=f"""
    SELECT user_id,
           {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
                      for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
    deprioritized=True,
)
def pivot_events(spark, sf_dir):
    """Pivot (long->wide) with an explicit value list — at scale the
    explicit list avoids the extra distinct-values job."""
    e = load_table(spark, sf_dir, "events", convert_ts=False)
    return (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


_UNPIVOT_BRANCHES = " UNION ALL ".join(
    f"SELECT user_id, '{t}' AS event_type, {t} AS n FROM wide"
    for t in _EVENT_TYPES
)


@register(
    "unpivot_events",
    deprioritized=True,  # round-5 rotation: slot yielded to a newer query
    oracle=f"""
    WITH wide AS (
        SELECT user_id,
               {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
                          for t in _EVENT_TYPES)}
        FROM events GROUP BY user_id)
    {_UNPIVOT_BRANCHES}
    """,
)
def unpivot_events(spark, sf_dir):
    """Unpivot (wide->long, a.k.a. melt): the inverse of pivot_events —
    the per-type count columns fold back into (user_id, event_type, n)
    rows.  Pure metadata reshape plus a projection: no shuffle beyond
    the pivot aggregation it consumes.  The oracled hash-check covers
    BOTH reshape directions in one slot: the pivot plan is this query's
    input, so a pivot bug surfaces here (round-4 swap; the roundtrip is
    additionally pinned by tests/test_oracle_queries.py)."""
    wide = pivot_events(spark, sf_dir)
    return wide.unpivot("user_id", _EVENT_TYPES, "event_type", "n")


@register("table_profile")  # rows-only: approx_count_distinct sketches
# differ by engine; exact metrics are DuckDB-pinned in
# tests/test_oracle_queries.py::test_table_profile_exact_metrics
def table_profile(spark, sf_dir):
    """Deequ-style column profiling of lineitem in ONE aggregate pass:
    per measure column — row count, null count, approximate distinct
    count (HLL++, the only viable cardinality at 100 TB), min, max,
    mean.  All metrics for all columns come from a single scan + single
    partial-aggregated reduction; the long (column, metric, ...) shape
    comes from exploding an inline struct array AFTER the aggregate
    (5 rows), not from five scans."""
    li = load_table(spark, sf_dir, "lineitem", convert_ts=False)
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}_nn"),
            F.approx_count_distinct(c, 0.01).alias(f"{c}_ad"),
            F.min(c).cast("double").alias(f"{c}_mn"),
            F.max(c).cast("double").alias(f"{c}_mx"),
            F.round(F.avg(c), 6).alias(f"{c}_av"),
        ]
    one = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n_rows").alias("n_rows"),
                (F.col("_n_rows") - F.col(f"{c}_nn")).alias("n_nulls"),
                F.col(f"{c}_ad").alias("approx_distinct"),
                F.col(f"{c}_mn").alias("min_val"),
                F.col(f"{c}_mx").alias("max_val"),
                F.col(f"{c}_av").alias("mean_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def _profile_exact_oracle() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    agg = ", ".join(
        f"count({c}) AS {c}_nn, count(DISTINCT {c}) AS {c}_nd, "
        f"CAST(min({c}) AS DOUBLE) AS {c}_mn, "
        f"CAST(max({c}) AS DOUBLE) AS {c}_mx, "
        f"round(avg({c}), 6) AS {c}_av"
        for c in cols
    )
    arms = " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", n AS n_rows, n - {c}_nn AS n_nulls, "
        f"{c}_nd AS n_distinct, {c}_mn AS min_val, {c}_mx AS max_val, "
        f"{c}_av AS mean_val FROM agg"
        for c in cols
    )
    return f"WITH agg AS (SELECT count(*) AS n, {agg} FROM lineitem) {arms}"


@register("table_profile_exact", oracle=_profile_exact_oracle())
# round-9 addition (VERDICT r8 item 5): the exact half of table_profile
# under a driver oracle, shrinking the rows-only set to checks that are
# GENUINELY cross-engine-impossible (the HLL sketch itself).
def table_profile_exact(spark, sf_dir):
    """table_profile's exact metrics under a driver hash check: per
    measure column — row count, null count, EXACT distinct count, min,
    max, 6dp mean — in one scan + one partial-aggregated reduction
    (count(DISTINCT) over four columns expands to Spark's standard
    multi-distinct expand plan: still a single scan, ~4x the aggregate
    rows, exact).  The HLL twin above stays the 100 TB production path
    — exact multi-column distinct at 100 TB pays an expand shuffle per
    column, which is precisely why the sketch variant exists; this twin
    is its verification surface.  6dp mean follows the proven
    doc_bigram_logprob float-parity recipe."""
    li = load_table(spark, sf_dir, "lineitem", convert_ts=False)
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}_nn"),
            F.count_distinct(F.col(c)).alias(f"{c}_nd"),
            F.min(c).cast("double").alias(f"{c}_mn"),
            F.max(c).cast("double").alias(f"{c}_mx"),
            F.round(F.avg(c), 6).alias(f"{c}_av"),
        ]
    one = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n_rows").alias("n_rows"),
                (F.col("_n_rows") - F.col(f"{c}_nn")).alias("n_nulls"),
                F.col(f"{c}_nd").alias("n_distinct"),
                F.col(f"{c}_mn").alias("min_val"),
                F.col(f"{c}_mx").alias("max_val"),
                F.col(f"{c}_av").alias("mean_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


@register(
    "array_functions",
    deprioritized=True,  # round-5 rotation: slot yielded to a newer query
    oracle="""
    SELECT vec_id,
           len(embedding)                                      AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) + 0.0        AS first_val,
           round(CAST(list_max(embedding) AS DOUBLE), 4) + 0.0 AS max_val,
           round(list_sum(CAST(embedding AS DOUBLE[])), 4) + 0.0 AS total,
           round(list_sum(CAST(list_slice(embedding, 1, 8) AS DOUBLE[])), 4)
               + 0.0                                           AS head_sum,
           list_position(embedding, list_max(embedding))       AS pos_of_max,
           len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
                                                               AS n_positive,
           round(CAST(list_sort(CAST(embedding AS DOUBLE[]))[2] AS DOUBLE), 4)
               + 0.0                                           AS second_min,
           list_contains(embedding, list_max(embedding))       AS has_max
    FROM embeddings
    """,
)
def array_functions(spark, sf_dir):
    """Array/higher-order function surface over the embedding column:
    element access, slice, max, HOF sum/filter, position lookup, full
    array sort, membership — each a JVM expression, zero UDFs.

    Every rounded column adds ``+ 0.0``: round() of a tiny negative
    value yields IEEE -0.0, which the driver's value normalizer formats
    differently from +0.0 ("-0.000000" vs "0.000000"), silently
    misaligning the row sort; -0.0 + 0.0 = +0.0 normalizes both engines
    to one zero (first seen as a REAL sf0.1-only hash mismatch)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = emb.cast("array<double>")
    ssum = lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    z = F.lit(0.0)
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        (F.round(F.element_at(emb, 1).cast("double"), 4) + z).alias("first_val"),
        (F.round(F.array_max(emb).cast("double"), 4) + z).alias("max_val"),
        (F.round(ssum(dbl), 4) + z).alias("total"),
        (F.round(ssum(F.slice(dbl, 1, 8)), 4) + z).alias("head_sum"),
        F.array_position(emb, F.array_max(emb)).alias("pos_of_max"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("long").alias("n_positive"),
        (F.round(F.element_at(F.array_sort(dbl), 2), 4) + z).alias("second_min"),
        F.array_contains(emb, F.array_max(emb)).alias("has_max"),
    )


@register("approx_count_distinct")  # no oracle: HLL sketches differ by engine
def approx_count_distinct(spark, sf_dir):
    """HyperLogLog++ distinct estimate (rows-only check: DuckDB's
    approx_distinct uses a different sketch, so only the exact count is
    cross-checkable — see count_distinct for the exact variant)."""
    li = load_table(spark, sf_dir, "lineitem", convert_ts=False)
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.01).alias("approx_supps"),
    )


@register(
    "lineitem_flag_stats",
    deprioritized=True,  # round-5 rotation: slot yielded to a newer query
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2)
               AS discounted_rev,
           count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk,
           round(avg(CASE WHEN l_tax > 0.04 THEN l_extendedprice END), 4)
               AS avg_taxed_price,
           round(stddev_samp(l_quantity), 4)                  AS qty_stddev,
           round(var_samp(l_quantity), 4)                     AS qty_var,
           round(corr(l_quantity, l_extendedprice), 4) + 0.0  AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) + 0.0 AS qty_price_covar,
           CAST(count_if(l_discount > 0.05) AS BIGINT)        AS n_discounted,
           bool_and(l_quantity < 60)                          AS all_small,
           bool_or(l_tax > 0.07)                              AS any_high_tax,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
                                                              AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def lineitem_flag_stats(spark, sf_dir):
    """Conditional aggregation (CASE-guarded sum/count/avg) and
    statistical aggregates (sample stddev/variance, correlation,
    covariance — single-pass distributed moments) in one hash-agg.
    [round-1 queries: conditional_agg + stats_agg]

    Oracle CASTs count_if to BIGINT: DuckDB's HUGEINT surfaces in pandas
    as float ("8912.0") vs Spark's BIGINT ("8912") — a driver string-hash
    mismatch (r2 FAIL). Note: oracle SQL is whitespace-collapsed by the
    registry, so `--` comments are not allowed in oracle strings.

    ``wavg_price`` goes through the GROUPED_AGG pandas UDF
    (operators/custom.make_weighted_avg_udaf) and is hash-checked
    against the declarative sum(p*q)/sum(q) oracle — the driver-verified
    proof that the Python UDAF execution path computes correctly (round
    4; previously only a local pinned test).  Spark refuses to mix
    GROUPED_AGG pandas UDFs with JVM aggregates in one agg
    (INVALID_PANDAS_UDF_PLACEMENT), so the UDAF runs as its own tiny
    3-row aggregate joined back on the group key."""
    from simplex_mapreduce_spark.operators.custom import make_weighted_avg_udaf

    li = load_table(spark, sf_dir, "lineitem", convert_ts=False)
    wavg = make_weighted_avg_udaf()
    udaf_side = li.groupBy("l_returnflag").agg(
        F.round(wavg(F.col("l_extendedprice"), F.col("l_quantity")), 4).alias(
            "wavg_price"
        )
    )
    main = li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(
                F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))
                .otherwise(0)
            ),
            2,
        ).alias("discounted_rev"),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_bulk"),
        F.round(
            F.avg(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 4
        ).alias("avg_taxed_price"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        # + 0.0 normalizes IEEE -0.0 (corr/covar are sign-varying and can
        # round to zero; see array_functions for the full note)
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias(
            "qty_price_corr"
        ),
        (
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2) + F.lit(0.0)
        ).alias("qty_price_covar"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_and(F.col("l_quantity") < 60).alias("all_small"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
    )
    return main.join(udaf_side, "l_returnflag")


# the per-month calendar rollup lives in orders_profile above (the
# 'month' grouping set — merged round 4 to free an oracled driver slot)


@register(
    "string_functions",
    deprioritized=True,  # round-5 rotation: slot yielded to a newer query
    oracle="""
    SELECT p_partkey,
           replace(p_name, ' ', '_')              AS name_snake,
           reverse(p_brand)                       AS brand_rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_padded,
           split_part(p_name, ' ', 2)             AS noun,
           length(p_name)                         AS name_len,
           concat_ws('/', p_brand, p_type)        AS brand_type,
           right(p_type, 5)                       AS type_tail,
           levenshtein(p_brand, p_type)           AS brand_type_dist
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    """Extended string-function surface (replace/reverse/lpad/
    split_part/length/concat_ws/right/levenshtein — the edit distance
    being the fuzzy-match primitive entity-dedup pipelines block on) —
    all whole-stage-codegen'd."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.right(F.col("p_type"), F.lit(5)).alias("type_tail"),
        F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
    )


# DuckDB oracle for part_margin_profile (promoted to the driver's hash
# window in round 5); also pinned in tests/test_oracle_queries.py.
MARGIN_SQL = """
SELECT p_brand,
       count(*) AS n_lines,
       round(sum(l_extendedprice), 2) AS revenue,
       round(sum(p_retailprice * l_quantity), 2) AS retail_value,
       round(sum(l_extendedprice) / sum(p_retailprice * l_quantity), 6)
           AS realized_ratio
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


@register(
    "part_margin_profile",
    oracle=MARGIN_SQL,
    deprioritized=True,  # round-7 rotation: hash-green r5-r6; slot
    # yielded to a never-driver-hashed query (VERDICT r6 item 2)
)  # driver-oracled since round 5
def part_margin_profile(spark, sf_dir):
    """TPC-H-Q14-style realized-price analysis per brand: line revenue
    against the catalog retail value of the shipped quantity (the
    discount/margin signal).  Broadcast the part dim into the lineitem
    scan, one partial-aggregated groupBy — the join shape
    join_part_lineitem already plan-pins, extended to the retail-price
    column."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    li = load_table(spark, sf_dir, "lineitem", convert_ts=False).select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    retail = F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.round(F.sum(retail), 2).alias("retail_value"),
            F.round(F.sum("l_extendedprice") / F.sum(retail), 6).alias(
                "realized_ratio"
            ),
        )
    )


@register(
    "q6_forecast_revenue",
    # round-6: promoted into the driver hash window (VERDICT r5 item 1)
    deprioritized=True,  # round-8 rotation: hash-green r6-r7; slot
    # yielded to the never-driver-hashed pca_top2_components (pushed
    # scan shape stays plan-pinned + locally oracled)
    oracle="""
    SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(round(l_discount * 100) AS BIGINT))
                      AS DOUBLE) / 10000, 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 3 AND 7
      AND l_quantity < 25
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape (forecasting revenue change): revenue that would
    be recovered by dropping mid-band discounts on small orders — a
    PURE scan-filter-aggregate with zero joins, the canonical
    pushdown/vectorization benchmark: every predicate (shipdate year
    band, discount band, quantity cap) reaches the parquet scan as a
    pushed filter, the scan prunes to the 4 referenced columns, and the
    whole query is one WholeStageCodegen span ending in a 1-row partial
    + final aggregate (cents-times-cents product summed exactly, /10^4
    back to dollars — the q7_nation_volume convention).

    The AUTHORITATIVE discount band is integer cents (3..7), so the
    band edges are float-exact on both engines (0.07 has no exact
    binary representation); the redundant raw-column band
    [0.0245, 0.0755) alongside it is a strict SUPERSET of the rows the
    cents band keeps (widened half a cent-ulp per side so a double
    that prints as a band edge but sits a hair below it is never
    excluded) and exists because parquet pushdown only accepts
    bare-column predicates — it is what row-group-skips the scan.  The shipdate
    band follows the q1 dtype branch: against raw epoch-nanos longs
    when the store is nanos-typed, so the pushdown survives both
    timestamp representations (sources/tables.py scale note)."""
    li = load_table(spark, sf_dir, "lineitem", convert_ts=False)
    if dict(li.dtypes)["l_shipdate"] == "bigint":
        date_pred = (F.col("l_shipdate") >= F.lit(epoch_nanos("1996-01-01"))) & (
            F.col("l_shipdate") < F.lit(epoch_nanos("1997-01-01"))
        )
    else:
        date_pred = (
            F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
        ) & (
            F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
        )
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_c = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        li.filter(
            date_pred
            # pushable twin of the authoritative cents band, WIDENED by
            # half a cent-ulp each side: round-half-away maps exactly
            # [0.025, 0.075) onto 3..7, but a stored double like
            # 0.074999999999999997 (printed 0.075) rounds to 7 yet
            # would fail a `< 0.075` comparison — the widened band can
            # only prune less, never change the result (ADVICE r5)
            & (F.col("l_discount") >= 0.0245)
            & (F.col("l_discount") < 0.0755)
            & disc_c.between(3, 7)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(
                F.sum(price_c * disc_c).cast("double") / 10000, 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
