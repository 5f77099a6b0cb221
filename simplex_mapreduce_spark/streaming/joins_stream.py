"""Streaming joins: stream-static enrichment and watermarked
stream-stream correlation — the two Structured Streaming join shapes a
real event pipeline needs beyond windowed aggregation.

Pure extension (the reference is strictly batch, src/master.go:77-79).
Both queries drain deterministically under ``Trigger.AvailableNow``
over the static events table, so their row sets are pinned against
batch/DuckDB twins in tests/test_streaming.py AND driver-oracled since
round 7 (the same twins registered as oracles).

Scale notes:

- Stream-static join: the static side is re-planned per micro-batch as
  an ordinary join.  No broadcast hint — customer is scale-factor-linear
  (the round-2 verdict's point about fact-sized "dimensions"); a real
  deployment snapshots the dim to a compact serving table instead.
- Stream-stream join: unbounded without constraints — Spark buffers
  BOTH sides in state.  The event-time range condition plus watermarks
  on both sides is what lets the engine evict: a click older than
  watermark - 10 minutes can never match a future purchase, so its
  state row is dropped.  Without the time bound (or with only one
  watermark) state grows without limit — the canonical streaming-join
  mistake at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table
from simplex_mapreduce_spark.streaming.events_stream import (
    _drain,
    _events_stream,
)

CLICK_TO_PURCHASE_WINDOW = "10 minutes"

# DuckDB batch twin of stream_click_purchase_left_outer's drained
# result: matched pairs plus exactly the clicks whose no-match status
# the final watermark PROVES (click_ts + join window below
# min(max click_ts, max purchase_ts) - delay).  Shared by the local
# equivalence pin (tests/test_streaming.py) and the sf1 at-scale check
# (scale_bench.py --oracles), so both verify the same contract.
CLICK_PURCHASE_LEFT_OUTER_ORACLE = """
    WITH clicks AS (
        SELECT user_id, event_id AS click_id,
               CAST(ts AS TIMESTAMP) AS click_ts
        FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id AS p_user_id, event_id AS purchase_id,
               CAST(ts AS TIMESTAMP) AS purchase_ts,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    ), wm AS (
        SELECT least((SELECT max(click_ts) FROM clicks),
                     (SELECT max(purchase_ts) FROM purchases))
               - INTERVAL 10 MINUTE AS w
    ), joined AS (
        SELECT c.user_id, c.click_id, c.click_ts,
               p.purchase_id, p.purchase_ts, p.purchase_value
        FROM clicks c LEFT JOIN purchases p
          ON c.user_id = p.p_user_id
         AND p.purchase_ts >= c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 10 MINUTE
    )
    SELECT user_id, click_id,
           CAST(floor(epoch(click_ts)) AS BIGINT) AS click_epoch,
           purchase_id,
           CAST(floor(epoch(purchase_ts)) AS BIGINT) AS purchase_epoch,
           round(purchase_value, 2) AS purchase_value
    FROM joined
    WHERE purchase_id IS NOT NULL
       OR click_ts + INTERVAL 10 MINUTE < (SELECT w FROM wm)
"""


def stream_enriched_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched with the customer
    -> nation dimension, then a watermarked 5-minute tumbling window
    per nation."""
    e = _events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), F.col("n_name").alias("nation"))
    )
    agg = (
        e.join(cust, "user_id")  # stream-static inner join
        .groupBy(F.window("ts", "5 minutes").alias("w"), "nation")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("win_epoch"),
            "nation",
            "n",
            "total_value",
        )
    )
    return _drain(agg, spark)


def stream_click_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: every (click, purchase)
    pair by the same user with the purchase at most 10 event-time
    minutes after the click.  Watermarks on BOTH sides + the range
    condition bound the join state (see module docstring)."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    pairs = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {CLICK_TO_PURCHASE_WINDOW}")
        ),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.col("click_ts").cast("long").alias("click_epoch"),
        F.col("purchase_ts").cast("long").alias("purchase_epoch"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )
    return _drain(pairs, spark, mode="append")


def stream_click_purchase_left_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: every click, paired
    with its within-10-minutes purchase when one exists, else emitted
    once with NULL purchase columns.

    Outer semantics are what make this the hard streaming shape: an
    unmatched click can only be emitted once the engine PROVES no
    future purchase can match it — i.e. when the global watermark
    passes ``click_ts + join window``.  Under ``availableNow`` the final
    no-data micro-batch (SPARK-24156) advances the watermark to
    ``min(max click_ts, max purchase_ts) - delay`` and flushes exactly
    the provably-unmatched state, so the drained result is
    deterministic — clicks inside the final watermark horizon are
    (correctly) never emitted, mirroring a live pipeline where the
    stream simply hasn't closed yet.  Determinism across batch splits
    (1 file vs maxFilesPerTrigger=1 over 4 files) is what the local
    DuckDB pin in tests/test_streaming.py certifies."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    pairs = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {CLICK_TO_PURCHASE_WINDOW}")
        ),
        "left_outer",
    ).select(
        "user_id",
        "click_id",
        F.col("click_ts").cast("long").alias("click_epoch"),
        "purchase_id",
        F.col("purchase_ts").cast("long").alias("purchase_epoch"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )
    return _drain(pairs, spark, mode="append")


# All three promoted to the driver's hash window in round 7 (VERDICT
# r6 item 2): the availableNow drain is deterministic (inner joins and
# stream-static enrichment see all data; the left-outer's unmatched set
# is closed-form in the final watermark), so the batch twins the local
# tests always pinned serve as driver oracles unchanged.

ENRICHED_BY_NATION_ORACLE = """
    SELECT CAST(epoch(time_bucket(INTERVAL 5 MINUTE, CAST(e.ts AS TIMESTAMP)))
                AS BIGINT) AS win_epoch,
           n.n_name AS nation,
           count(*) AS n,
           round(sum(e.value), 2) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
"""

CLICK_PURCHASE_INNER_ORACLE = """
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(floor(epoch(CAST(c.ts AS TIMESTAMP))) AS BIGINT) AS click_epoch,
           CAST(floor(epoch(CAST(p.ts AS TIMESTAMP))) AS BIGINT) AS purchase_epoch,
           round(p.value, 2) AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
"""


@register("streaming_enriched_by_nation", oracle=ENRICHED_BY_NATION_ORACLE)
def streaming_enriched_by_nation(spark, sf_dir):
    return stream_enriched_by_nation(spark, sf_dir)


@register("streaming_click_purchase_join", oracle=CLICK_PURCHASE_INNER_ORACLE)
def streaming_click_purchase_join(spark, sf_dir):
    return stream_click_purchase_pairs(spark, sf_dir)


@register(
    "streaming_click_purchase_left_outer",
    oracle=CLICK_PURCHASE_LEFT_OUTER_ORACLE,
)
def streaming_click_purchase_left_outer(spark, sf_dir):
    return stream_click_purchase_left_outer(spark, sf_dir)
