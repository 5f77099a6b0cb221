"""Streaming source switch: the same event query graph over three
sources.

The reference has no streaming at all (batch map barrier,
src/master.go:77-79); events_stream.py adds the file-backed stream.  A
real pipeline's source is a log bus, so this module makes the SOURCE a
parameter while the downstream query graph stays identical:

- ``files``  — the parquet-directory stream (events_stream._events_stream);
- ``rate``   — Spark's ``rate-micro-batch`` source mapped onto the
  events schema DETERMINISTICALLY (batch b carries values
  [b*rowsPerBatch, (b+1)*rowsPerBatch), timestamps advance a fixed
  amount per batch), which makes stream-vs-batch equivalence testable
  without external infrastructure;
- ``kafka``  — the production wiring (subscribe -> JSON value parse).
  The spark-sql-kafka connector is not bundled in this container, so
  the builder raises a clear RuntimeError pointing at the package
  coordinate when the data source is missing; the query graph itself is
  connector-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# deterministic rate -> events mapping knobs
RATE_ROWS_PER_BATCH = 1000
RATE_ADVANCE_MS_PER_BATCH = 60_000  # one minute of event time per batch
RATE_START_TS_MS = 1_700_000_000_000
RATE_N_USERS = 50

EVENTS_JSON_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, ts timestamp, "
    "value double, props string"
)


def synthetic_events_from_rate(raw: DataFrame) -> DataFrame:
    """Map the rate source's (timestamp, value) onto the events shape —
    pure projections of ``value``, so the data for any prefix of
    micro-batches is exactly reproducible in batch via spark.range."""
    return raw.select(
        F.col("value").alias("event_id"),
        (F.col("value") % RATE_N_USERS).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
            (F.col("value") % 3 + 1).cast("int"),
        ).alias("event_type"),
        F.col("timestamp").alias("ts"),
        ((F.col("value") % 97) / 10.0).alias("value"),
    )


def build_events_source(
    spark: SparkSession,
    source: str = "files",
    *,
    sf_dir: str | None = None,
    kafka_bootstrap: str = "localhost:9092",
    kafka_topic: str = "events",
) -> DataFrame:
    """Return the streaming events DataFrame for the chosen source; the
    downstream windowed/sessionized/stateful query graphs are source-
    agnostic."""
    if source == "files":
        if sf_dir is None:
            raise ValueError("files source needs sf_dir")
        from simplex_mapreduce_spark.streaming.events_stream import _events_stream

        return _events_stream(spark, sf_dir)
    if source == "rate":
        raw = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", RATE_ROWS_PER_BATCH)
            .option("advanceMillisPerBatch", RATE_ADVANCE_MS_PER_BATCH)
            .option("startTimestamp", RATE_START_TS_MS)
            .load()
        )
        return synthetic_events_from_rate(raw)
    if source == "kafka":
        try:
            raw = (
                spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", kafka_bootstrap)
                .option("subscribe", kafka_topic)
                .option("startingOffsets", "earliest")
                .load()
            )
        except Exception as ex:
            raise RuntimeError(
                "kafka streaming source unavailable: the spark-sql-kafka "
                "connector (org.apache.spark:spark-sql-kafka-0-10_2.13) is "
                "not on the classpath; add it via spark.jars.packages"
            ) from ex
        return raw.select(
            F.from_json(F.col("value").cast("string"), EVENTS_JSON_SCHEMA).alias(
                "e"
            )
        ).select("e.*")
    raise ValueError(f"unknown source {source!r}: use files|rate|kafka")


def rate_window_totals(events: DataFrame) -> DataFrame:
    """The tumbling-window aggregation used by the rate-source
    equivalence test — same shape as stream_events_tumbling."""
    return (
        events.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("win_epoch"),
            "event_type",
            "n",
            "total_value",
        )
    )


def batch_equivalent_of_rate(spark: SparkSession, n_rows: int) -> DataFrame:
    """The exact batch DataFrame the rate source produced after
    ``n_rows`` total rows — value i arrived in batch i DIV rowsPerBatch
    at startTimestamp + batch * advanceMillisPerBatch."""
    batch = F.floor(F.col("id") / RATE_ROWS_PER_BATCH)
    ts = F.timestamp_millis(
        (F.lit(RATE_START_TS_MS) + batch * RATE_ADVANCE_MS_PER_BATCH).cast("long")
    )
    raw = spark.range(n_rows).select(
        F.col("id").alias("value"), ts.alias("timestamp")
    )
    return synthetic_events_from_rate(raw)
