"""Arbitrary stateful processing via ``transformWithStateInPandas`` —
Spark 4's successor to ``applyInPandasWithState`` (stateful.py keeps
the older API as the comparison twin).

What the new API adds over the old one, and what this operator
exercises:

- TYPED, NAMED state variables instead of one opaque state tuple:
  a ``ValueState`` for the running (count, sum, max) and a ``MapState``
  keyed by event type for per-type counts — composite state the old
  API could only fake by packing everything into one row;
- state lives in the RocksDB state store provider (required by the
  API): state size is bounded by disk, not executor heap — the 100 TB
  posture for keyed state;
- an object-oriented ``StatefulProcessor`` lifecycle (init /
  handleInputRows / close) instead of a bare function, so per-key
  logic can hold handles.

Per-user output: event count, value sum, max value, and a
deterministic per-type count signature.  Under ``availableNow`` over
the static events table all rows arrive in one micro-batch, so the
emitted final state equals a batch aggregation — the DuckDB
equivalence runs in tests/test_streaming.py wherever ``protobuf`` is
installed (pyspark's transformWithState worker needs it; this
container lacks it, so here the test pins the clear gating error
instead — see the guard in :func:`stream_user_activity_tws`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from simplex_mapreduce_spark.streaming.events_stream import _drain, _events_stream

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double,"
    " type_sig string"
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


class UserActivityProcessor(StatefulProcessor):
    """Running per-user activity: ValueState totals + MapState per-type
    counts."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.totals = handle.getValueState(
            "totals", "n BIGINT, total DOUBLE, mx DOUBLE"
        )
        self.by_type = handle.getMapState("by_type", "t STRING", "c BIGINT")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        n, total, mx = (
            self.totals.get() if self.totals.exists() else (0, 0.0, float("-inf"))
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
            for t, c in pdf.groupby("event_type").size().items():
                prev = (
                    self.by_type.getValue((t,))[0]
                    if self.by_type.containsKey((t,))
                    else 0
                )
                self.by_type.updateValue((t,), (prev + int(c),))
        self.totals.update((n, total, mx))
        sig = ",".join(
            f"{t[0]}:{self.by_type.getValue(t)[0]}"
            for t in sorted(self.by_type.keys())
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_value": [round(mx, 2)],
                "type_sig": [sig],
            }
        )

    def close(self) -> None:
        pass


def stream_user_activity_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas drained with availableNow.  The
    RocksDB state store provider is required by the API; the previous
    provider conf is restored afterwards so other streaming queries in
    the session keep their default.

    GATED: the API's state protocol needs the ``protobuf`` package
    (pyspark imports ``google.protobuf`` in its transformWithState
    driver worker), which this container does not ship — same honesty
    rule as the multimodal decode stubs.  The operator raises a clear
    error instead of the opaque worker crash; everything above this
    guard is the real, complete implementation."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark's transform_with_state driver worker imports "
            "google.protobuf); not available in this environment"
        ) from exc
    e = _events_stream(spark, sf_dir)
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    try:
        out = (
            e.select("user_id", "event_type", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=UserActivityProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )
        return _drain(out, spark, mode="update")
    finally:
        if prev is not None:
            spark.conf.set(_PROVIDER_CONF, prev)
        else:
            spark.conf.unset(_PROVIDER_CONF)


# NOT registered as a driver query: the container lacks protobuf, so
# the driver would record an error row instead of a result.  The test
# gate (tests/test_streaming.py) runs the full DuckDB equivalence when
# protobuf exists and pins the clear NotImplementedError when it
# doesn't — mirroring the kafka-connector and media-decode precedents.
