"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the arbitrary-state analog of the reference's user Reduce closure
(src/worker.go:12), but incremental: per-key state persists across
micro-batches instead of requiring the full value list at once.

Running per-user totals over the events stream: state = (event count,
value sum); each micro-batch updates the state and emits the new
running totals for the users it touched.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.streaming.events_stream import _drain, _events_stream

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
        }
    )


def stream_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-state streaming aggregation, drained with availableNow
    into a batch result (one row per user: final running totals)."""
    e = _events_stream(spark, sf_dir)
    out = (
        e.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    return _drain(out, spark, mode="update")


@register(
    "streaming_stateful_user_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_user_totals(spark, sf_dir):
    """Driver-oracled arbitrary-state streaming query: under availableNow
    on the single-file static source every user's events arrive in one
    micro-batch, so the final emitted state equals the batch groupBy."""
    return stream_user_running_totals(spark, sf_dir)
