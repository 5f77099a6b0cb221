"""Streaming observability: watermark-lateness and state metrics from
``StreamingQueryProgress``.

At 100 TB the watermark is a *production control surface*: how far it
lags event time decides both state size (too slow → unbounded state)
and data loss (too fast → late rows silently dropped).  Spark reports
all of it per micro-batch in the progress JSON; this module condenses a
query's progress history into the handful of numbers an operator
actually watches — rows dropped as too-late, current watermark, state
row counts, input volume — so pipelines (and tests) can assert on them
instead of eyeballing logs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQuery


def progress_metrics(query: StreamingQuery) -> dict[str, Any]:
    """Condense ``query.recentProgress`` into lateness/state metrics.

    Safe to call after ``awaitTermination()``/``stop()`` — the progress
    history lives on the query handle.  Keys:

    - ``n_batches``: micro-batches reported
    - ``input_rows``: total rows ingested across batches
    - ``rows_dropped_by_watermark``: rows discarded as later than the
      watermark, summed over every stateful operator and batch — the
      "did we lose data" number
    - ``last_watermark``: the final event-time watermark (ISO string,
      None until the first watermark advance)
    - ``state_rows``: rows held in the state store after the last batch
      (None for stateless queries) — the "is state bounded" number
    - ``batch_durations_ms``: per-batch wall clock, for trigger sizing
    """
    progs = list(query.recentProgress)
    if not progs:
        return {
            "n_batches": 0,
            "input_rows": 0,
            "rows_dropped_by_watermark": 0,
            "last_watermark": None,
            "state_rows": None,
            "batch_durations_ms": [],
        }
    last = progs[-1]
    dropped = sum(
        int(op.get("numRowsDroppedByWatermark", 0))
        for p in progs
        for op in (p.get("stateOperators") or [])
    )
    last_state = last.get("stateOperators") or []
    return {
        "n_batches": len(progs),
        "input_rows": sum(int(p.get("numInputRows", 0)) for p in progs),
        "rows_dropped_by_watermark": dropped,
        "last_watermark": (last.get("eventTime") or {}).get("watermark"),
        "state_rows": (
            int(last_state[0]["numRowsTotal"]) if last_state else None
        ),
        "batch_durations_ms": [int(p.get("batchDurationMs", 0)) for p in progs],
    }
