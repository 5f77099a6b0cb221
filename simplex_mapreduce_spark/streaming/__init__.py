from simplex_mapreduce_spark.streaming.dedup_stream import (  # noqa: F401
    stream_exact_dedup,
)
from simplex_mapreduce_spark.streaming.events_stream import (
    stream_events_tumbling,
    stream_sessionization,
)
from simplex_mapreduce_spark.streaming.joins_stream import (  # noqa: F401
    stream_click_purchase_pairs,
    stream_enriched_by_nation,
)
from simplex_mapreduce_spark.streaming.stateful import (  # noqa: F401
    stream_user_running_totals,
)
from simplex_mapreduce_spark.streaming.transform_state import (  # noqa: F401
    stateful_user_activity,
    stream_user_activity_tws,
)

__all__ = [
    "stream_exact_dedup",
    "stream_events_tumbling",
    "stream_sessionization",
    "stream_user_running_totals",
    "stream_enriched_by_nation",
    "stream_click_purchase_pairs",
]
