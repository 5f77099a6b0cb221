from simplex_mapreduce_spark.streaming.events_stream import (
    stream_events_tumbling,
    stream_sessionization,
)

__all__ = ["stream_events_tumbling", "stream_sessionization"]
