from owl_etl_spark.streaming.windows import hourly_event_counts, session_counts
from owl_etl_spark.streaming.dedup_stream import streaming_latest_per_key
from owl_etl_spark.streaming.joins import (
    sessionize_stateful,
    stream_stream_interval_join,
)

__all__ = [
    "hourly_event_counts",
    "session_counts",
    "streaming_latest_per_key",
    "sessionize_stateful",
    "stream_stream_interval_join",
]
