from vector_db_setup_spark.streaming.events import (
    sessionized_stream,
    sliding_counts_stream,
    stream_events,
    streaming_dedup,
    tumbling_counts_stream,
)

__all__ = [
    "sessionized_stream",
    "sliding_counts_stream",
    "stream_events",
    "streaming_dedup",
    "tumbling_counts_stream",
]
