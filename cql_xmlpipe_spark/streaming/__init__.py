from cql_xmlpipe_spark.streaming.sources import events_schema, stream_events
from cql_xmlpipe_spark.streaming.windows import (
    session_window_stats,
    sliding_window_counts,
    tumbling_window_counts,
)
from cql_xmlpipe_spark.streaming.stateful import running_user_stats
from cql_xmlpipe_spark.streaming.sink import write_xmlpipe_stream

__all__ = [
    "events_schema",
    "stream_events",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_stats",
    "running_user_stats",
    "write_xmlpipe_stream",
]
