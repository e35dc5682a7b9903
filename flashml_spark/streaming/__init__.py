from flashml_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    streaming_session_stats,
    streaming_window_agg,
)
from flashml_spark.streaming.sinks import write_stream_parquet  # noqa: F401
