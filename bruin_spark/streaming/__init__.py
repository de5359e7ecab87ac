from bruin_spark.streaming.streaming import (
    run_stream_to_table,
    stateful_running_counts,
    stream_dedup,
    stream_file_source,
    windowed_agg,
)

__all__ = [
    "run_stream_to_table",
    "stateful_running_counts",
    "stream_dedup",
    "stream_file_source",
    "windowed_agg",
]
