from bruin_spark.streaming.streaming import (
    kafka_reader_options,
    parse_kafka_json_values,
    run_stream_to_table,
    session_window_agg,
    stateful_running_counts,
    stream_dedup,
    stream_file_source,
    stream_kafka_source,
    windowed_agg,
)

__all__ = [
    "kafka_reader_options",
    "parse_kafka_json_values",
    "run_stream_to_table",
    "session_window_agg",
    "stateful_running_counts",
    "stream_dedup",
    "stream_file_source",
    "stream_kafka_source",
    "windowed_agg",
]
