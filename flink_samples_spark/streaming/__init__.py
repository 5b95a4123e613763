from flink_samples_spark.streaming.jobs import (
    number_sequence_job,
    session_count_stream,
    windowed_sum_stream,
)
from flink_samples_spark.streaming.sinks import idempotent_parquet_sink, read_sink
from flink_samples_spark.streaming.sources import (
    datagen_stream,
    file_replay_stream,
    rate_stream,
    write_replay_files,
)

__all__ = [
    "datagen_stream",
    "file_replay_stream",
    "idempotent_parquet_sink",
    "number_sequence_job",
    "rate_stream",
    "read_sink",
    "session_count_stream",
    "windowed_sum_stream",
    "write_replay_files",
]
