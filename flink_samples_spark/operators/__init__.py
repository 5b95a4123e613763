from flink_samples_spark.operators.time_windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
]
