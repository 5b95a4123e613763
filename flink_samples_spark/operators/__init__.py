from flink_samples_spark.operators.aggregates import (
    approx_count_distinct_agg,
    count_distinct_agg,
    cube_agg,
    global_agg,
    hash_agg,
    having,
    pivot_agg,
    rollup_agg,
    unpivot,
)
from flink_samples_spark.operators.analytic import (
    global_topk,
    range_frame_agg,
    running_agg,
    topk_per_group,
    with_lag_lead,
    with_ntile,
    with_rank_columns,
)
from flink_samples_spark.operators.joins import (
    anti_join,
    as_of_join,
    banded_range_join,
    broadcast_join,
    merge_upsert,
    range_join,
    semi_join,
    sort_merge_join,
    star_join,
)
from flink_samples_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
    zorder_key,
)
from flink_samples_spark.operators.sampling import (
    hash_sample,
    hash_split,
    reservoir_per_group,
    stratified_sample,
    weighted_sample,
)
from flink_samples_spark.operators.skew import (
    salted_agg,
    salted_broadcast_replicate_join,
)
from flink_samples_spark.operators.timeseries import resample_interpolate
from flink_samples_spark.operators.total_order import (
    global_order_index,
    global_prefix_sum,
)
from flink_samples_spark.operators.time_windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "banded_range_join",
    "resample_interpolate",
    "stratified_sample",
    "weighted_sample",
    "reservoir_per_group",
    "hash_sample",
    "hash_split",
    "anti_join",
    "as_of_join",
    "approx_count_distinct_agg",
    "broadcast_join",
    "count_distinct_agg",
    "cube_agg",
    "global_agg",
    "global_order_index",
    "global_prefix_sum",
    "global_topk",
    "hash_agg",
    "having",
    "merge_upsert",
    "pivot_agg",
    "range_frame_agg",
    "range_join",
    "rollup_agg",
    "unpivot",
    "running_agg",
    "salted_agg",
    "salted_broadcast_replicate_join",
    "colocated_join",
    "write_bucketed",
    "zorder_key",
    "semi_join",
    "session_window_agg",
    "sliding_window_agg",
    "sort_merge_join",
    "star_join",
    "topk_per_group",
    "tumbling_window_agg",
    "with_lag_lead",
    "with_ntile",
    "with_rank_columns",
]
