"""Distributed total-order utilities: global row index and global
prefix sum WITHOUT a single-partition window.

``row_number() OVER (ORDER BY …)`` with no PARTITION BY moves the
whole dataset to one task — the canonical window scale-killer (Spark
itself warns "No Partition Defined for Window operation"). These
operators produce the same results with the classic two-pass shape a
1000-executor cluster wants:

1. range-repartition on the order columns (one shuffle; AQE sizes
   the ranges),
2. per-partition counts/sums → a TINY (n_partitions-row) frame whose
   cumulative offsets ARE computed with a single-partition window —
   over n_partitions rows, not the data,
3. broadcast the offsets back; each partition finishes locally with
   an intra-partition window + its offset.

``order_cols`` MUST be a total order (include a unique tie-break
column): rows that compare equal could land on either side of a
range boundary, which would make their relative index depend on the
partitioning.

Cost note: the data crosses two exchanges — the range repartition
and the hash exchange the intra-partition window requires on the
partition-id column (Spark cannot see that range partitioning
already satisfies it; each range partition moves as one unit).
That is 2 linear passes at any scale, vs the single-partition
window's one pass through ONE task — the trade every distributed
total-order algorithm makes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__to_pid"
_CNT = "__to_cnt"
_OFF = "__to_off"


def _ranged_with_offsets(
    df: DataFrame, order_cols: list, per_partition_agg: Column
) -> tuple[DataFrame, DataFrame]:
    ranged = df.repartitionByRange(*order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    # Materialize ONCE: the offsets frame and the final join would
    # otherwise evaluate the range exchange independently (verified:
    # with payload columns Spark plans two rangepartitioning
    # exchanges, no ReusedExchange), and the RangePartitioner's
    # reservoir sample is not stable under nondeterministic upstream
    # order or task retry — boundary rows could be counted under one
    # pid and joined under another, silently corrupting positions.
    # localCheckpoint pins a single pid assignment (fail-loud on
    # executor loss; a production pipeline wanting fault tolerance
    # swaps in a reliable checkpoint dir). One extra linear
    # materialization — the price of a correct distributed total
    # order.
    ranged = ranged.localCheckpoint()
    parts = ranged.groupBy(_PID).agg(per_partition_agg.alias(_CNT))
    # single-partition window over n_partitions rows — the whole point
    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = parts.select(
        _PID, F.coalesce(F.sum(_CNT).over(w), F.lit(0)).alias(_OFF)
    )
    return ranged, offsets


def global_order_index(
    df: DataFrame, order_cols: list, index_col: str = "pos"
) -> DataFrame:
    """1-based dense global position of every row under the total
    order ``order_cols`` — the scalable ``row_number() OVER (ORDER BY
    …)``."""
    ranged, offsets = _ranged_with_offsets(df, order_cols, F.count(F.lit(1)))
    iw = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offsets), _PID)
        .withColumn(
            index_col,
            (F.row_number().over(iw) + F.col(_OFF)).cast("bigint"),
        )
        .drop(_PID, _OFF)
    )


def global_prefix_sum(
    df: DataFrame, order_cols: list, value_col: str, sum_col: str = "running"
) -> DataFrame:
    """Inclusive running SUM(``value_col``) under the total order
    ``order_cols`` — the scalable ``SUM(v) OVER (ORDER BY …)``."""
    ranged, offsets = _ranged_with_offsets(
        df, order_cols, F.sum(value_col)
    )
    iw = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(F.broadcast(offsets), _PID)
        .withColumn(sum_col, F.sum(value_col).over(iw) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
