"""Analytic (OVER-clause) window functions and top-k (SURVEY.md §2.5, §2.6).

Part of the SQL surface the reference ships via its planner jar.
Every helper takes an explicit deterministic ordering — rank/lag
results are only well-defined (and oracle-checkable) under a total
order, so callers must include a unique tie-break column.

Scale notes: partitioned window functions shuffle once on
``partition_by`` and sort within partitions — same cost shape as a
grouped agg. A window with NO partition key forces a single-partition
sort; ``global_topk`` instead uses orderBy+limit, which Spark plans
as TakeOrderedAndProject (per-partition heap top-k, then merge on the
driver — no global sort, no single-task bottleneck).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def partition_window(partition_by: Sequence[str], order_by: Sequence[Column]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def with_rank_columns(
    df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    w = partition_window(partition_by, order_by)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
    )


def with_lag_lead(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    n: int = 1,
) -> DataFrame:
    w = partition_window(partition_by, order_by)
    return df.withColumn("lag_val", F.lag(col, n).over(w)).withColumn(
        "lead_val", F.lead(col, n).over(w)
    )


def running_agg(
    df: DataFrame,
    agg_col: Column,
    alias: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW."""
    w = partition_window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(alias, agg_col.over(w))


def range_frame_agg(
    df: DataFrame,
    agg_col: Column,
    alias: str,
    partition_by: Sequence[str],
    order_col: str,
    preceding: int,
) -> DataFrame:
    """RANGE BETWEEN ``preceding`` PRECEDING AND CURRENT ROW over a
    numeric ordering column (peers by value, not row position).

    ``preceding`` must be an integer: PySpark's ``rangeBetween`` only
    accepts long bounds (a fractional bound dies in Py4J with a
    no-such-method error) — for fractional ranges over doubles, scale
    the ordering column to integer units, or use a SQL
    ``RANGE BETWEEN INTERVAL`` frame for timestamps."""
    if preceding != int(preceding):
        raise ValueError(
            f"range_frame_agg: preceding must be an integer (got "
            f"{preceding!r}); scale the ordering column to integer units "
            "for fractional ranges"
        )
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(order_col))
        .rangeBetween(-int(preceding), 0)
    )
    return df.withColumn(alias, agg_col.over(w))


def with_ntile(
    df: DataFrame, n: int, partition_by: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    w = partition_window(partition_by, order_by)
    return df.withColumn("tile", F.ntile(n).over(w)).withColumn(
        "pct_rank", F.percent_rank().over(w)
    )


def global_topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Top-k with a total order → TakeOrderedAndProject physical plan."""
    return df.orderBy(*order_by).limit(k)


def topk_per_group(
    df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column], k: int
) -> DataFrame:
    """row_number ≤ k per group — the scalable per-group top-k (state
    is one heap per group inside the window sort, no driver collect)."""
    w = partition_window(partition_by, order_by)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
