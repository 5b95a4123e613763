"""Aggregation operators (SURVEY.md §2.4).

Reference sites: COUNT per window key (StreamingFlinkSQL.java:37-39),
global reduce (CassandraPojoSinkStreaming.java:68). Everything else
is the SQL-planner surface the reference ships.

Scale notes: every aggregation here plans as partial→final
HashAggregate (map-side combine before the shuffle), so the shuffle
moves one row per (partition, group), not per input row. COUNT
DISTINCT plans as a two-shuffle expand; at extreme cardinality prefer
``approx_count_distinct`` (HLL++, constant memory, one shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Multi-key grouped aggregation (partial→final under the hood)."""
    return df.groupBy(*keys).agg(*aggs)


def global_agg(df: DataFrame, aggs: Sequence[Column]) -> DataFrame:
    """No-key aggregation — the scalable analog of the reference's
    non-keyed windowAll reduce (CassandraPojoSinkStreaming.java:66-68)."""
    return df.agg(*aggs)


def count_distinct_agg(df: DataFrame, keys: Sequence[str], col: str, alias: str) -> DataFrame:
    return df.groupBy(*keys).agg(F.countDistinct(col).alias(alias))


def approx_count_distinct_agg(
    df: DataFrame, keys: Sequence[str], col: str, alias: str, rsd: float = 0.05
) -> DataFrame:
    """HLL++ sketch count-distinct; mergeable, single-shuffle."""
    return df.groupBy(*keys).agg(F.approx_count_distinct(col, rsd).alias(alias))


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Hierarchical subtotals: (k1,k2), (k1), () — null-filled keys."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """All key-subset subtotals."""
    return df.cube(*keys).agg(*aggs)


def having(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column], cond: Column) -> DataFrame:
    """GROUP BY … HAVING: post-aggregation filter."""
    return df.groupBy(*keys).agg(*aggs).filter(cond)


def pivot_agg(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Wide reshape: one output column per pivoted value.

    ``values`` is REQUIRED, not inferred — inference runs an extra
    distinct job over the data before planning, and an unbounded
    value domain would mint an unbounded number of columns. With the
    domain pinned, this plans as TWO aggregate phases (a first
    aggregate over (keys, pivot_col), then a PivotFirst aggregate
    over keys — two shuffles, each partial→final; measured on this
    session's Spark 4.1.2), with no per-value scan, no join, and no
    inference job. The second shuffle's input is one row per
    (keys, pivot value) — already aggregate-sized."""
    return df.groupBy(*keys).pivot(pivot_col, list(values)).agg(agg)


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    cols: Sequence[str],
    var_name: str = "var",
    value_name: str = "value",
) -> DataFrame:
    """Long reshape (melt): one output row per (id, measure column).
    A narrow expand — each input row yields ``len(cols)`` rows inside
    the same partition; no shuffle."""
    return df.unpivot(list(ids), list(cols), var_name, value_name)
