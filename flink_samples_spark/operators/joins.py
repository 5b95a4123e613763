"""Join operators (SURVEY.md §2.3).

The reference contains no explicit joins; the capability comes from
the SQL planner it ships (flink-table-planner-loader,
pom.xml:135-140). Here each join family is a constructor that picks
the physical strategy Catalyst should use — via hints, not custom
execution code.

Scale notes (100 TB):
- ``broadcast_join``: dims (region/nation/supplier/part at TPC-H
  shape) stay far under the broadcast threshold even at SF100k —
  replicating the dim avoids shuffling the fact table entirely.
- ``sort_merge_join``: the big×big path; both sides shuffle on the
  key once, AQE splits skewed partitions
  (``spark.sql.adaptive.skewJoin``).
- ``range_join``: non-equi conditions fall back to
  BroadcastNestedLoopJoin; keep the broadcast side small (it is
  O(|small|) memory per executor) — at scale, band the range into
  buckets first (equi-join on bucket, residual predicate after) to
  avoid the cartesian blowup.
- ``star_join``: chained broadcasts on the dim chain; only the
  fact table ever shuffles (for the final agg), which is the plan a
  1000-executor cluster wants.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Equi-join with the dimension side replicated to every executor."""
    return fact.join(F.broadcast(dim), on, how)


def sort_merge_join(
    left: DataFrame, right: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Big×big equi-join: force shuffle + sort-merge (MERGE hint)."""
    return left.join(right.hint("merge"), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """EXISTS: rows of ``left`` with at least one match (left columns only)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """NOT EXISTS: rows of ``left`` with no match."""
    return left.join(right, on, "left_anti")


def range_join(left: DataFrame, right: DataFrame, cond: Column, how: str = "inner") -> DataFrame:
    """Non-equi (theta/range) join. Physical plan is a nested-loop with
    the smaller side broadcast; see module docstring for the banding
    rewrite at scale."""
    return left.join(F.broadcast(right), cond, how)


def star_join(fact: DataFrame, dims: Sequence[tuple[DataFrame, str | Column]]) -> DataFrame:
    """Multi-way star join: fact ⋈ dim1 ⋈ dim2 ⋈ … with every dim
    broadcast, so the fact table never shuffles for the joins."""
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on)
    return out
