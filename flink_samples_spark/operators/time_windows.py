"""Event-time window aggregations (session / tumbling / sliding).

Reference parity:
- SESSION window, 5 s gap, COUNT per window — the flagship SQL query
  ``SELECT window_start, window_end, COUNT(f0) AS total FROM
  TABLE(SESSION(TABLE SourceTable, DESCRIPTOR(event_time),
  INTERVAL '5' SECOND)) GROUP BY window_start, window_end``
  (``StreamingFlinkSQL.java:36-39``) → :func:`session_window_agg`
  via Spark's native ``session_window``.
- Tumbling 10 s event-time window + reduce, non-keyed windowAll
  (``CassandraPojoSinkStreaming.java:66-68``) →
  :func:`tumbling_window_agg` with no extra keys. Spark needs no
  windowAll special case: a global per-window aggregate is a
  two-phase partial/final HashAggregate over the shuffle, so unlike
  Flink's parallelism-1 windowAll operator it scales with the
  cluster — this is deliberately NOT emulated as a single-partition
  operator (100 TB design note).
- Sliding windows complete the family the reference's window TVF
  surface implies.

All three work identically on batch DataFrames (oracle-checkable)
and on streaming DataFrames with ``withWatermark`` upstream; the
streaming wiring lives in ``flink_samples_spark.streaming``.

Scale notes: the only shuffle is the hash exchange on the window
key(s); aggregation is partial→final (map-side combine), so per-key
skew is bounded by window population, and AQE handles residual skew.
Session windows additionally sort within key-partitions to merge
overlapping [ts, ts+gap) intervals — Spark's ``MergingSessionsExec``
— which is linear after the sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Window, Column, DataFrame
from pyspark.sql import functions as F


def _finish(win_agg: DataFrame, keys: Sequence[str], win_col: str = "window") -> DataFrame:
    """Flatten the window struct to the reference's sink shape
    (window_start, window_end, ... — ``StreamingFlinkSQL.java:27-31``)."""
    cols = [
        F.col(f"{win_col}.start").alias("window_start"),
        F.col(f"{win_col}.end").alias("window_end"),
        *[F.col(k) for k in keys],
    ]
    other = [c for c in win_agg.columns if c != win_col and c not in keys]
    return win_agg.select(*cols, *[F.col(c) for c in other])


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Session (gap-based) windows: events closer than ``gap`` merge
    into one window; window_end = last event ts + gap.

    Default aggregate is COUNT(*) AS total, matching the flagship
    (``StreamingFlinkSQL.java:37``).
    """
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("total")]
    grouped = df.groupBy(F.session_window(F.col(ts_col), gap).alias("window"), *keys)
    return _finish(grouped.agg(*aggs), keys)


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Fixed, non-overlapping event-time windows.

    With no ``keys`` this is the global per-window aggregate — the
    scalable equivalent of the reference's non-keyed windowAll reduce
    (``CassandraPojoSinkStreaming.java:66-68``).
    """
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("total")]
    grouped = df.groupBy(F.window(F.col(ts_col), size).alias("window"), *keys)
    return _finish(grouped.agg(*aggs), keys)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Overlapping windows of ``size`` every ``slide``; each event
    lands in size/slide windows (Spark expands, then aggregates)."""
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("total")]
    grouped = df.groupBy(F.window(F.col(ts_col), size, slide).alias("window"), *keys)
    return _finish(grouped.agg(*aggs), keys)


def session_window_dynamic_gap(
    df: DataFrame,
    ts_col: str,
    gap_col: Column | str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Batch session windows with a PER-EVENT gap (Flink's
    ``SessionWindowTimeGapExtractor`` semantics): each event spans
    [ts, ts + gap); overlapping spans merge; a session's end is
    max(tsᵢ + gapᵢ) over its members.

    Gaps-and-islands with a dynamic reach: a session breaks where
    ts exceeds the running max of previous span ends — one window
    pass (running max + running sum share one shuffle+sort on the
    key) and one groupBy on (key, session_id); the same two-stage
    cost shape as the fixed-gap rewrite, scale-indifferent to the
    gap being a column. With ``keys=()`` the window degrades to a
    single-partition global sort (the same caveat as any unkeyed
    window) — pass keys at scale.

    Gaps are validated IN the plan: a zero/negative per-event gap
    would silently produce inverted windows (window_end before
    window_start), so such a row raises at execution instead —
    Flink's ``SessionWindowTimeGapExtractor`` contract.
    Output columns: (window_start, window_end, *keys, aggs...) — the
    same shape as the other window helpers.
    """
    internal = {"__end", "__sid"} & set(df.columns)
    if internal:
        raise ValueError(
            f"input may not contain the internal columns {sorted(internal)}: "
            "rename them before session_window_dynamic_gap (withColumn "
            "would silently overwrite them)"
        )
    gap = F.col(gap_col) if isinstance(gap_col, str) else gap_col
    gap = F.when(gap > 0, gap).otherwise(
        F.raise_error(
            F.concat(
                F.lit("session_window_dynamic_gap: non-positive gap "),
                F.coalesce(gap.cast("string"), F.lit("NULL")),
            )
        )
    )
    span_end = F.col(ts_col) + F.make_interval(secs=gap)
    w_all = Window.partitionBy(*[F.col(k) for k in keys]) if keys else Window.partitionBy(F.lit(1))
    w_ord = w_all.orderBy(F.col(ts_col))
    prev_end = F.max(span_end).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = (prev_end.isNull() | (F.col(ts_col) > prev_end)).cast("int")
    sid = F.sum(brk).over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    base = df.withColumn("__end", span_end).withColumn("__sid", sid)
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("total")]
    out = base.groupBy(*keys, F.col("__sid")).agg(
        F.min(ts_col).alias("window_start"),
        F.max("__end").alias("window_end"),
        *aggs,
    ).drop("__sid")
    # family-uniform column order (matches _finish)
    other = [c for c in out.columns if c not in ("window_start", "window_end", *keys)]
    return out.select("window_start", "window_end", *keys, *other)
