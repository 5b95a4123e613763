"""The reference's three dataflow jobs, re-expressed as Structured
Streaming pipelines (SURVEY.md §3).

Each builder returns the streaming DataFrame (and a starter helper);
callers attach a sink + checkpointLocation and ``start()``. The
transformations are the SAME functions the batch catalog uses
(operators.time_windows) — one definition, two execution modes,
which is the Spark-first answer to Flink's two-layer API.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_samples_spark.operators.time_windows import session_window_agg, tumbling_window_agg


def number_sequence_job(stream: DataFrame) -> DataFrame:
    """DataStreamJob (DataStreamJob.java:45-60): number sequence →
    row-format file sink. The transformation is the identity (select
    of the sequence column); sink attachment is the caller's:
    ``writeStream.format("parquet")``. Narrow pipeline — one fused
    stage, no shuffle."""
    return stream.select(F.col("value").alias("id"))


def session_count_stream(
    events: DataFrame,
    ts_col: str = "event_time",
    gap: str = "5 seconds",
    watermark: str = "1 second",
) -> DataFrame:
    """StreamingFlinkSQL (StreamingFlinkSQL.java:14-43): watermark
    ``event_time - INTERVAL '1' SECOND`` → SESSION(5 s) → COUNT AS
    total. Append-mode output: a session emits once the watermark
    passes window_end + gap-merge horizon.

    Spark rejects GLOBAL session windows in streaming ("Global
    aggregation with session window ... not supported"), so the
    non-keyed query runs under a constant grouping key — the faithful
    twin of Flink's parallelism-1 non-keyed windowAll
    (StreamingFlinkSQL.java groups by window only). Keyed session
    streams (the scale path) should pass real keys to
    ``session_window_agg`` instead."""
    keyed = events.withWatermark(ts_col, watermark).withColumn("__g", F.lit(0))
    return session_window_agg(keyed, ts_col, gap, keys=["__g"]).drop("__g")


def windowed_sum_stream(
    pojos: DataFrame,
    ts_col: str = "ts",
    size: str = "10 seconds",
    watermark: str = "11 seconds",
    sum_col: str = "id",
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """CassandraPojoSinkStreaming (CassandraPojoSinkStreaming.java:
    60-81): bounded-out-of-orderness watermark (intent 11 s — the
    reference writes Duration.ofSeconds(MAX_LATENESS+1) with
    MAX_LATENESS in ms, a units bug; we implement the intent) →
    tumbling 10 s event-time window → reduce (sum of ids).

    Flink's non-keyed windowAll runs at parallelism 1; here the
    global per-window sum is a partial→final HashAggregate over the
    shuffle — same semantics, cluster-scalable. Attach
    ``foreachBatch(idempotent_parquet_sink(dir))`` +
    ``checkpointLocation`` for the exactly-once parity
    (CassandraPojoSinkStreaming.java:84-104 collapses into the
    checkpoint option; see sinks.py)."""
    aggs = list(aggs) if aggs else [F.sum(sum_col).alias("sum_id")]
    return tumbling_window_agg(
        pojos.withWatermark(ts_col, watermark), ts_col, size, keys=keys, aggs=aggs
    )


def stream_dedup(events: DataFrame, keys: Sequence[str], ts_col: str, watermark: str) -> DataFrame:
    """Streaming dedup within the watermark horizon: state holds one
    entry per key and evicts when the watermark passes — bounded
    memory at any scale (vs. unbounded dropDuplicates state)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str,
    lower: str = "0 seconds",
    watermark: str = "1 hour",
    how: str = "inner",
    right_key: str | None = None,
) -> DataFrame:
    """Stream-stream interval join: pairs (l, r) with matching ``key``
    and ``r[right_ts]`` in ``[l[left_ts] + lower, l[left_ts] + upper]``
    — the DataStream ``intervalJoin`` capability of the reference's
    engine (its planner jar ships the SQL interval join; pom.xml:
    135-140).

    Both sides carry the same watermark; Spark's state store keeps
    each row only until the watermark passes its join-window end (the
    time-range condition is what makes the state BOUNDED — an
    unconstrained stream-stream join would buffer both streams
    forever). Inner join ⇒ matches emit as soon as both rows have
    arrived, no watermark-flush latency. Caller renames non-key
    columns to distinct names; the duplicate key column from the
    right side is dropped.

    ``how="left_outer"`` adds Flink's outer-interval-join semantics:
    an unmatched left row emits (with null right columns) only once
    the WATERMARK passes its join-window end — that is what proves
    no match can still arrive, so the watermark choice is the
    latency/completeness trade, and a replay harness must advance
    the watermark past the data (sentinel) to flush the tail.

    Both inputs often derive from ONE source stream (a self-join on
    event type); Spark's column resolution on such shared lineage can
    silently bind the key to the wrong side in OUTER joins — pass
    ``right_key`` (a pre-renamed right-side key column) to make the
    resolution unambiguous; the right key is dropped either way.
    """
    if how != "inner" and right_key is None:
        # the documented footgun made into an error: under outer
        # modes a shared-lineage self-join can bind l[key] == r[key]
        # to ONE attribute (trivially true), silently pairing every
        # left row with every in-interval right row
        raise ValueError(
            "interval_join_stream: outer modes require right_key (a "
            "pre-renamed right-side key column) — shared-lineage key "
            "resolution is ambiguous and can silently drop the key "
            "predicate"
        )
    rk = right_key or key
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[rk])
        & (r[right_ts] >= l[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how).drop(r[rk])
