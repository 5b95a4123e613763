"""Differential test: the custom applyInPandasWithState sessionizer
must produce the same sessions as the built-in session_window
operator on the same replayed stream."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_samples_spark.operators.time_windows import session_window_agg
from flink_samples_spark.streaming.sinks import idempotent_parquet_sink, read_sink
from flink_samples_spark.streaming.sources import file_replay_stream
from flink_samples_spark.streaming.stateful import sessionize_with_state

BASE = dt.datetime(2024, 1, 1, 10, 0, 0)
SENT = BASE + dt.timedelta(hours=2)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture()
def tmpdirs():
    dirs = [tempfile.mkdtemp(prefix=p) for p in ("replay_", "sink_", "cp_")]
    yield dirs
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def test_custom_sessionizer_out_of_order_extends_backward(spark, tmpdirs):
    """An in-watermark event OLDER than the open session must extend
    window_start backward (and an event older than start-gap emits as
    its own session rather than polluting the open one)."""
    replay, sink, cp = tmpdirs
    s = lambda sec: BASE + dt.timedelta(seconds=sec)
    batches = [
        [(1, s(100), 1.0)],          # open session at 100
        [(1, s(97), 2.0)],           # 3s older, within gap → start=97
        [(1, s(80), 3.0)],           # 17s older than start → own session
        [(-1, SENT, 0.0)],
    ]
    for i, chunk in enumerate(batches):
        p = os.path.join(replay, f"c{i:03d}.parquet")
        pd.DataFrame(
            {"user_id": [r[0] for r in chunk], "ts": [r[1] for r in chunk],
             "value": [r[2] for r in chunk]}
        ).to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(p, (1_700_000_000 + i,) * 2)

    stream = file_replay_stream(spark, replay, SCHEMA)
    # watermark wide enough that nothing is dropped as late
    out = sessionize_with_state(stream, gap_seconds=5, watermark="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(idempotent_parquet_sink(sink))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.window_start, r.window_end): (r.total, r.sum_value)
        for r in read_sink(spark, sink).collect()
        if r.user_id >= 0
    }
    assert got == {
        (s(97), s(105)): (2, 3.0),  # backward-extended session
        (s(80), s(85)): (1, 3.0),   # far-older straggler as own session
    }


def test_salted_join_rejects_outer_modes(spark, sf_dir):
    import pytest as _pytest

    from flink_samples_spark.operators.skew import salted_broadcast_replicate_join
    from flink_samples_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    part = load_table(spark, sf_dir, "part")
    with _pytest.raises(ValueError):
        salted_broadcast_replicate_join(li, part, "p_partkey", how="full")


def test_custom_sessionizer_matches_builtin(spark, tmpdirs):
    replay, sink, cp = tmpdirs
    s = lambda sec: BASE + dt.timedelta(seconds=sec)
    rows = [
        # user 1: sessions [0..4], [30..32]; user 2: [1..8]
        [(1, s(0), 1.0), (2, s(1), 2.0), (1, s(2), 3.0)],
        [(1, s(4), 4.0), (2, s(5), 5.0), (2, s(8), 6.0)],
        [(1, s(30), 7.0), (1, s(32), 8.0)],
        [(-1, SENT, 0.0)],
    ]
    for i, chunk in enumerate(rows):
        p = os.path.join(replay, f"c{i:03d}.parquet")
        pd.DataFrame(
            {"user_id": [r[0] for r in chunk], "ts": [r[1] for r in chunk],
             "value": [r[2] for r in chunk]}
        ).to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(p, (1_700_000_000 + i,) * 2)

    stream = file_replay_stream(spark, replay, SCHEMA)
    out = sessionize_with_state(stream, gap_seconds=5, watermark="1 second")
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(idempotent_parquet_sink(sink))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.window_start, r.window_end): (r.total, round(r.sum_value, 6))
        for r in read_sink(spark, sink).collect()
        if r.user_id >= 0
    }

    # built-in operator on the same data (batch mode)
    flat = [r for chunk in rows for r in chunk if r[0] >= 0]
    batch = spark.createDataFrame(flat, SCHEMA)
    expected = {
        (r.user_id, r.window_start, r.window_end): (r.total, round(r.sum_value, 6))
        for r in session_window_agg(
            batch,
            "ts",
            "5 seconds",
            keys=["user_id"],
            aggs=[F.count(F.lit(1)).alias("total"), F.sum("value").alias("sum_value")],
        ).collect()
    }
    assert got == expected


def test_custom_sessionizer_checkpoint_restart(spark, tmpdirs):
    """The custom stateful operator must survive a stop/restart: an
    OPEN session checkpointed in run 1 is extended by run-2 data (not
    restarted), and already-emitted sessions are not re-emitted."""
    replay, sink, cp = tmpdirs
    s = lambda sec: BASE + dt.timedelta(seconds=sec)

    def write(chunk, rows, seq):
        p = os.path.join(replay, f"{chunk}.parquet")
        pd.DataFrame(
            {"user_id": [r[0] for r in rows], "ts": [r[1] for r in rows],
             "value": [r[2] for r in rows]}
        ).to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(p, (1_700_000_000 + seq,) * 2)

    def run():
        stream = file_replay_stream(spark, replay, SCHEMA)
        out = sessionize_with_state(stream, gap_seconds=5, watermark="10 seconds")
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(idempotent_parquet_sink(sink))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    # run 1: user 1 session closed by a later event's watermark; user 2
    # session still OPEN (nothing past its gap yet)
    write("c000", [(1, s(0), 1.0), (1, s(2), 1.0)], 0)
    write("c001", [(2, s(100), 5.0)], 1)
    run()
    # run 2 (same checkpoint): user 2's open session is EXTENDED
    # in-gap, then the sentinel's watermark flushes everything
    write("c002", [(2, s(103), 7.0)], 2)
    write("c003", [(-1, SENT, 0.0)], 3)
    run()

    got = {}
    for r in read_sink(spark, sink).collect():
        if r.user_id >= 0:
            key = (r.user_id, r.window_start)
            assert key not in got, f"duplicate emission for {key}"
            got[key] = (r.total, r.sum_value, r.window_end)
    assert got == {
        (1, s(0)): (2, 2.0, s(7)),
        (2, s(100)): (2, 12.0, s(108)),  # extended ACROSS the restart
    }


def test_cep_repeated_stage_types_strictly_later(spark, tmpdirs):
    """'A followed-by A': an event must never satisfy two adjacent
    stages of its own chain — two clicks are needed, in strict time
    order; the batch as-of rewrite refuses the pattern outright."""
    from flink_samples_spark.operators.behavior import detect_sequence
    from flink_samples_spark.streaming.stateful import cep_with_state

    replay, sink, cp = tmpdirs
    s = lambda sec: BASE + dt.timedelta(seconds=sec)
    rows = [(7, s(0), "click"), (7, s(5), "click"), (7, s(9), "view")]
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    path = os.path.join(replay, "c0.parquet")
    pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
        }
    ).to_parquet(path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    os.utime(path, (1_700_000_000, 1_700_000_000))

    stream = file_replay_stream(spark, replay, schema)
    out = cep_with_state(stream, ["click", "click"], within_seconds=60)
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(idempotent_parquet_sink(sink))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(
        (r.ts_0, r.ts_1)
        for r in read_sink(spark, sink).collect()
    )
    # exactly ONE chain: click@0 → click@5 (the 2nd click also opens
    # its own anchor, which never completes); never (t, t) self-pairs
    assert got == [(s(0), s(5))], got

    df = spark.createDataFrame(rows, schema)
    with pytest.raises(ValueError, match="adjacent stages"):
        detect_sequence(df, ["click", "click"], within_seconds=60)


def _write_event_chunk(replay, rows, idx=0):
    from tests._harness import write_replay_chunk

    cols = ["user_id", "ts", "event_type"]
    write_replay_chunk(
        replay,
        f"tie{idx:03d}",
        {c: [r[i] for r in rows] for i, c in enumerate(cols)},
        seq=idx,
    )


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def test_cep_tie_timestamp_types_sorting_against_stage_order(spark, tmpdirs):
    """ADVICE r4 (medium): equal-timestamp events must apply in
    pattern-STAGE order, not lexicographic type order. Pattern
    ['zebra', 'apple']: 'apple' sorts before 'zebra' but is stage 1,
    so zebra@T followed by apple@T (same T) is a match under the
    batch at-or-after semantics — the NFA must agree."""
    from flink_samples_spark.operators.behavior import detect_sequence
    from flink_samples_spark.streaming.stateful import cep_with_state

    replay, sink, cp = tmpdirs
    s = lambda sec: BASE + dt.timedelta(seconds=sec)
    rows = [
        (1, s(10), "zebra"),
        (1, s(10), "apple"),   # same ts, type sorts BEFORE the anchor type
        (2, s(20), "apple"),
        (2, s(20), "zebra"),   # anchor; earliest at-or-after apple is
        (2, s(25), "apple"),   # ... the SAME-ts one (stage order), not @25
    ]
    _write_event_chunk(replay, rows)

    stream = file_replay_stream(spark, replay, EVENT_SCHEMA)
    out = cep_with_state(stream, ["zebra", "apple"], within_seconds=60)
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(idempotent_parquet_sink(sink))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted((r.user_id, r.ts_0, r.ts_1) for r in read_sink(spark, sink).collect())
    want = [(1, s(10), s(10)), (2, s(20), s(20))]
    # batch twin agrees row-for-row (shared-oracle parity contract)
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    batch = sorted(
        (r.user_id, r.ts_0, r.ts_1)
        for r in detect_sequence(df, ["zebra", "apple"], within_seconds=60).collect()
    )
    assert batch == want, batch
    assert got == want, got


def test_absence_tie_timestamp_kill_types_sorting_against_stage_order(spark, tmpdirs):
    """ADVICE r4 (medium): an 'absent' event at the SAME timestamp as
    its anchor must kill it (at-or-after), even when the absent type
    sorts lexicographically before the first type."""
    from flink_samples_spark.streaming.stateful import absence_with_state

    replay, sink, cp = tmpdirs
    s = lambda sec: BASE + dt.timedelta(seconds=sec)
    rows = [
        (1, s(10), "zulu"),
        (1, s(10), "alpha"),   # same-ts killer, sorts before 'zulu'
        (2, s(20), "zulu"),    # never killed → must emit
        (9, s(900), "zulu"),   # sentinel pushes watermark past key 2's window
    ]
    _write_event_chunk(replay, rows)

    stream = file_replay_stream(spark, replay, EVENT_SCHEMA)
    out = absence_with_state(
        stream, first="zulu", absent="alpha", within_seconds=30, watermark="0 seconds"
    )
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(idempotent_parquet_sink(sink))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted((r.user_id, r.ts_0) for r in read_sink(spark, sink).collect())
    assert got == [(2, s(20))], got
