"""Property-based spot checks (SURVEY.md §5.4): window operators and
set ops vs brute-force pandas recomputation on generated data."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from flink_samples_spark.operators.time_windows import session_window_agg, tumbling_window_agg

BASE = dt.datetime(2024, 1, 1)

offsets = st.lists(
    st.integers(min_value=0, max_value=600), min_size=1, max_size=60, unique=True
)


def _sessions_brute(sorted_secs: list[int], gap: int) -> list[tuple[int, int, int]]:
    """(start, end, count) with end = last + gap; merge when diff <= gap."""
    out = []
    start = prev = sorted_secs[0]
    n = 1
    for s in sorted_secs[1:]:
        if s - prev <= gap:
            prev = s
            n += 1
        else:
            out.append((start, prev + gap, n))
            start = prev = s
            n = 1
    out.append((start, prev + gap, n))
    return out


@settings(max_examples=15, deadline=None)
@given(offsets=offsets, gap=st.integers(min_value=1, max_value=30))
def test_session_window_matches_brute_force(spark, offsets, gap):
    rows = [(BASE + dt.timedelta(seconds=s),) for s in offsets]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {
        (r.window_start, r.window_end): r.total
        for r in session_window_agg(df, "ts", f"{gap} seconds").collect()
    }
    expected = {
        (BASE + dt.timedelta(seconds=a), BASE + dt.timedelta(seconds=b)): n
        for a, b, n in _sessions_brute(sorted(offsets), gap)
    }
    assert got == expected


@settings(max_examples=15, deadline=None)
@given(offsets=offsets, size=st.sampled_from([5, 10, 60]))
def test_tumbling_window_matches_brute_force(spark, offsets, size):
    rows = [(BASE + dt.timedelta(seconds=s),) for s in offsets]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {
        (r.window_start, r.window_end): r.total
        for r in tumbling_window_agg(df, "ts", f"{size} seconds").collect()
    }
    expected: dict = {}
    for s in offsets:
        b = (s // size) * size
        key = (BASE + dt.timedelta(seconds=b), BASE + dt.timedelta(seconds=b + size))
        expected[key] = expected.get(key, 0) + 1
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    a=st.lists(st.integers(0, 20), max_size=40),
    b=st.lists(st.integers(0, 20), max_size=40),
)
def test_set_ops_match_python_sets(spark, a, b):
    da = spark.createDataFrame([(x,) for x in a] or [(None,)], "v int").filter("v IS NOT NULL")
    db = spark.createDataFrame([(x,) for x in b] or [(None,)], "v int").filter("v IS NOT NULL")
    assert {r.v for r in da.intersect(db).collect()} == (set(a) & set(b))
    assert {r.v for r in da.subtract(db).collect()} == (set(a) - set(b))
    assert {r.v for r in da.unionByName(db).distinct().collect()} == (set(a) | set(b))


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """Sketch accuracy: the query's own within-1%-relative booleans
    (approx p50/p95 vs exact interpolated percentile, computed in the
    same aggregate) hold for every group."""
    from flink_samples_spark.plans import QUERIES

    rows = QUERIES["q_agg_approx_quantile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50_ok and r.p95_ok, (r.l_returnflag, r.p50_ok, r.p95_ok)


def test_hll_sketch_union_estimate_accuracy(spark, sf_dir):
    """Union of per-group HLL sketches estimates the GLOBAL distinct
    count within the query's own 5%-relative bound (lgK=14 → ~0.8%
    rse), asserted by its within_tol output."""
    from flink_samples_spark.plans import QUERIES

    rows = QUERIES["q_agg_hll_sketch"](spark, sf_dir).collect()
    assert len(rows) == 1 and rows[0].within_tol is True, rows
