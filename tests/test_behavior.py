"""Semantic tests for behavioral analytics operators (ordering
constraints that the aggregate oracle alone wouldn't pin down)."""

from __future__ import annotations

import datetime as dt

from flink_samples_spark.operators.behavior import (
    funnel_stages,
    scd2_intervals,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, 0, s), u, t, 0.0)
            for i, (u, t, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_funnel_requires_order(spark):
    # user 1: view→click→purchase (full funnel)
    # user 2: click BEFORE view, purchase after — reaches stage 0 only
    #         (no click after the first view)
    # user 3: view then purchase, never clicks — stage 0 only
    events = _ev(
        spark,
        [
            (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
            (2, "click", 0), (2, "view", 10), (2, "purchase", 20),
            (3, "view", 0), (3, "purchase", 5),
        ],
    )
    out = {r.stage: r.n_users for r in
           funnel_stages(events, ["view", "click", "purchase"]).collect()}
    assert out == {0: 3, 1: 1, 2: 1}


def test_funnel_same_timestamp_not_counted(spark):
    # strict ">": a click at exactly the view time does not advance
    events = _ev(spark, [(1, "view", 0), (1, "click", 0)])
    out = {r.stage: r.n_users for r in
           funnel_stages(events, ["view", "click"]).collect()}
    assert out == {0: 1, 1: 0}


def test_scd2_collapses_runs_and_flags_current(spark):
    events = _ev(
        spark,
        [
            (1, "view", 0), (1, "view", 1), (1, "click", 2),
            (1, "click", 3), (1, "view", 4),
        ],
    )
    rows = sorted(scd2_intervals(events).collect(), key=lambda r: r.valid_from)
    assert [r.state for r in rows] == ["view", "click", "view"]
    assert [r.is_current for r in rows] == [False, False, True]
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[-1].valid_to is None


def test_snapshot_diff_null_keys_pair_null_safe(spark):
    """ADVICE r4: a NULL key must pair across versions (null-safe
    join), not surface as a spurious added+removed split."""
    from flink_samples_spark.operators.behavior import snapshot_diff

    old = spark.createDataFrame(
        [(None, "same"), (1, "x"), (2, "gone")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(None, "same"), (1, "y"), (3, "fresh")], "k int, v string"
    )
    got = {r.k: r.status for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    # NULL key unchanged -> dropped entirely; 1 changed; 2 removed; 3 added
    assert got == {1: "changed", 2: "removed", 3: "added"}, got

    old2 = spark.createDataFrame([(None, "a")], "k int, v string")
    new2 = spark.createDataFrame([(None, "b")], "k int, v string")
    got2 = [(r.k, r.status) for r in snapshot_diff(old2, new2, "k", ["v"]).collect()]
    assert got2 == [(None, "changed")], got2


def test_data_quality_report_is_one_scan(spark, sf_dir):
    """ADVICE r4: every check — nulls, ranges, AND uniqueness — folds
    into one aggregate over one scan; no per-key re-read of the
    input."""
    from flink_samples_spark.operators.behavior import data_quality_report
    from flink_samples_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    rep = data_quality_report(
        docs,
        not_null=["text", "lang"],
        unique=["doc_id", "source"],
        ranges=[("n_chars", 0, 10_000_000)],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # exactly one scan of the parquet source in the whole plan (the
    # mixed distinct/non-distinct agg plans as Expand over that scan)
    assert plan.count("FileScan parquet") == 1, plan
    assert "Expand" in plan, plan
    rows = {r.check: r.violations for r in rep.collect()}
    assert set(rows) == {
        "null:text", "null:lang", "unique:doc_id", "unique:source", "range:n_chars"
    }
    assert rows["unique:doc_id"] == 0


def test_scd2_null_states_are_real_states(spark):
    """Code-review r6: a NULL state must open its own interval at its
    own timestamp, consecutive NULL states must merge, and a state
    repeated around a NULL gap must NOT merge across it."""
    from datetime import datetime

    from flink_samples_spark.operators.behavior import scd2_intervals

    ts = lambda s: datetime(2024, 1, 1, 0, 0, s)
    ev = spark.createDataFrame(
        [(1, "A", ts(0), 0), (1, None, ts(1), 1), (1, None, ts(2), 2), (1, "A", ts(3), 3)],
        "user_id bigint, event_type string, ts timestamp, event_id bigint",
    )
    got = sorted(
        ((r.state, r.valid_from.second, None if r.valid_to is None else r.valid_to.second)
         for r in scd2_intervals(ev).collect()),
        key=lambda t: t[1],
    )
    assert got == [("A", 0, 1), (None, 1, 3), ("A", 3, None)], got


def test_snapshot_diff_null_column_swap_is_changed(spark):
    """Code-review r6: Spark hash functions skip NULL args, so a value
    moving between compare columns while the other goes NULL hashed
    identically — the diff must classify it as changed."""
    from flink_samples_spark.operators.behavior import snapshot_diff

    old = spark.createDataFrame([(1, None, "x")], "k bigint, a string, b string")
    new = spark.createDataFrame([(1, "x", None)], "k bigint, a string, b string")
    got = [(r.k, r.status) for r in snapshot_diff(old, new, "k", ["a", "b"]).collect()]
    assert got == [(1, "changed")], got


def test_data_quality_report_zero_not_null_on_empty_input(spark):
    """Code-review r6: an empty table (the upstream-outage case a DQ
    gate exists for) must report 0 violations, not NULL — a
    `violations > 0` alert filter silently skips NULL."""
    from flink_samples_spark.operators.behavior import data_quality_report

    empty = spark.createDataFrame([], "x bigint, y double")
    rep = {
        r.check: r.violations
        for r in data_quality_report(
            empty, not_null=["x"], unique=["x"], ranges=[("y", 0.0, 1.0)]
        ).collect()
    }
    assert rep == {"null:x": 0, "unique:x": 0, "range:y": 0}, rep
    # all-NULL column: range violations are 0 (nulls belong to the
    # null check), null violations count the rows
    allnull = spark.createDataFrame([(None,), (None,)], "y double")
    rep2 = {
        r.check: r.violations
        for r in data_quality_report(
            allnull, not_null=["y"], ranges=[("y", 0.0, 1.0)]
        ).collect()
    }
    assert rep2 == {"null:y": 2, "range:y": 0}, rep2
