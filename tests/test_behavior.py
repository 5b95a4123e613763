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
