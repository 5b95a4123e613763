"""as_of_join semantics: direction, ties, tolerance, outer nulls, and
the single-shuffle plan property that makes it viable at scale."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from flink_samples_spark.operators import as_of_join
from tests.test_plans import plan_of

BASE = dt.datetime(2024, 1, 1)


def _ts(sec):
    return BASE + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 2],
                "ts": [_ts(5), _ts(10), _ts(20), _ts(7), _ts(100)],
                "lv": [10.0, 20.0, 30.0, 40.0, 50.0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2],
                "ts": [_ts(4), _ts(10), _ts(15), _ts(50)],
                "rv": [1.0, 2.0, 3.0, 4.0],
            }
        )
    )
    return left, right


def _collect(df):
    return {
        (r.k, r.ts): (r.asof_ts, r.rv)
        for r in df.orderBy("k", "ts").collect()
    }


def test_backward_with_exact_tie(frames):
    left, right = frames
    got = _collect(as_of_join(left, right, "k"))
    assert got == {
        (1, _ts(5)): (_ts(4), 1.0),
        (1, _ts(10)): (_ts(10), 2.0),   # equal ts matches (>= semantics)
        (1, _ts(20)): (_ts(15), 3.0),
        (2, _ts(7)): (None, None),      # no prior right row → outer null
        (2, _ts(100)): (_ts(50), 4.0),
    }


def test_forward(frames):
    left, right = frames
    got = _collect(as_of_join(left, right, "k", direction="forward"))
    assert got == {
        (1, _ts(5)): (_ts(10), 2.0),
        (1, _ts(10)): (_ts(10), 2.0),   # equal ts matches forward too
        (1, _ts(20)): (None, None),
        (2, _ts(7)): (_ts(50), 4.0),
        (2, _ts(100)): (None, None),
    }


def test_tolerance(frames):
    left, right = frames
    got = _collect(as_of_join(left, right, "k", tolerance_seconds=5))
    # (1,20)→match at 15 is exactly 5s: kept; (2,100)→match at 50 is 50s: nulled
    assert got[(1, _ts(20))] == (_ts(15), 3.0)
    assert got[(2, _ts(100))] == (None, None)


def test_matches_pandas_merge_asof(spark, sf_dir):
    from flink_samples_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(ev.event_type == "click").select(
        "event_id", "user_id", ev.ts.alias("click_ts")
    )
    purch = (
        ev.filter(ev.event_type == "purchase")
        .groupBy("user_id", "ts")
        .agg({"value": "max"})
        .withColumnRenamed("max(value)", "p_value")
    )
    got = (
        as_of_join(clicks, purch, "user_id", left_ts="click_ts", right_ts="ts")
        .toPandas()
        .sort_values(["event_id"], ignore_index=True)
    )
    want = pd.merge_asof(
        clicks.toPandas().sort_values("click_ts"),
        purch.toPandas().sort_values("ts").rename(columns={"ts": "asof_ts"}),
        left_on="click_ts",
        right_on="asof_ts",
        by="user_id",
        direction="backward",
    ).sort_values(["event_id"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "asof_ts", "p_value"]],
        want[["event_id", "user_id", "asof_ts", "p_value"]],
    )


def test_single_shuffle_plan(frames):
    left, right = frames
    p = plan_of(as_of_join(left, right, "k"), mode="simple")
    # one Exchange per input branch feeding the union is allowed, but no
    # extra shuffle after the window; crucially no nested-loop join
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert p.count("Window") == 1


def test_payload_collision_raises(frames):
    left, right = frames
    with pytest.raises(ValueError):
        as_of_join(left, right.withColumnRenamed("rv", "lv"), "k")


def test_banded_range_join_boundaries(spark):
    """Pairs at EXACTLY the band width are kept (<=), pairs one µs
    past are dropped, and matches across a bucket edge are found."""
    import datetime as dt

    import pandas as pd

    from flink_samples_spark.operators import banded_range_join

    base = dt.datetime(2024, 1, 1)
    s = lambda sec: base + dt.timedelta(seconds=sec)
    left = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 3], "ts_a": [s(10.0), s(20.0), s(99.5)]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "id_b": [10, 11, 12, 13],
                # 10: exactly +1.0 from l1 (kept); 11: +1.000001 from l1
                # (dropped); 12: crosses the floor(t/1.0) bucket edge
                # from l3 (99.5 → 100.2, different buckets, kept);
                # 13: far away (dropped)
                "ts_b": [s(11.0), s(11.000001), s(100.2), s(50.0)],
            }
        )
    )
    got = {
        (r.id_a, r.id_b)
        for r in banded_range_join(left, right, "ts_a", "ts_b", 1.0).collect()
    }
    assert got == {(1, 10), (3, 12)}


def test_asof_null_payload_in_matched_row_stays_null(spark):
    """Code-review r5: the matched row travels as one struct — a NULL
    payload VALUE in the matched right row must come through as NULL,
    not be backfilled from an older right row (chimera rows)."""
    from flink_samples_spark.operators.joins import as_of_join

    left = spark.createDataFrame([(1, 3.0)], "k int, ts double")
    right = spark.createDataFrame(
        [(1, 1.0, 5.0), (1, 2.0, None)], "k int, ts double, pay double"
    )
    out = as_of_join(left, right, key="k", payload=["pay"]).collect()
    assert len(out) == 1
    assert out[0].asof_ts == 2.0
    assert out[0].pay is None, out[0]


def test_asof_forward_null_left_ts_gets_null_match(spark):
    """Code-review r5: a left row with NULL ts must match nothing in
    BOTH directions (desc's default NULLS LAST previously handed the
    forward direction the whole partition as its prefix)."""
    from flink_samples_spark.operators.joins import as_of_join

    left = spark.createDataFrame([(1, None), (1, 5.0)], "k int, ts double")
    right = spark.createDataFrame([(1, 10.0, 7.0)], "k int, ts double, pay double")
    for direction in ("backward", "forward"):
        rows = {
            (r.ts, r.asof_ts, r.pay)
            for r in as_of_join(
                left, right, key="k", payload=["pay"], direction=direction
            ).collect()
        }
        want_null_row = (None, None, None)
        assert want_null_row in rows, (direction, rows)


def test_banded_range_join_same_point_column_name(spark):
    """Code-review r5: both inputs sharing the point column name must
    not raise AMBIGUOUS_REFERENCE in the residual filter."""
    from flink_samples_spark.operators.joins import banded_range_join

    a = spark.createDataFrame([(1, 10.0)], "ida int, ts double")
    b = spark.createDataFrame([(2, 12.0), (3, 99.0)], "idb int, ts double")
    got = banded_range_join(a, b, "ts", "ts", 5.0).collect()
    assert len(got) == 1 and got[0].idb == 2, got


def test_merge_upsert_rejects_null_op(spark):
    """Code-review r5: a NULL/typo op must raise, not act as a silent
    DELETE via three-valued logic."""
    import pytest

    from flink_samples_spark.operators.joins import merge_upsert

    target = spark.createDataFrame([(42, "x")], "k int, v string")
    changes = spark.createDataFrame([(42, "y", None)], "k int, v string, op string")
    with pytest.raises(Exception, match="invalid op"):
        merge_upsert(target, changes, "k").collect()


def test_as_of_join_null_keys_never_match(spark):
    """Code-review r6: equi-join semantics — a NULL key matches
    nothing, even another NULL key (Window.partitionBy would
    otherwise group the NULLs together and hand the left row a
    payload)."""
    from datetime import datetime

    from flink_samples_spark.operators.joins import as_of_join

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(None, t(10)), (1, t(10))], "k bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(None, t(5), "R_null"), (1, t(5), "R1")],
        "k bigint, rts timestamp, rv string",
    )
    got = {r.k: r.rv for r in as_of_join(left, right, "k", "ts", "rts").collect()}
    assert got[1] == "R1"
    assert got[None] is None, "NULL-key left row must get NULL payload"


def test_banded_range_join_rejects_nonpositive_delta(spark):
    import pytest

    from flink_samples_spark.operators.joins import banded_range_join

    df = spark.createDataFrame([(1.0,)], "t double")
    for bad in (0.0, -1.0):
        with pytest.raises(ValueError, match="must be positive"):
            banded_range_join(df, df.withColumnRenamed("t", "u"), "t", "u", bad)


def test_dynamic_session_rejects_internal_column_collision(spark):
    import pytest
    from pyspark.sql import functions as F

    from flink_samples_spark.operators.time_windows import session_window_dynamic_gap

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5.0)], "user_id bigint, ts string, __end double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="internal columns"):
        session_window_dynamic_gap(df, "ts", F.lit(5.0), keys=("user_id",))
