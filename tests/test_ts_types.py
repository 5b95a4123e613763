"""TIMESTAMP_NTZ / TIMESTAMP_LTZ matrix for every timestamp-consuming
operator (round-2 verdict item 7).

The driver testdata's ``events.ts`` is parquet ``timestamp[us]`` with
no timezone, which Spark 4 reads as TIMESTAMP_NTZ — and NTZ refuses a
direct ``cast(... AS DOUBLE)``. That type drift broke three operators
in round 2 without a single test going red, because every local test
built LTZ columns via pandas. This file runs each operator against
BOTH flavors and asserts identical results, so the next timestamp type
drift fails loudly in one obvious place.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from flink_samples_spark.operators.joins import as_of_join, banded_range_join
from flink_samples_spark.operators.time_windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from flink_samples_spark.operators.timeseries import resample_interpolate
from flink_samples_spark.utils import epoch_double

FLAVORS = {"ltz": TimestampType(), "ntz": TimestampNTZType()}

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, ts_type, rows):
    """rows: [(key, seconds_offset, value)] with ``ts`` of the given flavor."""
    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("ts", ts_type),
            StructField("v", DoubleType()),
        ]
    )
    data = [(k, BASE + dt.timedelta(seconds=s), float(v)) for k, s, v in rows]
    return spark.createDataFrame(data, schema)


def _rows(df, order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


@pytest.fixture(scope="module", params=sorted(FLAVORS))
def flavor(request):
    return request.param


def test_epoch_double_matrix(spark, flavor):
    df = _events(spark, FLAVORS[flavor], [("a", 0, 1), ("a", 90, 2)])
    got = [r[0] for r in df.select(epoch_double(df, "ts")).orderBy("ts").collect()]
    base = BASE.replace(tzinfo=dt.timezone.utc).timestamp()
    assert got == [base, base + 90.0]


def test_epoch_double_numeric_passthrough(spark):
    df = spark.createDataFrame([(1.5,), (2.0,)], "x double")
    got = sorted(r[0] for r in df.select(epoch_double(df, "x")).collect())
    assert got == [1.5, 2.0]


def test_banded_range_join_matrix(spark, flavor):
    t = FLAVORS[flavor]
    left = _events(spark, t, [("l1", 0, 1), ("l2", 100, 2), ("l3", 205, 3)])
    right = _events(spark, t, [("r1", 30, 1), ("r2", 160, 2), ("r3", 500, 3)]).select(
        F.col("k").alias("rk"), F.col("ts").alias("rts"), F.col("v").alias("rv")
    )
    out = banded_range_join(left, right, "ts", "rts", 60.0)
    pairs = sorted((r["k"], r["rk"]) for r in out.collect())
    # |0-30|<=60, |100-160|<=60, |205-160|<=60 — and nothing matches r3
    assert pairs == [("l1", "r1"), ("l2", "r2"), ("l3", "r2")]


def test_as_of_join_tolerance_matrix(spark, flavor):
    t = FLAVORS[flavor]
    left = _events(spark, t, [("a", 100, 0), ("a", 400, 0)])
    right = _events(spark, t, [("a", 90, 7.0), ("a", 110, 9.0)]).select(
        "k", "ts", F.col("v").alias("quote")
    )
    out = as_of_join(
        left,
        right,
        key="k",
        left_ts="ts",
        right_ts="ts",
        payload=["quote"],
        tolerance_seconds=60.0,
    )
    got = _rows(out.select("k", "quote"), ["ts"])
    # ts=100 matches the ts=90 quote (10 s back, within 60); ts=400's
    # nearest-backward match is 290 s away — nulled by the tolerance.
    assert got == [("a", 7.0), ("a", None)]


def test_resample_interpolate_matrix(spark, flavor):
    t = FLAVORS[flavor]
    df = _events(spark, t, [("a", 0, 10), ("a", 120, 30)])
    out = resample_interpolate(df, "k", "ts", "v", 60, agg="max")
    got = [(r["value"], r["filled"]) for r in out.orderBy("bucket").collect()]
    assert got == [(10.0, False), (20.0, True), (30.0, False)]


@pytest.mark.parametrize(
    "agg_fn, kwargs",
    [
        (session_window_agg, {"gap": "60 seconds"}),
        (tumbling_window_agg, {"size": "60 seconds"}),
        (sliding_window_agg, {"size": "120 seconds", "slide": "60 seconds"}),
    ],
    ids=["session", "tumbling", "sliding"],
)
def test_time_windows_flavor_equivalence(spark, agg_fn, kwargs):
    """The groupBy-window operators must produce identical window
    bounds/counts for NTZ and LTZ inputs (UTC session)."""
    rows = [("a", s, 1) for s in (0, 30, 200, 230, 400)]
    results = {}
    for name, t in FLAVORS.items():
        df = _events(spark, t, rows)
        out = agg_fn(df, ts_col="ts", keys=["k"], aggs=[F.count("*").alias("n")], **kwargs)
        # normalize window bounds to epoch so NTZ/LTZ rows compare equal
        cols = [
            epoch_double(out, c) if dict(out.dtypes)[c].startswith("timestamp") else F.col(c)
            for c in out.columns
        ]
        results[name] = sorted(tuple(r) for r in out.select(cols).collect())
    assert results["ltz"] == results["ntz"]
    # every event is counted (sliding windows count each event size/slide times)
    assert sum(r[-1] for r in results["ltz"]) >= len(rows)


def test_resample_rejects_nonpositive_interval(spark):
    import pytest

    from flink_samples_spark.operators.timeseries import resample_interpolate

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "user_id bigint, ts string, value double"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).col("ts").cast("timestamp"))
    for bad in (0, -60):
        with pytest.raises(ValueError, match="must be positive"):
            resample_interpolate(df, "user_id", "ts", "value", bad)


def test_ewma_rejects_ewma_column_collision(spark):
    import pytest

    from flink_samples_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0, 2.0)],
        "user_id bigint, ts string, value double, ewma double",
    )
    with pytest.raises(ValueError, match="already has an 'ewma' column"):
        ewma(df, "user_id", "ts", "value", 0.5)
