"""Vanilla-session safety for catalog wrappers (round-5 verdict item 1).

The driver runs the catalog under a config-free SparkSession (no
Arrow). The round-5 red row (q_stream_join_outer) came from a
``toPandas() -> createDataFrame()`` sink read-back: pandas coerces a
NULL-able bigint (outer join's unmatched side) to float64 and the
non-Arrow ``createDataFrame`` verifier rejects it. These tests pin the
fix (``streaming/sinks.py::sink_to_batch``) under the driver's exact
conditions, which requires a SEPARATE python process — the pytest
session's JVM already carries the tuned Arrow-on config.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_VANILLA_PROBE = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("vanilla-gate").getOrCreate()
assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "false", (
    "probe must run without Arrow to reproduce the driver's session"
)
from flink_samples_spark.plans import QUERIES

df = QUERIES["q_stream_join_outer"](spark, {sf_dir!r})
rows = df.collect()
nulls = sum(1 for r in rows if r["purchase_id"] is None)
assert len(rows) > 0, "no rows"
assert nulls > 0, "LEFT OUTER join must produce unmatched NULL purchase_ids"
assert dict(df.dtypes)["purchase_id"] == "bigint", dict(df.dtypes)
print("VANILLA_PROBE_OK", len(rows), nulls)
spark.stop()
"""


def test_stream_join_outer_under_vanilla_session():
    """The exact round-5 driver failure: NULL-able bigint sink
    read-back under a config-free (non-Arrow) SparkSession."""
    proc = subprocess.run(
        [sys.executable, "-c", _VANILLA_PROBE.format(repo=_REPO, sf_dir=SF_DIR)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=_REPO,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "VANILLA_PROBE_OK" in proc.stdout


def test_sink_to_batch_preserves_nullable_bigint(spark, tmp_path):
    """sink_to_batch never round-trips through pandas: a NULL-able
    LongType column survives with its type and its NULLs, and the
    result outlives deletion of the source directory."""
    import shutil

    from flink_samples_spark.streaming.sinks import read_sink, sink_to_batch

    left = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, a long")
    right = spark.createDataFrame([(1, 100)], "k long, b long")
    joined = left.join(right, "k", "left_outer")
    sink = str(tmp_path / "sink")
    joined.write.parquet(os.path.join(sink, "batch=0"))

    out = sink_to_batch(read_sink(spark, sink), "k bigint, a bigint, b bigint")
    shutil.rmtree(sink)  # must already be materialized

    rows = {r["k"]: r for r in out.collect()}
    assert dict(out.dtypes) == {"k": "bigint", "a": "bigint", "b": "bigint"}
    assert rows[1]["b"] == 100
    assert rows[2]["b"] is None and rows[3]["b"] is None
    assert "batch" not in out.columns


def test_sink_to_batch_accepts_structtype_schema(spark, tmp_path):
    from flink_samples_spark.streaming.sinks import read_sink, sink_to_batch

    df = spark.range(5).withColumnRenamed("id", "x")
    df.write.parquet(os.path.join(str(tmp_path / "s"), "batch=0"))
    out = sink_to_batch(
        read_sink(spark, str(tmp_path / "s")), df.schema
    )
    assert sorted(r["x"] for r in out.collect()) == [0, 1, 2, 3, 4]


def test_sink_to_batch_keeps_declared_batch_column(spark, tmp_path):
    """A logical result legitimately named `batch` must survive
    sink_to_batch: the sink's partition column is dropped ONLY when
    the declared schema doesn't claim the name (ADVICE r6)."""
    from flink_samples_spark.streaming.sinks import sink_to_batch

    df = spark.createDataFrame([(1, 7), (2, 9)], "k long, batch long")
    out = sink_to_batch(df, "k bigint, batch bigint")
    assert dict(out.dtypes) == {"k": "bigint", "batch": "bigint"}
    assert {r["k"]: r["batch"] for r in out.collect()} == {1: 7, 2: 9}
