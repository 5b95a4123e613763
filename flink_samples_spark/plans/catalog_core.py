"""Tier-R catalog: queries present in the reference itself.

Each entry cites its reference site; the oracle SQL is the DuckDB
twin the driver cross-checks at sf0.01. Column aliases match the
Spark output exactly (driver hashes values after sorting columns by
name).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_samples_spark.operators.aggregates import global_agg, hash_agg
from flink_samples_spark.operators.time_windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from flink_samples_spark.plans.registry import query
from flink_samples_spark.plans.shared_oracles import SESSION_WINDOW_ORACLE
from flink_samples_spark.sources.readers import load_table, range_source, read_json_lines

_JSONL_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "data", "input.jsonl")
_JSONL_PATH = os.path.abspath(_JSONL_PATH)


# --- flagship: SQL session window, 5 s gap, COUNT per window --------------
# Reference: StreamingFlinkSQL.java:36-39 (SESSION TVF over event_time,
# GROUP BY window_start/window_end, COUNT AS total). Batch analog on the
# events table; the streaming twin is streaming/jobs.py::session_count_job.
# Spark merges events when the inter-event gap <= session gap (verified
# empirically: boundary-equal merges), so the oracle's new-session
# condition is strictly `> gap`. window_end = last ts + gap.
@query("q_session_window", oracle=SESSION_WINDOW_ORACLE)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return session_window_agg(events, "ts", "5 seconds")


# Keyed session windows with a gap wide enough to actually merge events
# (events average minutes apart): per-user 1 h sessions. Exercises the
# merge path the 5 s flagship rarely hits on this data.
@query(
    "q_session_window_keyed",
    oracle="""
    WITH lagged AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 1 HOUR THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagged
    )
    SELECT MIN(ts) AS window_start,
           MAX(ts) + INTERVAL 1 HOUR AS window_end,
           user_id,
           COUNT(*) AS total
    FROM sess GROUP BY user_id, sid
    """,
)
def q_session_window_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return session_window_agg(events, "ts", "1 hour", keys=["user_id"])


# --- tumbling event-time window + reduce ---------------------------------
# Reference: CassandraPojoSinkStreaming.java:66-68 — windowAll(Tumbling
# 10 s).reduce(sum of ids). Global (non-keyed) per-window aggregate;
# Spark's two-phase HashAggregate scales this where Flink's windowAll
# pins parallelism to 1. DuckDB time_bucket's 2000-01-01 origin is
# 10 s-aligned with Spark's 1970 epoch (946684800 % 10 == 0).
@query(
    "q_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '10 seconds', ts) AS window_start,
           time_bucket(INTERVAL '10 seconds', ts) + INTERVAL 10 SECOND AS window_end,
           CAST(SUM(event_id) AS BIGINT) AS sum_id,
           COUNT(*) AS total
    FROM events
    GROUP BY time_bucket(INTERVAL '10 seconds', ts)
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(
        events,
        "ts",
        "10 seconds",
        aggs=[F.sum("event_id").alias("sum_id"), F.count(F.lit(1)).alias("total")],
    )


# --- sliding window (window-family completion, SURVEY §2.9) ---------------
# 1 h windows every 30 min: each event lands in exactly 2 windows; the
# oracle expands per-event via a 2-element unnest then re-aggregates.
@query(
    "q_sliding_window",
    oracle="""
    SELECT ws AS window_start,
           ws + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS total,
           ROUND(SUM(value), 2) AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts) - to_minutes(30 * k) AS ws, value
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) offs
    )
    GROUP BY ws
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sliding_window_agg(
        events,
        "ts",
        "1 hour",
        "30 minutes",
        aggs=[
            F.count(F.lit(1)).alias("total"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )


# --- COUNT per group (batch analog of the flagship's keyed count) ---------
# Reference: StreamingFlinkSQL.java:37-39 (COUNT over window keys).
@query(
    "q_agg_count_group",
    oracle="SELECT event_type, COUNT(*) AS total FROM events GROUP BY event_type",
)
def q_agg_count_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return hash_agg(events, ["event_type"], [F.count(F.lit(1)).alias("total")])


# --- global reduce --------------------------------------------------------
# Reference: CassandraPojoSinkStreaming.java:68 — reduce((a,b) ->
# Pojo(a.id + b.id)); the batch-global analog sums ids with no keys.
@query(
    "q_agg_global_sum",
    oracle="SELECT CAST(SUM(event_id) AS BIGINT) AS sum_id, COUNT(*) AS total FROM events",
)
def q_agg_global_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return global_agg(
        events, [F.sum("event_id").alias("sum_id"), F.count(F.lit(1)).alias("total")]
    )


# --- bounded scans --------------------------------------------------------
# Reference: CassandraPojoSource.java:57-63 (`select * from test.pojo`,
# bounded, split by size). Generalized to the columnar parquet scan.
@query("q_scan_parquet", oracle="SELECT * FROM lineitem")
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


# Reference: CassandraPojoSource.java:57-63 — the same bounded scan
# THROUGH the token-ring partition plan (Murmur3 ring cut into
# size-derived splits, default input.split.size_in_mb = 15), driven by
# the in-repo Spark 4 Python Data Source (sources/cassandra_ring.py).
# The table estimate is the UNCOMPRESSED byte size from the parquet
# row-group metadata — the analog of Cassandra's system.size_estimates,
# which the connector's split arithmetic reads (uncompressed
# mean-partition bytes × partition count). Oracle: the ring splits are
# disjoint and exactly cover the token ring, so the union of the
# per-split reads IS the plain scan.
@query("q_scan_ring", oracle="SELECT * FROM customer")
def q_scan_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow.parquet as pq

    from flink_samples_spark.sources.readers import SourceSpec

    path = os.path.join(sf_dir, "customer.parquet")
    meta = pq.ParquetFile(path).metadata
    uncompressed = sum(
        meta.row_group(i).total_byte_size for i in range(meta.num_row_groups)
    )
    return SourceSpec(
        "cassandra_ring",
        path,
        partition_key="c_custkey",
        estimated_table_bytes=str(uncompressed),
        split_size_mb="15",
    ).load(spark)


# Reference: CassandraPojoSinkStreaming.java:70-79 — the WRITE side of
# the same token ring, driver-checkable (r12 verdict item 3; the read
# twin is q_scan_ring). Routes the customer table through the
# cassandra_ring sink — each task groups rows by owning Murmur3 token
# range, stages one batch file per (task, range), and the commit
# protocol publishes them atomically — then reads the published
# range files back. The ring ranges partition the token space and
# customer keys are unique, so the published union IS the table, and
# the sink's explicit arrow schema (derived from the declared Spark
# schema) preserves column types (int32 c_nationkey) end-to-end.
@query("q_ring_roundtrip", oracle="SELECT * FROM customer")
def q_ring_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flink_samples_spark.sources.cassandra_ring import register_cassandra_ring

    register_cassandra_ring(spark)
    out = tempfile.mkdtemp(prefix="fss_ring_roundtrip_")
    (
        load_table(spark, sf_dir, "customer")
        .write.format("cassandra_ring")
        .option("path", out)
        .option("partition_key", "c_custkey")
        .option("n_splits", "8")
        .mode("append")
        .save()
    )
    return spark.read.parquet(os.path.join(out, "range=*.parquet"))


# Reference: number-sequence source, DataStreamJob.java:45-49 (bounded
# batch twin; the unbounded rate-source twin is streaming/sources.py).
@query("q_source_range", oracle="SELECT range AS id FROM range(10000)")
def q_source_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return range_source(spark, 0, 10000)


# Reference: JSON-lines input (src/main/resources/input.json:1, shipped
# flink-json/files connectors pom.xml:89-100). Reads the repo-local
# mirror of the reference fixture; DuckDB reads the same file.
@query(
    "q_scan_json",
    oracle=f"SELECT my_field1, my_field2, my_field3 FROM read_json_auto('{_JSONL_PATH}')",
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_json_lines(spark, _JSONL_PATH)
