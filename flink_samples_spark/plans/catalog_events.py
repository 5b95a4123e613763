"""Tier-C catalog: behavioral / event-sequence analytics over the
``events`` table (funnel conversion, cohort retention, SCD2 history).

The reference's event stream is its timestamped Pojo source
(`CassandraPojoSinkStreaming.java:109-148`); these are the standard
analytics an engine over that stream answers. All three are
oracle-checked; timestamps in this dataset are µs-aligned (verified
across all SFs), so cross-row timestamp comparisons agree between
Spark's µs domain and DuckDB's ns domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_samples_spark.operators.behavior import (
    cohort_retention,
    funnel_stages,
    scd2_intervals,
)
from flink_samples_spark.plans.registry import query
from flink_samples_spark.sources.readers import load_table


@query(
    "q_funnel",
    oracle="""
    WITH s0 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s1 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s0 ON s0.user_id = e.user_id AND e.ts > s0.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 0 AS stage, 'view' AS event_type,
           CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_users
    UNION ALL
    SELECT 1, 'click', CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
    UNION ALL
    SELECT 2, 'purchase', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: stage k counts users whose
    first step-k event is strictly after their stage-(k-1) time."""
    events = load_table(spark, sf_dir, "events")
    return funnel_stages(events, ["view", "click", "purchase"])


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(floor(epoch(MIN(ts)) / 604800) AS BIGINT) AS cohort_week,
             MIN(ts) AS first_ts
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(floor(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_week
             AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN firsts f ON f.user_id = e.user_id
    GROUP BY f.cohort_week, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix on epoch-week buckets (engine-agnostic
    bucketing — no calendar week-start semantics)."""
    events = load_table(spark, sf_dir, "events")
    return cohort_retention(events)


@query(
    "q_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_state
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_state IS NULL OR event_type <> prev_state
    )
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           lead(ts) OVER w2 IS NULL AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history from the event stream: one interval row
    per state change, open-ended current rows flagged."""
    events = load_table(spark, sf_dir, "events")
    return scd2_intervals(events)


# Temporal table join (Flink `FOR SYSTEM_TIME AS OF`, the planner
# capability the reference ships via flink-table-planner-loader): each
# fact row joined to the dimension VERSION valid at its event time.
# The dimension is the SCD2 state history built from the same stream;
# the join itself is the as-of union trick — one shuffle on the key,
# no interval range join, no nested loop (see operators.joins).
@query(
    "q_join_temporal",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_state
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_state IS NULL OR event_type <> prev_state
    ), iv AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER w2 AS valid_to
      FROM changes
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e.event_id, e.ts, e.user_id, iv.valid_from AS asof_ts, iv.state
    FROM events e
    JOIN iv ON e.user_id = iv.user_id
           AND e.ts >= iv.valid_from
           AND (iv.valid_to IS NULL OR e.ts < iv.valid_to)
    """,
)
def q_join_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_samples_spark.operators import as_of_join
    from flink_samples_spark.operators.behavior import scd2_intervals

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    dim = scd2_intervals(ev).select("user_id", "valid_from", "state")
    facts = ev.select("event_id", "ts", "user_id")
    return as_of_join(
        facts, dim, key="user_id", left_ts="ts", right_ts="valid_from",
        payload=["state"],
    )
