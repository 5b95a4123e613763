"""Tier-C catalog: the SQL entry point (SURVEY.md §3.1).

The reference's flagship job is a SQL string against catalog-registered
tables (``tableEnv.sqlQuery(...)``, StreamingFlinkSQL.java:36-39).
These queries run through the same path in Spark — temp-view
registration + ``spark.sql`` — exercising Catalyst's parser/analyzer
features the DataFrame catalog doesn't: CTEs, correlated subqueries,
scalar subqueries, GROUPING SETS, and the session_window function in
SQL form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_samples_spark.plans.registry import query
from flink_samples_spark.sources.readers import load_table


def _view(spark: SparkSession, sf_dir: str, name: str, alias: str | None = None) -> str:
    alias = alias or name
    load_table(spark, sf_dir, name).createOrReplaceTempView(alias)
    return alias


# Flagship in its native form: SQL text → session windows (the Spark
# twin of the reference's SESSION TVF; same oracle as q_session_window).
@query(
    "q_sql_session_window",
    oracle="""
    WITH lagged AS (
      SELECT ts, lag(ts) OVER (ORDER BY ts) AS prev_ts FROM events
    ), sess AS (
      SELECT ts,
             SUM(CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 5 SECOND THEN 1 ELSE 0 END)
               OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagged
    )
    SELECT MIN(ts) AS window_start,
           MAX(ts) + INTERVAL 5 SECOND AS window_end,
           COUNT(*) AS total
    FROM sess GROUP BY sid
    """,
)
def q_sql_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "events", "sql_events")
    return spark.sql(
        """
        SELECT session_window.start AS window_start,
               session_window.end AS window_end,
               COUNT(*) AS total
        FROM sql_events
        GROUP BY session_window(ts, '5 seconds')
        """
    )


@query(
    "q_sql_cte",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(o_totalprice) AS total FROM orders GROUP BY o_custkey
    )
    SELECT c.c_name, ROUND(s.total, 2) AS total_spend
    FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey
    WHERE s.total > 500000
    """,
)
def q_sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders", "sql_orders")
    _view(spark, sf_dir, "customer", "sql_customer")
    return spark.sql(
        """
        WITH spend AS (
          SELECT o_custkey, SUM(o_totalprice) AS total FROM sql_orders GROUP BY o_custkey
        )
        SELECT c.c_name, ROUND(s.total, 2) AS total_spend
        FROM spend s JOIN sql_customer c ON c.c_custkey = s.o_custkey
        WHERE s.total > 500000
        """
    )


@query(
    "q_sql_correlated_exists",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
    """,
)
def q_sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "part", "sql_part")
    _view(spark, sf_dir, "lineitem", "sql_lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM sql_part p
        WHERE EXISTS (SELECT 1 FROM sql_lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
        """
    )


@query(
    "q_sql_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal,
           ROUND(c_acctbal - (SELECT AVG(c_acctbal) FROM customer), 4) AS bal_vs_avg
    FROM customer
    """,
)
def q_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer", "sql_customer2")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               ROUND(c_acctbal - (SELECT AVG(c_acctbal) FROM sql_customer2), 4) AS bal_vs_avg
        FROM sql_customer2
        """
    )


@query(
    "q_sql_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem", "sql_lineitem2")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
        FROM sql_lineitem2
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# Recursive CTE (Spark 4 WITH RECURSIVE): generate the month calendar
# spanning the order history and left-join order counts onto it —
# months with zero orders survive (the series is generated, not
# derived from the data).
@query(
    "q_sql_recursive",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT TIMESTAMP '1995-01-01 00:00:00'
      UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < TIMESTAMP '2001-07-01 00:00:00'
    )
    SELECT m AS month_start,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM months
    LEFT JOIN orders
      ON CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) = m
    GROUP BY m
    """,
)
def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders", "sql_orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM months
            WHERE m < TIMESTAMP '2001-07-01 00:00:00'
        )
        SELECT m AS month_start,
               COUNT(o_orderkey) AS n_orders
        FROM months
        LEFT JOIN sql_orders
          ON date_trunc('month', o_orderdate) = m
        GROUP BY m
        """
    )


@query(
    "q_sql_window",
    oracle="""
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 2
    """,
)
def q_sql_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window through the SQL parser (OVER + partition +
    multi-key ordering + rank filter) — the SQL twin of the
    DataFrame-API top-k-per-group."""
    _view(spark, sf_dir, "orders", "sql_orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, rnk FROM (
          SELECT o_custkey, o_orderkey,
                 rank() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM sql_orders
        ) WHERE rnk <= 2
        """
    )
