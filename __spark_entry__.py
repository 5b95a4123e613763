"""Driver contract for the spark-graft builder (PySpark target).

Wires the driver's three hooks to the engine's declared-query
registry (``flink_samples_spark.plans``): every operator from
SURVEY.md §2 registers its PySpark implementation and DuckDB oracle
twin in one place, so ``queries()`` and ``oracle_sql()`` stay in
lockstep by construction.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's own headline query — SQL session
    windows (5 s gap) with COUNT per window
    (StreamingFlinkSQL.java:36-39) — in its batch form on `events`.
    """
    from flink_samples_spark.plans import QUERIES

    return QUERIES["q_session_window"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # DRIVER_PRIORITY-first iteration order: the driver's CORRECTNESS
    # gate checks the first 50 entries, and the priority list allocates
    # those slots across every SURVEY §2 operator family.
    from flink_samples_spark.plans import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    from flink_samples_spark.plans import ordered_oracles

    return ordered_oracles()
