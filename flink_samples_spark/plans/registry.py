"""Declared-query registry.

Every operator from SURVEY.md §2 that is checkable gets ONE
registration carrying both the PySpark implementation and (when
SQL-expressible) its DuckDB oracle twin — keeping ``queries()`` and
``oracle_sql()`` in ``__spark_entry__.py`` in lockstep by
construction. Column names/aliases must match between the two; the
driver's compare hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the implementation of query id ``name``,
    with optional DuckDB oracle SQL (omit for rows-only checks)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
