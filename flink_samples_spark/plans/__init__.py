from flink_samples_spark.plans.registry import (
    DRIVER_PRIORITY,
    ORACLES,
    QUERIES,
    ordered_oracles,
    ordered_queries,
    query,
)

# Importing the catalog modules populates the registry.
from flink_samples_spark.plans import catalog_core  # noqa: F401
from flink_samples_spark.plans import catalog_relational  # noqa: F401
from flink_samples_spark.plans import catalog_tpch  # noqa: F401
from flink_samples_spark.plans import catalog_events  # noqa: F401
from flink_samples_spark.plans import catalog_functions  # noqa: F401
from flink_samples_spark.plans import catalog_llmops  # noqa: F401
from flink_samples_spark.plans import catalog_sql  # noqa: F401
from flink_samples_spark.plans import catalog_streaming  # noqa: F401

__all__ = [
    "DRIVER_PRIORITY",
    "ORACLES",
    "QUERIES",
    "ordered_oracles",
    "ordered_queries",
    "query",
]
