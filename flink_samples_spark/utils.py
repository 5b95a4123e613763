"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_narrow(df: DataFrame) -> DataFrame:
    """Ensure a narrow (per-row) stage has at least one partition per
    core. A single-file input collapses to 1 partition and would run a
    pandas stage on one core; at real scale the scan is already
    maxPartitionBytes-parallel and this is a no-op (the
    getNumPartitions probe is driver-side planning only, no job)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
