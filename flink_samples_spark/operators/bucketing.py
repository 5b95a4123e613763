"""Bucketed (co-located) joins — the shuffle-free big×big path.

At 100 TB the dominant cost of ``fact ⋈ fact`` is shuffling both
sides. Bucketing pre-shuffles AT WRITE TIME: both tables are written
``bucketBy(n, key)``, so every join on that key reads co-located
buckets and the SortMergeJoin plans with NO Exchange on either side —
the shuffle is paid once when data lands, amortized over every
subsequent join/aggregation on the key.

Spark specifics: bucketed tables must be saved through the session
catalog (``saveAsTable``); bucket counts on both sides should match
(or divide evenly, with ``spark.sql.bucketing.coalesceBucketsInJoin``);
``spark.sql.sources.bucketing.enabled`` is on by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally bucket-sorted) catalog
    table; sorting within buckets additionally removes the join-time
    Sort."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed previous write can leave the managed location behind
    # with no catalog entry; saveAsTable then refuses
    loc = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(f"{loc.path}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    plans as a SortMergeJoin with no shuffle Exchange on either side
    (asserted in tests). The MERGE hint pins the strategy: at test
    scale Catalyst would broadcast the smaller side (also fine, also
    shuffle-free), but the scenario bucketing exists for is fact×fact,
    where broadcast is impossible and SMJ-over-buckets is the target
    plan."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, on, how)
