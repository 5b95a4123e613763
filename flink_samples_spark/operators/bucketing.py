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

import os

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
    # with no catalog entry; saveAsTable then refuses. Managed-table
    # layout: <warehouse>/<table> for default-db names and
    # <warehouse>/<db>.db/<table> for qualified ones; the warehouse
    # URI may be relative (resolve against cwd) or percent-encoded.
    from urllib.parse import unquote

    raw = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = unquote(urlparse(raw).path) or raw
    wh = os.path.abspath(wh)
    parts = table.lower().split(".")
    if len(parts) > 2:
        # a 3-part (catalog.db.table) name would make the fallback
        # branch rmtree <warehouse>/<catalog> — the wrong directory
        raise ValueError(
            f"write_bucketed: qualified name {table!r} has {len(parts)} parts; "
            "pass db.table or a bare table name (session catalog only)"
        )
    rel = (
        os.path.join(f"{parts[0]}.db", parts[1]) if len(parts) == 2 else parts[0]
    )
    shutil.rmtree(os.path.join(wh, rel), ignore_errors=True)
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


def zorder_key(a, b, bits: int = 16):
    """Z-order (Morton) locality key: interleave the low ``bits`` bits
    of two integer columns — rows close in BOTH dimensions get close
    keys, so sorting/range-partitioning by the key clusters them into
    the same parquet row groups and files.

    THE data-layout lever for multi-dimension selective scans at
    100 TB (the Delta/Iceberg OPTIMIZE ZORDER primitive): min/max
    row-group stats on z-sorted files prune on BOTH columns, where a
    lexicographic sort prunes only the leading one. Pure codegen'd
    bit arithmetic (shiftleft/and/or via bit ops on BIGINT) — exact,
    engine-independent, zero cost at write time.

    Columns must be non-negative; values above 2^bits-1 cluster by
    their low bits (callers bucketize first for skewed ranges).
    ``bits`` must be 1..32: the interleaved key uses 2·bits of a
    64-bit long, and JVM shift amounts wrap mod 64, so a larger value
    would silently OR high bits into low positions.
    """
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    if not 1 <= bits <= 32:
        raise ValueError(f"zorder_key: bits must be in [1, 32], got {bits}")
    ca = a if isinstance(a, Column) else F.col(a)
    cb = b if isinstance(b, Column) else F.col(b)
    ca, cb = ca.cast("bigint"), cb.cast("bigint")
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(ca, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(cb, i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return out
