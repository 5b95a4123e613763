"""Streaming sinks (SURVEY.md §2.1, §2.9).

Reference parity:
- row-format file sink (DataStreamJob.java:51-59) →
  ``writeStream.format("parquet")`` (or json/csv) with a checkpoint.
- print sink (CassandraPojoSource.java:64) → ``format("console")``.
- blackhole sink (StreamingFlinkSQL.java:25-32) → ``format("noop")``.
- Cassandra POJO sink with exactly-once upsert semantics
  (CassandraPojoSinkStreaming.java:70-79): the reference relies on
  Cassandra PRIMARY-KEY overwrite for idempotence; our equivalent is
  :func:`idempotent_parquet_sink` — each micro-batch (re)writes its
  own ``batch=<id>`` partition atomically, so a replayed batch after
  restart overwrites instead of duplicating. Spark's checkpoint gives
  exactly-once state; the deterministic per-batch overwrite turns the
  at-least-once side effects into exactly-once sink contents.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def idempotent_parquet_sink(out_dir: str):
    """``foreachBatch`` function writing each micro-batch to an
    overwrite-on-replay partition directory (idempotent upsert keyed
    by batch id — the parquet analog of the reference's Cassandra
    PRIMARY-KEY overwrite)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}")
            )
        )

    return write_batch


def read_sink(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the idempotent sink's accumulated contents back."""
    return spark.read.option("basePath", out_dir).parquet(os.path.join(out_dir, "batch=*"))
