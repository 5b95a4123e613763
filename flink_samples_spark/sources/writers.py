"""Batch + streaming sink constructors (SURVEY.md §2.1).

Reference parity:
- row-format file sink with a custom Encoder lambda
  (DataStreamJob.java:51-59, writes ``String.valueOf(element)`` lines)
  → :func:`write_text_lines` (and the columnar upgrades
  :func:`write_parquet` / :func:`write_json_lines`; Spark's writers
  format rows without user encoder code).
- print sink (CassandraPojoSource.java:64) → :func:`print_sink`.
- blackhole sink (StreamingFlinkSQL.java:25-32) → :func:`noop_sink`.
- streaming row-format file sink → :func:`streaming_file_sink`
  (parquet/json/csv with checkpoint, exactly-once file commits via
  the sink's metadata log).

Scale notes: ``partition_by`` maps the reference's ``@PartitionKey``
storage concern (CassandraPojoSource.java:74) to directory
partitioning; writers inherit the DataFrame's partitioning — no
repartition is forced here, callers control file counts via
``coalesce``/``repartition`` upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_text_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Row-format sink: one encoded line per row (the reference's
    Encoder writes String.valueOf + newline; here: CSV-style concat of
    all columns, no user encoder needed). NULLs print as the literal
    'null' (String.valueOf semantics) — concat_ws alone would DROP
    null fields, silently column-shifting every later field on the
    line."""
    line = F.concat_ws(
        ",",
        *[F.coalesce(F.col(c).cast("string"), F.lit("null")) for c in df.columns],
    )
    df.select(line.alias("value")).write.mode(mode).text(path)


def print_sink(df: DataFrame, n: int = 20) -> None:
    df.show(n, truncate=False)


def noop_sink(df: DataFrame) -> None:
    """Blackhole: full execution, discarded output (bench harness)."""
    df.write.format("noop").mode("overwrite").save()


def streaming_file_sink(df: DataFrame, path: str, checkpoint: str, fmt: str = "parquet"):
    """Unbounded → files with exactly-once commit protocol."""
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """CSV row-format sink (the reference's row-format file sink
    family, FileSink.forRowFormat — DataStreamJob.java writes
    row-formatted output files). Timestamps serialize ISO-8601;
    readers recover types via an explicit schema."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC columnar sink — same predicate-pushdown/column-pruning
    story as parquet for deployments standardized on ORC."""
    df.write.mode(mode).orc(path)


def write_corpus_sharded(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("split",),
    shards_per_partition: int = 4,
    max_records_per_file: int | None = None,
    order_within_shards: Sequence[str] = (),
    mode: str = "overwrite",
    shard_by: str | None = None,
) -> None:
    """Training-corpus parquet layout writer: directory-partitioned by
    the split/domain columns, a CONTROLLED shard count per partition,
    and optional within-shard ordering for compression locality.

    The three file-layout levers a 100 TB curation run needs:

    - a computed SHARD column (``pmod(xxhash64(shard_by), shards)``;
      ``shard_by`` defaults to the first non-partition column) joins
      the partition columns in the ``repartition``, so each output
      directory is written by exactly ``shards_per_partition``
      PARALLEL tasks — repartitioning on the partition columns alone
      would serialize each directory onto ONE task (the write
      bottleneck), while no repartition at all makes every upstream
      task write a file into every directory (tasks × partitions
      small files, the classic explosion).
    - ``max_records_per_file`` caps file size regardless of skew —
      oversized shards roll over instead of producing 10 GB files.
    - ``sortWithinPartitions`` clusters similar rows (e.g. by source
      or doc length) so parquet encodings compress them together —
      routinely a 1.5-3x size win on text.

    Loaders read back any subset via partition pruning
    (``WHERE split = 'train'`` never touches other directories).
    """
    shard_src = shard_by or next(
        (c for c in df.columns if c not in set(partition_by)), None
    )
    if shard_src is None:
        raise ValueError(
            "write_corpus_sharded: every column is a partition column — "
            "pass shard_by or keep at least one data column to shard on"
        )
    shard = F.pmod(F.xxhash64(F.col(shard_src)), F.lit(int(shards_per_partition)))
    df = df.withColumn("__shard", shard)
    df = df.repartition(*[F.col(c) for c in partition_by], F.col("__shard"))
    if order_within_shards:
        df = df.sortWithinPartitions(*order_within_shards)
    df = df.drop("__shard")  # routing column only — not part of the data
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
