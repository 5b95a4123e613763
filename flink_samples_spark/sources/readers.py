"""Batch source constructors.

Reference parity:
- number-sequence source (``DataStreamJob.java:45-49``) →
  :func:`range_source` (``spark.range``; streaming twin in
  ``streaming.sources.rate_source``).
- Cassandra bounded POJO scan, ``select * from test.pojo`` split by
  15 MiB (``CassandraPojoSource.java:57-63``) → :func:`scan_parquet`
  (a DSv2 parquet scan: Spark's split sizing —
  ``spark.sql.files.maxPartitionBytes`` — is the same
  split-by-bytes idea, with predicate/column pushdown on top).
- JSON-lines file input, plain or gzip (``src/main/resources/
  input.json``, deps ``pom.xml:89-100``) → :func:`read_json_lines`.

Scale note: all readers return lazy DataFrames; filters/projections
applied by callers reach the scan via Catalyst pushdown. Nothing here
collects.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Explicit schema for the reference's JSON-lines fixture
# (input.json:1 — {"my_field1": int, "my_field2": int, "my_field3": str}).
# Streaming file sources require a user-supplied schema; batch reads
# use it too so inference cost is zero and types are stable.
JSONLINES_SCHEMA = T.StructType(
    [
        T.StructField("my_field1", T.LongType()),
        T.StructField("my_field2", T.LongType()),
        T.StructField("my_field3", T.StringType()),
    ]
)


def _ns_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (footer inspection,
    driver-side only). Spark reads those as int64 under
    ``spark.sql.legacy.parquet.nanosAsLong``; we restore TimestampType."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover
        return []
    f = path
    if os.path.isdir(path):
        # recursive: a partitioned dataset's top level holds only
        # key=value subdirectories — a flat glob would find nothing
        # and silently skip the ns-restoration for every column
        cands = sorted(
            _glob.glob(os.path.join(path, "*.parquet"))
            or _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not cands:
            return []
        f = cands[0]
    try:
        schema = pq.read_schema(f)
    except Exception:
        return []
    return [fld.name for fld in schema if str(fld.type) == "timestamp[ns]"]


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Bounded columnar scan (the engine's generalization of the
    reference's bounded Cassandra scan, ``CassandraPojoSource.java:57-63``).

    TIMESTAMP(NANOS) columns are converted to Spark TimestampType by
    integer-dividing to µs (floor — identical to DuckDB's read-time
    truncation, so oracles agree). Integer `div` avoids the precision
    loss a double division would hit (ns epoch values exceed 2^53).
    """
    # Defensive: callers (e.g. the driver harness) may hand us a session
    # built without the engine's configs; both are runtime-settable.
    # DELIBERATE session-wide side effect: the engine contract is a
    # pinned-UTC session (session.py sets the same), and the oracle
    # comparisons depend on it — a non-UTC interactive session will
    # see its timezone flipped by the first read. Scoping it per-plan
    # is not possible for a conf that changes execution-time timestamp
    # semantics.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for c in _ns_timestamp_cols(path):
        # floor division, not `div` (which truncates toward zero and
        # would diverge from DuckDB by 1µs on pre-1970 sub-µs values)
        df = df.withColumn(
            c,
            F.timestamp_micros(
                F.expr(
                    f"`{c}` div 1000 + CASE WHEN `{c}` % 1000 < 0 THEN -1 ELSE 0 END"
                )
            ),
        )
    return df


# Spark Cassandra Connector's DSv2 format name (public, from the
# spark-cassandra-connector project). The jar is NOT present in this
# sandbox; the seam exists so a user coming from the reference's
# Cassandra source (CassandraPojoSource.java:57-63) can point the same
# constructor at a live cluster by flipping ``fmt``. The scan's
# PARTITION PLAN (Murmur3 token ring cut into 15 MiB splits) is
# implemented for real in ``sources/cassandra_ring.py`` as a Spark 4
# Python Data Source — one task per token range over a stub wire
# layer, pinned by tests/test_cassandra_ring.py.
CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


class SourceSpec:
    """Format-parameterized bounded source (default parquet).

    The reference's bounded source is a Cassandra POJO scan
    (``CassandraPojoSource.java:57-63``, ``select * from test.pojo``
    split by 15 MiB); this sandbox has no Cassandra, so the default
    format is a parquet scan with the same split-by-bytes behavior
    (``spark.sql.files.maxPartitionBytes``) plus predicate/column
    pushdown. ``SourceSpec("cassandra", keyspace=..., table=...)``
    plumbs the connector options; loading it without the connector
    jar raises a clear error instead of a raw JVM stack.
    """

    def __init__(self, fmt: str = "parquet", path: str | None = None, **options: str):
        self.fmt = fmt
        self.path = path
        self.options = dict(options)

    def reader_options(self) -> dict[str, str]:
        """The exact option map handed to the DataFrameReader —
        unit-testable without a live cluster."""
        if self.fmt == "cassandra":
            missing = {"keyspace", "table"} - set(self.options)
            if missing:
                raise ValueError(f"cassandra source needs options: {sorted(missing)}")
        return dict(self.options)

    def load(self, spark: SparkSession) -> DataFrame:
        opts = self.reader_options()
        if self.fmt == "parquet":
            if not self.path:
                raise ValueError("parquet source needs a path")
            return scan_parquet(spark, self.path)
        if self.fmt == "cassandra":
            try:
                return (
                    spark.read.format(CASSANDRA_FORMAT).options(**opts).load()
                )
            except Exception as ex:
                # wrap ONLY the missing-connector case; a live read
                # failure (endpoint, auth, missing table) surfaces as
                # itself, not as a phantom packaging problem
                msg = str(ex)
                if (
                    "Failed to find data source" in msg
                    or "ClassNotFound" in msg
                    or CASSANDRA_FORMAT in msg
                ):
                    raise RuntimeError(
                        "Cassandra connector jar (com.datastax.spark:"
                        "spark-cassandra-connector) is not on the classpath in "
                        "this sandbox; add it via spark.jars.packages to read "
                        f"{opts.get('keyspace')}.{opts.get('table')} live"
                    ) from ex
                raise
        if self.fmt == "cassandra_ring":
            # the in-repo token-ring Python Data Source (see
            # cassandra_ring.py) — session-scoped registration is
            # idempotent, so register on every load; the generic
            # load below delivers self.path into the source's
            # options exactly like .option("path", ...).
            # SESSION-WIDE side effect: registration enables
            # spark.sql.python.filterPushdown.enabled (needed for the
            # token-aware pk lookup), which turns filter pushdown on
            # for EVERY Python data source in this session — reset the
            # conf after loading if another Python source must stay
            # pushdown-free.
            from flink_samples_spark.sources.cassandra_ring import (
                register_cassandra_ring,
            )

            register_cassandra_ring(spark)
        reader = spark.read.format(self.fmt).options(**opts)
        return reader.load(self.path) if self.path else reader.load()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return scan_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Catalog registration — the Spark twin of the reference's
    ``createTemporaryTable`` (``StreamingFlinkSQL.java:14,25``)."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)


def range_source(spark: SparkSession, start: int = 0, end: int | None = None) -> DataFrame:
    """Bounded number-sequence source, one LongType column ``id``
    (batch twin of ``NumberSequenceSource(0, Long.MAX_VALUE)``,
    ``DataStreamJob.java:45-49``). With ``end`` omitted the sequence
    is [0, start) — Spark's single-argument range convention — which
    contradicts the parameter's name, so a start-only call is
    refused rather than silently reinterpreted."""
    if end is None:
        if start != 0:
            raise ValueError(
                f"range_source(start={start}) without end is ambiguous: "
                "spark.range(n) means [0, n). Pass both bounds "
                f"(range_source(spark, {start}, <end>))"
            )
        return spark.range(start)
    return spark.range(start, end)


def read_json_lines(
    spark: SparkSession, path: str, schema: T.StructType | None = JSONLINES_SCHEMA
) -> DataFrame:
    """JSON-lines reader; gzip is transparent, as with the reference's
    flink-json + files connectors (``pom.xml:89-100``)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_json_zip(
    spark: SparkSession, path: str, schema: T.StructType = JSONLINES_SCHEMA
) -> DataFrame:
    """JSON-lines inside a .zip archive — parity for the reference's
    ``src/main/resources/input.json.zip`` fixture. Spark ships no zip
    codec, so archives ride the ``binaryFile`` DSv2 source and are
    expanded inside ONE Arrow-batched ``mapInPandas`` stage; the
    member lines are parsed JVM-side by ``from_json`` against the
    explicit schema (same contract as :func:`read_json_lines`).

    Scale: a zip archive is not splittable (same as any zipped input
    anywhere) — parallelism is per-archive, which is the correct unit;
    many archives fan out across tasks. Each archive is decompressed
    streaming member-by-member, never holding more than one member
    decoded at a time.
    """
    import io
    import zipfile
    from collections.abc import Iterator

    import pandas as pd

    def expand(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for member in zf.namelist():
                        if member.endswith("/"):  # directory entry
                            continue
                        lines = [
                            ln
                            for ln in zf.read(member).decode("utf-8").splitlines()
                            if ln.strip()
                        ]
                        if lines:
                            yield pd.DataFrame({"value": lines})

    raw = spark.read.format("binaryFile").load(path).select("content")
    lines = raw.mapInPandas(expand, "value string")
    return lines.select(
        F.from_json(F.col("value"), schema).alias("r")
    ).select("r.*")


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV source with an explicit DDL schema (schema inference scans
    the data twice and guesses — at 100 TB always declare). Without
    ``schema``, falls back to inference for ad-hoc exploration."""
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC columnar source (vectorized reader + pushdown are Spark
    defaults, as with parquet)."""
    return spark.read.orc(path)
