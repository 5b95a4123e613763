"""Live streaming job runner — the reference's run-forever UX.

The reference's jobs are launched as unbounded processes
(``DataStreamJob.java:45-60`` number sequence → file sink;
``StreamingFlinkSQL.java:21-43`` datagen → SQL session windows →
blackhole; ``CassandraPojoSinkStreaming.java:60-104`` lossy pojo
source → 10 s windows → idempotent sink) and stopped with ^C. This CLI
reproduces that: start a live rate-driven Structured Streaming job and
run until interrupted (or ``--duration`` seconds, for smoke tests).

Usage::

    python -m flink_samples_spark.run_job <job> [options]

    jobs:
      number_sequence   rate source -> identity -> sink  (DataStreamJob)
      session_count     datagen -> 5 s session windows -> sink
                        (StreamingFlinkSQL)
      windowed_sum      lossy pojo stream -> 10 s tumbling sum -> sink
                        (CassandraPojoSinkStreaming)

    options:
      --sink console|parquet|noop   (default console)
      --out DIR            parquet sink/checkpoint dir (default tmp)
      --rate N             source rows per second (default 100)
      --duration SECONDS   stop after N s (default: run until ^C)
"""

from __future__ import annotations

import argparse
import tempfile
import os

from pyspark.sql import DataFrame, SparkSession

from flink_samples_spark.session import get_spark
from flink_samples_spark.streaming.jobs import (
    number_sequence_job,
    session_count_stream,
    windowed_sum_stream,
)
from flink_samples_spark.streaming.sinks import idempotent_sink
from flink_samples_spark.streaming.sources import (
    datagen_stream,
    pojo_stream_with_lateness,
    rate_stream,
)


def _build(job: str, spark: SparkSession, rate: int) -> tuple[DataFrame, str]:
    """Returns (transformed streaming DataFrame, default output mode)."""
    if job == "number_sequence":
        return number_sequence_job(rate_stream(spark, rate)), "append"
    if job == "session_count":
        return session_count_stream(datagen_stream(spark, rate)), "append"
    if job == "windowed_sum":
        stream = pojo_stream_with_lateness(spark, rate)
        return windowed_sum_stream(stream, ts_col="ts", sum_col="id"), "append"
    raise SystemExit(f"unknown job {job!r} (see --help)")


def start(
    job: str,
    spark: SparkSession | None = None,
    sink: str = "console",
    out: str | None = None,
    rate: int = 100,
):
    """Start ``job`` live and return its StreamingQuery (caller owns
    stop/awaitTermination) — importable twin of the CLI."""
    spark = spark or get_spark(app_name=f"run-job-{job}")
    df, mode = _build(job, spark, rate)
    out = out or tempfile.mkdtemp(prefix=f"runjob_{job}_")
    writer = (
        df.writeStream.outputMode(mode)
        .option("checkpointLocation", os.path.join(out, "_checkpoint"))
        .queryName(job)
    )
    if sink == "console":
        writer = writer.format("console").option("truncate", "false")
    elif sink == "noop":
        writer = writer.format("noop")
    elif sink == "parquet":
        # exactly-once contents via the idempotent per-batch overwrite
        # (sinks.idempotent_sink; Cassandra twin behind fmt=)
        writer = writer.foreachBatch(idempotent_sink(os.path.join(out, "data")))
    else:
        raise SystemExit(f"unknown sink {sink!r}")
    return writer.start()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="run_job", description=__doc__)
    ap.add_argument("job", choices=["number_sequence", "session_count", "windowed_sum"])
    ap.add_argument("--sink", default="console", choices=["console", "parquet", "noop"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--rate", type=int, default=100)
    ap.add_argument("--duration", type=float, default=None)
    args = ap.parse_args(argv)

    q = start(args.job, sink=args.sink, out=args.out, rate=args.rate)
    print(f"started {args.job} (id={q.id}); ^C to stop", flush=True)
    try:
        if args.duration is None:
            q.awaitTermination()
        else:
            q.awaitTermination(args.duration)
            q.stop()
    except KeyboardInterrupt:
        q.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
