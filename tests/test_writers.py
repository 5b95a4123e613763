"""Round-trip tests for the file sinks (reference's row-format file
sink family, DataStreamJob.java:51-59)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from flink_samples_spark.sources.readers import load_table, read_json_lines, scan_parquet
from flink_samples_spark.sources.writers import (
    write_json_lines,
    write_parquet,
    write_text_lines,
)


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_parquet_roundtrip_partitioned(spark, sf_dir, outdir):
    src = load_table(spark, sf_dir, "orders")
    write_parquet(src, outdir, partition_by=["o_orderstatus"])
    back = scan_parquet(spark, outdir)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
    # directory partitioning actually prunes: the filter lands in
    # PartitionFilters (not a data filter), and values round-trip
    pruned = back.filter(F.col("o_orderstatus") == "F")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0]
    assert pruned.count() == src.filter(F.col("o_orderstatus") == "F").count()


def test_json_lines_roundtrip(spark, sf_dir, outdir):
    src = load_table(spark, sf_dir, "nation")
    write_json_lines(src, outdir)
    back = spark.read.json(outdir)
    assert back.count() == src.count()


def test_text_lines_rowformat(spark, outdir):
    df = spark.range(5).select(F.col("id"))
    write_text_lines(df, outdir)
    lines = sorted(r.value for r in spark.read.text(outdir).collect())
    assert lines == ["0", "1", "2", "3", "4"]


def test_jsonlines_gzip_read(spark, tmp_path):
    """Reference ships gzipped json-lines (input_big.json.gz); gzip is
    transparent to the reader."""
    import gzip, json, os

    p = str(tmp_path / "rows.json.gz")
    with gzip.open(p, "wt") as f:
        for i in range(10):
            f.write(json.dumps({"my_field1": i, "my_field2": i * 2, "my_field3": f"test{i}"}) + "\n")
    df = read_json_lines(spark, p)
    assert df.count() == 10
    assert df.schema.simpleString() == "struct<my_field1:bigint,my_field2:bigint,my_field3:string>"


def test_jsonlines_zip_read(spark):
    """Reference also ships input.json.zip; Spark has no zip codec, so
    the reader expands archives via binaryFile + mapInPandas. Must
    match the plain json-lines read of the same fixture content."""
    from flink_samples_spark.sources.readers import read_json_zip

    plain = read_json_lines(spark, "/root/repo/data/input.jsonl")
    zipped = read_json_zip(spark, "/root/repo/data/input.json.zip")
    assert zipped.schema.simpleString() == plain.schema.simpleString()
    assert sorted(map(tuple, zipped.collect())) == sorted(map(tuple, plain.collect()))


def test_csv_roundtrip_with_schema(spark, sf_dir, outdir):
    """CSV writer → schema'd reader: values and types survive the
    text round-trip (timestamps included)."""
    from flink_samples_spark.sources.readers import load_table, read_csv
    from flink_samples_spark.sources.writers import write_csv

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    path = os.path.join(outdir, "orders_csv")
    write_csv(o, path)
    back = read_csv(
        spark,
        path,
        schema="o_orderkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp_ntz",
    )
    assert back.schema.simpleString() == o.schema.simpleString()
    a = sorted(o.collect())
    b = sorted(back.collect())
    assert a == b


def test_orc_roundtrip_with_pushdown(spark, sf_dir, outdir):
    """ORC round-trip preserves values; filters push to the ORC scan."""
    import contextlib
    import io

    from flink_samples_spark.sources.readers import load_table, read_orc
    from flink_samples_spark.sources.writers import write_orc

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(outdir, "orders_orc")
    write_orc(o, path)
    back = read_orc(spark, path)
    assert sorted(o.collect()) == sorted(back.collect())
    filtered = back.filter(F.col("o_totalprice") > 300000)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain(mode="formatted")
    assert "PushedFilters: [" in buf.getvalue()
    assert "GreaterThan(o_totalprice" in buf.getvalue()


def test_jsonlines_zip_multi_member(spark, tmp_path):
    """A zip with several members (and a directory entry) expands to
    the union of member lines."""
    import json
    import zipfile

    from flink_samples_spark.sources.readers import read_json_zip

    p = str(tmp_path / "multi.zip")
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("d/", "")  # directory entry must be skipped
        for m in range(3):
            lines = "\n".join(
                json.dumps(
                    {"my_field1": m * 10 + i, "my_field2": i, "my_field3": f"m{m}"}
                )
                for i in range(4)
            )
            zf.writestr(f"d/part{m}.json", lines + "\n\n")  # trailing blank line
    df = read_json_zip(spark, p)
    rows = sorted((r.my_field1, r.my_field3) for r in df.collect())
    assert len(rows) == 12
    assert rows[0] == (0, "m0") and rows[-1] == (23, "m2")


def test_corpus_sharded_layout(spark, sf_dir, tmp_path):
    """write_corpus_sharded: directory-partitioned by split, at most
    shards_per_partition data files per directory, rollover via
    maxRecordsPerFile, lossless readback with partition pruning."""
    import glob
    import os

    from flink_samples_spark.operators import hash_split
    from flink_samples_spark.sources.readers import load_table
    from flink_samples_spark.sources.writers import write_corpus_sharded

    docs = hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    out = str(tmp_path / "corpus")
    write_corpus_sharded(
        docs,
        out,
        partition_by=("split",),
        shards_per_partition=3,
        max_records_per_file=200,
        order_within_shards=("source", "doc_id"),
    )
    splits = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(out, "split=*"))
    )
    assert splits == ["split=test", "split=train", "split=val"]
    n_total = 0
    for d in glob.glob(os.path.join(out, "split=*")):
        files = glob.glob(os.path.join(d, "*.parquet"))
        # 3 shard tasks × possible rollover; never tasks×partitions
        assert 1 <= len(files) <= 3 * 4, files
        back = spark.read.parquet(d)
        assert "__shard" not in back.columns
        n_total += back.count()
    # the big split must actually be written by PARALLEL shard tasks
    # (the partition-cols-only repartition bug serialized it to one)
    train_files = glob.glob(os.path.join(out, "split=train", "*.parquet"))
    assert len(train_files) >= 2, train_files
    full = spark.read.parquet(out)
    assert full.count() == n_total == docs.count()
    # partition pruning: a split filter reads only that directory
    assert (
        full.filter(F.col("split") == "train").count()
        == docs.filter(F.col("split") == "train").count()
    )
