"""Token-ring partition planning + the cassandra_ring Python Data
Source (sources/cassandra_ring.py).

The reference's bounded Cassandra scan is parallelized by cutting the
Murmur3Partitioner ring into byte-sized splits
(``CassandraPojoSource.java:57-60``, 15 MiB). These tests pin the
three layers: the hash (against published MurmurHash3 x64_128
vectors), the ring arithmetic (exact disjoint coverage, connector
split sizing), and the Spark-side contract (one task per token range;
the union over splits is exactly the table — no row read twice or
missed)."""

from __future__ import annotations

import pytest

from flink_samples_spark.sources.cassandra_ring import (
    MAX_TOKEN,
    MIN_TOKEN,
    bigint_key_bytes,
    murmur3_token,
    murmur3_x64_128,
    plan_token_splits,
    plan_token_splits_by_size,
)


def test_murmur3_x64_128_published_vectors():
    """Canonical MurmurHash3 x64_128 at seed 0 — the halves are the
    little-endian uint64 words of the widely published digests."""
    assert murmur3_x64_128(b"") == (0, 0)
    # digest cbd8a7b341bd9b02 5b1e906a48ae1d19
    assert murmur3_x64_128(b"hello") == (0xCBD8A7B341BD9B02, 0x5B1E906A48AE1D19)
    # digest 6c1b07bc7bbc4be3 47939ac4a93c437a (word-order: LE)
    assert murmur3_x64_128(b"The quick brown fox jumps over the lazy dog") == (
        0xE34BBC7BBC071B6C,
        0x7A433CA9C49A9347,
    )


def test_signed_tail_variant_diverges_only_on_high_bytes():
    """Cassandra's Java port sign-extends tail bytes — the documented
    deliberate incompatibility. Tails of low bytes agree with
    canonical; a tail byte >= 0x80 diverges."""
    low = bytes(range(1, 8))  # 7-byte tail, all < 0x80
    assert murmur3_x64_128(low) == murmur3_x64_128(low, signed_tail=True)
    high = bytes([0xFF] * 7)
    assert murmur3_x64_128(high) != murmur3_x64_128(high, signed_tail=True)
    # 16-byte-aligned input has no tail: variants always agree
    aligned = bytes(range(256))[:32]
    assert murmur3_x64_128(aligned) == murmur3_x64_128(aligned, signed_tail=True)


def test_token_range_and_determinism():
    toks = [murmur3_token(bigint_key_bytes(k)) for k in range(-500, 500)]
    assert all(MIN_TOKEN < t <= MAX_TOKEN for t in toks)
    assert toks == [murmur3_token(bigint_key_bytes(k)) for k in range(-500, 500)]
    # sign-bit-free key encodings agree across the variants (so the
    # canonical vectors above also anchor the token function for them)
    for k in (0, 1, 2**20):
        h1, _ = murmur3_x64_128(bigint_key_bytes(k))
        signed = h1 - (1 << 64) if h1 > MAX_TOKEN else h1
        assert murmur3_token(bigint_key_bytes(k)) == signed


@pytest.mark.parametrize("n", [1, 2, 7, 32, 1000])
def test_splits_cover_the_ring_exactly(n):
    splits = plan_token_splits(n)
    assert len(splits) == n
    assert splits[0][0] == MIN_TOKEN and splits[-1][1] == MAX_TOKEN
    for (s0, e0), (s1, _e1) in zip(splits, splits[1:]):
        assert e0 == s1 and s0 < e0  # contiguous, non-empty
    # near-uniform: sizes differ by at most 1 token
    sizes = {e - s for s, e in splits}
    assert len(sizes) <= 2 and max(sizes) - min(sizes) <= 1


def test_every_key_lands_in_exactly_one_split():
    splits = plan_token_splits(13)
    for k in range(300):
        tok = murmur3_token(bigint_key_bytes(k * 7919 - 1000))
        owners = [1 for s, e in splits if s < tok <= e]
        assert sum(owners) == 1


def test_vectorized_tokens_equal_scalar():
    """The reader's numpy token path must agree with the scalar
    partitioner byte-for-byte — random keys plus every sign/boundary
    case (0, ±1, int64 extremes, the 0x7F/0x80 sign-extension edge)."""
    import numpy as np

    from flink_samples_spark.sources.cassandra_ring import murmur3_token_bigint_vec

    rng = np.random.RandomState(7)
    keys = np.concatenate(
        [
            rng.randint(-(2**62), 2**62, size=2000),
            np.array(
                [0, 1, -1, 2**63 - 1, -(2**63), 127, 128, -128, -129, 255, 256]
            ),
        ]
    ).astype(np.int64)
    vec = murmur3_token_bigint_vec(keys)
    scalar = np.array([murmur3_token(bigint_key_bytes(int(k))) for k in keys])
    assert np.array_equal(vec, scalar)


def test_split_sizing_uses_connector_arithmetic():
    """ceil(estimated bytes / split size), 15 MiB reference default."""
    mib = 1 << 20
    assert len(plan_token_splits_by_size(100 * mib)) == 7  # ceil(100/15)
    assert len(plan_token_splits_by_size(15 * mib)) == 1
    assert len(plan_token_splits_by_size(15 * mib + 1)) == 2
    assert len(plan_token_splits_by_size(0)) == 1
    assert len(plan_token_splits_by_size(64 * mib, split_size_mb=16)) == 4
    with pytest.raises(ValueError):
        plan_token_splits_by_size(-1)
    with pytest.raises(ValueError):
        plan_token_splits(0)


def test_ring_datasource_reads_exactly_the_table(spark, tmp_path):
    """End-to-end through Spark: register the Python Data Source,
    read a pojo-shaped parquet through token-range splits, and check
    the union over splits is exactly the table and the task count is
    the split count."""
    import pandas as pd

    from flink_samples_spark.sources.cassandra_ring import register_cassandra_ring

    path = str(tmp_path / "pojo.parquet")
    pdf = pd.DataFrame(
        {
            "pk": pd.array(range(0, 400, 3), dtype="int64"),
            "value": [f"v{i}" for i in range(0, 400, 3)],
        }
    )
    pdf.to_parquet(path, index=False)

    register_cassandra_ring(spark)
    df = (
        spark.read.format("cassandra_ring")
        .option("path", path)
        .option("partition_key", "pk")
        .option("n_splits", "6")
        .load()
    )
    assert df.rdd.getNumPartitions() == 6
    got = sorted((r.pk, r.value) for r in df.collect())
    assert got == sorted(zip(pdf["pk"].tolist(), pdf["value"].tolist()))
    # connector sizing path: 40 MiB table at the reference's 15 MiB
    # split default -> 3 splits
    df_sized = (
        spark.read.format("cassandra_ring")
        .option("path", path)
        .option("partition_key", "pk")
        .option("estimated_table_bytes", str(40 * (1 << 20)))
        .load()
    )
    assert df_sized.rdd.getNumPartitions() == 3
    assert df_sized.count() == len(pdf)


def test_row_group_pruned_read_spans_group_boundaries(tmp_path):
    """r12 verdict item 6: the stub reader prunes per ROW GROUP —
    only the pk column is read for a group, and the other columns
    materialize only for groups owning rows in the split. The union
    over splits must still be exactly the table when rows are spread
    across many row groups, and a pk lookup must return its row no
    matter which group holds it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_samples_spark.sources.cassandra_ring import (
        _build_datasource,
        plan_token_splits,
    )

    path = str(tmp_path / "grouped.parquet")
    keys = list(range(0, 300, 7))
    table = pa.table(
        {"pk": pa.array(keys, pa.int64()), "value": [f"v{k}" for k in keys]}
    )
    pq.write_table(table, path, row_group_size=10)  # 5 row groups
    assert pq.ParquetFile(path).metadata.num_row_groups > 1

    ds_cls = _build_datasource()
    reader = ds_cls({"path": path, "partition_key": "pk", "n_splits": "5"}).reader(
        None
    )
    got = sorted(
        row
        for s, e in plan_token_splits(5)
        for row in _read_rows(reader, type("P", (), {"start": s, "end": e})())
    )
    assert got == sorted((k, f"v{k}") for k in keys)

    # pk lookup across the pruned path: the key lives in the LAST row
    # group; pushFilters absorbs the predicate, partitions() keeps only
    # the owning split, and read() must surface exactly that row
    from pyspark.sql.datasource import EqualTo

    lookup = ds_cls({"path": path, "partition_key": "pk", "n_splits": "5"}).reader(
        None
    )
    leftover = list(lookup.pushFilters([EqualTo(("pk",), keys[-1])]))
    assert leftover == []
    parts = lookup.partitions()
    assert len(parts) >= 1
    rows = [row for p in parts for row in _read_rows(lookup, p)]
    assert rows == [(keys[-1], f"v{keys[-1]}")]


def _read_rows(reader, part):
    """Flatten the reader's Arrow RecordBatch yields to row tuples
    (the reader yields batches since r12 — the Data Source API accepts
    either; Spark does this same flattening JVM-side)."""
    return [
        tuple(row.values())
        for batch in reader.read(part)
        for row in batch.to_pylist()
    ]


def test_pk_pushdown_prunes_to_owning_split():
    """Token-aware single-partition lookup at the reader level: a pk
    equality (or IN) predicate handed to pushFilters is fully
    absorbed, partitions() keeps only the owning token range(s), and
    read() returns exactly the keyed rows."""
    import pandas as pd
    from pyspark.sql.datasource import EqualTo, In

    from flink_samples_spark.sources.cassandra_ring import _build_datasource

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/pojo.parquet"
        pd.DataFrame(
            {"pk": pd.array(range(100), dtype="int64"),
             "value": [f"v{i}" for i in range(100)]}
        ).to_parquet(path, index=False)

        ds_cls = _build_datasource()
        reader = ds_cls({"path": path, "n_splits": "64"}).reader(None)
        remaining = list(reader.pushFilters([EqualTo(("pk",), 42)]))
        assert remaining == []  # fully absorbed
        parts = reader.partitions()
        assert len(parts) == 1  # one owning range out of 64
        tok = murmur3_token(bigint_key_bytes(42))
        assert parts[0].start < tok <= parts[0].end
        rows = _read_rows(reader, parts[0])
        assert rows == [(42, "v42")]

        # IN list: as many ranges as distinct owners, all rows back
        reader2 = ds_cls({"path": path, "n_splits": "64"}).reader(None)
        assert list(reader2.pushFilters([In(("pk",), (1, 2, 3))])) == []
        parts2 = reader2.partitions()
        assert 1 <= len(parts2) <= 3
        got = sorted(r for p in parts2 for r in _read_rows(reader2, p))
        assert got == [(1, "v1"), (2, "v2"), (3, "v3")]

        # a non-pk filter is NOT absorbed (Spark must re-evaluate it)
        reader3 = ds_cls({"path": path, "n_splits": "8"}).reader(None)
        f_other = EqualTo(("value",), "v7")
        assert list(reader3.pushFilters([f_other])) == [f_other]
        assert len(reader3.partitions()) == 8


def test_pk_pushdown_end_to_end_sql(spark, tmp_path):
    """The same pushdown through the whole planner: SELECT with a pk
    equality returns the right row (pruning is pinned unit-level
    above; here the contract is end-to-end correctness)."""
    import pandas as pd

    from flink_samples_spark.sources.cassandra_ring import register_cassandra_ring

    path = str(tmp_path / "pojo.parquet")
    pd.DataFrame(
        {"pk": pd.array(range(50), dtype="int64"),
         "value": [f"v{i}" for i in range(50)]}
    ).to_parquet(path, index=False)
    register_cassandra_ring(spark)
    df = (
        spark.read.format("cassandra_ring")
        .option("path", path)
        .option("n_splits", "16")
        .load()
    )
    got = df.filter("pk = 17").collect()
    assert [(r.pk, r.value) for r in got] == [(17, "v17")]
    got_in = sorted(
        (r.pk, r.value) for r in df.filter("pk IN (3, 31)").collect()
    )
    assert got_in == [(3, "v3"), (31, "v31")]


def test_ring_writer_token_routed_upsert(spark, tmp_path):
    """The sink side: rows land in per-token-range batch files whose
    names carry the owning range index, duplicate keys upsert
    (last-write-wins), and the commit protocol publishes staged files
    atomically (no _staging leftovers)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from flink_samples_spark.sources.cassandra_ring import (
        plan_token_splits,
        register_cassandra_ring,
    )

    register_cassandra_ring(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    df = spark.createDataFrame(
        [(k, f"first{k}") for k in range(40)] + [(7, "second7")],
        "pk bigint, value string",
    ).coalesce(2)
    (
        df.write.format("cassandra_ring")
        .option("path", out)
        .option("n_splits", "8")
        .mode("append")
        .save()
    )
    files = glob.glob(os.path.join(out, "range=*.parquet"))
    assert files and not os.path.exists(os.path.join(out, "_staging"))
    splits = plan_token_splits(8)
    seen = {}
    for f in files:
        ridx = int(os.path.basename(f).split("=")[1].split("-")[0])
        s, e = splits[ridx]
        for row in pq.read_table(f).to_pylist():
            tok = murmur3_token(bigint_key_bytes(row["pk"]))
            assert s < tok <= e, "row filed under the wrong token range"
            seen.setdefault(row["pk"], set()).add(row["value"])
    assert set(seen) == set(range(40))
    # upsert within a task: key 7 must not carry both values in one
    # file's batch; across tasks both batches may exist (like two CQL
    # batches racing — the stub keeps files, a live cluster LWW-merges)
    assert all(len(v) == 1 for k, v in seen.items() if k != 7)


def test_sourcespec_cassandra_ring_roundtrip(spark, tmp_path):
    """SourceSpec('cassandra_ring', path=...) auto-registers the
    Python Data Source and reads the stub table through it."""
    import pandas as pd

    from flink_samples_spark.sources.readers import SourceSpec

    path = str(tmp_path / "pojo.parquet")
    pd.DataFrame(
        {"pk": pd.array(range(10), dtype="int64"),
         "value": [f"v{i}" for i in range(10)]}
    ).to_parquet(path, index=False)
    df = SourceSpec("cassandra_ring", path=path, n_splits="4").load(spark)
    assert df.rdd.getNumPartitions() == 4
    assert sorted((r.pk, r.value) for r in df.collect()) == [
        (i, f"v{i}") for i in range(10)
    ]


def test_pushdown_equals_full_scan_filter_property():
    """Property: for ANY key set, the pushdown path (pruned splits +
    absorbed predicate) returns exactly the rows the full scan +
    post-filter would — no key lost to a ring-boundary off-by-one."""
    import tempfile

    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql.datasource import In

    from flink_samples_spark.sources.cassandra_ring import _build_datasource

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t.parquet"
        keys = [k * 2654435761 % (1 << 40) - (1 << 39) for k in range(200)]
        pd.DataFrame(
            {"pk": pd.array(keys, dtype="int64"),
             "value": [str(k) for k in keys]}
        ).to_parquet(path, index=False)
        ds_cls = _build_datasource()

        @given(
            pick=st.lists(st.sampled_from(keys), min_size=1, max_size=8),
            n_splits=st.sampled_from([1, 3, 16, 64]),
        )
        @settings(max_examples=25, deadline=None)
        def prop(pick, n_splits):
            reader = ds_cls({"path": path, "n_splits": str(n_splits)}).reader(None)
            assert list(reader.pushFilters([In(("pk",), tuple(pick))])) == []
            got = sorted(
                r for p in reader.partitions() for r in _read_rows(reader, p)
            )
            assert got == sorted((k, str(k)) for k in set(pick))

        prop()


def test_ring_stream_writer_idempotent_epochs(spark, tmp_path):
    """writeStream.format('cassandra_ring') — the reference's sink IS
    a streaming sink (CassandraPojoSinkStreaming.java:70-79). Rows
    flow through the same token-range batching; files carry the
    epoch id so a retried epoch replaces itself (idempotent publish),
    and the union over epochs is exactly the input."""
    import glob
    import os

    import pyarrow.parquet as pq

    from flink_samples_spark.sources.cassandra_ring import register_cassandra_ring

    register_cassandra_ring(spark)
    src = str(tmp_path / "in")
    out = str(tmp_path / "sink")
    cp = str(tmp_path / "cp")
    os.makedirs(out)
    spark.createDataFrame(
        [(k, f"v{k}") for k in range(30)], "pk bigint, value string"
    ).repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema("pk bigint, value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.format("cassandra_ring")
        .option("path", out)
        .option("n_splits", "4")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    files = glob.glob(os.path.join(out, "epoch=*-range=*.parquet"))
    assert files and not os.path.exists(os.path.join(out, "_staging"))
    rows = sorted(
        (r["pk"], r["value"]) for f in files for r in pq.read_table(f).to_pylist()
    )
    assert rows == [(k, f"v{k}") for k in range(30)]
    assert len({os.path.basename(f).split("-")[0] for f in files}) >= 2


def test_ring_writer_validates_options(spark, tmp_path):
    from flink_samples_spark.sources.cassandra_ring import register_cassandra_ring

    register_cassandra_ring(spark)
    df = spark.createDataFrame([(1, "a")], "pk bigint, value string")
    with pytest.raises(Exception, match="save_null_fields"):
        (
            df.write.format("cassandra_ring")
            .option("path", str(tmp_path))
            .option("save_null_fields", "maybe")
            .mode("append")
            .save()
        )
    with pytest.raises(Exception, match="partition key"):
        (
            df.write.format("cassandra_ring")
            .option("path", str(tmp_path))
            .option("partition_key", "nope")
            .mode("append")
            .save()
        )


def test_ring_writer_preserves_declared_column_types(spark, tmp_path):
    """The sink writes with an explicit arrow schema derived from the
    DECLARED Spark schema — without it pa.table() infers from python
    values and silently widens int columns to int64, so a write→read
    roundtrip (q_ring_roundtrip) would not match the source schema."""
    import glob
    import os

    import pyarrow.parquet as pq

    from flink_samples_spark.sources.cassandra_ring import register_cassandra_ring

    register_cassandra_ring(spark)
    out = str(tmp_path / "typed_sink")
    os.makedirs(out)
    import datetime

    df = spark.createDataFrame(
        [
            (1, 10, 1.5, "x", datetime.datetime(2024, 1, 2, 3, 4, 5, 600),
             datetime.date(2024, 1, 2)),
            (2, 20, 2.5, "y", datetime.datetime(2024, 6, 7, 8, 9, 10, 110),
             datetime.date(2024, 6, 7)),
        ],
        "pk bigint, small int, bal double, name string,"
        " ts timestamp_ntz, d date",
    )
    (
        df.write.format("cassandra_ring")
        .option("path", out)
        .option("n_splits", "4")
        .mode("append")
        .save()
    )
    files = glob.glob(os.path.join(out, "range=*.parquet"))
    assert files
    for f in files:
        sch = pq.read_schema(f)
        assert str(sch.field("small").type) == "int32"
        assert str(sch.field("pk").type) == "int64"
        assert str(sch.field("bal").type) == "double"
        assert str(sch.field("ts").type) == "timestamp[us]"
        assert str(sch.field("d").type) == "date32[day]"
    back = spark.read.parquet(os.path.join(out, "range=*.parquet"))
    assert back.schema == df.schema
    assert sorted((r.pk, r.ts, r.d) for r in back.collect()) == sorted(
        (r.pk, r.ts, r.d) for r in df.collect()
    )
    # and the written files read back through the ring SOURCE too —
    # the shared type table maps both directions
    ring_back = (
        spark.read.format("cassandra_ring")
        .option("path", files[0])
        .option("partition_key", "pk")
        .option("n_splits", "2")
        .load()
    )
    assert ring_back.schema == df.schema


def test_ring_writer_overlapping_queries_stage_in_isolation(tmp_path):
    """r11 ADVICE: two overlapping writes to the same path must not
    delete each other's staged files — each query stages under its own
    ``_staging/<uuid>`` subdir (the uuid rides in the commit message),
    and commit/abort only touch their own staging area. Driven at the
    writer-protocol level so the interleaving is deterministic:
    A.write, B.write, A.commit (B's staged files must survive),
    B.commit."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from flink_samples_spark.sources.cassandra_ring import _build_datasource

    ds_cls = _build_datasource()
    schema = StructType(
        [StructField("pk", LongType()), StructField("value", StringType())]
    )
    out = str(tmp_path / "sink")
    os.makedirs(out)

    def writer():
        return ds_cls({"path": out, "n_splits": "4"}).writer(schema, False)

    import pyarrow as pa

    def batch(rows):
        # the writer is Arrow-vectorized (DataSourceArrowWriter):
        # Spark hands tasks RecordBatches, so the protocol drive does too
        pks, vals = zip(*rows)
        return pa.record_batch(
            {"pk": pa.array(pks, pa.int64()), "value": pa.array(vals, pa.string())}
        )

    wa, wb = writer(), writer()
    assert wa.staging_id != wb.staging_id
    ma = wa.write(iter([batch([(1, "a1"), (2, "a2")])]))
    mb = wb.write(iter([batch([(3, "b3"), (4, "b4")])]))
    # both queries have files staged under distinct subdirs
    assert len(glob.glob(os.path.join(out, "_staging", "*", "*.parquet"))) >= 2
    wa.commit([ma])
    # A's commit must leave B's staged files untouched
    b_staged = glob.glob(os.path.join(out, "_staging", mb.staging_id, "*.parquet"))
    assert b_staged, "overlapping commit deleted the other query's staging"
    wb.commit([mb])
    assert not os.path.exists(os.path.join(out, "_staging"))
    rows = sorted(
        (r["pk"], r["value"])
        for f in glob.glob(os.path.join(out, "range=*.parquet"))
        for r in pq.read_table(f).to_pylist()
    )
    assert rows == [(1, "a1"), (2, "a2"), (3, "b3"), (4, "b4")]


def test_q_scan_ring_equals_plain_scan(spark):
    """The registered driver query (q_scan_ring): reading customer
    through the token-ring DataSource with the size-derived split plan
    must be row-for-row the plain parquet scan — ring coverage is
    total and disjoint, so the union of per-split reads IS the table
    (CassandraPojoSource.java:57-63 semantics)."""
    from flink_samples_spark.plans import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    ring = sorted(map(tuple, QUERIES["q_scan_ring"](spark, sf_dir).collect()))
    plain = sorted(
        map(tuple, spark.read.parquet(f"{sf_dir}/customer.parquet").collect())
    )
    assert ring == plain
