"""Edge-case tests for the round-3 operators: chunking, corpus
splitting, int8 quantization, cross-corpus near-dup. The catalog
differential (tests/test_catalog.py) already checks each against its
DuckDB oracle; these pin the semantic contracts the oracle can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_samples_spark.llmops.chunking import chunk_documents
from flink_samples_spark.llmops.dedup import minhash_lsh_pairs_cross
from flink_samples_spark.llmops.similarity import quantize_int8
from flink_samples_spark.operators import hash_split
from flink_samples_spark.sources.readers import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_documents(_docs(spark, [(1, "one two three")]), 32, 24).collect()
    assert len(out) == 1
    assert out[0].chunk_idx == 0
    assert out[0].chunk_text == "one two three"
    assert out[0].n_chunk_words == 3


def test_chunk_overlap_and_coverage(spark):
    words = [f"w{i}" for i in range(100)]
    out = (
        chunk_documents(_docs(spark, [(1, " ".join(words))]), 32, 24)
        .orderBy("chunk_idx")
        .collect()
    )
    # ceil((100-32)/24)+1 = 4 chunks; starts 0,24,48,72 (0-based)
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    for i, r in enumerate(out):
        start = i * 24
        expect = words[start : start + 32]
        assert r.chunk_text.split(" ") == expect
        assert r.n_chunk_words == len(expect)
    # every word covered
    covered = set()
    for r in out:
        covered.update(r.chunk_text.split(" "))
    assert covered == set(words)


def test_hash_split_total_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = hash_split(docs, "doc_id")
    counts = {r["split"]: r["count"] for r in a.groupBy("split").count().collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts.get("train", 0) > counts.get("val", 0)
    # partition-layout independence
    b = hash_split(docs.repartition(7), "doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_quantize_int8_error_bound(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = quantize_int8(emb)
    # rounding to the nearest level bounds reconstruction error by
    # scale/2; q_l1 <= 127 * n_dims by construction
    bad = out.filter(
        (F.col("max_abs_err_r") > F.col("scale_r") / 2 + 1e-9)
        | (F.col("q_l1") > 127 * F.col("n_dims"))
    )
    assert bad.count() == 0
    assert out.count() == emb.count()


def test_cross_dedup_never_pairs_within_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("source") != "src0")
    b = docs.filter(F.col("source") == "src0")
    pairs = minhash_lsh_pairs_cross(a, b, k=3, threshold=0.0).collect()
    a_ids = {r.doc_id for r in a.select("doc_id").collect()}
    b_ids = {r.doc_id for r in b.select("doc_id").collect()}
    for r in pairs:
        assert r.doc_a in a_ids and r.doc_b in b_ids
