"""Sampling operator semantics: determinism, per-stratum rates,
reservoir exactness, salt independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_samples_spark.operators import (
    hash_sample,
    reservoir_per_group,
    stratified_sample,
)
from flink_samples_spark.sources.readers import load_table


def test_hash_sample_reproducible_and_partition_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(7), "doc_id", 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b and len(a) > 0
    # nested property: the 0.1 sample is a subset of the 0.3 sample
    # (same hash, lower threshold) — lets pipelines grow a sample
    # without resampling everything
    c = {r.doc_id for r in hash_sample(docs, "doc_id", 0.1).select("doc_id").collect()}
    assert c <= a


def test_hash_sample_salts_are_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt=0).select("doc_id").collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt=101).select("doc_id").collect()}
    overlap = len(a & b) / max(len(a), 1)
    # independent 50% samples overlap ~50%; identical ones 100%
    assert 0.25 < overlap < 0.75
    assert 0.3 * n < len(a) < 0.7 * n


def test_stratified_sample_rates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fracs = {"en": 0.5, "de": 0.25, "fr": 0.25}
    out = stratified_sample(docs, "lang", fracs, seed=42)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # strata not in the dict are dropped entirely
    assert set(got) <= set(fracs)
    for lang, frac in fracs.items():
        rate = got.get(lang, 0) / base[lang]
        assert abs(rate - frac) < 0.25, f"{lang}: rate {rate} vs {frac}"
    # seeded: rerun is identical
    again = stratified_sample(docs, "lang", fracs, seed=42)
    assert {r.doc_id for r in out.select("doc_id").collect()} == {
        r.doc_id for r in again.select("doc_id").collect()
    }


def test_reservoir_exact_k_per_group(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    out = reservoir_per_group(ev, ["event_type"], "event_id", 5)
    sizes = {r.event_type: r.n for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    base = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for et, n in base.items():
        assert sizes[et] == min(5, n)
    # deterministic across partitionings
    again = reservoir_per_group(ev.repartition(9), ["event_type"], "event_id", 5)
    assert {(r.event_id, r.event_type) for r in out.collect()} == {
        (r.event_id, r.event_type) for r in again.collect()
    }


def test_resample_interpolate_gap_semantics(spark):
    """Crafted gaps: interior missing buckets are linearly
    interpolated and flagged; present buckets pass through; each key's
    spine spans exactly its own [first, last] bucket."""
    import datetime as dt

    import pandas as pd

    from flink_samples_spark.operators import resample_interpolate

    base = dt.datetime(2024, 1, 1)
    h = lambda n: base + dt.timedelta(hours=n)
    rows = [
        # key 1: buckets 0, 3 → gaps at 1, 2 interpolated 10→40
        (1, h(0), 10.0),
        (1, h(3), 40.0),
        # key 2: single bucket → no gaps
        (2, h(5), 7.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "ts", "v"])
    )
    out = {
        (r.k, r.bucket): (r.value, r.filled)
        for r in resample_interpolate(df, "k", "ts", "v", 3600).collect()
    }
    assert out == {
        (1, h(0)): (10.0, False),
        (1, h(1)): (20.0, True),
        (1, h(2)): (30.0, True),
        (1, h(3)): (40.0, False),
        (2, h(5)): (7.0, False),
    }


def test_different_salts_give_independent_samples(spark, sf_dir):
    """Code-review r5: with a purely multiplicative scramble, u(key,
    salt) was u(key, 0) plus a constant rotation, so samples under
    different salts were deterministically coupled (a weighted sample
    could land entirely inside the 'train' split band). The xor-shift
    finalizer must make cross-salt selections behave independently:
    overlap of two 30% samples under different salts ≈ 9%."""
    from flink_samples_spark.operators.sampling import hash_sample

    docs = spark.range(20_000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, salt=13).collect()}
    b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, salt=29).collect()}
    overlap = len(a & b) / 20_000
    # independent 0.3×0.3 → 0.09; the old rotation gave pathological
    # values (0.3 when bands aligned, down to 0 when disjoint)
    assert 0.06 < overlap < 0.12, overlap
    # and each sample alone still keeps ~the requested fraction
    assert 0.27 < len(a) / 20_000 < 0.33
    assert 0.27 < len(b) / 20_000 < 0.33


def test_sampling_rejects_non_integer_keys(spark):
    import pytest

    from flink_samples_spark.operators.sampling import hash_sample

    docs = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    with pytest.raises(TypeError, match="integral id"):
        hash_sample(docs, "doc_id", 0.5)
