"""Similarity search over embedding columns (SURVEY.md §2.11).

- :func:`brute_force_cosine_topk` — exact baseline: broadcast the
  query set, score every (query, candidate) pair with JVM-side
  higher-order functions (zip_with dot product in DOUBLE, fold left
  to right — bit-reproducible across engines), take top-k per query
  via row_number. Cost O(|Q|·N): right when |Q| is small or recall
  must be 1.0.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH
  signs bucket both sides; candidates only within matching buckets
  (with multi-probe via several tables), then exact re-scoring.
  Shuffle is bucket-local, so N never all-pairs. Recall < 1 by
  design; tests measure it against the brute-force baseline.

100 TB note: brute-force reads the full corpus per query batch —
amortize by batching queries (one scan, many queries, still one
shuffle for the per-query top-k). IVF-style coarse quantization
(k-means cells) beats hyperplane LSH when vectors are clusterable;
the bucketing seam here (`bucket_exprs`) is where it plugs in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_samples_spark.operators.analytic import topk_per_group


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in DOUBLE (f32 promotes exactly; left-to-right fold)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 3
) -> DataFrame:
    """Exact cosine top-k. ``queries``/``corpus``: (vec_id, embedding).
    Output: (query_id, vec_id, cos) with deterministic tie-break on
    vec_id."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = corpus.select("vec_id", "embedding")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
        )
    )
    out = topk_per_group(scored, ["query_id"], [F.col("cos").desc(), F.col("vec_id")], k)
    return out.select("query_id", "vec_id", "cos", "rn")


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each table hashes a vector to an ``n_planes``-bit sign bucket;
    query and candidates meet only inside equal (table, bucket) pairs
    — the candidate-generation shuffle is bucket-local. Exact cosine
    re-scores candidates; recall vs the brute-force baseline rises
    with ``n_tables``.
    """
    import numpy as np

    dim = len(corpus.select("embedding").first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim))

    def bucket_col(emb: Column, table: int) -> Column:
        bits = []
        for p in range(n_planes):
            w = planes[table, p]
            dot = F.aggregate(
                F.zip_with(
                    emb,
                    F.array(*[F.lit(float(x)) for x in w]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        bucket = bits[0]
        for b in bits[1:]:
            bucket = bucket + b
        return bucket

    def with_buckets(df: DataFrame, id_alias: str) -> DataFrame:
        rows = []
        for t in range(n_tables):
            rows.append(
                df.select(
                    F.col("vec_id").alias(id_alias),
                    F.col("embedding").alias(f"{id_alias}_emb"),
                    F.lit(t).alias("table_id"),
                    bucket_col(F.col("embedding"), t).alias("bucket"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    qb = with_buckets(queries, "query_id")
    cb = with_buckets(corpus, "vec_id")
    candidates = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "query_id_emb", "vec_id", "vec_id_emb")
        .distinct()
    )
    scored = candidates.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("query_id_emb"), F.col("vec_id_emb")), 6).alias("cos"),
    )
    out = topk_per_group(scored, ["query_id"], [F.col("cos").desc(), F.col("vec_id")], k)
    return out.select("query_id", "vec_id", "cos", "rn")
