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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_samples_spark.operators.analytic import topk_per_group
from flink_samples_spark.utils import parallelize_narrow


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in DOUBLE (f32 promotes exactly; left-to-right fold)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    """2-norm floored at 1e-12: an all-zero or empty embedding row
    must score cos≈0, not throw DIVIDE_BY_ZERO under Spark 4's
    default ANSI mode and kill the whole job. The floor never changes
    a nonzero vector's cosine (real norms are ≫ 1e-12)."""
    return F.greatest(F.sqrt(_dot(a, a)), F.lit(1e-12))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 3
) -> DataFrame:
    """Exact cosine top-k. ``queries``/``corpus``: (vec_id, embedding).
    Output: (query_id, vec_id, cos) with deterministic tie-break on
    vec_id."""
    # norms are computed ONCE PER ROW on each side of the join (a
    # Project below a Join is never collapsed into the pair-level
    # projection), not once per pair — at |Q|·N pairs that is the
    # difference between 1× and 3× the HOF work
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
    )
    c = parallelize_narrow(corpus.select("vec_id", "embedding")).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cos"),
        )
    )
    out = topk_per_group(scored, ["query_id"], [F.col("cos").desc(), F.col("vec_id")], k)
    return out.select("query_id", "vec_id", "cos", "rn")


def _f64(emb: Column) -> Column:
    return F.transform(emb, lambda x: x.cast("double"))


def _int8_scale(vd: Column) -> Column:
    """``max|x| / 127`` floored at 1e-12 — ONE definition shared by
    quantize_int8 and dequantize_int8: the int8 recall invariant
    (q_sim_topk_int8) depends on encode and decode using bit-identical
    scale/round arithmetic, so the expressions must not drift apart."""
    return (
        F.greatest(F.array_max(F.transform(vd, lambda x: F.abs(x))), F.lit(1e-12))
        / F.lit(127.0)
    )


def _int8_round(x: Column, scale: Column) -> Column:
    """Round-half-up (toward +infinity) ``floor(x/scale + 0.5)``:
    floor(-2.5 + 0.5) = -2, not -3 — see _int8_scale. Quantize and
    dequantize share this one definition, so it is self-consistent."""
    return F.floor(x / scale + F.lit(0.5))


def quantize_int8(corpus: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the standard
    4× storage/bandwidth cut before ANN indexing (an f32 corpus's
    embedding column dominates shuffle volume at 100 TB; int8 + one
    f64 scale per vector moves a quarter of the bytes at <0.5% cosine
    error for unit-ish vectors).

    ``q_i = floor(x_i / scale + 0.5)`` with ``scale = max|x| / 127``,
    so q ∈ [-127, 127] with no clamp branch. All JVM higher-order
    functions in one codegen'd projection — narrow map, no shuffle, no
    Python. Summary stats instead of the raw array keep the output
    engine-portable: (vec_id, n_dims, scale_r, q_sum, q_l1,
    max_abs_err_r) pin the quantized vector exactly (q_sum/q_l1 are
    integer-exact) plus the reconstruction-error bound.
    """
    base = corpus.select("vec_id", _f64(F.col("embedding")).alias("vd"))
    scaled = base.select("vec_id", "vd", _int8_scale(F.col("vd")).alias("scale"))
    q = F.transform(F.col("vd"), lambda x: _int8_round(x, F.col("scale")))
    quant = scaled.select("vec_id", "vd", "scale", q.alias("qs"))
    # guard the empty-embedding row: sequence(1, 0) is the DESCENDING
    # array [1, 0] (not empty), so element_at would throw
    # INVALID_ARRAY_INDEX and one malformed row would kill the job
    err = F.when(F.size(F.col("vd")) == 0, F.array().cast("array<double>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("vd"))),
            lambda i: F.abs(
                F.element_at(F.col("vd"), i)
                - F.element_at(F.col("qs"), i).cast("double") * F.col("scale")
            ),
        )
    )
    return quant.select(
        "vec_id",
        F.size("vd").cast("bigint").alias("n_dims"),
        F.round(F.col("scale"), 9).alias("scale_r"),
        F.aggregate("qs", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            "qs", F.lit(0).cast("bigint"), lambda a, x: a + F.abs(x)
        ).alias("q_l1"),
        F.round(F.array_max(err), 9).alias("max_abs_err_r"),
    )


def cosine_pairs(corpus: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cos ≥ threshold) —
    exact all-pairs baseline. O(N²/2) scoring: right for dedup of a
    candidate subset or small corpus; at full scale generate
    candidates with :func:`lsh_bucketed_topk`'s bucketing (or IVF
    cells) first and rescore only within buckets."""
    # per-row norms below the join (computed N times, not N²/2 times)
    normed = parallelize_narrow(corpus.select("vec_id", "embedding")).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
    )
    a = normed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = normed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    # filter on the RAW cosine (bit-identical across engines), round
    # only for output — a rounded filter would disagree with the
    # oracle on values straddling the rounding boundary
    scored = pairs.select(
        "vec_a",
        "vec_b",
        (_dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))).alias(
            "cos_raw"
        ),
    )
    return scored.filter(F.col("cos_raw") >= threshold).select(
        "vec_a", "vec_b", F.round("cos_raw", 6).alias("cos")
    )


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    kmeans_sample: int = 2000,
    kmeans_iters: int = 10,
) -> DataFrame:
    """IVF-style approximate cosine top-k: coarse k-means cells
    (trained driver-side on a deterministic sample), candidates only
    from the query's ``n_probe`` nearest cells, exact rescoring after.

    The scale shape: corpus partitions by cell (one shuffle), each
    query touches n_probe/n_cells of the data. Beats hyperplane LSH
    when vectors cluster; recall is measured against brute force in
    tests."""
    import numpy as np

    # orderBy before limit: a bare limit().collect() follows partition
    # layout, which is not deterministic across repartitionings
    sample_rows = (
        corpus.select("vec_id", "embedding").orderBy("vec_id").limit(kmeans_sample).collect()
    )
    if not sample_rows:  # empty corpus → empty result, same schema
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, vec_id bigint, cos double, rn int"
        )
    sample = np.array([r.embedding for r in sample_rows], dtype=np.float64)
    sample /= np.linalg.norm(sample, axis=1, keepdims=True) + 1e-12
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(kmeans_iters):
        sims = sample @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / (np.linalg.norm(v) + 1e-12)

    cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark = corpus.sparkSession
    # centroid norms evaluated ONCE per centroid (16 rows) with the
    # same JVM fold the per-pair expression used — bit-identical sims,
    # n_cells× less norm work on the hot assignment stage. (They are
    # ~1.0 by construction, but dividing by the exact JVM value keeps
    # argmax ties deterministic across the refactor.)
    cent_df = spark.createDataFrame(
        cent_rows, "cell int, centroid array<double>"
    ).select("cell", "centroid", _norm(F.col("centroid")).alias("c_norm"))

    def cell_sim(emb: Column, emb_norm: Column, cent: Column, c_norm: Column) -> Column:
        return _dot(emb, cent) / (emb_norm * c_norm)

    # corpus → best cell (argmax over broadcast centroids, JVM-side);
    # the row's own norm is hoisted BELOW the join — computed once per
    # row, not once per (row, centroid) pair
    c_normed = corpus.select("vec_id", "embedding", _norm(F.col("embedding")).alias("e_norm"))
    c_scored = c_normed.crossJoin(F.broadcast(cent_df)).select(
        "vec_id",
        "embedding",
        "cell",
        cell_sim(F.col("embedding"), F.col("e_norm"), F.col("centroid"), F.col("c_norm")).alias("sim"),
    )
    w_best = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    c_cells = (
        c_scored.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell")
    )
    # queries → n_probe nearest cells
    q_normed = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
    )
    q_scored = q_normed.crossJoin(F.broadcast(cent_df)).select(
        "query_id",
        "q_emb",
        "cell",
        cell_sim(F.col("q_emb"), F.col("q_norm"), F.col("centroid"), F.col("c_norm")).alias("sim"),
    )
    w_q = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell"))
    q_cells = (
        q_scored.withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_emb", "cell")
    )
    candidates = c_cells.join(F.broadcast(q_cells), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    # no distinct(): each corpus vector lives in exactly ONE cell
    # (rn == 1), so a (query, vec) pair is produced at most once —
    # a dedup here would be a full extra shuffle of the candidate set
    # deduplicating nothing (unlike the multi-table LSH path, where
    # the same pair can surface from several tables)
    scored = candidates.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
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

    # dimension from an AGGREGATE, not first(): first() follows
    # partition order (nondeterministic), crashes on a NULL embedding
    # row, and a single short row would size the planes wrong —
    # null-padding every zip_with dot and collapsing ALL vectors into
    # bucket 0 (the all-pairs blowup this function exists to avoid)
    dim = corpus.select(F.max(F.size("embedding"))).first()[0]
    if dim is None or dim <= 0:  # empty corpus → empty result, same schema
        # rn is INT to match the non-empty path (row_number's type) —
        # a bigint here would make unions across partitions fail
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [], "query_id bigint, vec_id bigint, cos double, rn int"
        )
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


def dequantize_int8(corpus: DataFrame) -> DataFrame:
    """Reconstruct the embedding column from its int8 quantization
    (``round(x/scale)·scale``) — what an ANN index built over the
    quantized corpus actually scores against. Narrow JVM map; pairs
    with :func:`quantize_int8` (same scale/round arithmetic)."""
    v = _f64(F.col("embedding"))
    base = corpus.select("vec_id", v.alias("vd"), _int8_scale(v).alias("scale"))
    recon = F.transform(
        F.col("vd"), lambda x: _int8_round(x, F.col("scale")) * F.col("scale")
    )
    return base.select("vec_id", recon.alias("embedding"))
