"""Round-4 operator semantics: merge_upsert algebra, reshape plans.

The catalog oracles pin the query-level results; these tests pin the
operator-level properties a user relies on when composing them
outside the catalog.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_samples_spark.operators import merge_upsert, pivot_agg, unpivot


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_upsert_insert_update_delete(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "upsert"), (3, None, "delete"), (9, "i", "upsert")],
        "k bigint, v string, op string",
    )
    out = merge_upsert(target, changes, "k")
    assert _rows(out) == [(1, "a"), (2, "B"), (9, "i")]


def test_merge_upsert_batched_composition_equals_one_shot(spark):
    """Applying a change-set split into batches (disjoint keys) must
    equal applying it at once — the invariant q_stream_upsert's
    micro-batch fold relies on."""
    target = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k bigint, v string"
    )
    changes = spark.createDataFrame(
        [(i, f"u{i}", "upsert") for i in range(0, 20, 4)]
        + [(i, None, "delete") for i in range(1, 20, 4)]
        + [(100 + i, f"n{i}", "upsert") for i in range(3)],
        "k bigint, v string, op string",
    )
    one_shot = merge_upsert(target, changes, "k")
    folded = target
    for part in (
        changes.filter(F.col("k") < 8),
        changes.filter((F.col("k") >= 8) & (F.col("k") < 100)),
        changes.filter(F.col("k") >= 100),
    ):
        folded = merge_upsert(folded, part, "k")
    assert _rows(folded) == _rows(one_shot)


def test_merge_upsert_is_idempotent_for_upserts(spark):
    """Replaying the same upsert-only change-set is a no-op — the
    at-least-once delivery safety of the streaming sink."""
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    ch = spark.createDataFrame(
        [(2, "B", "upsert"), (5, "e", "upsert")], "k bigint, v string, op string"
    )
    once = merge_upsert(target, ch, "k")
    twice = merge_upsert(once, ch, "k")
    assert _rows(twice) == _rows(once)


def test_merge_upsert_plan_broadcasts_changes(spark, sf_dir):
    """The snapshot side must NOT shuffle: change keys broadcast to
    the anti join."""
    from flink_samples_spark.sources.readers import load_table

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    ch = c.limit(10).withColumn("op", F.lit("upsert"))
    plan = merge_upsert(c, ch, "c_custkey")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]


def test_pivot_plans_single_aggregate(spark, sf_dir):
    """A pinned value domain must plan as ONE aggregate pass (each
    bucket a conditional agg), not one scan per value."""
    from flink_samples_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders")
    wide = pivot_agg(
        o, ["o_orderpriority"], "o_orderstatus", ["O", "F", "P"], F.count(F.lit(1))
    )
    plan = wide._jdf.queryExecution().executedPlan().toString()
    # one partial + one final HashAggregate pair; a per-value plan
    # would repeat the FileScan
    assert plan.count("FileScan") == 1, plan[:2000]


def test_unpivot_roundtrips_through_pivot_shape(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 30.0, 40.0)], "k bigint, m1 double, m2 double"
    )
    long = unpivot(df, ["k"], ["m1", "m2"], "var", "val")
    assert _rows(long) == [
        (1, "m1", 10.0), (1, "m2", 20.0), (2, "m1", 30.0), (2, "m2", 40.0),
    ]
    # narrow expand: no Exchange in the plan
    plan = long._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tfidf_score_and_topk_semantics(spark):
    """Score = tf·N/df exactly; top-k keeps the k highest-scoring
    terms per doc with term-text tie-break; tf/df are exact counts."""
    from flink_samples_spark.llmops.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry date"),
            (3, "apple date date date"),
        ],
        "doc_id bigint, text string",
    )
    n_docs = 3
    rows = tfidf_top_terms(docs, top=100).collect()
    for r in rows:
        assert r["score"] == round(r["tf"] * n_docs / r["df"], 6)
    # doc 3: date tf=3 df=2 -> 4.5; apple tf=1 df=2 -> 1.5
    d3 = {r["term"]: r for r in rows if r["doc_id"] == 3}
    assert d3["date"]["score"] == 4.5 and d3["apple"]["score"] == 1.5
    top1 = {r["doc_id"]: r["term"] for r in tfidf_top_terms(docs, top=1).collect()}
    assert top1[3] == "date"
    # doc 1: apple tf=2 df=2 -> 3.0 beats banana/cherry (1.5)
    assert top1[1] == "apple"


def test_global_order_index_matches_naive_window(spark):
    from flink_samples_spark.operators import global_order_index
    from pyspark.sql import Window

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 37 % 101).alias("key")
    )
    out = global_order_index(df, [F.col("key"), F.col("k")], "pos")
    naive = df.withColumn(
        "pos", F.row_number().over(Window.orderBy("key", "k")).cast("bigint")
    )
    assert _rows(out.select("k", "key", "pos")) == _rows(naive.select("k", "key", "pos"))
    # partition-count invariance: same result from a different input layout
    out2 = global_order_index(df.repartition(7), [F.col("key"), F.col("k")], "pos")
    assert _rows(out2.select("k", "key", "pos")) == _rows(naive.select("k", "key", "pos"))


def test_global_prefix_sum_matches_naive_window(spark):
    from flink_samples_spark.operators import global_prefix_sum
    from pyspark.sql import Window

    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 101).alias("key"),
        (F.col("id") % 13 + 1).alias("v"),
    )
    out = global_prefix_sum(df, [F.col("key"), F.col("k")], "v", "run")
    w = Window.orderBy("key", "k").rowsBetween(Window.unboundedPreceding, 0)
    naive = df.withColumn("run", F.sum("v").over(w))
    assert _rows(out.select("k", "run")) == _rows(naive.select("k", "run"))


def test_total_order_ops_avoid_single_partition_data_window(spark):
    """The data-sized window must be partitioned (by the range
    partition id); only the n_partitions-row offsets frame may use a
    global window. Detect by checking every Window node in the plan
    that sorts the DATA carries a partition spec."""
    from flink_samples_spark.operators import global_order_index

    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = global_order_index(df, [F.col("k")], "pos")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the intra-partition window must be keyed by the pid column
    assert "windowspecdefinition(__to_pid" in plan.replace(" ", "").lower() or \
        "__to_pid" in plan, plan[:3000]


def test_pca_matches_single_node_numpy(spark, sf_dir):
    """Distributed PCA (batch-partial Gram + one slot-sum shuffle)
    must reproduce single-node numpy PCA: same eigenvalues, same
    subspace (components equal up to per-column sign)."""
    import numpy as np

    from flink_samples_spark.llmops.clustering import pca_fit, pca_project
    from flink_samples_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n, mu, lam, W, trace = pca_fit(emb, k=4)

    X = np.stack([r["embedding"] for r in emb.select("embedding").collect()])
    assert n == len(X)
    mu_ref = X.mean(axis=0)
    cov_ref = np.cov(X, rowvar=False, bias=True)
    ev_ref, evec_ref = np.linalg.eigh(cov_ref)
    order = np.argsort(ev_ref)[::-1][:4]
    assert np.allclose(mu, mu_ref, atol=1e-9)
    assert np.allclose(lam, ev_ref[order], rtol=1e-8, atol=1e-9)
    assert abs(trace - np.trace(cov_ref)) < 1e-7
    # subspace match: |W_dist . W_ref| == I (per-column sign freedom)
    M = np.abs(np.asarray(W).T @ evec_ref[:, order])
    assert np.allclose(M, np.eye(4), atol=1e-6), M
    # projected variance equals the eigenvalues (distributed check)
    proj = pca_project(emb, mu, W)
    row = proj.agg(
        *[F.var_pop(F.element_at("scores", i + 1)).alias(f"v{i}") for i in range(4)]
    ).first()
    assert np.allclose([row[f"v{i}"] for i in range(4)], lam, rtol=1e-8)
