#!/usr/bin/env python
"""Scale probe: run the headline operator families on an AMPLIFIED
corpus (sf0.1 unioned ×N with shifted ids and deterministic word
perturbations) and record wall time + throughput next to the sf0.1
numbers, so "would this hold at 100 TB" is answered with a measured
scaling exponent instead of rhetoric.

The amplified copies are near-duplicates of each other by
construction — deliberately: that is the boilerplate-heavy corpus
shape dedup exists for, and it exercises the LSH hot-bucket cap.

Writes SCALE_PROBE.md. Run from the repo root:
    python scripts/scale_probe.py [N_amplify]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def amplify_docs(docs: DataFrame, n: int) -> DataFrame:
    """Union n id-shifted copies; copy k>0 drops every (k+2)-th word
    (a deterministic perturbation so copies are NEAR dups, J<1).
    Extra columns (lang/source/...) ride along unchanged; an
    n_chars column, if present, is recomputed for the perturbed
    text so the table keeps its n_chars == length(text) invariant."""
    out = []
    n_docs_hint = 1_000_000_000  # id-shift stride, far above any sf
    for k in range(n):
        c = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * n_docs_hint)
        ).withColumn(
            "text",
            F.when(F.lit(k == 0), F.col("text")).otherwise(
                F.array_join(
                    F.filter(
                        F.split(F.col("text"), " "),
                        lambda w, i: (i % (k + 2) != 0),
                    ),
                    " ",
                )
            ),
        )
        if "n_chars" in docs.columns:
            c = c.withColumn("n_chars", F.length("text").cast("long"))
        out.append(c)
    u = out[0]
    for c in out[1:]:
        u = u.unionByName(c)
    return u


def amplify_docs_disjoint(docs: DataFrame, n: int) -> DataFrame:
    """Union n id-shifted copies whose shingle sets are DISJOINT
    across copies: every WORD is prefixed with a copy-specific tag
    (``w → zq<k>z_w``), so no word k-gram is shared between copies and
    the corpus's near-dup rate stays CONSTANT as it grows — each copy
    reproduces the base corpus's internal near-dup structure, nothing
    more. Prefixing (vs the earlier marker-INTERLEAVING design) keeps
    the word count and the k-gram structure isomorphic to the base
    corpus: interleaved markers turned half of every doc's 3-gram
    shingles into ``[marker, word, marker]`` — effectively unigrams —
    which made unrelated docs collide (measured: 3.5M LSH candidates
    per 5k base docs vs 255 true pairs, a 64× blow-up to a ~200M-pair
    verify join that exhausted local disk). Copy 0 is tagged too, so
    small and big phases see the same text shape. This isolates PLAN
    scaling from the output quadratics that :func:`amplify_docs`'s
    deliberate near-dup copies create."""
    out = []
    n_docs_hint = 1_000_000_000
    for k in range(n):
        c = docs.select(
            (F.col("doc_id") + F.lit(k * n_docs_hint)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(F.lit(f"zq{k}z_"), w),
                ),
                " ",
            ).alias("text"),
        )
        out.append(c)
    u = out[0]
    for c in out[1:]:
        u = u.unionByName(c)
    return u


def main() -> None:
    n_amp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    if n_amp < 2:
        # fail FAST: with n_amp=1 the docs axis has rows_big ==
        # rows_small, so every docs-driven exponent divides by
        # log(1) == 0 — after the whole timed run has completed
        sys.exit("scale_probe: N_amplify must be >= 2")
    from flink_samples_spark.session import get_spark
    from flink_samples_spark.sources.readers import load_table

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    docs01 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    li01 = load_table(spark, sf_dir, "lineitem")
    ev01 = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )

    docs = amplify_docs(docs01, n_amp).localCheckpoint()  # materialize once
    docs_dj_small = amplify_docs_disjoint(docs01, 1).localCheckpoint()
    docs_dj_big = amplify_docs_disjoint(docs01, n_amp).localCheckpoint()
    li = li01
    for k in range(1, max(2, n_amp // 2)):
        li = li.unionByName(
            li01.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 10**12))
        )
    li = li.localCheckpoint()

    # events amplified by SHIFTING user_id per copy: per-key series
    # stay the same length, so per-key sequential ops (EWMA recursion,
    # CEP chains) scale by KEY parallelism — the axis that matters
    ev = ev01
    for k in range(1, max(2, n_amp // 2)):
        ev = ev.unionByName(
            ev01.withColumn("user_id", F.col("user_id") + F.lit(k * 10**9))
            .withColumn("event_id", F.col("event_id") + F.lit(k * 10**12))
        )
    ev = ev.localCheckpoint()

    emb01 = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = emb01
    for k in range(1, max(2, n_amp // 2)):
        emb = emb.unionByName(
            emb01.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10**9))
        )
    emb = emb.localCheckpoint()

    # signature indexes PRE-BUILT (the ingestion-dedup scale claim is
    # about per-batch cost against an EXISTING index, not index build)
    from flink_samples_spark.llmops.dedup import build_dedup_index

    idx_small = build_dedup_index(docs01, k=3).localCheckpoint()
    idx_big = build_dedup_index(docs, k=3).localCheckpoint()
    spark.catalog.clearCache()  # drop the builds' shingle caches

    n_docs_small, n_docs_big = docs01.count(), docs.count()
    n_li_small, n_li_big = li01.count(), li.count()
    n_ev_small, n_ev_big = ev01.count(), ev.count()
    n_emb_small, n_emb_big = emb01.count(), emb.count()

    def probes(
        d: DataFrame,
        l: DataFrame,
        e: DataFrame,
        em: DataFrame,
        idx: DataFrame,
        ddj: DataFrame,
    ) -> "dict[str, object]":
        # EVERY value is a zero-arg thunk that CONSTRUCTS the operator
        # plan and noop-materializes it. Construction must happen
        # inside the timed window: operators register .cache()/
        # .persist() marks with the CacheManager at construction time,
        # and run()'s cold-cache clearCache() UNREGISTERS marks that
        # already exist — a pre-built plan would therefore execute
        # cache-DISABLED (its upstream re-runs once per consumer, a
        # shape no production cold run has), while a thunk re-registers
        # its caches fresh after the clear: registered but empty,
        # exactly the production cold state. (Thunks also naturally
        # include driver-side construction work like PCA's
        # partial-Gram collect and IVF's k-means sample.)
        from flink_samples_spark.llmops.chunking import chunk_documents
        from flink_samples_spark.llmops.dedup import (
            exact_dedup,
            minhash_lsh_pairs,
            span_dedup,
            within_doc_span_dedup,
        )
        from flink_samples_spark.llmops.text import lm_bigram_score, quality_ensemble
        from flink_samples_spark.operators.behavior import detect_sequence
        from flink_samples_spark.operators.timeseries import ewma

        def _noop(df: DataFrame) -> None:
            df.write.format("noop").mode("overwrite").save()

        def lang_stub() -> DataFrame:
            return d.withColumn("lang", F.lit("xx")).withColumn(
                "source", F.lit("amp")
            ).withColumn("n_chars", F.length("text"))

        return {
            "exact_dedup": lambda: _noop(exact_dedup(lang_stub())),
            "span_dedup": lambda: _noop(span_dedup(d, span_words=8, df_threshold=3)),
            "within_doc_dedup": lambda: _noop(within_doc_span_dedup(d)),
            "minhash_lsh_pairs": lambda: _noop(minhash_lsh_pairs(d)),
            # constant-dup-rate variant: copies are shingle-disjoint,
            # so this row measures the PLAN's scaling; the row above
            # measures a duplicate-saturated corpus whose pair OUTPUT
            # grows quadratically by construction
            "minhash_lsh_disjoint": lambda: _noop(minhash_lsh_pairs(ddj)),
            "lm_bigram_score": lambda: _noop(lm_bigram_score(d)),
            "quality_ensemble": lambda: _noop(quality_ensemble(d)),
            "chunk_documents": lambda: _noop(
                chunk_documents(d, chunk_words=32, stride=24)
            ),
            "agg_q1_shape": lambda: _noop(
                l.groupBy("l_returnflag", "l_linestatus").agg(
                    F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1))
                )
            ),
            "ewma_per_key": lambda: _noop(
                ewma(e.select("event_id", "user_id", "ts", "value"))
            ),
            "cep_pattern_seq": lambda: _noop(
                detect_sequence(
                    e.select("user_id", "event_type", "ts"),
                    ["click", "error", "purchase"],
                    within_seconds=7200,
                )
            ),
            "join_smj_self": lambda: _noop(
                l.alias("a")
                .join(
                    l.select(
                        "l_orderkey", F.col("l_quantity").alias("q2")
                    ).alias("b").hint("merge"),
                    "l_orderkey",
                )
                .groupBy("l_returnflag")
                .count()
            ),
            # round-5 certification families
            "pca_fit_project": _pca_thunk(em),
            # ANN similarity family: a FIXED 64-query batch against the
            # small vs amplified corpus — the scaling axis is CORPUS
            # size. Expected shape is ≲1.0 (both are one narrow
            # full-corpus scan — bucket/cell assignment — plus
            # candidate rescoring bounded by bucket/cell locality),
            # NOT the |Q|·N pair blow-up of the brute baseline; the
            # probe pins that the approximate paths stay scan-shaped.
            "ann_lsh_topk": _ann_thunk("lsh", _ann_queries(emb01), em),
            "ann_ivf_topk": _ann_thunk("ivf", _ann_queries(emb01), em),
            # ingestion dedup of a FIXED batch (the base docs) against
            # the pre-built index — scaling axis is INDEX size; the
            # 100 TB claim is per-batch cost ≪ O(corpus)
            "dedup_vs_index": _index_thunk(d0=docs01, idx=idx),
        }

    def _ann_queries(em01: DataFrame) -> DataFrame:
        # deterministic fixed query batch: the 64 lowest base vec_ids
        # (orderBy before limit — a bare limit follows partition order)
        return em01.orderBy("vec_id").limit(64)

    def _ann_call(kind: str, q: DataFrame, em: DataFrame, k: int) -> DataFrame:
        # the ENGINE'S operating point (catalog_llmops.py
        # q_sim_topk_lsh/_ivf: 4 planes × 12 tables, n_probe 6) — the
        # r8 probe timed the library defaults (8×4 / probe-4), a
        # configuration no registered query runs; held-out recall
        # exposed the mismatch (defaults: lsh 0.51 / ivf 0.79 at 4×;
        # registered params: 0.96 / 0.90). Timing and recall both
        # measure what ships.
        from flink_samples_spark.llmops.similarity import (
            ivf_cosine_topk,
            lsh_bucketed_topk,
        )

        if kind == "ivf":
            return ivf_cosine_topk(q, em, k=k, n_probe=6)
        return lsh_bucketed_topk(q, em, k=k, n_planes=4, n_tables=12)

    def _ann_thunk(kind: str, q: DataFrame, em: DataFrame):
        def go() -> None:
            _ann_call(kind, q, em, k=3).write.format("noop").mode(
                "overwrite"
            ).save()

        return go

    def _pca_thunk(em: DataFrame):
        def go() -> None:
            from flink_samples_spark.llmops.clustering import pca_fit, pca_project

            _n, mu, _ev, comp, _tr = pca_fit(em, k=4)
            pca_project(em, mu, comp).write.format("noop").mode("overwrite").save()

        return go

    def _index_thunk(d0: DataFrame, idx: DataFrame):
        def go() -> None:
            from flink_samples_spark.llmops.dedup import dedup_against_index

            dedup_against_index(d0, idx, k=3, threshold=0.8).write.format(
                "noop"
            ).mode("overwrite").save()

        return go

    def run(qs: "dict[str, object]", timed: bool = True) -> dict[str, float]:
        t = {}
        for name, thunk in qs.items():
            # COLD-cache timing: operators persist()/cache()
            # intermediates (shingle hashes, the salt-mode grouped
            # bucket table), and Spark's CacheManager serves any
            # later identical canonical plan from those entries —
            # a warm second run measures only the post-cache tail,
            # and the cached fraction differs between sizes, which
            # corrupts the exponent (measured: minhash small-phase
            # 0.67 s warm vs ~1.8 s cold). The 100 TB claim is
            # about cold production runs, so time those. The clear
            # runs before EVERY pass (warm-up too) so every thunk
            # constructs and registers its caches from the same
            # empty state; the thunk's fresh construction after the
            # clear is what keeps the cache PLAN active (a pre-built
            # plan would have had its cache marks unregistered by the
            # clear and execute cache-disabled — re-running its
            # upstream once per consumer, a shape no production cold
            # run has).
            spark.catalog.clearCache()
            print(f"[probe] {name} ({'timed' if timed else 'warmup'})", flush=True)
            t0 = time.time()
            thunk()
            t[name] = time.time() - t0
        return t

    # full warm-up pass at each size (JVM JIT + python worker pool +
    # shuffle services), then time the SECOND run of each cold
    run(probes(docs01, li01, ev01, emb01, idx_small, docs_dj_small), timed=False)
    spark.catalog.clearCache()
    small = run(probes(docs01, li01, ev01, emb01, idx_small, docs_dj_small))
    # drop the small phase's operator caches before the big phase: at
    # 64× amplification the accumulated shingle-hash caches from four
    # probe passes exhausted a 24g heap mid-run. Within-phase warm-up
    # cache reuse (same canonical plans) is preserved — both sizes get
    # identical treatment, so exponents stay comparable.
    spark.catalog.clearCache()
    run(probes(docs, li, ev, emb, idx_big, docs_dj_big), timed=False)
    spark.catalog.clearCache()
    big = run(probes(docs, li, ev, emb, idx_big, docs_dj_big))

    import math

    # ANN recall@10 at the AMPLIFIED size (round-7 verdict #5): the
    # timing rows above prove the approximate paths stay scan-shaped,
    # but a fast index that stops finding neighbors at 64k vectors
    # would pass them silently. Measure recall of both approximate
    # paths against brute force on the SAME fixed 64-query batch and
    # the big corpus. A hit = the ANN pick is in the brute top-10 OR
    # EQUALS the brute 10th score exactly (the amplified corpus is
    # full of exact-duplicate vectors, so equal-cosine tie
    # permutations at the cut are legitimate, not recall loss — but
    # only exact equality of the rounded scores counts; a >= clause
    # would also credit picks that merely round up to the kth value).
    def _heldout_queries() -> DataFrame:
        # HELD-OUT query batch (round-8 verdict #2): the member batch
        # above flatters recall — a corpus member trivially lands in
        # its own LSH buckets / IVF cell. Perturb the same 64 base
        # vectors at a PINNED relative noise level (noise norm = 0.25
        # of the vector norm → cos(q, q') ≈ 0.97) with a per-vector
        # fixed seed, and give them ids outside every corpus id range
        # (base ids + k·10^9 shifts never reach 5·10^14), so recall
        # measures the routing of genuinely NON-member queries.
        import numpy as np

        rows = _ann_queries(emb01).collect()
        out = []
        for r in rows:
            v = np.asarray(r.embedding, dtype=np.float64)
            rng = np.random.RandomState(100003 + int(r.vec_id))
            noise = rng.normal(size=v.shape)
            noise *= 0.25 * (np.linalg.norm(v) / (np.linalg.norm(noise) + 1e-12))
            out.append(
                (int(r.vec_id) + 5 * 10**14, [float(x) for x in v + noise])
            )
        return spark.createDataFrame(out, "vec_id bigint, embedding array<double>")

    def _ann_recall_at(q: DataFrame, k_rec: int = 10) -> "dict[str, float]":
        from flink_samples_spark.llmops.similarity import brute_force_cosine_topk

        spark.catalog.clearCache()
        brute = {}
        for r in brute_force_cosine_topk(q, emb, k=k_rec).collect():
            brute.setdefault(r.query_id, []).append((r.vec_id, r.cos))
        out = {}
        for name in ("lsh", "ivf"):
            spark.catalog.clearCache()
            got = {}
            for r in _ann_call(name, q, emb, k=k_rec).collect():
                got.setdefault(r.query_id, []).append((r.vec_id, r.cos))
            hits = total = 0
            for qid, truth in brute.items():
                ids = {v for v, _ in truth}
                kth = min(c for _, c in truth)
                for v, c in got.get(qid, []):
                    hits += 1 if (v in ids or c == kth) else 0
                total += len(truth)
            out[name] = hits / max(total, 1)
        return out

    print("[probe] ann recall@10 at amplified size (member batch)", flush=True)
    ann_recall = _ann_recall_at(_ann_queries(emb01), 10)
    print("[probe] ann recall@10 at amplified size (held-out batch)", flush=True)
    ann_recall_ho = _ann_recall_at(_heldout_queries(), 10)

    amp_rows = {  # rows driving each probe
        k: (n_li_small, n_li_big)
        if k in ("agg_q1_shape", "join_smj_self")
        else (n_ev_small, n_ev_big)
        if k in ("ewma_per_key", "cep_pattern_seq")
        else (n_emb_small, n_emb_big)
        if k in ("pca_fit_project", "ann_lsh_topk", "ann_ivf_topk")
        else (n_docs_small, n_docs_big)  # dedup_vs_index scales by INDEX rows
        for k in small
    }
    exps = {
        k: math.log(max(big[k], 1e-9) / max(small[k], 1e-9))
        / math.log(amp_rows[k][1] / amp_rows[k][0])
        for k in small
    }
    flagged = sorted(k for k, e in exps.items() if e > 1.1)
    flag_note = (
        "(currently: " + ", ".join(flagged) + ")" if flagged else "(none)"
    )
    lines = [
        "# SCALE_PROBE — measured scaling of the headline operator families",
        "",
        f"Amplified corpus: documents ×{n_amp} ({n_docs_small:,} → "
        f"{n_docs_big:,} docs; copies are deliberate near-dups), lineitem "
        f"×{max(2, n_amp // 2) } ({n_li_small:,} → {n_li_big:,} rows, "
        f"disjoint keys), events ×{max(2, n_amp // 2)} "
        f"({n_ev_small:,} → {n_ev_big:,}, shifted user keys — per-key"
        " series length constant). local[32]; times are"
        " noop-materialized wall",
        "seconds. `exp` = log(time ratio)/log(rows ratio): 1.0 is linear,",
        "<1 means fixed costs still dominate at this size, >1.1 would flag",
        f"a superlinear operator {flag_note}. One row is EXPECTED to sit",
        "at ~1.0 ± host noise: `minhash_lsh_pairs` runs on this table's",
        "deliberately duplicate-saturated amplification, so its verified",
        "pair OUTPUT grows quadratically by construction (bounded per",
        "task by salting) — its exponent measures that output, not the",
        "plan; `minhash_lsh_disjoint` is the SAME operator on a",
        "constant-dup-rate amplification (per-copy word prefixes keep",
        "copies shingle-disjoint) and carries the plan-scaling claim.",
        "`pca_fit_project` runs over the",
        f"embeddings table amplified ×{max(2, n_amp // 2)}, as do the",
        "`ann_*_topk` rows (a FIXED 64-query batch against the growing",
        "corpus — the axis is corpus size; both paths are one narrow",
        "assignment scan + bucket/cell-local rescoring); `dedup_vs_index`",
        "dedups a FIXED 1-batch corpus against the small vs the amplified",
        "pre-built signature index, so its exponent measures how per-batch",
        "ingestion cost grows with INDEX size (the 100 TB ingestion claim:",
        "well below linear).",
        "",
        "| operator | rows small→big | t(small) s | t(big) s | exp |",
        "|---|---|---|---|---|",
    ]
    for k in small:
        rs, rb = amp_rows[k]
        lines.append(
            f"| {k} | {rs:,} → {rb:,} | {small[k]:.2f} | {big[k]:.2f} | {exps[k]:.2f} |"
        )
    lines += [
        "",
        f"ANN recall@10 at the amplified size ({n_emb_big:,} vectors, same"
        " fixed 64-query batch, ties at the brute 10th score count as"
        f" hits): lsh = **{ann_recall['lsh']:.3f}**, ivf ="
        f" **{ann_recall['ivf']:.3f}** (floor: >= 0.8; the small-sf"
        " pytest recall floors remain in tests/test_llmops.py). Both"
        " the timing rows and the recall rows run the ENGINE'S"
        " registered parameters (LSH 4 planes × 12 tables, IVF"
        " n_probe 6 — catalog_llmops.py), not the library defaults:"
        " held-out recall at the defaults measured 0.51/0.79, which"
        " is the configuration gap the r8 member-only batch hid.",
        "",
        "HELD-OUT recall@10 (the honest-hard batch: the 64 base query"
        " vectors perturbed at a pinned noise level — cos(q, q') ≈ 0.97"
        " — with ids outside every corpus id range, so no query is a"
        " corpus member and none trivially lands in its own bucket):"
        f" lsh = **{ann_recall_ho['lsh']:.3f}**, ivf ="
        f" **{ann_recall_ho['ivf']:.3f}** (floor: >= 0.8).",
        "",
        "Generated by `python scripts/scale_probe.py` (re-run to refresh).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROBE.md")
    # preserve the sf1 headline-probe section (scripts/sf1_probe.py
    # owns the span between its markers) across regenerations
    sf1_section = ""
    if os.path.exists(out):
        prev = open(out).read()
        if "<!-- sf1-probe:start -->" in prev and "<!-- sf1-probe:end -->" in prev:
            sf1_section = (
                "\n"
                + "<!-- sf1-probe:start -->"
                + prev.split("<!-- sf1-probe:start -->")[1].split(
                    "<!-- sf1-probe:end -->"
                )[0]
                + "<!-- sf1-probe:end -->\n"
            )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + sf1_section)
    print("\n".join(lines))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
