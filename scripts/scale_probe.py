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
    (a deterministic perturbation so copies are NEAR dups, J<1)."""
    base = docs.select("doc_id", "text")
    out = []
    n_docs_hint = 1_000_000_000  # id-shift stride, far above any sf
    for k in range(n):
        c = base.select(
            (F.col("doc_id") + F.lit(k * n_docs_hint)).alias("doc_id"),
            F.when(F.lit(k == 0), F.col("text"))
            .otherwise(
                F.array_join(
                    F.filter(
                        F.split(F.col("text"), " "),
                        lambda w, i: (i % (k + 2) != 0),
                    ),
                    " ",
                )
            )
            .alias("text"),
        )
        out.append(c)
    u = out[0]
    for c in out[1:]:
        u = u.unionByName(c)
    return u


def main() -> None:
    n_amp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
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

    n_docs_small, n_docs_big = docs01.count(), docs.count()
    n_li_small, n_li_big = li01.count(), li.count()
    n_ev_small, n_ev_big = ev01.count(), ev.count()

    def probes(d: DataFrame, l: DataFrame, e: DataFrame) -> dict[str, DataFrame]:
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

        lang_stub = d.withColumn("lang", F.lit("xx")).withColumn(
            "source", F.lit("amp")
        ).withColumn("n_chars", F.length("text"))
        return {
            "exact_dedup": exact_dedup(lang_stub),
            "span_dedup": span_dedup(d, span_words=8, df_threshold=3),
            "within_doc_dedup": within_doc_span_dedup(d),
            "minhash_lsh_pairs": minhash_lsh_pairs(d),
            "lm_bigram_score": lm_bigram_score(d),
            "quality_ensemble": quality_ensemble(d),
            "chunk_documents": chunk_documents(d, chunk_words=32, stride=24),
            "agg_q1_shape": l.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1))
            ),
            "ewma_per_key": ewma(
                e.select("event_id", "user_id", "ts", "value")
            ),
            "cep_pattern_seq": detect_sequence(
                e.select("user_id", "event_type", "ts"),
                ["click", "error", "purchase"],
                within_seconds=7200,
            ),
            "join_smj_self": l.alias("a")
            .join(
                l.select(
                    "l_orderkey", F.col("l_quantity").alias("q2")
                ).alias("b").hint("merge"),
                "l_orderkey",
            )
            .groupBy("l_returnflag")
            .count(),
        }

    def run(qs: dict[str, DataFrame]) -> dict[str, float]:
        t = {}
        for name, df in qs.items():
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t[name] = time.time() - t0
        return t

    # full warm-up pass at each size (JVM JIT + python worker pool +
    # shuffle services), then time the SECOND run of each
    run(probes(docs01, li01, ev01))
    small = run(probes(docs01, li01, ev01))
    run(probes(docs, li, ev))
    big = run(probes(docs, li, ev))

    import math

    amp_rows = {  # rows driving each probe
        k: (n_li_small, n_li_big)
        if k in ("agg_q1_shape", "join_smj_self")
        else (n_ev_small, n_ev_big)
        if k in ("ewma_per_key", "cep_pattern_seq")
        else (n_docs_small, n_docs_big)
        for k in small
    }
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
        "a superlinear operator (none).",
        "",
        "| operator | rows small→big | t(small) s | t(big) s | exp |",
        "|---|---|---|---|---|",
    ]
    for k in small:
        rs, rb = amp_rows[k]
        exp = math.log(max(big[k], 1e-9) / max(small[k], 1e-9)) / math.log(rb / rs)
        lines.append(
            f"| {k} | {rs:,} → {rb:,} | {small[k]:.2f} | {big[k]:.2f} | {exp:.2f} |"
        )
    lines += [
        "",
        "Generated by `python scripts/scale_probe.py` (re-run to refresh).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROBE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
