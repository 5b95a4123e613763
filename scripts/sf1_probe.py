#!/usr/bin/env python
"""sf1 headline probe (round-6 verdict item 8): run the most
expensive HEADLINE CATALOG QUERIES — full pipelines, not bare
operators — at an sf1-equivalent dataset and record the sf0.1→sf1
scaling exponent, so the bench suite's 2× headroom is shown to not
be an sf0.1 artifact.

No sf1 testdata ships with the sandbox (and /root/testdata is
read-only), so the probe materializes ``data/sf1_amp`` once: every
fact table amplified ×10 with disjoint shifted keys (lineitem+orders
shift o_orderkey TOGETHER so their join survives; events shift
user_id so per-key series length stays constant; documents get the
scale_probe word-perturbed near-dup copies — the boilerplate-heavy
shape dedup exists for; embeddings shift vec_id), dimensions copied
as-is. Both sizes are measured back-to-back on the same machine
(bench-style warm-up + min of 2), so exponents are load-independent.

Writes its table between markers in SCALE_PROBE.md (scale_probe.py
preserves the section). Run from the repo root:
    python scripts/sf1_probe.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.path.join(ROOT, "data", "sf1_amp")
AMP = 10

# the 12 most expensive headliners per BENCH_r06 (item 8 asked for 10;
# two spares cover measurement noise in the ranking)
TOP = [
    "q_stream_dedup_index",
    "q_dedup_incremental",
    "q_dedup_apply",
    "q_dedup_groups",
    "q_stream_curate",
    "q_dedup_cross",
    "q_dedup_near",
    "q_tfidf",
    "q_dedup_span",
    "q_curation_v2",
    "q_embed_pca",
    "q_lm_score",
    # r9: the real-codec Arrow-batch decode paths get a measured scale
    # exponent like every other family (r8 verdict #6 — their only
    # prior rows were sf0.01 driver rows + the 0.1 bench)
    "q_multimodal_decode",
    "q_multimodal_decode_png",
    "q_multimodal_decode_wav",
    "q_multimodal_decode_jpeg",  # r10: the lossy real codec
    "q_multimodal_decode_y4m",   # r10: the video container
    "q_multimodal_decode_gif",   # r10: the palette+LZW codec
    "q_multimodal_decode_mjpeg", # r10: the compressed-video codec
    "q_multimodal_decode_flac",  # r10: the lossless-audio codec
    "q_multimodal_decode_rle",   # r10: the inter-frame video codec
]

MARK_START = "<!-- sf1-probe:start -->"
MARK_END = "<!-- sf1-probe:end -->"
MARK_FULL_START = "<!-- sf1-full:start -->"
MARK_FULL_END = "<!-- sf1-full:end -->"


def build_sf1(spark) -> None:
    from scripts.scale_probe import amplify_docs
    from flink_samples_spark.sources.readers import load_table

    os.makedirs(SF1_DIR, exist_ok=True)
    done_flag = os.path.join(SF1_DIR, "_BUILT")
    if os.path.exists(done_flag):
        return

    def out(name: str):
        return os.path.join(SF1_DIR, f"{name}.parquet")

    docs = load_table(spark, SF01, "documents")
    amplify_docs(docs, AMP).write.mode("overwrite").parquet(out("documents"))

    emb = load_table(spark, SF01, "embeddings")
    parts = [emb] + [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10**9))
        for k in range(1, AMP)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(out("embeddings"))

    ev = load_table(spark, SF01, "events")
    parts = [ev] + [
        ev.withColumn("user_id", F.col("user_id") + F.lit(k * 10**9)).withColumn(
            "event_id", F.col("event_id") + F.lit(k * 10**12)
        )
        for k in range(1, AMP)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(out("events"))

    # lineitem + orders shift o_orderkey with the SAME stride so the
    # order/lineitem join is preserved across copies
    li = load_table(spark, SF01, "lineitem")
    od = load_table(spark, SF01, "orders")
    for name, df, key in (("lineitem", li, "l_orderkey"), ("orders", od, "o_orderkey")):
        parts = [df] + [
            df.withColumn(key, F.col(key) + F.lit(k * 10**12))
            for k in range(1, AMP)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out(name))

    for name in ("customer", "supplier", "part", "nation", "region"):
        load_table(spark, SF01, name).write.mode("overwrite").parquet(out(name))

    open(done_flag, "w").write("built\n")


def time_queries(spark, names: list[str], sf_dir: str) -> dict[str, float]:
    from flink_samples_spark.plans import QUERIES

    t: dict[str, float] = {}
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        t[name] = best
    return t


def update_scale_probe_md(lines: list[str], start: str = MARK_START,
                          end: str = MARK_END) -> None:
    path = os.path.join(ROOT, "SCALE_PROBE.md")
    body = open(path).read() if os.path.exists(path) else "# SCALE_PROBE\n"
    section = "\n".join([start, *lines, end])
    if start in body and end in body:
        pre = body.split(start)[0]
        post = body.split(end)[1]
        body = pre + section + post
    else:
        body = body.rstrip() + "\n\n" + section + "\n"
    open(path, "w").write(body)


def main() -> None:
    from flink_samples_spark.session import get_spark

    args = sys.argv[1:]
    full = "--all" in args
    args = [a for a in args if a != "--all"]
    if full:
        # the WHOLE bench headliner suite (r9 verdict item 6): pin the
        # 2x bench headroom at 10x scale for every headliner, not just
        # the 15 most expensive pipelines
        from bench import HEADLINE

        names = list(HEADLINE)
    else:
        names = args or TOP
    spark = get_spark(app_name="sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    spark.catalog.clearCache()

    small = time_queries(spark, names, SF01)
    spark.catalog.clearCache()
    big = time_queries(spark, names, SF1_DIR)

    title = "## sf1 full-suite probe" if full else "## sf1 headline probe"
    scope = (
        f"ALL {len(names)} bench headliners (the full suite)" if full
        else f"The {len(names)} probed catalog pipelines (the most expensive\n"
             "bench headliners plus the real-codec decode paths)"
    )
    lines = [
        "",
        title,
        "",
        f"{scope}, run in full",
        "at sf0.1 and at the ×10-amplified sf1",
        "equivalent (`data/sf1_amp`: disjoint shifted keys; documents are",
        "word-perturbed near-dup copies, the boilerplate-heavy shape).",
        "Same machine, back-to-back, bench-style min-of-2. `exp` =",
        "log(time ratio)/log(10); ≤1.0 = at-worst-linear, >1.1 would",
        "flag a plan that does not survive the scale-up (plan audit due).",
        "Sub-second sf0.1 queries carry fixed session overhead in BOTH",
        "numerators, which deflates their exponents toward 0 — the",
        "signal is the absence of >1.1 rows, not the tiny values.",
        "",
        "| query | t(sf0.1) s | t(sf1) s | exp |",
        "|---|---|---|---|",
    ]
    flagged = []
    for n in names:
        exp = math.log(max(big[n], 1e-9) / max(small[n], 1e-9)) / math.log(AMP)
        if exp > 1.1:
            flagged.append(n)
        lines.append(f"| {n} | {small[n]:.2f} | {big[n]:.2f} | {exp:.2f} |")
    lines += [
        "",
        "Generated by `python scripts/sf1_probe.py"
        + (" --all" if full else "") + "` (re-run to refresh).",
    ]
    if full:
        update_scale_probe_md(lines, MARK_FULL_START, MARK_FULL_END)
    elif not args:
        update_scale_probe_md(lines)
    # explicit-name runs (the flag-adjudication A/B mode) print only:
    # overwriting the canonical TOP table with a 3-row subset destroys
    # the committed record the A/B exists to defend
    print("\n".join(lines))
    if flagged:
        print(f"\nFLAGGED (exp > 1.1, audit these plans): {flagged}")


if __name__ == "__main__":
    main()
