#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Each query is materialized with a noop sink (full execution, zero
driver-transfer cost), timed after one warm-up of the session (JVM +
parquet footer caches), single run per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from flink_samples_spark.plans import QUERIES  # noqa: E402
from flink_samples_spark.session import get_spark  # noqa: E402

# One headline per operator family (SURVEY.md §2) — the set the
# driver records against BASELINE.md.
HEADLINE = [
    "q_session_window",        # flagship (reference's own query)
    "q_session_window_keyed",  # keyed session path
    "q_tumbling_window",       # reference's windowed reduce
    "q_sliding_window",
    "q_scan_parquet",          # raw scan throughput
    "q_filter",                # pushdown path
    "q_agg_multi",             # TPC-H Q1 shape
    "q_agg_rollup",
    "q_join_broadcast",
    "q_join_smj",              # big x big shuffle join
    "q_join_star",             # 5-way star
    "q_win_rank",              # analytic window
    "q_topk_per_group",
    "q_pipeline_topk_revenue", # TPC-H Q3 shape
    "q_pipeline_filtered_agg", # TPC-H Q6 shape
    "q_udtf",                  # Arrow UDF path
    "q_dedup_exact",
    "q_dedup_near",            # MinHash LSH
    "q_dedup_groups",          # iterative connected components
    "q_join_asof",             # as-of join (union + running-last)
    "q_sample_hash",           # deterministic corpus sampling
    "q_sim_topk",              # brute-force ANN baseline
    "q_text_stats",
    "q_sql_session_window",    # SQL-string entry (reference's literal path)
    "q_join_band",             # banded range join (equi-join scale path)
    "q_chunk_docs",            # context-window chunking (narrow JVM map)
    "q_dedup_cross",           # cross-corpus decontamination (MinHash A×B)
    "q_embed_quantize",        # int8 embedding quantization
    "q_training_pipeline",     # composed curate→dedup→split→chunk pipeline
    # round-4 headliners: the window-rotation burn-down set
    "q_boilerplate",           # C4-style document-frequency filter
    "q_tokenize_vocab",        # vocab build + id-encode checksum
    "q_dedup_apply",           # detect→group→APPLY surviving corpus
    "q_stream_curate",         # curation pipeline as a REAL streaming run
    # round-4 additions: one per new plan shape
    "q_tfidf",                 # (doc,term) two-phase count + scalar-attach
    "q_corpus_shuffle",        # distributed total-order index (no global window)
    "q_merge_upsert",          # broadcast-anti MERGE change-set apply
    # round-4 late additions: sub-document rewrites + model-based scoring
    "q_dedup_span",            # corpus-frequent span deletion (hash-keyed)
    "q_dedup_within",          # within-doc repeated-span rewrite (zero-shuffle)
    "q_lm_score",              # corpus-trained bigram LM perplexity proxy
    "q_join_bloom",            # runtime bloom-filter-pruned fact join
    "q_curation_v2",           # composed round-4 pipeline (ensemble→rewrites→chunk)
    # round-5 certification set: the newest scale claims
    "q_embed_pca",             # distributed PCA (batch-partial Gram, d×d driver state)
    "q_dedup_incremental",     # ingestion dedup vs persisted signature index
    "q_stream_dedup_index",    # the same, as a REAL streaming run w/ growing index
    # round-8 addition: the de-stubbed REAL codec path (Arrow-batched
    # binary parse + numpy stats — the multimodal decode shape)
    "q_multimodal_decode",
    # round-9 additions: the COMPRESSED real codec (stdlib zlib inflate
    # + per-scanline filter reconstruction over the same Arrow batches)
    # and the AUDIO real codec (RIFF/PCM parse + per-channel means)
    "q_multimodal_decode_png",
    "q_multimodal_decode_wav",
    # round-10 additions: the LOSSY real codec (baseline JPEG Huffman
    # decode + batched numpy IDCT + JFIF color transform), the VIDEO
    # container (y4m planar stream, per-frame iteration), the
    # PALETTE+LZW codec (animated GIF — dictionary coding), and the
    # COMPRESSED VIDEO codec (MJPEG-in-AVI — RIFF walk + per-frame
    # JPEG decode)
    "q_multimodal_decode_jpeg",
    "q_multimodal_decode_y4m",
    "q_multimodal_decode_gif",
    "q_multimodal_decode_mjpeg",
    # round-10 late additions: the COMPRESSED LOSSLESS audio codec
    # (FLAC — Rice residuals, FIXED/LPC prediction, stereo
    # decorrelation, CRC-8/16 + MD5 verification) and the INTER-FRAME
    # video codec (MS-RLE8-in-AVI — skip opcodes carry pixels forward
    # from the previous frame)
    "q_multimodal_decode_flac",
    "q_multimodal_decode_rle",
]


def main() -> None:
    try:
        loadavg_start = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg_start = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="fss-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up pass: JVM codegen, Python worker pool, parquet footers.
    # No DataFrame/result caching — only engine infrastructure warms;
    # the timed pass re-plans and re-executes every query in full.
    # Per-query try/except: one broken query must never zero out the
    # whole bench record (round 2 lost its entire perf signal that way).
    errors: dict[str, str] = {}
    for name in HEADLINE:
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 — record and keep benching
            errors[name] = f"{type(e).__name__}: {e}"[:300]
    # drop data caches (CacheManager matches canonical plans, so the
    # timed pass would silently reuse warm-up .cache() results);
    # JVM/codegen/worker-pool warmth is what we want to keep
    spark.catalog.clearCache()

    # min of two timed runs per query: the machine hosts periodic
    # background work (driver ticks), and a single sample that lands on
    # a burst misreports the engine by 3×. The min measures the query,
    # not the neighbor. Caches are cleared between runs, so each run
    # still executes in full.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name in errors:
            continue
        best = float("inf")
        try:
            for _ in range(2):
                # construction INSIDE the timing: iterative operators
                # (connected components) execute jobs while the DataFrame
                # is being built, and plan analysis is part of latency
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001 — record and keep benching
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            continue
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline-suite wall time (noop-materialized, local)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    # Streaming throughput vs BASELINE.md's ≥1,000 records/s floor
    # (the reference's sources cap at 100-1,000 rows/s): replay the
    # full events table through the REAL watermarked session-window
    # stream and report events/sec of end-to-end wall time (includes
    # micro-batch planning, state store, sink commit).
    #
    # Best-of-2 rate, same rationale as the batch min-of-2: the r7
    # driver host recorded 1,931 ev/s on a single loaded-run sample
    # while quiet runs read ~8,300 — a 4× noise band on a contract
    # number with a hard 1,000 floor. Two full replays bound the
    # damage one background burst can do; caches are cleared between
    # runs so each replay executes end-to-end.
    # inside try/except like every other probe: a missing/corrupt
    # events.parquet must cost the two streaming rows, not the whole
    # already-measured bench record (see the round-2 lesson above)
    try:
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    except Exception as e:  # noqa: BLE001
        n_events = None
        errors["stream_event_count"] = f"{type(e).__name__}: {e}"[:300]

    def stream_rate(qname: str) -> int:
        if n_events is None:
            raise RuntimeError("events table unavailable (see stream_event_count)")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[qname](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(n_events / best)

    try:
        payload["stream_events_per_s"] = stream_rate("q_stream_session")
    except Exception as e:  # noqa: BLE001
        errors["stream_events_per_s"] = f"{type(e).__name__}: {e}"[:300]

    # STATEFUL streaming throughput (round-4 verdict item 5): the same
    # events replay through the per-key EWMA applyInPandasWithState
    # operator — one output row per event, user-managed state — so
    # BENCH tracks a stateless (session window) AND a stateful custom
    # operator number against the same ≥1,000 records/s floor.
    try:
        payload["stream_stateful_events_per_s"] = stream_rate("q_stream_ewma")
    except Exception as e:  # noqa: BLE001
        errors["stream_stateful_events_per_s"] = f"{type(e).__name__}: {e}"[:300]

    # Host-drift reference points: three constant probes whose cost is
    # pure engine fixed overhead (no table input, no Python stage), so
    # round-over-round comparisons can normalize host noise from the
    # JSON itself instead of post-hoc analysis. min-of-2 like the
    # headliners. loadavg (1/5/15-min) records what the host was doing
    # DURING the bench — a loaded driver host shows up here, not as a
    # mystery regression in the query numbers.
    drift: dict[str, float] = {}
    for probe_name, probe_fn in (
        # pure codegen pipeline: range → filter → sum (no shuffle)
        ("range_sum", lambda: spark.range(50_000_000)
            .filter("id % 7 != 0").agg({"id": "sum"})),
        # one shuffle: range → groupBy → count (exchange fixed cost)
        ("range_group", lambda: spark.range(5_000_000)
            .groupBy((F.col("id") % 1024).alias("k")).count()),
        # scheduler fixed cost: 32-partition no-op scan
        ("range_scan", lambda: spark.range(0, 1_000_000, 1, 32)),
    ):
        try:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                probe_fn().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            drift[probe_name] = round(best, 3)
        except Exception as e:  # noqa: BLE001
            errors[f"drift_{probe_name}"] = f"{type(e).__name__}: {e}"[:300]
    payload["drift_probes"] = drift
    # loadavg at BOTH ends: the end-of-run 1-minute figure mostly
    # reflects the bench's own local[32] execution; the start-of-run
    # figure is what exposes a host that was already busy before the
    # suite began (the signal that actually predicts inflated timings)
    try:
        if loadavg_start is not None:
            payload["loadavg_start"] = loadavg_start
        payload["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass

    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
