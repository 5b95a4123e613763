#!/usr/bin/env python
"""Drift-normalized bench comparison (round-8 verdict #4).

Round-over-round bench comparison on a shared, noisy host was a
judgment call: BENCH JSONs carry ``drift_probes`` (constant-cost
queries timed inside the same process) and ``loadavg``, but the
normalization happened by hand. This tool makes it mechanical:

    python scripts/bench_compare.py BENCH_r08.json BENCH_r09.json
    python scripts/bench_compare.py old.json new.json --threshold 1.3

Per query it prints raw new/old ratio AND the ratio normalized by the
drift factor (the data-heavy probe's ratio when both records carry it,
else the geomean of the shared probe ratios — how much slower the HOST
was during the new run, independent of engine code), and flags queries
whose raw AND normalized ratios BOTH exceed the threshold (see the
flag-rule comment in main: normalization excuses host-slow runs, it
must not synthesize regressions no wall clock saw). Files may be either the
driver's wrapper shape (bench line under ``"parsed"``) or bench.py's
raw JSON line; rounds before r8 have no drift probes, in which case
the factor falls back to 1.0 and is labeled as such.

Round-11: bench.py records per-query 1-min loadavg samples
(``query_load``, one per interleaved pass) and a suite-start
``load_gate``. When either side of a flagged query ran under load
above the gate threshold, the flag is annotated LOAD-SUSPECT with the
offending samples — classification of a 10× outlier as co-tenant load
is mechanical from the two JSONs, no narrative needed.

Exit code: 0 always (a comparison is a record, not a gate) unless
``--strict`` is passed, then 1 when any normalized regression exceeds
the threshold.
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def load_bench(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    if "queries" not in data:
        sys.exit(f"{path}: no 'queries' map — not a bench JSON")
    return data


def geomean(xs: list[float]) -> float:
    xs = [x for x in xs if x > 0]
    if not xs:
        return 1.0
    return math.exp(sum(math.log(x) for x in xs) / len(xs))


# Probes that run a SECONDS-LONG data-heavy shape (sf0.1 scan →
# shuffle → agg). Preferred for normalization (r12 verdict item 2):
# the round-12 same-host code A/B proved the sub-second fixed-overhead
# probes slip into scheduler gaps that data-heavy queries cannot —
# co-tenant steal leaves them FLAT while every real query inflates —
# which made the geomean-of-all normalization over-flag byte-identical
# code 31× in r11 and 18× in r12.
DATA_PROBES = ("sf_scan_agg",)


def drift_factor(old: dict, new: dict) -> tuple[float, str]:
    po, pn = old.get("drift_probes") or {}, new.get("drift_probes") or {}
    common = sorted(set(po) & set(pn))
    # Both empty-probe shapes (no probes at all on either side, or
    # shared probe names whose values are zero/negative) take the same
    # explicit fallback: factor 1.0, labeled so the caller knows the
    # normalized column IS the raw column (r10 verdict item 4; pinned
    # by tests/test_bench_compare.py::test_probe_less_pair_falls_back).
    ratios = {k: pn[k] / po[k] for k in common if po[k] > 0 and pn[k] > 0}
    if not ratios:
        return 1.0, "no usable drift probes — raw ratios only"
    data = {k: r for k, r in ratios.items() if k in DATA_PROBES}
    if data:
        f = geomean(list(data.values()))
        detail = ", ".join(f"{k} {r:.2f}x" for k, r in sorted(data.items()))
        rest = ", ".join(
            f"{k} {r:.2f}x" for k, r in sorted(ratios.items()) if k not in data
        )
        note = f"data-heavy probe ratio ({detail}"
        if rest:
            note += f"; fixed-overhead probes, informational: {rest}"
        return f, note + ")"
    f = geomean(list(ratios.values()))
    detail = ", ".join(f"{k} {r:.2f}x" for k, r in sorted(ratios.items()))
    return f, f"geomean of {len(ratios)} probe ratios ({detail})"


def load_annotation(old: dict, new: dict, q: str) -> str:
    """LOAD-SUSPECT annotation for a flagged query: did either side's
    timed runs start under 1-min loadavg well above that RUN'S OWN
    typical level? The bench's local[32] execution keeps load1 high
    throughout (~#cores), so the hot threshold is self-calibrating —
    max(gate threshold, 1.5 × the run's median sample) — and targets
    co-tenant BURSTS hitting this query specifically; SUSTAINED
    co-tenant load raises the whole run's median and is the drift
    factor's job instead. Reads bench.py's per-query ``query_load``
    samples — SIDECAR-only since round 12 (the compact driver line
    carries just the gate verdict string), so point this tool at the
    ``BENCH_rN_local.json`` sidecars for LOAD-SUSPECT annotations;
    JSONs without the field yield no annotation."""

    def _gate_threshold(d: dict) -> float | None:
        lg = d.get("load_gate")
        # r11 shape: a dict with threshold; r12 driver line: a string
        return lg.get("threshold") if isinstance(lg, dict) else None

    gate = _gate_threshold(new) or _gate_threshold(old) or 8.0
    notes = []
    for side, data in (("old", old), ("new", new)):
        all_samples = sorted(
            s
            for loads in (data.get("query_load") or {}).values()
            for s in loads
            if s is not None
        )
        if not all_samples:
            continue
        median = all_samples[len(all_samples) // 2]
        hot_above = max(gate, 1.5 * median)
        samples = [
            s for s in (data.get("query_load") or {}).get(q) or [] if s is not None
        ]
        if any(s > hot_above for s in samples):
            notes.append(
                f"{side} load1 {','.join(f'{s:.1f}' for s in samples)} "
                f"vs run median {median:.1f}"
            )
    if not notes:
        return ""
    return f" LOAD-SUSPECT ({'; '.join(notes)})"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="flag normalized ratios above this (default 1.3)")
    ap.add_argument("--strict", action="store_true",
                    help="exit 1 when any query is flagged")
    args = ap.parse_args()

    old, new = load_bench(args.old), load_bench(args.new)
    f, f_note = drift_factor(old, new)
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))

    rows = []
    for q in common:
        if qo[q] <= 0:
            continue
        raw = qn[q] / qo[q]
        rows.append((q, qo[q], qn[q], raw, raw / f))
    rows.sort(key=lambda r: -r[4])
    # Flag rule (r13): a query is flagged only when BOTH its raw and
    # its normalized ratio exceed the threshold. Normalization exists
    # to EXCUSE raw inflation the host caused (factor > 1); when the
    # factor is < 1 it AMPLIFIES ratios instead, and three rounds of
    # same-host code A/Bs adjudicated every amplified flag as host
    # noise (31 in r11, 18 in r12, and a same-HEAD pair in r13 that
    # read raw 0.84x yet normalized 1.38x through a noisy 0.61 factor
    # — 34 phantom flags on identical code). A genuine code
    # regression inflates the raw ratio too; one visible only through
    # the normalizer's lens is not a finding, and the standing A/B
    # protocol (BASELINE.md) remains the adjudicator for anything
    # borderline.

    print(f"# bench compare: {args.old} -> {args.new}")
    print(f"drift factor: {f:.3f} ({f_note})")
    for side, key in (("old", old), ("new", new)):
        la = key.get("loadavg_start") or key.get("loadavg")
        if la:
            print(f"{side} loadavg: {la}")
        gate = key.get("load_gate")
        if isinstance(gate, dict):  # r11 full shape (sidecars)
            print(f"{side} load gate: {gate.get('result')} "
                  f"(threshold {gate.get('threshold')}, "
                  f"waited {gate.get('waited_s', 0)}s)")
        elif gate:  # r12 driver-line shape: a verdict string
            print(f"{side} load gate: {gate}")
        pg = key.get("probe_gate")
        if pg:
            pg = pg.get("result") if isinstance(pg, dict) else pg
            print(f"{side} probe gate: {pg}")
    print()
    print("| query | old s | new s | raw ratio | normalized | flag |")
    print("|---|---|---|---|---|---|")
    flagged = []
    for q, to, tn, raw, norm in rows:
        flag = ""
        if min(raw, norm) > args.threshold:
            flag = f"REGRESSION >{args.threshold}x" + load_annotation(old, new, q)
            flagged.append(q)
        print(f"| {q} | {to:.3f} | {tn:.3f} | {raw:.2f}x | {norm:.2f}x | {flag} |")
    print()
    norm_g = geomean([r[4] for r in rows])
    raw_g = geomean([r[3] for r in rows])
    print(f"geomean over {len(rows)} shared queries: raw {raw_g:.3f}x, "
          f"normalized {norm_g:.3f}x")
    for label, names in (("only in old", only_old), ("only in new", only_new)):
        if names:
            print(f"{label}: {', '.join(names)}")
    for k in ("stream_events_per_s", "stream_stateful_events_per_s"):
        if k in old and k in new:
            print(f"{k}: {old[k]} -> {new[k]}")
    sl = new.get("stream_load")
    if sl:
        print(f"new stream run load1 samples: {sl}")
    if flagged:
        print(f"\nFLAGGED ({len(flagged)}): {', '.join(flagged)}")
        if args.strict:
            sys.exit(1)
    else:
        print("\nno normalized regressions above threshold")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `bench_compare.py ... | head` is fine
        sys.exit(0)
