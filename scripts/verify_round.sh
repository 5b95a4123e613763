#!/usr/bin/env bash
# End-of-round gate (round-2 verdict item 5): the final snapshot of a
# round must never again commit a red test suite or a crashed bench.
# Run from the repo root:   bash scripts/verify_round.sh
# Exits non-zero unless BOTH pytest and bench.py succeed AND the bench
# printed a parseable JSON line with zero per-query errors.
#
# ORDER MATTERS (round-10 lesson): the bench runs FIRST, while the
# host is quiet — running it after the 200+-query vanilla sweep left
# loadavg ~20 and inflated every timing ~1.2x raw (and the sub-second
# drift probes slipped into scheduler gaps, reading FAST and pushing
# the normalized table to 34 false flags). pytest and the sweep don't
# care about load; the bench numbers do.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== bench (quiet host — runs before the load-heavy phases) =="
BENCH_OUT=$(python bench.py) || { echo "GATE RED: bench.py exited non-zero"; exit 1; }
echo "$BENCH_OUT" | tail -1
echo "$BENCH_OUT" | tail -1 | python -c '
import json, sys
line = sys.stdin.read().strip().splitlines()[-1]
d = json.loads(line)
errs = d.get("errors") or {}
# <q>_rerunN keys are TRANSIENT late-suite re-run failures whose query
# still carries a valid earlier sample (r11/r12 ADVICE; indexed since
# r13 so a second failure cannot overwrite the first) — warn, not red.
import re
soft_re = re.compile(r"_rerun\d*$")
hard = sorted(k for k in errs if not soft_re.search(k))
if hard:
    print("GATE RED: bench recorded per-query errors:", hard)
    sys.exit(1)
soft = sorted(k for k in errs if soft_re.search(k))
if soft:
    print("GATE WARN: transient re-run failures (timings kept):", soft)
if "errors_n" in d:
    print("GATE RED: error detail truncated out of the line; see sidecar")
    sys.exit(1)
nq, tot, unit, sf = len(d["queries"]), d["value"], d["unit"], d["sf"]
print(f"GATE GREEN: {nq} queries, total {tot} {unit} at sf{sf}")
' || exit 1

echo "== bench_compare vs previous round (advisory) =="
# Round-9 verdict item 5: drift-normalized round-over-round comparison
# printed INTO the gate log so regressions surface at gate time, not
# judge time. Advisory by the tool's own philosophy — a flagged query
# is a signal to investigate (interleaved A/B per the repo protocol),
# not an automatic blocker, so this step always exits 0.
PREV=$(ls BENCH_r*_local.json 2>/dev/null | sort -V | tail -1)
if [ -n "${PREV:-}" ]; then
  FRESH=$(mktemp /tmp/bench_fresh.XXXXXX.json)
  echo "$BENCH_OUT" | tail -1 > "$FRESH"
  python scripts/bench_compare.py "$PREV" "$FRESH" || true
  rm -f "$FRESH"
else
  echo "no committed BENCH_r*_local.json snapshot — skipping comparison"
fi

echo "== pytest =="
python -m pytest tests/ -q -p no:cacheprovider || { echo "GATE RED: pytest failed"; exit 1; }

echo "== vanilla-session catalog sweep =="
# Round-5 lesson: the builder's tuned (Arrow-on) session masked a
# non-Arrow createDataFrame failure the driver's config-free session
# hit. The full catalog must pass under the driver's session shape
# once per round. Fresh process so no tuned JVM leaks in.
(cd /tmp && python /root/repo/.claude/skills/verify/driver_sim.py --vanilla) \
  || { echo "GATE RED: vanilla-session sweep failed"; exit 1; }

echo "GATE GREEN: all phases passed"
