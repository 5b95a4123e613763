#!/usr/bin/env python
"""Same-host code A/B — the repo's standing bench-flag adjudicator
(BASELINE.md protocol, mechanized in round 13).

When `bench_compare.py` flags a query, the question is always "code or
host?" — and round-over-round snapshot ratios cannot answer it because
the two records captured different host windows. This tool answers it
the way rounds 11-12 did by hand: check the OLD code out into a
worktree and run BOTH trees through identical process blocks,
ALTERNATING old/new within the same minutes, so every comparison pair
shares one host window.

    python scripts/code_ab.py OLD_REF q_a q_b ...
    python scripts/code_ab.py OLD_REF q_a --blocks 3 --samples 2 \
        --sf-dir /root/testdata/sf0.1

Per block it runs old then new (fresh process each, same query list,
best-of-``--samples`` per query inside the process), and the verdict
per query is min-across-blocks(new) / min-across-blocks(old): the min
over alternating blocks is the fairest same-window estimate either
tree gets. Ratios ≤ ~1.1 mean the flag was host noise (A/B-REFUTED);
sustained ratios above that are a real code regression and point at
the diff. Exit code is 0 always — the output is an adjudication
record, not a gate; pipe it into the round notes.

The worktree is created under /tmp and removed afterwards; the repo's
working tree is never touched.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The per-process runner: times each named query best-of-N with the
# noop sink (full execution, zero driver transfer), construction inside
# the timing, caches cleared between runs — the same measurement
# bench.py makes. Written to a temp file so BOTH trees run the exact
# same measurement code regardless of what their checked-out bench.py
# looks like.
RUNNER = r'''
import json, os, sys, time

repo, sf_dir, samples = sys.argv[1], sys.argv[2], int(sys.argv[3])
names = sys.argv[4:]
sys.path.insert(0, repo)
from flink_samples_spark.plans import QUERIES
from flink_samples_spark.session import get_spark

spark = get_spark(app_name="code-ab")
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in names:
    try:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm the lane; timings below re-execute in full
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(samples):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    except Exception as e:  # noqa: BLE001 — its own row
        out[name] = f"ERROR {type(e).__name__}: {e}"[:200]
print("AB_RESULT " + json.dumps(out))
'''


def run_tree(repo: str, runner: str, sf_dir: str, samples: int,
             names: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, runner, repo, sf_dir, str(samples), *names],
        capture_output=True,
        text=True,
        cwd="/tmp",  # neither tree's cwd-relative state leaks in
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    return {n: f"ERROR runner rc={proc.returncode}: "
               f"{proc.stderr.strip()[-150:]}" for n in names}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old_ref", help="git ref of the OLD code (e.g. the "
                                    "prior round's snapshot commit)")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--blocks", type=int, default=3,
                    help="alternating old/new process blocks (default 3)")
    ap.add_argument("--samples", type=int, default=2,
                    help="best-of-N inside each process (default 2)")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    old_sha = subprocess.run(
        ["git", "rev-parse", "--short", args.old_ref],
        capture_output=True, text=True, cwd=ROOT, check=True,
    ).stdout.strip()
    worktree = tempfile.mkdtemp(prefix=f"code_ab_{old_sha}_")
    subprocess.run(["git", "worktree", "add", "--force", worktree, args.old_ref],
                   cwd=ROOT, check=True, capture_output=True)
    runner = os.path.join(tempfile.mkdtemp(prefix="code_ab_runner_"),
                          "runner.py")
    with open(runner, "w") as f:
        f.write(RUNNER)
    try:
        blocks: list[dict[str, dict]] = []
        for b in range(args.blocks):
            block = {}
            for label, repo in (("old", worktree), ("new", ROOT)):
                block[label] = run_tree(repo, runner, args.sf_dir,
                                        args.samples, args.queries)
                print(f"block {b + 1}/{args.blocks} {label}: "
                      f"{json.dumps(block[label])}", file=sys.stderr)
            blocks.append(block)
        print(f"# code A/B: {args.old_ref} ({old_sha}) -> HEAD, "
              f"{args.blocks} alternating blocks × best-of-{args.samples}, "
              f"sf_dir={args.sf_dir}")
        print("| query | old min s | new min s | ratio | verdict |")
        print("|---|---|---|---|---|")
        for q in args.queries:
            olds = [b["old"].get(q) for b in blocks]
            news = [b["new"].get(q) for b in blocks]
            o_num = [x for x in olds if isinstance(x, (int, float))]
            n_num = [x for x in news if isinstance(x, (int, float))]
            if not o_num or not n_num:
                print(f"| {q} | {olds} | {news} | — | ERROR |")
                continue
            o, n = min(o_num), min(n_num)
            r = n / o if o > 0 else float("inf")
            verdict = ("A/B-REFUTED (host noise)" if r <= 1.1
                       else "INVESTIGATE: real code delta" if r > 1.2
                       else "borderline — add blocks")
            print(f"| {q} | {o:.3f} | {n:.3f} | {r:.2f}x | {verdict} |")
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", worktree],
                       cwd=ROOT, capture_output=True)


if __name__ == "__main__":
    main()
