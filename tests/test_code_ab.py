"""scripts/code_ab.py — the mechanized same-host code A/B
(BASELINE.md protocol). The heavy path (worktree + two Spark
processes per block) is exercised live each time a bench flag is
adjudicated; these tests pin the cheap contracts that would otherwise
only fail mid-adjudication."""

from __future__ import annotations

import ast
import importlib.util
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts", "code_ab.py")


def _load():
    spec = importlib.util.spec_from_file_location("code_ab", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_runner_source_is_valid_python():
    """The per-process runner is shipped as a STRING into both code
    trees — a syntax error in it would kill every block of a live
    adjudication with an opaque rc!=0 row."""
    ast.parse(_load().RUNNER)


def test_help_runs_and_documents_the_protocol():
    r = subprocess.run(
        [sys.executable, SCRIPT, "--help"], capture_output=True, text=True
    )
    assert r.returncode == 0
    assert "OLD_REF" in r.stdout or "old_ref" in r.stdout
    assert "--blocks" in r.stdout


def test_run_tree_surfaces_runner_failure_as_error_rows(tmp_path):
    """A tree whose runner process dies (missing repo, import error)
    must yield per-query ERROR rows, not crash the adjudication."""
    mod = _load()
    runner = tmp_path / "runner.py"
    runner.write_text("import sys; sys.exit(3)\n")
    out = mod.run_tree("/nonexistent", str(runner), "/tmp", 1, ["q_x", "q_y"])
    assert set(out) == {"q_x", "q_y"}
    assert all(str(v).startswith("ERROR") for v in out.values())


def test_run_tree_parses_result_line(tmp_path):
    mod = _load()
    runner = tmp_path / "runner.py"
    runner.write_text(
        "import json,sys\n"
        "print('noise before')\n"
        "print('AB_RESULT ' + json.dumps({n: 1.5 for n in sys.argv[4:]}))\n"
    )
    out = mod.run_tree("/anywhere", str(runner), "/tmp", 2, ["q_a"])
    assert out == {"q_a": 1.5}
