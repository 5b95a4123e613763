#!/usr/bin/env python
"""Regenerate GREEN_MANIFEST.json from every CORRECTNESS_r*.json.

A query is "ever green" when some round's driver record shows
rows+schema+hash all true. The manifest drives DRIVER_PRIORITY
rotation: never-green queries get window slots first, ever-green ones
only keep sentinel seats. Run after each round's CORRECTNESS file
lands:  python scripts/update_green_manifest.py
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ever: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:  # e.g. CORRECTNESS_rX.json matches the glob, not us
            continue
        tag = f"r{int(m.group(1))}"
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            ):
                ever.setdefault(name, []).append(tag)

    out = {
        "_comment": (
            "Queries with at least one fully-green driver CORRECTNESS row "
            "(rows+schema+hash). Used to rotate DRIVER_PRIORITY without "
            "re-burning window slots. Regenerate with "
            "scripts/update_green_manifest.py after each round."
        ),
        "ever_green": {k: sorted(v) for k, v in sorted(ever.items())},
    }
    dest = os.path.join(ROOT, "GREEN_MANIFEST.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"{dest}: {len(ever)} ever-green queries across "
          f"{len(glob.glob(os.path.join(ROOT, 'CORRECTNESS_r*.json')))} rounds")


if __name__ == "__main__":
    main()
