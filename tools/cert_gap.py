#!/usr/bin/env python
"""Certification-staleness report: which driver CORRECTNESS round last
certified each registered query, and which queries the current
``__spark_entry__._CERT_PRIORITY`` prefix will refresh.

The driver certifies the FIRST 50 entries of ``queries()`` each round, so
rotation planning needs exactly this view:

    python tools/cert_gap.py            # cohort summary + stalest rows
    python tools/cert_gap.py --all      # every query's latest round

A row counts as certified by round N if its entry has hash_match (or a
rows-only pass with no error) in CORRECTNESS_r{N}.json.  Queries with no
row in any round (brand-new this round) print as r0.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def latest_rounds(repo: str) -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        try:
            data = json.load(open(f))
        except Exception:
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") or (
                row.get("rows_match") and row.get("err") is None
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = latest_rounds(repo)

    import __spark_entry__ as entry

    registry = list(entry.queries())
    prefix = registry[:50]

    rounds = {name: latest.get(name, 0) for name in registry}
    by_round: dict[int, list[str]] = defaultdict(list)
    for name, rnd in rounds.items():
        by_round[rnd].append(name)

    print(f"registry: {len(registry)} queries; certified ever: "
          f"{sum(1 for r in rounds.values() if r)}")
    for rnd in sorted(by_round):
        tag = "NEW (no driver row)" if rnd == 0 else f"r{rnd}"
        names = sorted(by_round[rnd])
        preview = ", ".join(names[:8]) + (" …" if len(names) > 8 else "")
        print(f"  {tag:>20}: {len(names):3d}  {preview}")

    refreshed = [n for n in prefix]
    stale_after = sorted(
        (rounds[n], n) for n in registry if n not in set(prefix)
    )
    oldest = [f"r{r}:{n}" for r, n in stale_after[:10]]
    print(f"\ncurrent prefix refreshes {len(refreshed)} rows; oldest rows "
          f"LEFT OUT of the prefix:")
    for item in oldest:
        print(f"  {item}")

    if "--all" in sys.argv:
        print()
        for name in registry:
            marker = "*" if name in set(prefix) else " "
            print(f" {marker} r{rounds[name]:<3d} {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
