#!/usr/bin/env python
"""Diff two bench detail files: per-query deltas, sorted by regression.

Usage:
    python tools/compare_bench.py OLD_DETAIL.json [NEW_DETAIL.json]

NEW defaults to the repo's current BENCH_DETAIL.json. Prints added/
removed queries, the shared-query totals (the honest round-over-round
number — the headline total grows every time a query is added), and
every shared query whose time moved more than the noise floor (30% and
>= 0.3 s), worst regressions first. Exit code 0 always — this is a
lens, not a gate; single-run wobble at sf0.1 is ~±0.5 s per query and
genuine regressions show up as repeated drift across rounds, not one
bad sample.
"""

from __future__ import annotations

import json
import os
import sys

NOISE_REL = 0.30
NOISE_ABS = 0.3


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    old_path = sys.argv[1]
    new_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_DETAIL.json",
        )
    )
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    shared = sorted(set(old) & set(new))
    print(f"old: {len(old)} queries ({old_path})")
    print(f"new: {len(new)} queries ({new_path})")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    so = sum(old[q] for q in shared)
    sn = sum(new[q] for q in shared)
    pct = f" ({(sn - so) / so * 100:+.1f}%)" if so > 0 else ""
    print(f"shared-{len(shared)} total: {so:.1f}s -> {sn:.1f}s{pct}")
    moved = [
        (new[q] - old[q], q)
        for q in shared
        if abs(new[q] - old[q]) >= max(NOISE_ABS, NOISE_REL * old[q])
    ]
    for delta, q in sorted(moved, reverse=True):
        print(f"  {delta:+6.2f}s  {q}  ({old[q]:.2f} -> {new[q]:.2f})")
    if not moved:
        print("  (no shared query moved beyond the noise floor)")


if __name__ == "__main__":
    main()
