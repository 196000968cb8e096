#!/usr/bin/env python
"""Per-query diff of two BENCH_DETAIL json files (optimization-round
before/after evidence). Usage:

    python tools/bench_diff.py OLD.json NEW.json [--top 30]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    old_doc = json.load(open(args.old))
    new_doc = json.load(open(args.new))
    # Methodology tag (ADVICE r16): bench.py stamps each detail file
    # with the harness methodology it was measured under ("r17" =
    # deep-warm + single timed execution; earlier files carry no tag =
    # the retry-median era). Numbers are only like-for-like within one
    # tag, so warn loudly on a mismatch.
    old_m = old_doc.get("methodology", "pre-r17 (retry-median)")
    new_m = new_doc.get("methodology", "pre-r17 (retry-median)")
    if old_m != new_m:
        print(
            f"WARNING: methodology mismatch — old={old_m!r} vs "
            f"new={new_m!r}; totals are NOT comparable like-for-like "
            "(different timed-window semantics)."
        )
    old = old_doc["queries"]
    new = new_doc["queries"]
    common = sorted(set(old) & set(new), key=lambda k: old[k] - new[k])
    only_new = {k: new[k] for k in new if k not in old}
    print(
        f"old total={sum(old.values()):8.1f}s ({len(old)} rows)   "
        f"new total={sum(new.values()):8.1f}s ({len(new)} rows)"
    )
    print(
        f"common-set totals: old={sum(old[k] for k in common):8.1f}s  "
        f"new={sum(new[k] for k in common):8.1f}s"
    )
    if only_new:
        print(f"rows only in new ({sum(only_new.values()):.1f}s):")
        for k, v in sorted(only_new.items(), key=lambda kv: -kv[1]):
            print(f"  {v:7.2f}  {k}")
    print(f"\nbiggest regressions (new - old), top {args.top}:")
    for k in reversed(common[-args.top:]):
        d = new[k] - old[k]
        if d <= 0:
            break
        print(f"  {old[k]:7.2f} -> {new[k]:7.2f}  (+{d:5.2f})  {k}")
    print(f"\nbiggest improvements, top {args.top}:")
    for k in common[: args.top]:
        d = new[k] - old[k]
        if d >= 0:
            break
        print(f"  {old[k]:7.2f} -> {new[k]:7.2f}  ({d:6.2f})  {k}")


if __name__ == "__main__":
    main()
