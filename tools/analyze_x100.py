"""Summarize a fleet-wide x100 sweep (tools/scale10.py --all output) and
compare against a prior sweep.

Usage:
    python tools/analyze_x100.py SCALE_SWEEP_X100_FULL_r09.jsonl \
        [SCALE_SWEEP_X100_FULL_r07.jsonl]

Prints: fleet slope distribution (median / p90 / max), aggregate wall
ratio, every query above the linear bound (slope > factor), and — when a
prior sweep is given — the biggest slope movers in both directions (new
at-scale defects show up here long before they show at sf0.1).
"""

from __future__ import annotations

import json
import statistics
import sys

LINEAR_BOUND = 100.0  # factor of the sweep: slope above this is super-linear


def load(path: str) -> dict[str, dict]:
    rows = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{"):
                r = json.loads(line)
                rows[r["query"]] = r
    return rows


def main() -> int:
    cur = load(sys.argv[1])
    prior = load(sys.argv[2]) if len(sys.argv) > 2 else {}
    slopes = sorted(r["slope"] for r in cur.values())
    n = len(slopes)
    agg_base = sum(r["t_base"] for r in cur.values())
    agg_scaled = sum(r["t_scaled"] for r in cur.values())
    print(f"queries: {n}")
    print(
        f"slope median {statistics.median(slopes):.1f}  "
        f"p90 {slopes[int(n * 0.9)]:.1f}  max {slopes[-1]:.1f}"
    )
    print(
        f"aggregate wall: {agg_base:.0f}s -> {agg_scaled:.0f}s "
        f"({agg_scaled / agg_base:.1f}x for 100x data)"
    )
    over = [r for r in cur.values() if r["slope"] > LINEAR_BOUND]
    print(f"over linear bound ({LINEAR_BOUND:g}): {len(over)}")
    for r in sorted(over, key=lambda r: -r["slope"]):
        print(f"  SUPER-LINEAR {r['query']}: {r}")
    top = sorted(cur.values(), key=lambda r: -r["t_scaled"])[:10]
    print("top t_scaled:")
    for r in top:
        print(
            f"  {r['query']}: {r['t_base']:.2f}s -> {r['t_scaled']:.2f}s "
            f"(slope {r['slope']:.1f})"
        )
    if prior:
        movers = []
        for name, r in cur.items():
            p = prior.get(name)
            # sub-second t_scaled on BOTH sides is noise-floor territory
            if p and (r["t_scaled"] > 1 or p["t_scaled"] > 1):
                movers.append((r["t_scaled"] / max(p["t_scaled"], 0.01), name, p, r))
        movers.sort(key=lambda m: -m[0])
        print("vs prior — biggest regressions (t_scaled ratio):")
        for ratio, name, p, r in movers[:8]:
            print(
                f"  {name}: x{ratio:.2f}  ({p['t_scaled']:.1f}s -> "
                f"{r['t_scaled']:.1f}s; slope {p['slope']:.1f} -> {r['slope']:.1f})"
            )
        print("vs prior — biggest improvements:")
        for ratio, name, p, r in movers[-8:]:
            print(
                f"  {name}: x{ratio:.2f}  ({p['t_scaled']:.1f}s -> "
                f"{r['t_scaled']:.1f}s; slope {p['slope']:.1f} -> {r['slope']:.1f})"
            )
        missing = set(prior) - set(cur)
        new = set(cur) - set(prior)
        if missing:
            print(f"in prior only: {sorted(missing)}")
        if new:
            print(f"new this sweep: {sorted(new)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
