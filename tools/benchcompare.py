#!/usr/bin/env python3
"""Per-query 2x gate check between bench artifacts.

Usage: python3 tools/benchcompare.py <current.json> <baseline.json> [...]

Baselines may be full bench_history/rN.json files (with a "queries"
map) OR truncated driver BENCH_rN.json artifacts (with a "tail"
fragment) — per-query pairs are salvaged from whatever is present.
For each query the BEST previously recorded value across all given
baselines is the anchor; the current value is min(sweep-min, clamped
isolated). Violations (> 2x the anchor) exit 1.

Sweep TOTALS are deliberately not compared (BASELINE.md: totals are
contention-bound on this host; only per-query minima adjudicate).
"""
import sys, json, re


def load_queries(path):
    d = json.load(open(path))
    if "queries" in d and isinstance(d["queries"], dict):
        q = dict(d["queries"])
        iso = d.get("isolated") or {}
        for k, v in iso.items():
            if k in q:
                q[k] = min(q[k], v)
        return q
    # truncated driver artifact: salvage "name":seconds pairs
    frag = d.get("tail", "")
    return {k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)":([0-9.]+)', frag)}


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    cur = load_queries(sys.argv[1])
    base = {}
    for p in sys.argv[2:]:
        for k, v in load_queries(p).items():
            if k not in base or v < base[k]:
                base[k] = v
    new = sorted(set(cur) - set(base))
    violations = []
    for k, prev in sorted(base.items()):
        if k in cur and cur[k] > 2 * prev:
            violations.append((k, prev, cur[k]))
    print(f"baseline queries: {len(base)}  current: {len(cur)}  "
          f"new (set own baseline): {len(new)}")
    for k in new:
        print(f"  NEW  {k}: {cur[k]:.2f}s")
    if violations:
        print(f"\n{len(violations)} queries over 2x of best prior:")
        for k, prev, now in violations:
            print(f"  OVER {k}: {now:.2f}s vs best prior {prev:.2f}s "
                  f"({now/prev:.1f}x) -> adjudicate with BenchOne")
        sys.exit(1)
    print("all within the 2x band")


if __name__ == "__main__":
    main()
