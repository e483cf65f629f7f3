#!/usr/bin/env python3
"""Diff two BENCH_FULL.json dumps per query.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [top_n]

Prints totals, the per-query ratio distribution (the flat-inflation
signature distinguishes host contention from a real regression), and the
largest absolute movers in both directions. A `-1`-style negated value
(failed query) is surfaced explicitly.
"""
import json
import statistics
import sys


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    a = json.load(open(old_p))
    b = json.load(open(new_p))
    qa, qb = a["queries"], b["queries"]
    for side, d in (("old", qa), ("new", qb)):
        fails = [k for k, v in d.items() if v < 0]
        if fails:
            print(f"!! {side} FAILURES: {fails}")
    print(f"old total {a['value']:.1f}s / {len(qa)}q   "
          f"new total {b['value']:.1f}s / {len(qb)}q")
    for key in ("shared_stage_s", "shared_text_s", "shared_vec_s",
                "shared_graph_s", "shared_win_s"):
        if key in a or key in b:
            print(f"  {key}: {a.get(key, float('nan')):.2f} -> "
                  f"{b.get(key, float('nan')):.2f}")
    common = [k for k in qa if k in qb and qa[k] > 0.15 and qb[k] > 0]
    ratios = sorted(qb[k] / qa[k] for k in common)
    if ratios:
        n = len(ratios)
        print(f"ratio over {n} common queries: "
              f"p25 {ratios[n // 4]:.2f}  median {statistics.median(ratios):.2f}  "
              f"p75 {ratios[3 * n // 4]:.2f}"
              "   (flat band => contention, outliers => real changes)")
    movers = sorted(common, key=lambda k: qb[k] - qa[k])
    print("\nbiggest improvements:")
    for k in movers[:top_n]:
        if qb[k] < qa[k]:
            print(f"  {k:42s} {qa[k]:6.2f} -> {qb[k]:6.2f}")
    print("biggest regressions:")
    for k in reversed(movers[-top_n:]):
        if qb[k] > qa[k]:
            print(f"  {k:42s} {qa[k]:6.2f} -> {qb[k]:6.2f}")
    only_new = sorted(set(qb) - set(qa))
    if only_new:
        print(f"\nnew queries ({len(only_new)}): " +
              ", ".join(f"{k}={qb[k]:.2f}" for k in only_new))


if __name__ == "__main__":
    main()
