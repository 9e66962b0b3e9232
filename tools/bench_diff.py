#!/usr/bin/env python3
"""Diff two Bench JSON outputs: per-query medians, ratios, and the biggest
movers. Usage: bench_diff.py <old.json> <new.json> [threshold_ratio]"""
import json
import sys


def med(v):
    return v["median"] if isinstance(v, dict) else float(v)


def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    rows = [(q, med(qo[q]), med(qn[q])) for q in shared]
    tot_o = sum(r[1] for r in rows)
    tot_n = sum(r[2] for r in rows)
    ratio = f"{tot_n / tot_o:.2f}x" if tot_o > 0 else "n/a"
    print(f"shared {len(rows)} queries: {tot_o:.1f}s -> {tot_n:.1f}s ({ratio})")
    movers = [(n / max(o, 1e-9), q, o, n) for q, o, n in rows
              if n / max(o, 1e-9) > thr and n - o > 0.3]
    for r, q, o, n in sorted(movers, reverse=True):
        print(f"  SLOWER {r:5.2f}x  {q}: {o:.2f}s -> {n:.2f}s")
    only_new = sorted(set(qn) - set(qo), key=lambda q: -med(qn[q]))
    if only_new:
        print(f"new queries ({len(only_new)}):")
        for q in only_new:
            print(f"  NEW {med(qn[q]):6.2f}s  {q}")
    slowest = sorted(rows, key=lambda r: -r[2])[:10]
    print("slowest shared:")
    for q, o, n in slowest:
        print(f"  {n:6.2f}s  {q} (was {o:.2f}s)")


if __name__ == "__main__":
    main()
