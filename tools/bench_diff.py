#!/usr/bin/env python3
"""Compare two bench JSON files and flag per-query swings.

Usage: python3 tools/bench_diff.py BENCH_prev.json BENCH_new.json [ratio]

Exits 1 if any shared query moved by more than `ratio` (default 2.0)
in either direction AND by more than 0.3s absolute (small queries jitter).
Run this before shipping a round so a 7x regression like r2's q19
can't land unnoticed.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    # driver-format BENCH_r{N}.json: the bench line is inside "tail"
    for line in d.get("tail", "").splitlines():
        line = line.removeprefix("[info] ")
        if line.startswith('{"metric"'):
            return json.loads(line)["queries"]
    raise SystemExit(f"no bench queries found in {path}")


def main():
    prev, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    flagged = []
    for q in sorted(set(prev) & set(new)):
        p, n = prev[q], new[q]
        if p <= 0 or n <= 0:
            continue
        r = n / p
        if (r > ratio or r < 1 / ratio) and abs(n - p) > 0.3:
            flagged.append((q, p, n, r))
        print(f"{q:32s} {p:7.3f} -> {n:7.3f}  ({r:5.2f}x)")
    only_prev = sorted(set(prev) - set(new))
    only_new = sorted(set(new) - set(prev))
    if only_prev:
        print("dropped:", ", ".join(only_prev))
    if only_new:
        print("added:  ", ", ".join(only_new))
    tp, tn = sum(prev.values()), sum(new.values())
    print(f"{'TOTAL (shared basis excl. adds/drops)':32s} {tp:7.3f} -> {tn:7.3f}")
    if flagged:
        print("\nFLAGGED (>%.1fx and >0.3s):" % ratio)
        for q, p, n, r in flagged:
            print(f"  {q}: {p:.3f}s -> {n:.3f}s ({r:.2f}x)")
        sys.exit(1)
    print("\nno per-query swing beyond threshold")


if __name__ == "__main__":
    main()
