#!/usr/bin/env python3
"""Per-query bench regression guard (dev-loop tooling).

Compares a fresh `graft.Bench` per-query timing line against the previous
one and fails on unexplained slowdowns, so regressions surface before the
driver's round gate instead of in the judge's diff.

Usage: python3 scripts/check_bench_regression.py <prev.json> <fresh.json>

A query regresses when fresh > max(prev * TOLERANCE, prev + FLOOR_SEC):
the multiplicative bound catches real slowdowns on substantial queries,
the additive floor keeps 0.2 s queries from tripping the gate on
scheduler jitter. New/removed queries are reported but don't fail.
"""
import json
import sys

TOLERANCE = 1.5
FLOOR_SEC = 0.5


def main(prev_path, fresh_path):
    prev = json.load(open(prev_path))["queries"]
    fresh = json.load(open(fresh_path))["queries"]
    bad = []
    for name, t in sorted(fresh.items()):
        if name not in prev:
            print(f"NEW  {name}: {t:.2f}s (no previous timing)")
            continue
        p = prev[name]
        if p < 0 or t < 0:
            continue  # failed run recorded as -1: not a timing signal
        limit = max(p * TOLERANCE, p + FLOOR_SEC)
        if t > limit:
            bad.append((name, p, t))
            print(f"REGRESSION {name}: {p:.2f}s -> {t:.2f}s "
                  f"({t / p:.2f}x, limit {limit:.2f}s)")
    for name in sorted(set(prev) - set(fresh)):
        print(f"GONE {name} (was {prev[name]:.2f}s)")
    tp = sum(v for v in prev.values() if v >= 0)
    tf = sum(v for v in fresh.values() if v >= 0)
    print(f"\ntotal: {tp:.1f}s -> {tf:.1f}s; "
          f"{len(bad)} regression(s) beyond {TOLERANCE}x/+{FLOOR_SEC}s")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
