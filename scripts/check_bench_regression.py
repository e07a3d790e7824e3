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

When BENCH_COLDWARM.json exists (written by `graft.tools.ColdWarmBench`,
table in BASELINE.md), a flagged query is additionally judged against its
recorded COLD ceiling: a serial-bench number that stays at-or-under the
measured cold run (codegen compile + JIT, which amortizes to zero at real
scale) is ambient variance, not a slowdown of the steady-state plan —
reported as AMBIENT, non-failing. Anything past the cold ceiling's band
is a real regression of the warm path.
"""
import json
import os
import sys

TOLERANCE = 1.5
FLOOR_SEC = 0.5
COLDWARM_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_COLDWARM.json")


def load_coldwarm():
    """Cold/warm attribution table, honored only when measured on HEAD.

    The AMBIENT exemption trusts the recorded cold band; a table measured
    on older code (or an older query registry) could mask a real warm-path
    regression up to max(1.5x cold, cold+0.5s). The commit stamp makes
    staleness detectable: mismatch (or a pre-stamp file) -> warn and run
    without the exemption.
    """
    try:
        doc = json.load(open(COLDWARM_PATH))
    except Exception:
        return {}
    recorded = doc.get("commit")
    try:
        import subprocess
        head = subprocess.run(["git", "rev-parse", "HEAD"],
                              capture_output=True, text=True,
                              cwd=os.path.dirname(COLDWARM_PATH),
                              check=True).stdout.strip()
    except Exception:
        head = None
    if not recorded:
        print("WARN: BENCH_COLDWARM.json carries no commit stamp — stale "
              "cold/warm table, AMBIENT exemption disabled (rerun "
              "graft.tools.ColdWarmBench)")
        return {}
    if head is None:
        # can't tell whether the stamp matches — failing open would keep
        # the AMBIENT exemption live on a possibly-stale table, the exact
        # masking the stamp exists to prevent. Mirror the diff-unavailable
        # branch: disable the exemption.
        print(f"WARN: cannot resolve git HEAD to check BENCH_COLDWARM.json "
              f"stamp {recorded} — stale cold/warm table assumed, AMBIENT "
              f"exemption disabled (rerun graft.tools.ColdWarmBench)")
        return {}
    if recorded != head:
        # the stamp can never equal HEAD once the regenerated table is
        # itself committed — HEAD advances past the measuring commit. The
        # table is stale only if SOURCE changed since the stamp: check
        # whether any src/main file differs between the two commits.
        try:
            import subprocess
            changed = subprocess.run(
                ["git", "diff", "--name-only", f"{recorded}..HEAD"],
                capture_output=True, text=True,
                cwd=os.path.dirname(COLDWARM_PATH),
                check=True).stdout.splitlines()
            # uncommitted source edits are drift too — HEAD alone misses them
            changed += [l[3:] for l in subprocess.run(
                ["git", "status", "--porcelain", "--", "src/main"],
                capture_output=True, text=True,
                cwd=os.path.dirname(COLDWARM_PATH),
                check=True).stdout.splitlines()]
        except Exception:
            changed = None
        if changed is None or any(p.startswith("src/main/") for p in changed):
            src = [p for p in (changed or []) if p.startswith("src/main/")]
            print(f"WARN: BENCH_COLDWARM.json commit {recorded} != HEAD "
                  f"{head} with source changes since "
                  f"({', '.join(src[:3]) or 'diff unavailable'}"
                  f"{'…' if src[3:] else ''}) — stale cold/warm table, "
                  f"AMBIENT exemption disabled (rerun graft.tools.ColdWarmBench)")
            return {}
    return doc["queries"]


def main(prev_path, fresh_path):
    prev = json.load(open(prev_path))["queries"]
    fresh = json.load(open(fresh_path))["queries"]
    coldwarm = load_coldwarm()
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
            cw = coldwarm.get(name)
            if cw and cw.get("cold", -1) > 0:
                # within the measured cold band (compile+JIT) → ambient
                ceiling = max(cw["cold"] * TOLERANCE, cw["cold"] + FLOOR_SEC)
                if t <= ceiling:
                    print(f"AMBIENT {name}: {p:.2f}s -> {t:.2f}s but within "
                          f"recorded cold band (cold {cw['cold']:.2f}s, "
                          f"warm {cw['warm']:.2f}s) — compile/JIT variance")
                    continue
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
