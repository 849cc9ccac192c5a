#!/usr/bin/env python3
"""Diff two graft.Bench JSON lines and separate real regressions from
machine-load noise.

NOT part of the engine (dev/driver-side tooling). A contended machine
inflates EVERY query roughly uniformly; a plan regression inflates one
query against a stable background. The `calib_sec` field (fixed CPU-bound
work, emitted by Bench since round 5) measures the load directly: each
query's ratio is normalized by the calibration ratio before flagging, so
"everything 4x slower including the constant-work yardstick" reads as
contention, not regression.

Usage: python3 tools/bench_compare.py <baseline.json> <candidate.json> [threshold]
Exit 1 if any normalized regression exceeds threshold (default 1.5x).
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    base, cand = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    # round 16: Bench emits a rescue line after the first pass
    # (complete:false) and a final one after the end calibration
    # (complete:true). A candidate whose LAST line is incomplete was
    # killed mid-run — its numbers are first-pass-only (no over-pin
    # rescue applied) and its contended field is "unknown". Say so.
    for tag, doc in (("baseline", base), ("candidate", cand)):
        if doc.get("complete") is False:
            print(f"WARNING: {tag} run was cut short (complete:false) — "
                  f"timings are pre-rescue, contended={doc.get('contended')}")
        if doc.get("deadline_hit"):
            print(f"WARNING: {tag} hit its rerun deadline — some over-pin "
                  f"rows were never re-measured")

    cb, cc = base.get("calib_sec", -1.0), cand.get("calib_sec", -1.0)
    has_calib = cb > 0 and cc > 0
    load_ratio = cc / cb if has_calib else 1.0
    if has_calib:
        print(f"calibration: {cb:.3f}s -> {cc:.3f}s "
              f"(candidate machine {load_ratio:.2f}x the baseline's load-level; "
              f"query ratios below are normalized by this)")
    else:
        print("calibration: unavailable in one or both files; "
              "ratios are NOT load-normalized")

    shared = sorted(set(base["queries"]) & set(cand["queries"]))
    regressions = []
    for q in shared:
        b, c = base["queries"][q], cand["queries"][q]
        if b <= 0 or c <= 0:
            continue  # failed queries carry -1
        norm = (c / b) / load_ratio
        flag = " <-- REGRESSION" if norm > threshold and c - b > 0.2 else ""
        if flag or norm > threshold:
            regressions.append((q, b, c, norm))
        print(f"{q:32s} {b:8.3f}s {c:8.3f}s  x{norm:5.2f} (normalized){flag}")

    only_b = set(base["queries"]) - set(cand["queries"])
    only_c = set(cand["queries"]) - set(base["queries"])
    if only_b:
        print(f"only in baseline: {sorted(only_b)}")
    if only_c:
        print(f"only in candidate: {sorted(only_c)}")

    real = [r for r in regressions if r[2] - r[1] > 0.2]
    print(f"\n{len(shared)} shared queries, {len(real)} normalized "
          f"regression(s) > {threshold}x (and > 0.2s absolute)")
    sys.exit(1 if real else 0)


if __name__ == "__main__":
    main()
