#!/usr/bin/env python3
"""Re-pin BENCH_REF.json from a fresh idle full-suite BENCH_FULL.json.

Implements the pin policy recorded in BENCH_REF.json verbatim:
append-only — the CURRENT pin (queries + calib_sec + metadata) is pushed
onto `history` with a `note` explaining the re-pin, then `queries` /
`calib_sec` / `n_queries` are replaced wholesale from ONE fresh idle run
(median-of-3 per row — exactly what Bench.scala records; no min-of-runs
selection beyond Bench's own bounded contention-rescue pass, whose
first-pass values are preserved in BENCH_FULL.json's rerun_first_pass).

Usage: tools/repin_bench_ref.py "<note>" [bench_full] [bench_ref]
"""
import json
import sys


def main() -> None:
    note = sys.argv[1]
    full_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_FULL.json"
    ref_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_REF.json"
    full = json.load(open(full_path))
    ref = json.load(open(ref_path))

    if full.get("contended"):
        sys.exit("refusing to pin a contended run (contended=true)")
    if full.get("failed"):
        sys.exit(f"refusing to pin a run with failures: {full['failed']}")

    # compact superseded-pin summary, the established history-entry shape
    # (full maps never land in history — Bench parses only the pre-history
    # prefix, and a stale full map there would invite last-wins shadowing)
    prior = {
        "round": 15,
        "kind": "pin",
        "total_sec": ref.get("value"),
        "n_queries": ref.get("n_queries"),
        "calib_sec": ref["calib_sec"],
        "calib_sec_end": ref.get("calib_sec_end"),
        "method": note,
    }
    ref.setdefault("history", []).append(prior)
    ref["queries"] = {k: v for k, v in sorted(full["queries"].items())}
    ref["calib_sec"] = full["calib_sec"]
    ref["calib_sec_end"] = full["calib_sec_end"]
    ref["n_queries"] = full["n_queries"]
    ref["value"] = full["value"]
    ref["contended"] = False
    ref["failed"] = []
    ref["sf"] = full["sf"]

    # COMPACT separators are load-bearing: Bench.scala and
    # RegistrationAuditSpec anchor on the exact substring `"queries":{`
    # (and `"sf":"<dir>"`) — an indent/space-formatted dump breaks the
    # pin parse and the bench silently loses normalization
    json.dump(ref, open(ref_path, "w"), separators=(",", ":"))
    print(f"pinned {ref['n_queries']} rows, calib {ref['calib_sec']:.3f}, "
          f"total {ref['value']:.1f}s; history now {len(ref['history'])} entries")


if __name__ == "__main__":
    main()
