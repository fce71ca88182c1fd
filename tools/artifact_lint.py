#!/usr/bin/env python3
"""Round-ritual lint for the bench stdout artifact (driver-side tooling).

The driver keeps only the LAST ~2000 chars of Bench's stdout and
json-parses what survives. That window has now been overflowed twice
(round 1: full-catalog precision; round 12: inline shuffle_bytes map
-> BENCH_r12.json parsed:null). This lint fails the round ritual when

  - the final stdout line exceeds the 1800-char budget (200 chars of
    slack against driver-side prefixes), or
  - the line is not valid JSON, or
  - required headline keys are missing, or
  - the zero-spill invariant is violated (spill_bytes > 0): no
    headline query spills at the bench SF today; a memory-pressure
    regression must trip a gate, not hide inside wall time. Pass
    --allow-spill only with a committed justification in PLANS.md.

Usage: python3 tools/artifact_lint.py <bench_stdout_or_json_file>
           [--allow-spill]
The file may be the raw `sbt runMain graft.Bench` log (the last
non-empty line is linted) or an already-extracted one-line JSON.
"""
import json
import sys

BUDGET = 1800
REQUIRED = ["metric", "value", "unit", "queries", "sf",
            "cdc_events_per_sec", "stream_events_per_sec",
            "ann_recall", "spill_bytes"]


def lint(path, allow_spill=False):
    lines = [ln.strip() for ln in open(path, encoding="utf-8")
             if ln.strip()]
    if not lines:
        print(f"FAIL {path}: empty")
        return 1
    # a raw sbt log carries sbt's own "[success] Total time..." footer
    # AFTER the bench JSON — lint the LAST {-prefixed line, and check
    # that everything from its start to EOF (what the driver's
    # 2000-char tail must contain) stays inside the window
    cands = [ln for ln in lines if ln.startswith("{")]
    if not cands:
        print(f"FAIL {path}: no JSON line found")
        return 1
    line = cands[-1]
    trailer = lines[len(lines) - lines[::-1].index(line):]
    tail_span = len(line) + sum(len(t) + 1 for t in trailer)
    fails = 0
    if tail_span > 2000:
        print(f"FAIL JSON line + trailing log = {tail_span} chars > "
              "2000 (the driver's tail window would cut the line head)")
        fails += 1
    if len(line) > BUDGET:
        print(f"FAIL line length {len(line)} > {BUDGET} (driver keeps "
              "only the last ~2000 chars of stdout)")
        fails += 1
    else:
        print(f"PASS line length {len(line)} <= {BUDGET}")
    try:
        obj = json.loads(line)
    except ValueError as e:
        print(f"FAIL not valid JSON: {e}")
        return fails + 1
    missing = [k for k in REQUIRED if k not in obj]
    if missing:
        print(f"FAIL missing keys: {missing}")
        fails += 1
    else:
        print(f"PASS all {len(REQUIRED)} required keys present")
    spill = obj.get("spill_bytes")
    if isinstance(spill, (int, float)) and spill > 0 and not allow_spill:
        print(f"FAIL spill_bytes {spill} > 0 (zero-spill invariant; "
              "justify in PLANS.md and rerun with --allow-spill)")
        fails += 1
    elif spill == 0:
        print("PASS spill_bytes == 0 (zero-spill invariant holds)")
    nq = len(obj.get("queries", {}))
    failed = obj.get("failed", [])
    print(f"INFO {nq} queries on line, failed={failed}, "
          f"details={obj.get('details')}")
    if failed:
        print(f"FAIL failed list non-empty: {failed}")
        fails += 1
    return fails


if __name__ == "__main__":
    argv = sys.argv[1:]
    allow = "--allow-spill" in argv
    if allow:
        argv.remove("--allow-spill")
    if len(argv) != 1:
        sys.exit("usage: artifact_lint.py <bench_stdout_or_json> "
                 "[--allow-spill]")
    sys.exit(1 if lint(argv[0], allow) else 0)
