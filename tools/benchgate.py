#!/usr/bin/env python3
"""Mechanical per-query bench regression gate (VERDICT r5 #3).

Compares a bench run's per-query times against the committed
BENCH_BASELINE.json and FAILS (exit 1) on drift, so "is this round
slower?" stops being a judgment call.

Usage:
  tools/benchgate.py BENCH_BASELINE.json <bench-json>   # file or '-' = stdin

<bench-json> is the long Bench line: {"metric":"total",...,"queries":{...}}.
BENCH_BASELINE.json: {"sf": ..., "note": ..., "queries": {name: seconds}}.

A query fails the gate when current > max(2 x baseline, baseline + 1.0s)
— the absolute slack keeps sub-second queries from flagging on scheduler
noise; genuinely slow queries are held to the 2x contract. New queries
(no baseline) and retired queries are reported but never fail; refresh
the baseline when the set changes.

Variance robustness (VERDICT r7 #1) lives in the CALLER: graft.Bench
parses this script's FAIL lines, re-runs just the breaching queries on a
fresh session, substitutes the better sample, and re-invokes the gate —
so a single contended full run cannot fail the round, while a
reproducible regression fails both samples and still gates. Recording a
baseline should bypass that re-run (SPARK_GRAFT_NO_RERUN=1).
"""
import json
import os
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    if not os.path.exists(sys.argv[1]):
        print(f"benchgate: baseline file '{sys.argv[1]}' does not exist — "
              "record one (per-query median of 3 restart-enabled Bench runs) "
              "and commit it; the gate cannot run without it")
        return 2
    baseline = json.load(open(sys.argv[1]))["queries"]
    raw = sys.stdin.read() if sys.argv[2] == "-" else open(sys.argv[2]).read()
    # tolerate surrounding log lines: take the last line with a queries map
    cur = None
    for line in raw.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            cur = json.loads(line)["queries"]
    if cur is None:
        print("benchgate: no bench JSON line with a queries map found")
        return 2

    failed, new, gone = [], [], []
    for name, sec in sorted(cur.items()):
        base = baseline.get(name)
        if base is None:
            new.append(name)
            continue
        limit = max(2.0 * base, base + 1.0)
        if sec > limit:
            failed.append((name, base, sec, limit))
    for name in sorted(baseline):
        if name not in cur:
            gone.append(name)

    for name, base, sec, limit in failed:
        print(f"FAIL {name}: {sec:.2f}s vs baseline {base:.2f}s "
              f"(limit {limit:.2f}s, {sec / base:.1f}x)")
    if new:
        print(f"new (no baseline, not gated): {', '.join(new)}")
    if gone:
        print(f"in baseline but not run: {', '.join(gone)}")
    n_ok = len([n for n in cur if n in baseline]) - len(failed)
    print(f"{n_ok} within limits, {len(failed)} regressed, "
          f"{len(new)} new, {len(gone)} missing")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
