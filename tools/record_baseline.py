#!/usr/bin/env python3
"""Record BENCH_BASELINE.json with the documented recipe: N (default 3)
restart-enabled whole-set Bench runs, per-query MEDIAN plus MAD (median
absolute deviation) — the variance floor benchgate.py uses so queries
whose baseline samples already ran noisy don't flag inside their own
observed band (VERDICT r9 #7).

Usage:
  tools/record_baseline.py [runs] [note...]

Runs graft.Bench via tools/run.sh with SPARK_GRAFT_NO_RERUN=1 (a
baseline must not inherit best-of-two adjudication samples) and default
restarts. Writes BENCH_BASELINE.json in the repo root.
"""
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(i: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_NO_RERUN="1")
    t0 = time.time()
    p = subprocess.run([os.path.join(ROOT, "tools/run.sh"), "graft.Bench"],
                       env=env, capture_output=True, text=True, cwd=ROOT)
    qs = None
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            qs = json.loads(line)["queries"]
    if qs is None:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-2000:] + "\n")
        raise SystemExit(f"run {i}: no bench line found")
    print(f"run {i}: {sum(qs.values()):.1f} s over {len(qs)} queries "
          f"({time.time() - t0:.0f} s wall)")
    return qs


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    note_extra = " ".join(sys.argv[2:])
    samples = [one_run(i + 1) for i in range(runs)]
    names = sorted(set().union(*[set(s) for s in samples]))
    queries, mad = {}, {}
    for n in names:
        xs = sorted(s[n] for s in samples if n in s)
        med = statistics.median(xs)
        queries[n] = round(med, 3)
        mad[n] = round(statistics.median([abs(x - med) for x in xs]), 3)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    note = (f"per-query median + MAD of {runs} restart-enabled Bench runs "
            f"(SPARK_GRAFT_NO_RERUN=1, local[32]) over {len(names)} queries; "
            f"refresh with tools/record_baseline.py. {note_extra}").strip()
    doc = {"sf": sf, "note": note, "queries": queries, "mad": mad}
    out = os.path.join(ROOT, "BENCH_BASELINE.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {len(names)} queries, total median "
          f"{sum(queries.values()):.1f} s")


if __name__ == "__main__":
    main()
