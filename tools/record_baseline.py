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


def one_run(i: int) -> tuple:
    env = dict(os.environ, SPARK_GRAFT_NO_RERUN="1")
    t0 = time.time()
    p = subprocess.run([os.path.join(ROOT, "tools/run.sh"), "graft.Bench"],
                       env=env, capture_output=True, text=True, cwd=ROOT)
    qs, probe, n_pairs, pair_bounded = None, None, {}, {}
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            doc = json.loads(line)
            qs = doc["queries"]
            probe = doc.get("probe")
            n_pairs = doc.get("n_pairs", {})
            pair_bounded = doc.get("pair_bounded", {})
    if qs is None:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-2000:] + "\n")
        raise SystemExit(f"run {i}: no bench line found")
    print(f"run {i}: {sum(qs.values()):.1f} s over {len(qs)} queries "
          f"(probe {probe}, {time.time() - t0:.0f} s wall)")
    return qs, probe, n_pairs, pair_bounded


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    note_extra = " ".join(sys.argv[2:])
    pairs = [one_run(i + 1) for i in range(runs)]
    samples = [qs for qs, _, _, _ in pairs]
    probes = [p for _, p, _, _ in pairs if p is not None and p > 0]
    # pair-count counters (VERDICT r13 #1b): the baseline draw's
    # candidate-pair volume, per counter — benchgate scales pair-bounded
    # queries' limits by (current / baseline) counter ratio
    counter_names = sorted(set().union(*[set(np) for _, _, np, _ in pairs]))
    n_pairs = {c: int(statistics.median(
        [np[c] for _, _, np, _ in pairs if c in np])) for c in counter_names}
    pair_bounded = {}
    for _, _, _, pb in pairs:
        pair_bounded.update(pb)
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
    if n_pairs:
        doc["n_pairs"] = n_pairs
        doc["pair_bounded"] = pair_bounded
    if probes:
        # calibration-probe envelope: a future Bench run whose probe
        # exceeds max(2x, +0.5s) of this stamps itself "env":"contended"
        doc["probe"] = round(statistics.median(probes), 3)
    out = os.path.join(ROOT, "BENCH_BASELINE.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {len(names)} queries, total median "
          f"{sum(queries.values()):.1f} s")


if __name__ == "__main__":
    main()
