#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Verify parquet dumps
(columns sorted by name, rows sorted, values hashed).

Optional 3rd arg: path to write a JSON summary (per-query status +
totals) — committed as CORRECTNESS_LOCAL.json so a round always carries
a hard, non-empty correctness record even if the driver's own artifact
lands empty (VERDICT r10 #2). A sibling file <path>_driver.json is
written in the DRIVER's per-query schema ({rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}) so consumers of the
CORRECTNESS_r*.json format can read the committed fallback directly
(VERDICT r11 #3)."""
import sys, json, glob, os, time
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
summary_path = sys.argv[3] if len(sys.argv) > 3 else None
status = {}
driver = {}  # driver-schema twin of `status`


def driver_rec(rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
    return {"rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# Refuse a silent/torn dump (VERDICT r16 #1: the driver artifact landed
# empty with no evidence of why). Verify writes _MANIFEST.json LAST —
# a missing manifest means the dump was killed mid-run; a manifest with
# failures or with fewer ok rows than it selected means queries died.
# Either way this gate must scream, not grade the survivors as if they
# were the whole registry. An INTENTIONAL subset dump (Verify ran with
# query args for local iteration) is graded as exactly that subset,
# with a loud banner.
manifest_path = f"{out_dir}/_MANIFEST.json"
if not os.path.exists(manifest_path):
    print(f"REFUSED: {manifest_path} missing — Verify did not finish "
          f"(check {out_dir}/_progress.jsonl for how far it got)")
    sys.exit(2)
manifest = json.load(open(manifest_path))
if manifest.get("failed", 0) or manifest.get("ok", 0) < manifest.get("queries", 0) \
        or manifest.get("ok", 0) == 0:
    print(f"REFUSED: manifest says ok={manifest.get('ok')} of "
          f"{manifest.get('queries')} selected, failed={manifest.get('failed')}; "
          f"errors: {manifest.get('errors')}")
    sys.exit(2)
dumped = set(manifest.get("rows", {}))
subset = {n for n in oracle if n not in dumped}
if subset:
    print(f"SUBSET RUN: grading {len(dumped)} dumped queries; "
          f"{len(subset)} registered oracles not in this dump "
          "(fine for local iteration; the driver's full run must have 0 here)")
    oracle = {n: q for n, q in oracle.items() if n in dumped}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def norm_cell(v):
    # str-level, NOT %.6g: the driver's compare is exact at string level,
    # and the local gate must never be more forgiving than the driver
    # (r12: q_sample_weighted passed here at %.6g while the driver saw
    # 157.0 vs 157). Floats that are value-identical are str-identical.
    return str(v)

def frame_hash(df):
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]

n_pass = n_fail = 0
def fail(name, why):
    global n_fail
    status[name] = {"pass": False, "why": why}
    print(f"FAIL {name}: {why}"); n_fail += 1

# Oracle output-type sweep (VERDICT r12 #1): DuckDB widens sum(BIGINT)
# to HUGEINT and some arithmetic to DECIMAL; both go lossy/mismatched
# through the driver's pandas compare (HUGEINT → float64). Any oracle
# whose DESCRIBE shows such a column is a latent hash mismatch — fail it
# here, before the driver does.
BAD_TYPES = ("HUGEINT", "DECIMAL")
for name, sql in sorted(oracle.items()):
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchdf()
    except Exception as e:
        fail(name, f"DESCRIBE failed: {e}")
        driver[name] = driver_rec(err=f"DESCRIBE failed: {e}")
        continue
    bad = [(r["column_name"], r["column_type"])
           for _, r in desc.iterrows()
           if any(b in str(r["column_type"]).upper() for b in BAD_TYPES)]
    if bad:
        fail(name, f"oracle output type unsafe for driver compare: {bad}")
        driver[name] = driver_rec(err=f"unsafe oracle output types: {bad}")

for name, sql in sorted(oracle.items()):
    if name in driver and driver[name].get("err"):
        continue  # already failed the type sweep
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        fail(name, "no spark output")
        driver[name] = driver_rec(err="no spark output"); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fail(name, str(e))
        driver[name] = driver_rec(err=str(e)); continue
    if sorted(got.columns) != sorted(exp.columns):
        fail(name, f"cols spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        driver[name] = driver_rec(
            rows_match=(len(got) == len(exp)), schema_match=False,
            spark_rows=len(got), oracle_rows=len(exp))
        continue
    g, e = canon(got), canon(exp)
    if len(g) != len(e):
        fail(name, f"rows spark={len(g)} duck={len(e)}")
        driver[name] = driver_rec(
            rows_match=False, schema_match=True,
            spark_rows=len(g), oracle_rows=len(e))
        continue
    gh, eh = frame_hash(g), frame_hash(e)
    if gh != eh:
        bad = [i for i, (a, b) in enumerate(zip(gh, eh)) if a != b][:3]
        fail(name, f"value mismatch at rows {bad}")
        driver[name] = driver_rec(
            rows_match=True, schema_match=True, hash_match=False,
            spark_rows=len(g), oracle_rows=len(e))
        for i in bad[:2]:
            print(f"   spark={gh[i]}")
            print(f"   duck ={eh[i]}")
        continue
    status[name] = {"pass": True, "rows": len(g)}
    driver[name] = driver_rec(
        rows_match=True, schema_match=True, hash_match=True,
        spark_rows=len(g), oracle_rows=len(e))
    print(f"PASS {name} ({len(g)} rows)"); n_pass += 1

# queries without oracle → rows-only check
for p in sorted(glob.glob(f"{out_dir}/*")):
    name = os.path.basename(p)
    if not os.path.isdir(p) or name in oracle: continue
    try:
        n = len(pd.read_parquet(p))
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    except Exception as ex:
        print(f"ROWS {name}: unreadable: {ex}")

print(f"\n{n_pass} pass, {n_fail} fail")
if summary_path:
    with open(summary_path, "w") as f:
        json.dump({"sf": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                   "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                   "queries": status}, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {summary_path}")
    stem = summary_path[:-5] if summary_path.endswith(".json") else summary_path
    driver_path = stem + "_driver.json"
    with open(driver_path, "w") as f:
        json.dump(driver, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {driver_path} (driver schema, {len(driver)} queries)")
sys.exit(1 if n_fail else 0)
