#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Verify parquet dumps
(columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)

def frame_hash(df):
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: cols spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        n_fail += 1; continue
    g, e = canon(got), canon(exp)
    if len(g) != len(e):
        print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}"); n_fail += 1; continue
    gh, eh = frame_hash(g), frame_hash(e)
    if gh != eh:
        bad = [i for i, (a, b) in enumerate(zip(gh, eh)) if a != b][:3]
        print(f"FAIL {name}: value mismatch at rows {bad}")
        for i in bad[:2]:
            print(f"   spark={gh[i]}")
            print(f"   duck ={eh[i]}")
        n_fail += 1; continue
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
sys.exit(1 if n_fail else 0)
