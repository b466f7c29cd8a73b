#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and diff against Verify's parquet dumps."""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); print(f"MISS  {name}"); continue
    got = pq.read_table(files[0]).to_pandas()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); print(f"OERR  {name}: {e}"); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"cols {gc} vs {ec}")); print(f"COLS  {name}: {gc} vs {ec}"); continue
    if len(got) != len(exp):
        fails.append((name, f"rows {len(got)} vs {len(exp)}")); print(f"ROWS  {name}: {len(got)} vs {len(exp)}"); continue
    g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
    e = exp[ec].sort_values(by=ec, kind="mergesort").reset_index(drop=True)
    ok = True
    for c in gc:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            eq = [(a == b) or (pd.isna(a) and pd.isna(b)) for a, b in zip(gv, ev)]
        else:
            try: eq = list((gv.astype(object) == ev.astype(object)) | (gv.isna() & ev.isna()))
            except Exception: eq = [str(a) == str(b) for a, b in zip(gv, ev)]
        bad = [i for i, x in enumerate(eq) if not x]
        if bad:
            i = bad[0]
            fails.append((name, f"col {c}"))
            print(f"DIFF  {name} col={c} n={len(bad)} first@{i}: {gv.iloc[i]!r} vs {ev.iloc[i]!r}")
            ok = False; break
    if ok: print(f"OK    {name} ({len(got)} rows)")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle-matched")
sys.exit(1 if fails else 0)
