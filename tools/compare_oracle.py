#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and diff against Verify's parquet dumps.

Always-on lint: DESCRIBE every oracle and fail any whose final select
types a column HUGEINT/UHUGEINT (DuckDB widens integer SUM to int128;
pandas canonicalizes that to float64, so `12345.0` vs Spark's int64
`12345` flips the driver's repr-level hash while value-equality still
passes — the exact r8/r9 q112 signature). Fix pattern:
CAST(SUM(..) AS BIGINT) in the final select.

--detail: on any mismatch, print EVERY differing column (not just the
first), up to --max-rows full differing rows side-by-side, and a
per-column md5 over the canonicalized (name-sorted, row-sorted) values
for BOTH engines. In --detail mode the per-column canonical repr hashes
are also COMPARED (not just printed): a repr/dtype divergence counts as
a failure even when Python `==` passes, matching the driver's
hash sensitivity."""
import sys, json, glob, hashlib, tempfile, shutil, atexit
import duckdb
import pyarrow.parquet as pq
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
detail = "--detail" in sys.argv
max_rows = 10
for a in sys.argv[1:]:
    if a.startswith("--max-rows="):
        max_rows = int(a.split("=")[1])

sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out_dir = args[1] if len(args) > 1 else "/root/repo/target/verify_out"

con = duckdb.connect()
# Bound DuckDB so a heavy oracle (sf1-scale minhash/jaccard CTEs) spills
# to disk instead of dying on the default in-RAM budget; the temp dir is
# scoped per-run so a crashed compare can't strand tens of GB in /tmp.
_tmp = tempfile.mkdtemp(prefix="ddb_oracle_")
atexit.register(lambda: shutil.rmtree(_tmp, ignore_errors=True))
con.execute(f"SET temp_directory='{_tmp}'")
con.execute("SET memory_limit='48GB'")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def col_hash(series):
    h = hashlib.md5()
    for v in series:
        h.update(repr(v).encode())
        h.update(b"\x00")
    return h.hexdigest()[:12]

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
failed = set()          # distinct failed query names -> summary count
fails = []              # (name, reason) detail lines, may be >1 per query

# --- HUGEINT lint (always on): one DESCRIBE pass over every oracle. ---
for name, sql in sorted(oracle.items()):
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        failed.add(name); fails.append((name, f"describe error: {e}"))
        print(f"DERR  {name}: {e}")
        continue
    huge = [(c, t) for c, t, *_ in desc if "HUGEINT" in str(t).upper()]
    if huge:
        failed.add(name); fails.append((name, f"HUGEINT {huge}"))
        print(f"HUGE  {name}: final select types {huge} — pandas will "
              f"canonicalize to float64 and the driver hash will flip; "
              f"CAST(... AS BIGINT) in the final select")

for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        failed.add(name); fails.append((name, "no spark output"))
        print(f"MISS  {name}"); continue
    got = pq.read_table(files[0]).to_pandas()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        failed.add(name); fails.append((name, f"oracle error: {e}"))
        print(f"OERR  {name}: {e}"); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        failed.add(name); fails.append((name, f"cols {gc} vs {ec}"))
        print(f"COLS  {name}: {gc} vs {ec}"); continue
    if len(got) != len(exp):
        failed.add(name); fails.append((name, f"rows {len(got)} vs {len(exp)}"))
        print(f"ROWS  {name}: {len(got)} vs {len(exp)}"); continue
    g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
    e = exp[ec].sort_values(by=ec, kind="mergesort").reset_index(drop=True)
    bad_cols = {}
    for c in gc:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            eq = [(a == b) or (pd.isna(a) and pd.isna(b)) for a, b in zip(gv, ev)]
        else:
            try: eq = list((gv.astype(object) == ev.astype(object)) | (gv.isna() & ev.isna()))
            except Exception: eq = [str(a) == str(b) for a, b in zip(gv, ev)]
        bad = [i for i, x in enumerate(eq) if not x]
        if bad:
            bad_cols[c] = bad
            i = bad[0]
            failed.add(name); fails.append((name, f"col {c}"))
            print(f"DIFF  {name} col={c} n={len(bad)} first@{i}: {gv.iloc[i]!r} vs {ev.iloc[i]!r}")
            if not detail:
                break
    repr_bad = []
    if detail and not bad_cols:
        # driver-sensitivity check: canonical repr hashes must agree even
        # when value-equality passed (catches int64-vs-float64 etc.)
        for c in gc:
            hg, he = col_hash(g[c]), col_hash(e[c])
            if hg != he:
                repr_bad.append(c)
                failed.add(name); fails.append((name, f"repr col {c}"))
                print(f"REPR  {name} col={c} values == but canonical repr "
                      f"differs ({hg} vs {he}; dtypes {g[c].dtype} vs {e[c].dtype})"
                      f" — driver hash would flip")
    if not bad_cols and not repr_bad:
        ok = "OK    " if name not in failed else "VALS  "  # lint may have failed it
        print(f"{ok}{name} ({len(got)} rows)")
    elif detail and bad_cols:
        print(f"      per-column canonical hashes (spark | duckdb):")
        for c in gc:
            hg, he = col_hash(g[c]), col_hash(e[c])
            mark = "  <-- DIFFERS" if hg != he else ""
            print(f"        {c:30s} {hg} | {he}{mark}")
        rows = sorted(set(i for bad in bad_cols.values() for i in bad))[:max_rows]
        print(f"      first {len(rows)} differing rows (canonical order):")
        for i in rows:
            print(f"        row {i}:")
            for c in gc:
                flag = " *" if i in bad_cols.get(c, []) else ""
                print(f"          {c:28s} spark={g[c].iloc[i]!r} duckdb={e[c].iloc[i]!r}{flag}")
print(f"\n{len(oracle)-len(failed)}/{len(oracle)} oracle-matched")
sys.exit(1 if failed else 0)
