#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each query's
parquet dump from Verify, run the oracle SQL in DuckDB over the same
sf dir, and compare row counts, sorted-column schemas, and value hashes
(columns sorted by name, rows sorted by all columns)."""
import json, sys, glob, os
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
# optional: comma-separated query names to skip (documented exclusions
# for margin sweeps whose DuckDB replay is quadratic at the swept N)
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if name in skip:
        print(f"SKIPPED  {name} (declared exclusion)"); continue
    pq = f"{outdir}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        print(f"MISSING  {name}: no parquet output"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"SCHEMA   {name}: got {gcols} vs oracle {ecols}"); fail += 1; continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"ROWS     {name}: got {len(g)} vs oracle {len(e)}"); fail += 1; continue
    # value compare: exact string repr per cell
    mism = None
    for c in gcols:
        gv, ev = g[c].astype(str).tolist(), e[c].astype(str).tolist()
        if gv != ev:
            bad = next(i for i in range(len(gv)) if gv[i] != ev[i])
            mism = (c, bad, gv[bad], ev[bad]); break
    if mism:
        c, i, gv, ev = mism
        print(f"VALUES   {name}: col={c} row={i} got={gv} oracle={ev}"); fail += 1
    else:
        print(f"OK       {name} ({len(g)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
