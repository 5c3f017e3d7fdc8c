#!/usr/bin/env python3
"""Scale-replicate the driver's sf0.1 testdata K-fold (default 10 ->
"sf1rep") for overflow-headroom verification (round-11 task #6).

NOT true TPC-H sf1: each replica is an isomorphic copy of sf0.1 with
every key shifted by replica * domain_size, so FK structure, selectivity
and per-key cardinalities are preserved exactly while row counts (and
therefore every N-driven integer bound: |d2| < 2^53 in the L2 kernel,
the myriad-scaled BM25 denominator, Q16 nll sums, vocab/df counts)
grow 10x. Dimension tables (region, nation) stay fixed -- replicating
them would change the 5-region/25-nation world the queries assume.

documents.text gets a ' rep<i>' suffix on replicas i>0 (n_chars
recomputed) so exact/near-dup operators don't collapse the corpus back
to sf0.1 after stage 1 -- downstream pipeline stages must see the
full 10x row count for the margin test to mean anything. Embedding
vectors are kept bit-identical across replicas: N-driven overflow
paths (cluster-size coordinate sums) scale with member count, not
vector values, and identical points exercise the deterministic id
tie-break both engines promise.

Usage: gen_sfrep.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1rep] [K=10]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1rep"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

# replica-local key offsets = exact domain size at sf0.1 (keys are dense from 0)
OFF = dict(cust=15000, supp=1000, part=20000, order=150000,
           event=100000, user=1500, doc=5000, vec=2000)

# per-table select list with offsets applied; i is the replica index
TABLES = {
    "region": None,   # dimension: copy once, no replication
    "nation": None,
    "customer": ("c_custkey + i*{cust} AS c_custkey, c_name, c_nationkey, "
                 "c_acctbal, c_mktsegment"),
    "supplier": ("s_suppkey + i*{supp} AS s_suppkey, s_name, s_nationkey, "
                 "s_acctbal"),
    "part": ("p_partkey + i*{part} AS p_partkey, p_name, p_brand, p_type, "
             "p_size, p_retailprice"),
    "orders": ("o_orderkey + i*{order} AS o_orderkey, "
               "o_custkey + i*{cust} AS o_custkey, o_orderstatus, "
               "o_totalprice, o_orderdate, o_orderpriority"),
    "lineitem": ("l_orderkey + i*{order} AS l_orderkey, "
                 "l_partkey + i*{part} AS l_partkey, "
                 "l_suppkey + i*{supp} AS l_suppkey, l_linenumber, "
                 "l_quantity, l_extendedprice, l_discount, l_tax, "
                 "l_returnflag, l_linestatus, l_shipdate"),
    "events": ("event_id + i*{event} AS event_id, ts, "
               "user_id + i*{user} AS user_id, event_type, value, props"),
    "documents": ("doc_id + i*{doc} AS doc_id, "
                  "CASE WHEN i = 0 THEN text ELSE text || ' rep' || i END AS text, "
                  "lang, source, "
                  "CASE WHEN i = 0 THEN n_chars "
                  "ELSE n_chars + length(' rep' || i) END AS n_chars"),
    "embeddings": "vec_id + i*{vec} AS vec_id, embedding, label",
}

for t, sel in TABLES.items():
    out = f"{dst}/{t}.parquet"
    if sel is None:
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}' (FORMAT PARQUET)")
    else:
        cols = sel.format(**OFF)
        con.execute(
            f"COPY (SELECT {cols} FROM '{src}/{t}.parquet' "
            f"CROSS JOIN (SELECT unnest(range({K})) AS i) r "
            f"ORDER BY i) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{t:12s} {n:>9,d} rows -> {out}")
