#!/usr/bin/env python3
"""Build a 10x scale-stress replica ("sf1") of the driver's sf0.1 tables.

The driver only generates sf0.001/0.01/0.1; the scale-proof run (judge
round-3 item 4) needs one more 10x step. This is NOT new synthetic data:
every row derives from the driver's sf0.1 parquet by replication with
key-shifting, so the relational structure (join fan-outs, value
distributions, text corpus) is the driver's own at 10x volume, and the
DuckDB oracle reads the SAME files as Spark, keeping the correctness gate
meaningful at sf1.

Scheme: dimension tables (region, nation) copy through; every scaled
table's primary key shifts by replica*stride (stride = max_key+1), and
fact tables shift their foreign keys into the matching replica, so each
replica is a self-consistent shard — exactly how a 10x-bigger generator
would lay out keys. Embedding element 0 gets a +replica*1e-4 nudge so
replicated vectors are near-duplicates, not exact cosine ties (ties would
make ANN top-k cuts engine-dependent and the gate flaky). Text is copied
verbatim on purpose: a 10x corpus of heavy exact/near duplicates is the
dedup stress case.

Usage: tools/make_sf1.py [out_dir]   (default /root/repo/.scale/sf1)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
R = 10

# table -> columns to shift by replica * (max(primary)+1 of the OWNING table)
SHIFTS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY = ["region", "nation"]

os.makedirs(OUT, exist_ok=True)
tables = {t: pq.read_table(f"{SRC}/{t}.parquet")
          for t in COPY + list(SHIFTS)}

stride = {}
for owner, key in {v for cols in SHIFTS.values() for v in cols.values()}:
    stride[(owner, key)] = pc.max(tables[owner][key]).as_py() + 1

for t in COPY:
    pq.write_table(tables[t], f"{OUT}/{t}.parquet")
    print(f"{t}: copied ({tables[t].num_rows} rows)")

for t, shifts in SHIFTS.items():
    base = tables[t]
    replicas = []
    for r in range(R):
        rep = base
        for col, ownerkey in shifts.items():
            i = rep.schema.get_field_index(col)
            shifted = pc.add(rep[col], r * stride[ownerkey])
            rep = rep.set_column(i, rep.schema.field(i), shifted.cast(
                rep.schema.field(i).type))
        if t == "embeddings" and r > 0:
            i = rep.schema.get_field_index("embedding")
            emb = rep["embedding"].combine_chunks()
            vals = np.asarray(emb.values, dtype=np.float32).copy()
            offs = np.asarray(emb.offsets)[:-1]
            vals[offs] += np.float32(r * 1e-4)  # break exact cosine ties
            nudged = pa.ListArray.from_arrays(emb.offsets,
                                              pa.array(vals, pa.float32()))
            rep = rep.set_column(i, rep.schema.field(i),
                                 nudged.cast(rep.schema.field(i).type))
        replicas.append(rep)
    out = pa.concat_tables(replicas)
    # Shard each scaled table into many part files under a <table>.parquet/
    # DIRECTORY (the layout a real lake has). A single small parquet file is
    # one Spark input split no matter how many rows it holds — compressed
    # text expands 10-50x in compute, so a 5 MB single-file documents table
    # turns every heavy per-doc expression into a single-core straggler.
    # 32 parts = one split per local core; at cluster scale the same tables
    # would be thousands of files and this is a non-issue.
    d = f"{OUT}/{t}.parquet"
    os.makedirs(d, exist_ok=True)
    parts = 32
    n = out.num_rows
    for k in range(parts):
        lo = n * k // parts
        hi = n * (k + 1) // parts
        if hi > lo:
            pq.write_table(out.slice(lo, hi - lo),
                           f"{d}/part-{k:02d}.parquet")
    print(f"{t}: {base.num_rows} -> {out.num_rows} rows ({parts} parts)")
print(f"done -> {OUT}")
