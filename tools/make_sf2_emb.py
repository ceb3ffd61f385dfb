#!/usr/bin/env python3
"""Build a 20x embeddings replica ("sf2 embeddings", ~400k rows of 64-dim
vectors) for the distributed-Lloyd's scale point (judge r12 stretch item
7): the r12 nlist=16384 measurement sampled from only 20k vectors, so
sampleEff = 8*nlist = 131072 silently clamped to the whole corpus — this
replica makes the 100 TB sizing row (nlistFor(1e9) = 16384) cite a fit
whose md5-rank sample is fully realized against a corpus larger than the
sample.

vec_id shifts by replica * (max+1); vectors are verbatim copies (the
trainer's md5-rank sample and argmin work don't care about vector
uniqueness, only row count and dims).

Usage: tools/make_sf2_emb.py [out_dir]   (default /root/repo/.scale/sf2)
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/repo/.scale/sf1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf2"
R = 20

base = pq.read_table(f"{SRC}/embeddings.parquet")
stride = pc.max(base["vec_id"]).as_py() + 1
reps = []
for r in range(R):
    i = base.schema.get_field_index("vec_id")
    shifted = pc.add(base["vec_id"], r * stride).cast(base.schema.field(i).type)
    reps.append(base.set_column(i, base.schema.field(i), shifted))
out = pa.concat_tables(reps)
d = f"{OUT}/embeddings.parquet"
os.makedirs(d, exist_ok=True)
parts = 32
n = out.num_rows
for k in range(parts):
    lo, hi = n * k // parts, n * (k + 1) // parts
    if hi > lo:
        pq.write_table(out.slice(lo, hi - lo), f"{d}/part-{k:02d}.parquet")
print(f"embeddings: {base.num_rows} -> {out.num_rows} rows ({parts} parts) -> {d}")
