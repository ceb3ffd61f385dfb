#!/usr/bin/env python3
"""Build a 20x documents-only replica ("sf2") for the dedup shingle-family
slope check (judge r11 stretch item: one more measured scale point for
dedup_ensemble / dedup_jaccard beyond sf1, confirming the O(candidates)
regroup stays linear before anyone runs it at 100x).

Same scheme as make_sf1.py (doc_id shifts by replica * (max+1), text
verbatim — heavy duplication IS the dedup stress case), restricted to the
one table the shingle family reads.

CEILING: the gate queries' twin-id corpora shift ids by +TwinShift
(graft.core.Tables.TwinShift = 10**9 since r14; it was 10**5 through r13,
which capped this replica at exactly R=20), so any replica output must
keep max(doc_id) < 10**9 — at sf0.1 (max id 4999, stride 5000) that
allows R up to 200000. Beyond the ceiling, twin ids collide with real
doc_ids and the near-dup corpora silently corrupt on BOTH engines; the
builders in DedupQueries assert the same ceiling at runtime
(assertTwinHeadroom).

Usage: tools/make_sf2_docs.py [out_dir]   (default /root/repo/.scale/sf2)
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf2"
R = 20

base = pq.read_table(f"{SRC}/documents.parquet")
stride = pc.max(base["doc_id"]).as_py() + 1
reps = []
for r in range(R):
    i = base.schema.get_field_index("doc_id")
    shifted = pc.add(base["doc_id"], r * stride).cast(base.schema.field(i).type)
    reps.append(base.set_column(i, base.schema.field(i), shifted))
out = pa.concat_tables(reps)
d = f"{OUT}/documents.parquet"
os.makedirs(d, exist_ok=True)
parts = 32
n = out.num_rows
for k in range(parts):
    lo, hi = n * k // parts, n * (k + 1) // parts
    if hi > lo:
        pq.write_table(out.slice(lo, hi - lo), f"{d}/part-{k:02d}.parquet")
print(f"documents: {base.num_rows} -> {out.num_rows} rows ({parts} parts) -> {d}")
