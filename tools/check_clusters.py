#!/usr/bin/env python3
"""Scale-path verifier for dedup_clusters.

The gate oracle proves connected components with a recursive reachability
CTE — exact, but it materializes every (node, reachable-label) pair, i.e.
O(sum cluster_size^2) rows REVISITED each fixpoint round. At sf0.01 that is
instant; at sf1 the verbatim 10x replicas make 30-member clusters and the
CTE runs for an hour. This tool verifies the SAME answer with iterative
min-label propagation over temp tables (the Spark side's own algorithm,
independently re-implemented in DuckDB SQL): O(edges) work per round,
diameter-many rounds.

Usage: tools/check_clusters.py <sfdir> <verify_out_dir>
  e.g. tools/check_clusters.py /root/repo/.scale/sf1 /tmp/graft_verify_XXXX
"""
import json, sys, time

import duckdb

SFDIR, OUT = sys.argv[1], sys.argv[2]

con = duckdb.connect()
import os
docs = f"{SFDIR}/documents.parquet"
docs = f"{docs}/*.parquet" if os.path.isdir(docs) else docs
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))["dedup_clusters"]
# reuse the oracle's own corpus->signatures->candidates chain verbatim;
# swap the recursive reach/comp for iterative propagation
prefix = oracle.split(",\nreach(")[0].replace("WITH RECURSIVE", "WITH")
assert prefix.endswith("UNION ALL SELECT doc_b, doc_a FROM cand)"), \
    "oracle SQL shape changed; update check_clusters.py"

t0 = time.time()
con.execute(f"CREATE TEMP TABLE edges AS {prefix} SELECT src, dst FROM edges")
con.execute("""CREATE TEMP TABLE lab AS
  SELECT src AS id, src AS label FROM edges GROUP BY 1, 2""")
print(f"[clusters] edges={con.execute('SELECT count(*) FROM edges').fetchone()[0]}"
      f" nodes={con.execute('SELECT count(*) FROM lab').fetchone()[0]}"
      f" ({time.time()-t0:.1f}s)", file=sys.stderr)

rounds = 0
while True:
    rounds += 1
    con.execute("""CREATE OR REPLACE TEMP TABLE nxt AS
      SELECT l.id, least(l.label, min(nl.label)) AS label
      FROM lab l JOIN edges e ON e.src = l.id JOIN lab nl ON nl.id = e.dst
      GROUP BY l.id, l.label""")
    changed = con.execute("""SELECT count(*) FROM nxt n JOIN lab l USING (id)
      WHERE n.label <> l.label""").fetchone()[0]
    con.execute("CREATE OR REPLACE TEMP TABLE lab AS SELECT * FROM nxt")
    print(f"[clusters] round {rounds}: {changed} changed "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)
    if changed == 0:
        break

mine = sorted(con.execute("""
  SELECT label AS survivor, count(*) AS n_members FROM lab GROUP BY 1
""").fetchall())
spark = sorted(con.execute(
    f"SELECT survivor, n_members FROM read_parquet('{OUT}/dedup_clusters/*.parquet')"
).fetchall())
if mine == spark:
    print(f"PASS: dedup_clusters {len(mine)} clusters match "
          f"(iterative propagation, {rounds} rounds, {time.time()-t0:.1f}s)")
else:
    bad = next(((a, b) for a, b in zip(mine, spark) if a != b), None)
    sys.exit(f"FAIL: {len(mine)} vs {len(spark)} clusters; first diff {bad}")
