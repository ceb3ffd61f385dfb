#!/usr/bin/env python3
"""Scale-path verifier for dedup_keep_best (same reason as
check_clusters.py: the gate oracle's recursive reachability CTE is
O(sum cluster_size^2) rows per fixpoint round — instant at sf0.01, ~an
hour against sf1's verbatim-replica clusters). This tool computes the
SAME components with iterative min-label propagation, then replays the
oracle's own quality + keep-window SQL verbatim on top.

Usage: tools/check_keepbest.py <sfdir> <verify_out_dir>
"""
import json, os, sys, time

import duckdb

SFDIR, OUT = sys.argv[1], sys.argv[2]

con = duckdb.connect()
docs = f"{SFDIR}/documents.parquet"
docs = f"{docs}/*.parquet" if os.path.isdir(docs) else docs
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))["dedup_keep_best"]
# reuse the oracle's corpus->signatures->candidates chain verbatim; swap
# the recursive reach/comp CTEs for iterative propagation (comp becomes a
# temp table the oracle's own q/j/final SQL resolves by name)
head = oracle.split(",\nreach(")[0].replace("WITH RECURSIVE", "WITH")
assert head.endswith("UNION ALL SELECT doc_b, doc_a FROM cand)"), \
    "oracle SQL shape changed; update check_keepbest.py"
tail = oracle.split(",\nq AS (", 1)[1]

t0 = time.time()
con.execute(f"CREATE TEMP TABLE edges AS {head} SELECT src, dst FROM edges")
con.execute("""CREATE TEMP TABLE lab AS
  SELECT src AS id, src AS label FROM edges GROUP BY 1, 2""")
print(f"[keepbest] edges={con.execute('SELECT count(*) FROM edges').fetchone()[0]}"
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
    print(f"[keepbest] round {rounds}: {changed} changed "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)
    if changed == 0:
        break

con.execute("CREATE TEMP TABLE comp AS SELECT id, label AS cluster FROM lab")
mine_sql = head + ",\nq AS (" + tail


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        return f"{v:.4f}" if isinstance(v, float) else str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


m = con.execute(mine_sql)
mcols = [d[0] for d in m.description]
mine = canon(mcols, m.fetchall())
s = con.execute(
    f"SELECT * FROM read_parquet('{OUT}/dedup_keep_best/*.parquet')")
scols = [d[0] for d in s.description]
spark = canon(scols, s.fetchall())
if sorted(mcols) != sorted(scols):
    sys.exit(f"FAIL: schema {sorted(mcols)} vs {sorted(scols)}")
if mine == spark:
    kept = con.execute(
        f"SELECT count(*) FILTER (kept) FROM "
        f"read_parquet('{OUT}/dedup_keep_best/*.parquet')").fetchone()[0]
    print(f"PASS: dedup_keep_best {len(mine)} rows match, {kept} kept "
          f"(iterative propagation, {rounds} rounds, {time.time()-t0:.1f}s)")
else:
    bad = next(((a, b) for a, b in zip(mine, spark) if a != b), None)
    sys.exit(f"FAIL: {len(mine)} vs {len(spark)} rows; first diff {bad}")
