#!/usr/bin/env python3
"""Generalized scale-path verifier for every gate query whose oracle embeds
the recursive-reachability component CTE (dedup_keep_best, dedup_leak_split,
and any future cluster-keyed op).

Same reason as check_clusters.py: the recursive `reach` CTE materializes
O(sum cluster_size^2) (node, label) rows per fixpoint round — instant at
sf0.01, ~an hour per query against sf1's verbatim-replica clusters. This
tool computes the SAME components with iterative min-label propagation over
temp tables, then replays the oracle's own post-component SQL verbatim on
top (the WITH head builds corpus/signatures/candidates exactly as the gate
does; `edges`/`comp` resolve to the propagated temp tables).

Usage: tools/check_components.py <sfdir> <verify_out_dir> <query> [query ...]
  e.g. tools/check_components.py /root/repo/.scale/sf1 /tmp/v_sf1 \
         dedup_keep_best dedup_leak_split
"""
import json, os, sys, time

import duckdb

SFDIR, OUT = sys.argv[1], sys.argv[2]
QUERIES = sys.argv[3:] or ["dedup_keep_best", "dedup_leak_split"]

COMP_CTE = "comp AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id)"

oracles = json.load(open(f"{OUT}/oracle_sql.json"))


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        return f"{v:.4f}" if isinstance(v, float) else str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


fails = []
for q in QUERIES:
    oracle = oracles[q]
    head = oracle.split(",\nreach(")[0].replace("WITH RECURSIVE", "WITH")
    assert head.endswith("UNION ALL SELECT doc_b, doc_a FROM cand)"), \
        f"{q}: oracle SQL shape changed; update check_components.py"
    assert COMP_CTE in oracle, \
        f"{q}: component CTE shape changed; update check_components.py"
    tail = oracle.split(COMP_CTE, 1)[1]  # starts ",\n<next cte> AS ("

    con = duckdb.connect()
    docs = f"{SFDIR}/documents.parquet"
    docs = f"{docs}/*.parquet" if os.path.isdir(docs) else docs
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")

    t0 = time.time()
    con.execute(f"CREATE TEMP TABLE edges AS {head} SELECT src, dst FROM edges")
    con.execute("""CREATE TEMP TABLE lab AS
      SELECT src AS id, src AS label FROM edges GROUP BY 1, 2""")
    print(f"[{q}] edges="
          f"{con.execute('SELECT count(*) FROM edges').fetchone()[0]}"
          f" nodes={con.execute('SELECT count(*) FROM lab').fetchone()[0]}"
          f" ({time.time()-t0:.1f}s)", file=sys.stderr)

    rounds = 0
    while True:
        rounds += 1
        con.execute("""CREATE OR REPLACE TEMP TABLE nxt AS
          SELECT l.id, least(l.label, min(nl.label)) AS label
          FROM lab l JOIN edges e ON e.src = l.id JOIN lab nl ON nl.id = e.dst
          GROUP BY l.id, l.label""")
        changed = con.execute(
            """SELECT count(*) FROM nxt n JOIN lab l USING (id)
               WHERE n.label <> l.label""").fetchone()[0]
        con.execute("CREATE OR REPLACE TEMP TABLE lab AS SELECT * FROM nxt")
        if changed == 0:
            break
    print(f"[{q}] propagation converged: {rounds} rounds "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    con.execute("CREATE TEMP TABLE comp AS SELECT id, label AS cluster FROM lab")
    m = con.execute(head + tail)
    mcols = [d[0] for d in m.description]
    mine = canon(mcols, m.fetchall())
    s = con.execute(f"SELECT * FROM read_parquet('{OUT}/{q}/*.parquet')")
    scols = [d[0] for d in s.description]
    spark = canon(scols, s.fetchall())
    if sorted(mcols) != sorted(scols):
        fails.append(f"{q}: schema {sorted(mcols)} vs {sorted(scols)}")
    elif mine != spark:
        i = next((k for k, (a, b) in enumerate(zip(mine, spark)) if a != b),
                 None)
        fails.append(f"{q}: {len(mine)} vs {len(spark)} rows, first diff at "
                     f"sorted row {i}")
    else:
        print(f"PASS: {q} {len(mine)} rows match "
              f"(iterative propagation, {rounds} rounds, "
              f"{time.time()-t0:.1f}s)")
    con.close()

if fails:
    sys.exit("FAIL: " + "; ".join(fails))
