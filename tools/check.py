#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs graft.Verify (Spark) into a temp dir, then replays every oracle SQL in
DuckDB over the same parquet tables and diffs the results the way the driver
does: columns sorted by name, rows sorted, values compared.

Usage: tools/check.py [sfdir] [only_query ...]
"""
import json, math, subprocess, sys, tempfile, glob, os

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

out = os.environ.get("GRAFT_VERIFY_OUT")
if out:
    print(f"[replay] reusing Verify outputs in {out}", file=sys.stderr)
else:
    out = tempfile.mkdtemp(prefix="graft_verify_")
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS","8"))
    r = subprocess.run(["tools/run_local.sh","graft.Verify",SFDIR,out], env=env)
    if r.returncode != 0:
        sys.exit("Verify failed")

import duckdb

def fresh_con():
    # one connection per oracle: a single long-lived connection accumulates
    # enough buffer/temp state across ~100 replays that the heaviest oracle
    # can hit a DuckDB allocation failure late in the battery
    c = duckdb.connect()
    for t in TABLES:
        # a table may be a single file (driver layout) or a sharded directory
        # (make_sf1 layout) — glob the parts in the directory case
        path = f"{SFDIR}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return c

con = fresh_con()

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.4f}"
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)

fails, passes, skips = [], [], []
import time
for name in sorted(oracle):
    if ONLY and name not in ONLY: continue
    t0 = time.time()
    print(f"[oracle] {name} ...", file=sys.stderr, flush=True)
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append((name, "spark result missing")); continue
    con.close(); con = fresh_con()
    s = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
    scols = [d[0] for d in s.description]; srows = s.fetchall()
    try:
        o = con.execute(oracle[name])
        ocols = [d[0] for d in o.description]; orows = o.fetchall()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}")); continue
    if sorted(scols) != sorted(ocols):
        fails.append((name, f"schema mismatch spark={sorted(scols)} oracle={sorted(ocols)}")); continue
    a, b = canon(scols, srows), canon(ocols, orows)
    if len(a) != len(b):
        fails.append((name, f"row count spark={len(a)} oracle={len(b)}")); continue
    if a != b:
        diff = next((i for i,(x,y) in enumerate(zip(a,b)) if x != y), None)
        fails.append((name, f"value mismatch at sorted row {diff}: spark={a[diff]} oracle={b[diff]}")); continue
    passes.append(name)
    print(f"[oracle] {name} ok ({time.time()-t0:.1f}s)", file=sys.stderr, flush=True)

rows_only = [q for q in glob.glob(f"{out}/*/") if os.path.basename(q.rstrip('/')) not in oracle]
for q in sorted(rows_only):
    n = os.path.basename(q.rstrip('/'))
    if ONLY and n not in ONLY: continue
    cnt = con.execute(f"SELECT count(*) FROM read_parquet('{q}/*.parquet')").fetchone()[0]
    (passes if cnt > 0 else fails).append((n + " [rows-only]", "0 rows")[0:1][0] if cnt > 0 else (n, "rows-only: 0 rows"))

print(f"\nPASS ({len(passes)}):", *passes)
if fails:
    print(f"\nFAIL ({len(fails)}):")
    for n, why in fails: print(f"  {n}: {why}")
    sys.exit(1)
print("\nALL GREEN")
