#!/usr/bin/env python3
"""Partition-count determinism check: run graft.Verify twice with
different local thread / shuffle-partition counts and assert every query's
output is BITWISE identical (rows compared as sorted text, so row order is
free but values are not).

Why: at 1000 executors every shuffle boundary moves; an operator whose
result depends on partition count (unstable aggregation order on doubles,
first-seen tie-breaks, nondeterministic sampling) looks green on any single
run and silently diverges on a real cluster. The repo's convention is
decimal-exact sums / pinned tie-breaks everywhere — this replays that claim
over the WHOLE battery instead of per-op specs.

Usage: tools/check_invariance.py [sfdir] [cpusA] [cpusB]
"""
import glob
import os
import subprocess
import sys
import tempfile

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
CPUS = (sys.argv[2] if len(sys.argv) > 2 else "32",
        sys.argv[3] if len(sys.argv) > 3 else "5")

here = os.path.dirname(os.path.abspath(__file__))
outs = []
for cpus in CPUS:
    out = tempfile.mkdtemp(prefix=f"graft_inv_{cpus}_")
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
    r = subprocess.run([f"{here}/run_local.sh", "graft.Verify", SFDIR, out],
                       env=env, stderr=subprocess.DEVNULL)
    if r.returncode != 0:
        sys.exit(f"Verify failed with SPARK_GRAFT_CPUS={cpus}")
    outs.append(out)

import duckdb

bad, n = [], 0
for d_a in sorted(glob.glob(f"{outs[0]}/*")):
    name = os.path.basename(d_a)
    if name == "oracle_sql.json":
        continue
    d_b = f"{outs[1]}/{name}"
    con = duckdb.connect()
    try:
        def h(d):
            return con.execute(
                "SELECT md5(string_agg(rowtxt,'|' ORDER BY rowtxt)) FROM "
                f"(SELECT CAST(t AS VARCHAR) rowtxt "
                f" FROM read_parquet('{d}/*.parquet') t)").fetchone()[0]
        if h(d_a) != h(d_b):
            bad.append(name)
        n += 1
    except Exception as e:  # noqa: BLE001 - report and keep scanning
        bad.append(f"{name} ERR {e}")
    finally:
        con.close()

if bad:
    sys.exit(f"PARTITION-DEPENDENT ({len(bad)}/{n}): " + " ".join(bad))
print(f"ALL {n} queries bitwise identical at local[{CPUS[0]}] vs "
      f"local[{CPUS[1]}] on {SFDIR}")

# The two legs already executed the full battery — keep their per-query
# wall timings (graft.Verify writes verify_times.json per leg) as a free
# paired measurement. These are VERIFY-leg numbers (include the
# repartition(1) parquet write, no warmup/best-of-N), so they support
# cross-leg ranking and drift diffs, not headline claims — Bench with
# GRAFT_BENCH_PASSES/battery_state stays the official wall-clock.
import json
legs = []
for cpus, out in zip(CPUS, outs):
    p = f"{out}/verify_times.json"
    if os.path.isfile(p):
        legs.append(json.load(open(p)))
if legs:
    with open("invariance_times.json", "w") as f:
        json.dump({"sf": SFDIR, "legs": legs}, f)
    for leg in legs:
        print(f"[inv-times] local[{leg['cpus']}]: total {leg['total']}s, "
              f"loadavg_mean {leg['loadavg_mean']}")
    print("[inv-times] per-query pair -> invariance_times.json")
