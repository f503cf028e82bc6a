#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB — the driver's compare step runs these
sequentially, so the sum here is the DuckDB half of the round's gate
wall-clock. Use to find the rows worth optimizing.

Usage: python3 tools/time_oracles.py [sfDir] [verifyOut] [top]
"""
import sys, json, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
top = int(sys.argv[3]) if len(sys.argv) > 3 else 30

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
times = {}
t_all = time.time()
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).df()
        times[name] = time.time() - t0
    except Exception as e:
        times[name] = time.time() - t0
        print(f"ERROR {name}: {e}")
total = time.time() - t_all
print(f"\ntotal {total:.1f}s over {len(oracle)} oracles")
for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:top]:
    print(f"{dt:8.2f}s  {name}")
