#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (t2).

Usage: python3 tools/check.py [sfDir] [verifyOut]

Reads each <verifyOut>/<name> parquet (Spark result) and runs the
matching SQL from <verifyOut>/oracle_sql.json in DuckDB with views
named after the fixture tables. Compares after sorting columns by name:
shape, schema (loose numeric families), and exact values (with a float
report when exactness fails).
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(exp.columns)}"); fails += 1; continue
    if got.shape != exp.shape:
        print(f"FAIL {name}: shape spark={got.shape} oracle={exp.shape}"); fails += 1; continue
    ok = True
    for c in got.columns:
        g, e = got[c], exp[c]
        if str(g.dtype) != str(e.dtype):
            gk = g.dtype.kind if hasattr(g.dtype, "kind") else "O"
            ek = e.dtype.kind if hasattr(e.dtype, "kind") else "O"
            # The driver hashes rendered values: int64 5 vs float64 5.0
            # hash differently even when numerically identical (the r9
            # classifier_train_gd red row — DuckDB HUGEINT promotion).
            # A cross-family int/float (or numeric/object) split is
            # therefore a driver-hash FAIL, not a cosmetic note.
            if gk != ek:
                int_kinds = {"i", "u"}
                num_kinds = {"i", "u", "f"}
                hard = ((gk in int_kinds) != (ek in int_kinds)
                        or (gk in num_kinds) != (ek in num_kinds))
                tag = "FAIL" if hard else "    "
                print(f"{tag} {name}.{c}: dtype spark={g.dtype} oracle={e.dtype}")
                if hard:
                    ok = False
                    if (gk in num_kinds) != (ek in num_kinds):
                        # numeric-vs-object: value compare below would
                        # crash on to_numpy(float); the dtype FAIL is
                        # the verdict, skip the column
                        continue
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            ga, ea = g.to_numpy(dtype=float), e.to_numpy(dtype=float)
            both_nan = np.isnan(ga) & np.isnan(ea)
            eq = (ga == ea) | both_nan
            if not eq.all():
                bad = (~eq).sum()
                md = np.nanmax(np.abs(ga - ea))
                print(f"FAIL {name}.{c}: {bad} float mismatches, maxdiff={md:.3e}")
                ok = False
        else:
            eq = (g.astype(str) == e.astype(str)) | (g.isna() & e.isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                print(f"FAIL {name}.{c}: {(~eq).sum()} mismatches, first row {i}: "
                      f"spark={g.iloc[i]!r} oracle={e.iloc[i]!r}")
                ok = False
    if ok:
        print(f"PASS {name} ({got.shape[0]} rows)")
    else:
        fails += 1
print(f"\n{len(oracle)-fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
