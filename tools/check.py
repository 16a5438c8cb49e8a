#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [out_dir]

Assumes `graft.Verify` already wrote <out_dir>/<name>/ parquet dirs and
<out_dir>/oracle_sql.json. Registers each testdata parquet as a DuckDB
view, runs every oracle, and compares (columns sorted by name, rows
sorted, values stringified) against the Spark output.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)
    return df.map(cell)

fails = 0
for name, sql in sorted(oracles.items()):
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{out}/{name}/*.parquet"))])
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        fails += 1
        continue
    w, g = norm(want), norm(got)
    if list(w.columns) != list(g.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(w.columns)}")
        fails += 1
        continue
    w2 = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    g2 = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    if len(w2) != len(g2):
        print(f"FAIL {name}: rows {len(g2)} vs oracle {len(w2)}")
        fails += 1
        continue
    if not w2.equals(g2):
        diff = (w2 != g2).any(axis=1)
        idx = diff[diff].index[:3]
        print(f"FAIL {name}: value mismatch at rows {list(idx)}")
        for i in idx:
            print(f"  oracle: {w2.loc[i].to_dict()}")
            print(f"  spark : {g2.loc[i].to_dict()}")
        fails += 1
        continue
    print(f"PASS {name} ({len(g2)} rows)")

print(f"\n{len(oracles) - fails}/{len(oracles)} pass")
sys.exit(1 if fails else 0)
