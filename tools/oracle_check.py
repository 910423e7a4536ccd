#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view named after the table,
runs every oracle_sql.json entry, and compares against the Spark parquet
dump: schema (column names), row count, and exact values (doubles compared
bitwise via struct pack) after sorting columns by name and rows canonically.
"""
import json, struct, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not spark_files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = pd.concat(
        [pq.read_table(f).to_pandas() for f in spark_files], ignore_index=True)
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fail += 1
        continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} vs {wc}")
        fail += 1
        continue
    got, want = got[gc], want[wc]
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        fail += 1
        continue

    def canon(df):
        rows = []
        for t in df.itertuples(index=False):
            row = []
            for v in t:
                if isinstance(v, float):
                    row.append(struct.pack("<d", v).hex())
                else:
                    row.append(str(v))
            rows.append(tuple(row))
        return sorted(rows)

    g, w = canon(got), canon(want)
    if g != w:
        bad = [i for i, (x, y) in enumerate(zip(g, w)) if x != y][:3]
        print(f"FAIL {name}: value mismatch at sorted rows {bad}")
        for i in bad:
            print("  spark:", g[i])
            print("  duck :", w[i])
        fail += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")

print("RESULT:", "FAIL" if fail else "ALL OK", f"({len(oracle)-fail}/{len(oracle)})")
sys.exit(1 if fail else 0)
