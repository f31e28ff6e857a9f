#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py [sf_dir] [out_dir]
Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran.
For each query dir in out_dir: load the Spark parquet result, run the
matching oracle SQL in DuckDB over the sf_dir tables, sort columns by
name, compare row count, schema (column names), and exact values.
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(os.path.join(OUT, "oracle_sql.json")))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def cell_eq(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b

fails = 0
for name in sorted(oracle):
    pq_dir = os.path.join(OUT, name)
    files = glob.glob(os.path.join(pq_dir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output at {pq_dir}")
        fails += 1
        continue
    try:
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        duck_df = norm(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    ok = True
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        ok = False
    elif len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        ok = False
    else:
        sv, dv = spark_df.values, duck_df.values
        for i in range(len(sv)):
            for j in range(sv.shape[1]):
                if not cell_eq(sv[i][j], dv[i][j]):
                    print(f"FAIL {name}: value mismatch row {i} col {spark_df.columns[j]}: "
                          f"spark={sv[i][j]!r} duck={dv[i][j]!r}")
                    ok = False
                    break
            if not ok:
                break
    # dtype report (informational — driver may or may not check)
    if ok:
        dt_s = [str(t) for t in spark_df.dtypes]
        dt_d = [str(t) for t in duck_df.dtypes]
        flag = "" if dt_s == dt_d else f"  [dtypes spark={dt_s} duck={dt_d}]"
        print(f"PASS {name}: {len(spark_df)} rows{flag}")
    else:
        fails += 1

extra = [d for d in os.listdir(OUT)
         if os.path.isdir(os.path.join(OUT, d)) and d not in oracle]
if extra:
    print(f"NOTE rows-only (no oracle): {sorted(extra)}")
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} "
      f"({len(oracle)} oracle queries)")
sys.exit(1 if fails else 0)
