#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in
sfDir, named by basename), sorts columns by name, and compares values.
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def load_spark(result_dir):
    files = sorted(glob.glob(os.path.join(result_dir, "*.parquet")))
    if not files:
        return None
    return pq.read_table(files).to_pandas()

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    dirs = set(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
    # a query that errored in Verify writes no dir — that's a failure, not
    # a silent skip
    names = sorted(dirs | set(oracle.keys()))
    n_pass = n_fail = 0
    for name in names:
        spark_df = load_spark(os.path.join(out_dir, name))
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(spark_df)} rows)"); continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sc = sorted(spark_df.columns); dc = sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}"); n_fail += 1; continue
        s = spark_df[sc]; d = duck_df[sc]
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        # dtype check (schema part of driver gate)
        dt_mismatch = [(c, str(s[c].dtype), str(d[c].dtype)) for c in sc
                       if str(s[c].dtype) != str(d[c].dtype)]
        bad = []
        for c in sc:
            sv = [norm(x) for x in s[c].tolist()]
            dv = [norm(x) for x in d[c].tolist()]
            for i, (a, b) in enumerate(zip(sv, dv)):
                if a != b and str(a) != str(b):
                    bad.append((c, i, a, b))
                    if len(bad) > 3:
                        break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: value mismatches {bad[:4]}")
            n_fail += 1
        elif dt_mismatch:
            print(f"WARN {name}: values ok, dtypes differ {dt_mismatch}")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
