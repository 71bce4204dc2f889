#!/usr/bin/env python3
"""Local oracle check: mimics the driver's DuckDB compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

For each query dumped by graft.Verify (<out>/<name>/ parquet + oracle_sql.json),
runs the oracle SQL in DuckDB over the same parquet tables and compares:
row count, column names, and a hash of values with columns sorted by name
and rows sorted by all columns.
"""
import json, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rel):
    df = rel.df()
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize value text: floats via repr of float64, others via str
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(tuple(canon_val(v) for v in tup))
    rows.sort()
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return list(df.columns), len(rows), h, rows


def canon_val(v):
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    try:
        import pandas as pd
        if pd.isna(v):
            return "NULL"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
    except (TypeError, ValueError):
        pass
    import numpy as np
    if isinstance(v, np.floating):
        return repr(float(v))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    import datetime
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    names = sorted(oracle) if not only else sorted(only)
    n_pass = n_fail = 0
    for name in names:
        sql = oracle.get(name)
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols, srows, shash, sdata = canon(spark_rel)
        except Exception as e:
            print(f"FAIL {name}: spark dump unreadable: {e}")
            n_fail += 1
            continue
        if sql is None:
            print(f"PASS(rows-only) {name}: rows={srows}")
            n_pass += 1
            continue
        try:
            ocols, orows, ohash, odata = canon(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif srows != orows:
            print(f"FAIL {name}: rows spark={srows} oracle={orows}")
            n_fail += 1
        elif shash != ohash:
            diff = [(a, b) for a, b in zip(sdata, odata) if a != b][:3]
            print(f"FAIL {name}: hash mismatch; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={srows}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
