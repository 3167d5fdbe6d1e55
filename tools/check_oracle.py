#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dump in verify_out_dir, runs the matching SQL from
oracle_sql.json in DuckDB (tables = views over the sf_dir parquet files) and
compares: column names (sorted), row counts, and cell values (rows sorted by
all columns, doubles rounded to 9 significant digits).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            s_cols = spark_tbl.column_names
            s_rows = [tuple(d.values()) for d in spark_tbl.to_pylist()]
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sc, sr = norm_table(s_cols, s_rows)
        dc, dr = norm_table([c.lower() for c in d_cols], d_rows)
        sc = [c.lower() for c in sc]
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duckdb={len(dr)}")
            n_fail += 1
            continue
        if sr != dr:
            bad = next(i for i in range(len(sr)) if sr[i] != dr[i])
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  spark : {sr[bad]}")
            print(f"  duckdb: {dr[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
