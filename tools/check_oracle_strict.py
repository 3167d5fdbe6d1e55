#!/usr/bin/env python3
"""Driver-faithful replica of the DuckDB-oracle gate.

Usage: python3 tools/check_oracle_strict.py <verify_out_dir> <sf_dir>

Unlike check_oracle.py (which compares via fetchall() + 9-sig-digit
rounding), this goes through the same pandas conversion path the driver
uses: DuckDB results via .df() (where HUGEINT becomes float64) and Spark
parquet via pyarrow.to_pandas(), then sorts rows by all columns and
compares cell reprs EXACTLY (no float rounding). Catches:
  - DuckDB sum(INTEGER) -> HUGEINT -> float64 ("5.0" != "5")
  - list/array result columns (pandas lexsort crashes on ndarray cells)
  - last-ulp float differences masked by rounding
"""
import json
import math
import sys

import duckdb
import numpy as np
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # int widths compare equal (q16 int32-vs-BIGINT passed the driver),
    # but int-vs-float stays different ("5" vs "5.0"): that is exactly the
    # HUGEINT->float64 rendering the driver trips on.
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def cells(df):
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(norm(v) for v in row))
    return sorted(out)


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
            sdf = pq.read_table(f"{out_dir}/{name}").to_pandas()
            ddf = con.execute(sql).df()
            sdf.columns = [c.lower() for c in sdf.columns]
            ddf.columns = [c.lower() for c in ddf.columns]
            sdf = sdf[sorted(sdf.columns)]
            ddf = ddf[sorted(ddf.columns)]
            # the driver sorts with pandas; unhashable cells (ndarray) die here
            sdf = sdf.sort_values(by=list(sdf.columns))
            ddf = ddf.sort_values(by=list(ddf.columns))
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} "
                  f"duckdb={list(ddf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duckdb={len(ddf)}")
            n_fail += 1
            continue
        sr, dr = cells(sdf), cells(ddf)
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
