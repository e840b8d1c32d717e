#!/usr/bin/env python3
"""Local emulation of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet dump (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
sfDir parquet tables, sorts columns by name, and compares row-by-row.
Dev tool only — NOT part of the library (runs on the driver-side python).
"""
import json
import math
import sys
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Driver-faithful: floats compared at FULL precision (repr), because the
    # driver hashes exact values — a last-ulp difference is a real FAIL.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


# Output column types that crash or type-mismatch the driver's pandas-based
# compare (CORRECTNESS_r01): lists/maps/binary are unhashable in its sort;
# DECIMAL reaches pandas as Decimal from Spark parquet but float64 from
# DuckDB, so equal values still hash-mismatch (trailing-zero repr).
def risky_cols(schema):
    import pyarrow.types as pt
    out = []
    for f in schema:
        t = f.type
        if (pt.is_decimal(t) or pt.is_list(t) or pt.is_large_list(t)
                or pt.is_map(t) or pt.is_binary(t) or pt.is_large_binary(t)
                or pt.is_struct(t)):
            out.append((f.name, str(t)))
    return out


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm(v) for v in row) for row in zip(*data)]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            duck_tbl = con.execute(sql).fetch_arrow_table()
            risky = risky_cols(spark_tbl.schema)
            if risky:
                print(f"FAIL {name}: driver-hostile output column types {risky}")
                n_fail += 1
                continue
            scols, srows = rows_of(spark_tbl)
            dcols, drows = rows_of(duck_tbl)
            if scols != dcols:
                print(f"FAIL {name}: columns spark={scols} duck={dcols}")
                n_fail += 1
                continue
            if len(srows) != len(drows):
                print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
                n_fail += 1
                continue
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
            if bad:
                i, a, b = bad[0]
                print(f"FAIL {name}: {len(bad)} mismatched rows; first at {i}:")
                print(f"  cols : {scols}")
                print(f"  spark: {a}")
                print(f"  duck : {b}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(srows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
