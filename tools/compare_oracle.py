#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet dump, runs the matching oracle SQL
from oracle_sql.json against the sf parquet tables in DuckDB, sorts columns
by name and rows by all columns, and reports row/schema/value mismatches.
Dev tool only (driver-side python); the engine itself never depends on it.
"""
import json
import os
import math
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # driver compares hashed string forms; normalize -0.0 and
                # collapse float noise the same way a str() round-trip would
                if v == 0:
                    v = 0.0
                vals.append(f"{v!r}")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single parquet FILES; MakeScaled corpora are
        # Spark DIRECTORIES of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    n_ok = n_bad = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_rows, s_cols = spark.fetchall(), [d[0] for d in spark.description]
        except Exception as e:
            print(f"FAIL {name}: no spark dump ({e})")
            n_bad += 1
            continue
        try:
            duck = con.execute(sql)
            d_rows, d_cols = duck.fetchall(), [d[0] for d in duck.description]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        sc, scols = canon(s_rows, s_cols)
        dc, dcols = canon(d_rows, d_cols)
        if scols != dcols:
            print(f"FAIL {name}: schema {scols} vs {dcols}")
            n_bad += 1
        elif len(sc) != len(dc):
            print(f"FAIL {name}: rows {len(sc)} vs {len(dc)}")
            n_bad += 1
        elif sc != dc:
            diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            n_bad += 1
        else:
            print(f"ok   {name}: {len(sc)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
