#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and report per-query match.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, rows by value; normalize floats."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        return str(v)

    out = sorted(tuple(norm(r[i]) for i in idx) for r in rows)
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql)
            exp_cols, exp_rows = canon(exp.fetchall(), exp.columns)
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got_rows = canon(got.fetchall(), got.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: ERROR {e}")
            bad += 1
            continue
        if exp_cols != got_cols:
            print(f"FAIL  {name}: cols exp={exp_cols} got={got_cols}")
            bad += 1
        elif exp_rows != got_rows:
            diff1 = [r for r in exp_rows if r not in got_rows][:3]
            diff2 = [r for r in got_rows if r not in exp_rows][:3]
            print(f"FAIL  {name}: {len(exp_rows)} oracle vs {len(got_rows)} spark rows;"
                  f" oracle-only={diff1} spark-only={diff2}")
            bad += 1
        else:
            print(f"OK    {name}: {len(got_rows)} rows")
            ok += 1
    print(f"== {ok} ok, {bad} fail ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
