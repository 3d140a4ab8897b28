#!/usr/bin/env python3
"""Type-class sweep of oracle SQL vs Spark verify dumps.

The driver's compare hashes TYPED values, so a DuckDB HUGEINT (what
SUM(BIGINT) and window-SUM return) against a Spark BIGINT is a hash
mismatch even when every value is equal — and tools/compare_oracle.py
cannot see it because Python fetchall erases the type (the r3 d59 red).

Usage: check_oracle_types.py <sfDir> <verifyOutDir> [query ...]
For each oracle query: DESCRIBE it in DuckDB, read the matching Spark
parquet dump schema via pyarrow, and flag any column whose DuckDB type
class differs from the Spark one. Dev tool only (driver-side python).
"""
import json
import re
import sys

import duckdb
import pyarrow.parquet as pq
import glob

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# duckdb type -> canonical class comparable to an arrow type class
def duck_class(t):
    t = t.upper()
    if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
             "USMALLINT", "UTINYINT", "HUGEINT"):
        return t  # integers must match EXACTLY (HUGEINT vs BIGINT is the bug)
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "DOUBLE" if t == "DOUBLE" else "FLOAT"
    if t.startswith("DECIMAL"):
        return t
    if t == "VARCHAR":
        return "STRING"
    if t == "BOOLEAN":
        return "BOOL"
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if t == "DATE":
        return "DATE"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("LIST"):
        return "NESTED"
    return t

def arrow_class(t):
    s = str(t)
    if s == "int64": return "BIGINT"
    if s == "int32": return "INTEGER"
    if s == "int16": return "SMALLINT"
    if s == "int8": return "TINYINT"
    if s == "double": return "DOUBLE"
    if s == "float": return "FLOAT"
    if s in ("string", "large_string"): return "STRING"
    if s == "bool": return "BOOL"
    if s.startswith("timestamp"): return "TIMESTAMP"
    if s.startswith("date"): return "DATE"
    if s.startswith("decimal"):
        m = re.match(r"decimal\d*\((\d+),\s*(\d+)\)", s)
        return f"DECIMAL({m.group(1)},{m.group(2)})" if m else "DECIMAL"
    if s.startswith(("list", "struct", "large_list")): return "NESTED"
    return s

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_flag = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"{name}: DESCRIBE failed: {e}")
            n_flag += 1
            continue
        duck = {r[0]: duck_class(r[1]) for r in desc}
        parts = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not parts:
            # a missing dump means the sweep did NOT check this query — a
            # stale/wrong outDir must not exit 0 "OK" (vacuous pass)
            print(f"{name}: no spark dump found, duck types: {duck}")
            n_flag += 1
            continue
        spark = {f.name: arrow_class(f.type) for f in pq.read_schema(parts[0])}
        for col in sorted(set(duck) | set(spark)):
            d, s = duck.get(col), spark.get(col)
            if d is None or s is None:
                print(f"{name}.{col}: MISSING one side (duck={d}, spark={s})")
                n_flag += 1
            elif d != s:
                print(f"{name}.{col}: duck={d} spark={s}")
                n_flag += 1
    print(f"{'FLAGGED ' + str(n_flag) if n_flag else 'OK: all'} columns"
          f" checked across {len(oracle)} oracle queries")
    sys.exit(1 if n_flag else 0)

if __name__ == "__main__":
    main()
