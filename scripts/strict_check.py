#!/usr/bin/env python3
"""Stricter local oracle compare than oracle_check.py: full-precision float
repr (no 9-sig-digit truncation) plus dtype report, to catch the class of
hash mismatch the driver's gate sees (e.g. DuckDB HUGEINT sums or `/`
promoting to DOUBLE while Spark emits BIGINT).

Usage: python3 scripts/strict_check.py <sfDir> <outDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)  # full precision
    return str(v)


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle_sql.items()):
        if only and name not in only:
            continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            failures += 1
            continue
        dt_g, dt_w = list(map(str, got.dtypes)), list(map(str, want.dtypes))
        if dt_g != dt_w:
            print(f"DTYPE {name}: spark={dict(zip(got.columns, dt_g))}")
            print(f"      oracle={dict(zip(want.columns, dt_w))}")
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        g = got.map(cell) if hasattr(got, "map") else got.applymap(cell)
        w = want.map(cell) if hasattr(want, "map") else want.applymap(cell)
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL  {name}: value mismatch at {int(diff.sum())} rows, first {list(idx)}")
            for i in idx:
                for c in got.columns:
                    if g.loc[i, c] != w.loc[i, c]:
                        print(f"      col={c} spark={g.loc[i, c]} duck={w.loc[i, c]}")
            failures += 1
            continue
        print(f"OK    {name} ({len(got)} rows)")
    print(f"\nfailures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
