#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB differential oracle.

NOT part of the engine (driver-side tooling only): runs each oracle SQL
from <outdir>/oracle_sql.json in DuckDB against the parquet test tables,
loads the engine's parquet output for the same query, sorts columns by
name and rows by all columns, and compares cell-by-cell.

Usage: python3 tools/compare_oracle.py <sfdir> <outdir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    # Scalar nulls of any dtype (None, NaN, NaT) compare equal — pandas
    # NaT == NaT is False, which would flag matching NULL timestamps.
    # Arrays (e.g. embedding cells) skip this: pd.isna would be elementwise.
    if not isinstance(a, (list, tuple)) and not hasattr(a, "__len__"):
        import pandas as pd
        an, bn = pd.isna(a), pd.isna(b)
        if isinstance(an, bool) and isinstance(bn, bool) and (an or bn):
            return an and bn
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
            ref = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        mine, ref = canon(mine), canon(ref)
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != {len(ref)}")
            n_fail += 1
            continue
        # dtype report (driver may compare schemas; surface mismatches)
        dt_mine, dt_ref = list(map(str, mine.dtypes)), list(map(str, ref.dtypes))
        bad = []
        mv, rv = mine.values.tolist(), ref.values.tolist()
        for i in range(len(mv)):
            for j in range(len(mv[i])):
                if not cells_equal(mv[i][j], rv[i][j]):
                    bad.append((i, mine.columns[j], mv[i][j], rv[i][j]))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: value diffs (first {len(bad)}): {bad}")
            n_fail += 1
        elif dt_mine != dt_ref:
            print(f"WARN {name}: values match, dtypes differ: {dt_mine} vs {dt_ref}")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
