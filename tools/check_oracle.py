#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every SQL in
oracle_sql.json, and compares against the Spark parquet dumped by
graft.Verify: schema (column names + dtypes), row count, and exact values
(columns sorted by name, rows in file order). Prints one line per query.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.sql(sql).df())
            got = canon(duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if [str(d) for d in want.dtypes] != [str(d) for d in got.dtypes]:
            print(f"FAIL {name}: dtypes {list(map(str, got.dtypes))} != "
                  f"{list(map(str, want.dtypes))}")
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            continue
        neq = (want.reset_index(drop=True) != got.reset_index(drop=True))
        # NaN != NaN; treat both-NaN as equal
        both_na = want.reset_index(drop=True).isna() & got.reset_index(drop=True).isna()
        bad = (neq & ~both_na)
        if bad.any().any():
            cols = [c for c in bad.columns if bad[c].any()]
            i = bad[cols[0]].idxmax()
            print(f"FAIL {name}: value mismatch cols={cols} first_row={i} "
                  f"got={got.iloc[i][cols].to_dict()} want={want.iloc[i][cols].to_dict()}")
            continue
        print(f"OK   {name} ({len(want)} rows)")
        n_ok += 1
    print(f"== {n_ok}/{len(oracle)} OK")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
