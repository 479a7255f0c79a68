#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> spark-written parquet, runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB against the sfDir tables, sorts
columns by name on both sides, and compares row-by-row.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    n_skip = 0
    for name, sql in sorted(oracle.items()):
        # SPARK_GRAFT_ONLY subset runs dump only matching queries; a missing
        # dir means "not dumped this run", not a failure (the driver always
        # dumps everything).
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                n_fail += 1
                continue
            # Strict like the driver: a dtype mismatch (e.g. decimal vs
            # double) IS a hash mismatch even when values stringify equal —
            # round 1 proved check.py's WARN-only dtype policy predicts
            # 52/66 driver green as 66/66 local green.
            if got.dtypes.to_dict() != want.dtypes.to_dict():
                print(f"FAIL {name}: dtypes spark={got.dtypes.to_dict()} duck={want.dtypes.to_dict()}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            # Exact value compare: raw values (Decimal objects compare
            # exactly, floats bit-for-bit), nulls equal only to nulls.
            both_na = got.isna() & want.isna()
            gs, ws = got, want
            neq = ((gs != ws) & ~both_na).any(axis=1)
            if neq.any():
                idx = neq[neq].index[:3]
                print(f"FAIL {name}: {int(neq.sum())}/{len(got)} rows differ; first diffs:")
                for i in idx:
                    print(f"  row {i} spark={gs.loc[i].to_dict()}")
                    print(f"  row {i} duck ={ws.loc[i].to_dict()}")
                n_fail += 1
            else:
                print(f"OK   {name}: {len(got)} rows")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    checked = len(oracle) - n_skip
    skipnote = f" ({n_skip} not dumped, skipped)" if n_skip else ""
    print(f"\n{checked - n_fail}/{checked} queries match{skipnote}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
