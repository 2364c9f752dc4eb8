#!/usr/bin/env python3
"""Dev-only oracle pre-check (NOT part of the shipped library).

Mimics the driver's correctness gate: for each query output parquet written
by `graft.Verify`, run the matching DuckDB oracle SQL over the same sf dir,
sort columns by name, sort rows, and compare values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything (driver hashes values) with stable float repr
    def cell(v):
        if v is None or v != v:
            return "<NULL>"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return list(df.columns), rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            gc, gr = canon(got)
            wc, wr = canon(want)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} != {wc}")
                n_bad += 1
            elif gr != wr:
                diff = [(a, b) for a, b in zip(gr, wr) if a != b]
                print(f"FAIL {name}: {len(gr)} vs {len(wr)} rows; "
                      f"first diffs: {diff[:3] if diff else (gr[:2], wr[:2])}")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(gr)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
