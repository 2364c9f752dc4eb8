#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not shipped
code): reads Verify's parquet dumps + oracle_sql.json, runs each oracle in
DuckDB over the same testdata parquet, and compares rows / schema / a
column-name-sorted value hash — the driver's documented methodology.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [name ...]
"""
import sys, json, os, hashlib

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    # sort columns by name, normalize cell rendering, sort rows
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    rows = sorted("|".join(cell(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return h


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or None
    oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # query dumps are directories; skip metadata files (oracle_sql.json)
    names = sorted(n for n in os.listdir(out)
                   if os.path.isdir(os.path.join(out, n)))
    fails = []
    for name in names:
        if only and name not in only:
            continue
        marker = os.path.join(out, name, "_VERIFY_ERROR.txt")
        if os.path.exists(marker):
            print(f"{name}: VERIFY FAILED {open(marker).read()[:200]}")
            fails.append(name)
            continue
        spark_df = pd.read_parquet(os.path.join(out, name))
        if name not in oracles:
            print(f"{name}: rows={len(spark_df)} (no oracle)")
            continue
        try:
            ora = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            fails.append(name)
            continue
        rows_ok = len(spark_df) == len(ora)
        schema_ok = sorted(spark_df.columns) == sorted(ora.columns)
        hash_ok = schema_ok and norm(spark_df) == norm(ora)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(f"{name}: {status} rows={len(spark_df)}/{len(ora)} "
              f"schema={schema_ok} hash={hash_ok}")
    print(f"\n{len(fails)} failures" + (": " + ", ".join(fails) if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
