#!/usr/bin/env python
"""Local Spark-vs-DuckDB oracle parity gate — mirrors the driver's
CORRECTNESS check: row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    """pandas frame -> canonical sorted form for order-insensitive compare."""
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import duckdb

    from pii_spark.queries import ORACLES, QUERIES
    from pii_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    only = {n for n in args.only.split(",") if n}
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:500]}")
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only, {len(sdf)} rows "
                  f"({time.time() - t0:.1f}s)")
            if len(sdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            odf = con.execute(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:500]}")
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append((name, f"columns {list(s.columns)} != {list(o.columns)}"))
            print(f"FAIL {name}: column mismatch {list(s.columns)} vs {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append((name, f"rows {len(s)} != {len(o)}"))
            print(f"FAIL {name}: row count {len(s)} vs {len(o)}")
            continue
        if not s.equals(o):
            diff = (s != o)
            bad = diff.any(axis=1)
            failures.append((name, f"{int(bad.sum())} differing rows"))
            print(f"FAIL {name}: {int(bad.sum())} differing rows")
            print("  spark:", s[bad].head(3).to_dict("records"))
            print("  oracle:", o[bad].head(3).to_dict("records"))
            continue
        print(f"ok   {name}: {len(s)} rows match ({time.time() - t0:.1f}s)")

    spark.stop()
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES) if not only else len(only)} queries pass")
    if failures:
        for n, msg in failures:
            print(f"  FAILED {n}: {msg[:300]}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
