"""Local stand-in for the driver's correctness gate: runs each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
at sf0.01, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, floats rounded)."""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str).where(~df[c].isna(), None)
    df = df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main(only: list[str] | None = None):
    import __spark_entry__ as e
    from swarm_spark.session import get_spark

    spark = get_spark("correctness", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:24s} rows={len(sdf):7d}  (rows-only, no oracle) {t_spark:5.1f}s")
            continue
        odf = con.sql(oracles[name]).df()
        a, b = canon(sdf), canon(odf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = ok_rows and ok_cols and value_hash(a) == value_hash(b)
        status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(f"  {name:24s} {status} rows={len(a)}/{len(b)} cols={ok_cols} vals={ok_vals} {t_spark:5.1f}s")
        if status == "FAIL":
            failures += 1
            if not ok_cols:
                print(f"    spark cols: {list(a.columns)}\n    duck  cols: {list(b.columns)}")
            elif ok_rows:
                diff = a.compare(b) if a.shape == b.shape else None
                if diff is not None and len(diff):
                    print(diff.head(8).to_string())
                else:
                    print("    (row counts equal, values differ)")
            else:
                print(f"    row mismatch: spark={len(a)} duck={len(b)}")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1:] or None)
