"""Driver-style correctness check: run each queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            # bit-exact: the driver may hash raw values, so no tolerance
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith("int") or \
                str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == bool:
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name, spark_df, duck_df):
    s = normalize(spark_df)
    d = normalize(duck_df)
    if list(s.columns) != list(d.columns):
        return f"COLUMNS differ: spark={list(s.columns)} duck={list(d.columns)}"
    if len(s) != len(d):
        return f"ROWCOUNT differ: spark={len(s)} duck={len(d)}"
    try:
        pd.testing.assert_frame_equal(s, d, check_dtype=False,
                                      check_exact=True)
    except AssertionError as e:
        msg = str(e).split("\n")
        return "VALUES differ: " + " | ".join(msg[:6])
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle-check")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_con(sf_dir)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCK ERROR: {e}"))
            print(f"[FAIL-duck ] {name}: {str(e)[:200]}")
            continue
        err = compare(name, sdf, ddf)
        if err:
            failures.append((name, err))
            print(f"[FAIL-cmp  ] {name}: {err[:300]}")
        else:
            print(f"[OK        ] {name}: {len(sdf)} rows")
    print(f"\n{len(failures)} failures / {len(qs)} queries")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
