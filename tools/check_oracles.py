"""Driver-style correctness check: run every queries() entry on Spark and
its oracle_sql() on DuckDB at the given sf dir; compare row count, sorted
column names, and a value hash (columns sorted by name, rows sorted)."""
from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    import json

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # array/struct cells are unhashable and unsortable — serialize
            # to a canonical JSON string before sorting/hashing
            def is_seq(v):
                return (isinstance(v, (list, tuple, dict, set))
                        or type(v).__name__ == "ndarray")

            if df[c].map(is_seq).any():
                df[c] = df[c].map(
                    lambda v: json.dumps(
                        sorted(v) if isinstance(v, set) else (
                            list(v) if not isinstance(v, dict) else v),
                        default=str) if v is not None else None)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def vhash(df: pd.DataFrame) -> str:
    df = norm(df)
    s = df.to_csv(index=False, float_format="%.6f")
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def main():
    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qmap = entry.queries()
    omap = entry.oracle_sql()
    fails = []
    for name, fn in qmap.items():
        if ONLY and name not in ONLY:
            continue
        try:
            df = fn(spark, SF_DIR)
            sdf = df.toPandas()
            from nacc_form_validator_spark.operators.dedup import (
                release_intermediates)
            release_intermediates(df)
        except Exception as e:  # noqa
            print(f"{name}: SPARK ERROR {e}")
            fails.append(name)
            continue
        if name not in omap:
            print(f"{name}: rows-only rows={len(sdf)}")
            continue
        try:
            odf = con.execute(omap[name]).df()
        except Exception as e:  # noqa
            print(f"{name}: ORACLE ERROR {e}")
            fails.append(name)
            continue
        rc = len(sdf) == len(odf)
        sc = sorted(sdf.columns) == sorted(odf.columns)
        hv = vhash(sdf) == vhash(odf) if (rc and sc) else False
        status = "OK" if (rc and sc and hv) else "MISMATCH"
        print(f"{name}: {status} rows={len(sdf)}/{len(odf)} "
              f"cols={'ok' if sc else (sorted(sdf.columns), sorted(odf.columns))} "
              f"hash={'ok' if hv else 'BAD'}")
        if status != "OK":
            fails.append(name)
    spark.stop()
    print("FAILS:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
