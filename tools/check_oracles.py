"""Local replica of the driver's duckdb-oracle correctness check.

Runs every ``queries()`` entry against its ``oracle_sql()`` at a given SF
and compares row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]

Set CHECK_ORACLES_JSON=<path> to also write a machine-readable summary
(per-query status) mirroring the driver's CORRECTNESS file shape.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # DuckDB returns DATE columns as datetime64[ns] / DatetimeArray
        # while Spark's toPandas yields object dtype of datetime.date —
        # canonicalize BOTH to ISO strings so equal dates compare equal.
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S").str.replace(
                " 00:00:00", "", regex=False
            )
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # cap the SQL status store: it retains 1000 executions even
        # with the UI off, and iterative plans carry thousands of
        # metrics each — a full-registry run otherwise pins GBs
        .config("spark.sql.ui.retainedExecutions", "16")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except Exception:
            pass

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    summary = {}

    def record(name, status, rows=None, detail=None):
        summary[name] = {"status": status, "rows": rows, "detail": detail}

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            record(name, "fail", detail=f"spark raised {type(ex).__name__}")
            print(f"FAIL {name}: spark query raised {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            record(name, "rows_only", rows=len(sdf))
            print(f"SKIP {name}: no oracle ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            record(name, "fail", detail=f"oracle raised {type(ex).__name__}")
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append(name)
            record(name, "fail", detail="column mismatch")
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append(name)
            record(name, "fail", detail=f"rows {len(s)} vs {len(o)}")
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            continue
        try:
            pd.testing.assert_frame_equal(
                s, o, check_dtype=False, check_exact=False, rtol=0, atol=0
            )
        except AssertionError as ex:
            failures.append(name)
            record(name, "fail", detail="values differ")
            print(f"FAIL {name}: values differ: {str(ex)[:300]}")
            continue
        record(name, "ok", rows=len(s))
        print(f"OK   {name}: {len(s)} rows")

    json_path = os.environ.get("CHECK_ORACLES_JSON")
    if json_path:
        with open(json_path, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": summary}, fh, indent=1)

    print(f"\n{len(failures)} failures" if failures else "\nall OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
