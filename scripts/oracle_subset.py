#!/usr/bin/env python
"""Driver-sim oracle check for a SUBSET of registry queries.

Replays the round driver's correctness protocol (vanilla session,
DuckDB oracle, order-insensitive canonical value hash) for just the
named queries — the fast inner loop for proving an optimization
changed no values, at one or more scale factors.

Usage: python scripts/oracle_subset.py [--sf DIR ...] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        try:
            if v is None or pd.isna(v):
                return "N"
        except (TypeError, ValueError):
            pass
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    return sorted("|".join(cell(v) for v in r) for r in df.itertuples(index=False))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", action="append", default=[])
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    sfs = args.sf or ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]").appName("oracle-subset").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    fails = []
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        for n in args.queries:
            if n not in qs or n not in osql:
                print(f"SKIP {n} (not in registry/oracle)")
                continue
            try:
                ok = canon(qs[n](spark, sf).toPandas()) == canon(
                    con.execute(osql[n]).fetchdf()
                )
            except Exception as exc:  # noqa: BLE001
                ok = False
                print(f"ERROR {n} @ {sf}: {str(exc).splitlines()[0][:200]}")
            if not ok:
                fails.append((n, sf))
                print(f"MISMATCH {n} @ {sf}")
            else:
                print(f"ok {n} @ {sf}")
        con.close()
    print("ALL MATCH" if not fails else f"FAILS: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
