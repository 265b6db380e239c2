"""Batch backfill job: the spark-submit launch surface (reference O2).

The reference launches `src/jobs/spark_batch_backfill.py` via Airflow's
SparkSubmitOperator with `--date {{ ds }}` and path/connection args
(`dags/gbfs_pipeline_dag.py:38-55`). This is the engine's equivalent:

    spark-submit [--master ...] -m? n/a — use the file path:
    spark-submit path/to/real_time_data_pipeline_spark/jobs/backfill.py \
        --date 2024-05-06 --bronze-path .../bronze \
        --silver-path .../silver --gold-path .../gold

Differences from the reference, by design (SURVEY §2.6 defect fixes):

- date-scoped DYNAMIC partition overwrite instead of overwriting the
  whole silver path on every dated run (`spark_batch_backfill.py:54`);
- deterministic dedup + guarded ratio via the shared pipeline stages —
  the same functions the streaming job runs, so backfill and live
  never drift (the reference maintains two divergent copies);
- gold lands as a date-partitioned parquet table; pass --jdbc-url to
  ALSO mirror it to a JDBC gold table like the reference's Postgres.

``main(argv)`` builds-or-gets the session, so tests and notebook
callers can run it in-process; under spark-submit the session comes
from the launcher with whatever master/packages were configured.
"""

from __future__ import annotations

import argparse
import os
import sys
from collections.abc import Sequence

# spark-submit launches this as a plain FILE, so the package root is
# not importable unless shipped via --py-files; self-locate so
# `spark-submit .../jobs/backfill.py` works from a plain checkout too.
if __package__ in (None, ""):
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    )

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Date-scoped bronze→silver→gold backfill")
    p.add_argument("--date", required=True, help="ISO date to backfill (the DAG's {{ ds }})")
    p.add_argument("--bronze-path", required=True)
    p.add_argument("--silver-path", required=True)
    p.add_argument("--gold-path", required=True)
    p.add_argument("--jdbc-url", default=None, help="optional JDBC mirror for gold")
    p.add_argument("--jdbc-table", default="station_availability_15m")
    p.add_argument("--jdbc-user", default=None)
    p.add_argument("--jdbc-password", default=None)
    return p


def run(
    spark: SparkSession,
    date: str,
    bronze_path: str,
    silver_path: str,
    gold_path: str,
    jdbc_url: str | None = None,
    jdbc_table: str = "station_availability_15m",
    jdbc_user: str | None = None,
    jdbc_password: str | None = None,
) -> int:
    """Execute the backfill; returns the number of gold rows written."""
    from real_time_data_pipeline_spark.pipelines.station_status import (
        normalize_raw,
        to_gold,
        to_silver,
    )
    from real_time_data_pipeline_spark.sources.sinks import (
        jdbc_writer,
        write_parquet_partitioned,
    )

    bronze = spark.read.parquet(bronze_path)
    silver = to_silver(normalize_raw(bronze)).withColumn(
        "date", F.to_date(F.col("event_ts"))
    )
    day = silver.where(F.col("date") == F.lit(date))
    write_parquet_partitioned(day, silver_path, "date")

    gold = to_gold(day).withColumn("date", F.to_date(F.col("window_start")))
    write_parquet_partitioned(gold, gold_path, "date")
    if jdbc_url is not None:
        jdbc_writer(
            gold.drop("date"), jdbc_url, jdbc_table, jdbc_user or "", jdbc_password or ""
        ).save()
    return spark.read.parquet(gold_path).where(F.col("date") == F.lit(date)).count()


def main(argv: Sequence[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.appName("rtdp-backfill").getOrCreate()
    n = run(
        spark,
        date=args.date,
        bronze_path=args.bronze_path,
        silver_path=args.silver_path,
        gold_path=args.gold_path,
        jdbc_url=args.jdbc_url,
        jdbc_table=args.jdbc_table,
        jdbc_user=args.jdbc_user,
        jdbc_password=args.jdbc_password,
    )
    print(f"backfill {args.date}: {n} gold rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
