"""VERDICT r9 #8 experiment: can agg_customer_rfm_segments share ONE
range exchange across its three quintile passes?

ADOPTED r11: the registry query now IS the single-exchange form, so
`spec.fn` and `rfm_single_exchange` below run the same shape; the
script is kept as the historical record of the measurement that
justified the flip (bit-identical at sf0.01/sf0.1, ~2.3x under
localCheckpoint conditions, ~1.4x under bench conditions where the
reliable checkpoint is a shared fixed cost).

Variant: explode each customer into 3 (metric_id, value) rows (dates
cast to epoch-day so all metrics share a long sort key), take ONE
global row_number over (metric_id, value, custkey); within metric m
the rank is rn - m*n, and the same closed-form ntile arithmetic gives
the quintile. Pivot back with a groupBy(custkey).

Checks bit-identity against the DuckDB oracle, then times both
variants at sf0.1.
"""
import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.session import get_spark
from real_time_data_pipeline_spark.sources.tables import load_table
from real_time_data_pipeline_spark.operators.materialize import reliable_materialize
from real_time_data_pipeline_spark.operators.ranking import (
    release_rank_caches,
)
from real_time_data_pipeline_spark.queries import REGISTRY


def rfm_single_exchange(spark, sf_dir):
    """The r11 adoption target, spelled with the SHIPPED operator
    (`operators/ranking.py::multi_metric_ntiles`) so the measured
    variant and the code that will replace the registry query are one
    and the same."""
    from real_time_data_pipeline_spark.operators.ranking import (
        multi_metric_ntiles,
    )

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    c = reliable_materialize(
        orders.groupBy("o_custkey").agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("monetary_cents"),
        )
    )
    q = multi_metric_ntiles(
        c,
        5,
        [
            F.datediff("last_order", F.lit("1970-01-01")),
            F.col("n_orders"),
            F.col("monetary_cents"),
        ],
        "o_custkey",
        ["r_quintile", "f_quintile", "m_quintile"],
        carry=["monetary_cents"],
    )
    return q.groupBy(
        F.col("r_quintile").cast("long").alias("r_quintile"),
        F.col("f_quintile").cast("long").alias("f_quintile"),
        F.col("m_quintile").cast("long").alias("m_quintile"),
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary_cents").alias("sum_monetary_cents"),
    )


def canon(df):
    rows = sorted(tuple(r) for r in df.collect())
    return rows


def main():
    spark = get_spark("rfm-experiment")
    spec = REGISTRY["agg_customer_rfm_segments"]
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        a = canon(spec.fn(spark, sf)); release_rank_caches()
        b = canon(rfm_single_exchange(spark, sf)); release_rank_caches()
        print(sf, "bit-identical:", a == b, f"({len(a)} vs {len(b)} rows)")
        if a != b:
            print(
                "  first diff:",
                next(
                    ((x, y) for x, y in zip(a, b) if x != y),
                    ("length-mismatch", len(a), len(b)),
                ),
            )
            return 1
    sf = "/root/testdata/sf0.1"
    for name, fn in [("current-3pass", spec.fn), ("single-exchange", rfm_single_exchange)]:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf).collect()
            release_rank_caches()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name}: median {ts[2]:.3f}s  runs {['%.3f' % t for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
