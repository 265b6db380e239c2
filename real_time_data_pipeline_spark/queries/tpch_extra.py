"""Extended TPC-H-shaped coverage: correlated subqueries, scalar-
subquery HAVING, NOT EXISTS, min-per-group picks, distribution
queries, and exact percentiles.

These fill the decorrelation / nested-subquery surface the first
relational suite didn't exercise (SURVEY §2.7 notes the reference has
none of this). Each query is written so Catalyst's rewrites do the
heavy lifting: scalar subqueries become broadcast cross joins,
EXISTS/IN become left-semi joins, correlated aggregates become
aggregate-then-join — and each docstring states the plan we expect at
100 TB.

Determinism follows the relational-suite conventions (exact integer
cents for money, rounding for true-float aggregates, unique
tie-breaks on every ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.queries.registry import query
from real_time_data_pipeline_spark.queries.relational import cents, money
from real_time_data_pipeline_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Q2 shape: min-per-group pick (cheapest supplier per part)
# --------------------------------------------------------------------------


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    SELECT p_partkey, p_name, s_suppkey, s_name, round(unit_cost, 6) AS unit_cost
    FROM (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
             c.unit_cost,
             row_number() OVER (
               PARTITION BY p.p_partkey ORDER BY c.unit_cost, s.s_suppkey
             ) AS rk
      FROM (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        WHERE l_quantity > 0
        GROUP BY l_partkey, l_suppkey
      ) c
      JOIN part p ON c.l_partkey = p.p_partkey
      JOIN supplier s ON c.l_suppkey = s.s_suppkey
      WHERE p.p_size < 15 AND p.p_type = 'ECONOMY'
    ) WHERE rk = 1
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part cheapest supplier (correlated MIN
    subquery, decorrelated by hand into aggregate → window pick).

    Plan at scale: lineitem aggregates on (partkey, suppkey) — one
    shuffle with map-side partial min; part and supplier broadcast
    (dimension tables); the per-part row_number re-shuffles only the
    surviving (filtered) parts. min(price/qty) is order-independent,
    and the rank tie-breaks on s_suppkey, so the pick is deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    unit = (
        li.where(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    joined = (
        unit.join(
            F.broadcast(part.where((F.col("p_size") < 15) & (F.col("p_type") == "ECONOMY"))),
            unit["l_partkey"] == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), unit["l_suppkey"] == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "s_suppkey")
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
    )


# --------------------------------------------------------------------------
# Q7 shape: nation-to-nation volume (multi-join + derived year)
# --------------------------------------------------------------------------


@query(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) / 100.0 AS revenue
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between distinct nation pairs
    by year — the deepest join tree in the registry (5 joins).

    Plan at scale: the l_shipdate range filter pushes to the lineitem
    scan (prunes ~2/7 of the data here, whole years at a partitioned
    layout); lineitem⋈orders and orders⋈customer are the two real
    shuffles; supplier and both nation sides broadcast. The final
    aggregate's keys (two nation names + year) are tiny, so the
    map-side partial collapses nearly everything before the exchange.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    df = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .join(n1, cust["c_nationkey"] == F.col("c_nk"))
        .join(n2, F.col("s_nationkey") == F.col("s_nk"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
    )
    return (
        df.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(money(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year
# --------------------------------------------------------------------------


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(round(
             (l.l_extendedprice * (1 - l.l_discount)
              - 0.6 * p.p_retailprice * l.l_quantity) * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS sum_profit
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus modeled supply cost) on
    'red' parts, by supplier nation and ship year.

    Plan at scale: the LIKE filter prunes part BEFORE the join, and the
    filtered part dim broadcasts — lineitem never shuffles for it;
    supplier+nation broadcast too, so the only exchange is the final
    small-key aggregate. Profit rounds to exact cents pre-sum so the
    value hash is stable under any partial-aggregation order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    df = (
        li.join(F.broadcast(part), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        df.groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").cast("int").alias("o_year"))
        .agg(money(F.sum(cents(profit))).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11 shape: scalar-subquery HAVING (important suppliers)
# --------------------------------------------------------------------------


@query(
    "tpch_q11_important_suppliers",
    oracle="""
    WITH value_per_supp AS (
      SELECT l_suppkey AS s_suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS value_cents
      FROM lineitem GROUP BY 1
    )
    SELECT s_suppkey, value_cents / 100.0 AS total_value
    FROM value_per_supp
    WHERE value_cents > (SELECT sum(value_cents) * 0.0012 FROM value_per_supp)
    """,
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: suppliers whose shipped value exceeds a
    fraction of the GLOBAL total — HAVING against a scalar subquery.

    Plan at scale: one shuffle to aggregate per-supplier cents; the
    global total is a second aggregate over that (tiny) result,
    broadcast back as a literal via cross join — no second pass over
    lineitem, no collect-to-driver. Exact integer cents on both sides
    of the comparison keep the cut deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = (
        li.groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("value_cents"))
    )
    total = per_supp.agg((F.sum("value_cents") * F.lit(0.0012)).alias("__cut"))
    return (
        per_supp.join(F.broadcast(total))
        .where(F.col("value_cents") > F.col("__cut"))
        .select("s_suppkey", (F.col("value_cents") / 100.0).alias("total_value"))
    )


# --------------------------------------------------------------------------
# Q13 shape: outer-join distribution (orders per customer histogram)
# --------------------------------------------------------------------------


@query(
    "tpch_q13_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts, with the
    priority filter INSIDE the outer-join condition (so zero-order
    customers still appear with c_count = 0).

    Plan at scale: orders pre-filters then shuffles on o_custkey to
    meet customer; the first aggregate rides the same partitioning
    (no extra exchange under AQE); the histogram aggregate's key space
    is tiny. count(o_orderkey) over the null-extended side counts
    matches only — exactly the SQL semantics, no special-casing.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy(cust["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q15 shape: scalar-subquery MAX (top supplier by period revenue)
# --------------------------------------------------------------------------


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.rev_cents / 100.0 AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.rev_cents = (SELECT max(rev_cents) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue
    — equality against a scalar-subquery MAX (keeps ALL ties, unlike
    an ORDER BY/LIMIT 1).

    Plan at scale: the date filter pushes to the scan; one shuffle for
    the per-supplier aggregate; the max is an aggregate of that small
    result broadcast back; supplier dim broadcasts. Exact cents make
    the max comparison tie-stable.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("rev_cents")
    )
    mx = rev.agg(F.max("rev_cents").alias("__mx"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("rev_cents") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("rev_cents") / 100.0).alias("total_revenue"))
    )


# --------------------------------------------------------------------------
# Q17 shape: correlated average (small-quantity revenue)
# --------------------------------------------------------------------------


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT round(
      CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / 7.0,
      6) AS avg_yearly
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN (
        SELECT l_partkey, avg(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
      ) a ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < 0.5 * a.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-half-average-quantity line items
    of one brand — the classic correlated-aggregate decorrelation
    (per-part AVG joined back to the fact table).

    Plan at scale: the per-part average is one shuffle on l_partkey;
    the join back to lineitem reuses that partitioning; the brand
    filter broadcasts part. avg(l_quantity) is exact (integral-valued
    doubles sum exactly in any order), so the < cut is deterministic.
    Single-row output: exact cents, then one final rounding.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    df = (
        li.join(F.broadcast(part), li["l_partkey"] == F.col("p_partkey"))
        .join(avg_qty, li["l_partkey"] == F.col("__pk"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    )
    return df.agg(
        F.round(F.sum(cents("l_extendedprice")) / 100.0 / 7.0, 6).alias("avg_yearly")
    )


# --------------------------------------------------------------------------
# Q20 shape: nested IN-chain (suppliers with excess shipped quantity)
# --------------------------------------------------------------------------


@query(
    "tpch_q20_excess_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 100
    )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped > 100 units of 'small'
    parts in 1996 — a two-level nested IN, rewritten as filter →
    semi-join chain.

    Plan at scale: part pre-filters on the LIKE and broadcasts as a
    left-semi into lineitem (no row growth); the date filter pushes to
    the scan; one shuffle aggregates quantity per supplier; the
    HAVING survivors (tiny) broadcast-semi into supplier. Quantity
    sums are exact (integral doubles).
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    supp = load_table(spark, sf_dir, "supplier")
    shipped = (
        li.join(F.broadcast(part), li["l_partkey"] == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 100)
    )
    return supp.join(
        F.broadcast(shipped), supp["s_suppkey"] == shipped["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


# --------------------------------------------------------------------------
# Q22 shape: NOT EXISTS + scalar-subquery threshold (dormant customers)
# --------------------------------------------------------------------------


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    WITH thresh AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             * 1.0 / count(*) / 100.0 AS cut
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_custkey % 7 AS BIGINT) AS cntrycode,
           count(*) AS numcust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS totacctbal
    FROM customer c, thresh t
    WHERE c.c_acctbal > t.cut
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers who never ordered,
    bucketed by a synthetic country code — NOT EXISTS (anti join) plus
    a scalar-subquery average threshold.

    Plan at scale: the average computes as exact-cents sum/count (one
    tiny aggregate, broadcast back — float-summation-order-proof);
    the anti join shuffles orders' custkeys only (projected to one
    column, deduped by the join itself); the final rollup has 7 keys.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    thresh = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(cents("c_acctbal")) * 1.0 / F.count(F.lit(1)) / 100.0).alias("cut")
    )
    dormant = (
        cust.join(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("cut"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
    )
    return (
        dormant.groupBy((F.col("c_custkey") % 7).cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money(F.sum(cents("c_acctbal"))).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Exact percentiles (quantile_cont parity)
# --------------------------------------------------------------------------


@query(
    "agg_percentiles_by_segment",
    oracle="""
    SELECT c.c_mktsegment,
           round(quantile_cont(o.o_totalprice, 0.25), 6) AS p25,
           round(quantile_cont(o.o_totalprice, 0.50), 6) AS p50,
           round(quantile_cont(o.o_totalprice, 0.75), 6) AS p75,
           round(quantile_cont(o.o_totalprice, 0.95), 6) AS p95
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q_percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of order value per market
    segment, verified to 6 dp against DuckDB's `quantile_cont`.

    Plan at scale (r16): customer (dim) broadcasts into orders; all
    four percentiles then come from ONE grouped rank-pick pass
    (`grouped_percentile_cont`: range shuffle + pid windows,
    mega-group safe) instead of `F.percentile`, whose aggregation
    buffer maps every distinct o_totalprice of a segment into one
    reducer — fact-sized cardinality over 5 segments at 100 TB. Same
    type-7 interpolation, exactness kept; no approx fallback needed.
    """
    from real_time_data_pipeline_spark.operators.ranking import (
        grouped_percentile_cont,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    df = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select("c_mktsegment", "o_totalprice", "o_orderkey")
    pct = grouped_percentile_cont(
        df,
        ["c_mktsegment"],
        "o_totalprice",
        [0.25, 0.50, 0.75, 0.95],
        ["_p25", "_p50", "_p75", "_p95"],
        tie_break=[F.asc("o_orderkey")],
    )
    return pct.select(
        "c_mktsegment",
        F.round(F.col("_p25"), 6).alias("p25"),
        F.round(F.col("_p50"), 6).alias("p50"),
        F.round(F.col("_p75"), 6).alias("p75"),
        F.round(F.col("_p95"), 6).alias("p95"),
    )


# --------------------------------------------------------------------------
# Q8 shape: market share (conditional aggregation ratio by year)
# --------------------------------------------------------------------------


@query(
    "tpch_q8_market_share",
    oracle="""
    WITH all_sales AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS vol_cents,
             n.n_name AS supp_nation
      FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = (SELECT n_name FROM nation
                                                   ORDER BY n_nationkey LIMIT 1)
                          THEN vol_cents ELSE 0 END) AS BIGINT) * 1.0
                 / CAST(sum(vol_cents) AS BIGINT), 6) AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of ECONOMY-part order volume
    per year — conditional-sum ratio over a 5-way join.

    Plan at scale: filtered part broadcasts (lineitem keeps only its
    matches), supplier/nation broadcast, orders⋈lineitem is the one
    real shuffle; the share is numerator-CASE / denominator in a
    single aggregate pass (no second scan, no self-join). Exact-cents
    on both sides of the division keep the ratio deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    target = nation.orderBy("n_nationkey").limit(1).select(
        F.col("n_name").alias("__target")
    )
    vol = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    df = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(part), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(target))
    )
    num = F.sum(F.when(F.col("n_name") == F.col("__target"), vol).otherwise(F.lit(0)))
    return (
        df.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(num * 1.0 / F.sum(vol), 6).alias("mkt_share"))
    )


# --------------------------------------------------------------------------
# Q12 shape: two-way conditional counts by a derived class
# --------------------------------------------------------------------------


@query(
    "tpch_q12_priority_class_counts",
    oracle="""
    SELECT CAST(l.l_linenumber % 3 AS INTEGER) AS ship_mode_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q12_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high/low-priority line counts per shipping
    class (derived stand-in for l_shipmode, which the dataset lacks) —
    the two-CASE conditional count pattern.

    Plan at scale: date range pushes to the lineitem scan; one shuffle
    joins orders (projected to key+priority only); the aggregate's
    3-key space collapses map-side.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy((F.col("l_linenumber") % 3).cast("int").alias("ship_mode_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q16 shape: distinct-count with NOT IN exclusion
# --------------------------------------------------------------------------


@query(
    "tpch_q16_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#3' AND p.p_size IN (1, 4, 9, 16, 25)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part attribute group,
    excluding a NOT-IN supplier set (→ broadcast anti join — never a
    per-row subquery).

    Plan at scale: part's brand/size filters prune before its
    broadcast; the excluded-supplier set is tiny and broadcasts as
    LeftAnti; count(DISTINCT) expands to a two-phase aggregate
    (dedup on group+suppkey map-side, then count) — no row explosion.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3") & (F.col("p_size").isin(1, 4, 9, 16, 25))
    )
    excluded = load_table(spark, sf_dir, "supplier").where(
        F.col("s_name").like("%7")
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(excluded), li["l_suppkey"] == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), li["l_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS on the same fact table
# --------------------------------------------------------------------------


@query(
    "tpch_q21_sole_late_supplier",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT s.s_suppkey, s.s_name, count(*) AS numwait
    FROM supplier s
      JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late = 1) l1
        ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM li l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM li l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.late = 1
      )
    GROUP BY 1, 2
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on
    multi-supplier orders (late = shipped >90 days after order date,
    standing in for the missing commit/receipt dates) — EXISTS +
    NOT EXISTS against the same fact table.

    Decorrelation: instead of two correlated subqueries, aggregate the
    fact ONCE per (order, supplier) and then per order compute
    n_suppliers and n_late_suppliers; the predicate becomes a plain
    filter (n_suppliers > 1 AND n_late_suppliers = 1 AND me-late) —
    two aggregates and one broadcast dim join, no self-joins at all.
    The oracle keeps the literal EXISTS form to prove equivalence.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1
    ).otherwise(0)
    per_os = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
    )
    waiting = (
        per_os.where(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        waiting.join(F.broadcast(supp), waiting["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
