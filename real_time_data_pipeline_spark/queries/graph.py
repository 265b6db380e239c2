"""Graph analytics as iterative DataFrame programs.

The duplicate-clustering queries (queries/similarity.py) already cover
connected components (pointer-jumping and large/small-star); this
module adds the other canonical iterative-algorithm shape: PageRank as
a join-per-iteration loop. The point is the SCALE PATTERN — each
iteration is one shuffle join of the edge list against the rank
vector plus two 1-row broadcast scalars (total node count, dangling
mass), so the same program runs on a billion-edge graph — not the
25-node demo graph it is tested on.

Determinism: fixed iteration count (no float convergence test),
weights from exact revenue sums, output rounded 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.queries.registry import query
from real_time_data_pipeline_spark.sources.tables import load_table

DAMPING = 0.85
N_ITER = 3

_PAGERANK_ITER = """
, d{k} AS (
  SELECT coalesce(sum(r), 0) AS dm FROM r{k} WHERE name NOT IN (SELECT src FROM srcs)
), r{k1} AS (
  SELECT nodes.name,
         0.15 / (SELECT n FROM nn)
         + 0.85 * (coalesce(sum(e.p * r{k}.r), 0)
                   + (SELECT dm FROM d{k}) / (SELECT n FROM nn)) AS r
  FROM nodes LEFT JOIN edges e ON e.dst = nodes.name
             LEFT JOIN r{k} ON r{k}.name = e.src
  GROUP BY 1
)"""

_PAGERANK_ORACLE = (
    """
    WITH flows AS (
      SELECT sn.n_name AS src, cn.n_name AS dst,
             sum(l_extendedprice * (1 - l_discount)) AS w
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN supplier ON l_suppkey  = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1, 2
    ), edges AS (
      SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p FROM flows
    ), nodes AS (
      SELECT src AS name FROM flows UNION SELECT dst FROM flows
    ), nn AS (SELECT count(*) AS n FROM nodes),
    srcs AS (SELECT DISTINCT src FROM flows),
    r0 AS (SELECT name, 1.0 / n AS r FROM nodes CROSS JOIN nn)
    """
    + "".join(_PAGERANK_ITER.format(k=k, k1=k + 1) for k in range(N_ITER))
    + f"""
    SELECT name AS nation, round(r, 6) AS pagerank FROM r{N_ITER}
    """
)


@query("graph_pagerank_trade", oracle=_PAGERANK_ORACLE)
def q_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier-nation → customer-nation trade
    graph (edge weight = revenue share of the source's exports),
    3 fixed power iterations with uniform dangling-mass
    redistribution — the canonical iterative algorithm expressed as a
    join-per-iteration DataFrame loop.

    Scale shape: the edge list is built once and localCheckpoint-ed
    (the 5-way star join never re-runs, and the iteration lineage
    can't blow up the plan); each iteration is ONE shuffle join of
    edges against the rank vector keyed on src, an aggregate keyed on
    dst, and two 1-row broadcast scalars (node count, dangling mass).
    Nothing is ever collected; the same loop runs on a billion-edge
    graph."""
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("dst")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("src")
    )
    flows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.c_nk)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == sn.s_nk)
        .groupBy("src", "dst")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("w"))
    )
    edges = flows.withColumn(
        "p", F.col("w") / F.sum("w").over(Window.partitionBy("src"))
    ).select("src", "dst", "p").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("name"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    srcs = edges.select("src").distinct().localCheckpoint()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "name", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(N_ITER):
        dangling = (
            ranks.join(srcs, ranks.name == srcs.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            edges.join(ranks, edges.src == ranks.name)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("r")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes.name == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(nn))
            .select(
                "name",
                (
                    F.lit(0.15) / F.col("n")
                    + F.lit(DAMPING)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / F.col("n"))
                ).alias("r"),
            )
        )
    return ranks.select(
        F.col("name").alias("nation"), F.round("r", 6).alias("pagerank")
    )


_EDGES_SQL = """
      SELECT DISTINCT sn.n_name AS src, cn.n_name AS dst
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN supplier ON l_suppkey  = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
"""

_RECURSION_SQL = """
    WITH RECURSIVE reach AS (
      SELECT CAST('NATION_0' AS STRING) AS nation, 0 AS hops
      UNION ALL
      SELECT e.dst, r.hops + 1
      FROM reach r JOIN trade_edges e ON e.src = r.nation
      WHERE r.hops < 3
    )
    SELECT nation, min(hops) AS min_hops
    FROM reach GROUP BY nation
"""

# DuckDB oracle: same recursion text, with the edge list as a leading
# plain CTE (WITH RECURSIVE must lead the clause list) and DuckDB's
# VARCHAR spelling for the cast.
_REACHABILITY_ORACLE = (
    "WITH RECURSIVE trade_edges AS ("
    + _EDGES_SQL
    + "), reach AS ("
    + _RECURSION_SQL.split("reach AS (", 1)[1]
).replace("AS STRING", "AS VARCHAR")


@query("graph_recursive_reachability", oracle=_REACHABILITY_ORACLE)
def q_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure by recursive CTE (Spark 4 WITH RECURSIVE):
    which nations are reachable from NATION_0 through ≤3 trade hops,
    with their shortest hop count — the recursion text is the same
    SQL DuckDB runs as the oracle (modulo STRING/VARCHAR spelling).

    Scale shape: the engine materializes the DISTINCT nation-grain
    edge list ONCE (localCheckpoint temp view) before recursing —
    recursive CTE references are inlined per step, so an un-
    materialized edge CTE would re-run the 5-way fact join every hop.
    Each recursion step is then one join of the frontier against the
    tiny edge list, hop-bounded; the working set stays
    path-count-bounded, never corpus-sized."""
    from real_time_data_pipeline_spark.sources.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    spark.sql(_EDGES_SQL).localCheckpoint().createOrReplaceTempView("trade_edges")
    return spark.sql(_RECURSION_SQL)
