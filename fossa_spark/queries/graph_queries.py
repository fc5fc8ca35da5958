"""Graph-analytics queries: PageRank over the customer↔supplier purchase
graph (fossa_spark/graph.py). The oracle unrolls the same fixed-point
integer power iterations as SQL CTEs — both engines sum exact 1e12-scaled
BIGINT contributions, so the result hash-matches bit-for-bit (a raw
double PageRank never could; see graph.py's determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fossa_spark import graph as G
from fossa_spark.queries._util import load


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (d=0.85) over the customer↔supplier purchase
    graph; top-20 nodes. Edge build = one fact join + distinct; each
    iteration = one rank-vector equi-join against the persisted edge list
    + one map-side-combined groupBy — the classic distributed power
    iteration (see graph.py for the 100 TB shape and the fixed-point
    determinism contract)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    edges = G.bipartite_purchase_edges(li, o)
    # iterations run on integer node ids; label for presentation at the end
    label = F.when(
        F.col("node") >= 0, F.concat(F.lit("C"), F.col("node").cast("string"))
    ).otherwise(
        F.concat(F.lit("S"), (-F.col("node") - 1).cast("string"))
    )
    return (
        G.pagerank(edges, iters=3, damping=0.85)
        .select(label.alias("node"), "pr_scaled", "pr")
        .orderBy(F.col("pr_scaled").desc(), F.col("node").asc())
        .limit(20)
    )


QUERIES = {
    "q_pagerank": q_pagerank,
}

# One iteration of the fixed-point update, as a reusable CTE pair:
#   c{i}: per-node integer contribution sum (pr div deg over incoming arcs)
#   p{i}: teleport base + round(d * contrib)
_ITER = """
        c{i} AS (
          SELECT e.dst AS node, SUM(p.pr // e.deg) AS contrib
          FROM edgesdeg e JOIN p{prev} p ON e.src = p.node
          GROUP BY e.dst
        ),
        p{i} AS (
          SELECT n.node,
                 (SELECT base FROM consts)
                 + CAST(round(0.85 * CAST(COALESCE(c.contrib, 0) AS DOUBLE))
                        AS BIGINT) AS pr
          FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
        )"""

ORACLE = {
    "q_pagerank": """
        WITH e0 AS (
          SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS src,
                          CAST(-l.l_suppkey - 1 AS BIGINT) AS dst
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        edges AS (
          SELECT src, dst FROM e0
          UNION ALL
          SELECT dst AS src, src AS dst FROM e0
        ),
        outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        edgesdeg AS (
          SELECT e.src, e.dst, d.deg FROM edges e JOIN outdeg d USING (src)
        ),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        consts AS (
          SELECT CAST(round(1e12 / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
                   AS pr0,
                 CAST(round(0.15 * 1e12 / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
                   AS base
          FROM nodes
        ),
        p0 AS (SELECT node, (SELECT pr0 FROM consts) AS pr FROM nodes),"""
    + _ITER.format(i=1, prev=0) + ","
    + _ITER.format(i=2, prev=1) + ","
    + _ITER.format(i=3, prev=2) + """
        SELECT CASE WHEN node >= 0 THEN 'C' || CAST(node AS VARCHAR)
                    ELSE 'S' || CAST(-node - 1 AS VARCHAR) END AS node,
               pr AS pr_scaled, CAST(pr AS DOUBLE) / 1e12 AS pr
        FROM p3
        ORDER BY pr_scaled DESC, node ASC LIMIT 20
    """,
}
