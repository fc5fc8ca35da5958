"""Graph-analytics queries: PageRank over the customer↔supplier purchase
graph (fossa_spark/graph.py). The oracle unrolls the same fixed-point
integer power iterations as SQL CTEs — both engines sum exact 1e12-scaled
BIGINT contributions, so the result hash-matches bit-for-bit (a raw
double PageRank never could; see graph.py's determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census of the co-purchase part graph (parts sharing
    an order at least twice): canonical low→high orientation, two
    equi-joins, each triangle counted once (graph.py triangle_count).
    Support ≥ 2 keeps the projected graph sparse — the support threshold
    is how real co-occurrence graphs stay sub-quadratic at 100 TB."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= 2)
        .select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
    )
    return G.triangle_count(edges)


def q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest hop distances from customer node 1 over the
    customer↔supplier purchase graph, depth ≤ 3 (graph.py bfs_levels —
    frontier expansion, per-round work O(frontier × degree), lineage
    checkpointed per round). Emitted as per-level summaries (count,
    min/max node); the oracle unrolls the same levels as NOT-IN CTEs."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    edges = G.bipartite_purchase_edges(li, o)
    src = spark.range(1, 2).select(F.col("id").alias("node"))
    levels = G.bfs_levels(edges, src, max_depth=3)
    return (
        levels.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("dist")
    )


def _copurchase_arcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected arc list of the support-≥2 co-purchase part graph
    (both directions), shared by q_triangles-style builders and q_kcore."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    und = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= 2)
        .select("p1", "p2")
    )
    return und.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst")
    ).unionByName(
        und.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    )


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase part graph: iterative peeling (degree
    aggregate + two semi-joins per round, graph.py k_core) until stable.
    k_core RAISES if not converged within 16 rounds, which is what makes
    the oracle's FIXED 16-round unroll sound (peeling is monotone — extra
    rounds on a stable core are no-ops, so any convergence ≤ 16 matches;
    measured depth: 11 rounds at sf0.01, 3 at sf0.1)."""
    arcs = _copurchase_arcs(spark, sf_dir)
    core = G.k_core(arcs, k=3, max_iter=16)
    return core.agg(
        F.count_distinct("src").alias("n_nodes"),
        F.count(F.lit(1)).alias("n_arcs"),
        F.min("src").alias("min_node"),
        F.max("src").alias("max_node"),
    )


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (distributed Bellman-Ford,
    4 min-plus rounds) from customer node 1 over the purchase graph with
    min-price-cents edge weights (graph.py weighted_purchase_edges /
    bellman_ford). Emits the 25 cheapest-reachable nodes — exact integer
    costs, so the oracle unrolls the same rounds and hash-matches. The
    weighted sibling of q_bfs (hop counts) and q_pagerank (mass flow)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    edges = G.weighted_purchase_edges(li, o)
    src = spark.range(1, 2).select(F.col("id").alias("node"))
    dist = G.bellman_ford(edges, src, rounds=4)
    label = F.when(
        F.col("node") >= 0, F.concat(F.lit("C"), F.col("node").cast("string"))
    ).otherwise(F.concat(F.lit("S"), (-F.col("node") - 1).cast("string")))
    return (
        dist.select(
            label.alias("node"),
            F.col("dist").alias("dist_cents"),
            (F.col("dist").cast("double") / 100.0).alias("dist_dollars"),
        )
        .orderBy(F.col("dist_cents").asc(), F.col("node").asc())
        .limit(25)
    )


QUERIES = {
    "q_pagerank": q_pagerank,
    "q_triangles": q_triangles,
    "q_bfs": q_bfs,
    "q_kcore": q_kcore,
    "q_sssp": q_sssp,
}


def _sssp_unrolled_sql(rounds: int) -> str:
    """Fixed-round min-plus relaxation as chained MATERIALIZED CTEs
    (each round references the previous twice — the q_kcore inlining
    lesson applies)."""
    head = """
        WITH pairs AS MATERIALIZED (
          SELECT CAST(o.o_custkey AS BIGINT) AS src,
                 CAST(-l.l_suppkey - 1 AS BIGINT) AS dst,
                 MIN(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS w
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        ),
        edges AS MATERIALIZED (
          SELECT src, dst, w FROM pairs
          UNION ALL SELECT dst, src, w FROM pairs
        ),
        d0 AS (SELECT CAST(1 AS BIGINT) AS node,
                      CAST(0 AS BIGINT) AS dist)"""
    parts = [head]
    for i in range(1, rounds + 1):
        parts.append(f""",
        r{i} AS MATERIALIZED (
          SELECT e.dst AS node, MIN(d.dist + e.w) AS relax
          FROM edges e JOIN d{i - 1} d ON e.src = d.node
          GROUP BY e.dst
        ),
        d{i} AS MATERIALIZED (
          SELECT COALESCE(d.node, r.node) AS node,
                 CASE WHEN d.dist IS NULL THEN r.relax
                      WHEN r.relax IS NULL THEN d.dist
                      WHEN r.relax < d.dist THEN r.relax
                      ELSE d.dist END AS dist
          FROM d{i - 1} d FULL OUTER JOIN r{i} r ON d.node = r.node
        )""")
    parts.append(f"""
        SELECT CASE WHEN node >= 0 THEN 'C' || CAST(node AS VARCHAR)
                    ELSE 'S' || CAST(-node - 1 AS VARCHAR) END AS node,
               dist AS dist_cents,
               CAST(dist AS DOUBLE) / 100.0 AS dist_dollars
        FROM d{rounds}
        ORDER BY dist_cents ASC, node ASC LIMIT 25""")
    return "".join(parts)


def _kcore_unrolled_sql(k: int, rounds: int) -> str:
    """Generate the fixed-round peel as chained CTEs. MATERIALIZED is
    load-bearing: DuckDB inlines plain CTEs, and each round references
    the previous one twice — 16 inlined rounds expand to 2^16 scans
    ("Too many open files" long before any data problem)."""
    parts = ["""
        WITH li AS MATERIALIZED (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        und AS MATERIALIZED (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey HAVING COUNT(*) >= 2
        ),
        e0 AS MATERIALIZED (
          SELECT p1 AS src, p2 AS dst FROM und
          UNION ALL SELECT p2, p1 FROM und
        )"""]
    for i in range(1, rounds + 1):
        parts.append(f""",
        n{i} AS MATERIALIZED (
          SELECT src AS node FROM e{i - 1}
          GROUP BY src HAVING COUNT(*) >= {k}
        ),
        e{i} AS MATERIALIZED (
          SELECT e.src, e.dst FROM e{i - 1} e
          JOIN n{i} a ON e.src = a.node
          JOIN n{i} b ON e.dst = b.node
        )""")
    parts.append(f"""
        SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
               CAST(COUNT(*) AS BIGINT) AS n_arcs,
               MIN(src) AS min_node, MAX(src) AS max_node
        FROM e{rounds}""")
    return "".join(parts)

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
    "q_kcore": _kcore_unrolled_sql(k=3, rounds=16),
    "q_sssp": _sssp_unrolled_sql(rounds=4),
    "q_bfs": """
        WITH pairs AS (
          SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                 -CAST(l_suppkey AS BIGINT) - 1 AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        edges AS (
          SELECT src, dst FROM pairs
          UNION ALL SELECT dst AS src, src AS dst FROM pairs
        ),
        l0 AS (SELECT CAST(1 AS BIGINT) AS node),
        l1 AS (
          SELECT DISTINCT e.dst AS node FROM edges e
          JOIN l0 ON e.src = l0.node
          WHERE e.dst NOT IN (SELECT node FROM l0)
        ),
        l2 AS (
          SELECT DISTINCT e.dst AS node FROM edges e
          JOIN l1 ON e.src = l1.node
          WHERE e.dst NOT IN (SELECT node FROM l0)
            AND e.dst NOT IN (SELECT node FROM l1)
        ),
        l3 AS (
          SELECT DISTINCT e.dst AS node FROM edges e
          JOIN l2 ON e.src = l2.node
          WHERE e.dst NOT IN (SELECT node FROM l0)
            AND e.dst NOT IN (SELECT node FROM l1)
            AND e.dst NOT IN (SELECT node FROM l2)
        ),
        lv AS (
          SELECT node, 0 AS dist FROM l0
          UNION ALL SELECT node, 1 FROM l1
          UNION ALL SELECT node, 2 FROM l2
          UNION ALL SELECT node, 3 FROM l3
        )
        SELECT CAST(dist AS INTEGER) AS dist,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               MIN(node) AS min_node, MAX(node) AS max_node
        FROM lv GROUP BY dist ORDER BY dist
    """,
    "q_triangles": """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS s
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
        ),
        e AS (SELECT p1 AS lo, p2 AS hi FROM e0 WHERE s >= 2),
        w AS (SELECT x.lo AS a, x.hi AS b, y.hi AS c
              FROM e x JOIN e y ON x.hi = y.lo),
        closed AS (
          SELECT CASE WHEN EXISTS (SELECT 1 FROM e z
                                   WHERE z.lo = w.a AND z.hi = w.c)
                      THEN 1 ELSE 0 END AS hit
          FROM w
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
               CAST(COUNT(*) AS BIGINT) AS n_wedges,
               CAST(SUM(hit) AS BIGINT) AS n_triangles,
               round(CASE WHEN COUNT(*) > 0
                          THEN CAST(SUM(hit) AS DOUBLE)
                               / CAST(COUNT(*) AS DOUBLE)
                          ELSE 0.0 END, 8) AS closure_rate
        FROM closed
    """,
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


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (round 11, graph.py hits — completing
    the spectral pair with q_pagerank) over the DIRECTED customer →
    supplier purchase arcs: two iterations of hub/authority mutual
    reinforcement, L∞-normalized to 1e4 fixed point with exact integer
    division (the L2 norm's sqrt would round differently per engine).
    Emits the top-15 of each side under one ``kind`` label.  Per
    iteration: two equi-joins of the node-sized score vector against
    the persisted edge list + two map-side-combined groupBys + two
    1-row max broadcasts — the edge relation never re-shuffles.  The
    oracle unrolls both iterations (the q_pagerank discipline)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            F.col("l_suppkey").cast("long").alias("dst"),
        )
        .distinct()
    )
    hubs, auths = G.hits(e, iters=2)

    def top(df: DataFrame, kind: str, prefix: str) -> DataFrame:
        w = Window.orderBy(F.col("score_scaled").desc(), F.col("node").asc())
        return (
            df.orderBy(F.col("score_scaled").desc(), F.col("node").asc())
            .limit(15)
            .select(
                F.lit(kind).alias("kind"),
                F.concat(F.lit(prefix), F.col("node").cast("string"))
                .alias("node"),
                "score_scaled",
                F.row_number().over(w).cast("long").alias("rk"),
            )
        )

    return (
        top(hubs, "hub", "C").unionByName(top(auths, "authority", "S"))
        .orderBy("kind", "rk")
    )


def _hits_oracle(iters: int = 2, scale: int = 10_000) -> str:
    ctes = ["""e AS MATERIALIZED (
          SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )""", f"""h0 AS (
          SELECT src AS node, CAST({scale} AS BIGINT) AS s
          FROM (SELECT DISTINCT src FROM e)
        )"""]
    prev_h = "h0"
    for i in range(1, iters + 1):
        ctes.append(f"""a{i}r AS MATERIALIZED (
          SELECT e.dst AS node, CAST(SUM(h.s) AS BIGINT) AS raw
          FROM e JOIN {prev_h} h ON e.src = h.node GROUP BY e.dst
        ),
        a{i} AS MATERIALIZED (
          SELECT node,
                 (raw * {scale}) // (SELECT MAX(raw) FROM a{i}r) AS s
          FROM a{i}r
        ),
        h{i}r AS MATERIALIZED (
          SELECT e.src AS node, CAST(SUM(a.s) AS BIGINT) AS raw
          FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src
        ),
        h{i} AS MATERIALIZED (
          SELECT node,
                 (raw * {scale}) // (SELECT MAX(raw) FROM h{i}r) AS s
          FROM h{i}r
        )""")
        prev_h = f"h{i}"
    sep = ",\n        "
    body = sep.join(ctes)
    return f"""
        WITH {body}
        SELECT kind, node, score_scaled, rk FROM (
          SELECT 'hub' AS kind, 'C' || CAST(node AS VARCHAR) AS node,
                 s AS score_scaled,
                 row_number() OVER (ORDER BY s DESC, node ASC) AS rk
          FROM h{iters}
        ) WHERE rk <= 15
        UNION ALL
        SELECT kind, node, score_scaled, rk FROM (
          SELECT 'authority' AS kind, 'S' || CAST(node AS VARCHAR) AS node,
                 s AS score_scaled,
                 row_number() OVER (ORDER BY s DESC, node ASC) AS rk
          FROM a{iters}
        ) WHERE rk <= 15
        ORDER BY kind, rk"""


QUERIES["q_hits"] = q_hits
ORACLE["q_hits"] = _hits_oracle()
