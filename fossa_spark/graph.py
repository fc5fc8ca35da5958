"""Iterative graph operators on DataFrames: PageRank over an edge list.

Companion to the connected-components operator (llm/dedup.py:298-418 —
min-label propagation with checkpointed rounds); PageRank is the weighted
power-iteration sibling. The reference engine has no graph operators at all
(its dataflow is a task DAG, not data graphs — /root/reference/lib/fossa),
so this family is part of the beyond-reference analytics surface.

Determinism contract: rank mass is held as exact 1e12-scaled BIGINTs.
Per-edge contributions use integer division (``pr div outdeg``), so the
per-node SUM is an order-independent integer — a raw double PageRank can
never be hash-compared across engines because float addition is not
associative. The only float ops are one multiply-by-damping and one final
rescale, both single deterministic IEEE ops per value. The DuckDB oracle
unrolls the same iterations as CTEs and matches bit-for-bit.

Scale shape (100 TB): edges are built once (one fact-join shuffle), then
each iteration is one equi-join of the rank vector against the persisted
edge list plus one groupBy(dst) with map-side partial sums — the classic
distributed power iteration. The rank vector is node-sized, edges dominate;
both stay partitioned on their join keys. For deep iteration counts,
truncate lineage every few rounds exactly like connected_components does
(localCheckpoint) — at 3 rounds the lazy plan is fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE = int(1e12)


def bipartite_purchase_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Customer↔supplier purchase graph: an undirected edge per distinct
    (customer, supplier) trading pair, emitted as both directed arcs so
    every node has out-degree ≥ 1 (no dangling-mass correction needed).

    Node ids stay INTEGER through every join and aggregation — customers
    as their key, suppliers as ``-suppkey - 1`` (disjoint by sign, so the
    reversed arcs can never collide with forward ones). String-labeled
    nodes would work, but every per-iteration shuffle would then hash and
    compare strings; at 10⁹ edges that's the difference that matters.
    Callers label nodes for presentation AFTER the iterations (one narrow
    pass over the node-sized result)."""
    pairs = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (-F.col("l_suppkey").cast("long") - 1).alias("dst"),
        )
        .distinct()
    )
    return pairs.unionByName(pairs.select(F.col("dst").alias("src"),
                                          F.col("src").alias("dst")))


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85) -> DataFrame:
    """Power-iteration PageRank over a directed edge list (src, dst).

    Returns (node, pr_scaled BIGINT, pr DOUBLE). pr_scaled is the exact
    1e12 fixed-point rank; pr is the single final rescale. Nodes are the
    set appearing in edges. Every node must have out-degree ≥ 1 (callers
    with dangling nodes should add self-loops or reversed arcs first).
    """
    edges = edges.persist()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # per-arc out-degree rides with the edge list: built once, reused every
    # iteration.  Persisted HASH-PARTITIONED AND SORTED on src (round 14,
    # the hits() two-copy discipline): the cached relation's partitioning/
    # ordering satisfies the per-iteration sort-merge join's requirement,
    # so only the node-sized rank vector shuffles each round — before,
    # every iteration re-exchanged and re-sorted the full edge list.
    edgesdeg = (
        edges.join(outdeg, "src")
        .repartition("src")
        .sortWithinPartitions("src")
        .persist()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    # corpus scalars as a 1-row broadcast: initial rank S/N and the
    # per-iteration teleport base (1-d)·S/N — no driver collect
    consts = nodes.agg(
        F.round(F.lit(float(SCALE)) / F.count(F.lit(1)).cast("double"))
        .cast("bigint").alias("pr0"),
        F.round(F.lit((1.0 - damping) * SCALE) / F.count(F.lit(1)).cast("double"))
        .cast("bigint").alias("base"),
    )
    pr = nodes.crossJoin(F.broadcast(consts)).select(
        "node", F.col("pr0").alias("pr"), "base"
    )
    for _ in range(iters):
        contrib = (
            edgesdeg.join(pr, edgesdeg.src == pr.node)
            .select(F.col("dst"), F.expr("pr div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(consts))
            .join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.col("base")
                    + F.round(
                        F.lit(damping)
                        * F.coalesce("contrib", F.lit(0)).cast("double")
                    ).cast("bigint")
                ).alias("pr"),
                "base",
            )
        )
    return pr.select(
        "node",
        F.col("pr").alias("pr_scaled"),
        (F.col("pr").cast("double") / float(SCALE)).alias("pr"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count over an undirected edge list (src, dst).

    Canonical-ordering formulation: orient every edge low→high, then a
    triangle (a<b<c) is counted exactly once as e(a,b) ⋈ e(b,c) ⋈ e(a,c)
    — two equi-joins, no direction double-counting, no post-hoc division
    by 6. At scale the joins shuffle on (b) then (a,c); the classic skew
    refinement (not needed here) orients by degree instead of id so hub
    vertices don't own every wedge. Returns a 1-row frame:
    (n_edges, n_wedges, n_triangles, clustering coefficient)."""
    e = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .persist()
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    wedges = ab.join(bc, "b").select("a", "b", "c")
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"), F.lit(1).alias("_hit"))
    closed = wedges.join(ac, ["a", "c"], "left")
    return (
        closed.agg(
            F.count(F.lit(1)).alias("n_wedges"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_triangles"),
        )
        .crossJoin(F.broadcast(e.agg(F.count(F.lit(1)).alias("n_edges"))))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    F.col("n_triangles").cast("double")
                    / F.col("n_wedges").cast("double"),
                ).otherwise(F.lit(0.0)),
                8,
            ).alias("closure_rate"),
        )
    )


def bfs_levels(edges: DataFrame, sources: DataFrame, max_depth: int = 3) -> DataFrame:
    """Breadth-first shortest hop distance from a source set over a
    directed edge list (src, dst) → (node, dist), dist ≤ max_depth.

    Classic distributed frontier expansion: each round joins the CURRENT
    FRONTIER (not the visited set) against the edge list, anti-joins the
    visited set, and unions the new level in — so per-round work is
    O(frontier × avg-degree), the textbook BSP/Pregel BFS. Lineage is
    truncated per round with eager localCheckpoints (the same contract as
    connected_components: without truncation the plan doubles per round);
    on a cluster, use reliable checkpoint() to survive executor loss.
    Stops early when a frontier comes back empty — the one scalar count
    per round is control-plane, not data movement."""
    # hash-partitioned + sorted on the per-round join key (round 14): the
    # cached layout satisfies the sort-merge join requirement, so each
    # round only shuffles the frontier — one up-front edge exchange
    # replaces one per round
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    visited = sources.select("node").distinct().select(
        "node", F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("node").alias("src")), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(d).alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    edges.unpersist()
    return visited


def k_core(edges: DataFrame, k: int = 3, max_iter: int = 12) -> DataFrame:
    """The k-core of an undirected graph (both arcs present in ``edges``):
    iteratively peel nodes of degree < k until the remainder is stable.
    Returns the surviving arc list.

    Each round is one degree aggregate + two semi-joins (src and dst both
    in the surviving node set) — no collect of nodes, lineage truncated
    per round. Converges in at most O(peeling-depth) rounds; raises
    RuntimeError if ``max_iter`` rounds don't reach a fixpoint, because a
    silently-unpeeled core corrupts every downstream density metric (and
    because the SQL oracle unrolls a FIXED round count — the raise is
    what makes the fixed unroll sound)."""
    # LAZY checkpoints (round 14, the als_rank2 chain pattern): the
    # convergence count() right after each round is a full-coverage
    # action, so it both materializes the checkpoint and reads the
    # cardinality — one job per round instead of two
    cur = edges.localCheckpoint(eager=False)
    n_prev = cur.count()
    for _ in range(max_iter):
        keep = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select(F.col("src").alias("node"))
        )
        cur = (
            cur.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        n = cur.count()
        if n == n_prev:
            return cur
        n_prev = n
    raise RuntimeError(f"k_core did not converge within {max_iter} rounds")


def weighted_purchase_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Customer↔supplier purchase graph with exact integer edge weights:
    weight(cust, supp) = MIN over their shared lineitems of the line's
    price in cents (cheapest observed transaction — a deterministic,
    overflow-safe cost metric). Same sign-disjoint node encoding as
    bipartite_purchase_edges; both directed arcs emitted.

    Build = one fact join + one map-side-combined groupBy(min) — the
    weight aggregate collapses the fact table to pair grain before any
    iteration touches it."""
    pairs = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        )
        .groupBy(
            F.col("o_custkey").cast("long").alias("src"),
            (-F.col("l_suppkey").cast("long") - 1).alias("dst"),
        )
        .agg(
            F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "w"
            )
        )
    )
    return pairs.unionByName(
        pairs.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )


def bellman_ford(
    edges: DataFrame, sources: DataFrame, rounds: int = 4
) -> DataFrame:
    """Single-source shortest paths by ``rounds`` synchronous min-plus
    relaxations over a weighted arc list (src, dst, w: exact BIGINT) —
    distributed Bellman-Ford, the Pregel SSSP kernel. Returns (node,
    dist) for every node reached within ``rounds`` hops: the exact
    shortest-path cost among paths of at most that many edges (weights
    are non-negative here, so dist is also a monotone upper bound that
    has CONVERGED for any node whose true shortest path uses ≤ rounds
    edges).

    Per round: one equi-join of the (node-sized) distance vector against
    the persisted edge list + one map-side-combined groupBy(dst) MIN +
    one outer-merge MIN with the previous vector — all integer min-plus,
    order-independent, so the DuckDB oracle unrolls the same rounds and
    hash-matches exactly. Lineage truncated per round (localCheckpoint,
    same contract as bfs_levels); on a cluster use checkpoint() to
    survive executor loss."""
    # hash-partitioned + sorted on src (round 14, the bfs_levels fix):
    # one up-front edge exchange instead of one per relaxation round
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    dist = (
        sources.select("node")
        .distinct()
        .select("node", F.lit(0).cast("bigint").alias("dist"))
        .localCheckpoint(eager=True)
    )
    # intermediate rounds checkpoint LAZILY (the als_rank2 round-14
    # pattern: lineage still truncates at materialization, but the fixed
    # round count collapses into one action instead of a driver job
    # boundary per round); the final round is forced eagerly so the
    # edge cache is only released after every consumer has run
    for i in range(rounds):
        relaxed = (
            edges.join(dist.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("relax"))
        )
        dist = (
            dist.join(relaxed, "node", "full_outer")
            .select(
                "node",
                # least() skips NULLs in Spark; the oracle mirrors this
                # with an explicit CASE so both engines share one rule
                F.least("dist", "relax").alias("dist"),
            )
            .localCheckpoint(eager=(i == rounds - 1))
        )
    edges.unpersist()
    return dist


HITS_SCALE = 10_000  # L-infinity-normalized hub/authority fixed point


def hits(edges: DataFrame, iters: int = 2,
         scale: int = HITS_SCALE) -> "tuple[DataFrame, DataFrame]":
    """HITS (Kleinberg 1999) hubs-and-authorities over a DIRECTED edge
    list (src, dst) — the spectral sibling of :func:`pagerank`, in the
    same oracle-replayable fixed-point discipline.

    Each iteration: authority(v) = Σ_{u→v} hub(u), then hub(u) =
    Σ_{u→v} authority(v), each L∞-normalized to ``scale`` with exact
    integer division (values are nonnegative, so truncating `div` IS
    floor in both engines — the pagerank `pr div deg` convention; the
    classic L2 normalization needs an irrational sqrt both engines
    would round differently).  Headroom: raw ≤ max_degree·scale and the
    normalize multiplies by scale once, so int64 holds through degree
    ~9e13/scale (~1e10 at the default) — far past any real graph.

    Scale shape per iteration: TWO equi-joins of the node-sized score
    vector against pre-partitioned edge copies + two map-side-combined
    groupBys + two 1-row max aggregates ridden in as broadcasts.  The
    join key ALTERNATES src/dst each half-iteration, so a single
    unpartitioned cache still paid one corpus-sized edge exchange per
    half-iteration (r11's worst decade ratio, 5.2×); round 12 persists
    TWO copies, hash-partitioned by src and by dst, so every join's
    edge side already satisfies its required distribution and only the
    node-sized score vector ever crosses the wire (on a real cluster
    the same two copies would be bucketed tables — storage-for-shuffle,
    the standard trade for any alternating-key iterative join).

    Returns (hubs, authorities): (node, score_scaled BIGINT) each, for
    every node on that side of the arcs."""
    e_src = edges.repartition("src").persist()
    e_dst = edges.repartition("dst").persist()
    # distinct over src reuses e_src's partitioning: no extra exchange
    hubs = e_src.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(scale).cast("bigint").alias("s")
    )

    def _norm(raw: DataFrame) -> DataFrame:
        # raw is node-sized: checkpoint it BEFORE deriving the max, or
        # the 1-row aggregate and the normalize join would each replay
        # the edge join + groupBy that produced it (first cut paid 2x
        # the edge work per half-iteration: sf10 warm 45 s -> ~12 s).
        # LAZY since round 14 (the als_rank2 chain pattern): the max-agg
        # broadcast that consumes raw first is a full-coverage job, so it
        # materializes the checkpoint; the four per-run eager job
        # boundaries collapse into the final forcing action below.
        raw = raw.localCheckpoint(eager=False)
        mx = raw.agg(F.max("raw").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "node",
            F.expr(f"(raw * CAST({scale} AS BIGINT)) div mx").alias("s"),
        )

    auths = None
    for _ in range(iters):
        a_raw = (
            e_src.join(hubs, e_src.src == hubs.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("s").alias("raw"))
        )
        auths = _norm(a_raw)
        h_raw = (
            e_dst.join(auths, e_dst.dst == auths.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("s").alias("raw"))
        )
        hubs = _norm(h_raw)
    # force the final hub table once — its lineage runs through every
    # lazy per-half-iteration checkpoint (auths included), so this one
    # action materializes the whole chain before the edge caches drop
    hubs = hubs.localCheckpoint(eager=True)
    # _norm localCheckpoints every node-sized score relation, so the
    # returned frames no longer reference the edge plans — drop both
    # cached copies now instead of leaking 2x the edge list per call
    # (ADVICE r12)
    e_src.unpersist()
    e_dst.unpersist()
    return (
        hubs.select("node", F.col("s").alias("score_scaled")),
        auths.select("node", F.col("s").alias("score_scaled")),
    )


def triangles(
    edges: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Exact triangle counting + global clustering coefficient over an
    undirected simple graph given as canonical (a < b) pairs — the
    degree-ordered orientation algorithm (each edge points from its
    lower-(degree, id) endpoint to the higher one, so every node's
    out-degree is O(√m) on any graph and the wedge join's fan-out is
    bounded no matter how skewed the degree distribution: the classic
    MapReduce triangle-counting discipline).

    Per triangle {u, v, w} exactly ONE oriented wedge u→v, u→w with
    ord(v) < ord(w) exists and is closed by the oriented edge v→w, so
    counts are exact with no dedup pass.  Scale shape: degree = one
    groupBy over 2m endpoint rows; the wedge join and the closing join
    are equi-joins on node ids; total wedge work is Σ out-deg² ≤
    O(m^1.5).

    Returns one row per node that participates in ≥ 1 triangle:
    (node, n_tri) with the graph totals repeated on every row
    (n_triangles, n_wedges = Σ C(deg,2), gcc = 3·triangles/wedges
    rounded 8 dp) for hash checking."""
    p = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    deg = (
        p.select(F.col("a").alias("node"))
        .unionAll(p.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    j = (
        p.join(deg.select(F.col("node").alias("a"),
                          F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    )
    # the oriented edge list feeds both wedge sides and the closing
    # join; the triangle relation feeds the per-node explode (3 union
    # branches) and the totals — without materialization the wedge join
    # (the O(m^1.5) step) re-ran once per consumer, 4x in all (round 14)
    o = o.persist()
    o1 = o.select(F.col("src"), F.col("dst").alias("v"),
                  F.col("dst_deg").alias("vdeg"))
    o2 = o.select(F.col("src"), F.col("dst").alias("w"),
                  F.col("dst_deg").alias("wdeg"))
    wedge = o1.join(o2, "src").filter(
        (F.col("vdeg") < F.col("wdeg"))
        | ((F.col("vdeg") == F.col("wdeg")) & (F.col("v") < F.col("w")))
    )
    tri = wedge.join(
        o.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
    ).select(F.col("src").alias("u"), "v", "w").localCheckpoint(eager=True)
    o.unpersist()
    pern = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    totals = tri.agg(F.count(F.lit(1)).alias("n_triangles")).crossJoin(
        F.broadcast(
            deg.agg(
                F.sum(F.expr("(deg * (deg - 1)) div 2"))
                .alias("n_wedges")
            )
        )
    )
    return (
        pern.crossJoin(F.broadcast(totals))
        .select(
            "node",
            "n_tri",
            "n_triangles",
            "n_wedges",
            F.round(
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"),
                8,
            ).alias("gcc"),
        )
    )
