"""Projection / filter / distinct / sort / limit / set operations
(SURVEY.md §2c). Pure narrow transforms + the minimal shuffles Spark needs
(distinct → hash agg; global sort → range-partition exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fossa_spark.queries._util import cents, load


def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project / rename / computed column. Catalyst prunes the parquet scan
    to exactly the referenced columns (check ReadSchema in explain)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("net_price"),
        (F.col("l_quantity") > 25.0).alias("bulk"),
    )


def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunct/disjunct/IN/BETWEEN/LIKE/IS NULL predicates — all pushed to
    the parquet reader where possible (PushedFilters)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus").isin("F", "P"))
        & (F.col("o_totalprice").between(50000.0, 300000.0))
        & (F.col("o_orderpriority").like("%URGENT%") | (F.col("o_orderpriority") == "5-LOW"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash aggregation on all columns."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort with NULLS LAST + LIMIT. Spark plans a
    range-partitioned exchange (sample → rangepartition → local sort);
    with LIMIT, AQE turns it into TakeOrderedAndProject — no full sort at
    scale. Unique tiebreak key makes the limit deterministic."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            "c_name",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment"),
            "c_acctbal",
        )
        .orderBy(
            F.col("segment").asc_nulls_last(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey").asc(),
        )
        .limit(100)
    )


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + UNION DISTINCT."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    all_keys = c.unionByName(s)
    return (
        all_keys.groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .unionByName(
            c.unionByName(s)
            .distinct()
            .select("nationkey", F.lit(-1).cast("long").alias("n_entities"))
        )
        .orderBy("nationkey", "n_entities")
    )


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — nations that have both customers
    and suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customers who never placed a big order."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o).orderBy("custkey")


def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — BAG semantics, the multiset variants
    whose row multiplicities differ from the distinct forms (a key
    appearing 3× left and 1× right survives EXCEPT ALL twice, EXCEPT
    zero-or-once): per-nation customer keys minus supplier keys, both
    with multiplicity. Spark plans these as a Generate over counted
    groups (no distinct collapse); the oracle uses the same ANSI
    operators. Multiplicity surfaces as a count per surviving key so the
    hash check pins the exact bag, not just membership."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    ex = c.exceptAll(s).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_except_all")
    )
    ix = c.intersectAll(s).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    return (
        ex.join(ix, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_except_all", F.lit(0)).alias("n_except_all"),
            F.coalesce("n_intersect_all", F.lit(0)).alias("n_intersect_all"),
        )
        .orderBy("nationkey")
    )


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): orders not dominated on
    (earlier-or-equal date, higher-or-equal price, one strict) — the
    classic maximal-vector query.  The naive definition is an O(n²)
    NOT-EXISTS self-join — exactly what the ORACLE runs — but the Spark
    plan is the two-phase distributed sweep (operators.skyline_2d): a
    range exchange on date, per-partition maxima folded into a broadcast
    exclusive prefix, then one partition-local value-RANGE window. No
    join and no corpus-wide single-partition window — the shape that
    still works when the fact table is 10⁹ rows and the self-join is
    10¹⁸ comparisons."""
    from fossa_spark.operators import skyline_2d

    o = load(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        cents("o_totalprice").alias("c"),
    )
    return (
        skyline_2d(d, "epoch_s", "c", "o_orderkey")
        .select(
            "o_orderkey",
            F.col("_x").alias("epoch_s"),
            (F.col("_y").cast("double") / 100.0).alias("price"),
        )
        .orderBy("epoch_s", "o_orderkey")
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide per-part price+size columns to (metric, value)
    rows — Spark's unpivot API; oracle mirrors with UNION ALL."""
    p = load(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.col("p_retailprice").alias("retail_price"),
        F.col("p_size").cast("double").alias("size_val"),
    )
    return wide.unpivot(
        ids=["p_partkey"],
        values=["retail_price", "size_val"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("p_partkey", "metric")


def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge (MERGE INTO semantics): a change feed derived
    deterministically from orders (one change per order on multiple-of-7
    orderkeys; custkey%10==0 → delete, else upsert with a new balance;
    latest orderkey per customer wins) applied to the customer snapshot —
    window last-change + full-outer join + per-column case, the plan the
    lakehouse MERGE implementations lower to."""
    from fossa_spark.operators import apply_changes

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    changes = o.select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(F.col("o_custkey") % 10 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("o_orderkey").alias("seq"),
        F.concat(F.lit("upd_"), F.col("o_custkey").cast("string")).alias("c_name"),
        F.round(F.col("o_totalprice"), 2).alias("c_acctbal"),
        F.lit("CDC").alias("c_mktsegment"),
    )
    return apply_changes(c, changes, "c_custkey", "op", "seq").orderBy("c_custkey")


def q_union_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: three batches whose schemas diverged over time
    (a column added, a column dropped) reconciled with
    unionByName(allowMissingColumns=True) — missing fields become NULLs,
    names align by NAME not position (positional unionAll silently
    mismatches columns; this is the safe evolution path for multi-batch
    100 TB ingests). The aggregate counts per-field presence so the NULL
    padding itself is hash-verified."""
    o = load(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey", "o_totalprice")
    v2 = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    v3 = o.filter(F.col("o_orderkey") % 3 == 2).select("o_orderkey", "o_orderstatus")
    u = v1.unionByName(v2, allowMissingColumns=True).unionByName(
        v3, allowMissingColumns=True
    )
    from fossa_spark.queries._util import cents

    return u.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_price"),
        F.count("o_orderstatus").alias("n_status"),
        F.sum(cents("o_totalprice")).alias("price_cents"),
    )


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (table diff): classify every key across two
    snapshots as added / removed / changed / unchanged — the regression
    gate run after every pipeline rewrite ('same output as yesterday?').
    Snapshot B is derived deterministically from orders (keys %7==0
    dropped, %5==0 re-priced, %3==0 new keys added), so the oracle can
    state the expected classification exactly. Scale shape: one full
    outer join on the key (both sides shuffle once on the same key — AQE
    merges the exchanges) + per-class counts; value comparison uses exact
    cents, never raw doubles."""
    from fossa_spark.queries._util import cents

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("vc")
    )
    b_kept = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("vc") + 100)
        .otherwise(F.col("vc"))
        .alias("vc"),
    )
    b_new = o.filter(F.col("o_orderkey") % 3 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"), F.col("vc")
    )
    b = b_kept.unionByName(b_new)
    a = o.select(F.col("o_orderkey").alias("k"), F.col("vc").alias("va"))
    d = b.select(F.col("o_orderkey").alias("k"), F.col("vc").alias("vb"))
    j = a.join(d, "k", "full_outer")
    cls = (
        F.when(F.col("va").isNull(), F.lit("added"))
        .when(F.col("vb").isNull(), F.lit("removed"))
        .when(F.col("va") != F.col("vb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(cls.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("status")
    )


QUERIES = {
    "q_union_evolve": q_union_evolve,
    "q_table_diff": q_table_diff,
    "q_cdc_upsert": q_cdc_upsert,
    "q_project": q_project,
    "q_unpivot": q_unpivot,
    "q_filter": q_filter,
    "q_distinct": q_distinct,
    "q_sort": q_sort,
    "q_set_union": q_set_union,
    "q_set_intersect": q_set_intersect,
    "q_set_except": q_set_except,
    "q_set_except_all": q_set_except_all,
    "q_skyline": q_skyline,
}

ORACLE = {
    # naive-definition oracle for the skyline: the O(n²) NOT EXISTS the
    # window formulation must reproduce exactly
    "q_skyline": """
        WITH d AS (
          SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
          FROM orders
        )
        SELECT a.o_orderkey, a.epoch_s, CAST(a.c AS DOUBLE) / 100.0 AS price
        FROM d a
        WHERE NOT EXISTS (
          SELECT 1 FROM d b
          WHERE b.epoch_s <= a.epoch_s AND b.c >= a.c
            AND (b.epoch_s < a.epoch_s OR b.c > a.c)
        )
        ORDER BY a.epoch_s, a.o_orderkey
    """,
    # expected classification: %7==0 removed; surviving %5==0 changed;
    # %3==0 keys re-added under offset ids = added; rest unchanged
    "q_table_diff": """
        WITH a AS (
          SELECT o_orderkey AS k,
                 CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS va
          FROM orders
        ),
        b AS (
          SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 5 = 0
                      THEN CAST(ROUND(o_totalprice * 100.0) AS BIGINT) + 100
                      ELSE CAST(ROUND(o_totalprice * 100.0) AS BIGINT) END
                   AS vb
          FROM orders WHERE o_orderkey % 7 <> 0
          UNION ALL
          SELECT o_orderkey + 10000000 AS k,
                 CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS vb
          FROM orders WHERE o_orderkey % 3 = 0
        )
        SELECT status, CAST(COUNT(*) AS BIGINT) AS n_keys FROM (
          SELECT CASE WHEN a.va IS NULL THEN 'added'
                      WHEN b.vb IS NULL THEN 'removed'
                      WHEN a.va <> b.vb THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM a FULL OUTER JOIN b ON a.k = b.k
        ) GROUP BY status ORDER BY status
    """,
    # NULL padding from by-name union: price absent for %3==2 rows, status
    # absent for %3==0 rows — presence counts verify the padding exactly
    "q_union_evolve": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey % 3 <> 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_price,
               CAST(SUM(CASE WHEN o_orderkey % 3 <> 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_status,
               CAST(SUM(CASE WHEN o_orderkey % 3 <> 2
                             THEN CAST(ROUND(o_totalprice * 100.0) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS price_cents
        FROM orders
    """,
    "q_cdc_upsert": """
        WITH changes AS (
          SELECT o_custkey AS c_custkey,
                 CASE WHEN o_custkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
                 o_orderkey AS seq,
                 'upd_' || CAST(o_custkey AS VARCHAR) AS c_name,
                 round(o_totalprice, 2) AS c_acctbal,
                 'CDC' AS c_mktsegment
          FROM orders WHERE o_orderkey % 7 = 0
        ),
        last AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY c_custkey
                                         ORDER BY seq DESC) AS rn
            FROM changes
          ) WHERE rn = 1
        )
        SELECT COALESCE(s.c_custkey, l.c_custkey) AS c_custkey,
               CASE WHEN l.op = 'U' THEN l.c_name ELSE s.c_name END AS c_name,
               CASE WHEN l.op = 'U' THEN l.c_acctbal ELSE s.c_acctbal END
                 AS c_acctbal,
               CASE WHEN l.op = 'U' THEN l.c_mktsegment ELSE s.c_mktsegment END
                 AS c_mktsegment
        FROM customer s FULL OUTER JOIN last l ON s.c_custkey = l.c_custkey
        WHERE l.op IS NULL OR l.op <> 'D'
        ORDER BY c_custkey
    """,
    "q_unpivot": """
        SELECT p_partkey, 'retail_price' AS metric, p_retailprice AS value FROM part
        UNION ALL
        SELECT p_partkey, 'size_val', CAST(p_size AS DOUBLE) FROM part
        ORDER BY p_partkey, metric
    """,
    "q_project": """
        SELECT l_orderkey AS okey, l_linenumber AS line,
               l_extendedprice * (1.0 - l_discount) AS net_price,
               l_quantity > 25.0 AS bulk
        FROM lineitem
    """,
    "q_filter": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus IN ('F','P')
          AND o_totalprice BETWEEN 50000.0 AND 300000.0
          AND (o_orderpriority LIKE '%URGENT%' OR o_orderpriority = '5-LOW')
          AND o_custkey IS NOT NULL
    """,
    "q_distinct": "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "q_sort": """
        SELECT c_custkey, c_name, nullif(c_mktsegment, 'BUILDING') AS segment, c_acctbal
        FROM customer
        ORDER BY segment ASC NULLS LAST, c_acctbal DESC, c_custkey ASC
        LIMIT 100
    """,
    "q_set_union": """
        WITH allk AS (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL SELECT s_nationkey FROM supplier
        )
        SELECT nationkey, COUNT(*) AS n_entities FROM allk GROUP BY nationkey
        UNION ALL
        SELECT DISTINCT nationkey, -1 AS n_entities FROM allk
        ORDER BY nationkey, n_entities
    """,
    "q_set_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    "q_set_except": """
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
        ORDER BY custkey
    """,
    "q_set_except_all": """
        WITH ex AS (
          SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_except_all FROM (
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL
            SELECT s_nationkey FROM supplier
          ) GROUP BY nationkey
        ),
        ix AS (
          SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_intersect_all FROM (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT ALL
            SELECT s_nationkey FROM supplier
          ) GROUP BY nationkey
        )
        SELECT COALESCE(ex.nationkey, ix.nationkey) AS nationkey,
               COALESCE(n_except_all, 0) AS n_except_all,
               COALESCE(n_intersect_all, 0) AS n_intersect_all
        FROM ex FULL OUTER JOIN ix ON ex.nationkey = ix.nationkey
        ORDER BY nationkey
    """,
}
