"""SQL-API queries: the engine's second entry point (spark.sql over temp
views — Catalyst produces the same plans as the DataFrame API). Shapes are
TPC-H Q3/Q5 analogues adapted to the fixture schema; aggregates use the
integer-cents discipline so the oracle hash is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fossa_spark.queries._util import TABLES, load, sql_cents


def _register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...]) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(f"fs_{t}")


_Q3 = f"""
SELECT o_orderkey,
       CAST(SUM({sql_cents("l_extendedprice * (1.0 - l_discount)", 4)}) AS DOUBLE)
         / 10000.0 AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority
FROM fs_customer
JOIN fs_orders   ON c_custkey = o_custkey
JOIN fs_lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 20
"""

_Q5 = f"""
SELECT r_name,
       CAST(SUM({sql_cents("l_extendedprice * (1.0 - l_discount)", 4)}) AS DOUBLE)
         / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM fs_lineitem
JOIN fs_orders   ON l_orderkey = o_orderkey
JOIN fs_supplier ON l_suppkey = s_suppkey
JOIN fs_nation   ON s_nationkey = n_nationkey
JOIN fs_region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r_name
ORDER BY revenue DESC, r_name
"""


def q_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority) through the SQL entry point.
    Catalyst prunes fs_customer to (c_custkey, c_mktsegment), pushes both
    date filters into the scans, and broadcast-joins the filtered customer
    side — same physical plan the DataFrame formulation would get."""
    _register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    df = spark.sql(_Q3)
    from pyspark.sql import functions as F

    return df.withColumn("order_date", F.date_format("order_date", "yyyy-MM-dd"))


def q_sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (regional revenue): three broadcast dims + one
    fact-fact join, one shuffle on the agg key."""
    _register_views(spark, sf_dir, TABLES[:7])
    return spark.sql(_Q5)


_SCALAR_SUB = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM fs_orders
WHERE o_totalprice > (
  SELECT (CAST(SUM({sql_cents("o_totalprice")}) AS DOUBLE) / 100.0)
         / CAST(COUNT(*) AS DOUBLE) * 1.5
  FROM fs_orders
)
ORDER BY o_orderkey
"""

_IN_SUB = """
SELECT c_custkey, c_name
FROM fs_customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM fs_nation WHERE n_regionkey <= 1
)
ORDER BY c_custkey
"""


def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a filter (orders above 1.5× the exact average) —
    Catalyst plans the subquery once, broadcasts the scalar.  1.5× (not 2×)
    because the fixture's totalprice distribution has no order above 2× the
    mean: the old cut returned 0 rows, a trivially-passing empty check."""
    _register_views(spark, sf_dir, ("orders",))
    return spark.sql(_SCALAR_SUB)


def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join after Catalyst rewrite."""
    _register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(_IN_SUB)


_GROUPING_SETS = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
       COUNT(*) AS n_orders,
       CAST(SUM({sql_cents("o_totalprice")}) AS DOUBLE) / 100.0 AS total_price
FROM fs_orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() marker columns (distinct from
    the rollup/cube shorthands: arbitrary set list)."""
    _register_views(spark, sf_dir, ("orders",))
    return spark.sql(_GROUPING_SETS)


def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join surfaced as an inventory query: both sides
    written bucketBy(orderkey) once, then joined with zero shuffle
    (the pay-at-write-time pattern for recurring 100 TB fact-fact joins).
    The oracle checks the aggregate over the join result."""
    import tempfile

    from fossa_spark.queries._util import cents
    from fossa_spark.sources import colocated_join, write_bucketed

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    base = tempfile.mkdtemp(prefix="fossa_bucketed_")
    spark.sql("DROP TABLE IF EXISTS fsb_lineitem")
    spark.sql("DROP TABLE IF EXISTS fsb_orders")
    write_bucketed(li, "fsb_lineitem", "l_orderkey", buckets=8,
                   path=f"{base}/li", sort_by="l_orderkey")
    write_bucketed(o, "fsb_orders", "l_orderkey", buckets=8,
                   path=f"{base}/o", sort_by="l_orderkey")
    from pyspark.sql import functions as F

    j = colocated_join(spark, "fsb_lineitem", "fsb_orders", "l_orderkey")
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(cents("l_quantity")).cast("double") / 100.0).alias("total_qty"),
        )
        .orderBy("o_orderstatus")
    )


_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol_cents) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         {sql_cents("l_extendedprice * (1.0 - l_discount)", 4)} AS vol_cents
  FROM fs_supplier
  JOIN fs_lineitem ON s_suppkey = l_suppkey
  JOIN fs_orders   ON o_orderkey = l_orderkey
  JOIN fs_customer ON c_custkey = o_custkey
  JOIN fs_nation n1 ON s_nationkey = n1.n_nationkey
  JOIN fs_nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (   (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

_Q10 = f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({sql_cents("l_extendedprice * (1.0 - l_discount)", 4)}) AS DOUBLE)
         / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM fs_customer
JOIN fs_orders   ON c_custkey = o_custkey
JOIN fs_lineitem ON l_orderkey = o_orderkey
JOIN fs_nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM fs_orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM fs_lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_Q14 = f"""
SELECT round(
         CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN {sql_cents("l_extendedprice * (1.0 - l_discount)", 4)}
                       ELSE 0 END) AS DOUBLE)
         / CAST(SUM({sql_cents("l_extendedprice * (1.0 - l_discount)", 4)})
                AS DOUBLE) * 100.0,
         8) AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM fs_lineitem
JOIN fs_part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""

_Q17 = f"""
SELECT CAST(SUM({sql_cents("l_extendedprice")}) AS DOUBLE) / 100.0 / 7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM fs_lineitem
JOIN fs_part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM fs_lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""

_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       CAST(SUM(l_quantity) AS BIGINT) AS total_qty
FROM fs_customer
JOIN fs_orders   ON c_custkey = o_custkey
JOIN fs_lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM fs_lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > 250.0
)
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

_Q19 = f"""
SELECT CAST(SUM({sql_cents("l_extendedprice * (1.0 - l_discount)", 4)}) AS DOUBLE)
         / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM fs_lineitem
JOIN fs_part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""

_Q22 = f"""
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM({sql_cents("c_acctbal")}) AS DOUBLE) / 100.0 AS totacctbal
FROM fs_customer
WHERE c_acctbal > (
    SELECT CAST(SUM({sql_cents("c2.c_acctbal")}) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) / 100.0
    FROM fs_customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM fs_orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q_sql_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS over returned
    lineitems → Catalyst rewrites to a left-semi hash join on orderkey;
    the quarter window prunes the orders scan before the join.
    (Fixture has no l_commitdate/l_receiptdate; l_returnflag='R' stands in
    for the late-delivery predicate.)"""
    _register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q4)


def q_sql_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue share): conditional aggregation —
    two SUM(CASE ...) branches over one broadcast part join, single pass,
    exact integer-cents numerator/denominator with one final division."""
    _register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q14)


def q_sql_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): correlated scalar
    aggregate subquery (per-part 20% of avg quantity) — Catalyst de-
    correlates it into an aggregate + join, so the inner lineitem relation
    is scanned once, not per row."""
    _register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q17)


def q_sql_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN-subquery over a
    GROUP BY/HAVING aggregate → left-semi join against the pre-aggregated
    key set; top-100 via TakeOrderedAndProject."""
    _register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q18)


def q_sql_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): disjunction of conjunctive
    brand/size/quantity predicates — the common (p_brand, p_size) x
    quantity-band OR stack; Catalyst extracts the common join key so this
    stays one hash join with the OR as a post-join filter, and pushes the
    derivable per-side bounds into the scans."""
    _register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q19)


def q_sql_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): uncorrelated scalar
    subquery (exact-cents average positive balance, planned once and
    broadcast) + NOT EXISTS anti join against urgent orders.
    (Fixture has no c_phone, so the country-code grouping becomes
    c_nationkey; 'has no urgent order' stands in for 'has no orders'
    because every fixture customer has orders.)"""
    _register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q22)


def q_sql_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations, by year):
    self-joined nation dim under two aliases, both broadcast; the
    nation-pair disjunction filters before the aggregation."""
    _register_views(spark, sf_dir, TABLES[:7])
    return spark.sql(_Q7)


def q_sql_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    returned revenue in a half-year window — pushed date + returnflag
    filters, broadcast dims, TakeOrderedAndProject for the limit."""
    _register_views(spark, sf_dir, TABLES[:7])
    return spark.sql(_Q10)


QUERIES = {
    "q_sql_q3": q_sql_q3,
    "q_sql_q4": q_sql_q4,
    "q_sql_q7": q_sql_q7,
    "q_sql_q10": q_sql_q10,
    "q_sql_q14": q_sql_q14,
    "q_sql_q17": q_sql_q17,
    "q_sql_q18": q_sql_q18,
    "q_sql_q19": q_sql_q19,
    "q_sql_q22": q_sql_q22,
    "q_sql_q5": q_sql_q5,
    "q_agg_grouping_sets": q_agg_grouping_sets,
    "q_subquery_scalar": q_subquery_scalar,
    "q_subquery_in": q_subquery_in,
    "q_join_bucketed": q_join_bucketed,
}

ORACLE = {
    "q_sql_q3": _Q3.replace("fs_", "").replace(
        "CAST(o_orderdate AS DATE) AS order_date",
        "strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date",
    ),
    "q_sql_q4": _Q4.replace("fs_", ""),
    "q_sql_q5": _Q5.replace("fs_", ""),
    "q_sql_q7": _Q7.replace("fs_", ""),
    "q_sql_q10": _Q10.replace("fs_", ""),
    "q_sql_q14": _Q14.replace("fs_", ""),
    "q_sql_q17": _Q17.replace("fs_", ""),
    "q_sql_q18": _Q18.replace("fs_", ""),
    "q_sql_q19": _Q19.replace("fs_", ""),
    "q_sql_q22": _Q22.replace("fs_", ""),
    "q_agg_grouping_sets": _GROUPING_SETS.replace("fs_", ""),
    "q_subquery_scalar": _SCALAR_SUB.replace("fs_", ""),
    "q_subquery_in": _IN_SUB.replace("fs_", ""),
    "q_join_bucketed": f"""
        SELECT o_orderstatus, COUNT(*) AS n_lines,
               CAST(SUM({sql_cents("l_quantity")}) AS DOUBLE) / 100.0 AS total_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
}
