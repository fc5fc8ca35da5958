"""SQL-API queries: the engine's second entry point (spark.sql over temp
views — Catalyst produces the same plans as the DataFrame API). Shapes are
TPC-H Q3/Q5 analogues adapted to the fixture schema; aggregates use the
integer-cents discipline so the oracle hash is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

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
    The bucketed write is idempotent per (session, sf) — pay-at-write-time
    means exactly that: repeat executions (the driver's second run, bench
    warm pass, every recurring production join) read the existing layout.
    The oracle checks the aggregate over the join result."""
    import hashlib
    import tempfile

    from fossa_spark.queries._util import cents
    from fossa_spark.sources import colocated_join, write_bucketed

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t_li, t_o = f"fsb_lineitem_{tag}", f"fsb_orders_{tag}"
    if not (spark.catalog.tableExists(t_li) and spark.catalog.tableExists(t_o)):
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus")
            .withColumnRenamed("o_orderkey", "l_orderkey")
        )
        base = tempfile.mkdtemp(prefix="fossa_bucketed_")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        write_bucketed(li, t_li, "l_orderkey", buckets=8,
                       path=f"{base}/li", sort_by="l_orderkey")
        write_bucketed(o, t_o, "l_orderkey", buckets=8,
                       path=f"{base}/o", sort_by="l_orderkey")
    from pyspark.sql import functions as F

    j = colocated_join(spark, t_li, t_o, "l_orderkey")
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


_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM fs_supplier
JOIN fs_lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN fs_orders ON o_orderkey = l1.l_orderkey
JOIN fs_nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM fs_lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM fs_lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM fs_customer LEFT OUTER JOIN fs_orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_sql_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the planner
    stress test — one fact joined, then a correlated EXISTS (another
    supplier touched the same order) AND a correlated NOT EXISTS (no other
    supplier returned it) against the SAME fact table.  Catalyst must
    rewrite these to one left-semi and one left-anti hash join on
    l_orderkey — never a cartesian or a per-row re-scan.
    (Fixture has no l_commitdate/l_receiptdate: l_returnflag='R' stands in
    for the late-delivery predicate, o_orderstatus='F' as in the spec.)"""
    _register_views(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"))
    return spark.sql(_Q21)


def q_sql_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left outer join
    with a join-side predicate (customers with zero qualifying orders must
    survive with count 0), then a second aggregation over the first —
    outer join + double aggregation.
    (Fixture has no o_comment; the 'not like %special%requests%' exclusion
    becomes o_orderpriority <> '1-URGENT'.)"""
    _register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q13)


# ---- remaining TPC-H shapes (Q2/Q6/Q8/Q9/Q11/Q15/Q16/Q20 + Q12) ----
# The fixture has no partsupp table, no ps_supplycost/availqty, no
# l_shipmode/l_commitdate, no comment columns. Each query below keeps the
# ORIGINAL's plan shape (the property the planner is being tested on) and
# documents its fixture adaptation:
#   - "supply" = SELECT DISTINCT/GROUP BY (l_partkey, l_suppkey) from
#     lineitem — the who-supplies-what relation partsupp represents;
#     unit cost = min cents(l_extendedprice / l_quantity).
#   - l_returnflag stands in for l_shipmode (Q12), negative s_acctbal for
#     the complaints comment (Q16), p_name prefix for the color match (Q20).

_Q2 = f"""
WITH supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN({sql_cents("l_extendedprice / l_quantity")}) AS ps_cost_cents
  FROM fs_lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_name, n_name, p_partkey, p_brand, p_type,
       CAST(ps_cost_cents AS DOUBLE) / 100.0 AS unit_cost
FROM fs_part
JOIN supply      ON p_partkey = ps_partkey
JOIN fs_supplier ON s_suppkey = ps_suppkey
JOIN fs_nation   ON s_nationkey = n_nationkey
JOIN fs_region   ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND ps_cost_cents = (
    SELECT MIN(ps2.ps_cost_cents)
    FROM supply ps2
    JOIN fs_supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN fs_nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN fs_region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY n_name, s_name, p_partkey
LIMIT 100
"""

_Q6 = f"""
SELECT CAST(SUM({sql_cents("l_extendedprice * l_discount", 4)}) AS DOUBLE)
         / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM fs_lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""

_Q8 = f"""
SELECT o_year,
       round(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol_cents ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(vol_cents) AS DOUBLE), 8) AS mkt_share,
       COUNT(*) AS n_lines
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {sql_cents("l_extendedprice * (1.0 - l_discount)", 4)} AS vol_cents,
         n2.n_name AS nation
  FROM fs_part
  JOIN fs_lineitem  ON p_partkey = l_partkey
  JOIN fs_supplier  ON s_suppkey = l_suppkey
  JOIN fs_orders    ON l_orderkey = o_orderkey
  JOIN fs_customer  ON o_custkey = c_custkey
  JOIN fs_nation n1 ON c_nationkey = n1.n_nationkey
  JOIN fs_region    ON n1.n_regionkey = r_regionkey
  JOIN fs_nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

_Q9 = f"""
SELECT nation, o_year,
       CAST(SUM(amount_cents) AS DOUBLE) / 10000.0 AS sum_profit,
       COUNT(*) AS n_lines
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {sql_cents("l_extendedprice * (1.0 - l_discount)", 4)}
           - {sql_cents("0.5 * p_retailprice * l_quantity", 4)} AS amount_cents
  FROM fs_part
  JOIN fs_lineitem ON p_partkey = l_partkey
  JOIN fs_supplier ON s_suppkey = l_suppkey
  JOIN fs_orders   ON o_orderkey = l_orderkey
  JOIN fs_nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

_Q11 = f"""
SELECT ps_partkey,
       CAST(SUM(val_cents) AS DOUBLE) / 10000.0 AS part_value,
       COUNT(*) AS n_lines
FROM (
  SELECT l_partkey AS ps_partkey,
         {sql_cents("l_extendedprice * (1.0 - l_discount)", 4)} AS val_cents
  FROM fs_lineitem
  JOIN fs_supplier ON l_suppkey = s_suppkey
  JOIN fs_nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
) x
GROUP BY ps_partkey
HAVING SUM(val_cents) > (
  SELECT SUM({sql_cents("l_extendedprice * (1.0 - l_discount)", 4)}) * 0.001
  FROM fs_lineitem
  JOIN fs_supplier ON l_suppkey = s_suppkey
  JOIN fs_nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
)
ORDER BY part_value DESC, ps_partkey
"""

_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM fs_orders
JOIN fs_lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({sql_cents("l_extendedprice * (1.0 - l_discount)", 4)}) AS total_cents
  FROM fs_lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(total_cents AS DOUBLE) / 10000.0 AS total_revenue
FROM fs_supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_cents = (SELECT MAX(total_cents) FROM revenue)
ORDER BY s_suppkey
"""

_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM fs_lineitem) partsupp
JOIN fs_part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM fs_supplier WHERE s_acctbal < 0.0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

_Q20 = """
SELECT s_name, round(s_acctbal, 2) AS s_acctbal
FROM fs_supplier
JOIN fs_nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT ps.l_suppkey
    FROM (SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
          FROM fs_lineitem
          WHERE l_partkey IN (
              SELECT p_partkey FROM fs_part WHERE p_name LIKE 'red%'
            )
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey) ps
    JOIN (SELECT l_partkey, SUM(l_quantity) AS total_qty
          FROM fs_lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_partkey) tot
      ON ps.l_partkey = tot.l_partkey
    WHERE ps.qty > 0.2 * tot.total_qty
  )
ORDER BY s_name
"""


_LATERAL = """
SELECT n_name, c.c_custkey, c.c_acctbal
FROM fs_nation, LATERAL (
  SELECT c_custkey, c_acctbal FROM fs_customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) c
ORDER BY n_name, c_acctbal DESC, c_custkey
"""

_RECURSIVE = f"""
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL '1' MONTH FROM months
  WHERE m < TIMESTAMP '2001-07-01 00:00:00'
)
SELECT m AS month_start,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM({sql_cents("o_totalprice")}), 0) AS DOUBLE) / 100.0
         AS revenue
FROM months
LEFT JOIN fs_orders ON date_trunc('month', o_orderdate) = m
GROUP BY m
ORDER BY m
"""


def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-2 customers per nation) — the
    per-row dependent-join shape; Catalyst decorrelates it into a ranked
    window join rather than re-running the inner query per nation row."""
    _register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_LATERAL)


def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.0+): generate a monthly date spine and LEFT
    JOIN order revenue onto it — months with zero orders survive with
    zeros, the report shape a bare GROUP BY can't produce. The spine join
    is an equi join on date_trunc, not a range nested loop."""
    _register_views(spark, sf_dir, ("orders",))
    return spark.sql(_RECURSIVE)


def q_sql_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): correlated scalar MIN
    subquery over the supply relation, re-planned by Catalyst as a
    per-part aggregate + join (the same de-correlation Q17 tests, but
    through a 4-table dimension chain on both the outer and inner side)."""
    _register_views(spark, sf_dir, TABLES[:7])
    return spark.sql(_Q2)


def q_sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): pure scan-side
    predicate stack (date range + discount band + quantity cut) with no
    join at all — every filter must reach the parquet scan."""
    _register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q6)


def q_sql_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): 8-table star with the
    nation dim joined TWICE under different roles (customer's region
    filter, supplier's nation label), conditional share aggregation."""
    _register_views(spark, sf_dir, TABLES[:7])
    return spark.sql(_Q8)


def q_sql_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): LIKE-filtered part dim, 5-way
    join, profit = revenue minus cost (cost proxied by 0.5 × retailprice ×
    quantity — fixture has no ps_supplycost), grouped by nation × year."""
    _register_views(spark, sf_dir, TABLES[:7])
    return spark.sql(_Q9)


def q_sql_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): HAVING against an uncorrelated
    scalar subquery computing a fraction of the same aggregate over the
    same relation — planned once, broadcast as a literal."""
    _register_views(spark, sf_dir, TABLES[:7])
    return spark.sql(_Q11)


def q_sql_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority): fact-fact join + two
    conditional counts per group (l_returnflag stands in for l_shipmode)."""
    _register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q12)


def q_sql_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): CTE'd revenue view consumed twice —
    once joined, once under MAX — with an exact integer-cents revenue so
    the max-tie semantics are deterministic."""
    _register_views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(_Q15)


def q_sql_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supply pairs
    + NOT IN subquery (→ null-aware anti join) + COUNT(DISTINCT) per
    brand/type/size (negative balance stands in for the complaints match)."""
    _register_views(spark, sf_dir, ("supplier", "part", "lineitem"))
    return spark.sql(_Q16)


def q_sql_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): doubly-nested IN
    subqueries — suppliers shipping > 20% of a red part's yearly volume —
    each rewritten to semi joins over pre-aggregated relations."""
    _register_views(spark, sf_dir, TABLES[:7])
    return spark.sql(_Q20)


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


_COPURCHASE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM fs_lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       CAST(COUNT(*) AS BIGINT) AS support
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY support DESC, p1, p2
LIMIT 20
"""


def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs (market-basket pair counting):
    parts appearing on the same order, top-20 pairs by support. The
    scalable shape is a self-equi-join on the basket key — fan-out is
    bounded by per-order basket size (≤7 lineitems here), never
    corpus-sized; ``p1 < p2`` canonicalizes pairs so each counts once and
    halves the join output. DISTINCT first: a part listed twice on one
    order must not double-count support. Total order (support, p1, p2)
    makes the top-20 deterministic."""
    _register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_COPURCHASE)


_ASSOC = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM fs_lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM li),
singles AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY 1
),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
joined AS (
  SELECT p1, p2, n_ab, s1.cnt AS n_p1, s2.cnt AS n_p2
  FROM pairs
  JOIN singles s1 ON p1 = s1.l_partkey
  JOIN singles s2 ON p2 = s2.l_partkey
),
rules AS (
  SELECT p1 AS antecedent, p2 AS consequent, n_ab,
         n_p1 AS n_a, n_p2 AS n_b FROM joined
  UNION ALL
  SELECT p2, p1, n_ab, n_p2, n_p1 FROM joined
)
SELECT antecedent, consequent, n_ab, n_a, n_b,
       (CAST(n_ab AS DOUBLE) / n_a) AS confidence,
       ((CAST(n_ab AS DOUBLE) * n.n) / (CAST(n_a AS DOUBLE) * n_b)) AS lift
FROM rules CROSS JOIN n
WHERE n_ab >= 3
ORDER BY n_ab DESC, antecedent, consequent
LIMIT 100
"""


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets (the step after q_copurchase's
    pair counting): every frequent pair emits both directed rules with
    support count, confidence n_ab/n_a and lift n_ab·N/(n_a·n_b).

    Scale shape: the pair self-join is bounded by per-basket size (never
    corpus²); the part-grain `singles` relation joins back onto the pair
    grain — at 100 TB that side is still |parts| ≪ |pairs| and Catalyst
    broadcasts it; N is a scalar subquery planned once. Determinism: all
    counts are exact int64; confidence/lift are single divisions of exact
    products (n_ab·N and n_a·n_b < 2^53) — bit-identical, no rounding.
    Both metrics derive from the same counts the reference's users would
    compute by hand in Python — here it is one declarative plan.

    Round 14 (guide §2.4/§5): the SQL form inlined the `li` DISTINCT CTE
    into every consumer — the before-plan scans lineitem and repeats the
    distinct shuffle NINE times (pairs a/b-side, singles ×2 and N, all
    duplicated again by the UNION ALL of the two rule directions: 18
    scans, 46 Exchanges).  The DataFrame form persists `li` once, folds
    the `n_ab >= 3` rule filter into the pair aggregate (a HAVING — it
    commutes with the inner joins it preceded), eagerly checkpoints the
    PAIR AGGREGATE so the two-direction union reads it instead of
    replaying the whole subtree, and collects the basket count N to a
    float literal at build time (one eager count — the builder is
    executed immediately under the driver contract; a lazy 1-row
    crossJoin would plan as a BroadcastNestedLoopJoin the lint cannot
    prove scalar).  Same counts, same single divisions in the same
    association order — bit-identical output."""
    _register_views(spark, sf_dir, ("lineitem",))
    li = (
        spark.table("fs_lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # the consumers of `li` are each reduced to their OWN post-aggregate
    # grain (pairs ≤ basket-expansion, singles = |parts|, n = 1 scalar),
    # so the corpus-grain distinct is computed once and the lazy tail
    # below — broadcast joins + the two-direction union — reads only
    # bounded relations.  N is control-plane-sized (one bigint): collect
    # it and fold it in as a literal — same IEEE double as the former
    # 1-row crossJoin build side, minus the BroadcastNestedLoopJoin the
    # plan linter (rightly) cannot prove scalar.
    n_lit = F.lit(
        float(li.select(F.count_distinct("l_orderkey")).collect()[0][0])
    )
    singles = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
        .localCheckpoint()
    )
    li.unpersist()
    s1 = singles.select(F.col("l_partkey").alias("p1"), F.col("cnt").alias("n_p1"))
    s2 = singles.select(F.col("l_partkey").alias("p2"), F.col("cnt").alias("n_p2"))
    joined = (
        pairs.join(F.broadcast(s1), "p1")
        .join(F.broadcast(s2), "p2")
        .select("p1", "p2", "n_ab", "n_p1", "n_p2", n_lit.alias("n"))
    )
    rules = joined.select(
        F.col("p1").alias("antecedent"),
        F.col("p2").alias("consequent"),
        "n_ab",
        F.col("n_p1").alias("n_a"),
        F.col("n_p2").alias("n_b"),
        "n",
    ).unionAll(
        joined.select(
            F.col("p2").alias("antecedent"),
            F.col("p1").alias("consequent"),
            "n_ab",
            F.col("n_p2").alias("n_a"),
            F.col("n_p1").alias("n_b"),
            "n",
        )
    )
    return (
        rules.select(
            "antecedent",
            "consequent",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab").cast("double") / F.col("n_a")).alias("confidence"),
            (
                (F.col("n_ab").cast("double") * F.col("n"))
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("n_ab").desc(), "antecedent", "consequent")
        .limit(100)
    )


QUERIES = {
    "q_assoc_rules": q_assoc_rules,
    "q_sql_q3": q_sql_q3,
    "q_sql_q4": q_sql_q4,
    "q_sql_q7": q_sql_q7,
    "q_sql_q10": q_sql_q10,
    "q_sql_q14": q_sql_q14,
    "q_sql_q17": q_sql_q17,
    "q_sql_q18": q_sql_q18,
    "q_sql_q19": q_sql_q19,
    "q_sql_q21": q_sql_q21,
    "q_sql_q13": q_sql_q13,
    "q_join_lateral": q_join_lateral,
    "q_sql_recursive": q_sql_recursive,
    "q_sql_q2": q_sql_q2,
    "q_sql_q6": q_sql_q6,
    "q_sql_q8": q_sql_q8,
    "q_sql_q9": q_sql_q9,
    "q_sql_q11": q_sql_q11,
    "q_sql_q12": q_sql_q12,
    "q_sql_q15": q_sql_q15,
    "q_sql_q16": q_sql_q16,
    "q_sql_q20": q_sql_q20,
    "q_sql_q22": q_sql_q22,
    "q_sql_q5": q_sql_q5,
    "q_agg_grouping_sets": q_agg_grouping_sets,
    "q_subquery_scalar": q_subquery_scalar,
    "q_subquery_in": q_subquery_in,
    "q_join_bucketed": q_join_bucketed,
    "q_copurchase": q_copurchase,
}

ORACLE = {
    "q_assoc_rules": _ASSOC.replace("fs_", ""),
    "q_copurchase": _COPURCHASE.replace("fs_", ""),
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
    "q_sql_q21": _Q21.replace("fs_", ""),
    "q_sql_q13": _Q13.replace("fs_", ""),
    "q_join_lateral": _LATERAL.replace("fs_", ""),
    "q_sql_recursive": _RECURSIVE.replace("fs_", ""),
    "q_sql_q2": _Q2.replace("fs_", ""),
    "q_sql_q6": _Q6.replace("fs_", ""),
    "q_sql_q8": _Q8.replace("fs_", ""),
    "q_sql_q9": _Q9.replace("fs_", ""),
    "q_sql_q11": _Q11.replace("fs_", ""),
    "q_sql_q12": _Q12.replace("fs_", ""),
    "q_sql_q15": _Q15.replace("fs_", ""),
    "q_sql_q16": _Q16.replace("fs_", ""),
    "q_sql_q20": _Q20.replace("fs_", ""),
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
