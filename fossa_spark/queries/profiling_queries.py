"""Data-quality queries: per-column table profiling and declarative
constraint checks (fossa_spark/profiling.py) — the ingest-gate passes of
a production training-data pipeline, both DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fossa_spark import profiling as P
from fossa_spark.queries._util import load


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of orders: row/null/distinct counts, numeric
    min/max, modal value for strings. Each column's aggregate reads a
    single pruned parquet column (see profiling.py for the scale notes)."""
    o = load(spark, sf_dir, "orders")
    return P.profile_table(
        o,
        numeric_cols=["o_orderkey", "o_custkey", "o_totalprice"],
        string_cols=["o_orderstatus", "o_orderpriority"],
    ).orderBy("column")


def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint checks over orders (Deequ shape): completeness,
    uniqueness, range, accepted values — one aggregation pass — plus a
    referential-integrity check against the customer dimension (semi-join
    match fraction; the dimension side is broadcast-able). Returns
    (check, metric, passed)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = F.count(F.lit(1)).cast("double")
    checks = [
        (
            "completeness_custkey",
            F.sum(F.col("o_custkey").isNotNull().cast("long")).cast("double") / n,
            F.col("metric") >= 1.0,
        ),
        (
            "uniqueness_orderkey",
            F.count_distinct("o_orderkey").cast("double") / n,
            F.col("metric") >= 1.0,
        ),
        (
            "min_totalprice",
            F.min("o_totalprice"),
            F.col("metric") > 0.0,
        ),
        (
            "accepted_status",
            F.sum(F.col("o_orderstatus").isin("O", "F", "P").cast("long"))
            .cast("double") / n,
            F.col("metric") >= 1.0,
        ),
    ]
    base = P.run_checks(o, checks)
    matched = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .agg(F.count(F.lit(1)).cast("double").alias("_m"))
    )
    total = o.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    ref = (
        matched.crossJoin(total)
        .select(
            F.lit("referential_custkey").alias("check"),
            F.round(F.col("_m") / F.col("_n"), 8).alias("metric"),
        )
        .withColumn("passed", F.col("metric") >= 1.0)
    )
    return base.unionByName(ref).orderBy("check")


QUERIES = {
    "q_profile": q_profile,
    "q_quality_checks": q_quality_checks,
}

_NUM_PROFILE = """
        SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS DOUBLE) AS min_d,
               CAST(MAX({c}) AS DOUBLE) AS max_d,
               CAST(NULL AS VARCHAR) AS top_value,
               CAST(NULL AS BIGINT) AS top_count
        FROM orders"""

_STR_PROFILE = """
        SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(NULL AS DOUBLE) AS min_d,
               CAST(NULL AS DOUBLE) AS max_d,
               (SELECT v FROM (SELECT {c} AS v, COUNT(*) AS n FROM orders
                               GROUP BY 1 ORDER BY n DESC, v ASC LIMIT 1))
                 AS top_value,
               (SELECT CAST(n AS BIGINT) FROM
                  (SELECT {c} AS v, COUNT(*) AS n FROM orders
                   GROUP BY 1 ORDER BY n DESC, v ASC LIMIT 1))
                 AS top_count
        FROM orders"""

ORACLE = {
    "q_profile": " UNION ALL ".join(
        [_NUM_PROFILE.format(c=c)
         for c in ("o_orderkey", "o_custkey", "o_totalprice")]
        + [_STR_PROFILE.format(c=c)
           for c in ("o_orderstatus", "o_orderpriority")]
    ) + ' ORDER BY "column"',
    "q_quality_checks": """
        WITH t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM orders)
        SELECT * FROM (
          SELECT 'accepted_status' AS "check",
                 round(CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / (SELECT n FROM t), 8) AS metric,
                 round(CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / (SELECT n FROM t), 8) >= 1.0 AS passed
          FROM orders
          UNION ALL
          SELECT 'completeness_custkey',
                 round(CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0
                                     END) AS DOUBLE) / (SELECT n FROM t), 8),
                 round(CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0
                                     END) AS DOUBLE) / (SELECT n FROM t), 8)
                   >= 1.0
          FROM orders
          UNION ALL
          SELECT 'min_totalprice',
                 round(CAST(MIN(o_totalprice) AS DOUBLE), 8),
                 round(CAST(MIN(o_totalprice) AS DOUBLE), 8) > 0.0
          FROM orders
          UNION ALL
          SELECT 'referential_custkey',
                 round(CAST((SELECT COUNT(*) FROM orders
                             WHERE o_custkey IN (SELECT c_custkey FROM customer))
                            AS DOUBLE) / (SELECT n FROM t), 8),
                 round(CAST((SELECT COUNT(*) FROM orders
                             WHERE o_custkey IN (SELECT c_custkey FROM customer))
                            AS DOUBLE) / (SELECT n FROM t), 8) >= 1.0
          UNION ALL
          SELECT 'uniqueness_orderkey',
                 round(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE)
                       / (SELECT n FROM t), 8),
                 round(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE)
                       / (SELECT n FROM t), 8) >= 1.0
          FROM orders
        ) ORDER BY "check"
    """,
}
