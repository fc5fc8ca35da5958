"""Source/sink round-trips (SURVEY.md §2c "Scans / sources / sinks").

The reference's connector surface is engine-URL strings over CSV files with
declared flat schemas (reference examples/example_etl.py:139-143) and
templated multi-dataset outputs (examples/example_etl.py:56-61). Spark-native
equivalents: schemaful CSV read/write and partitionBy() writes. Both queries
round-trip through a scratch directory and re-aggregate, and the oracle runs
the same aggregate on the source table — so lossless IO is what's checked.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fossa_spark.queries._util import cents, load, sql_cents

_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + scan with explicit schema (never inferSchema in prod —
    it double-reads the data). Shortest-repr doubles survive the text
    round-trip exactly, which the oracle hash proves."""
    out = tempfile.mkdtemp(prefix="fossa_csv_")
    src = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(_CSV_SCHEMA).option("header", True).csv(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents("o_totalprice")).cast("double") / 100.0).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def q_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Templated multi-output ≙ partitionBy() write (hive-style layout,
    one directory per key — the scalable version of the reference's
    per-subtask templated CSV paths). Read back through partition
    discovery, aggregate per partition."""
    out = tempfile.mkdtemp(prefix="fossa_part_")
    src = load(spark, sf_dir, "orders")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderstatus")
    )


QUERIES = {
    "q_csv_roundtrip": q_csv_roundtrip,
    "q_partitioned_write": q_partitioned_write,
}

ORACLE = {
    "q_csv_roundtrip": f"""
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM({sql_cents("o_totalprice")}) AS DOUBLE) / 100.0 AS total_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "q_partitioned_write": """
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
}
