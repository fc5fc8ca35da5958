"""UDF / UDAF / UDTF surface (SURVEY.md §2c).

The reference's entire premise is arbitrary user Python dispatched per task
(``getattr(model, method)(**kwargs)``, reference lib/fossa/control/process.py:99-100).
On Spark that capability lands as the Arrow-vectorized Python surface:
scalar pandas UDFs, grouped-map ``applyInPandas`` (the PartitionedModel
analogue: per-key Python over a shuffled group), grouped-agg pandas UDFs,
and ``mapInPandas`` flat-map. Row-at-a-time Python UDFs are deliberately
absent — at 100 TB the per-row pickle cost is the difference between hours
and days; every function here moves data via Arrow batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fossa_spark.queries._util import load, spread


def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-batched): whitespace token count.
    Mirrors the SQL expression length-diff formulation exactly."""

    @F.pandas_udf("long")
    def n_tokens(text: pd.Series) -> pd.Series:
        return (text.str.count(" ") + 1).astype("int64")

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "n_chars", n_tokens("text").alias("n_tokens")).orderBy("doc_id")


def q_udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas — the PartitionedModel fan-out analogue:
    one Python invocation per language group, results unioned by Spark."""

    def per_lang(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        total = int(pdf["n_chars"].sum())
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [n],
                "total_chars": [total],
                "avg_chars": [float(total) / float(n)],
            }
        )

    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .applyInPandas(per_lang, "lang string, n_docs long, total_chars long, avg_chars double")
        .orderBy("lang")
    )


def q_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF): exact integer sum per source."""

    @F.pandas_udf("long")
    def total_chars(s: pd.Series) -> int:
        return int(s.sum())

    @F.pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        # grouped-agg pandas UDFs can't mix with built-in aggregates in one
        # agg() — so the count is a pandas UDF too
        return int(len(s))

    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(total_chars("n_chars").alias("total_chars"), n_rows("doc_id").alias("n_docs"))
        .orderBy("source")
    )


def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-map via mapInPandas (UDTF shape): split each document into
    64-char chunks → one output row per chunk. SQL oracle reproduces it
    with generate_series, so even the Python flat-map is hash-checked."""

    def chunker(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                for i in range(0, n, 64):
                    out.append((int(doc_id), i // 64, min(64, n - i)))
            yield pd.DataFrame(out, columns=["doc_id", "chunk_idx", "chunk_len"])

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(chunker, "doc_id long, chunk_idx long, chunk_len long").orderBy(
        "doc_id", "chunk_idx"
    )


def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the two-sided Python fan-out: customer
    and orders co-shuffled and paired per group, with per-customer
    reconciliation done VECTORIZED inside each group (pandas merge +
    groupby). The cogroup key is the coarse nation key on purpose: one
    Python invocation per nation (25), not per customer (15k at sf0.1) —
    per-key Python dispatch costs ~1 ms each, so fine-grained cogroup keys
    are the classic anti-pattern; pick a key at "per-invocation work ≫
    dispatch cost" granularity and vectorize within. Reproduces a
    join+agg exactly, so the SQL oracle checks the plumbing end-to-end."""

    def reconcile(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(cust) == 0:
            return pd.DataFrame(
                columns=["c_custkey", "c_acctbal", "n_orders", "total_cents"]
            )
        # integer-cents discipline, numpy side: floor(x*100 + 0.5) is
        # half-up — identical to JVM/DuckDB ROUND for positive prices
        if len(orders):
            cents = np.floor(
                orders["o_totalprice"].to_numpy() * 100.0 + 0.5
            ).astype("int64")
            agg = (
                pd.DataFrame({"c_custkey": orders["c_custkey"], "cents": cents})
                .groupby("c_custkey", as_index=False)
                .agg(n_orders=("cents", "size"), total_cents=("cents", "sum"))
            )
        else:
            agg = pd.DataFrame(columns=["c_custkey", "n_orders", "total_cents"])
        out = cust[["c_custkey", "c_acctbal"]].merge(agg, on="c_custkey", how="left")
        out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
        out["total_cents"] = out["total_cents"].fillna(0).astype("int64")
        return out

    c = load(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_acctbal"
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000.0)
        .join(
            load(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            ),
            "o_custkey",
        )
        .select("c_nationkey", F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    )
    out = (
        c.groupBy("c_nationkey")
        .cogroup(o.groupBy("c_nationkey"))
        .applyInPandas(
            reconcile,
            "c_custkey long, c_acctbal double, n_orders long, total_cents long",
        )
    )
    return out.withColumn(
        "total_price", (F.col("total_cents").cast("double") / 100.0)
    ).drop("total_cents").orderBy("c_custkey")


def q_udtf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE Python UDTF (Spark 4 @udtf class, not the mapInPandas
    emulation in q_udtf): a table function lateral-joined per document,
    emitting (position, term) rows. The analyzer plans it like any
    generator — correlated lateral over the scan, no shuffle; rows stream
    out of the Python worker via Arrow."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, term string")
    class SplitTerms:
        def eval(self, text: str):  # noqa: D102
            if text is None:
                return
            for i, t in enumerate(text.lower().split(" ")):
                yield i, t

    spark.udtf.register("fossa_split_terms", SplitTerms)
    d = spread(load(spark, sf_dir, "documents"), spark)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.term
        FROM _udtf_docs d, LATERAL fossa_split_terms(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy sibling of mapInPandas: embedding L2
    norms computed on raw Arrow batches (no pandas materialization).
    float32 → float64 casts and squares are exact IEEE; the sum runs as a
    cumulative scan so its order is LEFT-TO-RIGHT — matching the oracle's
    sequential list_reduce exactly — and rounding stays JVM-side
    (np.round is banker's; F.round is the half-up the oracle uses)."""
    import numpy as np
    import pyarrow as pa

    def norms(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id")
            emb = np.asarray(
                batch.column("embedding").to_pylist(), dtype=np.float64
            )
            sq = emb * emb
            norm = np.sqrt(sq.cumsum(axis=1)[:, -1])
            yield pa.RecordBatch.from_arrays(
                [vec_ids, pa.array(norm, type=pa.float64())],
                names=["vec_id", "l2_norm"],
            )

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return (
        e.mapInArrow(norms, "vec_id long, l2_norm double")
        .select("vec_id", F.round("l2_norm", 6).alias("l2_norm"))
        .orderBy("vec_id")
    )


QUERIES = {
    "q_udf_cogroup": q_udf_cogroup,
    "q_udf_scalar": q_udf_scalar,
    "q_udf_grouped": q_udf_grouped,
    "q_udaf": q_udaf,
    "q_udtf": q_udtf,
    "q_udtf_native": q_udtf_native,
    "q_udf_arrow": q_udf_arrow,
}

ORACLE = {
    "q_udf_cogroup": """
        SELECT c.c_custkey, c.c_acctbal,
               CAST(COUNT(o.o_totalprice) AS BIGINT) AS n_orders,
               CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT)),
                             0) AS DOUBLE) / 100.0 AS total_price
        FROM customer c
        LEFT JOIN (SELECT o_custkey, o_totalprice FROM orders
                   WHERE o_totalprice > 200000.0) o
          ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_acctbal
        ORDER BY c.c_custkey
    """,
    "q_udf_scalar": """
        SELECT doc_id, n_chars,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        FROM documents ORDER BY doc_id
    """,
    "q_udf_grouped": """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "q_udaf": """
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars, COUNT(*) AS n_docs
        FROM documents GROUP BY source ORDER BY source
    """,
    "q_udtf": """
        SELECT doc_id, gs AS chunk_idx,
               least(64, length(text) - gs * 64) AS chunk_len
        FROM documents
        JOIN generate_series(0, 100000) AS t(gs)
          ON gs <= CAST(ceil(length(text) / 64.0) AS BIGINT) - 1
        ORDER BY doc_id, chunk_idx
    """,
    "q_udtf_native": """
        SELECT doc_id,
               generate_subscripts(string_split(lower(text), ' '), 1) - 1
                 AS pos,
               unnest(string_split(lower(text), ' ')) AS term
        FROM documents ORDER BY doc_id, pos
    """,
    "q_udf_arrow": """
        SELECT vec_id,
               round(sqrt(list_reduce(
                   list_prepend(0.0, list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                   (acc, x) -> acc + x)), 6) AS l2_norm
        FROM embeddings ORDER BY vec_id
    """,
}
