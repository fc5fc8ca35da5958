"""Data-quality queries: per-column table profiling and declarative
constraint checks (fossa_spark/profiling.py) — the ingest-gate passes of
a production training-data pipeline, both DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fossa_spark import profiling as P
from fossa_spark.queries._util import cents, load, sql_cents


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


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the report you run BEFORE a 100 TB
    shuffle to decide between plain, salted, or skew-hint joins: group-size
    distribution (p50/p90/p99/max) of a prospective join key plus the top-5
    heaviest keys. One groupBy to the key grain, then a tiny aggregate;
    heavy-key list is deterministically ordered (size desc, key asc) and
    emitted as a joined string so the hash is structural-type-agnostic."""
    li = load(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("sz"))
    # collect_list has no ordering guarantee — sort_array over
    # (-size, key) structs makes the joined string deterministic
    heavy = (
        sizes.orderBy(F.col("sz").desc(), F.col("l_orderkey").asc())
        .limit(5)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("sz")).alias("neg"),
                        F.col("l_orderkey").alias("k"),
                    )
                )
            ).alias("arr")
        )
        .select(
            F.concat_ws(
                "|",
                F.transform(
                    "arr",
                    lambda s: F.concat_ws(
                        ":", s["k"].cast("string"), (-s["neg"]).cast("string")
                    ),
                ),
            ).alias("heavy_keys")
        )
    )
    stats = sizes.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("sz").alias("n_rows"),
        F.round(F.percentile(F.col("sz").cast("double"), F.lit(0.5)), 6)
        .alias("p50"),
        F.round(F.percentile(F.col("sz").cast("double"), F.lit(0.9)), 6)
        .alias("p90"),
        F.round(F.percentile(F.col("sz").cast("double"), F.lit(0.99)), 6)
        .alias("p99"),
        F.max("sz").alias("max_sz"),
    )
    return stats.crossJoin(heavy)


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 10-bin histogram of o_totalprice with data-driven
    bounds — the distribution panel of the profiling dashboard. Bounds
    ride along as a 1-row broadcast; the bucket expression is explicit
    arithmetic (identical in any engine) rather than a built-in
    width_bucket, so boundary assignment is bit-reproducible. One narrow
    pass + one tiny aggregate."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )
    b = o.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(9),
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo")) * 10.0
            ).cast("long"),
        ).alias("bucket"),
        "o_totalprice",
        "lo",
        "hi",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.first("lo") + F.col("bucket") * (F.first("hi") - F.first("lo"))
                / 10.0,
                6,
            ).alias("bin_lo"),
        )
        .select("bucket", "n", "bin_lo")
        .orderBy("bucket")
    )


def q_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observation-API metrics: piggyback row-count / exact-cents sum /
    min / max / null-count metrics on a REAL job (noop write of the
    filtered projection) via df.observe — the zero-extra-scan pipeline
    telemetry hook (Deequ's analyzer runner shape). The observed values
    must equal a from-scratch SQL aggregation: the oracle recomputes them,
    so a metrics bug (double-count under retries, lost partition) flips
    the hash. The returned 1-row frame is driver-built from the observed
    map — control-plane-sized by construction."""
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 25.0)
    obs = Observation("fs_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents("l_extendedprice")).alias("_sum_cents"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.sum((F.col("l_discount") > 0.05).cast("long")).alias("n_discounted"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                float(m["_sum_cents"]) / 100.0,
                float(m["min_qty"]),
                float(m["max_qty"]),
                int(m["n_discounted"]),
            )
        ],
        "n_rows long, sum_price double, min_qty double, max_qty double, "
        "n_discounted long",
    )


def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift report between two corpus snapshots (round 10,
    profiling.py profile_drift): snapshot A = even doc_ids; snapshot B =
    odd doc_ids with ~1/5 of SOURCES dropped entirely (salted-md5 coin
    on the source name), planting a real source-distribution shift while
    lang/length stay near-stationary. Features: source, lang, and
    256-char length bins. The oracle re-derives both snapshots, the
    union-bin smoothing, and every fixed-point PSI term in SQL — one
    mis-binned doc or a smoothing slip moves psi_e8."""
    d = load(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 2 == 0)
    src_coin = F.conv(
        F.substring(F.md5(F.concat(F.lit("drft:"), F.col("source"))), 1, 8),
        16, 10,
    ).cast("bigint")
    b = d.filter((F.col("doc_id") % 2 == 1) & (src_coin % 5 != 0))
    feats = {
        "source": F.col("source"),
        "lang": F.col("lang"),
        "len_bin": (
            F.floor(F.col("n_chars").cast("double") / F.lit(256.0))
            .cast("bigint") * 256
        ).cast("string"),
    }
    return P.profile_drift(a, b, feats).orderBy("feature")


QUERIES = {
    "q_profile": q_profile,
    "q_profile_drift": q_profile_drift,
    "q_observe": q_observe,
    "q_quality_checks": q_quality_checks,
    "q_skew_report": q_skew_report,
    "q_histogram": q_histogram,
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

_DRIFT_SQL = """
    WITH a AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    b AS (
      SELECT * FROM documents
      WHERE doc_id % 2 = 1
        AND CAST(('0x' || substr(md5('drft:' || source), 1, 8)) AS BIGINT)
            % 5 <> 0
    ),
    ma AS (
      SELECT 'source' AS feature, source AS bin FROM a
      UNION ALL SELECT 'lang', lang FROM a
      UNION ALL
      SELECT 'len_bin',
             CAST(CAST(floor(CAST(n_chars AS DOUBLE) / 256.0) AS BIGINT) * 256
                  AS VARCHAR)
      FROM a
    ),
    mb AS (
      SELECT 'source' AS feature, source AS bin FROM b
      UNION ALL SELECT 'lang', lang FROM b
      UNION ALL
      SELECT 'len_bin',
             CAST(CAST(floor(CAST(n_chars AS DOUBLE) / 256.0) AS BIGINT) * 256
                  AS VARCHAR)
      FROM b
    ),
    ca AS (SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS cnt_a
           FROM ma GROUP BY 1, 2),
    cb AS (SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS cnt_b
           FROM mb GROUP BY 1, 2),
    j AS (
      SELECT coalesce(ca.feature, cb.feature) AS feature,
             coalesce(ca.bin, cb.bin) AS bin,
             coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b
      FROM ca FULL JOIN cb
        ON ca.feature = cb.feature AND ca.bin = cb.bin
    ),
    k AS (
      SELECT feature, bin, cnt_a, cnt_b,
             CAST(SUM(cnt_a) OVER (PARTITION BY feature) AS BIGINT) AS n_a,
             CAST(SUM(cnt_b) OVER (PARTITION BY feature) AS BIGINT) AS n_b,
             CAST(COUNT(*) OVER (PARTITION BY feature) AS BIGINT) AS n_bins
      FROM j
    ),
    t AS (
      SELECT feature, n_bins, n_a, n_b,
             CAST(round(
               (CAST(cnt_a + 1 AS DOUBLE) / CAST(n_a + n_bins AS DOUBLE)
                - CAST(cnt_b + 1 AS DOUBLE) / CAST(n_b + n_bins AS DOUBLE))
               * ln((CAST(cnt_a + 1 AS DOUBLE) / CAST(n_a + n_bins AS DOUBLE))
                    / (CAST(cnt_b + 1 AS DOUBLE)
                       / CAST(n_b + n_bins AS DOUBLE)))
               * 100000000.0) AS BIGINT) AS term_e8
      FROM k
    )
    SELECT feature, MAX(n_bins) AS n_bins, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
           CAST(SUM(term_e8) AS BIGINT) AS psi_e8,
           (CAST(SUM(term_e8) AS BIGINT) > 20000000) AS drifted
    FROM t GROUP BY feature ORDER BY feature
"""

ORACLE = {
    "q_profile_drift": _DRIFT_SQL,
    "q_observe": f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM({sql_cents("l_extendedprice")}) AS DOUBLE) / 100.0
                 AS sum_price,
               CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
               CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
               CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_discounted
        FROM lineitem WHERE l_quantity >= 25.0
    """,
    "q_histogram": """
        WITH b AS (
          SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
                 CAST(MAX(o_totalprice) AS DOUBLE) AS hi
          FROM orders
        ),
        x AS (
          SELECT least(9, CAST(floor((o_totalprice - lo) / (hi - lo) * 10.0)
                               AS BIGINT)) AS bucket,
                 lo, hi
          FROM orders, b
        )
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
               round(any_value(lo)
                     + bucket * (any_value(hi) - any_value(lo)) / 10.0, 6)
                 AS bin_lo
        FROM x GROUP BY bucket ORDER BY bucket
    """,
    "q_skew_report": """
        WITH sizes AS (
          SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS sz
          FROM lineitem GROUP BY l_orderkey
        ),
        heavy AS (
          SELECT string_agg(CAST(l_orderkey AS VARCHAR) || ':' ||
                            CAST(sz AS VARCHAR), '|'
                            ORDER BY sz DESC, l_orderkey ASC) AS heavy_keys
          FROM (SELECT l_orderkey, sz FROM sizes
                ORDER BY sz DESC, l_orderkey ASC LIMIT 5)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(sz) AS BIGINT) AS n_rows,
               round(quantile_cont(CAST(sz AS DOUBLE), 0.5), 6) AS p50,
               round(quantile_cont(CAST(sz AS DOUBLE), 0.9), 6) AS p90,
               round(quantile_cont(CAST(sz AS DOUBLE), 0.99), 6) AS p99,
               MAX(sz) AS max_sz,
               (SELECT heavy_keys FROM heavy) AS heavy_keys
        FROM sizes
    """,
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
