"""Data profiling and declarative quality checks (Deequ/GreatExpectations
shape, Spark-first implementation).

A 100 TB training-data pipeline gates every ingest batch on exactly these
two passes: a per-column PROFILE (row/null/distinct counts, numeric
ranges, modal values) feeding drift dashboards, and a set of CONSTRAINT
CHECKS (completeness, uniqueness, ranges, accepted values, referential
integrity) that fail the batch before bad data reaches training. The
reference engine leaves all of this to user Python inside models
(/root/reference/lib/fossa has no data-quality surface); here both passes
are declarative DataFrame plans.

Scale shape: each per-column profile aggregates a SINGLE parquet column —
Catalyst prunes the scan to that column, so profiling N columns costs N
pruned scans that run as independent stages (at petabyte scale you'd
optionally fuse them into one pass and trade scan count for one wide
EXPAND from the multiple count_distincts; both shapes are linear, no
joins). Checks are tiny aggregates; the referential check is a
broadcast-able anti join on the dimension side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct, min_d,
    max_d, top_value, top_count). Numeric columns report min/max as
    doubles; string columns report the modal value (ties broken by value
    asc — deterministic)."""
    parts: list[DataFrame] = []
    for c in numeric_cols:
        parts.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(F.col(c)).cast("double").alias("min_d"),
                F.max(F.col(c)).cast("double").alias("max_d"),
                F.lit(None).cast("string").alias("top_value"),
                F.lit(None).cast("long").alias("top_count"),
            )
        )
    for c in string_cols:
        counts = df.groupBy(F.col(c).alias("v")).agg(
            F.count(F.lit(1)).alias("n")
        )
        from pyspark.sql import Window

        w = Window.orderBy(F.col("n").desc(), F.col("v").asc())
        top = (
            counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(F.col("v").alias("top_value"), F.col("n").alias("top_count"))
        )
        stats = df.agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            F.lit(None).cast("double").alias("min_d"),
            F.lit(None).cast("double").alias("max_d"),
        )
        parts.append(stats.crossJoin(top))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def check_completeness(df: DataFrame, col: str) -> Column:
    """Fraction of non-null values (1.0 = complete)."""
    n = F.count(F.lit(1)).cast("double")
    return (
        F.sum(F.col(col).isNotNull().cast("long")).cast("double") / n
    )


def run_checks(df: DataFrame, checks: list[tuple[str, Column, Column]]) -> DataFrame:
    """Evaluate (name, metric_aggregate, pass_predicate_on_metric) checks
    in ONE aggregation pass; returns (check, metric DOUBLE, passed).
    ``pass_predicate_on_metric`` is a Column over the alias ``metric``."""
    aggs = []
    for name, metric, _ in checks:
        aggs.append(F.round(metric.cast("double"), 8).alias(f"_m_{name}"))
    row = df.agg(*aggs)
    parts = []
    for name, _, passed in checks:
        parts.append(
            row.select(
                F.lit(name).alias("check"),
                F.col(f"_m_{name}").alias("metric"),
            ).withColumn("passed", passed)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_drift(
    a: DataFrame,
    b: DataFrame,
    feats: dict[str, Column],
    threshold_e8: int = 20_000_000,
) -> DataFrame:
    """Population-Stability-Index drift report between two corpus
    snapshots — the gate a recurring ingest runs before letting a new
    crawl batch into training (PSI > 0.2 is the classic 'investigate'
    bar; 0.1–0.2 'watch').

    Each feature is a Column producing a categorical BIN label (cast to
    string); PSI(feature) = Σ_bins (p_a − p_b)·ln(p_a/p_b) with add-one
    smoothing over the UNION bin vocabulary, so a bin present in only
    one snapshot contributes a finite term instead of ±∞.

    Determinism contract (driver hash): bin counts are exact ints; each
    p is one double division of exact ints; each per-bin term is rounded
    at 1e8 fixed-point (the lm_score/ln convention — both libms agree to
    well under the rounding grain) and SUMMED AS BIGINT, so the report
    is order-independent and engine-identical. psi_e8 = PSI·1e8.

    Scale shape: one narrow explode per side melts all features in a
    single pass (bins are low-cardinality by construction), one
    map-side-combined count per side, then everything downstream —
    joins, windows, the report — runs on the (feature, bin) relation,
    which is control-plane sized. No corpus window, no collect."""
    from pyspark.sql import Window

    def melt(df: DataFrame) -> DataFrame:
        arr = F.array(*[
            F.struct(F.lit(name).alias("feature"),
                     col.cast("string").alias("bin"))
            for name, col in feats.items()
        ])
        return df.select(F.explode(arr).alias("fb")).select(
            "fb.feature", "fb.bin"
        )

    ca = melt(a).groupBy("feature", "bin").agg(
        F.count(F.lit(1)).alias("cnt_a"))
    cb = melt(b).groupBy("feature", "bin").agg(
        F.count(F.lit(1)).alias("cnt_b"))
    j = (
        ca.join(cb, ["feature", "bin"], "full")
        .select(
            "feature", "bin",
            F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        )
    )
    w = Window.partitionBy("feature")
    j = (
        j.withColumn("n_a", F.sum("cnt_a").over(w))
        .withColumn("n_b", F.sum("cnt_b").over(w))
        .withColumn("n_bins", F.count(F.lit(1)).over(w))
    )
    pa = (F.col("cnt_a") + 1).cast("double") / (
        F.col("n_a") + F.col("n_bins")).cast("double")
    pb = (F.col("cnt_b") + 1).cast("double") / (
        F.col("n_b") + F.col("n_bins")).cast("double")
    term_e8 = F.round((pa - pb) * F.log(pa / pb) * 1e8).cast("bigint")
    return (
        j.withColumn("term_e8", term_e8)
        .groupBy("feature")
        .agg(
            F.max("n_bins").alias("n_bins"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.sum("term_e8").alias("psi_e8"),
        )
        .withColumn("drifted", F.col("psi_e8") > F.lit(int(threshold_e8)))
    )
