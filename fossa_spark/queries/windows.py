"""Window functions (SURVEY.md §2c "Window functions").

Determinism: every window ORDER BY that feeds row_number/ntile/frames
includes a unique tiebreak key (orderkey/linenumber/event_id) — otherwise
rank assignment depends on shuffle order. rank/dense_rank are exercised on
a tie-prone key on purpose (ties collapse deterministically).

Scale: a window partitioned by a key is one shuffle on that key + a sort
within partitions; state is O(frame), not O(partition), for the frames used
here. Skewed partition keys (few giant users) are the thing to watch at
100 TB — AQE does not split window partitions, so key choice matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fossa_spark.queries._util import cents, load, load_events, sql_cents


def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile."""
    li = load(spark, sf_dir, "lineitem")
    w_total = W.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    w_ties = W.partitionBy("l_returnflag").orderBy(F.col("l_quantity").asc())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.row_number().over(w_total).cast("long").alias("rn"),
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
        F.ntile(4).over(w_total).cast("long").alias("quartile"),
    )


def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / last_value over a per-user event stream."""
    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.first("event_type").over(w_frame).alias("first_type"),
        F.last("event_type").over(w_frame).alias("running_last_type"),
        F.nth_value("event_type", 2).over(w_frame).alias("second_type"),
    )


def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frames: running sum + 3-row moving average (exact via integer cents)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = w.rowsBetween(-2, W.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        (F.sum(cents("o_totalprice")).over(run).cast("double") / 100.0).alias("running_total"),
        (
            (F.sum(cents("o_totalprice")).over(mov).cast("double") / 100.0)
            / F.count(F.lit(1)).over(mov).cast("double")
        ).alias("moving_avg3"),
    )


def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: 3 biggest orders per customer. At scale this is the
    rank+filter pattern — one shuffle, no global sort; AQE-safe."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    )


def q_win_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, vs the row-based frames in q_win_frame):
    per customer, orders and exact-cents spend within the PRECEDING 30
    DAYS of each order. Epoch-seconds ordering keeps the frame bound
    numeric and dialect-neutral."""
    o = load(spark, sf_dir, "orders").withColumn(
        "epoch_s", F.unix_timestamp("o_orderdate")
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("epoch_s").asc())
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "epoch_s",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        (F.sum(cents("o_totalprice")).over(w).cast("double") / 100.0).alias("spend_30d"),
    )


def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile
    deciles over order value within each priority class. The ORDER BY
    carries a unique tiebreak so rank positions (hence both ratios) are
    deterministic; ratios rounded 8 dp (one double division, same formula
    in both engines)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


_EWMA_DEPTH = 8  # weights 1, 1/2, … 1/128 — all dyadic, so sums are exact

# q_win_corr engages the bucket-carry decomposition only above this row
# count (below it the plain 3-task window is faster than the extra pass +
# union).  Module-level so tests can force the bucketed branch on small
# fixtures and assert value-identity against the plain window — the
# decomposition's correctness must not rest on prose + one sf1 benchmark.
_CORR_BUCKET_MIN_ROWS = 2_000_000


def q_win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average (α = 1/2, depth 8)
    of order value per customer — the smoothing operator time-series
    pipelines put next to resample/ffill.  pandas-`adjust=True`
    formulation: ewma_i = Σ_k w_k·x_{i-k} / Σ_k w_k over the lags that
    exist.  Determinism: x is integer cents and every weight is a dyadic
    rational (2^-k), so numerator and denominator are EXACT doubles built
    by a fixed-order chain of lag() terms; the single division at the end
    is bit-identical in both engines — no rounding needed.  Scale: one
    shuffle on o_custkey, one sort, 8 lag reads per row from the
    already-sorted run — O(depth) per row, no O(n²) frame (see the
    UnboundedFollowing lesson in NOTES.md)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    d = o.select(
        "o_custkey",
        "o_orderkey",
        cents("o_totalprice").alias("c"),
        *[
            F.lag(cents("o_totalprice"), k).over(w).alias(f"x{k}")
            for k in range(1, _EWMA_DEPTH)
        ],
    )
    num = F.col("c").cast("double")
    den = F.lit(1.0)
    for k in range(1, _EWMA_DEPTH):
        wgt = F.lit(0.5 ** k)
        num = num + F.coalesce(F.col(f"x{k}").cast("double") * wgt, F.lit(0.0))
        den = den + F.when(F.col(f"x{k}").isNull(), F.lit(0.0)).otherwise(wgt)
    return d.select(
        "o_custkey",
        "o_orderkey",
        ((num / den) / 100.0).alias("ewma"),
    )


def _ewma_sql() -> str:
    lags = ", ".join(
        f"lag({sql_cents('o_totalprice')}, {k}) OVER w AS x{k}"
        for k in range(1, _EWMA_DEPTH)
    )
    num = "CAST(c AS DOUBLE)"
    den = "1.0"
    for k in range(1, _EWMA_DEPTH):
        wgt = repr(0.5 ** k)
        num = f"({num} + COALESCE(CAST(x{k} AS DOUBLE) * {wgt}, 0.0))"
        den = f"({den} + CASE WHEN x{k} IS NULL THEN 0.0 ELSE {wgt} END)"
    return f"""
        WITH lagged AS (
          SELECT o_custkey, o_orderkey,
                 {sql_cents("o_totalprice")} AS c, {lags}
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC)
        )
        SELECT o_custkey, o_orderkey, (({num} / {den}) / 100.0) AS ewma
        FROM lagged
    """


def q_win_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median (7-row frame) of order value per customer —
    the robust companion of q_win_frame's moving average (outlier-immune
    smoothing). percentile(0.5) as a window aggregate over integer cents:
    the frame holds ≤7 exact int64s, the p·(n-1) interpolation midpoint of
    two ints is a dyadic-exact double (same definition as DuckDB's
    quantile_cont), and the final /100.0 is one exact division — no
    rounding anywhere. State is O(frame), not O(partition)."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-6, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.percentile(cents("o_totalprice"), F.lit(0.5)).over(w) / 100.0)
        .alias("rolling_median"),
    )


def q_win_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation (30-row frame) between quantity and
    price per return flag — the moving-beta shape of quant pipelines,
    made hash-exact the q_agg_corr way: the five joint moments
    (Σx, Σy, Σxy, Σx², Σy²) accumulate as WINDOW sums of exact int64
    cents products (integer addition is associative — any frame
    evaluation order gives the same sums), and the corr formula runs
    once on the assembled moments (int64→double conversions are
    round-to-nearest — identical in both engines even past 2^53), 8 dp.
    Windowed corr() itself could never be hash-checked — float summation
    order inside the frame is engine-defined."""
    li = load(spark, sf_dir, "lineitem")
    x = cents("l_quantity")
    y = cents("l_extendedprice")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
    # the ORDER BY must include the measure columns to be a total order
    # over value-distinct rows (fully identical rows are interchangeable
    # in a sum frame, so the hash stays deterministic)
    order = [
        F.col("l_shipdate").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        x.asc(),
        y.asc(),
    ]
    # BUCKET-CARRY decomposition (round 5): PARTITION BY l_returnflag
    # alone caps the window at 3 tasks forever — at 100 TB one task must
    # sort a third of the corpus (the corpus-wide-window smell this repo
    # bans; it measured 8× cost at 10× data purely from the parallelism
    # ceiling).  A ROWS -29..0 frame only ever reaches 29 rows back, so
    # split each flag partition into shipdate-month buckets, DUPLICATE
    # each bucket's last 29 rows into the next occupied bucket
    # (is_carry=1), evaluate the same exact-int64 window per
    # (flag, bucket), and drop the carry rows: every kept row sees
    # exactly the 29 globally-preceding rows (carried rows sort first —
    # they come from strictly earlier months).  Value-identical by
    # construction (integer sums; same frame contents), ~250-way
    # parallel instead of 3.
    #
    # The bucket-occupancy map is control-plane-sized (flag × month) and
    # driver-checked: the carry of 29 rows spans AT MOST one bucket
    # boundary, so every occupied bucket must hold ≥ 29 rows — if any
    # does not (arbitrary input data, not this fixture), fall back to
    # the plain single-window form, which is always correct.
    bucket = (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("_bkt")
    d0 = li.select(
        "l_returnflag", "l_orderkey", "l_linenumber",
        "l_shipdate", x.alias("_x"), y.alias("_y"), bucket,
    )
    # engage the decomposition only when the 3-task ceiling actually
    # binds: below ~2M rows the plain window finishes faster than the
    # carry machinery's extra pass + union cost (measured 1.9 s plain vs
    # 4.0 s bucketed at 600k rows; 21.2 s plain vs 6.4 s bucketed at
    # 6M).  The gate is driver-side and deterministic (exact counts).
    # Two-step gate (round 6): the size check is a bare count() — on an
    # unfiltered parquet scan that's footer metadata, no shuffle — so
    # the below-gate path (every sf ≤ 0.1 run, i.e. the whole bench
    # suite) never pays the flag×month occupancy aggregate at all; the
    # occupancy map is only built once the decomposition is actually in
    # play.
    total = li.count()
    use_buckets = total >= _CORR_BUCKET_MIN_ROWS
    if use_buckets:
        occ = (
            d0.groupBy("l_returnflag", "_bkt")
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        # the 29-row carry spans AT MOST one bucket boundary, so every
        # occupied bucket must hold ≥ 29 rows — arbitrary input data that
        # violates this falls back to the always-correct plain window
        use_buckets = bool(occ) and min(r["_n"] for r in occ) >= 29
    if use_buckets:
        # driver-side successor map: next OCCUPIED bucket per flag
        succ: dict[tuple, int] = {}
        by_flag: dict[str, list[int]] = {}
        for r in occ:
            by_flag.setdefault(r["l_returnflag"], []).append(r["_bkt"])
        for flag, bkts in by_flag.items():
            bkts.sort()
            for prev, nxt in zip(bkts, bkts[1:]):
                succ[(flag, prev)] = nxt
        succ_entries = [
            F.lit(v)
            for fb, nxt in succ.items()
            for v in (F.concat_ws("|", F.lit(fb[0]), F.lit(str(fb[1]))), nxt)
        ]
        succ_expr = (
            F.create_map(*succ_entries).getItem(
                F.concat_ws("|", F.col("l_returnflag"), F.col("_bkt").cast("string"))
            )
            if succ_entries
            else F.lit(None).cast("int")
        )
        w_tail = W.partitionBy("l_returnflag", "_bkt").orderBy(
            F.col("l_shipdate").desc(),
            F.col("l_orderkey").desc(),
            F.col("l_linenumber").desc(),
            F.col("_x").desc(),
            F.col("_y").desc(),
        )
        carries = (
            d0.withColumn("_rk", F.row_number().over(w_tail))
            .filter(F.col("_rk") <= 29)
            .withColumn("_nxt", succ_expr)
            .filter(F.col("_nxt").isNotNull())
            .select(
                "l_returnflag", "l_orderkey", "l_linenumber", "l_shipdate",
                "_x", "_y", F.col("_nxt").alias("_bkt"),
                F.lit(1).alias("_carry"),
            )
        )
        unioned = d0.withColumn("_carry", F.lit(0)).unionByName(carries)
        w = (
            W.partitionBy("l_returnflag", "_bkt")
            .orderBy(
                F.col("l_shipdate").asc(),
                F.col("l_orderkey").asc(),
                F.col("l_linenumber").asc(),
                F.col("_x").asc(),
                F.col("_y").asc(),
            )
            .rowsBetween(-29, 0)
        )
        d = unioned.select(
            "l_returnflag", "l_orderkey", "l_linenumber", "_carry",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum("_x").over(w).alias("sx"),
            F.sum("_y").over(w).alias("sy"),
            F.sum(F.col("_x") * F.col("_y")).over(w).alias("sxy"),
            F.sum(F.col("_x") * F.col("_x")).over(w).alias("sxx"),
            F.sum(F.col("_y") * F.col("_y")).over(w).alias("syy"),
        ).filter(F.col("_carry") == 0)
    else:
        w = W.partitionBy("l_returnflag").orderBy(*order).rowsBetween(-29, 0)
        d = li.select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum(x).over(w).alias("sx"),
            F.sum(y).over(w).alias("sy"),
            F.sum(x * y).over(w).alias("sxy"),
            F.sum(x * x).over(w).alias("sxx"),
            F.sum(y * y).over(w).alias("syy"),
        )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return d.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("n").cast("long").alias("n"),
        F.when(
            (dx > 0.0) & (dy > 0.0),
            F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 8),
        ).alias("rolling_corr"),
    )


def q_win_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its customer's lifetime
    spend and of the global total — the whole-partition window aggregate
    (unbounded frame ≡ one value per partition; Spark evaluates it as a
    single-pass WindowExec, no self-join back to a grouped total).
    Exact-cents sums, two single divisions; the global share uses a
    1-row broadcast total instead of an empty-partition window (a
    no-PARTITION-BY window is a single-task corpus sort — the banned
    shape; the broadcast scalar is the 100 TB form)."""
    o = load(spark, sf_dir, "orders")
    w_cust = W.partitionBy("o_custkey")
    c = cents("o_totalprice")
    total = o.agg(F.sum(c).alias("_g"))
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            c.alias("_c"),
            F.sum(c).over(w_cust).alias("_cust_total"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("_c").cast("double") / F.col("_cust_total").cast("double"))
            .alias("share_of_customer"),
            (F.col("_c").cast("double") / F.col("_g").cast("double"))
            .alias("share_of_total"),
        )
    )


QUERIES = {
    "q_win_rank": q_win_rank,
    "q_win_ratio": q_win_ratio,
    "q_win_ewma": q_win_ewma,
    "q_win_median": q_win_median,
    "q_win_corr": q_win_corr,
    "q_win_distribution": q_win_distribution,
    "q_win_range": q_win_range,
    "q_win_lag": q_win_lag,
    "q_win_frame": q_win_frame,
    "q_topk_group": q_topk_group,
}

ORACLE = {
    "q_win_ewma": _ewma_sql(),
    "q_win_ratio": f"""
        WITH t AS (SELECT SUM({sql_cents("o_totalprice")}) AS g FROM orders)
        SELECT o_orderkey, o_custkey,
               CAST({sql_cents("o_totalprice")} AS DOUBLE)
                 / CAST(SUM({sql_cents("o_totalprice")})
                        OVER (PARTITION BY o_custkey) AS DOUBLE)
                 AS share_of_customer,
               CAST({sql_cents("o_totalprice")} AS DOUBLE)
                 / CAST(t.g AS DOUBLE) AS share_of_total
        FROM orders CROSS JOIN t
    """,
    "q_win_corr": f"""
        WITH rows_c AS (
          SELECT l_returnflag, l_orderkey, l_linenumber, l_shipdate,
                 {sql_cents("l_quantity")} AS cx,
                 {sql_cents("l_extendedprice")} AS cy
          FROM lineitem
        ),
        m AS (
          SELECT l_returnflag, l_orderkey, l_linenumber,
                 CAST(COUNT(*) OVER w AS BIGINT) AS n,
                 SUM(cx) OVER w AS sx,
                 SUM(cy) OVER w AS sy,
                 SUM(cx * cy) OVER w AS sxy,
                 SUM(cx * cx) OVER w AS sxx,
                 SUM(cy * cy) OVER w AS syy
          FROM rows_c
          WINDOW w AS (PARTITION BY l_returnflag
                       ORDER BY l_shipdate ASC, l_orderkey ASC,
                                l_linenumber ASC, cx ASC, cy ASC
                       ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
        )
        SELECT l_returnflag, l_orderkey, l_linenumber, n,
               CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0
                     AND CAST(n * syy - sy * sy AS DOUBLE) > 0.0
                    THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))),
                               8)
               END AS rolling_corr
        FROM m
    """,
    "q_win_median": f"""
        SELECT o_custkey, o_orderkey,
               quantile_cont({sql_cents("o_totalprice")}, 0.5) OVER w / 100.0
                 AS rolling_median
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    "q_win_distribution": """
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               round(percent_rank() OVER w, 8) AS pct_rank,
               round(cume_dist() OVER w, 8) AS cume,
               ntile(10) OVER w AS decile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    "q_win_range": f"""
        SELECT o_orderkey, o_custkey,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
               COUNT(*) OVER w AS n_orders_30d,
               CAST(SUM({sql_cents("o_totalprice")}) OVER w AS DOUBLE) / 100.0
                 AS spend_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY CAST(epoch(o_orderdate) AS BIGINT) ASC
                     RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
    "q_win_rank": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
               row_number() OVER w_total AS rn,
               rank() OVER w_ties AS rnk,
               dense_rank() OVER w_ties AS drnk,
               ntile(4) OVER w_total AS quartile
        FROM lineitem
        WINDOW
          w_total AS (PARTITION BY l_returnflag
                      ORDER BY l_quantity ASC, l_orderkey ASC, l_linenumber ASC),
          w_ties AS (PARTITION BY l_returnflag ORDER BY l_quantity ASC)
    """,
    "q_win_lag": """
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               lag(value, 1) OVER w AS prev_value,
               lead(value, 1) OVER w AS next_value,
               first_value(event_type) OVER wf AS first_type,
               last_value(event_type) OVER wf AS running_last_type,
               nth_value(event_type, 2) OVER wf AS second_type
        FROM events
        WINDOW
          w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC),
          wf AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "q_win_frame": f"""
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
               CAST(SUM({sql_cents("o_totalprice")}) OVER run AS DOUBLE) / 100.0
                 AS running_total,
               (CAST(SUM({sql_cents("o_totalprice")}) OVER mov AS DOUBLE) / 100.0)
                 / CAST(COUNT(*) OVER mov AS DOUBLE) AS moving_avg3
        FROM orders
        WINDOW
          run AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          mov AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "q_topk_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          FROM orders
        ) WHERE rk <= 3 ORDER BY o_custkey, rk
    """,
}
