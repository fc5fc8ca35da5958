"""Event-analytics operators: funnel analysis, cohort retention, and
transition matrices over an event stream table.

The reference engine's data plane hands models raw event feeds (SURVEY.md
§1.2); these are the standard product-analytics reductions a user would run
on them. All three are pure DataFrame compositions — no UDFs, no
collect — and each shuffles only on the analysis key:

- funnel: per-stage pruned scans (the event-type filter pushes to parquet)
  + per-user min aggregates, joined smallest-side-first. Never materializes
  per-user event arrays, so an unbounded per-user history can't OOM an
  executor (the collect_list formulation would).
- cohort retention: two hash aggregates on (user) and (cohort, week).
- transitions: one window sort per user partition, then a hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# seconds per week; week index = unix_seconds div WEEK (integer div — both
# engines truncate identically for positive epochs)
_WEEK = 604800


def funnel(events: DataFrame, steps: list[str], user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel reachability: for each user, how far through ``steps``
    they progressed, where step k+1 must occur strictly AFTER the earliest
    completion of step k.

    Greedy earliest-match is optimal for reachability (any step-k+1 event
    after *some* step-k event is also after the EARLIEST step-k event), so
    stage times are computed as chained conditional minima:

        t1 = min(ts | type = step1)
        t2 = min(ts | type = step2, ts > t1)   ...

    Each stage is one filter (pushed to the scan) + one per-user min + one
    equi join against the shrinking reached-set — k small aggregates instead
    of one collect_list fold, so per-user history size never hits memory.

    Returns one row per user with ``funnel_stage`` (0..len(steps)) and a
    ``reached_<step>`` boolean per step.
    """
    users = events.select(user_col).distinct()
    reached = None  # DataFrame[user_col, _t] — users who completed the prefix
    out = users
    for i, step in enumerate(steps):
        stage_events = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("_ts")
        )
        if reached is None:
            nxt = stage_events
        else:
            nxt = stage_events.join(reached, user_col).filter(
                F.col("_ts") > F.col("_t")
            )
        reached = nxt.groupBy(user_col).agg(F.min("_ts").alias("_t"))
        flag = reached.select(user_col, F.lit(True).alias(f"reached_{step}"))
        out = out.join(flag, user_col, "left").withColumn(
            f"reached_{step}", F.coalesce(f"reached_{step}", F.lit(False))
        )
    stage = sum(
        F.col(f"reached_{s}").cast("int") for s in steps
    )
    return out.withColumn("funnel_stage", stage.cast("bigint"))


def sessionize(events: DataFrame, gap_seconds: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               order_tiebreak: str = "event_id") -> DataFrame:
    """Batch gap-based sessionization: a new session starts when the gap to
    the user's previous event exceeds ``gap_seconds``. The classic two-
    window formulation — lag to mark boundaries, running sum to number
    them — so it stays one shuffle on the user key plus two in-partition
    window passes (no per-user collect, no UDF).

    Timestamps compare in integer microseconds (unix_micros), so the gap
    predicate is exact. Returns one row per (user, session_id) with event
    count, start/end in µs, and duration. The streaming analogue is
    streaming/windows.py's session window; this is the backfill/batch path
    over the same feed.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sess = events.select(
        F.col(user_col),
        us.alias("_us"),
        F.col(order_tiebreak),
        F.sum(is_new).over(run).cast("long").alias("session_id"),
    )
    return (
        with_sess.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
            (F.max("_us") - F.min("_us")).alias("duration_us"),
        )
    )


def scd2_history(events: DataFrame, key_col: str = "user_id",
                 ts_col: str = "ts", attr_col: str = "event_type",
                 order_tiebreak: str = "event_id") -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change feed: per
    key, collapse consecutive identical attribute values (CDC dedupe),
    then assign validity intervals — valid_from = change time, valid_to =
    next change (NULL = current), version = change ordinal.

    The standard CDC → warehouse-dimension materialization: two window
    passes over one shuffle on the key (no self-join, no collect).
    Timestamps emitted as integer microseconds so interval arithmetic is
    exact."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    changed = (
        events.select(
            F.col(key_col), us.alias("_us"), F.col(order_tiebreak),
            F.col(attr_col),
            F.lag(attr_col).over(w).alias("_prev"),
        )
        .filter(F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev")))
    )
    w2 = Window.partitionBy(key_col).orderBy("_us", order_tiebreak)
    return changed.select(
        F.col(key_col),
        F.row_number().over(w2).cast("long").alias("version"),
        F.col(attr_col),
        F.col("_us").alias("valid_from_us"),
        F.lead("_us").over(w2).alias("valid_to_us"),
        F.lead("_us").over(w2).isNull().alias("is_current"),
    )


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort-retention triangle: cohort = ISO-epoch week of the
    user's first event; one output row per (cohort_week, week_offset) with
    the distinct active users.

    Two shuffles total: min-week per user (map-side partial), then the
    (cohort, offset) count-distinct. The distinct-user set per cell is
    exact — at 100 TB swap count_distinct for approx_count_distinct if a
    2% error is acceptable (HLL merges map-side).
    """
    wk = F.expr(f"unix_timestamp({ts_col}) div {_WEEK}").alias("wk")
    active = events.select(F.col(user_col), wk).distinct()
    cohorts = active.groupBy(user_col).agg(F.min("wk").alias("cohort_wk"))
    return (
        active.join(cohorts, user_col)
        .groupBy(
            F.col("cohort_wk").alias("cohort_week"),
            (F.col("wk") - F.col("cohort_wk")).alias("week_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def transitions(events: DataFrame, user_col: str = "user_id",
                ts_col: str = "ts", order_tiebreak: str = "event_id",
                type_col: str = "event_type") -> DataFrame:
    """Event-type transition matrix: count of (previous type → type) pairs
    over each user's time-ordered history. One window sort per user
    partition (ties broken deterministically by ``order_tiebreak``), one
    hash aggregate; session starts (no previous event) appear as
    prev_type = '∅'.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    return (
        events.select(
            user_col,
            F.coalesce(F.lag(type_col).over(w), F.lit("∅")).alias("prev_type"),
            F.col(type_col),
        )
        .groupBy("prev_type", type_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def rolling_active(events: DataFrame, window_days: int = 7,
                   user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Rolling distinct active users: per calendar day, DAU plus the
    trailing-``window_days`` distinct-user count (WAU for 7).

    Rolling COUNT DISTINCT has no window-function form (distinct is not
    frame-decomposable), so the scalable shape is contribution explode:
    each (user, day) pair — already deduped, so the explode is over the
    per-day ACTIVE-user grain, not raw events — contributes to the
    ``window_days`` window-end days it is visible from, then one
    count_distinct per target day. Shuffle cost: |active user-days| ×
    window_days rows into a day-keyed aggregate, independent of raw event
    volume — at 100 TB the events→(user, day) dedup is the big reduction
    and happens first."""
    ud = (
        events.select(
            F.col(user_col).alias("u"), F.to_date(ts_col).alias("day")
        ).distinct()
    )
    span = ud.agg(F.max("day").alias("mx"))
    contrib = (
        ud.select(
            "u",
            F.explode(
                F.sequence(F.lit(0), F.lit(window_days - 1))
            ).alias("i"),
            "day",
        )
        .select("u", F.date_add("day", F.col("i")).alias("tday"))
        .crossJoin(F.broadcast(span))
        .filter(F.col("tday") <= F.col("mx"))
    )
    wau = contrib.groupBy("tday").agg(
        F.count_distinct("u").alias("rolling_users")
    )
    dau = ud.groupBy("day").agg(F.count_distinct("u").alias("dau"))
    return (
        wau.join(dau, wau.tday == dau.day, "left")
        .select(
            F.date_format("tday", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.col("rolling_users").cast("long").alias("rolling_users"),
        )
    )


def resample_ffill(events: DataFrame, every_us: int = 900_000_000,
                   key_col: str = "event_type", ts_col: str = "ts",
                   val_col: str = "value") -> DataFrame:
    """Resample an irregular event series onto a fixed grid with forward
    fill: per key, emit one row per grid instant carrying the most recent
    observed value at-or-before it (the time-series regularization step
    before joins/models that need aligned timestamps).

    Scalable shape — the union trick: grid points and observations union
    into ONE relation, a single per-key window pass computes
    last(value, ignorenulls) in (ts, is_grid, id) order, and grid rows are
    filtered back out. No per-grid-point as-of join, no range join: one
    shuffle on the key, O(1) window state per row. Grid rows carry a
    sentinel id sorting AFTER any real observation at the same instant
    (NULL ordering defaults differ across engines — never order by a
    nullable column)."""
    from pyspark.sql import Window as W

    obs = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(ts_col).alias("us"),
        F.col(val_col).cast("double").alias("v"),
        F.lit(0).alias("is_grid"),
        F.col("event_id").cast("long").alias("ord_id"),
    )
    span = events.agg(
        F.min(F.unix_micros(ts_col)).alias("mn"),
        F.max(F.unix_micros(ts_col)).alias("mx"),
    )
    keys = events.select(F.col(key_col).alias("k")).distinct()
    grid = (
        keys.crossJoin(F.broadcast(span))
        .select(
            "k",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("mx") - F.col("mn")) / float(every_us))
                    .cast("long"),
                )
            ).alias("i"),
            "mn",
        )
        .select(
            "k",
            (F.col("mn") + F.col("i") * every_us).alias("us"),
            F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("is_grid"),
            F.lit(1 << 60).alias("ord_id"),
        )
    )
    u = obs.unionByName(grid)
    w = (
        W.partitionBy("k")
        .orderBy("us", "is_grid", "ord_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        u.withColumn("ff", F.last("v", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select(
            F.col("k").alias(key_col),
            F.col("us").alias("grid_us"),
            F.col("ff").alias("filled_value"),
        )
    )


def resample_interp(events: DataFrame, every_us: int = 900_000_000,
                    key_col: str = "event_type", ts_col: str = "ts",
                    val_col: str = "value") -> DataFrame:
    """Resample an irregular series onto a fixed grid with LINEAR
    INTERPOLATION between the surrounding observations (the alignment
    step models want when forward-fill's staircase bias matters).

    Same union-trick shape as :func:`resample_ffill` — grid points and
    observations union into one relation, ONE shuffle on the key — but
    with two frame passes over the same sorted window: the backward frame
    carries (prev value, prev ts), the forward frame (next value,
    next ts); the interpolation arithmetic is then a narrow projection.
    Grid points outside the observed span fall back to the nearest
    observation (ffill right of the last obs, bfill left of the first);
    a grid instant that coincides with an observation reproduces it
    exactly (dt = 0).

    Determinism: timestamps are integer µs and values exact 2-dp, so
    both engines compute the identical double expression; output rounded
    to 6 dp."""
    from pyspark.sql import Window as W

    obs = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(ts_col).alias("us"),
        F.col(val_col).cast("double").alias("v"),
        F.lit(0).alias("is_grid"),
        F.col("event_id").cast("long").alias("ord_id"),
    )
    span = events.agg(
        F.min(F.unix_micros(ts_col)).alias("mn"),
        F.max(F.unix_micros(ts_col)).alias("mx"),
    )
    keys = events.select(F.col(key_col).alias("k")).distinct()
    grid = (
        keys.crossJoin(F.broadcast(span))
        .select(
            "k",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("mx") - F.col("mn")) / float(every_us))
                    .cast("long"),
                )
            ).alias("i"),
            "mn",
        )
        .select(
            "k",
            (F.col("mn") + F.col("i") * every_us).alias("us"),
            F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("is_grid"),
            F.lit(1 << 60).alias("ord_id"),
        )
    )
    u = obs.unionByName(grid)
    # observation timestamp column (null on grid rows) for the frames
    u = u.withColumn("obs_us", F.when(F.col("is_grid") == 0, F.col("us")))
    back = (
        W.partitionBy("k")
        .orderBy(F.col("us"), F.col("is_grid"), F.col("ord_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # The forward lookup is NOT first(...) over (currentRow,
    # unboundedFollowing): Spark's UnboundedFollowing frame recomputes the
    # aggregate per row — O(n²) per partition (measured 428 s at sf0.1 on
    # ~25k-row event_type partitions). Reverse the sort instead: last()
    # over a running frame in exactly mirrored (us, is_grid, ord_id)
    # descending order is the same "first non-null at-or-after" value at
    # O(n log n).
    fwd = (
        W.partitionBy("k")
        .orderBy(
            F.col("us").desc(), F.col("is_grid").desc(),
            F.col("ord_id").desc(),
        )
        .rowsBetween(W.unboundedPreceding, 0)
    )
    vp = F.last("v", ignorenulls=True).over(back)
    tp = F.last("obs_us", ignorenulls=True).over(back)
    vn = F.last("v", ignorenulls=True).over(fwd)
    tn = F.last("obs_us", ignorenulls=True).over(fwd)
    interp = F.when(vp.isNull(), vn).when(vn.isNull(), vp).when(
        tn == tp, vp
    ).otherwise(
        vp
        + (vn - vp)
        * ((F.col("us") - tp).cast("double") / (tn - tp).cast("double"))
    )
    return (
        u.withColumn("iv", F.round(interp, 6))
        .filter(F.col("is_grid") == 1)
        .select(
            F.col("k").alias(key_col),
            F.col("us").alias("grid_us"),
            F.col("iv").alias("interp_value"),
        )
    )
