"""Event-analytics queries: funnel, cohort retention, transition matrix —
the product-analytics reductions over the events feed (operators in
fossa_spark/events.py), each DuckDB-oracle-checked.

Determinism: stage times compare with strict ``>`` in both engines; week
indices are integer division of unix seconds (both truncate for positive
epochs); counts cast to BIGINT; the transition window breaks ts ties on
event_id in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fossa_spark import events as E
from fossa_spark.queries._util import load_events

_STEPS = ["view", "click", "purchase"]


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel per user (strictly-ordered stages)."""
    e = load_events(spark, sf_dir)
    return E.funnel(e, _STEPS).orderBy("user_id")


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle over the events feed."""
    e = load_events(spark, sf_dir)
    return E.cohort_retention(e).orderBy("cohort_week", "week_offset")


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (lag window + hash agg)."""
    e = load_events(spark, sf_dir)
    return E.transitions(e).orderBy("prev_type", "event_type")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based (30 min) batch sessionization per user — lag window for
    boundaries, running sum for session ids, exact-µs gap arithmetic."""
    e = load_events(spark, sf_dir)
    return E.sessionize(e, gap_seconds=1800).orderBy("user_id", "session_id")


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history from the event feed: consecutive-dedupe on
    event_type per user, validity intervals via lead()."""
    e = load_events(spark, sf_dir)
    return E.scd2_history(e).orderBy("user_id", "version")


def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (WAU) + same-day DAU.
    Rolling COUNT DISTINCT has no window-function form, so the operator
    uses the scalable contribution-explode shape (events.py
    rolling_active)."""
    e = load_events(spark, sf_dir)
    return E.rolling_active(e, window_days=7).orderBy("day")


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits its value to
    the LAST preceding non-purchase touch (view/click/error) by the same
    user within 30 minutes; purchases with no qualifying touch fall into
    an 'unattributed' bucket. One per-user window pass (last_value over
    preceding touches — the as-of-join shape without a join), then a tiny
    aggregate per credited touch type. Exact-cents money."""
    e = load_events(spark, sf_dir)
    from pyspark.sql import Window as W

    from fossa_spark.queries._util import cents

    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch_type = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_us = F.when(
        F.col("event_type") != "purchase", F.unix_micros("ts")
    )
    annotated = e.withColumn(
        "last_touch", F.last(touch_type, ignorenulls=True).over(w)
    ).withColumn("last_touch_us", F.last(touch_us, ignorenulls=True).over(w))
    purchases = annotated.filter(F.col("event_type") == "purchase")
    credited = purchases.select(
        F.when(
            F.col("last_touch_us")
            >= F.unix_micros("ts") - F.lit(30 * 60 * 1_000_000),
            F.col("last_touch"),
        )
        .otherwise(F.lit("unattributed"))
        .alias("touch"),
        cents("value").alias("v"),
    )
    return (
        credited.groupBy("touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (F.sum("v").cast("double") / 100.0).alias("credited_value"),
        )
        .orderBy("touch")
    )


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: each event_type's irregular value
    series resampled onto a 15-minute grid with forward fill (events.py
    resample_ffill — the union trick: one window pass, no per-point
    as-of join)."""
    e = load_events(spark, sf_dir)
    return E.resample_ffill(e, every_us=900_000_000).orderBy(
        "event_type", "grid_us"
    )


def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization with LINEAR INTERPOLATION between the
    surrounding observations (events.py resample_interp — the same
    union-trick single-shuffle shape as ffill, two frame passes)."""
    e = load_events(spark, sf_dir)
    return E.resample_interp(e, every_us=900_000_000).orderBy(
        "event_type", "grid_us"
    )


def q_anomaly_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: daily event counts per type, z-scored
    against that type's own daily distribution; emit the anomalous days
    (|z| > 1.5). The operational data-quality monitor shape: two hash
    aggregates (day grain, then type grain) + a broadcast stats join —
    no window over the full feed.

    Determinism: counts are exact integers; mean/var come from exact
    integer sum/sumsq via identical double expressions both sides; z
    rounded to 6 dp."""
    e = load_events(spark, sf_dir)
    daily = (
        e.groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_days").cast("double")
    var = (
        F.col("ss").cast("double") / F.col("n_days").cast("double")
        - mean * mean
    )
    z = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) > 1.5)
        .select("event_type", "day", "cnt", "z")
        .orderBy("event_type", "day")
    )


def q_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst-collapse (debounce) dedup: drop events that land within 60 s
    of the same user's previous event of the same type — the batch
    analogue of stream throttling, one lag window on the natural key.
    Emits per-type kept/dropped counts (exact integers)."""
    from pyspark.sql import Window as W

    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = e.withColumn(
        "kept", gap.isNull() | (gap > 60_000_000)
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.sum((~F.col("kept")).cast("long")).alias("n_dropped"),
        )
        .orderBy("event_type")
    )


def q_agg_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of event values per type — the
    irregular-interval time-series reduction where plain AVG is wrong:
    each observation is weighted by how long it stayed current (µs until
    the user's next event of that type; the open-ended last observation
    drops out, standard left-closed TWAP). One window shuffle on
    (user_id, event_type), then a partial-agg reduction.

    Determinism: value is exact 2-dp → integer cents; weights are integer
    µs; cents×µs products sum in DECIMAL(38,0) (int64 would overflow at
    ~100× scale), and the single cents-weighted division happens once in
    double at the end — order-independent, hash-comparable."""
    from pyspark.sql import Window as W

    from fossa_spark.queries._util import cents

    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    dur = (
        F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    ).alias("dur_us")
    obs = e.select("event_type", cents("value").alias("v_cents"), dur).filter(
        F.col("dur_us").isNotNull()
    )
    wd = (F.col("v_cents") * F.col("dur_us")).cast("decimal(38,0)")
    return (
        obs.groupBy("event_type")
        .agg(
            F.sum(wd).alias("_swd"),
            F.sum("dur_us").alias("total_us"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .select(
            "event_type",
            F.round(
                F.col("_swd").cast("double")
                / F.col("total_us").cast("double")
                / 100.0,
                6,
            ).alias("twap"),
            "total_us",
            "n_intervals",
        )
        .orderBy("event_type")
    )


def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection — the calendar-aware upgrade of
    q_anomaly_volume: per (event_type, day-of-week, hour) expected counts
    from the feed's own history, then hours whose actual count deviates
    from THEIR seasonal slot's mean (not the global mean — Friday 5 pm is
    compared to Friday-5-pm history). Three hash aggregates + one
    broadcast profile join; the profile table is |types|·7·24 rows at any
    corpus size. Exact integer counts; ratio = one double division."""
    e = load_events(spark, sf_dir)
    hourly = (
        e.groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.dayofweek("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    profile = hourly.groupBy("event_type", "dow", "hr").agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.sum("cnt").alias("s"),
    )
    expected = F.col("s").cast("double") / F.col("n_slots").cast("double")
    ratio = F.col("cnt").cast("double") / expected
    return (
        hourly.join(F.broadcast(profile), ["event_type", "dow", "hr"])
        .select(
            "event_type", "day", "dow", "hr", "cnt",
            expected.alias("expected"),
            ratio.alias("ratio"),
        )
        .filter((F.col("ratio") >= 1.5) | (F.col("ratio") <= 0.5))
        .orderBy("event_type", "day", "hr")
    )


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most common 3-step behavioral paths (sequential pattern
    mining lite — the step past q_event_transitions' pair matrix): two
    lead() reads over each user's time-ordered stream form the
    (t, t+1, t+2) trigram, one hash agg counts, top-20 by
    (count desc, path asc) — orderBy+limit, no corpus window. The event
    stream's (ts, event_id) order is total, so trigram formation is
    deterministic."""
    from pyspark.sql import Window as W

    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    tri = e.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    ).filter(F.col("s3").isNotNull())
    return (
        tri.groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "s1", "s2", "s3")
        .limit(20)
    )


QUERIES = {
    "q_seasonal_profile": q_seasonal_profile,
    "q_event_paths": q_event_paths,
    "q_agg_twap": q_agg_twap,
    "q_resample_interp": q_resample_interp,
    "q_anomaly_volume": q_anomaly_volume,
    "q_event_debounce": q_event_debounce,
    "q_funnel": q_funnel,
    "q_rolling_active": q_rolling_active,
    "q_attribution": q_attribution,
    "q_resample_ffill": q_resample_ffill,
    "q_sessionize": q_sessionize,
    "q_scd2": q_scd2,
    "q_cohort_retention": q_cohort_retention,
    "q_event_transitions": q_event_transitions,
}

ORACLE = {
    "q_event_paths": """
        WITH tri AS (
          SELECT event_type AS s1,
                 lead(event_type, 1) OVER w AS s2,
                 lead(event_type, 2) OVER w AS s3
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
        )
        SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS n
        FROM tri WHERE s3 IS NOT NULL
        GROUP BY 1, 2, 3
        ORDER BY n DESC, s1, s2, s3
        LIMIT 20
    """,
    "q_seasonal_profile": """
        WITH hourly AS (
          SELECT event_type,
                 strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
                 CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
                 CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2, 3, 4
        ),
        profile AS (
          SELECT event_type, dow, hr,
                 CAST(COUNT(*) AS BIGINT) AS n_slots,
                 CAST(SUM(cnt) AS BIGINT) AS s
          FROM hourly GROUP BY 1, 2, 3
        )
        SELECT h.event_type, h.day, h.dow, h.hr, h.cnt,
               CAST(p.s AS DOUBLE) / CAST(p.n_slots AS DOUBLE) AS expected,
               CAST(h.cnt AS DOUBLE)
                 / (CAST(p.s AS DOUBLE) / CAST(p.n_slots AS DOUBLE)) AS ratio
        FROM hourly h JOIN profile p USING (event_type, dow, hr)
        WHERE CAST(h.cnt AS DOUBLE)
                / (CAST(p.s AS DOUBLE) / CAST(p.n_slots AS DOUBLE)) >= 1.5
           OR CAST(h.cnt AS DOUBLE)
                / (CAST(p.s AS DOUBLE) / CAST(p.n_slots AS DOUBLE)) <= 0.5
        ORDER BY h.event_type, h.day, h.hr
    """,
    "q_agg_twap": """
        WITH obs AS (
          SELECT event_type,
                 CAST(ROUND(value * 100.0) AS BIGINT) AS v_cents,
                 epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id))
                   - epoch_us(CAST(ts AS TIMESTAMP)) AS dur_us
          FROM events
        )
        SELECT event_type,
               ROUND(CAST(SUM(v_cents * dur_us) AS DOUBLE)
                     / CAST(SUM(dur_us) AS DOUBLE) / 100.0, 6) AS twap,
               CAST(SUM(dur_us) AS BIGINT) AS total_us,
               CAST(COUNT(*) AS BIGINT) AS n_intervals
        FROM obs WHERE dur_us IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    "q_resample_interp": """
        WITH e AS (
          SELECT event_type AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 CAST(value AS DOUBLE) AS v, 0 AS is_grid,
                 event_id AS ord_id
          FROM events
        ),
        span AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM e),
        grid AS (
          SELECT k.k, s.mn + g.i * 900000000 AS us,
                 CAST(NULL AS DOUBLE) AS v, 1 AS is_grid,
                 CAST(1152921504606846976 AS BIGINT) AS ord_id
          FROM (SELECT DISTINCT k FROM e) k
          CROSS JOIN span s
          JOIN generate_series(0, 100000) g(i)
            ON g.i <= (s.mx - s.mn) // 900000000
        ),
        u AS (
          SELECT *, CASE WHEN is_grid = 0 THEN us END AS obs_us
          FROM (SELECT * FROM e UNION ALL SELECT * FROM grid)
        ),
        f AS (
          SELECT k, us, is_grid,
                 last_value(v IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY us, is_grid, ord_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
                 last_value(obs_us IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY us, is_grid, ord_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
                 first_value(v IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY us, is_grid, ord_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
                 first_value(obs_us IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY us, is_grid, ord_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tn
          FROM u
        )
        SELECT k AS event_type, us AS grid_us,
               ROUND(CASE WHEN vp IS NULL THEN vn
                          WHEN vn IS NULL THEN vp
                          WHEN tn = tp THEN vp
                          ELSE vp + (vn - vp) *
                               (CAST(us - tp AS DOUBLE)
                                / CAST(tn - tp AS DOUBLE))
                     END, 6) AS interp_value
        FROM f WHERE is_grid = 1
        ORDER BY event_type, grid_us
    """,
    "q_anomaly_volume": """
        WITH daily AS (
          SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
                   AS day,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY event_type, day
        ),
        stats AS (
          SELECT event_type, COUNT(*) AS n_days, SUM(cnt) AS s,
                 SUM(cnt * cnt) AS ss
          FROM daily GROUP BY event_type
        )
        SELECT d.event_type, d.day, d.cnt,
               ROUND((CAST(d.cnt AS DOUBLE)
                      - CAST(s.s AS DOUBLE) / CAST(s.n_days AS DOUBLE))
                     / sqrt(CAST(s.ss AS DOUBLE) / CAST(s.n_days AS DOUBLE)
                            - (CAST(s.s AS DOUBLE) / CAST(s.n_days AS DOUBLE))
                              * (CAST(s.s AS DOUBLE)
                                 / CAST(s.n_days AS DOUBLE))), 6) AS z
        FROM daily d JOIN stats s USING (event_type)
        WHERE ABS(ROUND((CAST(d.cnt AS DOUBLE)
                      - CAST(s.s AS DOUBLE) / CAST(s.n_days AS DOUBLE))
                     / sqrt(CAST(s.ss AS DOUBLE) / CAST(s.n_days AS DOUBLE)
                            - (CAST(s.s AS DOUBLE) / CAST(s.n_days AS DOUBLE))
                              * (CAST(s.s AS DOUBLE)
                                 / CAST(s.n_days AS DOUBLE))), 6)) > 1.5
        ORDER BY event_type, day
    """,
    "q_event_debounce": """
        WITH g AS (
          SELECT event_type,
                 epoch_us(CAST(ts AS TIMESTAMP))
                   - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
          FROM events
        )
        SELECT event_type,
               CAST(SUM(CASE WHEN gap IS NULL OR gap > 60000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN gap IS NOT NULL AND gap <= 60000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        FROM g GROUP BY event_type ORDER BY event_type
    """,
    "q_resample_ffill": """
        WITH e AS (
          SELECT event_type AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 CAST(value AS DOUBLE) AS v, 0 AS is_grid,
                 event_id AS ord_id
          FROM events
        ),
        span AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM e),
        grid AS (
          SELECT k.k, s.mn + g.i * 900000000 AS us,
                 CAST(NULL AS DOUBLE) AS v, 1 AS is_grid,
                 CAST(1152921504606846976 AS BIGINT) AS ord_id
          FROM (SELECT DISTINCT k FROM e) k
          CROSS JOIN span s
          JOIN generate_series(0, 100000) g(i)
            ON g.i <= (s.mx - s.mn) // 900000000
        ),
        u AS (
          SELECT * FROM e UNION ALL SELECT * FROM grid
        ),
        f AS (
          SELECT k, us, is_grid,
                 last_value(v IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY us, is_grid, ord_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
          FROM u
        )
        SELECT k AS event_type, us AS grid_us, ff AS filled_value
        FROM f WHERE is_grid = 1
        ORDER BY event_type, grid_us
    """,
    "q_attribution": """
        WITH e AS (
          SELECT user_id, event_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 CAST(ROUND(value * 100.0) AS BIGINT) AS v
          FROM events
        ),
        ann AS (
          SELECT *,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN event_type END IGNORE NULLS)
                   OVER w AS last_touch,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN us END IGNORE NULLS)
                   OVER w AS last_touch_us
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        c AS (
          SELECT CASE WHEN last_touch_us >= us - 1800000000 THEN last_touch
                      ELSE 'unattributed' END AS touch, v
          FROM ann WHERE event_type = 'purchase'
        )
        SELECT touch, CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(v) AS DOUBLE) / 100.0 AS credited_value
        FROM c GROUP BY touch ORDER BY touch
    """,
    "q_rolling_active": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
          FROM events
        ),
        span AS (SELECT MAX(day) AS mx FROM ud),
        contrib AS (
          SELECT user_id, day + CAST(g.i AS INTEGER) AS tday
          FROM ud JOIN generate_series(0, 6) AS g(i) ON TRUE
        ),
        wau AS (
          SELECT tday, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS rolling_users
          FROM contrib, span WHERE tday <= mx GROUP BY tday
        ),
        dau AS (
          SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
          FROM ud GROUP BY day
        )
        SELECT strftime(w.tday, '%Y-%m-%d') AS day,
               CAST(COALESCE(d.dau, 0) AS BIGINT) AS dau,
               w.rolling_users
        FROM wau w LEFT JOIN dau d ON w.tday = d.day
        ORDER BY day
    """,
    "q_scd2": """
        WITH t AS (
          SELECT user_id, event_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY CAST(ts AS TIMESTAMP),
                                                event_id) AS prev
          FROM events
        ),
        changed AS (
          SELECT user_id, event_id, event_type, us
          FROM t WHERE prev IS NULL OR event_type <> prev
        )
        SELECT user_id,
               CAST(row_number() OVER w AS BIGINT) AS version,
               event_type,
               us AS valid_from_us,
               lead(us) OVER w AS valid_to_us,
               lead(us) OVER w IS NULL AS is_current
        FROM changed
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ORDER BY user_id, version
    """,
    "q_sessionize": """
        WITH t AS (
          SELECT user_id, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events
        ),
        marked AS (
          SELECT user_id, event_id, us,
                 CASE WHEN us - lag(us) OVER w IS NULL
                        OR us - lag(us) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM t
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        s AS (
          SELECT user_id, us,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id
                                        ORDER BY us, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT)
                   AS session_id
          FROM marked
        )
        SELECT user_id, session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(us) AS start_us, MAX(us) AS end_us,
               MAX(us) - MIN(us) AS duration_us
        FROM s GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "q_funnel": """
        WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                   FROM events),
        s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, MIN(ts) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, MIN(ts) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
        SELECT u.user_id,
               s1.user_id IS NOT NULL AS reached_view,
               s2.user_id IS NOT NULL AS reached_click,
               s3.user_id IS NOT NULL AS reached_purchase,
               CAST((s1.user_id IS NOT NULL)::INT
                  + (s2.user_id IS NOT NULL)::INT
                  + (s3.user_id IS NOT NULL)::INT AS BIGINT) AS funnel_stage
        FROM (SELECT DISTINCT user_id FROM e) u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
        ORDER BY u.user_id
    """,
    "q_cohort_retention": """
        WITH active AS (
          SELECT DISTINCT user_id,
                 CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 604800
                   AS wk
          FROM events
        ),
        cohorts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM active GROUP BY 1)
        SELECT cohort_wk AS cohort_week, wk - cohort_wk AS week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM active JOIN cohorts USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_event_transitions": """
        SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
          SELECT event_type,
                 COALESCE(
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY CAST(ts AS TIMESTAMP), event_id),
                   '∅') AS prev_type
          FROM events
        )
        GROUP BY prev_type, event_type
        ORDER BY prev_type, event_type
    """,
}
