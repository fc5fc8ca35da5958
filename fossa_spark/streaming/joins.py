"""Stream-stream joins with watermark-bounded state.

A stream-stream equi-join buffers both sides in the state store; without a
time bound that state grows forever. The interval condition + watermarks
let Spark evict: a buffered row can be dropped once the other side's
watermark passes the end of its match window. This is the streaming twin of
operators.interval_join's banding idea — the "band" is enforced by the join
condition itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event happens
    within (left_ts, left_ts + max_delay]. State per key is bounded by
    watermark + max_delay. Columns are prefixed l_/r_.

    ``how="leftOuter"`` emits unmatched left rows (right side NULL) once
    the GLOBAL watermark — min over both sides of (max event time −
    watermark delay) — passes the end of their match window; left rows
    whose window the final watermark never clears stay buffered and are
    NOT emitted. That cutoff is a documented, SQL-expressible function of
    the input (see q_stream_outer_join_exec's oracle)."""
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)],
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, how)


def purchases_after_clicks(events: DataFrame, max_delay: str = "10 minutes") -> DataFrame:
    """Attribution demo on the events fixture: every (click → purchase)
    pair for the same user within ``max_delay``."""
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    buys = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return interval_join_streams(clicks, buys, max_delay=max_delay).select(
        F.col("l_key").alias("user_id"),
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        F.col("l_ts").alias("click_ts"),
        F.col("r_ts").alias("purchase_ts"),
        F.col("r_value").alias("purchase_value"),
    )


def enrich_with_dim(stream: DataFrame, dim: DataFrame,
                    stream_key: str, dim_key: str) -> DataFrame:
    """Stream-static enrich join: attach dimension attributes to a stream.

    The static side is broadcast (hinted explicitly), so the join is
    STATELESS — no state store, no watermark requirement, and the stream
    never shuffles: each micro-batch's tasks probe the broadcast hash map
    in place. This is the canonical 100 TB/day enrichment shape; only if
    the dim outgrew broadcast would you fall back to a shuffled join keyed
    on ``stream_key``.
    """
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], "inner"
    )
