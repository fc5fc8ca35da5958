"""Structured Streaming operators: event-time windows with watermarks,
stateful dedup, and arbitrary stateful processing.

The reference's only streaming-ish surface is its RabbitMQ task feed
(reference lib/fossa/control/rabbit_mq/message_exchange.py) — a control
stream, replaced wholesale by Spark's source→transform→sink model. The
operators here are the data-plane streaming inventory from SURVEY.md §2c.
"""

from fossa_spark.streaming.windows import (
    events_stream,
    session_agg,
    sliding_counts,
    stateful_dedup,
    tumbling_agg,
)
from fossa_spark.streaming.state import running_totals

__all__ = [
    "events_stream",
    "tumbling_agg",
    "sliding_counts",
    "session_agg",
    "stateful_dedup",
    "running_totals",
]
