"""Streaming sinks with effectively-once semantics.

The reference documents its at-least-once hazard and pushes idempotency
onto the model (the SecondTimeLucky pattern, reference
examples/example_etl.py:50-79 and the "in limbo" note in
lib/fossa/control/rabbit_mq/message_exchange.py:121-140). Structured
Streaming gives the stronger contract for free when the sink is idempotent
per epoch: offsets are checkpointed, and a replayed micro-batch rewrites
the same epoch partition instead of duplicating rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def idempotent_parquet_sink(
    stream: DataFrame, out_dir: str, checkpoint_dir: str
) -> DataStreamWriter:
    """foreachBatch → overwrite-by-epoch parquet: re-running a failed epoch
    overwrites its own directory (idempotent), and the checkpoint ensures
    each source offset range maps to exactly one epoch id. Start with
    ``.trigger(availableNow=True).start()`` for batch-drain semantics."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        stream.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
    )
