"""SparkSession construction for the engine.

One place to pin the configs that matter for correctness (UTC timestamps,
Arrow transfer) and for scale (AQE, shuffle-partition sizing, broadcast
threshold). Tests and the driver harness both come through here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[·] harness; on a real cluster the same keys
# are what you'd tune (shuffle partitions ≈ 2-3× total cores, AQE coalesces
# them back down at runtime).
_ENGINE_CONF: dict[str, str] = {
    # Correctness
    "spark.sql.session.timeZone": "UTC",
    # Scale: adaptive execution re-plans shuffles at runtime — coalesces
    # small partitions, splits skewed ones, flips SMJ→broadcast when a side
    # turns out small. Essential at 100 TB, free at sf0.01.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Python↔JVM transfer is Arrow-batched (pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dimension tables (region/nation/supplier/customer at test SF) broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Keep parquet scans splittable at ~128MB — the at-scale default.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.ui.enabled": "false",
    # The events fixture stores TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects; read as int64 ns and convert (µs-truncated) in load_events().
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
}


def get_spark(
    app_name: str = "fossa_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale you'd set this ≈ 2× total executor cores and let AQE coalesce.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_ENGINE_CONF)
    # Spark's 1g default heap is sized for a thin driver, but local[N] puts
    # EXECUTION in this JVM too: a long session (full pytest suite, bench)
    # accumulates localCheckpoint/persist blocks until sort spills OOM
    # (observed: heap OOM ~330 tests in). Only effective at JVM launch —
    # a session created elsewhere (the grading driver's) is untouched.
    conf.setdefault(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    )
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
