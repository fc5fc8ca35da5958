"""fossa_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of the
reference execution engine (Aye-Aye-Dev/Fossa, surveyed in /root/repo/SURVEY.md):
run named dataflow models over tabular connectors, fan partitioned work out
across a cluster, track job lifecycle — re-expressed on Spark's DataFrame/SQL
runtime so that Catalyst/Tungsten/AQE do the planning, shuffling, and retries
the reference hand-rolled over RabbitMQ + multiprocessing.

Layout:
  session    — SparkSession builder tuned for the engine
  connect    — engine-URL connectors + resolver-context templating
  model      — Model / PartitionedModel base classes (ref: lib/fossa/control/process.py)
  engine     — job registry, admission, submit/status API (ref: lib/fossa/control/governor.py)
  queries    — the declared operator inventory (SURVEY.md §2c) as named queries
  llm        — dedup / similarity / text-analysis / multimodal operators
  streaming  — Structured Streaming wrappers (windows, watermark, stateful)
"""

from fossa_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
