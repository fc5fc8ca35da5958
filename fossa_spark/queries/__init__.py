"""Declared query inventory (SURVEY.md §2c) — registry.

Each submodule exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, sql]`` (DuckDB-runnable ANSI SQL; omitted entries
get the driver's weaker rows-only check). This module merges them; the
driver contract file (/root/repo/__spark_entry__.py) re-exports the result.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "fossa_spark.queries.relational",
    "fossa_spark.queries.joins",
    "fossa_spark.queries.aggregates",
    "fossa_spark.queries.windows",
    "fossa_spark.queries.functions",
    "fossa_spark.queries.udfs",
    "fossa_spark.queries.io_queries",
    "fossa_spark.queries.streaming_queries",
    "fossa_spark.queries.llm_queries",
]

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for modname in _MODULES:
        try:
            mod = import_module(modname)
        except ModuleNotFoundError:
            continue  # family not built yet
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = import_module(modname)
        except ModuleNotFoundError:
            continue
        out.update(getattr(mod, "ORACLE", {}))
    return out
