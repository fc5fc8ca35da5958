"""Shared pytest fixtures: one SparkSession per test session, DuckDB oracle
connection with the fixture tables pre-registered as views (mirrors the
driver harness), and the compare helper used by the parity tests.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from fossa_spark.queries._util import TABLES
from fossa_spark.session import get_spark

SF_DIR = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fossa_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(value):
    """Canonicalize a cell for order-insensitive comparison."""
    if value is None:
        return "␀"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return repr(value)  # exact: we engineered queries to be bit-identical
    return str(value)


def rows_canon(rows, colnames):
    """Sort columns by name, rows by value — the driver's hash shape."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def assert_parity(spark_df, oracle_con, sql, name=""):
    sdf = spark_df.toPandas()
    odf = oracle_con.sql(sql).fetchdf()
    assert sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns)), (
        f"{name}: column names differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    s_rows = rows_canon(sdf.itertuples(index=False, name=None), list(sdf.columns))
    o_rows = rows_canon(odf.itertuples(index=False, name=None), list(odf.columns))
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
