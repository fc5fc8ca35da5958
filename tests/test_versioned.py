"""Behavioral tests for the versioned dataset (fossa_spark/versioned.py):
commit chain semantics, optimistic concurrency, checkpoint/vacuum
invariance, and crash-orphan handling."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fossa_spark import versioned as V

SCHEMA = "k long, payload string, _op string"


def _rows(df):
    return {(r.k, r.payload) for r in df.collect()}


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def tbl(tmp_path):
    path = str(tmp_path / "tbl")
    V.init_table(path, key=["k"])
    return path


def test_commit_fold_upsert_delete_chain(spark, tbl):
    V.commit(spark, tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u")]))
    V.commit(spark, tbl, _mk(spark, [(2, "B", "u"), (3, "c", "u")]))
    V.commit(spark, tbl, _mk(spark, [(1, None, "d"), (4, "d", "u")]))
    assert V.current_version(tbl) == 3
    assert _rows(V.read_as_of(spark, tbl, 1)) == {(1, "a"), (2, "b")}
    assert _rows(V.read_as_of(spark, tbl, 2)) == {(1, "a"), (2, "B"), (3, "c")}
    assert _rows(V.read_as_of(spark, tbl)) == {(2, "B"), (3, "c"), (4, "d")}
    # _op / v plumbing columns never leak into the read schema
    assert set(V.read_as_of(spark, tbl).columns) == {"k", "payload"}


def test_optimistic_concurrency_and_schema_guard(spark, tbl):
    V.commit(spark, tbl, _mk(spark, [(1, "a", "u")]), expect_version=0)
    with pytest.raises(RuntimeError, match="version conflict"):
        V.commit(spark, tbl, _mk(spark, [(2, "b", "u")]), expect_version=0)
    with pytest.raises(ValueError, match="_op"):
        V.commit(spark, tbl, _mk(spark, [(2, "b", "u")]).drop("_op"))
    drifted = spark.createDataFrame([(2, 7, "u")], "k long, other long, _op string")
    with pytest.raises(ValueError, match="schema drift"):
        V.commit(spark, tbl, drifted)


def test_checkpoint_vacuum_invariance_and_retention(spark, tbl):
    V.commit(spark, tbl, _mk(spark, [(i, f"p{i}", "u") for i in range(20)]))
    V.commit(spark, tbl, _mk(
        spark, [(i, f"q{i}", "u") for i in range(0, 20, 2)]
        + [(i, None, "d") for i in range(1, 20, 4)]))
    V.commit(spark, tbl, _mk(spark, [(100, "new", "u")]))
    before2 = _rows(V.read_as_of(spark, tbl, 2))
    before3 = _rows(V.read_as_of(spark, tbl, 3))

    V.checkpoint(spark, tbl, 2)
    assert _rows(V.read_as_of(spark, tbl, 2)) == before2  # ckpt path
    assert _rows(V.read_as_of(spark, tbl, 3)) == before3  # ckpt + delta

    dirs_before, dirs_after = V.vacuum(tbl)
    assert dirs_after < dirs_before
    # folded deltas physically gone, surviving delta still there
    deltas = sorted(os.listdir(os.path.join(tbl, "delta")))
    assert deltas == ["v=3"]
    assert _rows(V.read_as_of(spark, tbl, 2)) == before2
    assert _rows(V.read_as_of(spark, tbl, 3)) == before3
    with pytest.raises(ValueError, match="vacuumed"):
        V.read_as_of(spark, tbl, 1)
    hist = V.history(tbl)
    assert [h["readable"] for h in hist] == [False, True, True]
    assert [h["checkpointed"] for h in hist] == [False, True, False]
    # the chain keeps accepting commits after vacuum
    V.commit(spark, tbl, _mk(spark, [(101, "post", "u")]), expect_version=3)
    assert (101, "post") in _rows(V.read_as_of(spark, tbl))


def test_crashed_commit_orphan_is_replaced(spark, tbl):
    V.commit(spark, tbl, _mk(spark, [(1, "a", "u")]))
    # simulate a writer that crashed after writing files but BEFORE the
    # meta swap: the orphan v=2 directory logically does not exist
    orphan = os.path.join(tbl, "delta", "v=2")
    _mk(spark, [(9, "garbage", "u")]).write.parquet(orphan)
    assert V.current_version(tbl) == 1
    V.commit(spark, tbl, _mk(spark, [(2, "b", "u")]), expect_version=1)
    assert _rows(V.read_as_of(spark, tbl)) == {(1, "a"), (2, "b")}


def test_read_as_of_out_of_range(spark, tbl):
    with pytest.raises(ValueError, match="out of range"):
        V.read_as_of(spark, tbl, 1)
    V.commit(spark, tbl, _mk(spark, [(1, "a", "u")]))
    with pytest.raises(ValueError, match="out of range"):
        V.read_as_of(spark, tbl, 2)
