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
    V.commit(tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u")]))
    V.commit(tbl, _mk(spark, [(2, "B", "u"), (3, "c", "u")]))
    V.commit(tbl, _mk(spark, [(1, None, "d"), (4, "d", "u")]))
    assert V.current_version(tbl) == 3
    assert _rows(V.read_as_of(spark, tbl, 1)) == {(1, "a"), (2, "b")}
    assert _rows(V.read_as_of(spark, tbl, 2)) == {(1, "a"), (2, "B"), (3, "c")}
    assert _rows(V.read_as_of(spark, tbl)) == {(2, "B"), (3, "c"), (4, "d")}
    # _op / v plumbing columns never leak into the read schema
    assert set(V.read_as_of(spark, tbl).columns) == {"k", "payload"}


def test_optimistic_concurrency_and_schema_guard(spark, tbl):
    V.commit(tbl, _mk(spark, [(1, "a", "u")]), expect_version=0)
    with pytest.raises(RuntimeError, match="version conflict"):
        V.commit(tbl, _mk(spark, [(2, "b", "u")]), expect_version=0)
    with pytest.raises(ValueError, match="_op"):
        V.commit(tbl, _mk(spark, [(2, "b", "u")]).drop("_op"))
    drifted = spark.createDataFrame([(2, 7, "u")], "k long, other long, _op string")
    with pytest.raises(ValueError, match="schema drift"):
        V.commit(tbl, drifted)


def test_checkpoint_vacuum_invariance_and_retention(spark, tbl):
    V.commit(tbl, _mk(spark, [(i, f"p{i}", "u") for i in range(20)]))
    V.commit(tbl, _mk(
        spark, [(i, f"q{i}", "u") for i in range(0, 20, 2)]
        + [(i, None, "d") for i in range(1, 20, 4)]))
    V.commit(tbl, _mk(spark, [(100, "new", "u")]))
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
    V.commit(tbl, _mk(spark, [(101, "post", "u")]), expect_version=3)
    assert (101, "post") in _rows(V.read_as_of(spark, tbl))


def test_crashed_commit_orphan_is_replaced(spark, tbl):
    V.commit(tbl, _mk(spark, [(1, "a", "u")]))
    # simulate a writer that crashed after writing files but BEFORE the
    # meta swap: the orphan v=2 directory logically does not exist
    orphan = os.path.join(tbl, "delta", "v=2")
    _mk(spark, [(9, "garbage", "u")]).write.parquet(orphan)
    assert V.current_version(tbl) == 1
    V.commit(tbl, _mk(spark, [(2, "b", "u")]), expect_version=1)
    assert _rows(V.read_as_of(spark, tbl)) == {(1, "a"), (2, "b")}


def test_read_as_of_out_of_range(spark, tbl):
    with pytest.raises(ValueError, match="out of range"):
        V.read_as_of(spark, tbl, 1)
    V.commit(tbl, _mk(spark, [(1, "a", "u")]))
    with pytest.raises(ValueError, match="out of range"):
        V.read_as_of(spark, tbl, 2)


def test_change_feed_nets_and_preimages(spark, tbl):
    V.commit(tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u")]))
    V.commit(tbl, _mk(spark, [
        (1, "A", "u"),          # update
        (3, "c", "u"),          # insert...
        (2, None, "d"),         # delete
        (9, None, "d"),         # no-op tombstone (9 never existed)
    ]))
    V.commit(tbl, _mk(spark, [(3, None, "d"), (4, "d", "u")]))
    feed = {(r.change, r.k, r.payload)
            for r in V.change_feed(spark, tbl, 1, 3).collect()}
    assert feed == {
        ("update", 1, "A"),
        ("delete", 2, "b"),     # pre-image payload
        ("insert", 4, "d"),
        # key 3: inserted at v2 AND deleted at v3 -> nets to nothing
        # (absent at from_v, absent at to_v); key 9's tombstone drops
    }
    # replaying the feed over as-of(1) reproduces as-of(3)
    asof1, asof3 = _rows(V.read_as_of(spark, tbl, 1)), _rows(
        V.read_as_of(spark, tbl, 3))
    replay = {kv for kv in asof1
              if kv[0] not in {k for _, k, _p in feed}}
    replay |= {(k, p) for c, k, p in feed if c in ("insert", "update")}
    assert replay == asof3


def test_change_feed_range_and_retention_guards(spark, tbl):
    V.commit(tbl, _mk(spark, [(1, "a", "u")]))
    V.commit(tbl, _mk(spark, [(2, "b", "u")]))
    with pytest.raises(ValueError, match="from_v < to_v"):
        V.change_feed(spark, tbl, 2, 2)
    with pytest.raises(ValueError, match="from_v < to_v"):
        V.change_feed(spark, tbl, 0, 3)
    V.checkpoint(spark, tbl, 2)
    V.commit(tbl, _mk(spark, [(3, "c", "u")]))
    V.vacuum(tbl)
    with pytest.raises(ValueError, match="vacuumed"):
        V.change_feed(spark, tbl, 1, 3)
    assert {(r.change, r.k) for r in V.change_feed(spark, tbl, 2, 3).collect()} \
        == {("insert", 3)}


def test_change_feed_from_zero_is_all_inserts(spark, tbl):
    V.commit(tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u")]))
    V.commit(tbl, _mk(spark, [(2, None, "d"), (3, "c", "u")]))
    feed = {(r.change, r.k, r.payload)
            for r in V.change_feed(spark, tbl, 0, 2).collect()}
    assert feed == {("insert", 1, "a"), ("insert", 3, "c")}


def test_tagged_commit_is_idempotent(spark, tbl):
    v1 = V.commit(tbl, _mk(spark, [(1, "a", "u")]), tag="b0")
    v_again = V.commit(tbl, _mk(spark, [(1, "SHOULD NOT LAND", "u")]),
                       tag="b0")
    assert v1 == v_again == 1
    assert V.current_version(tbl) == 1
    assert _rows(V.read_as_of(spark, tbl)) == {(1, "a")}
    deltas = sorted(os.listdir(os.path.join(tbl, "delta")))
    assert deltas == ["v=1"]
    # a NEW tag still advances the chain
    assert V.commit(tbl, _mk(spark, [(2, "b", "u")]), tag="b1") == 2


def test_streaming_cdc_apply_restart_resume(spark, tmp_path):
    """The CDC apply loop survives a REAL stop/restart: run 1 commits
    the day-1 change file against a persistent checkpointLocation and
    stops; day 2's file arrives; run 2 restarts from the same
    checkpoint and must commit ONLY the new batch — the final table
    equals what one uninterrupted run produces, and the version chain
    has exactly base + two batch commits."""
    from fossa_spark.queries.streaming_queries import _feed_writer

    tbl = str(tmp_path / "tbl")
    V.init_table(tbl, key=["k"])
    V.commit(tbl, _mk(spark, [(i, f"base{i}", "u") for i in range(10)]))

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    ckpt = str(tmp_path / "ckpt")
    w = _feed_writer(feed)

    def _apply(batch_df, batch_id):
        V.commit(tbl, batch_df, tag=f"b{batch_id}")

    def _run_once():
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
            .writeStream.foreachBatch(_apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    w(_mk(spark, [(100, "day1", "u"), (0, None, "d")]), 1)
    _run_once()
    assert V.current_version(tbl) == 2
    mid = _rows(V.read_as_of(spark, tbl))
    assert (100, "day1") in mid and not any(k == 0 for k, _ in mid)

    w(_mk(spark, [(101, "day2", "u"), (100, "day1x", "u")]), 2)
    _run_once()
    assert V.current_version(tbl) == 3  # exactly ONE new commit
    final = _rows(V.read_as_of(spark, tbl))
    assert (101, "day2") in final and (100, "day1x") in final
    assert (100, "day1") not in final
    assert len(final) == 9 + 2  # 10 base - 1 delete + 2 inserts


def test_commit_validates_contract(spark, tbl):
    dup = _mk(spark, [(1, "a", "u"), (1, "b", "u")])
    with pytest.raises(ValueError, match="duplicated keys"):
        V.commit(tbl, dup)
    bad_op = _mk(spark, [(1, "a", "upsert")])
    with pytest.raises(ValueError, match="op not in"):
        V.commit(tbl, bad_op)
    assert V.current_version(tbl) == 0  # nothing landed
    # producers that guarantee the contract can skip the action
    V.commit(tbl, _mk(spark, [(1, "a", "u")]), validate=False)
    assert V.current_version(tbl) == 1


def test_vacuum_survives_crashed_checkpoint_tmp(spark, tbl):
    V.commit(tbl, _mk(spark, [(1, "a", "u")]), tag="b0")
    V.commit(tbl, _mk(spark, [(2, "b", "u")]), tag="b1")
    V.checkpoint(spark, tbl, 2)
    # simulate a checkpoint that died before its rename
    orphan = os.path.join(tbl, "ckpt", "v=9._tmp")
    os.makedirs(orphan)
    V.vacuum(tbl)  # must not raise on the ._tmp entry — and sweeps it
    assert not os.path.exists(orphan)
    # retired tags pruned (both commits are at/below the horizon),
    # so meta stays bounded for long-lived streaming tables
    assert V._read_meta(tbl)["tags"] == {}
    # a from-zero feed over vacuumed history must fail loudly
    V.commit(tbl, _mk(spark, [(3, "c", "u")]))
    with pytest.raises(ValueError, match="vacuumed"):
        V.change_feed(spark, tbl, 0, 3)
    # as-of-0 reads keep the table's REAL schema for union/join safety
    z = V.read_as_of(spark, tbl, 0)
    assert dict(z.dtypes) == {"k": "bigint", "payload": "string"}
    assert z.count() == 0


def test_versioned_engine_url_connector(spark, tmp_path):
    """versioned:// through the ayeaye-parity Connect surface: first
    write declares the key and commits v1; later writes commit deltas
    (bare rows default to upserts); reads time-travel via the #v=
    fragment; a #v= pin on a write is rejected; tagged writes are
    idempotent."""
    from fossa_spark.connect import AccessMode, Connect

    url = f"versioned://{tmp_path}/tbl"
    w = Connect(engine_url=url, access=AccessMode.READWRITE,
                options={"key": "k"})
    with pytest.raises(ValueError, match="declare the key"):
        Connect(engine_url=url, access=AccessMode.READWRITE).write(
            spark.createDataFrame([(1, "a")], "k long, payload string"))
    w.write(spark.createDataFrame([(1, "a"), (2, "b")],
                                  "k long, payload string"))
    w.write(_mk(spark, [(2, "B", "u"), (1, None, "d")]))
    r = Connect(engine_url=url)
    assert _rows(r.read(spark)) == {(2, "B")}
    assert _rows(Connect(engine_url=url + "#v=1").read(spark)) == {
        (1, "a"), (2, "b")}
    with pytest.raises(ValueError, match="read-side"):
        Connect(engine_url=url + "#v=1", access=AccessMode.READWRITE).write(
            _mk(spark, [(3, "c", "u")]))
    tagged = Connect(engine_url=url, access=AccessMode.READWRITE,
                     options={"tag": "day3"})
    tagged.write(_mk(spark, [(3, "c", "u")]))
    tagged.write(_mk(spark, [(3, "SHOULD NOT LAND", "u")]))  # replay
    assert _rows(r.read(spark)) == {(2, "B"), (3, "c")}
    assert r.datasource_exists


def test_change_feed_with_preimage(spark, tbl):
    V.commit(tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u")]))
    V.commit(tbl, _mk(spark, [(1, "A", "u"), (2, None, "d"), (3, "c", "u")]))
    feed = {(r.change, r.k, r.payload, r.old_payload)
            for r in V.change_feed(spark, tbl, 1, 2,
                                   with_preimage=True).collect()}
    assert feed == {
        ("update", 1, "A", "a"),   # both images for retraction
        ("delete", 2, "b", "b"),
        ("insert", 3, "c", None),
    }


def test_versioned_connector_guards_and_templated_tag(spark, tmp_path):
    """Review r10 guards: foreign write modes and partition_by are
    rejected; re-init of an existing table refuses instead of resetting
    the chain; the commit tag resolves through the connector context so
    ONE declared Connect can vary it per batch; a declared schema is
    applied on reads like every other scheme."""
    from fossa_spark.connect import (AccessMode, Connect,
                                     connector_resolver)

    url = f"versioned://{tmp_path}/tbl"
    w = Connect(engine_url=url, access=AccessMode.READWRITE,
                options={"key": "k"})
    df1 = spark.createDataFrame([(1, "a")], "k long, payload string")
    with pytest.raises(ValueError, match="append-only"):
        w.write(df1, mode="error")
    with pytest.raises(ValueError, match="partition_by"):
        w.write(df1, partition_by=["payload"])
    w.write(df1)
    with pytest.raises(FileExistsError):
        V.init_table(str(tmp_path / "tbl"), key=["other"])

    tagged = Connect(engine_url=url, access=AccessMode.READWRITE,
                     options={"tag": "batch-{bid}"})
    with connector_resolver.context(bid="1"):
        tagged.write(_mk(spark, [(2, "b", "u")]))
        tagged.write(_mk(spark, [(2, "REPLAY", "u")]))  # same tag: dropped
    with connector_resolver.context(bid="2"):
        tagged.write(_mk(spark, [(3, "c", "u")]))       # new tag: lands
    r = Connect(engine_url=url, schema="k long, payload string")
    assert _rows(r.read(spark)) == {(1, "a"), (2, "b"), (3, "c")}
    narrow = Connect(engine_url=url, schema="k long")
    assert narrow.read(spark).columns == ["k"]
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        Connect(engine_url=url, schema="nope long").read(spark).collect()


def test_change_feed_preimage_collision_guard(spark, tmp_path):
    path = str(tmp_path / "t2")
    V.init_table(path, key=["k"])
    df = spark.createDataFrame(
        [(1, "a", "a0", "u")],
        "k long, payload string, old_payload string, _op string")
    V.commit(path, df)
    V.commit(path, spark.createDataFrame(
        [(1, "b", "b0", "u")],
        "k long, payload string, old_payload string, _op string"))
    with pytest.raises(ValueError, match="shadow"):
        V.change_feed(spark, path, 1, 2, with_preimage=True)
    # without pre-images the feed still works
    assert V.change_feed(spark, path, 1, 2).count() == 1


def test_restore_rolls_back_as_forward_commit(spark, tbl):
    V.commit(tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u")]))       # v1
    V.commit(tbl, _mk(spark, [(2, "B", "u"), (3, "c", "u")]))       # v2
    V.commit(tbl, _mk(spark, [(1, None, "d"), (4, "d", "u")]))      # v3
    v = V.restore(spark, tbl, 1)
    assert v == 4
    # the restored head equals the v1 state exactly
    assert _rows(V.read_as_of(spark, tbl)) == {(1, "a"), (2, "b")}
    # history is intact: the botched versions stay readable behind it
    assert _rows(V.read_as_of(spark, tbl, 3)) == {(2, "B"), (3, "c"), (4, "d")}
    # the restore commit is O(changes): exactly the 4 net-changed keys
    delta = spark.read.parquet(os.path.join(tbl, "delta", "v=4"))
    assert delta.count() == 4
    ops = {(r.k, r._op) for r in delta.collect()}
    assert (3, "d") in ops and (4, "d") in ops     # net inserts -> deletes
    assert (1, "u") in ops and (2, "u") in ops     # delete/update -> re-upsert


def test_restore_is_noop_when_state_already_matches(spark, tbl):
    V.commit(tbl, _mk(spark, [(1, "a", "u")]))                      # v1
    V.commit(tbl, _mk(spark, [(2, "b", "u")]))                      # v2
    assert V.restore(spark, tbl, 1) == 3
    # restoring again to v1: head already equals v1 -> no new commit
    assert V.restore(spark, tbl, 1) == 3
    assert V.restore(spark, tbl, 3) == 3  # restore-to-current is a no-op
    assert _rows(V.read_as_of(spark, tbl)) == {(1, "a")}


def test_restore_refuses_vacuumed_target(spark, tbl):
    V.commit(tbl, _mk(spark, [(1, "a", "u")]))                      # v1
    V.commit(tbl, _mk(spark, [(2, "b", "u")]))                      # v2
    V.checkpoint(spark, tbl, 2)
    V.vacuum(tbl)
    with pytest.raises(ValueError, match="vacuumed"):
        V.restore(spark, tbl, 1)


def test_additive_schema_evolution_null_backfill(spark, tbl):
    """Round 11 (VERDICT r10 item 5): a commit may ADD columns; earlier
    versions NULL-backfill them (the Delta/Iceberg additive rule), a
    checkpoint written before the evolution still resolves, and
    non-additive drift stays loudly refused."""
    V.commit(tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u")]))
    V.checkpoint(spark, tbl, 1)  # pre-evolution checkpoint
    evolved = spark.createDataFrame(
        [(2, "B", 7, "u"), (3, "c", 9, "u")],
        "k long, payload string, score long, _op string",
    )
    V.commit(tbl, evolved)
    cur = V.read_as_of(spark, tbl)  # folds ckpt(1) + delta v2
    assert set(cur.columns) == {"k", "payload", "score"}
    assert {(r.k, r.payload, r.score) for r in cur.collect()} == {
        (1, "a", None), (2, "B", 7), (3, "c", 9),
    }
    # time travel BEFORE the evolution reads under the union schema
    v1 = V.read_as_of(spark, tbl, 1)
    assert {(r.k, r.payload, r.score) for r in v1.collect()} == {
        (1, "a", None), (2, "b", None),
    }
    # post-evolution commits must carry the new column...
    with pytest.raises(ValueError, match="missing table column"):
        V.commit(tbl, _mk(spark, [(5, "e", "u")]))
    # ...and may not retype an existing one
    retyped = spark.createDataFrame(
        [(5, "e", "x", "u")], "k long, payload string, score string, _op string"
    )
    with pytest.raises(ValueError, match="type change"):
        V.commit(tbl, retyped)


def test_change_feed_across_evolution_boundary(spark, tbl):
    """CDF spanning an additive evolution: pre-images of the new column
    are NULL for rows that predate it; deletes report the pre-image
    payload under the union schema."""
    V.commit(tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u"), (4, "z", "u")]))
    evolved = spark.createDataFrame(
        [(2, "B", 7, "u"), (3, "c", 9, "u"), (4, None, None, "d")],
        "k long, payload string, score long, _op string",
    )
    V.commit(tbl, evolved)
    feed = V.change_feed(spark, tbl, 1, 2, with_preimage=True)
    rows = {
        (r.change, r.k, r.payload, r.score, r.old_payload, r.old_score)
        for r in feed.collect()
    }
    assert rows == {
        ("update", 2, "B", 7, "b", None),
        ("insert", 3, "c", 9, None, None),
        ("delete", 4, "z", None, "z", None),
    }
    # restore back across the boundary: v3 = inverse commit; as-of(3)
    # equals the v1 state NULL-extended with the evolved column
    v_new = V.restore(spark, tbl, 1)
    assert v_new == 3
    assert {
        (r.k, r.payload, r.score)
        for r in V.read_as_of(spark, tbl, 3).collect()
    } == {(1, "a", None), (2, "b", None), (4, "z", None)}


def test_merge_into_resolves_ops(spark, tbl):
    """MERGE INTO (round 11): matched -> update, unmatched -> insert,
    matched + delete_condition -> tombstone, unmatched + delete
    condition -> dropped (no phantom delete in the change feed)."""
    V.commit(tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u")]))
    src = spark.createDataFrame(
        [(1, "A"), (3, "c"), (2, "DEL"), (9, "DEL")],
        "k long, payload string",
    )
    v = V.merge_into(
        spark, tbl, src, delete_condition=F.col("payload") == "DEL"
    )
    assert v == 2
    assert _rows(V.read_as_of(spark, tbl)) == {(1, "A"), (3, "c")}
    # no phantom delete for the unmatched key 9
    feed = V.change_feed(spark, tbl, 1, 2)
    assert {(r.change, r.k) for r in feed.collect()} == {
        ("update", 1), ("insert", 3), ("delete", 2),
    }
    # a source carrying _op is refused — MERGE resolves ops itself
    with pytest.raises(ValueError, match="resolves ops itself"):
        V.merge_into(spark, tbl, _mk(spark, [(5, "e", "u")]))
    # idempotent replay via tag
    src2 = spark.createDataFrame([(4, "d")], "k long, payload string")
    v2 = V.merge_into(spark, tbl, src2, tag="batch-42")
    assert V.merge_into(spark, tbl, src2, tag="batch-42") == v2
    assert V.current_version(tbl) == v2


def test_clone_table_is_independent_fork(spark, tbl, tmp_path):
    """SHALLOW CLONE (round 11): zero-copy fork — identical reads at
    clone time, then fully independent evolution; vacuuming the clone
    never destroys source data (shared inodes survive until the last
    link drops)."""
    V.commit(tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u")]))
    V.commit(tbl, _mk(spark, [(2, "B", "u"), (3, "c", "u")]))
    V.checkpoint(spark, tbl, 1)
    dst = str(tmp_path / "fork")
    assert V.clone_table(tbl, dst) == 2
    assert _rows(V.read_as_of(spark, dst)) == _rows(V.read_as_of(spark, tbl))
    assert _rows(V.read_as_of(spark, dst, 1)) == {(1, "a"), (2, "b")}
    # diverge: the clone advances, the source does not
    V.commit(dst, _mk(spark, [(1, None, "d"), (9, "z", "u")]))
    assert V.current_version(dst) == 3
    assert V.current_version(tbl) == 2
    assert _rows(V.read_as_of(spark, dst)) == {(2, "B"), (3, "c"), (9, "z")}
    assert _rows(V.read_as_of(spark, tbl)) == {(1, "a"), (2, "B"), (3, "c")}
    # idempotence tags travel with the fork
    V.commit(tbl, _mk(spark, [(7, "t", "u")]), tag="b7")
    dst2 = str(tmp_path / "fork2")
    V.clone_table(tbl, dst2)
    assert V.commit(dst2, _mk(spark, [(7, "t", "u")]), tag="b7") == 3
    assert V.current_version(dst2) == 3  # replay deduped, no new commit
    # vacuum on the clone leaves the source readable
    V.checkpoint(spark, dst, 3)
    V.vacuum(dst)
    assert _rows(V.read_as_of(spark, tbl, 1)) == {(1, "a"), (2, "b")}
    # cloning onto an existing table refuses
    with pytest.raises(FileExistsError):
        V.clone_table(tbl, dst)


def test_clone_table_crash_resume_and_meta_last(spark, tbl, tmp_path):
    """Meta is the clone's commit point: a crash mid-link leaves only an
    unreferenced tree (no _meta.json), and re-running the clone
    completes over the orphan."""
    import os

    V.commit(tbl, _mk(spark, [(1, "a", "u"), (2, "b", "u")]))
    dst = str(tmp_path / "crashed")
    # simulate the crash: files linked, meta never written
    os.makedirs(os.path.join(dst, "delta", "v=1"))
    src_dir = os.path.join(tbl, "delta", "v=1")
    for fn in os.listdir(src_dir):
        os.link(os.path.join(src_dir, fn), os.path.join(dst, "delta", "v=1", fn))
    assert not os.path.exists(os.path.join(dst, "_meta.json"))
    assert V.clone_table(tbl, dst) == 1  # resumes over the orphan links
    assert _rows(V.read_as_of(spark, dst)) == {(1, "a"), (2, "b")}


def test_fold_matches_dict_model_random_chains(spark, tmp_path):
    """Model-based check of the latest-wins fold: random commit chains
    (upserts/tombstones over a small key domain, including delete-then-
    reinsert, re-deletes of absent keys, and payload rewrites) replayed
    against a plain dict; read_as_of must equal the model AT EVERY
    VERSION. Seeded stdlib randomness — deterministic, no hypothesis
    Spark-fixture interplay."""
    import random

    rng = random.Random(0xF055A)
    for case in range(6):
        path = str(tmp_path / f"t{case}")
        V.init_table(path, key=["k"])
        model: dict[int, str] = {}
        states = [dict(model)]
        n_commits = rng.randint(1, 4)
        for _ in range(n_commits):
            keys = rng.sample(range(8), rng.randint(1, 6))
            rows = []
            for kk in keys:
                if rng.random() < 0.3:
                    rows.append((kk, None, "d"))
                    model.pop(kk, None)
                else:
                    pay = f"p{rng.randint(0, 99)}"
                    rows.append((kk, pay, "u"))
                    model[kk] = pay
            V.commit(path, _mk(spark, rows))
            states.append(dict(model))
        for v, expect in enumerate(states):
            got = {
                r.k: r.payload for r in V.read_as_of(spark, path, v).collect()
            }
            assert got == expect, (case, v, got, expect)


def test_merge_clone_restore_vacuum_match_dict_model(spark, tmp_path):
    """Model-based check of the round-11 lakehouse surface (VERDICT r11
    item 7, extending the fa68daf fold check): random interleavings of
    merge_into / plain commit / restore / checkpoint+vacuum / shallow
    clone over a small key domain, replayed against a plain dict.
    Invariants at every step:

      * read_as_of equals the model at EVERY still-retained version;
      * MERGE resolves ops per the contract ('DEL' payload + matched →
        tombstone, unmatched DEL → dropped no-op, else upsert);
      * restore rewinds the model to the target state as a NEW version
        (or no-ops when already equal);
      * vacuum moves the retention horizon without disturbing any
        retained read;
      * clones are frozen forks — later source commits never leak in,
        and a commit to a clone never leaks back.

    Seeded stdlib randomness (the fold test's convention — no
    hypothesis/Spark fixture interplay)."""
    import random

    rng = random.Random(0xC10E12)
    for case in range(4):
        path = str(tmp_path / f"m{case}")
        V.init_table(path, key=["k"])
        # seed commit: establishes the column set for merge's resolver
        V.commit(path, _mk(spark, [(0, "seed", "u")]))
        model = {0: "seed"}
        states = [dict(), dict(model)]
        horizon = 0
        clones: list[tuple[str, dict]] = []
        for step in range(rng.randint(5, 8)):
            roll = rng.random()
            if roll < 0.40:  # MERGE INTO
                keys = rng.sample(range(8), rng.randint(1, 5))
                rows = []
                for kk in keys:
                    pay = "DEL" if rng.random() < 0.3 else f"p{rng.randint(0, 99)}"
                    rows.append((kk, pay))
                src = spark.createDataFrame(rows, "k long, payload string")
                V.merge_into(
                    spark, path, src,
                    delete_condition=F.col("payload") == "DEL",
                )
                for kk, pay in rows:
                    if pay == "DEL":
                        model.pop(kk, None)
                    else:
                        model[kk] = pay
                states.append(dict(model))
            elif roll < 0.60:  # plain commit (ops pre-resolved)
                keys = rng.sample(range(8), rng.randint(1, 4))
                rows = []
                for kk in keys:
                    if rng.random() < 0.3:
                        rows.append((kk, None, "d"))
                        model.pop(kk, None)
                    else:
                        pay = f"c{rng.randint(0, 99)}"
                        rows.append((kk, pay, "u"))
                        model[kk] = pay
                V.commit(path, _mk(spark, rows))
                states.append(dict(model))
            elif roll < 0.80:  # RESTORE to a retained version
                tv = rng.randrange(horizon, len(states))
                ret = V.restore(spark, path, tv)
                if model != states[tv]:
                    model = dict(states[tv])
                    states.append(dict(model))
                    assert ret == len(states) - 1
                else:  # no-op restore writes no commit
                    assert ret == len(states) - 1
            else:  # checkpoint current + vacuum older history
                V.checkpoint(spark, path)
                V.vacuum(path)
                horizon = len(states) - 1
            if rng.random() < 0.3:  # fork a frozen clone
                cpath = str(tmp_path / f"m{case}_clone{len(clones)}")
                V.clone_table(path, cpath)
                clones.append((cpath, dict(model)))
        for v in range(horizon, len(states)):
            got = {
                r.k: r.payload for r in V.read_as_of(spark, path, v).collect()
            }
            assert got == states[v], (case, v, got, states[v])
        # clone independence, both directions
        for cpath, snap in clones:
            got = {r.k: r.payload for r in V.read_as_of(spark, cpath).collect()}
            assert got == snap, (case, cpath, got, snap)
        if clones:
            cpath, _snap = clones[0]
            V.commit(cpath, _mk(spark, [(7, "cloneonly", "u")]))
            src_now = {
                r.k: r.payload for r in V.read_as_of(spark, path).collect()
            }
            assert src_now == model, "clone write leaked into source"
