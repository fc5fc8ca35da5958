"""Behavioral tests for the event-analytics operators (fossa_spark/events.py)
on crafted micro-fixtures where the expected funnel/cohort/transition results
are hand-computable. Oracle parity at fixture scale is covered by
tests/test_oracle_parity.py via the q_funnel/q_cohort_retention/
q_event_transitions registry entries.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fossa_spark import events as E


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, h), u, t) for i, (u, d, h, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_funnel_requires_strict_order(spark):
    e = _ev(spark, [
        # u1 completes all three in order
        (1, 1, 0, "view"), (1, 1, 1, "click"), (1, 1, 2, "purchase"),
        # u2: click BEFORE its only view — stage stops at view
        (2, 1, 1, "click"), (2, 1, 2, "view"),
        # u3: purchase exactly never; view+click only
        (3, 1, 0, "view"), (3, 1, 1, "click"),
        # u4: purchase before anything else, then view — stage 1
        (4, 1, 0, "purchase"), (4, 1, 1, "view"),
    ])
    got = {
        r["user_id"]: r["funnel_stage"]
        for r in E.funnel(e, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: 3, 2: 1, 3: 2, 4: 1}


def test_funnel_uses_earliest_stage_time(spark):
    # u1 has two views; the click is after the FIRST view only relative to
    # the second — greedy earliest-match must still count it
    e = _ev(spark, [
        (1, 1, 0, "view"), (1, 2, 0, "view"), (1, 1, 12, "click"),
    ])
    row = E.funnel(e, ["view", "click"]).collect()[0]
    assert row["funnel_stage"] == 2


def test_cohort_retention_offsets(spark):
    # u1 first active week 0, returns week 2; u2 only week 1
    e = _ev(spark, [
        (1, 4, 0, "view"),    # 2024-01-04 → week A
        (1, 18, 0, "view"),   # two weeks later
        (2, 11, 0, "view"),   # week A+1
    ])
    rows = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in E.cohort_retention(e).collect()
    }
    weeks = sorted({c for c, _ in rows})
    a = weeks[0]
    assert rows == {(a, 0): 1, (a, 2): 1, (a + 1, 0): 1}


def test_transitions_counts_and_session_start(spark):
    e = _ev(spark, [
        (1, 1, 0, "view"), (1, 1, 1, "click"), (1, 1, 2, "view"),
        (2, 1, 0, "view"), (2, 1, 1, "click"),
    ])
    got = {
        (r["prev_type"], r["event_type"]): r["n"]
        for r in E.transitions(e).collect()
    }
    assert got == {
        ("∅", "view"): 2,
        ("view", "click"): 2,
        ("click", "view"): 1,
    }


def test_funnel_stage_filter_pushed_to_scan(spark, tmp_path):
    """Each funnel stage scans only its event type — the filter must reach
    the parquet reader (PushedFilters), not run post-scan."""
    from fossa_spark.plans import audit

    p = str(tmp_path / "ev.parquet")
    _ev(spark, [(1, 1, 0, "view"), (1, 1, 1, "click")]).write.parquet(p)
    e = spark.read.parquet(p)
    a = audit(E.funnel(e, ["view", "click"]))
    assert any("event_type" in f for f in a.pushed_filters), a.pushed_filters


def test_sessionize_and_scd2_edges(spark):
    from fossa_spark import events as E

    df = spark.createDataFrame(
        [
            # user 1: two events 10s apart (one session), then one 2h later
            (1, 1, "a", "2024-01-01 10:00:00"),
            (2, 1, "a", "2024-01-01 10:00:10"),
            (3, 1, "b", "2024-01-01 12:00:10"),
            # user 2: single event
            (4, 2, "x", "2024-01-01 09:00:00"),
        ],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    sess = {(r.user_id, r.session_id): r for r in E.sessionize(df, 1800).collect()}
    assert sess[(1, 1)].n_events == 2 and sess[(1, 2)].n_events == 1
    assert sess[(2, 1)].n_events == 1 and sess[(2, 1)].duration_us == 0
    # scd2: consecutive 'a','a' collapse into one version; 'b' opens v2
    hist = {(r.user_id, r.version): r for r in E.scd2_history(df).collect()}
    assert hist[(1, 1)].event_type == "a" and hist[(1, 1)].is_current is False
    assert hist[(1, 2)].event_type == "b" and hist[(1, 2)].is_current is True
    assert (1, 3) not in hist
    assert hist[(2, 1)].is_current is True
