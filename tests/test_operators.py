"""Custom-operator tests: general as-of join validated against
pandas.merge_asof (the semantics oracle), and the banded interval join
validated against the naive non-equi join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fossa_spark.operators import asof_join, interval_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    rng = np.random.RandomState(7)
    n_t, n_q = 300, 200
    trades = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B", "C"], n_t),
            "t_ts": rng.randint(0, 10_000, n_t).astype("int64"),
            "qty": rng.randint(1, 100, n_t).astype("int64"),
        }
    ).sort_values("t_ts").reset_index(drop=True)
    quotes = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B", "C"], n_q),
            "q_ts": rng.randint(0, 10_000, n_q).astype("int64"),
            "px": rng.randint(100, 200, n_q).astype("int64"),
        }
    ).sort_values("q_ts").reset_index(drop=True)
    # merge_asof requires unique-ish handling of ties; dedup exact ts per sym
    quotes = quotes.drop_duplicates(["sym", "q_ts"]).reset_index(drop=True)
    return (
        trades,
        quotes,
        spark.createDataFrame(trades),
        spark.createDataFrame(quotes),
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas(trades_quotes, direction):
    trades_pd, quotes_pd, trades, quotes = trades_quotes
    got = (
        asof_join(trades, quotes, on="sym", left_ts="t_ts", right_ts="q_ts",
                  direction=direction)
        .toPandas()
        .sort_values(["sym", "t_ts", "qty"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        trades_pd.sort_values("t_ts"),
        quotes_pd.sort_values("q_ts"),
        left_on="t_ts",
        right_on="q_ts",
        by="sym",
        direction=direction,
    ).sort_values(["sym", "t_ts", "qty"]).reset_index(drop=True)
    assert len(got) == len(want)
    for col_g, col_w in (("px", "px"), ("q_ts_right", "q_ts")):
        g = got[col_g].fillna(-1).astype("int64").tolist()
        w = want[col_w].fillna(-1).astype("int64").tolist()
        assert g == w, f"{direction}: {col_g} mismatch"


def test_interval_join_matches_naive(spark):
    rng = np.random.RandomState(11)
    a = pd.DataFrame(
        {
            "a_id": range(150),
            "a_lo": rng.randint(0, 1000, 150).astype("float64"),
        }
    )
    a["a_hi"] = a["a_lo"] + rng.randint(1, 60, 150)
    b = pd.DataFrame(
        {
            "b_id": range(120),
            "b_lo": rng.randint(0, 1000, 120).astype("float64"),
        }
    )
    b["b_hi"] = b["b_lo"] + rng.randint(1, 60, 120)
    A, B = spark.createDataFrame(a), spark.createDataFrame(b)
    banded = interval_join(A, B, "a_lo", "a_hi", "b_lo", "b_hi", bucket=32.0)
    naive = A.join(B, (F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi")))
    got = sorted((r.a_id, r.b_id) for r in banded.select("a_id", "b_id").collect())
    want = sorted((r.a_id, r.b_id) for r in naive.select("a_id", "b_id").collect())
    assert got == want  # exact multiset, not set — no fan-out dup, no collapse
    assert want  # non-trivial overlap set


def test_interval_join_preserves_duplicate_rows(spark):
    """True overlap-join semantics: a duplicated input row must produce
    duplicated output pairs (whole-row DISTINCT would collapse them), and
    canonical-bucket dedup must add no shuffle beyond the join's own two."""
    A = spark.createDataFrame(
        [(1, 0.0, 100.0), (1, 0.0, 100.0), (2, 50.0, 60.0)],
        "a_id long, a_lo double, a_hi double",
    )
    B = spark.createDataFrame([(7, 10.0, 55.0)], "b_id long, b_lo double, b_hi double")
    out = interval_join(A, B, "a_lo", "a_hi", "b_lo", "b_hi", bucket=8.0)
    pairs = sorted((r.a_id, r.b_id) for r in out.select("a_id", "b_id").collect())
    assert pairs == [(1, 7), (1, 7), (2, 7)]  # duplicate left row kept twice
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 2, f"dedup added a shuffle beyond the join's own:\n{plan}"


def test_salted_join_spreads_hot_key(spark):
    """The point of salting: a hot key's rows land on many reducers.
    Plain join on one hot key → all its rows in one shuffle partition;
    salted join → spread across ~salt partitions."""
    # hot key must be data-derived — a literal would constant-fold the
    # equi-join into a cartesian plan with no shuffle at all
    big = spark.range(20_000).select(
        (F.col("id") % 1 + 42).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(42, "hot")], "k long, d string")

    def partition_sizes(df):
        return [
            n for n in df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
            if n > 0
        ]

    from fossa_spark.operators import salted_join

    spark.conf.set("spark.sql.adaptive.enabled", "false")  # keep raw shuffle layout
    # force real shuffles: a broadcast of the (tiny) salted side would skip
    # the shuffle entirely — which is also why salting only matters when
    # the small side is too big to broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = big.join(dim, "k")
        salted = salted_join(big, dim, "k", salt=8)
        assert len(partition_sizes(plain)) == 1  # one reducer owns the hot key
        spread = partition_sizes(salted)
        assert len(spread) >= 4, f"salt failed to spread: {spread}"
        assert max(spread) < 20_000
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_apply_changes_merge_semantics(spark):
    """CDC merge contract: latest change per key wins; 'U' updates matched
    rows and inserts unmatched ones; 'D' removes the key (and is a no-op
    for absent keys); untouched rows pass through."""
    from pyspark.sql import functions as F

    from fossa_spark.operators import apply_changes

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            (1, "U", 1, "a1", 11.0),   # superseded by seq=2
            (1, "U", 2, "a2", 12.0),   # wins
            (2, "D", 1, None, None),   # delete
            (9, "U", 1, "new", 99.0),  # insert (unmatched)
            (8, "D", 1, None, None),   # delete of absent key: no-op
        ],
        "k long, op string, seq long, name string, bal double",
    )
    got = {r.k: (r.name, r.bal)
           for r in apply_changes(snap, changes, "k").collect()}
    assert got == {1: ("a2", 12.0), 3: ("c", 30.0), 9: ("new", 99.0)}


def test_compact_parquet_reduces_files(spark, tmp_path):
    """Listing-driven compaction: 64 tiny files collapse to the
    target-size count (1 here) without a shuffle, rows intact."""
    from fossa_spark.queries._util import load
    from fossa_spark.sources import compact_parquet
    from tests.conftest import SF_DIR

    small = str(tmp_path / "small")
    compacted = str(tmp_path / "compacted")
    src = load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    src.repartition(64).write.mode("overwrite").parquet(small)
    n_out = compact_parquet(spark, small, compacted, target_bytes=1 << 30)
    assert n_out == 1
    back = spark.read.parquet(compacted)
    assert back.count() == src.count()


def test_python_datasource_plans_partitions(spark):
    """The fossa_synth Python Data Source must plan exactly the requested
    number of input partitions (parallel read), and the union of the
    partition ranges must cover every row exactly once."""
    from fossa_spark.sources import SyntheticDataSource

    try:
        spark.dataSource.register(SyntheticDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("fossa_synth")
        .option("rows", "999")
        .option("parts", "7")
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 999
    assert df.select("id").distinct().count() == 999


def test_pagerank_structure(spark):
    """PageRank sanity on hand-built graphs: (a) a symmetric cycle gives
    every node the same rank; (b) a hub-and-spoke graph ranks the hub
    strictly above the spokes; (c) total mass stays within integer-
    truncation slack of the initial mass."""
    from fossa_spark.graph import SCALE, pagerank

    cycle = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    ranks = {r["node"]: r["pr_scaled"] for r in pagerank(cycle, iters=3).collect()}
    assert len(set(ranks.values())) == 1  # symmetry ⇒ identical ranks

    # star: every spoke points at the hub, hub points back at every spoke
    spokes = [f"s{i}" for i in range(5)]
    star = spark.createDataFrame(
        [(s, "hub") for s in spokes] + [("hub", s) for s in spokes],
        ["src", "dst"],
    )
    out = {r["node"]: r["pr_scaled"] for r in pagerank(star, iters=3).collect()}
    assert all(out["hub"] > out[s] for s in spokes)
    # mass is conserved up to `div` truncation (< outdeg per node per round)
    total = sum(out.values())
    assert 0.99 * SCALE <= total <= 1.001 * SCALE


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """A box filter over both Z-order dimensions must touch strictly fewer
    files than the same filter over a layout sorted on ONE dimension
    (where the second predicate prunes nothing), and the rewritten data
    must be lossless."""
    from pyspark.sql import functions as F

    from fossa_spark.sources import zorder_write
    from fossa_spark.queries._util import load
    from tests.conftest import SF_DIR

    src = load(spark, SF_DIR, "orders")
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "linear")
    zorder_write(src, zdir, "o_custkey", "o_totalprice", n_files=8)
    (
        src.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite").parquet(ldir)
    )

    zback, lback = spark.read.parquet(zdir), spark.read.parquet(ldir)
    assert zback.count() == src.count()

    # box filter selective in BOTH dims; count distinct files actually read
    lo_c = src.agg(F.expr("percentile(o_custkey, 0.1)")).first()[0]
    lo_p = src.agg(F.expr("percentile(o_totalprice, 0.1)")).first()[0]
    box = (F.col("o_custkey") <= lo_c) & (F.col("o_totalprice") <= lo_p)

    def files_touched(df):
        return (
            df.filter(box)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    total_files = zback.select(F.input_file_name()).distinct().count()
    assert total_files >= 8
    # the linear layout prunes on custkey only → the price predicate
    # re-reads every custkey-low file; the z-layout skips most of them.
    # input_file_name counts files with ≥1 surviving ROW (a proxy for
    # row-group pruning: parquet min/max stats skip z-runs entirely)
    assert files_touched(zback) <= files_touched(lback)
    # and the z-scan must not degenerate to reading everything
    assert files_touched(zback) < total_files


def test_triangle_count_known_graphs(spark):
    """K4 has exactly 4 triangles (and 100% of its wedges close... no —
    K4 has C(4,2)=6 edges, 12 canonical wedges, 4 triangles); a path
    graph has wedges but zero triangles; duplicate/reversed input edges
    must not inflate any count."""
    from fossa_spark.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + k4[:2]  # reversed + dup edges
    r = triangle_count(
        spark.createDataFrame(noisy, "src long, dst long")
    ).first()
    assert (r.n_edges, r.n_triangles) == (6, 4)

    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    r2 = triangle_count(path).first()
    assert (r2.n_edges, r2.n_triangles, r2.closure_rate) == (3, 0, 0.0)
    assert r2.n_wedges == 2


def test_approx_quantile_rank_error_bound(spark):
    """percentile_approx (GK sketch, accuracy 10000) must land within the
    documented 1/accuracy rank-error bound of the exact percentile — the
    contract that justifies the sketch as the 100 TB quantile path."""
    import os

    from pyspark.sql import functions as F

    from fossa_spark.queries._util import load
    from fossa_spark.queries.aggregates import q_agg_approx_quantile

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    approx = {r["l_returnflag"]: r for r in q_agg_approx_quantile(spark, sf).collect()}
    li = load(spark, sf, "lineitem")
    for flag, row in approx.items():
        vals = sorted(
            r[0] for r in li.filter(F.col("l_returnflag") == flag)
            .select("l_quantity").collect()
        )
        n = len(vals)
        for p, got in [(0.25, row["q25"]), (0.5, row["q50"]), (0.75, row["q75"])]:
            # rank of the returned value must be within eps*n of p*n
            import bisect

            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = p * n
            eps_n = n / 10000 + 1  # accuracy=10000 → eps=1e-4, +1 slack
            assert lo - eps_n <= target <= hi + eps_n, (flag, p, got)


def test_bfs_levels_known_graph(spark):
    """Chain 0-1-2-3-4 plus a branch 1-10: distances from 0 are exact;
    max_depth truncates; early stop on an isolated source."""
    from fossa_spark.graph import bfs_levels

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 10)]
    both = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(both, "src long, dst long")
    src = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.dist for r in bfs_levels(edges, src, max_depth=3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 10: 2, 3: 3}
    # isolated source: only level 0, loop stops on first empty frontier
    iso = spark.createDataFrame([(99,)], "node long")
    out2 = {r.node: r.dist for r in bfs_levels(edges, iso, max_depth=3).collect()}
    assert out2 == {99: 0}


def test_k_core_known_graph(spark):
    """K4 (every node degree 3) survives a 3-core; a tail path hanging off
    it peels away completely; the whole graph IS its own 2-core."""
    from fossa_spark.graph import k_core

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tail = [(3, 10), (10, 11)]
    und = k4 + tail
    arcs = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    core3 = k_core(arcs, k=3)
    nodes = {r.src for r in core3.collect()}
    assert nodes == {0, 1, 2, 3}
    assert core3.count() == 12  # K4 both directions
    core2 = k_core(arcs, k=2)
    assert core2.count() == len(und) * 2 - 2 * 2  # tail edge (10,11) peels, 11 then 10<2


def test_skyline_2d_ties_and_prefix(spark):
    """Distributed skyline: tie groups keep all co-maximal rows, strict
    domination removes, and the cross-partition prefix max dominates rows
    in later ranges (n_ranges > #rows forces multi-partition paths)."""
    from fossa_spark.operators import skyline_2d

    rows = [
        (1, 10, 100),  # frontier (earliest x, max y)
        (2, 10, 100),  # tie on BOTH dims -> also frontier
        (3, 10, 90),   # dominated within same x
        (4, 20, 100),  # dominated: earlier x with equal y
        (5, 20, 101),  # frontier (y improves)
        (6, 30, 101),  # dominated by id=5 (earlier x, equal y)
        (7, 30, 150),  # frontier
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = {r.id for r in skyline_2d(df, "x", "y", "id", n_ranges=5).collect()}
    assert out == {1, 2, 5, 7}, out


def test_spread_is_noop_when_already_parallel(spark):
    """spread() must not add a shuffle when the scan already yields at
    least one partition per core — the corpus-scale case."""
    from fossa_spark.queries._util import spread

    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, n + 2)
    assert spread(df, spark) is df


def test_spread_repartitions_single_split(spark):
    """A single-partition frame (the single-row-group fixture shape) must
    come out with one partition per core."""
    from fossa_spark.queries._util import spread

    df = spark.range(0, 1000, 1, 1)
    out = spread(df, spark)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_fit_centroids_capped_deterministic(spark):
    """Same (data, seed) → bit-identical centroids; k caps at the sample
    size; shape is (k, dim)."""
    import numpy as np

    from fossa_spark.llm.similarity import fit_centroids_capped

    df = spark.createDataFrame(
        [(i, [float((i * 37 + j * 11) % 101) for j in range(4)]) for i in range(60)],
        "id long, vec array<double>",
    )
    a = fit_centroids_capped(df, "vec", 8, seed=7)
    b = fit_centroids_capped(df, "vec", 8, seed=7)
    assert a.shape == (8, 4) and np.array_equal(a, b)
    c = fit_centroids_capped(df, "vec", 500, seed=7)
    assert c.shape[0] <= 60


def test_win_corr_bucket_carry_parity(spark, tmp_path, monkeypatch):
    """The q_win_corr bucket-carry decomposition must be value-identical
    to the plain single-window form on a frame that actually exercises
    carries across month boundaries (ADVICE r5: the 2M-row gate meant no
    test ever ran the bucketed branch).  Synthetic multi-month lineitem:
    occupancy per (flag, month) bucket straddles the 29-row carry depth,
    includes duplicate (orderkey, linenumber) pairs (the fixture's
    non-unique key), and a month gap (occupied-bucket successor must skip
    the hole).  Gate monkeypatched to 0 → bucketed; default → plain."""
    import datetime
    import random

    from fossa_spark.queries import windows as wmod
    from tests.conftest import rows_canon

    rng = random.Random(7)
    rows = []
    # months jan, feb, apr (gap at mar), two flags, 35 rows per bucket
    for flag in ("A", "N"):
        for month in (1, 2, 4):
            for i in range(35):
                rows.append(
                    (
                        flag,
                        rng.randrange(1, 40),        # duplicate orderkeys
                        rng.randrange(1, 4),         # duplicate linenumbers
                        datetime.datetime(1995, month, 1 + rng.randrange(28)),
                        float(rng.randrange(1, 50)),
                        round(rng.uniform(900.0, 90000.0), 2),
                    )
                )
    df = spark.createDataFrame(
        rows,
        "l_returnflag string, l_orderkey long, l_linenumber int, "
        "l_shipdate timestamp, l_quantity double, l_extendedprice double",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    plain = wmod.q_win_corr(spark, str(tmp_path)).collect()
    monkeypatch.setattr(wmod, "_CORR_BUCKET_MIN_ROWS", 0)
    bucketed_df = wmod.q_win_corr(spark, str(tmp_path))
    bucketed = bucketed_df.collect()

    cols = bucketed_df.columns
    assert len(plain) == len(rows) == len(bucketed)
    assert rows_canon(plain, cols) == rows_canon(bucketed, cols)


def test_win_corr_bucket_gate_falls_back_on_thin_bucket(spark, tmp_path, monkeypatch):
    """A bucket with < 29 rows (carry would span >1 boundary) must force
    the plain-window fallback even when the row-count gate passes — the
    decomposition is only valid when every occupied bucket holds >= 29."""
    import datetime

    from fossa_spark.queries import windows as wmod

    rows = [
        ("A", i, 1, datetime.datetime(1995, m, 5), float(i % 9 + 1), 100.0 + i)
        for m in (1, 2)
        for i in range(30 if m == 1 else 5)
    ]
    df = spark.createDataFrame(
        rows,
        "l_returnflag string, l_orderkey long, l_linenumber int, "
        "l_shipdate timestamp, l_quantity double, l_extendedprice double",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    monkeypatch.setattr(wmod, "_CORR_BUCKET_MIN_ROWS", 0)
    out = wmod.q_win_corr(spark, str(tmp_path))
    # plain branch has no _bkt machinery; either way output must be complete
    assert out.count() == len(rows)


def test_locality_subblocked_hard_occupancy_bound(spark):
    """ADVICE r5: a clumped label (600 identical vectors → one KMeans
    centroid) must not yield one giant (label, centroid) block — the
    hash re-split bounds every block at 8·target_block, and the
    shiftright(blk, 16) label decode survives the shard encoding."""
    from fossa_spark.llm import similarity as S

    rows = [(i, 7, [1.0, 0.0, 0.0, 0.0]) for i in range(600)]
    rows += [(1000 + i, 3, [float(i), 1.0, 0.0, 0.0]) for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = S.locality_subblocked(
        df, "label", "vec_id", "embedding", cap=64, target_block=16
    )
    occ = out.groupBy("blk").count().collect()
    assert max(r["count"] for r in occ) <= 8 * 16, occ
    assert out.filter(F.shiftright("blk", 16) != F.col("label")).count() == 0
    assert out.count() == len(rows)
