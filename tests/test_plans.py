"""Physical-plan regression tests: the scale properties claimed in the
docstrings — pushdown, pruning, broadcast, no-full-sort limits, salted-join
equivalence — asserted programmatically so a refactor can't silently
regress them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fossa_spark.operators import salted_join
from fossa_spark.plans import assert_broadcast_join, assert_filters_pushed, audit
from fossa_spark.queries.aggregates import q_agg_basic
from fossa_spark.queries.joins import q_join_broadcast, q_join_interval
from fossa_spark.queries.relational import q_filter, q_sort
from tests.conftest import SF_DIR


def test_q1_pushdown_and_pruning(spark):
    a = assert_filters_pushed(q_agg_basic(spark, SF_DIR), "l_shipdate")
    # scan must not read the unused columns (orderkey/partkey/suppkey/...)
    assert a.scans_only_columns(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ), a.read_schemas


def test_filter_pushes_all_predicates(spark):
    assert_filters_pushed(
        q_filter(spark, SF_DIR), "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


def test_star_join_broadcasts(spark):
    a = assert_broadcast_join(q_join_broadcast(spark, SF_DIR))
    # both dims broadcast: no shuffle exchange needed before the joins
    assert sum("Broadcast" in j for j in a.join_nodes) >= 2


def test_interval_join_is_broadcast_nested_loop(spark):
    # non-equi join against a tiny side must broadcast, not shuffle
    assert_broadcast_join(q_join_interval(spark, SF_DIR))


def test_sort_limit_avoids_full_sort(spark):
    a = audit(q_sort(spark, SF_DIR))
    assert "TakeOrderedAndProject" in a.formatted


def test_whole_stage_codegen_active(spark):
    """The flagship agg must be fully codegen'd (no interpreted exprs in the
    hot path). AQE hides WSCG subtrees until runtime, so audit with AQE off."""
    import contextlib
    import io

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = q_agg_basic(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
        m = buf.getvalue().splitlines()[0]
        n = int(m.split()[1])
        assert n >= 2, m  # scan+partial-agg stage and final-agg stage
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_contamination_broadcasts_benchmark_side(spark):
    """The benchmark gram set must broadcast — the corpus side of the
    contamination join never shuffles (the property that makes the scan
    scale to the full corpus)."""
    from fossa_spark.queries.curation_queries import q_contamination

    assert_broadcast_join(q_contamination(spark, SF_DIR))


def test_sample_hash_scan_prunes_and_filters(spark):
    """Deterministic sampling is a plain filter over a 2-column scan —
    nothing else read, nothing shuffled before the filter."""
    from fossa_spark.queries.curation_queries import q_sample_hash

    a = audit(q_sample_hash(spark, SF_DIR))
    assert a.scans_only_columns("doc_id", "source"), a.read_schemas


def test_salted_join_equivalence(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, "l_orderkey").groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    salted = salted_join(li, o, "l_orderkey", salt=8).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    li = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, d string")
    out = salted_join(li, dim, "k", salt=4, how="left").collect()
    assert len(out) == 3
    assert {r.k: r.d for r in out}[99] is None


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Same-bucketed tables must join with zero Exchange nodes — the
    pay-once co-location pattern for recurring fact-fact joins."""
    from fossa_spark.sources import colocated_join, write_bucketed

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "b_lineitem", "l_orderkey", buckets=4,
                   path=str(tmp_path / "b_li"), sort_by="l_orderkey")
    write_bucketed(o, "b_orders", "l_orderkey", buckets=4,
                   path=str(tmp_path / "b_o"), sort_by="l_orderkey")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        j = colocated_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        a = audit(j)
        assert a.exchanges == 0, f"bucketed join still shuffles:\n{a.formatted[:1500]}"
        # and the result is correct
        n = j.count()
        expected = li.join(o, "l_orderkey").count()
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_exists_rewrites_to_semi_join(spark):
    """Q4's EXISTS must become a semi join (each order emitted once, no
    fan-out on multi-match), with the quarter window pushed to the scan."""
    from fossa_spark.queries.sql_queries import q_sql_q4

    a = assert_filters_pushed(q_sql_q4(spark, SF_DIR), "o_orderdate")
    assert "LeftSemi" in a.formatted, a.join_nodes


def test_not_exists_rewrites_to_anti_join(spark):
    """Q22's NOT EXISTS must become an anti join and the uncorrelated
    scalar average must be a one-shot Subquery, not a per-row plan."""
    from fossa_spark.queries.sql_queries import q_sql_q22

    a = audit(q_sql_q22(spark, SF_DIR))
    assert "LeftAnti" in a.formatted, a.join_nodes
    assert "Subquery" in a.formatted


def test_correlated_scalar_subquery_decorrelates(spark):
    """Q17's per-part avg-quantity subquery must de-correlate into ONE
    aggregate over lineitem + a join — the plan may not re-plan the inner
    query per outer row (no nested subquery node under the filter)."""
    from fossa_spark.queries.sql_queries import q_sql_q17

    a = audit(q_sql_q17(spark, SF_DIR))
    assert len(a.join_nodes) >= 2, a.join_nodes  # part join + decorrelated agg join
    assert "ScalarSubquery" not in a.formatted, "subquery not de-correlated"


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned writes must enable partition PRUNING on read:
    a filter on the partition column appears as a PartitionFilter (not a
    data filter), and only the matching directory is scanned — the
    mechanism that turns a 100 TB date-partitioned table into a one-day
    scan."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / "orders_by_status")
    o.write.partitionBy("o_orderstatus").parquet(path)
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    a = audit(df)
    assert "PartitionFilters: [" in a.formatted
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", a.formatted)
    assert m and "o_orderstatus" in m.group(1), m
    # the partition predicate must NOT degrade to a pushed data filter
    assert "o_orderstatus" not in ";".join(a.pushed_filters)
    # and the result is the partition's rows exactly
    assert df.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_q6_all_predicates_reach_scan(spark):
    """Q6 is the pure-pushdown benchmark: date range, discount band and
    quantity cut must ALL appear in the parquet scan's PushedFilters, and
    the scan must read only the three referenced columns."""
    from fossa_spark.queries.sql_queries import q_sql_q6

    a = assert_filters_pushed(
        q_sql_q6(spark, SF_DIR), "l_shipdate", "l_discount", "l_quantity"
    )
    assert a.scans_only_columns("l_shipdate", "l_discount", "l_quantity",
                               "l_extendedprice"), a.read_schemas


def test_q16_not_in_is_null_aware_anti_join(spark):
    """Q16's NOT IN subquery must plan as a null-aware anti join
    (LeftAnti with isnull disjunct / NAAJ), never a per-row subquery."""
    from fossa_spark.queries.sql_queries import q_sql_q16

    a = audit(q_sql_q16(spark, SF_DIR))
    assert "LeftAnti" in a.formatted, a.join_nodes
    assert "InSubquery" not in a.formatted


def test_q2_min_cost_subquery_decorrelates(spark):
    """Q2's correlated MIN-cost subquery must de-correlate into one
    aggregate over the supply relation + a join on partkey (no re-planned
    inner query per outer row)."""
    from fossa_spark.queries.sql_queries import q_sql_q2

    a = audit(q_sql_q2(spark, SF_DIR))
    assert "ScalarSubquery" not in a.formatted, "Q2 subquery not de-correlated"
    assert not any("Cartesian" in j for j in a.join_nodes), a.join_nodes


def test_lateral_subquery_decorrelates_to_ranked_join(spark):
    """The LATERAL top-2-per-nation must decorrelate: no per-outer-row
    re-execution (no nested Subquery under the join), the inner LIMIT
    becomes a ranked window, and the join stays non-cartesian."""
    from fossa_spark.queries.sql_queries import q_join_lateral

    a = audit(q_join_lateral(spark, SF_DIR))
    assert "Window" in a.formatted, "LIMIT-per-group not windowed"
    assert not any("Cartesian" in j for j in a.join_nodes), a.join_nodes


def test_q21_semi_and_anti_on_same_fact_no_cartesian(spark):
    """Q21's EXISTS and NOT EXISTS against lineitem must become one
    left-semi and one left-anti join (each with the l_suppkey inequality as
    the join residual) — no cartesian/nested-loop, no per-row subquery."""
    import re

    from fossa_spark.queries.sql_queries import q_sql_q21

    a = audit(q_sql_q21(spark, SF_DIR))
    assert "LeftSemi" in a.formatted, a.join_nodes
    assert "LeftAnti" in a.formatted, a.join_nodes
    assert not re.search(r"Cartesian", a.formatted), "cartesian product in Q21"
    assert "ScalarSubquery" not in a.formatted


def test_q13_outer_join_keeps_zero_count_customers(spark):
    """Q13: the join-side predicate must stay in the LEFT OUTER join (not
    be pushed as a WHERE, which would drop zero-order customers), and the
    c_count=0 bucket must be present and equal to the number of customers
    whose every order is urgent (or who have no orders)."""
    from fossa_spark.queries.sql_queries import q_sql_q13

    df = q_sql_q13(spark, SF_DIR)
    a = audit(df)
    assert "LeftOuter" in a.formatted or "LeftOuter" in str(a.join_nodes), (
        a.join_nodes
    )
    rows = {r.c_count: r.custdist for r in df.collect()}
    import pyspark.sql.functions as F

    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    with_orders = o.select("o_custkey").distinct().count()
    expected_zero = c.count() - with_orders
    assert rows.get(0, 0) == expected_zero


def test_q5_dims_broadcast_single_agg_shuffle(spark):
    """Q5's star shape: every dim side (orders-filtered, supplier, nation,
    region) must broadcast — lineitem never shuffles before the aggregate —
    and exactly one hash-partitioned Exchange feeds the aggregation (the
    second Exchange in the plan is the final ORDER BY range partitioning)."""
    from fossa_spark.queries.sql_queries import q_sql_q5

    import re

    a = audit(q_sql_q5(spark, SF_DIR))
    # numbered detail entries count each physical node exactly once
    bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", a.formatted))
    assert bhj == 4, f"expected 4 broadcast joins, saw {bhj}:\n{a.join_nodes}"
    hash_exchanges = len(re.findall(r"Arguments: hashpartitioning", a.formatted))
    assert hash_exchanges == 1, f"expected 1 agg shuffle, saw {hash_exchanges}"


def test_disjunctive_predicate_join_stays_equi(spark):
    """Q19's OR-of-conjuncts must not break the equi join into a cartesian:
    the common l_partkey = p_partkey key keeps it a single hash join with
    the disjunction evaluated post-join."""
    from fossa_spark.queries.sql_queries import q_sql_q19

    a = audit(q_sql_q19(spark, SF_DIR))
    assert not any("Cartesian" in j or "NestedLoop" in j for j in a.join_nodes), (
        a.join_nodes
    )
    assert any("Hash" in j for j in a.join_nodes), a.join_nodes


def test_tfidf_vocab_broadcasts(spark):
    """TF-IDF's df-side (term vocabulary) must broadcast back onto the
    (doc, term) grain — the corpus-sized side never reshuffles for it."""
    from fossa_spark.queries.llm_queries import q_tfidf

    assert_broadcast_join(q_tfidf(spark, SF_DIR))


def test_asof_tol_single_user_shuffle(spark):
    """Forward as-of w/ tolerance is one window pass: exactly one
    hash-partitioned Exchange (on user_id), no join nodes at all."""
    import re

    from fossa_spark.queries.joins import q_join_asof_tol

    a = audit(q_join_asof_tol(spark, SF_DIR))
    assert not any("Join" in j for j in a.join_nodes), a.join_nodes
    hash_exchanges = len(re.findall(r"Arguments: hashpartitioning", a.formatted))
    assert hash_exchanges == 1, f"expected 1 shuffle, saw {hash_exchanges}"


def test_mad_single_exchange_after_broadcast(spark):
    """MAD's nested-median shape: the per-group medians broadcast back,
    and the deviation window + final aggregate share ONE hashpartitioning
    exchange on the group key."""
    import re

    from fossa_spark.queries.aggregates import q_agg_mad

    a = assert_broadcast_join(q_agg_mad(spark, SF_DIR))
    hash_exchanges = len(
        set(re.findall(r"Arguments: hashpartitioning\(l_returnflag", a.formatted))
    )
    assert hash_exchanges == 1, f"window and agg must share the exchange:\n{a.formatted[-2000:]}"


def test_copurchase_self_join_stays_equi(spark):
    """Basket pair counting must stay an equi hash/merge join on the
    basket key with the p1 < p2 canonicalization as a post-join residual —
    never a cartesian/nested-loop expansion."""
    from fossa_spark.queries.sql_queries import q_copurchase

    a = audit(q_copurchase(spark, SF_DIR))
    assert not any("Cartesian" in j or "NestedLoop" in j for j in a.join_nodes), (
        a.join_nodes
    )


def test_lm_score_broadcasts_lm_table(spark):
    """The unigram-LM table (vocab-bounded) and corpus scalars must
    broadcast onto the (doc, token) grain — the corpus never reshuffles
    for the scoring join."""
    from fossa_spark.queries.llm_queries import q_lm_score

    a = assert_broadcast_join(q_lm_score(spark, SF_DIR))
    # left join LM + cross join scalars: at least 2 broadcast nodes
    assert sum("Broadcast" in j for j in a.join_nodes) >= 2, a.join_nodes


def test_sketch_cms_probe_broadcasts(spark):
    """The 4x64 CMS table is sketch-sized by construction; the probe join
    must broadcast it, never shuffle the probe side."""
    from fossa_spark.queries.llm_queries import q_sketch_cms

    assert_broadcast_join(q_sketch_cms(spark, SF_DIR))


def test_quality_checks_referential_is_broadcast_semi(spark):
    """The referential-integrity check must plan the customer dimension as
    a broadcast LEFT SEMI probe — the orders fact never reshuffles."""
    from fossa_spark.queries.profiling_queries import q_quality_checks

    a = audit(q_quality_checks(spark, SF_DIR))
    assert "BroadcastHashJoin LeftSemi" in a.formatted, a.join_nodes


def test_pagerank_iterations_avoid_cartesian(spark):
    """Every power-iteration join (rank vector × edge list, plus the 1-row
    consts broadcasts) must be hash/broadcast equi — no nested-loop blowup
    anywhere in the unrolled 3-iteration plan."""
    from fossa_spark.queries.graph_queries import q_pagerank

    a = audit(q_pagerank(spark, SF_DIR))
    bad = [j for j in a.join_nodes
           if ("Cartesian" in j or "NestedLoop" in j) and "LeftOuter" not in j]
    # the 1-row consts crossJoin legitimately plans as BroadcastNestedLoop;
    # anything non-broadcast nested-loop is a regression
    bad = [j for j in bad if "Broadcast" not in j]
    assert not bad, bad


def test_dpp_join_prunes_partitions_dynamically(spark):
    """q_join_dpp's fact scan must carry a dynamicpruningexpression in its
    PartitionFilters — runtime partition pruning derived from the
    broadcast dim join, not a constant-folded static filter."""
    from fossa_spark.queries.io_queries import q_join_dpp

    a = audit(q_join_dpp(spark, SF_DIR))
    assert "dynamicpruningexpression" in a.formatted.lower(), (
        [ln for ln in a.formatted.splitlines() if "PartitionFilters" in ln]
    )


def test_bm25_topk_avoids_corpus_window(spark):
    """BM25's global top-k must plan as TakeOrderedAndProject (orderBy +
    limit) — never a single-partition corpus-wide window — and the df
    (query-term vocabulary) side must broadcast."""
    from fossa_spark.queries.llm_queries import q_text_bm25

    a = audit(q_text_bm25(spark, SF_DIR))
    assert "TakeOrderedAndProject" in a.formatted
    assert any("Broadcast" in j for j in a.join_nodes), a.join_nodes


def test_assoc_rules_singles_broadcast(spark):
    """Association rules: the part-grain singles relation joins the pair
    grain via broadcast (both directions), and the basket self-join stays
    a hash equi-join — no nested-loop anywhere."""
    from fossa_spark.queries.sql_queries import q_assoc_rules

    a = audit(q_assoc_rules(spark, SF_DIR))
    assert not any("Cartesian" in j or "NestedLoop" in j
                   for j in a.join_nodes if "Broadcast" not in j), a.join_nodes
    assert sum("BroadcastHashJoin" in j for j in a.join_nodes) >= 2, a.join_nodes


def test_ewma_single_shuffle_no_join(spark):
    """EWMA is one window pass: a single hashpartitioning Exchange on
    o_custkey, no join nodes, no O(n^2) following-unbounded frame."""
    import re

    from fossa_spark.queries.windows import q_win_ewma

    a = audit(q_win_ewma(spark, SF_DIR))
    assert not a.join_nodes, a.join_nodes
    hash_exchanges = len(re.findall(r"Arguments: hashpartitioning", a.formatted))
    assert hash_exchanges == 1, f"expected 1 shuffle, saw {hash_exchanges}"
    assert "unboundedfollowing" not in a.formatted.lower()


def test_spatial_join_stays_equi(spark):
    """Grid-bucketed spatial join: candidates come from a hash equi-join
    on the cell key — no cartesian/nested-loop anywhere despite the
    distance predicate."""
    from fossa_spark.queries.joins import q_join_spatial

    a = audit(q_join_spatial(spark, SF_DIR))
    assert not any("Cartesian" in j or "NestedLoop" in j for j in a.join_nodes), (
        a.join_nodes
    )


def test_setsim_verify_is_narrow_array_intersect(spark):
    """setsim_join's exact-verify must stay the round-4 shape: candidate
    pairs join the per-doc int64 element ARRAYS and count intersections
    narrowly — no explode of candidates x elements (the 16M-row double
    shuffle it replaced), no corpus-wide distinct on the exploded token
    relation, and no cartesian/nested-loop anywhere."""
    from fossa_spark.queries.llm_queries import q_dedup_setsim

    a = audit(q_dedup_setsim(spark, SF_DIR))
    assert "array_intersect" in a.formatted
    # r05: elements arrive as int64 from the Arrow shingle path (one
    # MapInPandas), not a per-string xxhash64 projection
    assert "MapInPandas" in a.formatted
    assert not any(
        "Cartesian" in j or "NestedLoop" in j for j in a.join_nodes
    ), a.join_nodes


def test_nullsafe_join_aggregates_below_join(spark):
    """q_join_nullsafe must keep the round-4 shape: both sides aggregate
    to key grain BEFORE the <=> join (pair counts = cn*sn), never
    materializing the pair stream — at 10x data the pair form cost 19x."""
    from fossa_spark.queries.joins import q_join_nullsafe

    a = audit(q_join_nullsafe(spark, SF_DIR))
    assert any("Broadcast" in j for j in a.join_nodes), a.join_nodes
    # formatted explain prints the tree top-down, so "aggregates BELOW
    # the join" means the join's line precedes every HashAggregate line.
    # The old (regressing) shape had the count agg ABOVE the join and
    # fails this: its final HashAggregate prints before the join.
    lines = a.formatted.splitlines()
    join_idx = min(
        i for i, ln in enumerate(lines) if "Join" in ln and "Reused" not in ln
    )
    agg_idxs = [i for i, ln in enumerate(lines) if "HashAggregate" in ln]
    assert agg_idxs and min(agg_idxs) > join_idx, (join_idx, agg_idxs)


def test_dedup_embed_subblocks_bounded(spark):
    """q_dedup_embed blocks on the label alone at small scale (the
    locality_subblocked small branch: blk = label·65536, no md5 random
    split — r05 replaced it with KMeans locality sub-blocks) and must
    not shuffle the vector-carrying relation through a window."""
    from fossa_spark.queries.llm_queries import q_dedup_embed

    a = audit(q_dedup_embed(spark, SF_DIR))
    assert "md5" not in a.formatted  # the r04 random split must stay gone
    assert "Window" not in a.formatted
    assert "65536" in a.formatted  # blk = label * 65536 (small branch)


def test_join_range_banded_is_equi_hash_join(spark):
    """The banded range join's pairwise stage must be a real equi join on
    (nation, band) — never a cartesian/non-broadcast nested loop; the
    only nested-loop node allowed is the broadcast theta join against
    the fixed-size band-count relation."""
    from fossa_spark.queries.joins import q_join_range_banded

    a = audit(q_join_range_banded(spark, SF_DIR))
    assert "CartesianProduct" not in a.formatted
    equi = [
        j
        for j in a.join_nodes
        if ("HashJoin" in j or "SortMergeJoin" in j) and "Reused" not in j
    ]
    assert equi, a.join_nodes
    # the theta stage is allowed only as a BROADCAST nested loop
    # (bare "Join" tokens are simple-mode header words, not nodes)
    assert all(
        "Broadcast" in j or "Hash" in j or "SortMerge" in j
        for j in a.join_nodes
        if j != "Join" and "Reused" not in j
    ), a.join_nodes


def test_scale_smells_linter(spark):
    """The plan linter must flag the three banned shapes and stay silent
    on a well-partitioned aggregate and a partitioned window."""
    from pyspark.sql import Window as W

    from fossa_spark.plans import scale_smells

    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    clean = df.groupBy((F.col("id") % 10).alias("g")).agg(F.sum("v"))
    assert scale_smells(clean) == []

    part_win = df.withColumn(
        "rk", F.row_number().over(W.partitionBy(F.col("id") % 10).orderBy("id"))
    )
    assert scale_smells(part_win) == []

    cart = df.crossJoin(spark.range(10))
    assert any(s.startswith("cartesian") for s in scale_smells(cart))

    corpus_win = df.withColumn("rk", F.row_number().over(W.orderBy("id")))
    found = scale_smells(corpus_win)
    assert any(s.startswith("corpus-window") for s in found)
    assert any(s.startswith("single-partition-exchange") for s in found)

    # the flagship aggregate must stay lint-clean end to end
    assert scale_smells(q_agg_basic(spark, SF_DIR)) == []


def test_scale_smells_bounded_exemptions(spark):
    """Round-7 detector refinements (each was a false positive in the
    first full-registry sweep):

    1. PARTITIONED-but-UNORDERED window (percentile over partitionBy with
       no orderBy) — the explain omits empty sublists, so bracket
       counting misread it as unpartitioned (q_agg_mad).
    2. Unpartitioned window over a GLOBAL TOP-N — bounded to the limit by
       plan structure (q_text_bm25's rank over its own top-50).
    3. SinglePartition exchange inside a SCALAR SUBQUERY's partial→final
       global agg — subquery trees were previously unparsed (TPC-H Q11).
    """
    from pyspark.sql import Window as W

    from fossa_spark.plans import scale_smells

    df = spark.range(1000).withColumn("v", F.col("id") * 2)

    part_unordered = df.withColumn(
        "med", F.expr("percentile(v, 0.5)").over(W.partitionBy(F.col("id") % 10))
    )
    assert scale_smells(part_unordered) == [], "partitioned window false-flag"

    topn_win = (
        df.orderBy(F.col("v").desc())
        .limit(50)
        .withColumn("rk", F.row_number().over(W.orderBy(F.col("v").desc())))
    )
    assert scale_smells(topn_win) == [], "limit-bounded window false-flag"

    df.createOrReplaceTempView("t_smell")
    scalar_sub = spark.sql(
        "SELECT id, v FROM t_smell WHERE v > (SELECT avg(v) FROM t_smell)"
    )
    assert scale_smells(scalar_sub) == [], "scalar-subquery agg false-flag"

    # and the genuine shapes still fire through the same paths
    raw_win = df.withColumn("rk", F.row_number().over(W.orderBy("id")))
    assert any(s.startswith("corpus-window") for s in scale_smells(raw_win))


def test_bnlj_unparseable_children_degrades_to_finding(monkeypatch):
    """Explain-format drift that leaves a BroadcastNestedLoopJoin's
    children unparsed must surface as a conservative cartesian finding,
    never crash the sweep (advisor r6) — and that drift finding is NOT
    absorbable by an ACCEPTED_SMELLS justification (advisor r7)."""
    from fossa_spark import plans

    drifted = (
        "== Physical Plan ==\n"
        "BroadcastNestedLoopJoin BuildRight, Inner (3)\n"
        "   SomeFutureNodeShape without ids\n"
        "\n"
        "(3) BroadcastNestedLoopJoin\n"
        "Arguments: BuildRight, Inner\n"
    )
    monkeypatch.setattr(
        plans, "audit", lambda df: plans.PlanAudit(formatted=drifted)
    )
    smells = plans.scale_smells(None)
    assert any("unparseable" in s for s in smells), smells
    monkeypatch.setitem(
        plans.ACCEPTED_SMELLS, "q_fake_drift", {"cartesian": "justified"}
    )
    assert any("unparseable" in s
               for s in plans.unaccepted_smells("q_fake_drift", None))


def test_accepted_smell_absorbs_exactly_one_finding(monkeypatch):
    """A justification suppresses ONE finding of its class; a second
    distinct finding of the same class still fails the sweep
    (advisor r7: prefix matching used to swallow the whole class)."""
    from fossa_spark import plans

    monkeypatch.setattr(
        plans, "scale_smells",
        lambda df: [
            "cartesian: CartesianProduct in plan — details A",
            "cartesian: BroadcastNestedLoopJoin with a non-scalar build",
        ],
    )
    monkeypatch.setitem(
        plans.ACCEPTED_SMELLS, "q_fake_two", {"cartesian": "covers one"}
    )
    left = plans.unaccepted_smells("q_fake_two", None)
    assert len(left) == 1 and left[0].startswith("cartesian"), left


def test_sh_rows_overrides_k(spark):
    """The sh_rows override contract (advisor r6/r7, documented on every
    sh_rows-accepting function): a caller-supplied shingle relation
    REPLACES text_col/k entirely — dedup_pairs_auto must produce the
    sh_rows-implied pairs even when called with a contradictory k."""
    from fossa_spark.llm import dedup as D

    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g q"),
        (3, "x y z w v u t s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh3 = D.shingle_hash_rows(df, "text", "doc_id", 3)
    # docs 1/2 share 5 of their 6 k=3 shingles → jaccard 5/7 ≈ 0.7143;
    # with k=999 (one all-token shingle per doc) they would share NOTHING
    # — so the 0.7143 pair proves sh_rows, not k, drove the computation
    out = D.dedup_pairs_auto(df, k=999, sh_rows=sh3).collect()
    assert [(r.id_a, r.id_b, round(r.jaccard, 4)) for r in out] == [
        (1, 2, 0.7143)
    ]
