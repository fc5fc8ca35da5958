"""Behavioral tests of the classical-ML operators (fossa_spark/ml.py) —
beyond the registry parity checks: k-means recovers planted clusters and
honors the empty-cluster rule, OLS recovers an exact planted line, and
Naive Bayes separates unambiguous planted classes with the documented
tie-break.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fossa_spark import ml


def _qv(spark, rows):
    """rows: list of (vec_id, [floats]) -> quantized vec DF."""
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    return ml.quantize_vectors(df)


def test_kmeans_recovers_planted_clusters(spark):
    # two tight blobs far apart; k=2, init = ids 0 and 1 (one per blob)
    blob_a = [(0, [0.0, 0.0]), (2, [0.01, 0.0]), (4, [0.0, 0.02])]
    blob_b = [(1, [1.0, 1.0]), (3, [0.99, 1.0]), (5, [1.0, 0.98])]
    vecs = _qv(spark, blob_a + blob_b)
    cents, assign = ml.kmeans_fit(vecs, k=2, iters=2)
    got = {r.vec_id: r.cluster for r in assign.collect()}
    assert {got[0], got[2], got[4]} == {0}
    assert {got[1], got[3], got[5]} == {1}
    # centroid of blob_a is the exact integer mean of its members
    c0 = {r.pos: r.v for r in cents.filter(F.col("cluster") == 0).collect()}
    assert c0[0] == (0 + 100 + 0) // 3  # scale 1e4: 0.01 -> 100
    assert c0[1] == (0 + 0 + 200) // 3


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # k=2 but both init vectors sit inside one blob: every point assigns
    # to the nearer init; if a cluster empties, its centroid must persist
    rows = [(0, [0.0, 0.0]), (1, [5.0, 5.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1])]
    vecs = _qv(spark, rows)
    cents, assign = ml.kmeans_fit(vecs, k=2, iters=2)
    # cluster 1 keeps at least its init member; nothing crashes and every
    # vector is assigned to a live cluster
    got = assign.collect()
    assert len(got) == 4
    assert {r.cluster for r in got} <= {0, 1}
    assert cents.count() == 4  # 2 clusters x 2 dims


def test_kmeans_assignment_tie_breaks_low_cluster(spark):
    # a point exactly equidistant from both centroids must take cluster 0
    rows = [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [1.0, 0.0])]
    vecs = _qv(spark, rows)
    _, assign = ml.kmeans_fit(vecs, k=2, iters=0)
    got = {r.vec_id: r.cluster for r in assign.collect()}
    assert got[2] == 0


def test_ols_recovers_exact_line(spark):
    # y = 3x + 7 exactly: slope/intercept exact, r2 == 1
    df = spark.createDataFrame(
        [("g", x, 3 * x + 7) for x in range(1, 11)], "grp string, x long, y long"
    )
    out = ml.ols_sufficient_stats(df, F.col("x"), F.col("y"), ["grp"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.slope == 3.0 and r.intercept == 7.0 and r.r2 == 1.0
    assert r.n == 10 and r.sx == 55


def test_ols_grouped_independent_fits(spark):
    df = spark.createDataFrame(
        [("a", x, 2 * x) for x in range(1, 6)]
        + [("b", x, -x + 10) for x in range(1, 6)],
        "grp string, x long, y long",
    )
    out = {
        r.grp: r
        for r in ml.ols_sufficient_stats(
            df, F.col("x"), F.col("y"), ["grp"]
        ).collect()
    }
    assert out["a"].slope == 2.0 and out["a"].intercept == 0.0
    assert out["b"].slope == -1.0 and out["b"].intercept == 10.0


def test_nb_separates_planted_classes(spark):
    docs = spark.createDataFrame(
        [
            (1, "aa aa bb", "en"),
            (2, "aa aa aa", "en"),
            (3, "zz zz yy", "de"),
            (4, "zz yy yy", "de"),
            (5, "aa bb aa", "en"),
            (6, "yy zz zz", "de"),
        ],
        "doc_id bigint, text string, lang string",
    )
    pred = ml.nb_train_score(docs, vocab_k=10).collect()
    by_id = {r.doc_id: r for r in pred}
    assert all(by_id[i].predicted == "en" for i in (1, 2, 5))
    assert all(by_id[i].predicted == "de" for i in (3, 4, 6))


def test_nb_empty_vocab_doc_gets_prior_argmax(spark):
    # a doc with no vocabulary tokens must still be scored (prior-only);
    # majority class wins, ties break to the lexicographically smaller
    docs = spark.createDataFrame(
        [
            (1, "aa aa", "en"),
            (2, "aa bb", "en"),
            (3, "zz zz", "de"),
            (4, "@@ @@", "fr"),  # '@@' survives tokenization; freq-2 token
        ],
        "doc_id bigint, text string, lang string",
    )
    # vocab_k=2 keeps only the two most frequent tokens ('aa' freq 3,
    # one of {'zz','@@'} freq 2 -> '@@' wins the token-asc tie) so doc 3
    # has no vocab tokens at all
    pred = {r.doc_id: r for r in ml.nb_train_score(docs, vocab_k=2).collect()}
    assert pred[3].predicted is not None
    assert len(pred) == 4


def test_bellman_ford_prefers_cheaper_multi_hop(spark):
    from fossa_spark import graph as G

    # direct edge 1->4 costs 10; the 1->2->3->4 path costs 3+3+3=9
    edges = spark.createDataFrame(
        [(1, 4, 10), (1, 2, 3), (2, 3, 3), (3, 4, 3), (5, 6, 1)],
        "src long, dst long, w long",
    )
    src = spark.createDataFrame([(1,)], "node long")
    dist = {r.node: r.dist for r in G.bellman_ford(edges, src, rounds=4).collect()}
    assert dist[4] == 9
    assert dist[2] == 3 and dist[3] == 6 and dist[1] == 0
    assert 5 not in dist and 6 not in dist  # disconnected component


def test_bellman_ford_round_bound_is_hop_bound(spark):
    from fossa_spark import graph as G

    # a 3-edge chain: with rounds=2 the far node is NOT yet reached
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1)], "src long, dst long, w long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    d2 = {r.node: r.dist for r in G.bellman_ford(edges, src, rounds=2).collect()}
    assert 4 not in d2 and d2[3] == 2


def test_tfidf_cosine_pairs_ranks_near_dup_above_partial(spark):
    from fossa_spark.llm import text as X

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (3, "alpha beta gamma nine ten eleven"),     # partial overlap
            (4, "one two three four five six"),          # disjoint
        ],
        "doc_id bigint, text string",
    )
    out = {
        (r.doc_a, r.doc_b): r.cos
        for r in X.tfidf_cosine_pairs(
            docs, shingle_k=3, max_df=20, min_cos=0.0
        ).collect()
    }
    assert out[(1, 2)] == 1.0  # identical shingle sets -> cosine exactly 1
    assert out[(1, 3)] < out[(1, 2)]
    assert (1, 4) not in out and (2, 4) not in out


def test_tfidf_cosine_pairs_df_cap_blocks_boilerplate(spark):
    from fossa_spark.llm import text as X

    # the same boilerplate shingle in EVERY doc; unique tails otherwise.
    # with max_df=2 the boilerplate posting list (df=3) is dropped, so no
    # pair shares a surviving shingle
    docs = spark.createDataFrame(
        [
            (1, "common head one two three"),
            (2, "common head four five six"),
            (3, "common head seven eight nine"),
        ],
        "doc_id bigint, text string",
    )
    out = X.tfidf_cosine_pairs(docs, shingle_k=3, max_df=2, min_cos=0.0)
    assert out.count() == 0


def test_refine_ivf_centroids_never_increases_inertia(spark):
    """Lloyd monotonicity: full-corpus refinement of sample-trained
    centroids must not increase the exact quantized objective."""
    from fossa_spark.llm import similarity as S
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent0 = S.fit_centroids_capped(emb, "embedding", k=8, train_cap=64, seed=7)
    vecs = ml.quantize_vectors(emb)

    def long_form(c):
        import numpy as np

        q = np.rint(c * ml.KMEANS_SCALE).astype(int)
        return spark.createDataFrame(
            [(int(i), int(p), int(q[i, p])) for i in range(q.shape[0])
             for p in range(q.shape[1])],
            "cluster int, pos int, v bigint",
        )

    before = ml.kmeans_inertia(vecs, long_form(cent0))
    cent1 = S.refine_ivf_centroids(
        emb, cent0, vec_c="embedding", id_c="vec_id", iters=2
    )
    after = ml.kmeans_inertia(vecs, long_form(cent1))
    assert after <= before
    assert cent1.shape == cent0.shape


def test_stream_kmeans_counts_and_equivalence(spark):
    """The streaming fold must account for every corpus vector exactly
    once, and must equal the same updates applied sequentially in batch
    mode (engine-independence of the foreachBatch loop)."""
    from tests.conftest import SF_DIR
    from fossa_spark.queries.streaming_queries import q_stream_kmeans

    out = q_stream_kmeans(spark, SF_DIR)
    rows = out.collect()
    n_corpus = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    per_cluster = {r.cluster: r.n_members for r in rows if r.pos == 0}
    assert sum(per_cluster.values()) == n_corpus
    assert set(per_cluster) == {0, 1, 2, 3}

    # sequential replay with direct kmeans_update calls
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vecs_all = ml.quantize_vectors(emb)
    b1 = vecs_all.filter(F.col("vec_id") % 3 == 0)
    from pyspark.sql.window import Window as W

    cents = (
        b1.orderBy("vec_id").limit(4)
        .withColumn("cluster", F.row_number().over(W.orderBy("vec_id")) - F.lit(1))
        .select("cluster", F.posexplode("qv").alias("pos", "v"))
        .localCheckpoint()
    )
    counts = spark.range(4).select(
        F.col("id").cast("int").alias("cluster"),
        F.lit(0).cast("bigint").alias("n"),
    ).localCheckpoint()
    for i in range(3):
        cents, counts = ml.kmeans_update(
            vecs_all.filter(F.col("vec_id") % 3 == i), cents, counts, 64
        )
    want = {(r.cluster, r.pos): r.v for r in cents.collect()}
    got = {(r.cluster, r.pos): r.centroid_q for r in rows}
    assert got == want


def test_bellman_ford_matches_pure_python_reference(spark):
    """Seeded random graph vs a driver-side Bellman-Ford — the
    distributed min-plus rounds must agree exactly (integer weights)."""
    import random

    rng = random.Random(20251016)
    n_nodes, n_edges = 12, 30
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes), rng.randrange(1, 100))
        for _ in range(n_edges)
    ]
    rounds = n_nodes - 1
    ref = {0: 0}
    for _ in range(rounds):
        nxt = dict(ref)
        for s, d, w in edges:
            if s in ref and ref[s] + w < nxt.get(d, float("inf")):
                nxt[d] = ref[s] + w
        ref = nxt
    from fossa_spark import graph as G

    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    src = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in G.bellman_ford(edf, src, rounds=rounds).collect()}
    assert got == ref


def test_entity_resolution_links_planted_dirty_records(spark):
    """Every planted dirty record must resolve into an entity whose
    canonical key is a base customer key, and every multi-record entity
    must contain at least two members."""
    from tests.conftest import SF_DIR
    from fossa_spark.queries.ml_queries import q_entity_resolution

    out = q_entity_resolution(spark, SF_DIR).collect()
    assert out, "no entities resolved"
    n_dirty_planted = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .filter(F.col("c_custkey") % 37 == 0)
        .count()
    )
    assert sum(r.n_dirty for r in out) == n_dirty_planted
    assert all(r.n_records >= 2 for r in out)
    assert all(r.entity_key < 1_000_000_000_000 for r in out)  # canonical = base


def test_decision_stump_finds_planted_split(spark):
    # labels perfectly separable at x <= 5: the stump must find it
    rows = [(x, 1 if x <= 5 else 0) for x in range(1, 11) for _ in range(3)]
    df = spark.createDataFrame(rows, "x long, label int")
    r = ml.decision_stump(df, "x", "label").collect()[0]
    assert r.threshold == 5
    assert r.left_class == 1 and r.right_class == 0
    assert r.impurity == 0.0
    assert r.n_left == 15 and r.n_right == 15


def test_decision_stump_tie_breaks_low_threshold(spark):
    # constant labels: every split has impurity 0 -> smallest threshold
    df = spark.createDataFrame(
        [(x, 0) for x in range(1, 6)], "x long, label int"
    )
    r = ml.decision_stump(df, "x", "label").collect()[0]
    assert r.threshold == 1 and r.impurity == 0.0


def test_tree_depth2_recovers_planted_and(spark):
    """AND-shaped labels (label = x1<=5 AND x2<=5) need exactly depth
    2: the root sees the x1 midpoint (unique Gini minimum, symmetric
    tie broken to feature 1), the left branch then isolates the
    positive quadrant on x2 to impurity 0, and the all-negative right
    branch is constant (every split impurity 0 → tie-break to feature
    1, smallest threshold).  (XOR deliberately NOT used: at the root
    every XOR split ties — greedy CART can't see it.)"""
    rows = [
        (x1, x2, 1 if (x1 <= 5 and x2 <= 5) else 0)
        for x1 in range(1, 11)
        for x2 in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, label int")
    out = {r.node: r for r in ml.tree_depth2(df, "x1", "x2", "label").collect()}
    assert set(out) == {"root", "left", "right"}
    r = out["root"]
    assert r.feature == 1 and r.threshold == 5
    assert r.n_left == 50 and r.n_right == 50
    left = out["left"]
    assert left.feature == 2 and left.threshold == 5
    assert left.impurity == 0.0
    assert left.n_left == 25 and left.n_right == 25
    assert left.left_class == 1 and left.right_class == 0
    right = out["right"]  # constant-0 branch: all splits tie at 0
    assert right.feature == 1 and right.threshold == 6
    assert right.impurity == 0.0
    assert right.left_class == 0 and right.right_class == 0


def test_tree_depth2_matches_brute_force(spark):
    """On a small random-ish (but deterministic) grid, every reported
    node must be the true Gini argmin over all (feature, threshold)
    candidates of its slice, under the (impurity, feature, threshold)
    tie-break — brute-forced in Python."""
    rows = [
        (x1, x2, 1 if ((x1 * 7 + x2 * 3) % 11) < 4 else 0)
        for x1 in range(1, 7)
        for x2 in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, label int")
    out = {r.node: r for r in ml.tree_depth2(df, "x1", "x2", "label").collect()}

    def brute(sub):
        best = None
        for fi in (0, 1):
            xs = sorted({r[fi] for r in sub})
            for t in xs[:-1]:
                left = [r for r in sub if r[fi] <= t]
                right = [r for r in sub if r[fi] > t]
                def gini_num(part):
                    n = len(part)
                    n1 = sum(r[2] for r in part)
                    n0 = n - n1
                    return (n * n - n0 * n0 - n1 * n1) / n
                imp = gini_num(left) + gini_num(right)
                key = (imp, fi + 1, t)
                if best is None or key < best:
                    best = key
        return best

    b_root = brute(rows)
    assert (out["root"].feature, out["root"].threshold) == (b_root[1], b_root[2])
    fi = b_root[1] - 1
    left_rows = [r for r in rows if r[fi] <= b_root[2]]
    right_rows = [r for r in rows if r[fi] > b_root[2]]
    for node, sub in (("left", left_rows), ("right", right_rows)):
        bb = brute(sub)
        assert (out[node].feature, out[node].threshold) == (bb[1], bb[2])
        assert out[node].n_left + out[node].n_right == len(sub)


def test_forest_depth2_trees_equal_per_slice_tree_depth2(spark):
    """Each forest tree must be EXACTLY what tree_depth2 learns on that
    tree's slice alone — the windowed-per-tree argmin and the
    collect-free branch restriction must not change any split."""
    rows = []
    for t in range(3):
        for x1 in range(1, 7):
            for x2 in range(1, 6):
                # different planted structure per slice
                lab = 1 if (x1 <= 2 + t and x2 <= 3) else 0
                rows.append((t, x1, x2, lab))
    df = spark.createDataFrame(rows, "tree int, x1 long, x2 long, label int")
    forest = {
        (r.tree, r.node): (
            r.feature, r.threshold, r.n_left, r.n_right,
            r.left_class, r.right_class, r.impurity,
        )
        for r in ml.forest_depth2(df, "x1", "x2", "label", "tree").collect()
    }
    for t in range(3):
        single = {
            r.node: (
                r.feature, r.threshold, r.n_left, r.n_right,
                r.left_class, r.right_class, r.impurity,
            )
            for r in ml.tree_depth2(
                df.filter(F.col("tree") == t), "x1", "x2", "label"
            ).collect()
        }
        for node, want in single.items():
            assert forest[(t, node)] == want, (t, node)
    assert len(forest) == 9


def test_forest_vote_matches_python_replay(spark):
    """forest_vote's accounting must equal a Python replay: score every
    row by every tree's (root → branch → class) rule chain, strict
    majority over n_trees, count exact corrects per tree and overall."""
    rows = []
    for t in range(2):
        for x1 in range(1, 7):
            for x2 in range(1, 6):
                lab = 1 if (x1 <= 3) != (t == 1 and x2 <= 2) else 0
                rows.append((t, x1, x2, lab))
    df = spark.createDataFrame(rows, "tree int, x1 long, x2 long, label int")
    trees = {}
    for r in ml.forest_depth2(df, "x1", "x2", "label", "tree").collect():
        trees.setdefault(r.tree, {})[r.node] = r

    def predict(t, x1, x2):
        root = trees[t]["root"]
        side = (
            "left"
            if (x1 if root.feature == 1 else x2) <= root.threshold
            else "right"
        )
        b = trees[t][side]
        go_left = (x1 if b.feature == 1 else x2) <= b.threshold
        return b.left_class if go_left else b.right_class

    exp_tree = {t: [0, 0] for t in trees}  # n_rows, n_correct
    exp_ens = 0
    for t, x1, x2, lab in rows:
        exp_tree[t][0] += 1
        exp_tree[t][1] += predict(t, x1, x2) == lab
        votes = sum(predict(tt, x1, x2) for tt in trees)
        exp_ens += (1 if votes * 2 > len(trees) else 0) == lab
    got = {
        r.tree: r
        for r in ml.forest_vote(
            df, "x1", "x2", "label", "tree", n_trees=2
        ).collect()
    }
    for t in trees:
        assert got[t].n_rows == exp_tree[t][0]
        assert got[t].n_correct_tree == exp_tree[t][1]
    assert got[0].n_rows_total == len(rows)
    assert got[0].n_correct_ensemble == exp_ens
    # degenerate ensemble refused: a slice with one distinct value on
    # both features yields no split for that tree
    bad = df.unionByName(
        spark.createDataFrame(
            [(9, 1, 1, 0)] * 4, "tree int, x1 long, x2 long, label int"
        )
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shrunken ensemble"):
        ml.forest_vote(bad, "x1", "x2", "label", "tree", n_trees=3)


def test_bagged_stumps_per_tree_splits_and_vote_accounting(spark):
    # two disjoint "trees" with opposite planted splits; the ensemble
    # vote (2 trees, strict majority) only predicts 1 when BOTH agree
    rows = (
        [(0, x, 1 if x <= 3 else 0) for x in range(1, 7) for _ in range(2)]
        + [(1, x, 1 if x >= 4 else 0) for x in range(1, 7) for _ in range(2)]
    )
    df = spark.createDataFrame(rows, "tree int, x long, label int")
    out = {r.tree: r for r in ml.bagged_stumps(df, "x", "label", "tree").collect()}
    assert out[0].threshold == 3 and out[0].left_class == 1
    assert out[1].threshold == 3 and out[1].left_class == 0
    assert out[0].impurity == 0.0 and out[1].impurity == 0.0
    # each tree is perfect on its own partition
    assert out[0].n_correct_tree == out[0].n_rows == 12
    assert out[1].n_correct_tree == out[1].n_rows == 12
    # strict 2-of-2 majority never fires (the trees always disagree), so
    # the ensemble predicts 0 everywhere: correct exactly on the 0-labels
    assert out[0].n_rows_total == 24
    assert out[0].n_correct_ensemble == 12


def test_boosted_stumps_reweighting_and_vote_accounting(spark):
    # interval labels (1 on x in [4,7]) — no single threshold is perfect,
    # so round 1 must see real errors and round 2 trains on 3x-reweighted
    # mistakes
    rows = [(x, 1 if 4 <= x <= 7 else 0) for x in range(1, 11) for _ in range(3)]
    df = spark.createDataFrame(rows, "x long, label int")
    out = {r.round: r for r in ml.boosted_stumps(df, "x", "label", rounds=2).collect()}
    assert set(out) == {0, 1}
    n = 30
    r0, r1 = out[0], out[1]
    # round-0 weights are all 1: counts partition the corpus
    assert r0.correct_w + r0.wrong_w == n
    assert r0.wrong_w > 0  # the interval is not threshold-separable
    # round-1 weighted mass = n + 2 * (round-0 mistakes)
    assert r1.correct_w + r1.wrong_w == n + 2 * r0.wrong_w
    # alphas positive while stumps beat 50/50 weighted error
    assert r0.alpha_scaled > 0
    assert r0.n_rows_total == r1.n_rows_total == n
    assert 0 <= r0.n_correct_ensemble <= n
    # deterministic end to end
    again = {r.round: r for r in ml.boosted_stumps(df, "x", "label", rounds=2).collect()}
    assert again[0] == r0 and again[1] == r1


def test_anova_f_statistic_separates_group_means(spark):
    """Sanity against the textbook F: three groups with very different
    means -> large F; identical groups -> F == 0."""
    from fossa_spark.queries import ml_queries as MQ
    import tempfile, os
    import pyspark.sql.functions as _F

    # build a tiny parquet 'lineitem' with controlled values
    d = tempfile.mkdtemp(prefix="anova_fix_")
    rows = (
        [("A", 10.0)] * 5 + [("N", 100.0)] * 5 + [("R", 1000.0)] * 5
    )
    spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double"
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    out = MQ.q_anova(spark, d).collect()[0]
    assert out.n_groups == 3 and out.n_rows == 15
    assert out.ss_within == 0.0      # constant within groups
    assert out.f_stat is None        # degenerate: F undefined, not a crash

    # add within-group noise: F becomes finite and large
    d2 = tempfile.mkdtemp(prefix="anova_fix2_")
    rows2 = [
        (g, base + eps)
        for g, base in (("A", 10.0), ("N", 100.0), ("R", 1000.0))
        for eps in (-1.0, 0.0, 1.0, 2.0, -2.0)
    ]
    spark.createDataFrame(
        rows2, "l_returnflag string, l_extendedprice double"
    ).write.parquet(os.path.join(d2, "lineitem.parquet"))
    out2 = MQ.q_anova(spark, d2).collect()[0]
    assert out2.f_stat is not None and out2.f_stat > 1000.0


def test_graph_triangles_per_node_matches_brute_force(spark):
    """Degree-oriented per-node triangle counts (graph.triangles, round
    12) vs itertools brute force on a planted graph with a hub (the
    case degree orientation exists for), a 4-clique, and a chain."""
    import itertools

    from fossa_spark import graph as G

    edges = (
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)]  # 4-clique
        + [(10, i) for i in range(20, 30)]                # hub, no closure
        + [(20, 21), (50, 51), (51, 52)]                  # one closed wedge
    )
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges})
    df = spark.createDataFrame(canon, "id_a long, id_b long")
    eset = set(canon)
    nodes = sorted({x for e in canon for x in e})
    exp: dict = {}
    n_tri = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if ((a, b) in eset and (b, c) in eset and (a, c) in eset):
            n_tri += 1
            for x in (a, b, c):
                exp[x] = exp.get(x, 0) + 1
    deg: dict = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    n_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    out = {r.node: r for r in G.triangles(df).collect()}
    assert {n: r.n_tri for n, r in out.items()} == exp
    row = next(iter(out.values()))
    assert row.n_triangles == n_tri and row.n_wedges == n_wedges
    assert abs(row.gcc - 3.0 * n_tri / n_wedges) < 1e-8


def test_boosted_trees_depth2_matches_python_replay(spark):
    """boosted_trees_depth2 vs a full Python replay on a small grid:
    per-round tree predictions drive the same x3 reweight, alphas match
    the 1e8-int log-odds convention, and the strict-majority ensemble
    accounting is exact.  Uses a pattern a single depth-2 tree cannot
    fully fit so round 2 actually changes weights."""
    import math

    rows = [
        (x1, x2, 1 if ((x1 <= 3) and (x2 <= 3)) or x1 >= 6 else 0)
        for x1 in range(1, 8)
        for x2 in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, label int")
    out = ml.boosted_trees_depth2(df, "x1", "x2", "label", rounds=2)
    got = {(r.round, r.node): r for r in out.collect()}
    assert set(got) == {(t, n) for t in (0, 1)
                        for n in ("root", "left", "right")}

    # Python replay at cell grain
    cells = {}
    for x1, x2, lab in rows:
        c = cells.setdefault((x1, x2), [0, 0])
        c[lab] += 1
    w = {k: list(v) for k, v in cells.items()}

    def best_split(hist):
        # hist: {(x1,x2): [w0,w1]} -> (feature, threshold) argmin
        best = None
        for fi in (0, 1):
            xs = sorted({k[fi] for k in hist})
            for t in xs[:-1]:
                l0 = sum(v[0] for k, v in hist.items() if k[fi] <= t)
                l1 = sum(v[1] for k, v in hist.items() if k[fi] <= t)
                r0 = sum(v[0] for k, v in hist.items() if k[fi] > t)
                r1 = sum(v[1] for k, v in hist.items() if k[fi] > t)
                nl, nr = l0 + l1, r0 + r1
                if nr == 0:
                    continue
                imp = (nl * nl - l0 * l0 - l1 * l1) / nl + (
                    nr * nr - r0 * r0 - r1 * r1) / nr
                key = (imp, fi + 1, t)
                if best is None or key < best[0:3]:
                    best = (imp, fi + 1, t, l0, l1, r0, r1)
        return best

    alphas, preds = [], []
    for t in (0, 1):
        root = best_split(w)
        fi = root[1] - 1
        left = {k: v for k, v in w.items() if k[fi] <= root[2]}
        right = {k: v for k, v in w.items() if k[fi] > root[2]}
        bl, br = best_split(left), best_split(right)
        assert (got[(t, "root")].feature, got[(t, "root")].threshold) == \
            (root[1], root[2]), t
        assert (got[(t, "left")].feature, got[(t, "left")].threshold) == \
            (bl[1], bl[2]), t
        assert (got[(t, "right")].feature, got[(t, "right")].threshold) == \
            (br[1], br[2]), t

        def pred(k):
            b = bl if k[fi] <= root[2] else br
            bfi = b[1] - 1
            if k[bfi] <= b[2]:
                return 1 if b[4] > b[3] else 0
            return 1 if b[6] > b[5] else 0

        p = {k: pred(k) for k in w}
        preds.append(p)
        cw = sum(v[1] if p[k] == 1 else v[0] for k, v in w.items())
        ww = sum(v[0] if p[k] == 1 else v[1] for k, v in w.items())
        a = round(math.log((cw + 1.0) / (ww + 1.0)) / 2.0 * 1e8)
        alphas.append(a)
        assert got[(t, "root")].correct_w == cw
        assert got[(t, "root")].wrong_w == ww
        assert got[(t, "root")].alpha_scaled == a, t
        w = {
            k: [v[0] * 3 if p[k] == 1 else v[0],
                v[1] * 3 if p[k] == 0 else v[1]]
            for k, v in w.items()
        }
    n_total = sum(sum(v) for v in cells.values())
    n_corr = 0
    for k, v in cells.items():
        score = sum(a * (2 * p[k] - 1) for a, p in zip(alphas, preds))
        ep = 1 if score > 0 else 0
        n_corr += v[1] if ep == 1 else v[0]
    anyrow = got[(0, "root")]
    assert anyrow.n_rows_total == n_total
    assert anyrow.n_correct_ensemble == n_corr


def test_tree_depth2_random_grids_match_brute_force(spark):
    """Seeded random label grids (the fa68daf model-based convention):
    tree_depth2's root and branch argmins must equal the Python brute
    force under the (impurity, feature, threshold) tie-break on every
    chain — catches tie-break drift the fixed planted grids can't."""
    import random

    def brute(sub):
        best = None
        for fi in (0, 1):
            xs = sorted({r[fi] for r in sub})
            for t in xs[:-1]:
                left = [r for r in sub if r[fi] <= t]
                right = [r for r in sub if r[fi] > t]

                def g(part):
                    n = len(part)
                    n1 = sum(r[2] for r in part)
                    n0 = n - n1
                    return (n * n - n0 * n0 - n1 * n1) / n

                key = (g(left) + g(right), fi + 1, t)
                if best is None or key < best:
                    best = key
        return best

    rng = random.Random(0x12EE)
    for case in range(3):
        rows = [
            (x1, x2, rng.randint(0, 1))
            for x1 in range(1, rng.randint(4, 7))
            for x2 in range(1, rng.randint(4, 7))
            for _ in range(rng.randint(1, 3))
        ]
        df = spark.createDataFrame(rows, "x1 long, x2 long, label int")
        out = {r.node: r for r in
               ml.tree_depth2(df, "x1", "x2", "label").collect()}
        b = brute(rows)
        assert (out["root"].feature, out["root"].threshold) == (b[1], b[2]), case
        fi = b[1] - 1
        for node, sub in (
            ("left", [r for r in rows if r[fi] <= b[2]]),
            ("right", [r for r in rows if r[fi] > b[2]]),
        ):
            bb = brute(sub)
            if bb is None:
                assert node not in out, (case, node)
            else:
                assert (out[node].feature, out[node].threshold) == \
                    (bb[1], bb[2]), (case, node)


def _gbt_python_replay(rows, rounds=2):
    """Pure-Python replay of ml.gbt_depth2's contract: cell histogram,
    floor-div F0, per-round least-squares depth-2 tree (argmin of
    -(Sl^2/nl + Sr^2/nr), ties feature then threshold), floor-div leaf
    values, exact SSE ledger."""
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0])  # (x1,x2) -> [n, s, s2]
    for x1, x2, y in rows:
        c = cells[(x1, x2)]
        c[0] += 1
        c[1] += y
        c[2] += y * y
    tn = sum(c[0] for c in cells.values())
    ts = sum(c[1] for c in cells.values())
    f0 = ts // tn
    pred = {k: f0 for k in cells}

    def sse():
        return sum(
            c[2] - 2 * pred[k] * c[1] + c[0] * pred[k] * pred[k]
            for k, c in cells.items()
        )

    def best(keys):
        cands = []
        for fi in (1, 2):
            hist = defaultdict(lambda: [0, 0])
            for k in keys:
                x = k[0] if fi == 1 else k[1]
                hist[x][0] += cells[k][0]
                hist[x][1] += cells[k][1] - cells[k][0] * pred[k]
            xs = sorted(hist)
            tn_ = sum(hist[x][0] for x in xs)
            ts_ = sum(hist[x][1] for x in xs)
            ln = ls = 0
            for x in xs:
                ln += hist[x][0]
                ls += hist[x][1]
                rn, rs = tn_ - ln, ts_ - ls
                if rn <= 0:
                    continue
                score = -(
                    float(ls) * float(ls) / float(ln)
                    + float(rs) * float(rs) / float(rn)
                )
                cands.append((score, fi, x, ln, rn, ls // ln, rs // rn))
        return min(cands)

    model, sses = [], [sse()]
    for t in range(rounds):
        keys = list(cells)
        root = best(keys)
        fcol = 0 if root[1] == 1 else 1
        lkeys = [k for k in keys if k[fcol] <= root[2]]
        rkeys = [k for k in keys if k[fcol] > root[2]]
        lb, rb = best(lkeys), best(rkeys)
        for node, b in (("root", root), ("left", lb), ("right", rb)):
            model.append(
                (t, node, b[1], b[2], b[3], b[4], b[5], b[6])
            )
        for k in cells:
            b = lb if k[fcol] <= root[2] else rb
            bf = 0 if b[1] == 1 else 1
            pred[k] += b[5] if k[bf] <= b[2] else b[6]
        sses.append(sse())
    return f0, sses, model


def test_gbt_depth2_matches_python_replay(spark):
    """ml.gbt_depth2 on a planted frame (negative residuals included,
    exercising the negative-numerator floor division) must equal the
    pure-Python replay row for row, and SSE must strictly decrease."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(400):
        x1 = rng.randrange(4)
        x2 = rng.randrange(5)
        y = 100 * x1 + 17 * (x2 >= 3) + rng.randrange(-8, 9)
        rows.append((x1, x2, y))
    f0, sses, model = _gbt_python_replay(rows, rounds=2)
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    got = ml.gbt_depth2(df, "x1", "x2", "y", rounds=2).collect()
    assert len(got) == 6
    for r in got:
        assert r.f0 == f0 and r.sse_init == sses[0]
        assert r.sse_after == sses[1 + r["round"]]
    got_model = [
        (
            r["round"], r.node, r.feature, r.threshold,
            r.n_left, r.n_right, r.value_left, r.value_right,
        )
        for r in got
    ]
    order = {"root": 0, "left": 1, "right": 2}
    model_sorted = sorted(model, key=lambda m: (m[0], order[m[1]]))
    got_sorted = sorted(got_model, key=lambda m: (m[0], order[m[1]]))
    assert got_sorted == model_sorted
    assert sses[0] > sses[1] > sses[2]


def test_gbt_depth2_degenerate_raises(spark):
    """Constant features must fail loudly (the boosted_trees_depth2
    convention), not emit a silent IndexError or a rootless model."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 1, v) for v in (5, 9, 13)], "x1 long, x2 long, y long"
    )
    with _pytest.raises(ValueError, match="constant"):
        ml.gbt_depth2(df, "x1", "x2", "y", rounds=1)
