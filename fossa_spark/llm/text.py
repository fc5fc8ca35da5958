"""Text-analysis operators: tokenization, counting, quality scoring,
language ID, fingerprinting.

Everything is built-in pyspark.sql.functions (JVM-side, codegen) — no Python
in the hot path. On a 100 TB corpus these are embarrassingly parallel narrow
transforms; the only shuffles are the explicit groupBys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Small function-word profiles for the n-gram/stopword language heuristic.
# Deliberately tiny: language ID at corpus scale is a per-row scoring pass;
# a real deployment swaps in fastText/CLD3 profiles behind the same API.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"],
    "es": ["el", "la", "los", "que", "de", "en", "es", "un", "una", "por"],
    "zh": [],  # no-space script: handled by the CJK-character ratio signal
}

STOPWORDS_EN = LANG_PROFILES["en"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), " ")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count (space-count + 1; exact, SQL-mirrorable)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(F.regexp_replace(c, " ", "")) + F.lit(1)).cast("long")


def token_count_regex(col: Column | str, pattern: str = "[A-Za-z0-9]+") -> Column:
    """BPE-ish token count: maximal alphanumeric runs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token stats, punctuation /
    stopword / whitespace ratios, plus a combined score. All ratios are
    single double divisions of exact integers → bit-stable."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count_ws(t)
    n_punct = (
        F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    ).cast("long")
    n_stop = F.size(F.filter(tokens(t), lambda x: x.isin(*STOPWORDS_EN))).cast("long")
    d = df.withColumns(
        {
            "n_chars_m": n_chars,
            "n_tokens": n_tokens,
            "n_punct": n_punct,
            "n_stop": n_stop,
        }
    )
    nc = F.col("n_chars_m").cast("double")
    nt = F.col("n_tokens").cast("double")
    return d.withColumns(
        {
            "punct_ratio": F.col("n_punct").cast("double") / nc,
            "stop_ratio": F.col("n_stop").cast("double") / nt,
            "avg_token_len": nc / nt,
        }
    )


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: per-language function-word hit counts plus a
    CJK character-ratio signal; argmax wins. Pure column expressions —
    one narrow pass, no shuffle."""
    toks = tokens(text_col)
    def _member_fn(words: list[str]):
        return lambda x: x.isin(*words)

    score_cols = {}
    for lang, words in LANG_PROFILES.items():
        if words:
            score_cols[f"score_{lang}"] = F.size(
                F.filter(toks, _member_fn(words))
            ).cast("double")
    # CJK ratio for no-space scripts
    cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", "")).cast("double")
    score_cols["score_zh"] = cjk
    d = df.withColumns(score_cols)
    pred = F.lit("und")
    best = F.lit(0.0)
    for lang in LANG_PROFILES:
        s = F.col(f"score_{lang}")
        pred = F.when(s > best, F.lit(lang)).otherwise(pred)
        best = F.when(s > best, s).otherwise(best)
    return d.withColumn("pred_lang", pred)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint (key-collision / OpenRefine style): md5 of the
    sorted distinct token set — whitespace/word-order/duplication
    insensitive. Used as a cheap canonical-form dedup key."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def lm_score(docs: DataFrame, vocab_k: int = 100, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Per-document unigram language-model score — the perplexity-style
    quality signal CCNet-class pipelines use to rank web text (there via a
    KenLM 5-gram; the unigram form keeps the same plumbing with a
    SQL-checkable oracle).

    Model: add-one-smoothed unigram LM over the corpus itself, restricted
    to the top-``vocab_k`` tokens (freq desc, token asc ties); everything
    else scores as one OOV bucket ln(1/(N+V)). Per-token log-probs are
    rounded to 8 dp and scaled to exact 1e8-integers so the per-document
    sum is an order-independent bigint (sums of raw doubles are not
    associative — see queries/_util.py); the single double division back
    out happens once at the end.

    Scale shape: one explode → (doc, token) groupBy (map-side combined),
    token-grain count whose top-K result is BROADCAST back, per-doc final
    agg. The LM table is vocab-bounded (50k rows at production K), so the
    corpus never reshuffles for the join. No Python anywhere."""
    pairs = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
    )
    counts = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    # corpus scalars (token mass N, vocab size V) ride along as a 1-row
    # broadcast — no driver collect, the plan stays lazy end-to-end
    scalars = counts.agg(
        F.sum("freq").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("v_total"),
    )
    vocab = (
        counts.orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(vocab_k)
        .crossJoin(F.broadcast(scalars))
        .select(
            "token",
            F.round(
                F.log((F.col("freq").cast("double") + 1.0)
                      / (F.col("n_total") + F.col("v_total"))) * 1e8
            ).cast("bigint").alias("lp"),
        )
    )
    oov_lp = (
        F.round(F.log(1.0 / (F.col("n_total") + F.col("v_total"))) * 1e8)
        .cast("bigint")
    )
    dt = pairs.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("n"))
    scored = (
        dt.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(scalars.select(oov_lp.alias("oov"))))
        .select(
            F.col(id_col),
            "n",
            F.coalesce("lp", "oov").alias("lp"),
            F.col("lp").isNull().alias("is_oov"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("n").alias("n_tokens"),
        F.sum(F.when(F.col("is_oov"), F.col("n")).otherwise(F.lit(0)))
        .alias("n_oov"),
        F.sum(F.col("n") * F.col("lp")).alias("sum_lp"),
        F.round(
            F.sum(F.col("n") * F.col("lp")).cast("double")
            / F.sum("n").cast("double") / 1e8,
            8,
        ).alias("avg_logprob"),
    )


_OOV = "\x01oov"  # sentinel outside any whitespace-token alphabet


def lm_bigram_score(docs: DataFrame, vocab_k: int = 100,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document BIGRAM language-model score (round 12) — one Markov
    order above :func:`lm_score`, the form whose perplexity ranking
    actually separates fluent text from token soup (CCNet uses a KenLM
    5-gram; the bigram keeps the same plumbing SQL-checkable).

    Model: tokens outside the top-``vocab_k`` unigram vocabulary map to
    one OOV symbol FIRST (the open-vocabulary trick that bounds every
    model table), then add-one-smoothed bigram probabilities
    P(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V) over the mapped
    alphabet, V = its distinct-symbol count.  Trained on the corpus
    itself, so after mapping every document bigram exists in the model
    — no unseen-pair branch.  Log-probs are rounded to 8 dp and scaled
    to exact 1e8-integers (the lm_score convention: the per-doc sum
    must be an order-independent bigint); docs with < 2 tokens have no
    bigram and contribute no row.

    Scale shape: one explode for the unigram vocabulary (top-K
    broadcast back), one per-doc bigram explode built from the token
    ARRAY (transform over index pairs — no positional self-join), one
    (doc, w1, w2) groupBy; every model table is ≤ (K+1)² rows and
    rides broadcast joins.  The corpus never reshuffles for the model."""
    base = docs.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    ).filter(F.size("_toks") >= 2)
    uni = docs.select(F.explode(tokens(text_col)).alias("token"))
    counts = uni.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    # Vocabulary to the DRIVER (≤ vocab_k rows — control-plane, the
    # kmeans-centroid convention) so token→id mapping is a literal map
    # PROJECTION instead of two broadcast joins per corpus pass; the
    # two remaining passes then shuffle/hash small ints, not string
    # pairs (round 12: strings cost 11 s in the bigram-count groupBy
    # alone at sf10).  Ids follow the vocab order (freq desc, token
    # asc); OOV = vocab_k (one past the last id).
    vocab_rows = (
        counts.orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(vocab_k)
        .collect()
    )
    oov_id = vocab_k
    vmap = F.create_map(
        *[
            x
            for i, r in enumerate(vocab_rows)
            for x in (F.lit(r["token"]), F.lit(i))
        ]
    )
    # V for add-one smoothing = |mapped alphabet| = distinct real
    # tokens capped at vocab_k, + 1 for the OOV symbol iff any token
    # fell outside the vocabulary — derived from the token counts
    # (40-row relation), NOT via a second corpus pass over the mapped
    # stream (identical by construction).
    v_total = counts.agg(
        (
            F.least(F.count_distinct("token"), F.lit(vocab_k))
            + (F.count_distinct("token") > vocab_k).cast("int")
        )
        .cast("double")
        .alias("v_total")
    )
    mids = F.transform(
        F.col("_toks"), lambda w: F.coalesce(vmap[w], F.lit(oov_id))
    )
    bi = base.withColumn("_mids", mids).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(1, size(_mids) - 1), "
                "i -> struct(_mids[i-1] AS m1, _mids[i] AS m2))"
            )
        ).alias("bg"),
    ).select(id_col, "bg.m1", "bg.m2")
    cb = bi.groupBy("m1", "m2").agg(F.count(F.lit(1)).alias("cb"))
    cl = cb.groupBy("m1").agg(F.sum("cb").alias("cl"))
    lm = (
        cb.join(F.broadcast(cl), "m1")
        .crossJoin(F.broadcast(v_total))
        .select(
            "m1",
            "m2",
            F.round(
                F.log(
                    (F.col("cb").cast("double") + 1.0)
                    / (F.col("cl").cast("double") + F.col("v_total"))
                )
                * 1e8
            ).cast("bigint").alias("lp"),
        )
    )
    # Score the exploded stream directly: the LM is broadcast, so the
    # join is map-side and the ONLY corpus shuffle is the final
    # map-side-combined groupBy to DOC grain (no intermediate
    # (doc, w1, w2) relation — that was nearly bigram-grain and paid a
    # second corpus shuffle).
    scored = bi.join(F.broadcast(lm), ["m1", "m2"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(
            F.when(
                (F.col("m1") == oov_id) | (F.col("m2") == oov_id), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("n_oov_bigrams"),
        F.sum("lp").alias("sum_lp"),
        F.round(
            F.sum("lp").cast("double")
            / F.count(F.lit(1)).cast("double")
            / 1e8,
            8,
        ).alias("avg_logprob"),
    )


def domain_kl(docs: DataFrame, by: str = "source", vocab_k: int = 100,
              text_col: str = "text") -> DataFrame:
    """Per-domain KL divergence KL(P_domain ‖ P_corpus) over the
    add-one-smoothed top-``vocab_k`` unigram distributions — the
    domain-shift / mixture-drift signal a curation pipeline watches
    when reweighting sources (round 12).

    Exactness: each vocabulary term's contribution
    p_d·(ln p_d − ln p_c) is ONE identical IEEE expression tree per
    engine, rounded to an exact 1e8-scaled integer BEFORE the sum — so
    the per-domain total is an order-independent bigint (the lm_score
    log convention applied termwise; a raw double Σ would not be
    associative).  Absent-in-domain vocabulary still contributes
    (add-one gives it mass), so the sum runs over the full
    (domain × mapped-vocab) grid.

    Scale shape: one corpus explode → token counts; the top-K vocab +
    OOV mapping bounds every downstream relation at (K+1)·|domains|
    rows; the grid is a cross join of two control-plane relations.
    Returns (domain, n_tokens, kl_scaled, kl) ordered by domain."""
    # ONE corpus pass: aggregate to (domain, token) counts first — the
    # map-side combine collapses the stream to |domains|·|vocab| rows —
    # then do the vocabulary mapping and every marginal on that tiny
    # relation (round 12: mapping the raw stream cost three corpus
    # explodes and 11 s at sf10; this shape pays one).
    dtok = (
        docs.select(
            F.col(by).alias("domain"),
            F.explode(tokens(text_col)).alias("token"),
        )
        .groupBy("domain", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    counts = dtok.groupBy("token").agg(F.sum("c").alias("freq"))
    vocab = (
        counts.orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(vocab_k)
        .select("token")
    )
    mapped = dtok.join(
        F.broadcast(vocab.withColumn("_in", F.lit(True))), "token", "left"
    ).select(
        "domain",
        F.when(F.col("_in"), F.col("token")).otherwise(F.lit(_OOV)).alias("m"),
        "c",
    )
    cd = mapped.groupBy("domain", "m").agg(F.sum("c").alias("cd"))
    cc = mapped.groupBy("m").agg(F.sum("c").alias("cc"))
    nd = mapped.groupBy("domain").agg(F.sum("c").alias("nd"))
    scal = cc.agg(
        F.sum("cc").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("v_total"),
    )
    grid = (
        nd.crossJoin(F.broadcast(cc))
        .join(cd, ["domain", "m"], "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "domain",
            "nd",
            (
                (F.coalesce("cd", F.lit(0)).cast("double") + 1.0)
                / (F.col("nd").cast("double") + F.col("v_total"))
            ).alias("pd"),
            (
                (F.col("cc").cast("double") + 1.0)
                / (F.col("n_total") + F.col("v_total"))
            ).alias("pc"),
        )
    )
    term = F.round(
        F.col("pd") * (F.log("pd") - F.log("pc")) * 1e8
    ).cast("bigint")
    return (
        grid.groupBy("domain")
        .agg(
            F.max("nd").alias("n_tokens"),
            F.sum(term).alias("kl_scaled"),
        )
        .select(
            "domain",
            "n_tokens",
            "kl_scaled",
            F.round(F.col("kl_scaled").cast("double") / 1e8, 8).alias("kl"),
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-``k`` terms per document by TF-IDF.

    Classic smooth-idf formulation: ``tf`` = term count in the doc, ``idf``
    = ln((1 + N) / (1 + df)) + 1 (never negative, never divides by zero),
    score = tf · idf. Scale shape: one explode → one (doc, term) groupBy,
    one term-grain groupBy for df whose result is broadcast back (term
    vocabulary ≪ corpus), one per-doc window for the top-k — no
    corpus-sized self-join anywhere. Ties break lexicographically so the
    result is deterministic. Score is rounded to 8 dp (transcendental-
    rounding contract, see queries/_util.py).
    """
    n_docs = docs.select(id_col).distinct().count()
    pairs = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = pairs.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = pairs.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    # idf is a per-TERM constant: join on the tiny vocabulary side,
    # broadcast so the (doc, term) grain never reshuffles.
    scored = tf.join(F.broadcast(df_), "term").select(
        F.col(id_col),
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.round(
            F.col("tf")
            * (F.log((1.0 + float(n_docs)) / (1.0 + F.col("df"))) + 1.0),
            8,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def feature_hash(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Hashing-trick vectorizer (Weinberger et al. 2009): map each token to
    one of 256 buckets by md5 prefix and count — the fixed-width sparse
    feature encoding (sklearn HashingVectorizer / Spark ml HashingTF
    shape) that needs NO fitted vocabulary, so it streams at corpus scale
    with one explode + one groupBy.  md5 (not xxhash64) keeps the bucket
    assignment engine-portable; output is the sparse (doc, bucket, tf)
    triplet form downstream ML consumes.
    """
    toks = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
    )
    bucket = F.conv(F.substring(F.md5("token"), 1, 2), 16, 10).cast("long")
    return (
        toks.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(docs: DataFrame, terms: tuple[str, ...],
              k: int = 50, k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BM25 keyword retrieval (Robertson/Spärck Jones probabilistic
    ranking): top-``k`` documents for a bag-of-terms query.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Scale shape: one explode → token pairs, the QUERY-TERM filter lands
    before the (doc, term) groupBy so only matching postings shuffle;
    df is a per-term scalar broadcast back; per-term scores pivot into
    fixed columns so the cross-term sum is a fixed-order expression (a
    groupBy SUM over doubles would be order-dependent → hash-unstable).
    The global top-k is orderBy+limit (TakeOrderedAndProject — no
    single-partition window over the corpus); rank is assigned after the
    limit on k rows. Determinism: per-term scores rounded 8 dp
    (transcendental contract), total = fixed-order sum of the rounded
    terms, ties broken by doc id."""
    toks = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.count()
    sum_dl = toks.count()
    avgdl = float(sum_dl) / float(n_docs)
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0
        + ((F.lit(float(n_docs)) - F.col("df")) + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + (F.lit(b) * F.col("dl")) / F.lit(avgdl)
    )
    s = F.round((idf * (F.col("tf") * F.lit(k1 + 1.0))) / denom, 8)
    scored = tf.join(F.broadcast(dfreq), "term").join(dl, id_col)
    per_doc = scored.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("term") == t, s)).alias(f"s_{t}")
            for t in terms
        ]
    )
    total = F.lit(0.0)
    for t in terms:
        total = total + F.coalesce(F.col(f"s_{t}"), F.lit(0.0))
    top = (
        per_doc.withColumn("score", F.round(total, 8))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rk", F.row_number().over(w).cast("long"))


def bpe_train(docs: DataFrame, n_merges: int = 5,
              text_col: str = "text") -> DataFrame:
    """Byte-pair-encoding merge training (Sennrich et al. 2016,
    arXiv:1508.07909): learn the ``n_merges`` most frequent adjacent
    symbol pairs, greedily, starting from characters.

    The Spark-first shape is the one real BPE trainers use: iterate over
    the WORD-TYPE table (distinct words + corpus counts — vocabulary-
    sized), never the corpus. Each round is (a) explode adjacent symbol
    pairs weighted by word count, (b) one tiny aggregate to pick the
    winner (count desc, pair asc tie-break — fully deterministic),
    (c) one narrow pass rewriting the symbol arrays with the merge
    applied. The corpus is touched exactly once (tokenize + count); the
    loop runs on data orders of magnitude smaller. Per-round lineage is
    checkpointed like every iterative operator in this repo.

    Returns (merge_rank, left, right, pair_count) — the learned merge
    table a tokenizer would apply."""
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.split(F.regexp_replace("w", "(.)", "$1\x00"), "\x00")
            .alias("syms"), "n",
        )
        .select(F.expr("filter(syms, s -> s != '')").alias("syms"), "n")
        .localCheckpoint(eager=True)
    )
    out_rows = []
    for rank in range(1, n_merges + 1):
        pairs = words.select(
            "n",
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1), "
                    "(s, i) -> struct(s AS l, syms[i + 1] AS r))"
                )
            ).alias("p"),
        ).filter(F.col("p.l").isNotNull() & F.col("p.r").isNotNull())
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        out_rows.append((rank, left, right, cnt))
        merged = left + right
        # rewrite each word's symbol array with the merge applied — as a
        # NATIVE string replace instead of the interpreted aggregate()
        # fold (round 14, guide §4.1: the HOF ran per-element per word
        # type per round and dominated the loop).  Greedy left-to-right
        # non-overlapping merging IS java's forward-scan replace() on a
        # delimited symbol string; boundaries are made unambiguous by
        # the double-separator encoding
        #     \0 sym \0\0 sym \0\0 ... \0\0 sym \0
        # — every symbol carries a \0 on each side, and each boundary
        # holds TWO so a replaced occurrence consumes one and leaves one
        # for the adjacent match ("a b a b" under (a,b) merges both
        # pairs, exactly like the fold; a symbol merely *ending* in
        # `left` or *starting* with `right` cannot false-match because
        # the pattern requires \0 on both flanks).  Symbols never
        # contain \0 (they are concatenations of split(regexp_replace
        # (w, '(.)', '$1\x00')) pieces — the same assumption the
        # tokenizer above already makes).
        sep = "\x00"
        joined = F.concat(
            F.lit(sep), F.array_join("syms", sep + sep), F.lit(sep)
        )
        replaced = F.replace(
            joined,
            F.lit(sep + left + sep + sep + right + sep),
            F.lit(sep + merged + sep),
        )
        words = (
            words.select(replaced.alias("_s"), "n")
            .select(
                F.split(
                    # strip the single outer \0 each end, split on \0\0
                    F.expr("substring(_s, 2, length(_s) - 2)"),
                    sep + sep,
                ).alias("syms"),
                "n",
            )
            .localCheckpoint(eager=True)
        )
    sc = docs.sparkSession
    return sc.createDataFrame(
        out_rows, "merge_rank int, left string, right string, pair_count bigint"
    )


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]],
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Apply a trained BPE merge table (bpe_train output) — segment every
    document into learned subword pieces and count them: the tokenizer
    half of the BPE pair, giving LEARNED-vocabulary token counts where
    token_count_* give heuristic ones.

    Spark-first shape mirrors the trainer: encode each distinct WORD TYPE
    once (vocabulary-sized Arrow-batched pandas UDF running the standard
    greedy lowest-rank-pair merge loop), then join the per-(doc, word)
    counts against the encoded vocabulary — broadcast, since
    |vocab| ≪ corpus — so the corpus text is scanned exactly once and no
    document passes through Python.

    Returns (id_col, n_words, n_pieces, pieces_per_word) — deterministic
    given a merge list; not SQL-expressible (iterative greedy rewriting).
    """
    rank = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("int")
    def n_pieces_of(words: pd.Series) -> pd.Series:

        def encode(word: str) -> int:
            syms = list(word)
            while len(syms) > 1:
                best_rank, best_pair = None, None
                for a, b in zip(syms, syms[1:]):
                    r = rank.get((a, b))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_pair = r, (a, b)
                if best_pair is None:
                    break
                a, b = best_pair
                out = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return len(syms)

        return words.map(encode).astype("int32")

    toks = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
    )
    per_word = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = per_word.select("w").distinct().withColumn(
        "n_sub", n_pieces_of(F.col("w"))
    )
    return (
        per_word.join(F.broadcast(vocab), "w")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_sub")).cast("long").alias("n_pieces"),
        )
        .withColumn(
            "pieces_per_word",
            F.round(
                F.col("n_pieces").cast("double") / F.col("n_words").cast("double"),
                8,
            ),
        )
    )


IDF_SCALE = 10_000  # fixed-point idf scale for tfidf_cosine_pairs


def tfidf_cosine_pairs(
    docs: DataFrame,
    shingle_k: int = 3,
    max_df: int = 20,
    min_cos: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All document pairs with idf-weighted cosine similarity >=
    ``min_cos`` over distinct word ``shingle_k``-shingles — sparse-vector
    near-duplicate detection in weighted shingle space (the idf-weighted
    complement of llm/dedup.py's unweighted Jaccard: a shared rare
    shingle counts for more than a shared boilerplate one).

    The subquadratic shape is the inverted index + document-frequency cap
    (Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity Search"):
    only shingles with df <= ``max_df`` generate candidate pairs, so one
    shingle's posting-list self-join is at most max_df^2 and total pair
    work is sum-over-shingles of df^2 — bounded by construction, never
    |corpus|^2. High-df shingles carry near-zero idf anyway, so dropping
    them from pair generation loses almost nothing; norms are computed
    over the same capped shingle space, so the reported cosine is exact
    within that space (the same hot-shingle-cap contract as
    dedup.ngram_jaccard_pairs).

    Determinism: weights are exact integers ``round(idf * 1e4)`` (smooth
    idf, ln((1+N)/(1+df)) + 1 — the tfidf_top_terms convention; shingles
    are DISTINCT per doc so tf == 1); dot products and squared norms are
    exact BIGINT sums (order-independent), and the final cosine is three
    correctly-rounded IEEE ops (sqrt, multiply, divide) on exact
    integers — identical in Spark and DuckDB, so the oracle hash-matches.

    Headroom: w <= (ln(1+N)+1) * 1e4 ~= 2.2e5 at N=1e9 docs; per-pair
    dot <= doc_shingles * w^2 ~= 1e3 * 4.8e10 ~= 5e13 < 2^63.
    """
    from fossa_spark.llm.dedup import word_shingles

    n_docs = docs.select(id_col).distinct().count()
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, k=shingle_k)).alias("term"),
    )
    df_ = sh.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")  # shingles are distinct per doc
    ).filter(F.col("df") <= max_df)
    # Round 14 (guide §5): the weighted posting list feeds THREE consumers
    # (norms, both sides of the pair self-join), each otherwise replaying
    # the corpus scan + shingle explode + df join.  Persist it; the final
    # (small, cos-filtered) pair set is checkpointed eagerly below so the
    # cache can be released before returning.
    inv = sh.join(F.broadcast(df_), "term").select(
        "term",
        "doc",
        F.round(
            (F.log((1.0 + float(n_docs)) / (1.0 + F.col("df"))) + 1.0)
            * F.lit(float(IDF_SCALE))
        )
        .cast("bigint")
        .alias("w"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    norms = inv.groupBy("doc").agg(F.sum(F.col("w") * F.col("w")).alias("nn"))
    a = inv.select(F.col("term"), F.col("doc").alias("doc_a"), F.col("w").alias("wa"))
    b = inv.select(F.col("term"), F.col("doc").alias("doc_b"), F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot_q"))
    )
    cos = F.col("dot_q").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    pairs = (
        dots.join(norms.select(F.col("doc").alias("doc_a"), F.col("nn").alias("na")), "doc_a")
        .join(norms.select(F.col("doc").alias("doc_b"), F.col("nn").alias("nb")), "doc_b")
        .select("doc_a", "doc_b", "dot_q", F.round(cos, 8).alias("cos"))
        .filter(F.col("cos") >= min_cos)
        .localCheckpoint()
    )
    inv.unpersist()
    return pairs
