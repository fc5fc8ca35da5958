"""Trained quality classifier: hashed-feature logistic regression in
fixed-point (round 9, VERDICT r8 item 3).

Real curation pipelines gate documents on a *discriminative* model —
CCNet trains a fastText classifier against a reference corpus and keeps
what scores well (Wenzek et al. 2020); the unigram-LM perplexity score
(llm/text.py lm_score) is the generative cousin.  This module trains the
Spark-native equivalent of that gate: logistic regression over
hashing-trick bag-of-words features (Weinberger et al. 2009, the same
256-bucket md5 hashing as text.py feature_hash), full-batch gradient
descent, every quantity an INTEGER at a fixed scale.

Fixed-point discipline (the graph.py pagerank convention, extended to
signed values): floats are engine-lottery — a parallel float sum is
order-dependent and exp() differs across libms — so training would never
be oracle-checkable with them.  Instead:

- weights, logits, probabilities live at scale S = 1e6 (bigint);
- the sigmoid is the HARD sigmoid  σ̃(z) = clamp(1/2 + z/4, 0, 1)
  (Courbariaux et al. 2016 use exactly this piecewise form for trainable
  low-precision nets) — in fixed point: clamp(S/2 + z div 4, 0, S);
- every division is exact floor division via  (a - pmod(a, b)) / b :
  the numerator is made exactly divisible first, so Spark's truncating
  `div`, DuckDB's truncating `//`, and IEEE double division all return
  the same integer (the double path is exact because |numerator| < 2^53
  and the true quotient is an integer, hence representable — correctly
  rounded division returns representable results exactly).

The result: THE SAME integers on any engine, any partitioning, any
parallelism — so the entire 3-iteration training run sits under a
DuckDB SQL oracle (q_quality_model re-derives it with unrolled CTEs),
the way q_pagerank pinned power iteration.

Scale shape (100 TB): the feature relation (doc, bucket, tf) is built
once (explode + map-side-combined groupBy) and persisted; each GD
iteration is two bounded aggregations over it — logits per doc (groupBy
doc_id), gradient per bucket (groupBy f: at most 257 reducer keys) — and
the weight relation itself is 257 rows, broadcast into both joins and
never collected to the driver.  No iteration's shuffle width depends on
corpus size; the weight state is O(buckets), not O(docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

SCALE = 1_000_000  # fixed-point scale for weights / logits / probabilities
N_BUCKETS = 256    # md5-prefix hashing buckets (text.py feature_hash parity)
BIAS = N_BUCKETS   # the intercept rides as one extra always-on feature
NTOK = N_BUCKETS + 1  # mean-centered token-count feature (see below)


def _fdiv(a: Column, b: Column | int) -> Column:
    """Exact floor division for signed bigints, engine-portable.

    ``a - pmod(a, b)`` is exactly divisible by ``b``, so the quotient is
    an integer no matter the engine's rounding mode (truncate vs floor
    differ only on inexact negative quotients).  The `/` here is double
    division, exact because the operands stay under 2^53 and the true
    quotient is representable (see module docstring).

    The 2^53 precondition is ENFORCED, not assumed (review r9): a
    gradient sum can cross it once a feature bucket's token mass passes
    ~9e9 (a 100 TB corpus is ~1e13 tokens over 258 buckets), and past it
    the double division silently rounds while DuckDB's integer ``//``
    stays exact — the cross-engine divergence this whole design exists
    to prevent.  Overflow raises loudly; the fix at that scale is a
    larger ``lr_denom``-style rescale or training on a capped sample,
    not a silent ±1 on the weights.
    """
    b = F.lit(b) if isinstance(b, int) else b
    # guard the POST-pmod numerator, not `a`: for negative a the
    # divisible numerator is up to b-1 larger in magnitude than a, so a
    # guard on |a| alone admits a band just under 2^53 that still rounds
    # (review r9); |m| < 2^53 also bounds the quotient, so the division
    # below is exact whenever the guard passes
    m = a - F.pmod(a, b)
    m = F.when(
        F.abs(m) < F.lit(1 << 53), m
    ).otherwise(
        F.raise_error(
            F.lit("fixed-point overflow: |numerator| >= 2^53 — rescale "
                  "(larger lr_denom / capped training sample) before "
                  "dividing")
        )
    )
    return (m / b).cast("long")


def _ntok(text_col: str) -> Column:
    """Whitespace token count — text.py's token_count_ws IS the
    convention; import it rather than restating the expression (review
    r9: two copies of the same convention drift)."""
    from fossa_spark.llm.text import token_count_ws

    return token_count_ws(text_col)


def mean_token_count(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """1-row relation (mt) = floor(Σ token_count / N) — the centering
    constant for the NTOK feature.  Part of the trained model: scoring
    must center with the TRAINING corpus mean (standardization parameters
    travel with the weights, the sklearn-pipeline rule)."""
    return docs.agg(
        _fdiv(F.sum(_ntok(text_col)), F.count(F.lit(1))).alias("mt")
    )


def hashed_features(
    docs: DataFrame,
    mean_tok: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, f, cnt) hashing-trick features + two dense rows per document:
    the bias (f = 256, cnt = 1) and the MEAN-CENTERED token count
    (f = 257, cnt = ntok - corpus_mean).  md5-prefix bucketing is the
    feature_hash convention, so the oracle mirrors it with the
    '0x'||substr(md5(..)) cast.

    The centered count is what makes the model trainable in a handful of
    fixed-point GD steps: raw bag-of-words counts are all non-negative,
    so every reachable weight vector scores every document on the same
    side of zero until the bias slowly catches up (measured: the gate
    never left the majority class in ≤10 iterations).  A signed,
    roughly zero-mean length feature hands GD a one-step separable
    direction — the standard mean-centering preprocessing, exact in
    integers, and a length feature is in every real quality scorer
    (q_text_quality included)."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.lower(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    f = F.conv(F.substring(F.md5("token"), 1, 2), 16, 10).cast("long")
    feats = (
        toks.select(F.col(id_col), f.alias("f"))
        .groupBy(id_col, "f")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bias = docs.select(
        F.col(id_col), F.lit(BIAS).cast("long").alias("f"),
        F.lit(1).cast("long").alias("cnt"),
    )
    ntok = docs.crossJoin(F.broadcast(mean_tok)).select(
        F.col(id_col), F.lit(NTOK).cast("long").alias("f"),
        (_ntok(text_col) - F.col("mt")).alias("cnt"),
    )
    return feats.unionByName(bias).unionByName(ntok)


def train_quality_lr(
    docs: DataFrame,
    label: Column,
    iters: int = 3,
    lr_denom: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Full-batch fixed-point logistic regression; returns (weights,
    mean_tok) — the weight relation (f, w) at scale SCALE plus the 1-row
    centering relation scoring must reuse.

    Per iteration (all integers):
      z_i   = Σ_f w_f · cnt_if                     (logit, scale S)
      p_i   = clamp(S/2 + z_i div 4, 0, S)          (hard sigmoid)
      e_i   = p_i - y_i·S                           (signed error)
      g_f   = Σ_i e_i · cnt_if                      (gradient)
      w_f  -= g_f div (N · lr_denom)                (step, lr = 1/lr_denom)

    ``label`` is a 0/1 integer Column over ``docs``.  N is carried as a
    broadcast 1-row aggregate (never a driver collect).  Weights start at
    zero for every bucket that occurs in the corpus; buckets that never
    occur stay out of the relation (their weight is definitionally 0 and
    they can never receive gradient)."""
    # deliberately NOT checkpointed: as a visible zero-key aggregate the
    # crossJoin(broadcast(mean_tok)) is plan-provably |A|x1 (the
    # scale_smells scalar-BNLJ exemption); a checkpoint would hide the
    # shape behind an opaque RDD scan.  The recompute cost is one narrow
    # pass, absorbed by feats' persist during training.
    mean_tok = mean_token_count(docs, text_col)
    # Round 15 (guide §2.4 — share one exchange): persist BOTH training
    # relations hash-partitioned on the doc id.  Every iteration's
    # corpus-scale operators are keyed on it — the logit groupBy, the
    # error join, and the gradient's feats⋈err join — so with the
    # layout established once, each iteration re-shuffles NOTHING at
    # corpus grain; its only exchange is the ≤258-key gradient groupBy.
    # The unpartitioned form re-exchanged the token-grain relation
    # twice per iteration (the graph.py pre-partitioned-edges lesson,
    # r14).  (An Arrow/driver-fold trainer was A/B'd this round and
    # measured OUT: shipping the token-grain layout across the Python
    # boundary once per iteration cost more than the JVM joins —
    # cold 23.4 vs 14.0 s; see BENCHLOG.)
    feats = hashed_features(docs, mean_tok, id_col, text_col).repartition(
        F.col(id_col)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    y = docs.select(
        F.col(id_col), label.cast("long").alias("y")
    ).repartition(F.col(id_col)).persist(StorageLevel.MEMORY_AND_DISK)
    consts = y.agg(
        (F.count(F.lit(1)) * F.lit(lr_denom)).cast("long").alias("k")
    )
    w = feats.select("f").distinct().select(
        "f", F.lit(0).cast("long").alias("w")
    )
    for _ in range(iters):
        z = (
            feats.join(F.broadcast(w), "f")
            .groupBy(id_col)
            .agg(F.sum(F.col("cnt") * F.col("w")).alias("z"))
        )
        p = F.least(
            F.greatest(F.lit(SCALE // 2) + _fdiv(F.col("z"), 4), F.lit(0)),
            F.lit(SCALE),
        )
        err = z.join(y, id_col).select(
            F.col(id_col), (p - F.col("y") * F.lit(SCALE)).alias("e")
        )
        # err is corpus-sized (one row per doc) — a plain shuffle join,
        # never a broadcast; the groupBy lands on ≤257 reducer keys with
        # map-side combine, so the gradient is a bounded aggregate
        grad = (
            feats.join(err, id_col)
            .groupBy("f")
            .agg(F.sum(F.col("e") * F.col("cnt")).alias("g"))
        )
        # every f occurs in ≥1 doc and every doc has an error row, so the
        # inner join is complete by construction; consts joins the
        # 257-row relation, not the corpus
        w = w.join(grad, "f").crossJoin(F.broadcast(consts)).select(
            "f", (F.col("w") - _fdiv(F.col("g"), F.col("k"))).alias("w")
        )
        # truncate lineage EVERY round: the weight state is ≤257 rows, so
        # an eager localCheckpoint costs one tiny job — and without it
        # each iteration's weight subtree is re-executed inside the NEXT
        # iteration's broadcast builds (z and grad both embed w), so the
        # work per round compounds instead of staying constant (measured:
        # batching checkpoints to every 3rd round REGRESSED 4.1 → 6.7 s
        # warm at sf0.1 — the job-boundary saving never beats the
        # re-execution).  This is the iterative-state discipline: small
        # state, materialize each round.
        w = w.localCheckpoint(eager=True)
    feats.unpersist()
    y.unpersist()
    return w, mean_tok


def score_quality_lr(
    docs: DataFrame,
    weights: DataFrame,
    mean_tok: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents with a trained model (weight relation + centering
    constant): (id, score = logit at scale S, prob_fp = hard-sigmoid at
    scale S, keep = prob ≥ 1/2).  One feature pass + one broadcast join +
    one groupBy — the gate is a pure column expression over the
    aggregate, no Python in the loop."""
    feats = hashed_features(docs, mean_tok, id_col, text_col)
    z = (
        feats.join(F.broadcast(weights), "f")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("score"))
    )
    p = F.least(
        F.greatest(F.lit(SCALE // 2) + _fdiv(F.col("score"), 4), F.lit(0)),
        F.lit(SCALE),
    )
    return z.select(
        F.col(id_col),
        "score",
        p.alias("prob_fp"),
        (p >= F.lit(SCALE // 2)).alias("keep"),
    )
