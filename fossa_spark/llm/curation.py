"""Training-data curation operators: PII redaction, benchmark-contamination
checks, deterministic sampling, repetition filtering, dup-cluster retention.

These are the corpus-hygiene passes a 100 TB pretraining pipeline runs after
dedup (fossa_spark.llm.dedup) and quality scoring (fossa_spark.llm.text).
Scale design:
- Redaction / repetition stats are narrow per-row column expressions
  (JVM regex / array ops, whole-stage codegen) — zero shuffle.
- Contamination joins the corpus n-gram set against a BENCHMARK n-gram set;
  the benchmark side is small by construction (eval suites are KBs, not TBs)
  so it broadcasts — per-gram fan-in is bounded by benchmark df, never by
  corpus df.
- Sampling is hash-deterministic (md5 of a stable key), so it needs no RNG
  state, is reproducible across engines/runs, and pushes down as a cheap
  filter; fixed-N-per-stratum uses one window over the stratum key.
- Retention joins the connected-component labels (dedup.connected_components)
  back to documents and keeps argmax(quality) per cluster — one shuffle on
  component.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fossa_spark.llm.dedup import word_shingles

# Redaction patterns are applied IN ORDER (email first: its matches contain
# dot-runs an IP pattern could partially claim). Java regex and RE2/DuckDB
# agree on this subset (classes, bounded repeats, \b, \d).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Redact PII spans and count them per category.

    Adds ``redacted`` (text with each match replaced by its tag) and one
    ``n_<name>`` count column per pattern. Counts are taken on the INPUT
    text (before any replacement) so categories don't steal each other's
    matches; replacements run in pattern order on a running column.
    Pure regexp_replace/regexp_extract_all — narrow, codegen'd, no Python.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = df
    red: Column = F.col(text_col)
    for name, pat, tag in pats:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).cast(
                "long"
            ),
        )
        red = F.regexp_replace(red, pat, tag)
    return out.withColumn("redacted", red)


def contamination_check(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Benchmark-contamination scan: for each training document, how many
    benchmark documents share at least one word k-gram, and how many
    distinct k-grams overlap.

    The benchmark n-gram relation is broadcast (eval sets are tiny relative
    to the corpus), so the gram equi-join never shuffles the corpus and
    per-gram fan-in is bounded by the benchmark's gram frequency. Returns
    (id, n_bench_docs, n_gram_hits) for contaminated documents only.
    """
    tg = train.select(
        F.col(id_col).alias("t_id"),
        F.explode(word_shingles(text_col, k)).alias("gram"),
    )
    bg = bench.select(
        F.col(id_col).alias("b_id"),
        F.explode(word_shingles(text_col, k)).alias("gram"),
    )
    hits = tg.join(F.broadcast(bg), "gram")
    return (
        hits.groupBy("t_id")
        .agg(
            F.countDistinct("b_id").alias("n_bench_docs"),
            F.countDistinct("gram").alias("n_gram_hits"),
        )
        .select(F.col("t_id").alias(id_col), "n_bench_docs", "n_gram_hits")
    )


def hash_sample(
    df: DataFrame, key: Column | str, fraction: Column | float
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff the first 4 hex chars
    of md5(key) fall below the fraction of the 16⁴ space.

    No RNG state → reproducible across runs, engines, and partitionings
    (unlike df.sample, whose output depends on split layout), and the
    predicate pushes down like any filter. ``fraction`` may be a per-row
    Column for stratified rates."""
    kc = F.col(key) if isinstance(key, str) else key
    frac = F.lit(fraction) if isinstance(fraction, float) else fraction
    bucket = F.conv(F.substring(F.md5(kc.cast("string")), 1, 4), 16, 10).cast("long")
    return df.filter(bucket < (frac * F.lit(65536.0)).cast("long"))


def stratified_fixed_n(
    df: DataFrame, stratum_col: str, key: Column | str, n: int
) -> DataFrame:
    """Deterministic fixed-N-per-stratum sample: rank rows inside each
    stratum by md5(key) (a uniform, reproducible shuffle order) and keep the
    first N. One window shuffle on the stratum key; ties broken by the key
    itself so the result is total-ordered and engine-independent."""
    kc = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(stratum_col).orderBy(F.md5(kc.cast("string")), kc)
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= n)
    )


def hash_split(
    df: DataFrame,
    key: Column | str,
    cuts: tuple[int, int] = (0xCC, 0xE6),
    names: tuple[str, str, str] = ("train", "val", "test"),
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket each row by the first
    two hex chars of md5(key) (256 buckets) and cut the space at ``cuts``.

    Defaults give ~79.7% / 10.2% / 10.1% — the exact fractions are
    byte-boundary multiples of 1/256, so the comparison is integer-exact and
    identical in every engine. The split is a pure narrow projection (no
    shuffle, no RNG state): re-running on any partitioning, engine, or day
    yields the same assignment, which is what makes the split *auditable* —
    a given doc_id is provably always in the same fold. Reference analogue:
    ayeaye models express this as user Python per row; here it's one
    codegen'd expression at 100 TB scan speed."""
    kc = F.col(key) if isinstance(key, str) else key
    bucket = F.conv(F.substring(F.md5(kc.cast("string")), 1, 2), 16, 10).cast("int")
    lo, hi = cuts
    return df.withColumn(
        "split",
        F.when(bucket < lo, names[0]).when(bucket < hi, names[1]).otherwise(names[2]),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition features: duplicate-token and
    duplicate-bigram fractions. High values ⇒ boilerplate / degenerate text.

    Pure array expressions over the token list — narrow pass, no shuffle,
    no Python. Fractions are single double divisions of exact ints."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks)
    # two shifted slices zipped — O(1) array ops per row instead of one
    # slice per window position (HOFs are interpreted; see word_shingles)
    width = F.greatest(n - F.lit(1), F.lit(1))
    zipped = F.arrays_zip(F.slice(toks, 1, width), F.slice(toks, 2, width))
    bigrams = F.transform(zipped, lambda s: F.concat_ws(" ", s["0"], s["1"]))
    d = df.withColumns(
        {
            "n_tokens": n.cast("long"),
            "n_uniq_tokens": F.size(F.array_distinct(toks)).cast("long"),
            "n_bigrams": F.size(bigrams).cast("long"),
            "n_uniq_bigrams": F.size(F.array_distinct(bigrams)).cast("long"),
        }
    )
    return d.withColumns(
        {
            "dup_token_frac": F.round(
                F.lit(1.0)
                - F.col("n_uniq_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                8,
            ),
            "dup_bigram_frac": F.round(
                F.lit(1.0)
                - F.col("n_uniq_bigrams").cast("double")
                / F.col("n_bigrams").cast("double"),
                8,
            ),
        }
    )


def pack_chunks(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    tokens_col: Column,
    budget: int,
) -> DataFrame:
    """Sequence-packing chunk assignment: stream documents per stratum in a
    deterministic order and cut the stream into fixed token-budget chunks
    (the pack-and-straddle layout pretraining loaders use — a document
    belongs to the chunk its first token lands in).

    chunk_id = floor(tokens_before_this_doc / budget), where tokens_before
    is a running window sum — one shuffle on the stratum key, then a
    single window pass. Deterministic given the order column, and
    SQL-mirrorable (unlike greedy reset-at-boundary packing, which is
    inherently sequential)."""
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumns(
        {
            "n_tok": tokens_col.cast("long"),
            "chunk_id": F.floor(before / F.lit(budget)).cast("long"),
        }
    )


def chunk_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking (token windows of ``size`` every
    ``size - overlap``) — the RAG/context-window segmentation op. Pure
    array expressions: tokenize once, posexplode the window starts, slice
    per window; narrow (zero shuffle), so it streams over a 100 TB corpus
    as a map-only pass. The final short window is kept (standard loaders
    pad it); single-window docs emit exactly one chunk."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    toks = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks)
    # window starts: 0, step, 2*step, ... strictly below n (≥1 for any doc)
    starts = F.sequence(
        F.lit(0), F.greatest(F.ceil((n - F.lit(size)) / F.lit(step)), F.lit(0)) * step,
        F.lit(step),
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"), n.alias("_n"),
                  F.posexplode(starts).alias("chunk_idx", "_start"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("_start").cast("long").alias("start_tok"),
            F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("_start") + 1, size)
            ).alias("chunk_text"),
            F.least(F.col("_n") - F.col("_start"), F.lit(size))
            .cast("long").alias("n_tok"),
        )
    )


# Domains a corpus pipeline drops (stand-in for the usual blocklists —
# spam/SEO/adult lists in a real deployment).
DOMAIN_BLOCKLIST = ["spam.example", "seo-farm.example", "adult.example"]


def extract_domains(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Extract http(s) URL domains mentioned in each document.

    Adds ``domains`` (distinct lowercased hostnames) — a narrow regex
    pass. Filtering against a blocklist is then a broadcast semi/anti
    join or an array predicate; see q_url_filter."""
    urls = F.regexp_extract_all(
        F.col(text_col), F.lit(r"https?://([A-Za-z0-9.-]+)"), F.lit(1)
    )
    return df.withColumn("domains", F.array_distinct(F.transform(urls, F.lower)))


def keep_best_per_cluster(
    components: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Dup-cluster retention policy: for each connected component of the
    near-duplicate graph, keep the highest-quality document (ties → lowest
    id). Input ``components`` is (id_col, component) from
    dedup.connected_components. One shuffle on component; the per-cluster
    argmax is a window over groups whose size is bounded by cluster size.

    Returns (component, kept_id, cluster_size)."""
    joined = components.join(docs.select(id_col, quality_col), id_col)
    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    ranked = joined.withColumn("_rk", F.row_number().over(w))
    return (
        ranked.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min(F.when(F.col("_rk") == 1, F.col(id_col))).alias("kept_id"),
        )
        .select("component", "kept_id", "cluster_size")
    )


def write_training_shards(
    docs: DataFrame,
    components: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_col: str = "n_chars",
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Global dedup-aware SHARD WRITER (round 8) — the step after
    split/pack/mix: materialize the curated corpus as the deterministic,
    size-balanced shard files a training run actually consumes, plus an
    oracle-checkable manifest.

    Layout contract:
    - dedup-cluster-EXCLUSIVE: ``components`` is the near-dup graph's
      (id, component) labeling (dedup.connected_components); only the
      best doc per cluster (argmax ``quality_col``, ties → lowest id —
      keep_best_per_cluster) is written, singletons pass through.
    - hash-bucketed: shard = int(md5('shard:'||id)[:2], 16) % n_shards —
      pure function of the doc id, so re-runs, engines, and partition
      layouts all agree, and expected shard sizes are balanced to
      |corpus|/n_shards (md5 uniformity).
    - intra-shard shuffled: rows are ordered by a seeded hash
      (md5('pos:'||id)) — the global-shuffle pass a training loader
      needs so a shard isn't sorted by crawl/source order.  Carried by
      the FILE order (sortWithinPartitions before a one-file-per-shard
      write), not a materialized position column: at 100 TB a per-shard
      row_number would serialize each shard through one task, while a
      sort-within-partition rides the existing shuffle.
    - manifest: one row per shard with n_docs, n_tokens (whitespace
      convention), content_sum (order-independent sum of 40-bit
      md5(id:text) row digests; per-SHARD sums stay far under int64 as
      long as n_shards scales with the corpus — any lost/duplicated/mutated row moves
      it), first_doc (head of the shuffle order — pins the permutation's
      seed), min/max doc id.  Computed from the RE-READ shard files, so
      the oracle checks the written artifact, not the plan that produced
      it.

    Layout is two-level ``shard=N/batch=base``: the ``batch`` partition
    column is what lets :func:`append_to_shards` later read ONLY its own
    appended files (directory pruning) and keep per-batch manifest
    deltas exact across repeated appends.

    One shuffle on component (retention — a plain join: the per-cluster
    best relation is O(#clusters) and must NOT be force-broadcast, AQE
    picks the strategy the stats deserve), one on shard (placement); the
    manifest aggregation is a second pass over the written files.
    """
    spark = docs.sparkSession
    sid = F.col(id_col).cast("string")
    best = keep_best_per_cluster(components, docs, id_col, quality_col)
    labeled = docs.select(id_col, text_col).join(
        components.select(id_col, "component"), id_col, "left"
    )
    kept = (
        labeled.join(best.select("component", "kept_id"), "component", "left")
        .filter(F.col("component").isNull() | (F.col(id_col) == F.col("kept_id")))
        .select(id_col, text_col)
    )
    from fossa_spark.llm.text import token_count_ws

    n_tok = token_count_ws(text_col)
    sharded = kept.select(
        F.col(id_col),
        F.col(text_col),
        n_tok.alias("n_tok"),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("shard:"), sid)), 1, 2),
                   16, 10).cast("int") % n_shards
        ).alias("shard"),
        F.conv(
            F.substring(F.md5(F.concat(sid, F.lit(":"), F.col(text_col))), 1, 10),
            16, 10,
        ).cast("long").alias("row_hash"),
        F.md5(F.concat(F.lit("pos:"), sid)).alias("pos_key"),
        F.lit("base").alias("batch"),
    )
    # Sort by the dynamic-partition write's REQUIRED ordering prefix
    # (shard, batch) so Spark does not insert its own second sort — and
    # so the intra-shard pos_key file order is guaranteed by THIS sort,
    # not by the stability of the one Spark would otherwise add
    # (advisor r8: TimSort stability is an implementation detail).
    writer = (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "batch", "pos_key", id_col)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        # Escape hatch for extreme scale: without it one task serializes
        # a whole shard into a single file (and an md5-bucket collision
        # can route two shards through one task).  The manifest is
        # file-count-agnostic (it aggregates the re-read rows) and the
        # epoch order keys on pos_key, so splitting files preserves both.
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.partitionBy("shard", "batch").parquet(out_dir)
    return shard_manifest(spark, out_dir, id_col=id_col)


def shard_manifest(
    spark, out_dir: str, id_col: str = "doc_id", batch: str | None = None
) -> DataFrame:
    """Per-shard manifest aggregated from the WRITTEN shard files (the
    artifact, not the plan) — optionally restricted to one append batch
    (``batch`` filters the partition column: directory pruning, so a
    delta read never touches the base files)."""
    written = spark.read.parquet(out_dir)
    if batch is not None:
        written = written.filter(F.col("batch") == batch)
    return (
        written.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("row_hash").alias("content_sum"),
            F.expr(f"min_by({id_col}, pos_key)").alias("first_doc"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .orderBy("shard")
    )


def append_to_shards(
    new_docs: DataFrame,
    keep: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_tag: str | None = None,
) -> DataFrame:
    """Incremental half of the shard layout (round 8) — the daily-batch
    path into :func:`write_training_shards`'s artifact: a probed batch's
    KEPT docs (``keep`` = (id_col, keep bool), e.g.
    dedup.incremental_exact_dedup's output) are placed by the SAME
    deterministic hash-bucket function the base layout used — placement
    is a pure function of the doc id, so an appended doc lands in the
    shard it would have been in had it arrived with the original corpus
    — and appended under a fresh ``shard=N/batch=<tag>`` partition
    (parquet append: base files are never touched, a crashed append
    leaves them intact).

    Returns THIS batch's per-shard MANIFEST DELTA (appended n_docs /
    n_tokens / content_sum / min-max id — same digest math as the base
    manifest), computed from the re-read appended files: base manifest +
    every batch's delta = the manifest a full rebuild over corpus + all
    novel docs would produce, which is what makes appends auditable
    without rereading the base.  ``batch_tag`` names the batch partition
    (a fresh uuid tag when omitted); because the delta filters on the
    ``batch`` PARTITION column, repeated daily appends each get their
    own exact delta (never cumulative) and the delta read prunes to the
    batch's directories — the base corpus is never re-listed or re-read.

    One narrow placement pass + one append write + one batch-sized
    aggregation pass.
    """
    import os
    import uuid

    spark = new_docs.sparkSession
    tag = batch_tag or f"b{uuid.uuid4().hex[:12]}"
    # Guard the audit invariant (advisor r8): batch='base' would
    # commingle the append with the original corpus partitions, and a
    # REUSED tag would make this call's "delta" cumulative over the
    # earlier append — both silently break base + deltas == rebuild.
    if tag in ("base", "compact"):
        raise ValueError(
            f"batch_tag={tag!r} is reserved (write_training_shards / "
            "compact_shards partitions)"
        )
    if any(
        os.path.isdir(os.path.join(out_dir, d, f"batch={tag}"))
        for d in (os.listdir(out_dir) if os.path.isdir(out_dir) else [])
        if d.startswith("shard=")
    ):
        raise ValueError(
            f"batch_tag={tag!r} already exists under {out_dir}; appending "
            "would make the returned delta cumulative. Use a fresh tag."
        )
    # a tag whose directories were FOLDED AWAY by compact_shards would
    # pass the directory check above — the sidecar keeps the reuse guard
    # alive across compactions (a replayed already-compacted append would
    # otherwise double-append silently)
    if tag in _consumed_batch_tags(out_dir):
        raise ValueError(
            f"batch_tag={tag!r} was already appended and folded into the "
            f"layout by compact_shards (see _consumed_batches.json under "
            f"{out_dir}). Use a fresh tag."
        )
    sid = F.col(id_col).cast("string")
    kept = new_docs.select(id_col, text_col).join(
        keep.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    )
    from fossa_spark.llm.text import token_count_ws

    n_tok = token_count_ws(text_col)
    placed = kept.select(
        F.col(id_col),
        F.col(text_col),
        n_tok.alias("n_tok"),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("shard:"), sid)), 1, 2),
                   16, 10).cast("int") % n_shards
        ).alias("shard"),
        F.conv(
            F.substring(F.md5(F.concat(sid, F.lit(":"), F.col(text_col))), 1, 10),
            16, 10,
        ).cast("long").alias("row_hash"),
        F.md5(F.concat(F.lit("pos:"), sid)).alias("pos_key"),
        F.lit(tag).alias("batch"),
    )
    (
        placed.repartition(n_shards, F.col("shard"))
        # (shard, batch) prefix: satisfy the dynamic-partition write's
        # required ordering directly — see write_training_shards.
        .sortWithinPartitions("shard", "batch", "pos_key", id_col)
        .write.mode("append")
        .partitionBy("shard", "batch")
        .parquet(out_dir)
    )
    written = spark.read.parquet(out_dir).filter(F.col("batch") == tag)
    return (
        written.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("row_hash").alias("content_sum"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .orderBy("shard")
    )


def apply_mixture(
    df: DataFrame,
    alpha: float = 0.7,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ENFORCE temperature-scaled mixing weights (round 9) — the
    materialization step after :func:`mixing_weights` computes the
    targets: deterministically subsample each source so one epoch of the
    kept corpus has token shares ∝ the smoothed weights.

    The epoch budget is T = min_s(tokens_s / w_s): the most
    UNDER-represented-relative-to-target source is kept in full (rate
    1.0) and every other source is thinned to rate_s = w_s·T/tokens_s —
    the standard multinomial-mixture sampling of multi-source
    pretraining (upweighting a small source beyond 1.0 means REPEATING
    data, an epoch-schedule decision, not a filter's).

    Keep/drop is the hash-Bernoulli convention (md5-derived 32-bit
    uniform, 'mix:'-salted so it is independent of the other samplers'
    coins), so the subsample is reproducible across engines, runs and
    partitionings.  Determinism: weights are 8-dp rounded
    (mixing_weights' contract), T and the 8-dp rate derive from those
    identical doubles by single correctly-rounded ops, and the keep
    comparison scales the rate by an exact power of two — no float sum
    over corpus-sized data anywhere.

    Scale shape: the weight/rate relation is one row per source
    (control-plane-sized, broadcast); the corpus pays one narrow filter
    pass.  Returns per-row (id, by, n_tok, rate, keep)."""
    from fossa_spark.llm.text import token_count_ws

    w = mixing_weights(df, alpha=alpha, by=by, text_col=text_col)
    t = w.agg(
        F.min(F.col("n_tokens").cast("double") / F.col("weight")).alias("_t")
    )
    rates = w.crossJoin(F.broadcast(t)).select(
        by,
        F.round(
            F.col("weight") * F.col("_t") / F.col("n_tokens").cast("double"),
            8,
        ).alias("rate"),
    )
    # text.py's token_count_ws IS the convention (the _ntok rule): the
    # per-row n_tok must share mixing_weights' token definition or the
    # enforced mixture silently skews
    n_tok = token_count_ws(text_col)
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("double")
    return df.join(F.broadcast(rates), by).select(
        F.col(id_col), F.col(by), n_tok.alias("n_tok"), F.col("rate"),
        (u < F.col("rate") * F.lit(4294967296.0)).alias("keep"),
    )


def compact_shards(
    spark, out_dir: str, id_col: str = "doc_id"
) -> tuple[int, int]:
    """Fold a shard layout's accumulated ``batch=`` partitions into ONE
    file per shard — the small-files maintenance pass the append path
    needs at daily cadence (r8 verdict: every :func:`append_to_shards`
    adds one file per shard per day; after months a training loader
    opens hundreds of files per shard).

    The rewrite is manifest-invariant by construction:
    :func:`shard_manifest` aggregates the re-read ROWS grouped by shard
    only (n_docs / n_tokens / content_sum are order-independent,
    ``first_doc`` keys on the stored ``pos_key``), and the epoch-order
    read contract also keys on ``pos_key`` — so folding the batch
    partitions into a single ``batch=compact`` partition, sorted by
    pos_key, changes no manifest cell and no epoch order.  What IS
    consumed is the per-batch delta lineage (``batch=<tag>`` directory
    pruning): compaction is the checkpoint that closes the audit window,
    exactly like a streaming state checkpoint closes its changelog.

    Placement math never reruns — rows are moved VERBATIM (every data
    column, whatever the writer called them, plus the stored
    n_tok/row_hash/pos_key), so a compaction bug cannot re-place a doc;
    it can only lose/duplicate rows, which the manifest (and the
    oracle-backed q_shard_compact) catches.  One shuffle on the shard key
    (each shard's rows hash to one task → one output file per shard);
    the directory swap is two renames, with the original kept until the
    new tree is in place.

    The folded batch tags are RECORDED in a ``_consumed_batches.json``
    sidecar (merged across compactions): without it, a replayed append
    whose ``batch=`` directory was just folded away would pass both the
    reused-tag guard and a caller's directory check and double-append —
    the audit identity would break silently.  :func:`append_to_shards`
    consults the sidecar.  Returns (files_before, files_after).
    """
    import json
    import os
    import shutil
    import uuid

    from fossa_spark.sources import _count_parquet_files

    files_before = _count_parquet_files(out_dir)
    shard_dirs = [d for d in os.listdir(out_dir) if d.startswith("shard=")]
    n_shards = len(shard_dirs)
    consumed = set(_consumed_batch_tags(out_dir))
    for sd in shard_dirs:
        for bd in os.listdir(os.path.join(out_dir, sd)):
            if bd.startswith("batch=") and bd != "batch=compact":
                consumed.add(bd.removeprefix("batch="))
    consumed.discard("base")
    rows0 = spark.read.parquet(out_dir)
    data_cols = [c for c in rows0.columns if c not in ("shard", "batch")]
    rows = rows0.select(
        *data_cols, F.col("shard"), F.lit("compact").alias("batch")
    )
    tmp = f"{out_dir.rstrip('/')}_compacting_{uuid.uuid4().hex[:8]}"
    (
        rows.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "batch", "pos_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard", "batch")
        .parquet(tmp)
    )
    with open(os.path.join(tmp, "_consumed_batches.json"), "w") as fh:
        json.dump(sorted(consumed), fh)
    old = f"{out_dir.rstrip('/')}_old_{uuid.uuid4().hex[:8]}"
    os.rename(out_dir, old)
    try:
        os.rename(tmp, out_dir)
    except OSError:
        os.rename(old, out_dir)
        raise
    shutil.rmtree(old, ignore_errors=True)
    return files_before, _count_parquet_files(out_dir)


def _consumed_batch_tags(out_dir: str) -> list[str]:
    """Batch tags folded away by past :func:`compact_shards` runs (the
    sidecar; empty for never-compacted layouts).  A sidecar that EXISTS
    but cannot be read/parsed raises — degrading it to [] would silently
    void the double-append guard it exists to enforce (review r9); only
    a genuinely absent sidecar means 'never compacted'."""
    import json
    import os

    path = os.path.join(out_dir, "_consumed_batches.json")
    try:
        with open(path) as fh:
            tags = json.load(fh)
    except FileNotFoundError:
        return []
    except (OSError, ValueError) as e:
        raise RuntimeError(
            f"unreadable compaction sidecar {path}: the consumed-tag "
            "guard cannot be verified — repair or restore it before "
            "appending"
        ) from e
    return [t for t in tags if isinstance(t, str)]


def shard_epoch_order(
    spark, out_dir: str, id_col: str = "doc_id",
    start_pos: int = 0, end_pos: int | None = None,
) -> DataFrame:
    """READ side of the shard layout (round 9, VERDICT r8 item 8) — the
    training loader's contract, closing the producer/consumer pair:

    - **Deterministic epoch order**: within each shard, rows are consumed
      ordered by the stored ``pos_key`` (the seeded-shuffle key the
      writer materialized), ties broken by id — the same order on every
      engine, every rerun, every file layout (appends and compaction
      move rows between files; ``pos_key`` order is the invariant, and
      ``shard_manifest.first_doc`` is precisely this order's head, so
      the manifest cross-checks the loader's first row per shard).
    - **Resumable offsets**: ``pos`` = 1-based rank in that order; a
      training job that checkpointed at offset k per shard resumes with
      ``start_pos=k`` — the filter happens before any text column is
      touched wide.
    - Returns (shard, pos, doc_id, n_tok): the consumption PLAN — ids
      and token budgets in order; the loader joins text back by id for
      the window it actually feeds (column pruning keeps the planning
      pass narrow).

    Scale shape: one window partitioned BY SHARD — parallelism =
    n_shards, which is the writer's sizing knob precisely so that a
    shard is one consumer's sequential read; no corpus-wide sort, no
    single-task window.  The ``start_pos``/``end_pos`` slice prunes
    after the rank (a rank cannot be pushed below its own window), but
    the window reads only (shard, pos_key, id, n_tok) — the wide text
    column never enters the shuffle."""
    rows = spark.read.parquet(out_dir).select(
        F.col("shard").cast("long").alias("shard"),
        F.col(id_col), F.col("n_tok"), F.col("pos_key"),
    )
    w = Window.partitionBy("shard").orderBy("pos_key", id_col)
    ordered = rows.select(
        "shard", F.row_number().over(w).alias("pos"), id_col, "n_tok"
    ).filter(F.col("pos") > start_pos)
    if end_pos is not None:
        ordered = ordered.filter(F.col("pos") <= end_pos)
    return ordered


def vocab_top_k(df: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: the k most frequent whitespace tokens (ties broken
    lexicographically for determinism). One explode + one count agg — the
    canonical map-side-combine aggregation; the top-k is a
    TakeOrderedAndProject over the (small) distinct-token relation, never a
    full sort of the corpus."""
    from fossa_spark.llm.text import tokens

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return counts.orderBy(F.desc("freq"), F.asc("token")).limit(k)


def vocab_coverage(df: DataFrame, vocab: DataFrame,
                   text_col: str = "text", by: str = "source") -> DataFrame:
    """Per-group token coverage of a vocabulary: what fraction of all token
    OCCURRENCES (not types) a fixed vocab covers, plus the OOV rate.

    The vocab is small by construction (top-k) → broadcast left-semi-style
    mark join; the corpus explodes once and aggregates with map-side
    partials. At 100 TB this is the standard 'does my tokenizer cover the
    corpus' audit — no shuffle of the corpus beyond the group agg."""
    from fossa_spark.llm.text import tokens

    tok = df.select(F.col(by), F.explode(tokens(text_col)).alias("token"))
    marked = tok.join(
        F.broadcast(vocab.select("token", F.lit(True).alias("_in_vocab"))),
        "token",
        "left",
    )
    return (
        marked.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("_in_vocab").isNotNull().cast("long")).alias("n_covered"),
        )
        .withColumn(
            "coverage",
            F.round(F.col("n_covered").cast("double")
                    / F.col("n_tokens").cast("double"), 8),
        )
        .withColumn(
            "oov_rate",
            F.round((F.col("n_tokens") - F.col("n_covered")).cast("double")
                    / F.col("n_tokens").cast("double"), 8),
        )
    )


def mixing_weights(df: DataFrame, alpha: float = 0.7,
                   by: str = "source", text_col: str = "text") -> DataFrame:
    """Temperature-scaled source mixing weights for pretraining sampling:
    w_i = c_i^alpha / Σ c^alpha over per-source token counts (alpha < 1
    upweights small sources — the multinomial smoothing used for
    multi-source corpora). The per-source count relation is tiny, so the
    normalizing sum is a scalar subquery/window over it, not a second pass
    over the corpus.

    Determinism contract: pow() is a transcendental — both engines' libm
    agree to well under 1e-8 relative, so the weight is rounded to 8 dp
    after ONE division (oracle must round identically)."""
    from fossa_spark.llm.text import token_count_ws

    counts = df.groupBy(by).agg(
        F.sum(token_count_ws(text_col)).alias("n_tokens")
    )
    w = Window.partitionBy()
    raw = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    return (
        counts.withColumn("_raw", raw)
        .withColumn("weight", F.round(F.col("_raw") / F.sum("_raw").over(w), 8))
        .select(by, "n_tokens", "weight")
    )


def data_card(
    df: DataFrame,
    by: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus DATA CARD: the per-(source, lang) release report a training
    run publishes next to its shards (mirrors the 'datasheets for
    datasets' practice; the reference exposes the same corpus metadata
    through its connector manifests, /root/reference/lib/ayeaye/connectors).

    Per group: docs, whitespace tokens, chars, exact-duplicate docs
    (normalized-digest copies counted CORPUS-WIDE, then attributed to the
    group each copy lives in — a group can be 100% dup against another
    group), dup rate, and the group's token share in ppm of the corpus.

    Scale shape: one narrow pass derives (group, n_tok, n_chars, digest);
    the digest count is a corpus-wide agg on the hash (the exact-dedup
    shuffle, map-side combined); the join back is digest-keyed. The final
    group agg and the scalar total are control-plane-sized. No window
    over the corpus, no collect."""
    from fossa_spark.llm.dedup import normalize
    from fossa_spark.llm.text import token_count_ws

    rows = df.select(
        *[F.col(c) for c in by],
        token_count_ws(text_col).alias("_ntok"),
        F.length(text_col).alias("_nchr"),
        F.md5(normalize(text_col)).alias("_dig"),
    )
    copies = rows.groupBy("_dig").agg(F.count(F.lit(1)).alias("_copies"))
    per_group = (
        rows.join(copies, "_dig")
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ntok").alias("n_tokens"),
            F.sum("_nchr").alias("n_chars"),
            F.sum((F.col("_copies") > 1).cast("long")).alias("n_dup_docs"),
        )
        # one row per (source, lang) — control-plane-sized; materialize
        # so the corpus digest pass runs ONCE, not once under the report
        # and again under the share total (measured 2x at sf10)
        .localCheckpoint(eager=True)
    )
    total = per_group.agg(F.sum("n_tokens").alias("_tot"))
    return (
        per_group.crossJoin(F.broadcast(total))
        .select(
            *by,
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_dup_docs",
            F.round(
                F.col("n_dup_docs").cast("double")
                / F.col("n_docs").cast("double"),
                8,
            ).alias("dup_rate"),
            F.round(
                F.col("n_tokens").cast("double") * 1e6
                / F.col("_tot").cast("double"),
                4,
            ).alias("tok_share_ppm"),
        )
    )


def cap_per_group(
    df: DataFrame,
    by: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frequency cap: keep at most ``n`` rows per group, chosen
    deterministically — the rank key is a salted md5 of the row id, so
    the kept subset is a reproducible uniform sample of each group
    (CommonCrawl-style per-domain caps: no single host may dominate the
    corpus).

    Scale shape: one shuffle on the group key + a per-group sort
    (row_number). A pathological mega-group pays a single-reducer sort;
    since the rank key IS the hash, the standard mitigation is a
    pre-thin — filter u < c·n/|g| from a broadcast count relation —
    before the exact rank; at fixture scale the plain window is the
    honest plan and AQE handles moderate skew. Returns every row with
    its rank and the keep verdict (callers filter on ``keep``)."""
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cap:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("bigint")
    w = Window.partitionBy(by).orderBy(F.asc("_u"), F.asc(id_col))
    return (
        df.withColumn("_u", u)
        .withColumn("rk", F.row_number().over(w))
        .withColumn("keep", F.col("rk") <= F.lit(int(n)))
        .drop("_u")
    )


def k_anonymize(
    df: DataFrame,
    levels: list[dict[str, Column]],
    k: int,
    max_suppress_frac: float = 0.01,
) -> DataFrame:
    """k-anonymity via GLOBAL generalization over a ladder of
    quasi-identifier levels (level 0 finest; each coarser level replaces
    detail with '*' but every level emits the SAME column names).

    Picks the minimal level whose under-k rows (the rows that would have
    to be suppressed) are ≤ max_suppress_frac of the table — falling
    back to the coarsest level if none qualifies — then publishes that
    level's groups with count ≥ k. Every published group therefore has
    ≥ k members: the anonymity guarantee is structural, not best-effort.

    Scale shape: one aggregation per ladder level, each a map-side-
    combined groupBy on low-cardinality QID keys (the corpus is scanned
    once per level; levels are few and fixed). The level chooser and the
    publish filter run on the per-level GROUP relations — control-plane
    sized. Declarative end to end: no collect, no driver branching, so
    the chooser itself is part of the (resumable, explainable) plan."""
    if not levels:
        raise ValueError("k_anonymize needs at least one QID level")
    qid_cols = list(levels[0].keys())
    per_level = []
    for i, cols in enumerate(levels):
        if list(cols.keys()) != qid_cols:
            raise ValueError("every level must emit the same QID columns")
        per_level.append(
            df.groupBy(*[c.alias(n) for n, c in cols.items()])
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(i).alias("level"), *qid_cols, "cnt")
        )
    lv = per_level[0]
    for g in per_level[1:]:
        lv = lv.unionByName(g)
    stats = lv.groupBy("level").agg(
        F.sum(F.when(F.col("cnt") < k, F.col("cnt")).otherwise(F.lit(0)))
        .alias("suppressed"),
        F.sum("cnt").alias("n"),
    )
    chosen = stats.agg(
        F.coalesce(
            F.min(
                F.when(
                    F.col("suppressed").cast("double")
                    <= F.lit(float(max_suppress_frac)) * F.col("n").cast("double"),
                    F.col("level"),
                )
            ),
            F.max("level"),
        ).alias("_lvl")
    )
    return (
        lv.join(F.broadcast(chosen), F.col("level") == F.col("_lvl"))
        .filter(F.col("cnt") >= k)
        .select("level", *qid_cols, "cnt")
    )


def filter_funnel(
    df: DataFrame,
    rules: list[tuple[str, Column]],
) -> tuple[DataFrame, DataFrame]:
    """Rule-cascade document filter with per-stage ATTRITION accounting —
    the C4/Gopher-style quality funnel every web-corpus pipeline runs,
    where the published artifact is as much the funnel REPORT (how many
    docs each rule killed) as the surviving corpus.

    ``rules`` is an ordered list of (name, pass-predicate); a document
    is charged to the FIRST rule it fails (later rules never see it —
    the report's n_evaluated column shrinks down the cascade exactly as
    the production pipeline's would).

    Returns (per_doc, report): per_doc adds ``failed_stage`` (int index
    of the first failed rule, null = survived) in ONE narrow codegen'd
    pass — the cascade is a single chained CASE, so adding rules never
    adds corpus scans; report has one row per rule (n_evaluated,
    n_failed, n_survived, fail_rate) derived from the per-stage counts.
    The report-side window/cumsum runs over the RULES relation — one
    row per rule, control-plane-sized by construction."""
    if not rules:
        raise ValueError("filter_funnel needs at least one rule")
    cascade = None
    for i, (_, pred) in enumerate(rules):
        cascade = (
            F.when(~pred, F.lit(i)) if cascade is None
            else cascade.when(~pred, F.lit(i))
        )
    per_doc = df.withColumn("failed_stage", cascade)

    spark = df.sparkSession
    rules_df = spark.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(rules)],
        "stage int, rule string",
    )
    counts = per_doc.groupBy("failed_stage").agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)  # n_rules+1 rows: one corpus pass, not
    # one under the join and another under the total (measured 1.5x)
    total = counts.agg(F.sum("n").alias("_total"))
    r = (
        rules_df.join(
            counts, rules_df.stage == counts.failed_stage, "left"
        )
        .select("stage", "rule", F.coalesce("n", F.lit(0)).alias("n_failed"))
        .crossJoin(F.broadcast(total))
    )
    w_prev = (
        Window.orderBy("stage")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = r.withColumn(
        "n_evaluated",
        F.col("_total") - F.coalesce(F.sum("n_failed").over(w_prev), F.lit(0)),
    )
    report = r.select(
        "stage",
        "rule",
        "n_evaluated",
        "n_failed",
        (F.col("n_evaluated") - F.col("n_failed")).alias("n_survived"),
        F.when(
            F.col("n_evaluated") > 0,
            F.round(
                F.col("n_failed").cast("double")
                / F.col("n_evaluated").cast("double"),
                8,
            ),
        ).alias("fail_rate"),
    )
    return per_doc, report
