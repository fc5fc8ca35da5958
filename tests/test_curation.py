"""Behavioral tests for the curation operators (PII redaction,
contamination, deterministic sampling, repetition stats, cluster
retention) with planted inputs. Oracle parity at sf scale is covered by
tests/test_oracle_parity.py, which auto-includes the curation queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fossa_spark.llm import curation as C


def test_redact_pii_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.co.uk or call 555-123-4567"),
            (2, "server at 10.0.42.7 handles traffic"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in C.redact_pii(df).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1 and out[1].n_ipv4 == 0
    assert "<EMAIL>" in out[1].redacted and "<PHONE>" in out[1].redacted
    assert "alice" not in out[1].redacted and "4567" not in out[1].redacted
    assert out[2].n_ipv4 == 1 and "<IP>" in out[2].redacted
    assert out[3].redacted == "nothing sensitive here"


def test_contamination_flags_overlap_only(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox yesterday evening"),  # shares 3-grams
            (2, "entirely unrelated corpus text about databases"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in C.contamination_check(train, bench, k=3).collect()}
    assert 1 in got and got[1].n_bench_docs == 1 and got[1].n_gram_hits >= 2
    assert 2 not in got


def test_hash_sample_deterministic_and_calibrated(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    a = sorted(r.doc_id for r in C.hash_sample(df, "doc_id", 0.25).collect())
    b = sorted(r.doc_id for r in C.hash_sample(df, "doc_id", 0.25).collect())
    assert a == b  # no RNG state — identical across runs
    assert 0.20 < len(a) / 4000 < 0.30  # calibrated to the fraction
    # monotone: a smaller fraction selects a subset of a larger one
    small = set(r.doc_id for r in C.hash_sample(df, "doc_id", 0.1).collect())
    assert small <= set(a)


def test_stratified_fixed_n_exact_counts(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    out = C.stratified_fixed_n(df, "source", "doc_id", n=4).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, []).append(r.rk)
    assert set(per) == {"s0", "s1", "s2"}
    assert all(sorted(v) == [1, 2, 3, 4] for v in per.values())


def test_repetition_stats_separates_degenerate_text(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "each word here is completely different okay"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in C.repetition_stats(df).collect()}
    assert out[1].dup_token_frac > 0.8 and out[1].dup_bigram_frac > 0.8
    assert out[2].dup_token_frac == 0.0 and out[2].dup_bigram_frac == 0.0


def test_pack_chunks_respects_budget_boundaries(spark):
    """Docs of 300 tokens each against a 1000-token budget: chunk changes
    when the running start offset crosses a multiple of the budget."""
    df = spark.createDataFrame(
        [(i, "s") for i in range(7)], "doc_id long, source string"
    )
    out = C.pack_chunks(df, "source", "doc_id", F.lit(300), budget=1000)
    got = {r.doc_id: r.chunk_id for r in out.collect()}
    # starts: 0,300,600,900 → chunk 0; 1200,1500,1800 → chunk 1
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1}


def test_extract_domains(spark):
    df = spark.createDataFrame(
        [
            (1, "read https://News.Example/a and http://blog.example/b twice "
                "http://blog.example/c"),
            (2, "no links here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.domains for r in C.extract_domains(df).collect()}
    assert sorted(out[1]) == ["blog.example", "news.example"]  # lowered, distinct
    assert out[2] == []


def test_keep_best_per_cluster(spark):
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, component long",
    )
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (10, 10), (11, 99)],
        "doc_id long, n_chars long",
    )
    out = {r.component: r for r in C.keep_best_per_cluster(comp, docs).collect()}
    assert out[1].kept_id == 2 and out[1].cluster_size == 3  # tie 2 vs 3 → min id
    assert out[10].kept_id == 11 and out[10].cluster_size == 2


def test_vocab_top_k_tiebreak_and_coverage(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c", "s1"), (2, "a zz zz", "s2")],
        "doc_id long, text string, source string",
    )
    vocab = C.vocab_top_k(df, k=2)
    # freq: a=4, b=2, zz=2, c=1 → top-2 is (a, b): b beats zz lexicographically
    assert [r.token for r in vocab.collect()] == ["a", "b"]
    cov = {r.source: r for r in C.vocab_coverage(df, vocab).collect()}
    assert cov["s1"].n_tokens == 6 and cov["s1"].n_covered == 5
    assert cov["s2"].n_tokens == 3 and cov["s2"].n_covered == 1
    assert abs(cov["s2"].oov_rate - 2 / 3) < 1e-8


def test_mixing_weights_sum_to_one_and_upweight_small(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 99), "big"), (2, "w", "small")],
        "doc_id long, text string, source string",
    )
    w = {r.source: r for r in C.mixing_weights(df, alpha=0.5).collect()}
    assert w["big"].n_tokens == 99 and w["small"].n_tokens == 1
    total = w["big"].weight + w["small"].weight
    assert abs(total - 1.0) < 1e-6
    # alpha=0.5: small source gets sqrt(1)/(sqrt(99)+sqrt(1)) ≈ 0.0913 — far
    # above its 0.01 proportional share
    assert w["small"].weight > 0.05


def test_quantize_int8_roundtrip_bounds(spark):
    from fossa_spark.llm.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 0.5], 0), (2, [3.0, 3.0, 3.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.vec_id: r for r in quantize_int8(df).collect()}
    # min→0, max→255, midpoint→128 (0.5 quantizes to round(127.5)=128)
    assert out[1].codes == [0, 255, 128]
    assert out[1].n_sat == 2
    # error bounded by half a quantization step (+ 6-dp rounding slack)
    assert out[1].max_abs_err <= (1.0 / 255.0) / 2 + 5e-7
    # constant vector: scale guard → all codes 0, exact reconstruction
    assert out[2].codes == [0, 0, 0]
    assert out[2].max_abs_err == 0.0


def test_chunk_text_edge_cases(spark):
    from fossa_spark.llm.curation import chunk_text

    df = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join(f"w{i}" for i in range(10)))],
        "doc_id long, text string",
    )
    # doc shorter than the window -> exactly one chunk, n_tok = doc length
    out = {(r.doc_id, r.chunk_idx): r for r in
           chunk_text(df, size=8, overlap=2).collect()}
    assert out[(1, 0)].n_tok == 3 and out[(1, 0)].chunk_text == "a b c"
    # 10 tokens, size 8, step 6 -> starts 0 and 6; window 2 holds 4 tokens
    assert out[(2, 0)].n_tok == 8
    assert out[(2, 1)].start_tok == 6 and out[(2, 1)].n_tok == 4
    assert out[(2, 1)].chunk_text == "w6 w7 w8 w9"
    # overlap=0: wall-to-wall cover, no token in two chunks
    seen = []
    for r in chunk_text(df.filter("doc_id = 2"), size=4, overlap=0).collect():
        seen += list(range(r.start_tok, r.start_tok + r.n_tok))
    assert sorted(seen) == list(range(10))
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_text(df, size=4, overlap=4)


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every near-dup component must land entirely in ONE fold — the
    property that justifies hashing the component id instead of doc_id."""
    import os

    from fossa_spark.llm import curation as C
    from fossa_spark.llm import dedup as D
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(d, k=5, min_jaccard=0.5, max_df=100).select(
        "id_a", "id_b"
    )
    comp = D.connected_components(pairs)
    grouped = d.join(comp, "doc_id", "left").withColumn(
        "group_key", F.coalesce("component", F.col("doc_id"))
    )
    split = C.hash_split(grouped, "group_key")
    spread = (
        split.filter(F.col("component").isNotNull())
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_folds"))
        .filter(F.col("n_folds") > 1)
    )
    assert spread.count() == 0
    # and clusters do exist, so the property is non-vacuous
    assert comp.count() > 0


def test_write_training_shards_contract(spark, tmp_path):
    """write_training_shards (round 8): (a) dedup-cluster-exclusive —
    exactly one doc per near-dup component survives, singletons all
    survive; (b) deterministic — same corpus twice → identical manifest;
    (c) the written files carry the seeded intra-shard shuffle: each
    shard's FILE row order equals ordering by the pos_key hash, and the
    manifest's first_doc is the head of that order; (d) every kept doc
    appears exactly once across shard files (content_sum is computed from
    the artifact, so (a)+(d) together mean no row was lost or doubled)."""
    import os

    from fossa_spark.llm import curation as C
    from fossa_spark.llm import dedup as D
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(d, k=5, min_jaccard=0.5, max_df=100).select(
        "id_a", "id_b"
    )
    comp = D.connected_components(pairs)
    out1 = str(tmp_path / "s1")
    m1 = C.write_training_shards(d, comp, out1, n_shards=8).collect()

    # (a) cluster-exclusive + singleton-complete
    written = spark.read.parquet(out1)
    kept_ids = {r.doc_id for r in written.select("doc_id").collect()}
    comp_rows = comp.collect()
    by_comp: dict[int, list[int]] = {}
    for r in comp_rows:
        by_comp.setdefault(r.component, []).append(r.doc_id)
    assert by_comp, "no clusters at this sf — test is vacuous"
    for members in by_comp.values():
        assert len(kept_ids & set(members)) == 1
    clustered = {r.doc_id for r in comp_rows}
    singletons = {r.doc_id for r in d.select("doc_id").collect()} - clustered
    assert singletons <= kept_ids
    # (d) exactly once
    assert written.count() == len(kept_ids)

    # (b) deterministic manifest
    m2 = C.write_training_shards(d, comp, str(tmp_path / "s2"), n_shards=8).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))

    # (c) file order == seeded-hash order; first_doc == its head
    first = {r.shard: r.first_doc for r in m1}
    for shard in first:
        rows = spark.read.parquet(f"{out1}/shard={shard}").collect()
        keys = [r.pos_key for r in rows]
        assert keys == sorted(keys), f"shard {shard} not in shuffle order"
        assert rows[0].doc_id == first[shard]


def test_append_to_shards_delta_equals_rebuild(spark, tmp_path):
    """append_to_shards (round 8): base manifest + append delta must
    equal the manifest of a FULL REBUILD over corpus + novel docs, on
    every additive column — the invariant that lets a daily pipeline
    audit its shard artifact without rereading the base; and already-
    present docs (exact dups) must never be appended."""
    import os
    from collections import defaultdict

    from fossa_spark.llm import curation as C
    from fossa_spark.llm import dedup as D
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    batch = d.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    dup = corpus.limit(3).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    batch = batch.unionByName(dup)
    empty = spark.createDataFrame([], "doc_id long, component long")

    base_dir = str(tmp_path / "base")
    base = C.write_training_shards(corpus, empty, base_dir, n_shards=8).collect()

    spark.sql("DROP TABLE IF EXISTS t_shard_idx")
    D.build_exact_index(corpus, spark, "t_shard_idx", str(tmp_path / "idx"))
    keep = D.incremental_exact_dedup(batch, spark, "t_shard_idx")
    delta = C.append_to_shards(batch, keep, base_dir, n_shards=8).collect()
    spark.sql("DROP TABLE IF EXISTS t_shard_idx")

    # exact dups of corpus docs must not have been appended
    appended_ids = {
        r.doc_id
        for r in spark.read.parquet(base_dir)
        .filter(F.col("batch") != "base").select("doc_id").collect()
    }
    assert not any(i >= 10_000_000 for i in appended_ids)

    # repeated appends: a SECOND batch's delta must cover only its own
    # rows (round-8 review: a plain boolean append tag made every later
    # delta cumulative) — and must never re-read the base partition
    b2 = d.filter(F.col("doc_id") % 4 == 2).select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"), "text"
    )
    keep2 = b2.select("doc_id").withColumn("keep", F.lit(True))
    delta2 = C.append_to_shards(b2, keep2, base_dir, n_shards=8).collect()
    assert sum(r.n_docs for r in delta2) == b2.count()
    assert all(r.min_doc >= 20_000_000 for r in delta2), delta2

    novel = batch.join(
        keep.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    rebuild = C.write_training_shards(
        corpus.select("doc_id", "text")
        .unionByName(novel)
        .withColumn("n_chars", F.length("text")),
        empty, str(tmp_path / "rebuild"), n_shards=8,
    ).collect()

    merged: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0, None, None])
    for rows in (base, delta):
        for r in rows:
            m = merged[r.shard]
            m[0] += r.n_docs
            m[1] += r.n_tokens
            m[2] += r.content_sum
            m[3] = r.min_doc if m[3] is None else min(m[3], r.min_doc)
            m[4] = r.max_doc if m[4] is None else max(m[4], r.max_doc)
    got = {s: tuple(v) for s, v in merged.items()}
    want = {
        r.shard: (r.n_docs, r.n_tokens, r.content_sum, r.min_doc, r.max_doc)
        for r in rebuild
    }
    assert got == want


def test_write_shards_max_records_per_file(spark, tmp_path):
    """max_records_per_file (r8 verdict nit): splitting a shard across
    several files must leave the MANIFEST bit-identical (it aggregates
    re-read rows, not files) while actually producing more files — the
    escape hatch that stops one task serializing a whole shard at
    extreme scale."""
    import glob
    import os

    from fossa_spark.llm import curation as C
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    empty = spark.createDataFrame([], "doc_id long, component long")
    one = str(tmp_path / "one")
    split = str(tmp_path / "split")
    m_one = C.write_training_shards(d, empty, one, n_shards=4).collect()
    m_split = C.write_training_shards(
        d, empty, split, n_shards=4, max_records_per_file=25
    ).collect()
    assert sorted(map(tuple, m_one)) == sorted(map(tuple, m_split))
    n_one = len(glob.glob(f"{one}/shard=*/batch=base/*.parquet"))
    n_split = len(glob.glob(f"{split}/shard=*/batch=base/*.parquet"))
    assert n_one == 4 and n_split > n_one


def test_append_to_shards_batch_tag_guards(spark, tmp_path):
    """batch_tag validation (advisor r8): 'base' is reserved, and a
    REUSED tag would make the returned delta cumulative — both must
    raise before writing anything."""
    import os

    import pytest

    from fossa_spark.llm import curation as C
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    empty = spark.createDataFrame([], "doc_id long, component long")
    out = str(tmp_path / "s")
    C.write_training_shards(d.limit(50), empty, out, n_shards=4)
    batch = d.filter(F.col("doc_id") >= 400).select("doc_id", "text")
    keep = batch.select("doc_id").withColumn("keep", F.lit(True))
    with pytest.raises(ValueError, match="reserved"):
        C.append_to_shards(batch, keep, out, n_shards=4, batch_tag="base")
    C.append_to_shards(batch.limit(5), keep, out, n_shards=4, batch_tag="day1")
    with pytest.raises(ValueError, match="already exists"):
        C.append_to_shards(batch, keep, out, n_shards=4, batch_tag="day1")


def test_compact_shards_manifest_invariant(spark, tmp_path):
    """compact_shards (round 9, VERDICT r8 item 2): after two daily
    appends the layout carries one file per shard per batch; compaction
    must fold everything to ONE file per shard while the full manifest —
    including first_doc, which keys on the stored pos_key — stays
    bit-identical, and a post-compaction append must still work."""
    import glob
    import os

    from fossa_spark.llm import curation as C
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    empty = spark.createDataFrame([], "doc_id long, component long")
    out = str(tmp_path / "s")
    C.write_training_shards(
        d.filter(F.col("doc_id") % 3 == 0), empty, out, n_shards=4
    )
    for day, m in ((1, 1), (2, 2)):
        batch = d.filter(F.col("doc_id") % 3 == m).select("doc_id", "text")
        keep = batch.select("doc_id").withColumn("keep", F.lit(True))
        C.append_to_shards(batch, keep, out, n_shards=4, batch_tag=f"day{day}")

    before = sorted(map(tuple, C.shard_manifest(spark, out).collect()))
    files_pre = len(glob.glob(f"{out}/shard=*/batch=*/*.parquet"))
    assert files_pre == 12  # 4 shards x (base + 2 appends)

    pre, post = C.compact_shards(spark, out)
    assert (pre, post) == (12, 4)
    assert len(glob.glob(f"{out}/shard=*/batch=compact/*.parquet")) == 4
    assert glob.glob(f"{out}/shard=*/batch=base/*.parquet") == []

    after = sorted(map(tuple, C.shard_manifest(spark, out).collect()))
    assert after == before

    # the layout remains appendable: a fresh batch lands per contract
    day3 = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    ).limit(7)
    keep3 = day3.select("doc_id").withColumn("keep", F.lit(True))
    delta = C.append_to_shards(day3, keep3, out, n_shards=4, batch_tag="day3")
    assert delta.agg(F.sum("n_docs")).first()[0] == 7


def test_shard_epoch_order_contract(spark, tmp_path):
    """shard_epoch_order (round 9): (a) pos=1 per shard equals the
    manifest's first_doc (the head cross-check), (b) resuming from
    offset k yields exactly the full order minus its first k rows, and
    (c) the epoch order is INVARIANT under append + compaction — the
    consumption plan keys on stored pos_key, never on file layout."""
    import os

    from fossa_spark.llm import curation as C
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    empty = spark.createDataFrame([], "doc_id long, component long")
    out = str(tmp_path / "s")
    manifest = {
        r.shard: r.first_doc
        for r in C.write_training_shards(
            d.filter(F.col("doc_id") % 2 == 0), empty, out, n_shards=4
        ).collect()
    }
    full = C.shard_epoch_order(spark, out).collect()
    heads = {r.shard: r.doc_id for r in full if r.pos == 1}
    assert heads == manifest

    resumed = C.shard_epoch_order(spark, out, start_pos=2).collect()
    want = sorted((r.shard, r.pos, r.doc_id, r.n_tok) for r in full if r.pos > 2)
    assert sorted(map(tuple, resumed)) == want

    # append + compact: ranks shift deterministically but the ORDER of
    # the original rows is preserved relative to each other, and the head
    # stays consistent with the re-read manifest
    batch = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").limit(20)
    keep = batch.select("doc_id").withColumn("keep", F.lit(True))
    C.append_to_shards(batch, keep, out, n_shards=4, batch_tag="day1")
    C.compact_shards(spark, out)
    after = C.shard_epoch_order(spark, out).collect()
    order_before = {
        s: [r.doc_id for r in sorted(full, key=lambda r: r.pos) if r.shard == s]
        for s in {r.shard for r in full}
    }
    order_after = {
        s: [r.doc_id for r in sorted(after, key=lambda r: r.pos) if r.shard == s]
        for s in {r.shard for r in after}
    }
    for s, before_ids in order_before.items():
        kept = [i for i in order_after[s] if i in set(before_ids)]
        assert kept == before_ids, f"shard {s}: original relative order broken"
    heads_after = {r.shard: r.doc_id for r in after if r.pos == 1}
    manifest_after = {
        r.shard: r.first_doc
        for r in C.shard_manifest(spark, out).collect()
    }
    assert heads_after == manifest_after


def test_compact_shards_preserves_reused_tag_guard(spark, tmp_path):
    """Review r9: folding batch= partitions away must NOT void the
    reused-tag guard — a replayed append whose directories were just
    compacted would otherwise double-append silently.  The sidecar keeps
    the guard alive across (repeated) compactions."""
    import os

    import pytest

    from fossa_spark.llm import curation as C
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    empty = spark.createDataFrame([], "doc_id long, component long")
    out = str(tmp_path / "s")
    C.write_training_shards(d.limit(60), empty, out, n_shards=4)
    batch = d.filter(F.col("doc_id") >= 300).select("doc_id", "text").limit(10)
    keep = batch.select("doc_id").withColumn("keep", F.lit(True))
    C.append_to_shards(batch, keep, out, n_shards=4, batch_tag="day1")
    C.compact_shards(spark, out)
    assert C._consumed_batch_tags(out) == ["day1"]
    with pytest.raises(ValueError, match="folded"):
        C.append_to_shards(batch, keep, out, n_shards=4, batch_tag="day1")
    # 'compact' itself is reserved, and the sidecar survives a SECOND
    # compaction (merge, not overwrite)
    with pytest.raises(ValueError, match="reserved"):
        C.append_to_shards(batch, keep, out, n_shards=4, batch_tag="compact")
    batch2 = d.filter(F.col("doc_id") >= 400).select("doc_id", "text").limit(5)
    keep2 = batch2.select("doc_id").withColumn("keep", F.lit(True))
    C.append_to_shards(batch2, keep2, out, n_shards=4, batch_tag="day2")
    C.compact_shards(spark, out)
    assert C._consumed_batch_tags(out) == ["day1", "day2"]
    with pytest.raises(ValueError, match="folded"):
        C.append_to_shards(batch, keep, out, n_shards=4, batch_tag="day1")


def test_apply_mixture_enforces_weights(spark):
    """apply_mixture (round 9): the binding source's rate is exactly 1.0
    (kept in full), every rate is in (0, 1], the kept corpus's token
    shares approach the temperature-scaled targets, and the subsample is
    rerun-deterministic."""
    import os

    from fossa_spark.llm import curation as C
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    out = C.apply_mixture(d, alpha=0.7)
    rows = out.collect()
    rates = {r.source: r.rate for r in rows}
    assert max(rates.values()) == 1.0
    assert all(0.0 < r <= 1.0 for r in rates.values())

    w = {r.source: r.weight for r in C.mixing_weights(d, alpha=0.7).collect()}
    kept_tok = {}
    for r in rows:
        if r.keep:
            kept_tok[r.source] = kept_tok.get(r.source, 0) + r.n_tok
    total = sum(kept_tok.values())
    # Bernoulli thinning: shares converge to the targets; at fixture
    # scale allow a generous tolerance but require the ORDERING and
    # rough magnitudes to match
    for s, target in w.items():
        share = kept_tok.get(s, 0) / total
        assert abs(share - target) < 0.08, (s, share, target)

    again = sorted(map(tuple, C.apply_mixture(d, alpha=0.7).collect()))
    assert again == sorted(map(tuple, rows))


def test_data_card_accounts_for_every_doc(spark):
    """data_card (round 10): group counts sum to the corpus, dup docs
    are counted corpus-wide (a planted cross-group copy marks BOTH
    copies), and token shares sum to ~1e6 ppm."""
    import os

    from fossa_spark.llm import curation as C
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    n = d.count()
    # plant one exact copy of doc 0's text under a DIFFERENT (source,
    # lang) group: both the original and the copy must count as dups
    from pyspark.sql import functions as F

    first_text = d.filter(F.col("doc_id") == 0).select("text").first().text
    planted = spark.createDataFrame(
        [(10_000_000, first_text, "xx", "planted", len(first_text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    card = C.data_card(d.unionByName(planted)).collect()
    assert sum(r.n_docs for r in card) == n + 1
    assert sum(r.n_dup_docs for r in card) >= 2
    planted_row = [r for r in card if r.source == "planted"][0]
    assert planted_row.n_dup_docs == 1 and planted_row.dup_rate == 1.0
    assert abs(sum(r.tok_share_ppm for r in card) - 1e6) < 1.0


def test_cap_per_group_is_deterministic_uniform_cap(spark):
    """cap_per_group (round 10): at most n kept per group, kept set is
    rerun-identical, and every group smaller than n is kept whole."""
    import os

    from pyspark.sql import functions as F

    from fossa_spark.llm import curation as C
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents").withColumn(
        "grp", (F.col("doc_id") % 5).cast("string")
    )
    out = C.cap_per_group(d, by="grp", n=7)
    kept = out.filter("keep").groupBy("grp").count().collect()
    assert all(r["count"] <= 7 for r in kept)
    small = d.groupBy("grp").count().filter("count <= 7").collect()
    small_sizes = {r.grp: r["count"] for r in small}
    for r in kept:
        if r.grp in small_sizes:
            assert r["count"] == small_sizes[r.grp]
    ids1 = sorted(r.doc_id for r in out.filter("keep").select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in C.cap_per_group(d, by="grp", n=7)
        .filter("keep").select("doc_id").collect()
    )
    assert ids1 == ids2


def test_k_anonymize_guarantee_and_ladder(spark):
    """k_anonymize (round 10): every published group has >= k members;
    forcing an impossible fine level falls back to a coarser one; the
    published relation is a partition of non-suppressed rows (group
    counts never exceed the table)."""
    import os

    from pyspark.sql import functions as F

    from fossa_spark.llm import curation as C
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    c = load(spark, sf, "customer")
    nat = F.col("c_nationkey").cast("string")
    seg = F.col("c_mktsegment")
    levels = [
        # level 0: c_custkey makes every group a singleton — can never
        # satisfy k, so the chooser MUST move past it
        {"nation": nat, "segment": F.col("c_custkey").cast("string"),
         "bal_bucket": F.lit("*")},
        {"nation": nat, "segment": seg, "bal_bucket": F.lit("*")},
        {"nation": nat, "segment": F.lit("*"), "bal_bucket": F.lit("*")},
    ]
    k = 4
    pub = C.k_anonymize(c, levels, k=k, max_suppress_frac=0.25).collect()
    assert pub, "expected at least one published group"
    assert all(r.cnt >= k for r in pub)
    lvl = {r.level for r in pub}
    assert lvl.issubset({1, 2}) and len(lvl) == 1
    assert sum(r.cnt for r in pub) <= c.count()


def test_profile_drift_detects_planted_shift(spark):
    """profile_drift (round 10): identical snapshots give PSI ~= 0 (only
    smoothing noise); removing a whole category from one side pushes
    that feature's PSI far above the stationary ones."""
    import os

    from pyspark.sql import functions as F

    from fossa_spark import profiling as P
    from fossa_spark.queries._util import load

    sf = os.environ.get("FOSSA_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load(spark, sf, "documents")
    feats = {"source": F.col("source"), "lang": F.col("lang")}
    same = {r.feature: r for r in P.profile_drift(d, d, feats).collect()}
    assert all(abs(r.psi_e8) < 1000 and not r.drifted for r in same.values())

    b = d.filter(F.col("lang") != d.select(F.min("lang")).first()[0])
    shifted = {r.feature: r for r in P.profile_drift(d, b, feats).collect()}
    assert shifted["lang"].psi_e8 > shifted["source"].psi_e8
    assert shifted["lang"].n_bins == same["lang"].n_bins  # union vocab


def test_filter_funnel_first_fail_attribution(spark):
    """filter_funnel (round 10): a doc is charged to the FIRST rule it
    fails, n_evaluated shrinks by the cumulative kills, survivors +
    total kills == corpus, and an empty rule list is rejected."""
    import pytest
    from pyspark.sql import functions as F

    from fossa_spark.llm import curation as C

    d = spark.createDataFrame(
        [(1, "short"), (2, "x " * 50), (3, "a b c d e f g h i j"),
         (4, "only fails rule three three three")],
        "doc_id long, text string",
    )
    rules = [
        ("len", F.length("text") >= 10),          # kills doc 1
        ("toks", F.size(F.split("text", " ")) >= 6),  # nothing left to kill
        ("no_x", ~F.col("text").startswith("x")),  # kills doc 2 ... no —
        # doc 2 passed len (100 chars) and toks; rule 2 kills it HERE,
        # proving it wasn't double-charged to an earlier rule
    ]
    per_doc, report = C.filter_funnel(d, rules)
    staged = {r.doc_id: r.failed_stage for r in per_doc.collect()}
    assert staged == {1: 0, 2: 2, 3: None, 4: None}
    rep = {r.stage: r for r in report.collect()}
    assert rep[0].n_evaluated == 4 and rep[0].n_failed == 1
    assert rep[1].n_evaluated == 3 and rep[1].n_failed == 0
    assert rep[2].n_evaluated == 3 and rep[2].n_failed == 1
    assert rep[2].n_survived == 2
    assert rep[1].fail_rate == 0.0 and rep[0].fail_rate == 0.25
    with pytest.raises(ValueError):
        C.filter_funnel(d, [])


def test_decontaminate_exact_and_span_branches(spark, tmp_path):
    """q_decontaminate on planted geometry: an exact copy of a
    benchmark doc is flagged exact_bench (the case the rep-grain span
    scan cannot emit), a 35-token embedded quote is flagged with span
    evidence, a 20-token overlap stays below the 32-token removal
    threshold, and unrelated docs are absent."""
    from fossa_spark.queries.curation_queries import q_decontaminate

    bench_toks = [f"b{i}" for i in range(40)]
    rows = [
        (0, " ".join(bench_toks)),                      # benchmark rep
        (1, " ".join(bench_toks)),                      # exact copy -> train
        (2, " ".join(bench_toks[:35] + ["u2a", "u2b", "u2c", "u2d", "u2e"])),
        (3, " ".join(f"z{i}" for i in range(40))),      # clean
        (7, " ".join(bench_toks[:20] + [f"w{i}" for i in range(20)])),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in q_decontaminate(spark, str(tmp_path)).collect()}
    assert sorted(out) == [1, 2]
    assert out[1]["exact_bench"] is True and out[1]["rep_id"] == 0
    assert out[1]["n_bench_spans"] == 0  # collapsed: no span rows by design
    assert out[2]["exact_bench"] is False
    assert out[2]["n_bench_spans"] == 1 and out[2]["max_span_tokens"] == 35
