"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the part that matters at 100 TB):
- Exact dedup is a hash-groupBy — one shuffle on the digest, map-side
  partial aggregation, no driver involvement.
- MinHash-LSH: signature computation is a narrow pass (array expressions,
  no shuffle); candidate generation explodes to (band, bucket) keys and
  self-joins — reducer fan-in is bounded by bucket size, and super-frequent
  buckets (boilerplate) can be capped with a groupBy count filter before the
  join. This is the shuffle-friendly banding layout from the MMDS LSH
  construction.
- SimHash: 64 per-bit votes as one aggregate pass over exploded tokens,
  then banded candidate pairing on signature bytes (here: small-data
  crossJoin fallback with a bit_count Hamming filter).
- All randomness is seeded via xxhash64 of (seed-string ‖ value) so reruns
  and the driver's rows-only checks are stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fossa_spark.llm.text import tokens


def normalize(col: Column | str) -> Column:
    """Canonical text form for exact dedup: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the normalized-text digest. Returns one row per
    distinct digest with the kept (minimum) id and the duplicate count."""
    h = F.md5(normalize(text_col)).alias("text_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("kept_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def word_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct word k-shingles as strings (space-joined)."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: element i = min over shingles of
    xxhash64(seed_i ‖ shingle). Seeded → deterministic across runs."""
    # NB: lambdas passed to Spark HOFs must have the exact expected arity —
    # a default-arg capture (lambda s, i=i: ...) makes Spark bind the
    # element-index column to it. Use closure factories instead.
    def _hasher(i: int):
        return lambda s: F.xxhash64(F.concat(F.lit(f"mh{i}|"), s))

    sigs = [
        F.array_min(F.transform(shingle_col, _hasher(i))) for i in range(num_hashes)
    ]
    return F.array(*sigs)


def lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 8,
    rows_per_band: int = 4,
    max_bucket: int = 200,
) -> DataFrame:
    """Banded LSH: hash each band of the signature into a bucket, self-join
    on (band, bucket) to emit candidate pairs (id_a < id_b).

    ``max_bucket`` caps degenerate buckets (boilerplate text) so reducer
    fan-in stays bounded at scale — capped buckets are dropped, trading
    recall on exact-boilerplate groups for a bounded O(bucket²) join.
    """
    band_rows = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at(F.col(sig_col), b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    counts = band_rows.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_n"))
    bounded = band_rows.join(
        counts.filter(F.col("_n") <= max_bucket), ["band", "bucket"]
    )
    a = bounded.select(F.col("band"), F.col("bucket"), F.col("_id").alias("id_a"))
    b = bounded.select(F.col("band"), F.col("bucket"), F.col("_id").alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    docs_with_shingles: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps pairs ≥ threshold.
    Jaccard is a ratio of exact ints → deterministic double."""
    left = docs_with_shingles.select(
        F.col(id_col).alias("id_a"), F.col(shingle_col).alias("_sa")
    )
    right = docs_with_shingles.select(
        F.col(id_col).alias("id_b"), F.col(shingle_col).alias("_sb")
    )
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb"))).cast("double")
    union = F.size(F.array_union(F.col("_sa"), F.col("_sb"))).cast("double")
    return (
        candidates.join(left, "id_a")
        .join(right, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dedup pipeline: shingle → MinHash → banded LSH → exact
    Jaccard verification. Returns verified near-duplicate pairs."""
    with_sh = df.select(
        F.col(id_col), word_shingles(text_col, k).alias("shingles")
    ).withColumn("minhash", minhash_signature(F.col("shingles"), num_hashes))
    cands = lsh_candidates(with_sh, id_col=id_col, bands=bands,
                           rows_per_band=num_hashes // bands)
    return jaccard_verify(cands, with_sh, id_col=id_col, threshold=threshold)


def simhash(col: Column | str, bits: int = 64) -> Column:
    """SimHash signature of the token multiset: per-bit majority vote over
    xxhash64(token). Expressed as a fold over the token array — narrow,
    no explode/shuffle needed."""
    toks = tokens(col)
    h = F.transform(toks, lambda t: F.xxhash64(t))
    def _voter(b: int):
        return lambda acc, x: acc + F.when(
            F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bit_votes = [
        F.aggregate(h, F.lit(0).cast("long"), _voter(b)) for b in range(bits)
    ]
    sig = F.lit(0).cast("long")
    for b, vote in enumerate(bit_votes):
        # shiftleft, not 2**b: bit 63 overflows a Java long literal
        bit = F.shiftleft(F.lit(1).cast("long"), b)
        sig = sig.bitwiseOR(F.when(vote > 0, bit).otherwise(F.lit(0).cast("long")))
    return sig


def simhash_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance. Small-data formulation is
    a self-join; at scale you'd band the 64-bit signature into 4×16-bit
    chunks (any pair within Hamming≤3 shares a chunk) and join per chunk —
    same pigeonhole trick as LSH banding."""
    sigs = df.select(F.col(id_col).alias("_id"), simhash(text_col).alias("sig"))
    a = sigs.select(F.col("_id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("_id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
