"""Scalar-function families (SURVEY.md §2c "Scalar functions") — one compound
query per family, all JVM-side built-ins (whole-stage codegen; no UDFs).

Cross-engine notes (Spark vs DuckDB oracle):
- regexp_replace: DuckDB replaces FIRST match unless the 'g' flag is given;
  Spark replaces all. Oracle SQL passes 'g'.
- floor/ceil return BIGINT in Spark but DOUBLE in DuckDB → oracle casts.
- round on libm results (ln/pow): both engines' libm may differ in the last
  ulp, so transcendental outputs are rounded to 8 dp; sqrt is IEEE
  correctly-rounded and safe raw.
- float32 embedding elements are cast to double on both sides before
  hashing (exact widening) so value canonicalization agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fossa_spark.queries._util import load, load_events, spread


def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("type_masked"),
        F.length("p_name").cast("long").alias("name_len"),
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_name", 256).alias("name_sha256"),
    )


def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        # date_trunc returns TIMESTAMP in Spark but DATE in DuckDB (month
        # granularity) — surface as an ISO string in both engines, per the
        # determinism contract (NOTES.md).
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(d, F.lit("2000-01-01").cast("date")).alias("days_since_y2k"),
        # DATE-typed outputs canonicalize differently (date vs datetime64)
        # across pandas paths — surface as ISO strings in both engines.
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
    )


def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    absbal = F.abs(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.floor("c_acctbal").alias("bal_floor"),
        F.ceil("c_acctbal").alias("bal_ceil"),
        absbal.alias("bal_abs"),
        F.sqrt(absbal).alias("bal_sqrt"),
        F.round(F.log(absbal + F.lit(1.0)), 8).alias("bal_ln"),
        F.pmod(F.col("c_nationkey") * F.lit(7) - F.lit(3), F.lit(5)).alias("bucket"),
        F.pow(F.col("c_nationkey").cast("double"), F.lit(2.0)).alias("nk_sq"),
        F.col("c_nationkey").bitwiseAND(F.lit(3)).alias("nk_and3"),
        F.col("c_nationkey").bitwiseOR(F.lit(8)).alias("nk_or8"),
        F.col("c_nationkey").bitwiseXOR(F.lit(5)).alias("nk_xor5"),
        F.shiftleft(F.col("c_nationkey"), 2).alias("nk_shl2"),
    )


def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0.0, F.lit("overdrawn"))
        .when(F.col("c_acctbal") < 3000.0, F.lit("low"))
        .otherwise(F.lit("high"))
        .alias("bal_class"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CARS")).alias(
            "segment_renamed"
        ),
        F.nvl(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias("nationkey_nz"),
        # null-safe equality: NULL <=> NULL is TRUE (vs NULL for plain =)
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
        .eqNullSafe(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")))
        .alias("nullsafe_self"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_cap5k"),
    )


def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: size, index,
    filter+size (exact ints), transform+aggregate fold (rounded), min/max."""
    e = load(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at(F.col("embedding"), 1).cast("double").alias("first_elem"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0.0)).alias("n_pos"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(
            F.aggregate(
                F.transform(as_double, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
            ),
            4,
        ).alias("vec_sumsq"),
        F.array_min("embedding").cast("double").alias("vec_min"),
        F.array_max("embedding").cast("double").alias("vec_max"),
        F.size(F.slice(F.col("embedding"), 1, 8)).alias("head_len"),
    )


def q_fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → (position, element) rows, positions preserved —
    the ordinality-aware flatten (first 8 embedding dims per vector)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return (
        e.select(
            "vec_id",
            F.posexplode(F.slice(F.col("embedding"), 1, 8)).alias("pos", "val"),
        )
        .select("vec_id", "pos", F.col("val").cast("double").alias("val"))
        .orderBy("vec_id", "pos")
    )


def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map type: build, keys/values, explode. The map-typed intermediate
    stays Spark-side; the exploded (k, v) counts are SQL-checkable."""
    e = load_events(spark, sf_dir)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    ex = e.select("event_id", F.explode(m).alias("k", "v"))
    return (
        ex.groupBy("k", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k", "v")
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions on events.props: get_json_object / from_json path
    (spread: per-row JSON parsing is CPU-bound and the events fixture has
    only 5 row groups — see _util)."""
    e = spread(load_events(spark, sf_dir), spark)
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
            parsed.getField("k").alias("k_struct"),
        )
        .filter(F.col("k_value") >= 50)
        .orderBy("event_id")
    )


def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT path (Spark 4's semi-structured type): parse_json →
    try_variant_get typed extraction — the open-schema alternative to
    from_json when event payloads evolve. Oracle mirrors with DuckDB JSON
    extraction (same typed results)."""
    e = load_events(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    return (
        e.select(
            "event_id",
            F.try_variant_get(v, "$.k", "bigint").alias("k_typed"),
            F.try_variant_get(v, "$.missing", "string").alias("absent"),
            F.is_variant_null(F.try_parse_json(F.lit("null"))).alias("null_probe"),
        )
        .filter(F.col("k_typed") < 25)
        .orderBy("event_id")
    )


def q_fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML FUNCTIONS (Spark 4 built-ins): from_xml typed parsing +
    xpath_string / xpath extraction over an XML payload column — the
    feed-ingestion twin of q_fn_variant's JSON path.  The XML document
    is built from document columns (nested scalars + one repeated <w>
    element per text token), then parsed BACK with both APIs; the oracle
    re-derives every output straight from the source columns, so the
    checked property is that Spark's XML parse path (from_xml struct
    fields, xpath node lists) is lossless against the data that
    generated the document.  Two fixture premises, both pinned by
    tests/test_oracle_parity.py::test_fn_xml_fixture_premises: (a) the
    text is XML-safe (no &, <, >) so no escaping layer muddies the
    parity, and (b) spacing is regular (no empty/leading/trailing/double
    -space tokens) so the xpath text() node list is positionally
    identical to string_split — an empty <w></w> element yields NO text
    node, which would shift first_word off the oracle's [1]."""
    d0 = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    words = F.split(F.col("text"), " ")
    xml = F.concat(
        F.lit("<n><k>"), F.col("doc_id").cast("string"),
        F.lit("</k><lang>"), F.col("lang"),
        F.lit("</lang><ws><w>"),
        F.concat_ws("</w><w>", words),
        F.lit("</w></ws></n>"),
    )
    d = d0.select("doc_id", xml.alias("doc"))
    parsed = F.from_xml(
        "doc", "k BIGINT, lang STRING, ws STRUCT<w: ARRAY<STRING>>"
    )
    return (
        d.select(
            "doc_id",
            parsed.getField("k").alias("k_typed"),
            parsed.getField("lang").alias("lang_typed"),
            F.size(parsed.getField("ws").getField("w")).alias("n_words"),
            F.expr("xpath_string(doc, '/n/lang/text()')").alias("lang_xpath"),
            F.expr("xpath(doc, '/n/ws/w/text()')")[0].alias("first_word"),
        )
        .orderBy("doc_id")
    )


def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct build + field access + named_struct comparison
    (flattened back to scalars so the hash is structure-agnostic)."""
    c = load(spark, sf_dir, "customer")
    nested = F.struct(
        F.col("c_name").alias("name"),
        F.struct(
            F.col("c_nationkey").alias("nation"), F.col("c_mktsegment").alias("segment")
        ).alias("loc"),
    )
    d = c.select("c_custkey", nested.alias("info"))
    return d.select(
        "c_custkey",
        F.col("info.name").alias("name"),
        F.col("info.loc.nation").alias("nation"),
        F.col("info.loc.segment").alias("segment"),
        (F.col("info.loc.nation") == F.lit(7)).alias("is_nation7"),
    ).orderBy("c_custkey")


def q_fn_strdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance functions: Levenshtein edit distance of every part
    name against a probe string and against the name's own reverse —
    the fuzzy-matching primitive for entity resolution / near-key joins."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_name",
        F.levenshtein(F.col("p_name"), F.lit("red widget")).cast("long").alias(
            "dist_probe"
        ),
        F.levenshtein(F.col("p_name"), F.reverse(F.col("p_name"))).cast("long").alias(
            "dist_reverse"
        ),
        F.reverse(F.col("p_name")).alias("name_rev"),
    ).orderBy("p_partkey")


def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators over integer keys: AND/OR/XOR/NOT/shifts plus
    bit_count — the hash/partitioning/bitmap primitives."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and255"),
        k.bitwiseOR(F.lit(4096)).alias("or4096"),
        k.bitwiseXOR(F.col("o_custkey")).alias("xor_cust"),
        F.bitwise_not(k).alias("not_key"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bit_count(k).cast("long").alias("popcount"),
    ).orderBy("o_orderkey")


def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe functions — the semantics that decide whether a
    malformed row poisons a 100 TB job or degrades to NULL: try_divide
    (÷0 → NULL), try_cast over a column seeded with genuinely unparseable
    strings, try_to_number with a strict format, try_add at the int64
    overflow boundary.  Every branch produces value-bearing rows AND
    NULL rows, so the hash pins both sides of each behavior.  try_* exprs
    run interpreted (TryEval blocks codegen), so the demo runs on a
    deterministic 2-in-5 key slice and skips the cosmetic orderBy —
    semantics coverage is identical, constant cost is ~2.5× lower.  The
    slice keeps keys with o_orderkey % 5 IN (0, 1) so try_divide sees BOTH
    a zero divisor (→ NULL) and a non-zero one (→ value); a `% 5 < 1`
    slice would leave divisor 0 on every row and collapse div_maybe to a
    constant NULL (round-3 advisor finding)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 < 2)
    # seed malformed input deterministically: every 3rd key gets a
    # non-numeric suffix the cast must reject, not silently truncate
    dirty = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.concat(F.col("o_orderkey").cast("string"), F.lit("x")),
    ).otherwise(F.col("o_orderkey").cast("string"))
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 5).cast("double")
        ).alias("div_maybe"),
        dirty.try_cast("bigint").alias("cast_maybe"),
        F.try_to_number(
            F.when(F.col("o_orderkey") % 4 == 0, F.lit("12,345"))
            .otherwise(F.lit("oops")),
            F.lit("99,999"),
        ).cast("double").alias("num_maybe"),
        F.try_add(
            F.lit(9223372036854775807).cast("bigint"),
            (F.col("o_orderkey") % 2).cast("bigint"),
        ).alias("add_maybe"),
    )


QUERIES = {
    "q_fn_try": q_fn_try,
    "q_fn_strdist": q_fn_strdist,
    "q_fn_bitwise": q_fn_bitwise,
    "q_fn_variant": q_fn_variant,
    "q_fn_xml": q_fn_xml,
    "q_fn_string": q_fn_string,
    "q_fn_struct": q_fn_struct,
    "q_fn_posexplode": q_fn_posexplode,
    "q_fn_date": q_fn_date,
    "q_fn_math": q_fn_math,
    "q_fn_cond": q_fn_cond,
    "q_fn_array": q_fn_array,
    "q_fn_map": q_fn_map,
    "q_json_extract": q_json_extract,
}

ORACLE = {
    # DuckDB lacks try_divide/try_add and x/0.0 yields inf, so the oracle
    # spells out the NULL-on-error semantics the ANSI try_* family defines
    "q_fn_try": """
        SELECT o_orderkey,
               CASE WHEN (o_orderkey % 5) = 0 THEN NULL
                    ELSE o_totalprice / CAST(o_orderkey % 5 AS DOUBLE)
               END AS div_maybe,
               TRY_CAST(CASE WHEN o_orderkey % 3 = 0
                             THEN CAST(o_orderkey AS VARCHAR) || 'x'
                             ELSE CAST(o_orderkey AS VARCHAR) END
                        AS BIGINT) AS cast_maybe,
               CASE WHEN o_orderkey % 4 = 0 THEN 12345.0 END AS num_maybe,
               CASE WHEN o_orderkey % 2 = 0 THEN 9223372036854775807 END
                 AS add_maybe
        FROM orders WHERE o_orderkey % 5 < 2
    """,
    # The map is BUILT and EXPLODED Spark-side (create_map → explode); the
    # oracle checks the exploded (k, v) relation, which plain SQL can
    # express — the map-typed intermediate never crosses engines.
    "q_fn_map": """
        SELECT k, v, COUNT(*) AS n FROM (
          SELECT 'type' AS k, event_type AS v FROM events
          UNION ALL
          SELECT 'uid' AS k, CAST(user_id AS VARCHAR) AS v FROM events
        ) GROUP BY k, v ORDER BY k, v
    """,
    # everything re-derived from the generating columns: k/name are the
    # source fields, word list from the same split the XML was built from
    "q_fn_xml": """
        SELECT doc_id,
               doc_id AS k_typed,
               lang AS lang_typed,
               CAST(len(string_split(text, ' ')) AS INT) AS n_words,
               lang AS lang_xpath,
               string_split(text, ' ')[1] AS first_word
        FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
    "q_fn_variant": """
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
               CAST(json_extract_string(props, '$.missing') AS VARCHAR)
                 AS absent,
               TRUE AS null_probe
        FROM events
        WHERE CAST(json_extract(props, '$.k') AS BIGINT) < 25
        ORDER BY event_id
    """,
    "q_fn_bitwise": """
        SELECT o_orderkey,
               o_orderkey & 255 AS and255,
               o_orderkey | 4096 AS or4096,
               xor(o_orderkey, o_custkey) AS xor_cust,
               ~o_orderkey AS not_key,
               o_orderkey << 3 AS shl3,
               o_orderkey >> 2 AS shr2,
               CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
        FROM orders ORDER BY o_orderkey
    """,
    "q_fn_strdist": """
        SELECT p_partkey, p_name,
               CAST(levenshtein(p_name, 'red widget') AS BIGINT) AS dist_probe,
               CAST(levenshtein(p_name, reverse(p_name)) AS BIGINT)
                 AS dist_reverse,
               reverse(p_name) AS name_rev
        FROM part ORDER BY p_partkey
    """,
    "q_fn_struct": """
        SELECT c_custkey, c_name AS name, c_nationkey AS nation,
               c_mktsegment AS segment, c_nationkey = 7 AS is_nation7
        FROM customer ORDER BY c_custkey
    """,
    "q_fn_posexplode": """
        SELECT vec_id, CAST(gs - 1 AS INTEGER) AS pos,
               CAST(embedding[gs] AS DOUBLE) AS val
        FROM embeddings JOIN generate_series(1, 8) AS t(gs) ON TRUE
        WHERE vec_id < 50
        ORDER BY vec_id, pos
    """,
    "q_fn_string": """
        SELECT p_partkey,
               p_brand || '-' || p_type AS brand_type,
               substring(p_name, 1, 5) AS name5,
               upper(p_name) AS name_upper,
               lower(p_brand) AS brand_lower,
               trim('  ' || p_name || '  ') AS name_trim,
               lpad(p_brand, 12, '*') AS brand_pad,
               split_part(p_name, ' ', 1) AS first_word,
               regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
               regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_masked,
               CAST(length(p_name) AS BIGINT) AS name_len,
               md5(p_name) AS name_md5,
               sha256(p_name) AS name_sha256
        FROM part
    """,
    "q_fn_date": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               CAST(day(o_orderdate) AS INTEGER) AS dom,
               strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d')
                 AS month_start,
               CAST(date_diff('day', DATE '2000-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
                 AS days_since_y2k,
               strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date
        FROM orders
    """,
    "q_fn_math": """
        SELECT c_custkey,
               CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
               CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
               abs(c_acctbal) AS bal_abs,
               sqrt(abs(c_acctbal)) AS bal_sqrt,
               round(ln(abs(c_acctbal) + 1.0), 8) AS bal_ln,
               ((c_nationkey * 7 - 3) % 5 + 5) % 5 AS bucket,
               power(CAST(c_nationkey AS DOUBLE), 2.0) AS nk_sq,
               c_nationkey & 3 AS nk_and3,
               c_nationkey | 8 AS nk_or8,
               xor(c_nationkey, 5) AS nk_xor5,
               CAST(c_nationkey << 2 AS INTEGER) AS nk_shl2
        FROM customer
    """,
    "q_fn_cond": """
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0.0 THEN 'overdrawn'
                    WHEN c_acctbal < 3000.0 THEN 'low'
                    ELSE 'high' END AS bal_class,
               coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CARS') AS segment_renamed,
               ifnull(nullif(c_nationkey, 0), -1) AS nationkey_nz,
               nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM
                 nullif(c_mktsegment, 'BUILDING') AS nullsafe_self,
               greatest(c_acctbal, 0.0) AS bal_floor0,
               least(c_acctbal, 5000.0) AS bal_cap5k
        FROM customer
    """,
    "q_fn_array": """
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_elem,
               CAST(len(list_filter(embedding, x -> x > 0.0)) AS INTEGER) AS n_pos,
               round(list_reduce(list_prepend(0.0, list_transform(embedding,
                     x -> CAST(x AS DOUBLE))), (acc, x) -> acc + x), 4) AS vec_sum,
               round(list_reduce(list_prepend(0.0, list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, x) -> acc + x), 4)
                 AS vec_sumsq,
               CAST(list_min(embedding) AS DOUBLE) AS vec_min,
               CAST(list_max(embedding) AS DOUBLE) AS vec_max,
               CAST(len(embedding[1:8]) AS INTEGER) AS head_len
        FROM embeddings
    """,
    "q_json_extract": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        ORDER BY event_id
    """,
}
