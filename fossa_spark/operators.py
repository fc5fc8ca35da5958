"""Scale-pattern operators: skew-handling joins and co-location helpers.

These are the patterns the engine reaches for when AQE alone isn't enough —
the cases called out in SURVEY.md §4/§7: skewed join keys (a handful of hot
keys dominating a shuffle) and repeated joins on the same key (bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot key of ``big`` across
    ``salt`` reducers.

    big rows get a deterministic salt in [0, salt) (hash of the whole row —
    uniform, reproducible); ``small`` is replicated ``salt`` times with
    every salt value. The join key becomes (key, salt), so a key with 10⁹
    occurrences lands on ``salt`` reducers instead of one. Replication
    multiplies the small side by ``salt`` — use only when `small` is small
    and the key histogram is genuinely skewed; AQE's skew-join split
    (enabled in session.py) covers the moderate cases automatically.

    Result is column-identical to ``big.join(small, key, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def broadcast_threshold_hint(df: DataFrame, force: bool = True) -> DataFrame:
    """Explicit broadcast hint — used when statistics are missing (fresh
    files, no ANALYZE) and Catalyst would otherwise pick a shuffle join."""
    return F.broadcast(df) if force else df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    allow_exact_match: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """General as-of join (pandas ``merge_asof`` semantics, Spark-scale
    formulation): for every left row, attach the single right row with the
    greatest ``right_ts`` ≤ ``left_ts`` (direction="backward") or smallest
    ``right_ts`` ≥ ``left_ts`` ("forward"), matching on ``on``.

    No pairwise time-range join anywhere: tag both sides, UNION, one window
    pass partitioned by the key ordered by time — last-seen right payload
    carried forward (O(1) state per row, one shuffle on the key). This is
    the only as-of shape that survives two big sides at 100 TB; Spark has
    no native as-of join (pandas-on-Spark's merge_asof builds a similar
    plan).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = [c for c in left.columns if c not in (on, left_ts)]
    rcols = [c for c in right.columns if c not in (on, right_ts)]

    payload = F.struct(F.col(right_ts).alias("_rts"),
                       *[F.col(c) for c in rcols]).alias("_rpayload")
    r = right.select(F.col(on), F.col(right_ts).alias("_ts"), payload,
                     F.lit(0).alias("_side"))
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r.schema["_rpayload"].dataType).alias("_rpayload"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
    )
    r_full = r.select(
        on, "_ts", "_rpayload", "_side",
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    u = l.unionByName(r_full)

    # right rows sort before left rows at equal ts iff exact match allowed
    # (same rule both directions); the payload struct is the final tiebreak
    # so duplicate right timestamps resolve deterministically
    side_order = F.col("_side").asc() if allow_exact_match else F.col("_side").desc()
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        W.partitionBy(on)
        .orderBy(ts_order, side_order, F.col("_rpayload").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    matched = u.withColumn("_match", F.last("_rpayload", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        F.col(on),
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lcols],
        F.col("_match._rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_match.{c}").alias(c if c not in lcols else f"{c}{suffix}")
          for c in rcols],
    )
    return out


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    ord_col: str = "seq",
) -> DataFrame:
    """CDC merge (MERGE INTO semantics, batch formulation): apply a change
    feed of upserts ('U') and deletes ('D') to a snapshot — the latest
    change per key (by ``ord_col``, exact integer ordering) wins, deletes
    remove the key, upserts replace matched rows or insert new ones.

    Shape: one window pass to reduce the feed to last-change-per-key, one
    full-outer join on the key, coalesce per column. No MERGE statement
    needed (OSS parquet has no ACID MERGE; the lakehouse formats implement
    exactly this plan under theirs) and no driver involvement — both sides
    shuffle once on the key at any scale.

    ``changes`` must carry the snapshot's non-key columns (values for 'U';
    ignored for 'D')."""
    w = W.partitionBy(key).orderBy(F.col(ord_col).desc())
    last = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    cols = [c for c in snapshot.columns if c != key]
    s = snapshot.select(key, *[F.col(c).alias(f"_s_{c}") for c in cols])
    c = last.select(
        key, F.col(op_col).alias("_op"), *[F.col(x).alias(f"_c_{x}") for x in cols]
    )
    j = s.join(c, key, "full_outer")
    merged = j.filter(F.col("_op").isNull() | (F.col("_op") != "D")).select(
        key,
        *[
            F.when(F.col("_op") == "U", F.col(f"_c_{x}"))
            .otherwise(F.col(f"_s_{x}"))
            .alias(x)
            for x in cols
        ],
    )
    return merged


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: float,
    how_filter: str = "overlap",
) -> DataFrame:
    """Interval-overlap join for TWO LARGE sides via banding: explode each
    interval into the fixed-width buckets it covers, equi-join on the
    bucket id (a hash join — no nested loop), then apply the exact overlap
    predicate. Shuffle volume = Σ interval_width/bucket per row; pick
    ``bucket`` ≈ the median interval width.

    Fan-out dedup is free: a pair overlapping n shared buckets is emitted
    only in its canonical bucket — the first bucket both intervals cover
    (``_b == greatest(first_l, first_r)``) — a per-row filter, not a
    DISTINCT. (The previous whole-row ``.distinct()`` was a second full
    shuffle of both payloads AND collapsed legitimately duplicate input
    rows — wrong semantics and wrong cost.)

    Intervals are half-open [start, end). Numeric columns (cast timestamps
    to epoch seconds first)."""
    lb = left.withColumn(
        "_lb0", F.floor(F.col(l_start) / bucket).cast("long")
    ).withColumn(
        "_b",
        F.explode(
            F.sequence(F.col("_lb0"), F.ceil(F.col(l_end) / bucket).cast("long"))
        ),
    )
    rb = right.withColumn(
        "_rb0", F.floor(F.col(r_start) / bucket).cast("long")
    ).withColumn(
        "_b",
        F.explode(
            F.sequence(F.col("_rb0"), F.ceil(F.col(r_end) / bucket).cast("long"))
        ),
    )
    joined = (
        lb.join(rb, "_b")
        .filter(F.col("_b") == F.greatest(F.col("_lb0"), F.col("_rb0")))
        .drop("_b", "_lb0", "_rb0")
    )
    if how_filter == "overlap":
        joined = joined.filter(
            (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
        )
    return joined


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    n_ranges: int = 32,
) -> DataFrame:
    """Distributed 2-D skyline (Pareto frontier): rows not dominated by any
    other row with x' <= x AND y' >= y and one strict (minimize x,
    maximize y).

    The naive definition is an O(n²) self-join; the classic sweep is
    O(n log n) but needs a TOTAL order — and a Spark window with no
    PARTITION BY collapses everything into ONE task (the corpus-wide-
    window smell this repo bans).  So: two-phase distributed sweep, the
    same decomposition every distributed prefix-scan uses —

      1. repartitionByRange on x (equal x values co-locate; partition ids
         come out range-ordered), per-partition y-maxima → one tiny
         (n_ranges)-row aggregate collected to the driver and turned into
         an EXCLUSIVE prefix max per partition (control-plane-sized by
         construction).
      2. each partition sweeps locally: running y-max over strictly-
         earlier x (value-RANGE window partitioned by partition id) and
         a same-x max; a row survives iff neither the local sweep, the
         same-x group, nor the broadcast prefix max dominates it.

    Work is O(n log n) total, the only corpus-wide ops are the range
    exchange and a partition-grain aggregate — no join, no global window.

    ``x_col`` must be a UNIT-GRANULAR type: the strictly-earlier-x sweep
    is a value-RANGE frame ``(unboundedPreceding, -1)``, and "-1" equals
    "x' < x" only at unit granularity.  A fractional x (e.g. a double
    price) would silently exclude dominators with x' in (x-1, x), so we
    reject it loudly (round-3 advisor finding).  Accepted: the four
    integral types plus decimal(p, 0), which is equally unit-granular
    (round-4 advisor: the gate also now resolves the column with Spark's
    case-insensitive semantics instead of an exact dict lookup).  DATE is
    unit-granular too but explicitly rejected: Spark requires INTERVAL
    frame boundaries for date ORDER BY, so the integer ``-1`` frame below
    would not analyze — cast to datediff-days first.
    """
    try:
        x_field = df.schema[x_col]  # Spark-style: case-insensitive resolve
    except KeyError:
        matches = [f for f in df.schema.fields if f.name.lower() == x_col.lower()]
        if len(matches) != 1:
            raise TypeError(
                f"skyline_2d: x_col {x_col!r} not found (or ambiguous) in "
                f"schema {[f.name for f in df.schema.fields]}"
            ) from None
        x_field = matches[0]
    x_type = x_field.dataType.simpleString()
    is_unit_decimal = x_type.startswith("decimal(") and x_type.endswith(",0)")
    if x_type not in ("tinyint", "smallint", "int", "bigint") and not is_unit_decimal:
        hint = (
            "cast to an integer day count (e.g. datediff) first"
            if x_type == "date"
            else "Scale/cast fractional x to integer units first."
        )
        raise TypeError(
            f"skyline_2d requires a unit-granular integral x_col; "
            f"{x_col!r} is {x_type}. {hint}"
        )
    ranged = (
        df.select(F.col(id_col), F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
        .repartitionByRange(n_ranges, F.col("_x"))
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = ranged.persist()
    part_max = {
        r["_pid"]: r["m"]
        for r in ranged.groupBy("_pid").agg(F.max("_y").alias("m")).collect()
    }
    prefix: dict[int, int] = {}
    best = None
    for pid in sorted(part_max):
        prefix[pid] = best
        best = part_max[pid] if best is None else max(best, part_max[pid])
    prefix_entries = [
        x
        for pid, m in prefix.items()
        if m is not None
        for x in (F.lit(pid), F.lit(m))
    ]
    prefix_expr = (
        F.create_map(*prefix_entries).getItem(F.col("_pid"))
        if prefix_entries
        else F.lit(None).cast("long")
    )
    w_before = (
        W.partitionBy("_pid").orderBy("_x").rangeBetween(W.unboundedPreceding, -1)
    )
    # same-x peers: RANGE (0, 0) over the SAME pid window — equal x values
    # are co-located by the range partitioner, so no second exchange
    w_same = (
        W.partitionBy("_pid").orderBy("_x").rangeBetween(0, 0)
    )
    flagged = ranged.select(
        id_col,
        "_x",
        "_y",
        F.max("_y").over(w_before).alias("_local_before"),
        F.max("_y").over(w_same).alias("_same_x"),
        prefix_expr.alias("_prefix"),
    )
    out = flagged.filter(
        ~(
            F.coalesce(F.col("_local_before") >= F.col("_y"), F.lit(False))
            | F.coalesce(F.col("_prefix") >= F.col("_y"), F.lit(False))
            | (F.col("_same_x") > F.col("_y"))
        )
    ).select(id_col, "_x", "_y")
    out = out.localCheckpoint(eager=True)
    ranged.unpersist()
    return out
