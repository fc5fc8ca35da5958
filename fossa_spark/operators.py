"""Scale-pattern operators: skew-handling joins and co-location helpers.

These are the patterns the engine reaches for when AQE alone isn't enough —
the cases called out in SURVEY.md §4/§7: skewed join keys (a handful of hot
keys dominating a shuffle) and repeated joins on the same key (bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
