"""Skew-aware joins: deterministic key salting.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) already handles sort-merge-join skew at runtime, but it cannot
help when (a) the skewed side feeds a shuffled HASH join or aggregation,
(b) one hot key exceeds a single executor's memory even after AQE's
split-by-size (the classic 100 TB "one user is 10% of the fact table"
case), or (c) the engine is pinned to a plan shape AQE won't rewrite.
Salting is the standard fix: spread each hot key over ``salt_factor``
sub-keys on the big side and replicate the matching small-side rows once
per sub-key, so the shuffle distributes a hot key across salt_factor
reducers instead of one.

Everything here is deterministic — the salt is a hash of a caller-named
high-cardinality spread column (NEVER ``rand()``: retried tasks must
re-salt a row identically, or a shuffle-stage retry double-counts /
drops rows under speculative execution), and the join output is
row-identical to the unsalted join, which is exactly what the
``events_skew_join`` oracle checks.

Reference: this is operational tooling for the analytics surface
(SURVEY §6 scale notes); the reference engine sidesteps the problem by
hash-partitioning on producer keys (`cluster/partition_allocator.cc`),
which is the same trick applied at ingest time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_rp_salt"


def detect_hot_keys(
    df: DataFrame,
    key: str,
    min_share: float = 0.01,
    max_keys: int = 1000,
) -> list:
    """Keys holding more than ``min_share`` of the rows.

    One map-side-combinable count aggregation over ONE scan of the fact
    table (the total row count derives from the persisted per-key counts
    — a second full scan for df.count() would double the probe's I/O at
    the 100 TB target); at most ``1/min_share`` keys can exceed the
    share, so the collect is bounded by construction (and capped at
    ``max_keys`` as a belt). Sorted by count desc, ties by key —
    deterministic.
    """
    counts = df.groupBy(key).count().persist()
    try:
        total_row = counts.agg(F.sum("count").alias("t")).collect()[0]
        total = int(total_row["t"] or 0)
        if total == 0:
            return []
        floor = max(1, int(total * min_share))
        rows = (
            counts.where(F.col("count") > floor)
            .orderBy(F.col("count").desc(), F.col(key))
            .limit(max_keys)
            .collect()
        )
        return [r[key] for r in rows]
    finally:
        counts.unpersist()


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    spread_col: str,
    salt_factor: int = 8,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """``big.join(small, key, how)`` with hot keys spread over salt_factor
    sub-keys.

    big        fact side; its hot rows get salt = hash(spread_col) % factor
    small      dimension side; its hot rows replicate once per salt value
    spread_col a high-cardinality column of ``big`` (event id, offset…) —
               the salt must be a pure row function, not rand()
    hot_keys   keys to salt; None = salt every key (uniformly safe, costs
               salt_factor x small-side rows). Pass ``detect_hot_keys``
               output to replicate only what's hot.
    how        'inner' or 'left' (the shapes salting preserves row-for-row)

    Column set and row multiset of the result are identical to the plain
    join — only the shuffle distribution changes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    if SALT_COL in big.columns or SALT_COL in small.columns:
        # withColumn would silently OVERWRITE caller data and the final
        # drop would remove it — breaking the column-identity guarantee
        raise ValueError(
            f"salted_join: input already has a {SALT_COL!r} column — rename it"
        )

    def is_hot(col: Column) -> Column:
        if hot_keys is None:
            return F.lit(True)
        if not hot_keys:
            return F.lit(False)
        return col.isin(*hot_keys)

    big_salt = F.when(
        is_hot(big[key]),
        F.pmod(F.xxhash64(big[spread_col]), F.lit(salt_factor)).cast("int"),
    ).otherwise(F.lit(0))
    b = big.withColumn(SALT_COL, big_salt)

    salts = F.when(
        is_hot(small[key]),
        F.sequence(F.lit(0), F.lit(salt_factor - 1)),
    ).otherwise(F.array(F.lit(0)))
    s = small.withColumn(SALT_COL, F.explode(salts))

    joined = b.join(s, [key, SALT_COL], how)
    return joined.drop(SALT_COL)
