"""Key compaction — keep-latest-per-key with tombstone grace.

Reference: sliding-window compaction builds a key→latest-offset map then
filters older duplicates (`storage/disk_log_impl.cc:560-700`,
`storage/key_offset_map.h:26,68,109`, reducers
`storage/compaction_reducers.h:39-217`). Tombstones (null value) survive
until a grace period elapses, then are removed
(`src/v/model/record.h:253-255`; delete.retention.ms semantics).

Spark-first design: `groupBy(key).agg(max_by(struct(*cols), offset))` — one
shuffle on the key with map-side partial aggregation (each task keeps only
its local latest per key before shuffling), which is exactly the bounded-
memory key_offset_map strategy of the reference, except the shuffle spills
automatically instead of falling back to a hashed map. This beats a
window+row_number plan, which must shuffle *all* rows and sort them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_keep_latest(
    log: DataFrame,
    key_cols: list[str],
    order_col: str = "offset",
) -> DataFrame:
    """Latest record per key (by highest ``order_col``).

    Returns the full rows, one per distinct key. max_by is deterministic
    here because ``offset`` is unique per (partition,key) group.

    Rows with a NULL in any key column pass through unchanged: Spark's
    groupBy (like SQL's) would collapse all NULL keys into one group, so an
    unkeyed record must never participate in keep-latest (the reference
    rejects null-key produces to compacted topics rather than silently
    discarding data). Implemented as a salt column — NULL-keyed rows group
    by their own ``order_col`` so each is its own group — which keeps the
    operator a single scan + single shuffle.
    """
    value_cols = [c for c in log.columns if c not in key_cols]
    null_key = None
    for k in key_cols:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)
    salt = F.when(null_key, F.col(order_col)).otherwise(F.lit(None)).alias("_nk_salt")
    packed = F.max_by(F.struct(*value_cols), F.col(order_col))
    out = log.groupBy(*key_cols, salt).agg(packed.alias("_latest"))
    return out.select(*key_cols, *[F.col(f"_latest.{c}").alias(c) for c in value_cols])


def compact_with_tombstone_grace(
    log: DataFrame,
    key_cols: list[str],
    value_col: str,
    now,
    grace_ms: int,
    order_col: str = "offset",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Keep-latest, then drop tombstones older than the grace period.

    A tombstone (NULL ``value_col``) that is still the latest for its key is
    retained while ``now - timestamp <= grace_ms`` so slow consumers observe
    the delete, then physically removed — mirroring tombstone+grace handling
    in the reference's compaction reducers. NULL-keyed rows are not
    tombstones (no key to delete) and pass through untouched.
    """
    latest = compact_keep_latest(log, key_cols, order_col)
    # cast→timestamp first: value-preserving on TIMESTAMP, and legalizes the
    # double cast when the input column arrived as TIMESTAMP_NTZ
    grace_expr = (
        F.col(ts_col).cast("timestamp").cast("double") * 1000 + F.lit(grace_ms)
        >= F.lit(now).cast("timestamp").cast("double") * 1000
    )
    null_key = None
    for k in key_cols:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)
    return latest.where(F.col(value_col).isNotNull() | grace_expr | null_key)
