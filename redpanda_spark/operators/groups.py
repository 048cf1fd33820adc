"""Consumer-group operators (SURVEY.md §2.3).

The reference persists group offsets in a compacted `__consumer_offsets`
topic (`src/v/kafka/server/group_metadata.h:71,121`) and recovers state by
replay (`group_recovery_consumer.cc`). Here the offsets log is a table of
commit events; reads are keep-latest-by-(group,topic,partition) — the same
compaction operator, reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redpanda_spark.operators.compaction import compact_keep_latest

GROUP_KEY = ["group_id", "topic", "partition"]


def offset_fetch(commits: DataFrame) -> DataFrame:
    """OffsetFetch: latest committed offset per (group, topic, partition).

    Tombstoned entries (OffsetDelete) are excluded, matching compacted-topic
    recovery semantics.
    """
    latest = compact_keep_latest(commits, GROUP_KEY, order_col="commit_seq")
    return latest.where(~F.col("deleted")).select(
        *GROUP_KEY, "committed_offset", "leader_epoch", "metadata"
    )


def list_groups(commits: DataFrame) -> DataFrame:
    return commits.select("group_id").distinct()


def group_lag(commits: DataFrame, log_ends: DataFrame) -> DataFrame:
    """Per (group, topic, partition) lag = high watermark − committed offset.

    ``log_ends``: (topic?, partition, high_watermark). Small (one row per
    partition) → broadcast join, no shuffle of the commits side beyond the
    keep-latest agg.
    """
    latest = offset_fetch(commits)
    join_keys = [k for k in ("topic", "partition") if k in log_ends.columns]
    return latest.join(F.broadcast(log_ends), join_keys, "inner").withColumn(
        "lag", F.col("high_watermark") - F.col("committed_offset")
    )


def expired_offsets(
    commits: DataFrame,
    now_ns: int,
    retention_ms: int,
    active_groups: DataFrame | None = None,
) -> DataFrame:
    """Offsets eligible for expiry (KIP-211; reference: group offset GC in
    the group coordinator — `src/v/kafka/server/group.cc` offset_expiry):
    the LATEST commit per (group, topic, partition) is expirable when it is
    older than `offsets.retention.ms` AND the group has no live members.
    Earlier commits never matter (keep-latest shadows them), and a single
    fresh commit protects its partition slot."""
    latest = compact_keep_latest(commits, GROUP_KEY, order_col="commit_seq")
    cutoff = now_ns - retention_ms * 1_000_000
    exp = latest.where(~F.col("deleted") & (F.col("commit_seq") < cutoff))
    if active_groups is not None:
        exp = exp.join(
            F.broadcast(active_groups.select("group_id")), "group_id", "left_anti"
        )
    return exp.select(*GROUP_KEY, "committed_offset", "commit_seq")
