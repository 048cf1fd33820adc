"""Idempotence & transactional visibility (SURVEY.md §2.4).

Reference:
- idempotent produce dedup on (producer_id, producer_epoch, base_sequence)
  (`src/v/cluster/rm_stm.h:67-73`, `cluster/producer_state.h:46-98`)
- read_committed fetch excludes aborted-tx ranges and offsets >= LSO
  (`kafka/server/handlers/fetch.cc:116-187,341-399`), control batches are
  never returned to clients.

Spark-first: dedup is a keep-first aggregation (one shuffle, map-side
partial); aborted filtering is a range anti-join where the tx-ranges side is
tiny (one row per transaction) → broadcast, so the big log side never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDEMPOTENT_KEY = ["partition", "producer_id", "producer_epoch", "base_sequence"]


def idempotent_dedup(log: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Drop duplicate produces: keep the first-appended record per sequence key.

    Rows from non-idempotent producers (producer_id = -1) pass through
    untouched. Keep-first = min_by(offset) aggregation over the sequence key.
    """
    keys = key_cols or IDEMPOTENT_KEY
    # sequence-keyed rows only: transactional records produced without a
    # client sequence carry base_sequence=-1 (engine default) — grouping
    # those under one (pid, epoch, -1) key would collapse a producer's
    # whole partition stream to its first record
    seq_keyed = (F.col("producer_id") >= 0) & (F.col("base_sequence") >= 0)
    idem = log.where(seq_keyed)
    passthrough = log.where(~seq_keyed)
    value_cols = [c for c in log.columns if c not in keys]
    packed = F.min_by(F.struct(*value_cols), F.col("offset"))
    first = (
        idem.groupBy(*keys)
        .agg(packed.alias("_first"))
        .select(*keys, *[F.col(f"_first.{c}").alias(c) for c in value_cols])
        .select(*log.columns)
    )
    return first.unionByName(passthrough.select(*log.columns))


def last_stable_offset(log: DataFrame, tx_ranges: DataFrame) -> DataFrame:
    """LSO per partition = min(first offset of open txns, high watermark).

    Reference: fetch read bound for read_committed (`fetch.cc:341-399`).
    """
    hwm = log.groupBy("partition").agg((F.max("offset") + F.lit(1)).alias("hwm"))
    open_min = (
        tx_ranges.where(F.col("outcome") == "open")
        .groupBy("partition")
        .agg(F.min("first_offset").alias("open_first"))
    )
    return (
        hwm.join(F.broadcast(open_min), "partition", "left")
        .select(
            "partition",
            F.least(F.coalesce("open_first", "hwm"), F.col("hwm")).alias("lso"),
        )
    )


def read_committed(log: DataFrame, tx_ranges: DataFrame) -> DataFrame:
    """read_committed view: drop control rows, aborted-tx ranges, rows >= LSO.

    The aborted-range exclusion is a broadcast range anti-join
    (offset BETWEEN first AND last AND same partition+producer): the log side
    streams through unshuffled. The reference does the same with an in-memory
    aborted-range list attached to each fetch (`fetch.cc:116-187`).
    """
    aborted = tx_ranges.where(F.col("outcome") == "aborted").select(
        F.col("partition").alias("a_partition"),
        F.col("producer_id").alias("a_pid"),
        "first_offset",
        "last_offset",
    )
    lso = last_stable_offset(log, tx_ranges)
    visible = (
        log.where(~F.col("is_control"))
        .join(F.broadcast(lso), "partition", "left")
        .where(F.col("offset") < F.coalesce(F.col("lso"), F.lit(2**62)))
        .drop("lso")
    )
    cond = (
        (F.col("partition") == F.col("a_partition"))
        & (F.col("producer_id") == F.col("a_pid"))
        & F.col("offset").between(F.col("first_offset"), F.col("last_offset"))
        & F.col("is_transactional")
    )
    return visible.join(F.broadcast(aborted), cond, "left_anti")
