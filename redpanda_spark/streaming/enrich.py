"""Stream enrichment against compacted-topic lookup tables.

The reference's canonical lookup-table pattern is a compacted topic
replayed into a keep-latest map — that's how __consumer_offsets and group
metadata work (`kafka/server/group_metadata.h`,
`group_recovery_consumer.cc`), and user pipelines do the same with
cleanup.policy=compact topics (the Kafka Streams "KTable" idiom built on
exactly this storage contract, `storage/compaction_reducers.h`
keep-latest). This module is that idiom Spark-first:

  dim_from_topic    compacted topic -> keep-latest snapshot (one row per
                    key, the latest value wins by offset), decoded to
                    typed columns
  enrich            fact side (batch) joined to the dim with an explicit
                    broadcast — a dim that fits the driver ships to every
                    executor, the 100 TB fact side never shuffles
  enrich_stream     streaming fact side via foreachBatch: the dim
                    snapshot is REBUILT each micro-batch, so a produce
                    into the dim topic between triggers is visible to the
                    next batch — processing-time join semantics, exactly
                    what a KTable join gives you (not versioned/event-time
                    temporal joins, which need range state)

Scale note: keep-latest over the dim topic is a shuffle on the dim's key
— the dim topic is small by construction (it's compacted reference data;
the reference's own uses are group metadata and configs). The fact-side
join is broadcast, never a shuffle of the stream.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redpanda_spark.operators.compaction import compact_keep_latest


def dim_from_topic(
    engine,
    topic: str,
    decode: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Keep-latest snapshot of a (compacted or not) topic: ONE row per
    key — the KTable materialization. Within a partition the latest
    offset wins (exact log order, matching compaction); a key that
    appears in MULTIPLE partitions (possible after a partition-count or
    routing change — offsets are not comparable across partitions) is
    resolved deterministically by (timestamp, partition, offset).
    ``decode`` maps the raw record frame (key/value binary) to typed
    columns; default exposes key/value as-is. Tombstones (null value)
    are dropped — a delete removes the dim row, like compaction would."""
    per_part = compact_keep_latest(
        engine.log(topic), ["partition", "key"], order_col="offset"
    )
    # cross-partition stage runs on one-row-per-(partition,key) — tiny
    ordered = per_part.withColumn(
        "_dim_order", F.struct("timestamp", "partition", "offset")
    )
    latest = compact_keep_latest(ordered, ["key"], order_col="_dim_order").drop(
        "_dim_order"
    )
    latest = latest.where(F.col("value").isNotNull())
    return decode(latest) if decode is not None else latest


def enrich(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join facts to a dim snapshot. The dim is broadcast by default —
    the fact side keeps its partitioning (no shuffle at any scale)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on, how)


def enrich_stream(
    stream: DataFrame,
    dim_builder: Callable[[], DataFrame],
    on: list[str] | str,
    sink: Callable[[DataFrame, int], None],
    how: str = "left",
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming enrich via foreachBatch: ``dim_builder`` is invoked per
    micro-batch, so dim updates land on the next trigger (processing-time
    KTable semantics). ``sink(enriched_batch_df, batch_id)`` handles the
    output — typically engine.produce or write_datalake."""

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = enrich(batch_df, dim_builder(), on, how=how)
        sink(out, batch_id)

    w = stream.writeStream.foreachBatch(run_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
