"""Cross-cluster topic replication — the MirrorMaker idiom over two
TopicEngines.

The reference ships its own cross-cluster story as enterprise remote
read replicas over tiered storage; the open-ecosystem equivalent every
Kafka user runs is MirrorMaker: consume from a source cluster, produce
to a target, preserving partition routing and per-partition order, with
incremental progress tracked by the target's own committed offsets
(no side state to lose — the replica IS the checkpoint).

Offset preservation: when the destination partition is empty and the
source has no truncated prefix, replicated records keep their source
offsets (both engines assign contiguously from 0). After a source
DeleteRecords, offsets diverge by the truncated prefix — same as
MirrorMaker, which never promises offset equality, only order. The
verifier (redpanda_spark.verifier) can assert replica integrity either
way.

Scale shape: one fetch scan of the source tail (manifest-pruned to
offsets >= the replica's watermark) and one produce append per call —
no driver data path; the copy is a Spark job end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def replicate_topic(src_engine, dst_engine, topic: str, dst_topic: str | None = None) -> dict[int, int]:
    """One incremental replication pass. Creates the destination topic
    (same config) if missing; copies every source record at offsets >=
    the destination's high watermark per partition, preserving partition
    routing and per-partition order. Returns {partition: rows_copied}.

    Idempotent: a second call with no new source records copies nothing.
    Crash-safe: the produce commits atomically on the destination; a
    crash mid-copy leaves the destination at its previous watermark and
    the next pass re-copies the batch (at-least-once per pass, exactly-
    once net — the watermark gate skips anything already committed)."""
    dst_topic = dst_topic or topic
    cfg = src_engine.list_topics()[topic]
    if dst_topic not in dst_engine.list_topics():
        import copy

        dst_engine.create_topic(dst_topic, copy.deepcopy(cfg))

    dst_hwm = dst_engine.high_watermarks(dst_topic)
    src_hwm = src_engine.high_watermarks(topic)
    todo = {p: dst_hwm.get(p, 0) for p in src_hwm if src_hwm[p] > dst_hwm.get(p, 0)}
    if not todo:
        return {}

    log = src_engine.log(topic)
    pairs = ", ".join(f"{p}, {o}L" for p, o in sorted(todo.items()))
    tail = log.where(
        F.col("offset")
        >= F.coalesce(
            F.expr(f"try_element_at(map({pairs}), partition)"),
            F.lit(1 << 62),  # partitions already in sync copy nothing
        )
    )
    # produce assigns ingest order from frame order: range-partition +
    # sort so per-partition offset order survives the copy
    batch = (
        tail.select(
            "partition", "timestamp", "key", "value", "headers",
            "producer_id", "producer_epoch", "base_sequence",
            "is_transactional", "is_control", "offset",
        )
        .repartitionByRange("partition", "offset")
        .sortWithinPartitions("partition", "offset")
        .drop("offset")
    )
    dst_engine.produce(dst_topic, batch)
    new_hwm = dst_engine.high_watermarks(dst_topic)
    return {p: new_hwm.get(p, 0) - dst_hwm.get(p, 0) for p in todo}
