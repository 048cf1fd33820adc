"""Log-storage operators (SURVEY.md §2.2) as declarative DataFrame plans.

Reference semantics re-expressed Spark-first:

- Fetch (offset-range read)    — reference `kafka/server/handlers/fetch.cc:300`
                                 (do_read_from_ntp), `storage/log_reader.h:131`
- ListOffsets earliest/latest  — reference `handlers/list_offsets.cc:100-132`
- ListOffsets timequery        — reference `handlers/list_offsets.cc:66-157`,
                                 `storage/disk_log_impl.cc:2440-2560`
- Retention (time/size GC)     — reference `storage/disk_log_impl.cc:260-417`
- DeleteRecords prefix-trunc   — reference `handlers/delete_records.cc:115-172`
- Offset assignment at append  — reference `storage/disk_log_appender.cc`

All operators are single-shuffle-or-less: filters push down to the parquet
scan (the sparse offset/time index of the reference becomes parquet
row-group min/max stats — data skipping is free), and the per-partition
aggregations do map-side partial aggregation before one shuffle on the
partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fetch(
    log: DataFrame,
    partition: int | None = None,
    start_offset: int = 0,
    end_offset: int | None = None,
    max_records: int | None = None,
) -> DataFrame:
    """Offset-range scan of a partition — the Fetch RPC data path.

    Both predicates reach the parquet scan (PushedFilters), so a fetch of a
    recent offset range on a 100 TB topic touches only the tail files, the
    same index-skip the reference gets from its sparse offset index
    (`storage/index_state.h`).
    """
    out = log
    if partition is not None:
        out = out.where(F.col("partition") == F.lit(partition))
    out = out.where(F.col("offset") >= F.lit(start_offset))
    if end_offset is not None:
        out = out.where(F.col("offset") < F.lit(end_offset))
    if max_records is not None:
        # orderBy + limit compiles to TakeOrderedAndProject (per-partition
        # top-k + driver merge of k rows) — no full sort-shuffle.
        out = out.orderBy("partition", "offset").limit(max_records)
    else:
        # Unbounded fetch: Kafka guarantees order only WITHIN a topic
        # partition, but a topic partition's rows span many parquet files
        # (one per produce batch), so a bare sortWithinPartitions over scan
        # splits cannot deliver even that. Range-partition on (partition,
        # offset) + local sort: rows of one topic partition stay in offset
        # order across adjacent range tasks (range boundaries give the
        # cross-task order), while a HOT topic partition still splits over
        # several tasks — unlike a hash repartition on the partition column,
        # which would funnel a skewed partition's entire range into one
        # giant sort-and-spill task at 100 TB. Cost is one exchange either
        # way (plus the range sampler's lightweight pass).
        out = out.repartitionByRange("partition", "offset").sortWithinPartitions(
            "partition", "offset"
        )
    return out


def list_offsets(log: DataFrame) -> DataFrame:
    """Earliest / latest offsets per partition (ListOffsets specials -2/-1).

    latest = last offset + 1 (the next offset to be assigned = high
    watermark for a fully-committed log), matching
    `handlers/list_offsets.cc:100-132`.
    """
    return (
        log.groupBy("partition")
        .agg(
            F.min("offset").alias("earliest_offset"),
            (F.max("offset") + F.lit(1)).alias("latest_offset"),
        )
        .orderBy("partition")
    )


def max_timestamp_offsets(log: DataFrame) -> DataFrame:
    """ListOffsets special -3 (MAX_TIMESTAMP, KIP-734): per partition, the
    offset of the record carrying the largest timestamp (ties -> highest
    offset, matching the broker's scan order) plus that timestamp. One
    partial-aggregated max over (timestamp, offset) struct ordering — no
    sort, no window."""
    best = F.max(F.struct(F.col("timestamp"), F.col("offset"))).alias("b")
    return (
        log.groupBy("partition")
        .agg(best)
        .select(
            "partition",
            F.col("b.offset").alias("offset"),
            F.col("b.timestamp").alias("max_timestamp"),
        )
        .orderBy("partition")
    )


def timequery(log: DataFrame, ts) -> DataFrame:
    """timestamp→offset: first offset with timestamp >= ts, per partition.

    Reference scans from a sparse-index hint (`disk_log_impl.cc:2440-2560`);
    here the `timestamp >= ts` filter prunes row groups via min/max stats,
    then one partial-aggregated min per partition. Partitions with no
    matching record return no row (reference returns -1; callers left-join
    against list_offsets if they need explicit misses).
    """
    return (
        log.where(F.col("timestamp") >= F.lit(ts))
        .groupBy("partition")
        .agg(F.min("offset").alias("offset"))
        .orderBy("partition")
    )


def retain_by_time(log: DataFrame, cutoff) -> DataFrame:
    """Time retention GC: surviving records (timestamp >= cutoff).

    Reference drops whole segments older than retention
    (`disk_log_impl.cc:260-366`); on a parquet/Delta table the same filter
    prunes whole files via stats, and the physical delete is a metadata-only
    file drop for fully-expired files.
    """
    return log.where(F.col("timestamp") >= F.lit(cutoff))


def retain_by_size(log: DataFrame, max_bytes_per_partition: int, row_size_col: str) -> DataFrame:
    """Size retention: keep newest records per partition within a byte budget.

    Reference ranks segments oldest-first and drops past retention.bytes
    (`disk_log_impl.cc:367-417`). Spark plan: running byte total from the
    tail via a descending-offset window sum, keep rows under budget. One
    shuffle on partition (reused from the log's native distribution).
    """
    w = (
        Window.partitionBy("partition")
        .orderBy(F.col("offset").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        log.withColumn("_cum_bytes", F.sum(F.col(row_size_col)).over(w))
        .where(F.col("_cum_bytes") <= F.lit(max_bytes_per_partition))
        .drop("_cum_bytes")
    )


def delete_records(log: DataFrame, start_offsets: dict[int, int]) -> DataFrame:
    """DeleteRecords: advance per-partition log start offset (prefix truncate).

    Visibility is immediate via filter; physical removal happens in the
    retention job. The filter compiles to a literal CASE on the partition
    column — no join, no shuffle, prunes files.
    """
    expr = F.lit(0).cast("long")
    mapping = F.create_map(
        *[F.lit(x) for kv in start_offsets.items() for x in kv]
    )
    start = F.coalesce(mapping[F.col("partition")], expr)
    return log.where(F.col("offset") >= start)


def assign_offsets(batch: DataFrame, base_offsets: dict[int, int] | None = None) -> DataFrame:
    """Append-time offset assignment for a new micro-batch.

    Contiguous per-partition offsets = row_number within partition (ordered
    by an ingest-monotonic column ``ingest_seq``) − 1 + the partition's
    stored high offset. The base-offset table is tiny (one row per
    partition) and lives in the topic catalog; assignment is transactional
    with the append when the sink is Delta (one commit = offsets + data),
    mirroring the reference where raft append assigns offsets atomically
    (`storage/disk_log_appender.cc`).
    """
    w = Window.partitionBy("partition").orderBy("ingest_seq")
    base = base_offsets or {}
    if base:
        # one inline SQL map literal = one py4j round trip; building the
        # same map from F.lit() columns costs 2 gateway calls per partition,
        # which dominates small-batch produce latency at 100+ partitions.
        # try_element_at: under ANSI mode (Spark 4 default) element_at
        # throws MAP_KEY_DOES_NOT_EXIST for a partition missing from a
        # partial legacy watermark map; try_element_at returns NULL so the
        # coalesce-to-0 fallback is actually reachable.
        pairs = ",".join(f"{int(p)},{int(o)}" for p, o in base.items())
        base_expr = F.expr(f"coalesce(try_element_at(map({pairs}), partition), 0)")
    else:
        base_expr = F.lit(0)
    return batch.withColumn(
        "offset", (F.row_number().over(w) - F.lit(1) + base_expr).cast("long")
    )


def high_watermark(log: DataFrame) -> DataFrame:
    """HWM per partition = last offset + 1 (single-writer, fully replicated)."""
    return log.groupBy("partition").agg((F.max("offset") + F.lit(1)).alias("high_watermark"))


def fetch_max_bytes(
    log: DataFrame,
    max_bytes: int,
    partition: int | None = None,
    start_offset: int = 0,
) -> DataFrame:
    """Fetch with the Kafka byte budget (max.partition.fetch.bytes /
    fetch.max.bytes, `handlers/fetch.cc` op_context byte accounting): per
    partition, records from ``start_offset`` in offset order until the
    cumulative record size (16-byte overhead + key + value, the same
    convention the engine's size retention uses) exceeds the budget — and
    like the broker, the FIRST record always returns even when it alone
    is over budget, so a consumer can never stall on a large record.

    One running-sum window per partition (the offset order is the log's
    native sort, so the window reuses the existing distribution); the
    predicate keeps whole records, never truncating one mid-byte."""
    out = log
    if partition is not None:
        out = out.where(F.col("partition") == F.lit(partition))
    out = out.where(F.col("offset") >= F.lit(start_offset))
    size = (
        F.lit(16)
        + F.coalesce(F.length("key"), F.lit(0))
        + F.coalesce(F.length("value"), F.lit(0))
    )
    w = (
        Window.partitionBy("partition")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        out.withColumn("_sz", size)
        .withColumn("_cum", F.sum("_sz").over(w))
        .where((F.col("_cum") - F.col("_sz") < F.lit(max_bytes)))
        .drop("_sz", "_cum")
    )
