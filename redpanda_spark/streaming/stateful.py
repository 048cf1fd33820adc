"""Stateful streaming operators: idempotent-producer dedup, windowed stats,
streaming sessionization.

Reference parity:
- Idempotent produce tracks the last sequence number per
  (producer_id, producer_epoch) and drops duplicate / stale-epoch batches
  (`src/v/cluster/rm_stm.h:67-73`, `src/v/cluster/producer_state.h:46-98`).
  That is per-key streaming state → `applyInPandasWithState` keyed by
  producer identity, with GroupStateTimeout for producer expiry
  (producer_state eviction analog).
- Per-partition ingest/throughput stats are the quota/metrics surface
  (`src/v/kafka/server/quota_manager.h:101-112`) → watermarked tumbling
  `window()` aggregation, fully incremental with partial aggregation.
- Sessionization is part of the added analytics layer (SURVEY.md §2.6) →
  built-in `session_window` (Spark keeps per-key session state and merges
  on the watermark — no custom state code needed).

Scale notes: all three shuffle only by their grouping key
(producer identity / partition / user). State lives in the state store —
partitioned with the key, checkpointed, and RocksDB-backed on a real
cluster — never on the driver. The batch (non-streaming) twins of these
operators live in operators/log.py and plans/queries.py and share the
same semantics, which is what the DuckDB oracles check.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Per-producer state: current fenced epoch + highest admitted sequence.
_DEDUP_STATE_SCHEMA = "epoch int, last_seq long"


def _tz_aware(df: DataFrame, ts_col: str) -> DataFrame:
    """withWatermark requires TIMESTAMP; sources inferring TIMESTAMP_NTZ
    (parquet without the UTC flag) are cast here, value-preserving under
    the engine's UTC session timezone."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def idempotent_dedup_stream(
    records: DataFrame,
    seq_col: str = "base_sequence",
    payload_cols: tuple[str, ...] = ("partition", "offset", "key", "value"),
) -> DataFrame:
    """Admit each (producer_id, epoch, seq) at most once, in order, with
    epoch fencing.

    Streaming analog of rm_stm idempotent_replicate: state per
    (producer_id, partition) — sequence numbers are scoped to a producer's
    stream into ONE partition (rm_stm is itself a per-partition state
    machine), so a producer writing to two partitions keeps an independent
    sequence window in each, matching the batch twin's IDEMPOTENT_KEY.
    State value is (current epoch, highest admitted seq). Records from an
    older epoch are fenced; an epoch bump resets the sequence window;
    within an epoch a record is admitted iff seq > last_seq (duplicates
    and regressions dropped). Replay order is the partition's log order
    (offset), which IS a total order within the group now that the group
    is a single partition. State is partitioned with the key in the state
    store — nothing driver-side.
    """
    dtypes = dict(records.dtypes)
    out_fields = ", ".join(
        f"{c} {dtypes[c]}"
        for c in ("producer_id", "producer_epoch", seq_col, *payload_cols)
    )

    out_cols = ["producer_id", "producer_epoch", seq_col, *payload_cols]

    def dedup(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        epoch, last = state.get if state.exists else (-1, -1)
        # Fencing is an *arrival-order* state machine (log order in the
        # reference) — replay rows by offset, not by (epoch, seq). The
        # iterator delivers a group LARGER than one Arrow batch as
        # multiple chunks in shuffle order, so the sort must happen over
        # the CONCATENATED group: sorting each chunk independently would
        # process offset 15000 before offset 5 and wrongly drop the
        # latter as a sequence regression. Group size = one producer's
        # records into one partition per micro-batch — bounded by the
        # batch, safe to materialize.
        whole = pd.concat(list(pdfs), ignore_index=True)
        if "offset" in whole.columns:
            whole = whole.sort_values("offset")
        evals = whole["producer_epoch"].to_numpy()
        svals = whole[seq_col].to_numpy()
        keep = np.zeros(len(whole), dtype=bool)
        for i in range(len(whole)):
            e, s = int(evals[i]), int(svals[i])
            if e < epoch:
                continue  # fenced: stale producer epoch
            if e > epoch:
                epoch, last = e, -1  # epoch bump resets the seq window
            if s > last:
                last = s
                keep[i] = True
        if keep.any():
            yield whole.loc[keep, out_cols]
        state.update((epoch, last))

    return records.groupBy("producer_id", "partition").applyInPandasWithState(
        dedup,
        outputStructType=out_fields,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_partition_stats(
    records: DataFrame,
    ts_col: str = "timestamp",
    window_dur: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window records/bytes per partition with late-data bound.

    Incremental: partial aggregation map-side, final per (partition,
    window); the watermark bounds state so this runs forever at 100 TB/day.
    """
    records = _tz_aware(records, ts_col)
    return (
        records.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_dur).alias("win"), F.col("partition"))
        .agg(
            F.count("*").alias("n_records"),
            F.sum(F.coalesce(F.length("value"), F.lit(0))).alias("n_bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "partition",
            "n_records",
            "n_bytes",
        )
    )


def streaming_sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user sessions with an inactivity gap — built-in session_window.

    The batch twin (plans/queries.py::q_events_sessionize) computes session
    counts with a lag() window; this streaming form emits one row per
    closed session once the watermark passes the session end.
    """
    events = _tz_aware(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_topk_sink(
    events: DataFrame,
    state: dict,
    k: int = 3,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    window_dur: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming windowed leaderboard: watermarked tumbling-window counts
    per (window, type, key) flow through foreachBatch, which folds each
    micro-batch's UPDATED groups into ``state`` and re-ranks only the
    touched (window, type) leaderboards — rank never runs over raw
    events, and the fold is O(updated groups), not O(state).

    Returns the writeStream query (update mode). ``state`` maps
    (win_start, type) -> {key: n}; ``state['topk']`` holds the current
    top-k per leaderboard as [(key, n), ...] sorted by (-n, key)."""
    agg = (
        _tz_aware(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_dur).alias("w"),
            F.col(type_col).alias("etype"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "etype", "key", "n")
    )
    topk = state.setdefault("topk", {})

    def fold(batch_df: DataFrame, _epoch: int) -> None:
        touched = set()
        for r in batch_df.collect():  # bounded: updated groups only
            lb = state.setdefault((r["win_start"], r["etype"]), {})
            lb[r["key"]] = r["n"]
            touched.add((r["win_start"], r["etype"]))
        for t in touched:
            board = sorted(state[t].items(), key=lambda kv: (-kv[1], kv[0]))
            topk[t] = board[:k]

    return (
        agg.writeStream.foreachBatch(fold)
        .outputMode("update")
        .trigger(availableNow=True)
    )
