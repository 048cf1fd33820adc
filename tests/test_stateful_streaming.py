"""Stateful streaming operators: idempotent dedup (rm_stm analog), windowed
partition stats, session windows. Streams run from temp parquet dirs with
Trigger.AvailableNow into memory sinks."""

from __future__ import annotations

import time
import uuid

import pytest
from pyspark.sql import functions as F

from redpanda_spark.streaming.stateful import (
    idempotent_dedup_stream,
    streaming_sessionize,
    windowed_partition_stats,
)

RECORD_SCHEMA = (
    "producer_id long, producer_epoch int, base_sequence long, "
    "partition int, offset long, key binary, value binary"
)


def _run_stream(out, spark, name, mode="append"):
    # Aggregation tests use "complete": with a bounded input the watermark
    # never passes the tail windows, so "append" would withhold them.
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def _mem_name():
    return "m" + uuid.uuid4().hex[:12]


def test_idempotent_dedup_stream(spark, tmp_path):
    rows = [
        # producer 1, epoch 0: seqs 0,1,1(dup),2, then regression 1(dup)
        (1, 0, 0, 0, 0, None, b"a"),
        (1, 0, 1, 0, 1, None, b"b"),
        (1, 0, 1, 0, 2, None, b"b-dup"),
        (1, 0, 2, 0, 3, None, b"c"),
        (1, 0, 1, 0, 4, None, b"b-replay"),
        # producer 1, epoch 1: fencing bump; seq window resets
        (1, 1, 0, 0, 5, None, b"d"),
        # producer 1, epoch 0 again after bump: fenced out entirely
        (1, 0, 9, 0, 6, None, b"stale"),
        # producer 2 independent
        (2, 0, 0, 1, 0, None, b"x"),
    ]
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(rows, RECORD_SCHEMA).coalesce(1).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(RECORD_SCHEMA).parquet(src_dir)
    )
    out = idempotent_dedup_stream(stream)
    name = _mem_name()
    got = _run_stream(out, spark, name)
    vals = sorted(bytes(r["value"]).decode() for r in got.collect())
    assert vals == ["a", "b", "c", "d", "x"]


def test_idempotent_dedup_stream_cross_batch(spark, tmp_path):
    """State persists across micro-batches via the checkpoint."""
    src_dir = tmp_path / "src"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src_dir.mkdir()

    def run_batch(rows):
        df = spark.createDataFrame(rows, RECORD_SCHEMA).coalesce(1)
        df.write.mode("append").parquet(str(src_dir))
        stream = spark.readStream.schema(RECORD_SCHEMA).parquet(str(src_dir))
        out = idempotent_dedup_stream(stream)
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch([(1, 0, 0, 0, 0, None, b"a"), (1, 0, 1, 0, 1, None, b"b")])
    # second batch replays seq 0-1 (dup) and adds 2
    run_batch([(1, 0, 0, 0, 2, None, b"a-dup"), (1, 0, 2, 0, 3, None, b"c")])
    vals = sorted(
        bytes(r["value"]).decode() for r in spark.read.parquet(out_dir).collect()
    )
    assert vals == ["a", "b", "c"]


def test_windowed_partition_stats(spark, tmp_path):
    rows = [
        (0, "2024-01-01 00:00:10", b"aaaa"),
        (0, "2024-01-01 00:00:50", b"bb"),
        (0, "2024-01-01 00:01:10", b"c"),
        (1, "2024-01-01 00:00:30", None),
    ]
    df = spark.createDataFrame(rows, "partition int, ts_s string, value binary").select(
        "partition", F.to_timestamp("ts_s").alias("timestamp"), "value"
    )
    src = str(tmp_path / "win_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = windowed_partition_stats(stream)
    name = _mem_name()
    got = _run_stream(out, spark, name, mode="complete")
    by_key = {
        (r["window_start"].minute, r["partition"]): (r["n_records"], r["n_bytes"])
        for r in got.collect()
    }
    assert by_key[(0, 0)] == (2, 6)
    assert by_key[(1, 0)] == (1, 1)
    assert by_key[(0, 1)] == (1, 0)


def test_streaming_sessionize(spark, tmp_path):
    rows = [
        ("u1", "2024-01-01 00:00:00"),
        ("u1", "2024-01-01 00:10:00"),   # same session (gap 10m < 30m)
        ("u1", "2024-01-01 01:00:00"),   # new session (gap 50m)
        ("u2", "2024-01-01 00:05:00"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    src = str(tmp_path / "sess_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = streaming_sessionize(stream)
    name = _mem_name()
    got = _run_stream(out, spark, name, mode="complete")
    sess = {(r["user_id"], r["session_start"].hour): r["n_events"] for r in got.collect()}
    assert sess[("u1", 0)] == 2
    assert sess[("u1", 1)] == 1
    assert sess[("u2", 0)] == 1


def test_idempotent_dedup_stream_per_partition_sequences(spark, tmp_path):
    """Sequence state is per (producer, partition) — a producer writing the
    same sequence numbers into two partitions keeps both streams (rm_stm is
    a per-partition state machine; matches the batch IDEMPOTENT_KEY)."""
    rows = [
        (1, 0, 0, 0, 0, None, b"p0-a"),
        (1, 0, 1, 0, 1, None, b"p0-b"),
        # same producer, same seqs, DIFFERENT partition: independent window
        (1, 0, 0, 1, 0, None, b"p1-a"),
        (1, 0, 1, 1, 1, None, b"p1-b"),
        # true duplicate within partition 1
        (1, 0, 1, 1, 2, None, b"p1-dup"),
    ]
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(rows, RECORD_SCHEMA).coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(RECORD_SCHEMA).parquet(src_dir)
    got = _run_stream(idempotent_dedup_stream(stream), spark, _mem_name())
    vals = sorted(bytes(r["value"]).decode() for r in got.collect())
    assert vals == ["p0-a", "p0-b", "p1-a", "p1-b"]


def test_streaming_dedup_store_over_topic(spark, tmp_path):
    """End-to-end streaming dedup: documents produced onto a topic flow
    through foreachBatch -> process_increment, maintaining the deduped
    signature store across micro-batches (each batch is checked against
    everything kept before it)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from redpanda_spark.dedup.minhash import near_dup_pairs, process_increment
    from redpanda_spark.engine import TopicConfig, TopicEngine

    eng = TopicEngine(spark, str(tmp_path / "topics"))
    eng.create_topic("docs", TopicConfig(partitions=1))
    store = str(tmp_path / "dedup_store")
    base = "the quick brown fox jumps over the lazy dog again and again"

    def put(doc_id, text):
        eng.produce(
            "docs",
            spark.createDataFrame(
                [Row(partition=0, key=str(doc_id).encode(), value=text.encode())],
                "partition int, key binary, value binary",
            ),
        )

    put(1, base)
    put(2, "an unrelated document about structured streaming state stores")
    put(10, base)  # near-dup of doc 1, lands in a later file/micro-batch

    def fold(batch_df, batch_id):
        docs = batch_df.select(
            F.col("key").cast("string").cast("long").alias("doc_id"),
            F.col("value").cast("string").alias("text"),
        )
        if docs.take(1):
            process_increment(spark, store, docs, threshold=0.7)

    q = (
        eng.log_stream("docs", max_files_per_trigger=1)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    stored = spark.read.parquet(store)
    assert sorted(r["doc_id"] for r in stored.collect()) == [1, 2]
    assert near_dup_pairs(stored.select("doc_id", "text"), threshold=0.7).count() == 0


def test_streaming_windowed_approx_distinct(spark, tmp_path):
    """HLL sketches in Structured Streaming: windowed
    approx_count_distinct over a watermarked stream matches the exact
    per-window distinct count on this data — the streaming shape of the
    events_approx_users gate (sketch state merges incrementally across
    micro-batches, the only workable form at 100 TB)."""
    import datetime as dt
    import uuid as _uuid

    src = str(tmp_path / "src")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for m in range(20):
        for u in range(m % 5 + 1):  # window 0: users 0..; varying counts
            rows.append((base + dt.timedelta(minutes=m), u * 7))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    df.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
        .select(F.col("w.start").alias("start"), "approx_users")
    )
    name = "s" + _uuid.uuid4().hex[:10]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["start"]: r["approx_users"]
        for r in spark.sql(f"select * from {name}").collect()
    }
    exact = {
        r["start"]: r["n"]
        for r in df.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.col("w.start").alias("start"), "n")
        .collect()
    }
    assert set(got) == set(exact) and len(exact) == 4
    for k in exact:
        assert got[k] == exact[k], (k, got[k], exact[k])  # exact at 1% rsd here


def test_streaming_windowed_topk_matches_batch(spark, tmp_path):
    """The streaming leaderboard (windowed_topk_sink) over a two-batch
    event stream must converge to the same top-k the batch rank query
    computes over the full data."""
    from redpanda_spark.streaming.stateful import windowed_topk_sink

    src = str(tmp_path / "ev")
    rows = []
    for i in range(60):
        rows.append(
            (
                i,
                "2024-03-01 10:%02d:00" % (i % 50),
                i % 5,  # user 0..4
                "click" if i % 2 == 0 else "view",
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type")
    df.where(F.col("event_id") < 30).write.parquet(src + "/b1")
    df.where(F.col("event_id") >= 30).write.mode("append").parquet(src + "/b1")

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src + "/b1")
    )
    state: dict = {}
    q = windowed_topk_sink(stream, state, k=2).start()
    q.awaitTermination(180)

    batch = (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expect: dict = {}
    for r in batch:
        expect.setdefault((r["w"]["start"], r["event_type"]), []).append(
            (r["user_id"], r["n"])
        )
    for key, vals in expect.items():
        vals.sort(key=lambda kv: (-kv[1], kv[0]))
        assert state["topk"][key] == vals[:2], key


def test_continuous_rollup_stream_matches_batch(spark, tmp_path):
    """rollup_sink maintains the continuous aggregate across micro-batches
    (including a late row re-merging into an already-stored window);
    the final store equals the batch GROUP BY."""
    from redpanda_spark.streaming.rollup import (
        merge_rollup,
        read_rollup,
        rollup_sink,
    )

    src = str(tmp_path / "ev")
    rows = [
        (i, "2024-03-01 10:%02d:00" % (i % 50), "click" if i % 2 == 0 else "view",
         float(i) / 4)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    df.repartition(4).write.parquet(src)

    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")  # several merge rounds
        .parquet(src)
    )
    q = rollup_sink(stream, store, str(tmp_path / "ck"),
                    trigger_available_now=True)
    q.awaitTermination(180)

    # a late event for the same (stored) window merges, not duplicates
    late = spark.createDataFrame(
        [(99, "2024-03-01 10:05:00", "click", 100.0)],
        "event_id long, ts_s string, event_type string, value double",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    merge_rollup(store, late)

    got = {
        (str(r["window_start"]), r["event_type"]):
            (r["n"], float(r["sum_value"]), r["min_value"], r["max_value"])
        for r in read_rollup(spark, store).collect()
    }
    want_df = df.unionByName(late).groupBy(
        F.window("ts", "1 hour")["start"].alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    want = {
        (str(r["w"]), r["event_type"]): (r["n"], float(r["s"]), r["mn"], r["mx"])
        for r in want_df.collect()
    }
    assert got == want and len(got) == 2


def test_rollup_crash_leftovers_invisible_to_readers(spark, tmp_path):
    """A crash between the scratch write and the atomic swap must leave
    NOTHING a reader can see: scratch dirs are _-prefixed (skipped by
    Spark's file index) and GC'd by the next merge."""
    import os

    from redpanda_spark.streaming.rollup import merge_rollup, read_rollup

    store = str(tmp_path / "store")
    os.makedirs(store)
    df = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00", "click", 2.0)],
        "event_id long, ts_s string, event_type string, value double",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    merge_rollup(store, df)
    # simulate a crashed merge: scratch dir with plausible parquet content
    crash = os.path.join(store, "_merge_tmp_2024-03-01")
    spark.createDataFrame(
        [("2024-03-01 10:00:00", "click", 999, 999.0, 0.0, 999.0)],
        "window_start string, event_type string, n long,"
        " sum_value string, min_value double, max_value double",
    ).write.parquet(crash)
    rows = read_rollup(spark, store).collect()
    assert len(rows) == 1 and rows[0]["n"] == 1  # leftovers invisible
    # next merge GCs the leftover and stays correct
    merge_rollup(store, df)
    assert not os.path.isdir(crash)
    [r] = read_rollup(spark, store).collect()
    assert r["n"] == 2


def test_rollup_crash_between_swaps_recovers_committed_day(spark, tmp_path):
    """A crash BETWEEN the two os.replace calls leaves the day's only
    committed copy in _merge_old_<day> (day_dir missing, merged copy in
    _merge_tmp_<day>). The next merge must restore the committed copy
    before GC — rolling back, never promoting tmp (the interrupted batch
    replays via the checkpoint, so a promoted tmp would double-apply)."""
    import os

    from redpanda_spark.streaming.rollup import merge_rollup, read_rollup

    store = str(tmp_path / "store")
    os.makedirs(store)
    df = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00", "click", 2.0)],
        "event_id long, ts_s string, event_type string, value double",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    merge_rollup(store, df)
    day_dir = os.path.join(store, "window_date=2024-03-01")
    old = os.path.join(store, "_merge_old_2024-03-01")
    tmp = os.path.join(store, "_merge_tmp_2024-03-01")
    # simulate the mid-swap crash: committed day shunted to old, merged
    # (would-double-apply) copy sitting in tmp, day_dir gone
    os.replace(day_dir, old)
    spark.createDataFrame(
        [("2024-03-01 10:00:00", "click", 2, "4.0000", 2.0, 2.0)],
        "window_start string, event_type string, n long,"
        " sum_value string, min_value double, max_value double",
    ).write.parquet(tmp)
    assert not os.path.isdir(day_dir)
    # the replayed batch re-merges; prior aggregates must NOT be lost
    merge_rollup(store, df)
    [r] = read_rollup(spark, store).collect()
    assert r["n"] == 2 and float(r["sum_value"]) == 4.0
    assert not os.path.isdir(old) and not os.path.isdir(tmp)


def test_rollup_gate_cache_invalidated_on_fixture_rewrite(spark, tmp_path):
    """q_events_rollup's store cache must key on the INPUT parquet's
    fingerprint, not just the sf_dir path: regenerating fixtures in place
    must not replay a stale rollup."""
    import time

    from redpanda_spark.plans.queries import QUERIES

    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()

    def write_events(n):
        spark.createDataFrame(
            [(i, "2024-03-01 10:00:00", i, "click", 1.0, "{}") for i in range(n)],
            "event_id long, ts_s string, user_id long, event_type string,"
            " value double, props string",
        ).select(
            "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id",
            "event_type", "value", "props",
        ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    write_events(4)
    [r] = QUERIES["events_rollup"](spark, sf).collect()
    assert r["n"] == 4
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    write_events(7)  # regenerate in place
    [r] = QUERIES["events_rollup"](spark, sf).collect()
    assert r["n"] == 7  # stale path-keyed cache would still say 4


def test_idempotent_dedup_group_spanning_arrow_chunks(spark, tmp_path):
    """r9 regression: a (producer, partition) group larger than one Arrow
    batch reaches the state fn as MULTIPLE chunks in shuffle order; the
    offset sort must span the concatenated group, or a low-offset record
    in a later chunk is wrongly dropped as a sequence regression."""
    rows = [
        # written in REVERSED offset order so chunking yields the
        # high-offset records first
        (1, 0, s, 0, s, None, f"v{s}".encode())
        for s in range(9, -1, -1)
    ]
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(rows, RECORD_SCHEMA).coalesce(1).write.parquet(src_dir)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = spark.readStream.schema(RECORD_SCHEMA).parquet(src_dir)
        out = idempotent_dedup_stream(stream)
        got = _run_stream(out, spark, _mem_name())
        vals = sorted(bytes(r["value"]).decode() for r in got.collect())
        assert vals == sorted(f"v{s}" for s in range(10))  # ALL admitted
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_rollup_replay_same_batch_id_is_idempotent(spark, tmp_path):
    """r9 regression: foreachBatch replay after a committed day swap must
    not double-apply — the day's _applied_batch stamp (atomic with the
    data) makes re-merging batch N a no-op, while batch N+1 still folds."""
    import os

    from redpanda_spark.streaming.rollup import merge_rollup, read_rollup

    store = str(tmp_path / "store")
    os.makedirs(store)
    df = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00", "click", 2.0)],
        "event_id long, ts_s string, event_type string, value double",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    merge_rollup(store, df, batch_id=7)
    [r] = read_rollup(spark, store).collect()
    assert r["n"] == 1
    # checkpoint-replay of the SAME batch: no double count
    merge_rollup(store, df, batch_id=7)
    [r] = read_rollup(spark, store).collect()
    assert r["n"] == 1
    # the next batch folds normally
    merge_rollup(store, df, batch_id=8)
    [r] = read_rollup(spark, store).collect()
    assert r["n"] == 2
    # unguarded manual calls keep the old always-fold behavior
    merge_rollup(store, df)
    [r] = read_rollup(spark, store).collect()
    assert r["n"] == 3


def test_drain_restores_shuffle_conf_on_failure(spark):
    """_drain pins spark.sql.shuffle.partitions for the streaming run and
    must restore the batch conf even when the query dies (a leaked pin
    would silently shrink every later batch shuffle in the session)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from redpanda_spark.plans.queries import _drain

    import tempfile as _tf

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # a streaming frame that fails in the first micro-batch: the source
    # has a real row (a rate source under availableNow drains zero rows
    # and never evaluates anything), so assert_true fires mid-run
    d = _tf.mkdtemp(prefix="drain_fail_")
    spark.createDataFrame([(1,)], "value long").write.mode("overwrite").parquet(d)
    src = spark.readStream.schema("value long").parquet(d)
    bad = src.select(F.assert_true(F.col("value") < 0).alias("boom"))
    with _pytest.raises(Exception):
        _drain(spark, bad, mode="append", state_partitions=3)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_drain_sizes_state_partitions(spark, sf_dir):
    """The sized drain produces the same rows as an unsized one and
    leaves the session conf untouched (stream_stream_join gate shape)."""
    from redpanda_spark.plans.queries import QUERIES, _state_partitions

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    parts = _state_partitions(sf_dir)
    assert 4 <= parts <= 1024
    n = QUERIES["stream_window_stats"](spark, sf_dir).count()
    assert n > 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
