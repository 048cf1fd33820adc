"""Stream/dim enrichment (KTable-style lookup join) — keep-latest dim
snapshots from compacted topics, broadcast joins, per-micro-batch dim
refresh (streaming/enrich.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from redpanda_spark.engine import TopicConfig, TopicEngine
from redpanda_spark.streaming.enrich import dim_from_topic, enrich, enrich_stream


@pytest.fixture()
def engine(spark, tmp_path):
    return TopicEngine(spark, str(tmp_path / "topics"))


def _produce_kv(engine, spark, topic, kvs):
    rows = [
        Row(key=k.encode(), value=(v.encode() if v is not None else None))
        for k, v in kvs
    ]
    engine.produce(topic, spark.createDataFrame(rows, "key binary, value binary"))


def _decode(df):
    return df.select(
        F.col("key").cast("string").alias("user"),
        F.col("value").cast("string").alias("segment"),
    )


def test_dim_from_topic_keeps_latest_and_drops_tombstones(engine, spark):
    engine.create_topic("dim", TopicConfig(partitions=2, cleanup_policy="compact"))
    _produce_kv(engine, spark, "dim", [("u1", "gold"), ("u2", "silver")])
    _produce_kv(engine, spark, "dim", [("u1", "platinum"), ("u3", "bronze")])
    _produce_kv(engine, spark, "dim", [("u2", None)])  # tombstone deletes u2
    dim = dim_from_topic(engine, "dim", decode=_decode)
    got = {r["user"]: r["segment"] for r in dim.collect()}
    assert got == {"u1": "platinum", "u3": "bronze"}


def test_enrich_broadcasts_dim(engine, spark):
    engine.create_topic("dim", TopicConfig(partitions=1))
    _produce_kv(engine, spark, "dim", [("u1", "gold"), ("u2", "silver")])
    dim = dim_from_topic(engine, "dim", decode=_decode)
    facts = spark.createDataFrame(
        [("u1", 10), ("u2", 20), ("u9", 30)], "user string, amount int"
    )
    out = enrich(facts, dim, "user")
    got = {r["user"]: r["segment"] for r in out.collect()}
    assert got == {"u1": "gold", "u2": "silver", "u9": None}
    # the dim side must be broadcast — no shuffle of the fact side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_enrich_stream_sees_dim_updates_between_runs(engine, spark, tmp_path):
    """The dim snapshot is rebuilt per micro-batch: facts processed after
    a dim update join against the NEW dim rows (processing-time KTable
    semantics), while the checkpoint keeps fact offsets exactly-once."""
    engine.create_topic("facts", TopicConfig(partitions=1))
    engine.create_topic("dim", TopicConfig(partitions=1))
    _produce_kv(engine, spark, "dim", [("u1", "gold")])
    _produce_kv(engine, spark, "facts", [("u1", "e1")])

    out_dir = str(tmp_path / "enriched")
    builds = []

    def dim_builder():
        d = dim_from_topic(engine, "dim", decode=_decode)
        builds.append(1)
        return d

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    def run():
        stream = engine.log_stream("facts").select(
            F.col("key").cast("string").alias("user"),
            F.col("value").cast("string").alias("event"),
        )
        q = enrich_stream(
            stream,
            dim_builder,
            "user",
            sink,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    run()
    got = {(r["user"], r["event"]): r["segment"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {("u1", "e1"): "gold"}

    # dim update + new fact; resume from checkpoint -> only the new fact
    # processes, against the UPDATED dim
    _produce_kv(engine, spark, "dim", [("u1", "platinum")])
    _produce_kv(engine, spark, "facts", [("u1", "e2")])
    run()
    got = {(r["user"], r["event"]): r["segment"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {("u1", "e1"): "gold", ("u1", "e2"): "platinum"}
    assert len(builds) >= 2


def test_stream_stream_join_within_skew(engine, spark, tmp_path):
    """Two topic streams joined on key with a bounded time skew: in-skew
    pairs emit, out-of-skew records don't, and the plan is a streaming
    symmetric hash join with watermarks (bounded state)."""
    import datetime

    from redpanda_spark.streaming.joins import stream_stream_join

    engine.create_topic("clicks", TopicConfig(partitions=1))
    engine.create_topic("views", TopicConfig(partitions=1))
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def rows(kvs):
        return spark.createDataFrame(
            [
                Row(
                    key=k.encode(),
                    value=v.encode(),
                    timestamp=base + datetime.timedelta(seconds=dt),
                )
                for k, v, dt in kvs
            ],
            "key binary, value binary, timestamp timestamp",
        )

    engine.produce("clicks", rows([("u1", "c1", 0), ("u2", "c2", 0)]))
    # v1 within 5s of c1; v9 outside the skew; u3 unmatched key
    engine.produce("views", rows([("u1", "v1", 3), ("u1", "v9", 30), ("u3", "vx", 0)]))

    def topic_stream(name):
        return engine.log_stream(name).select(
            F.col("key").cast("string").alias("user"),
            F.col("value").cast("string").alias(f"ev_{name}"),
            F.col("timestamp"),
        )

    joined = stream_stream_join(
        topic_stream("clicks"),
        topic_stream("views"),
        on="user",
        watermark="10 seconds",
        max_skew="5 seconds",
    )
    out_dir = str(tmp_path / "joined")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "jckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user"], r["ev_clicks"], r["ev_views_r"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {("u1", "c1", "v1")}


def test_dim_cross_partition_key_resolves_deterministically(engine, spark):
    """r9 regression: offsets only order WITHIN a partition. A key that
    lives in two partitions (routing change) must resolve by
    (timestamp, partition, offset) — the later-timestamped write wins
    even when the other partition holds a higher offset."""
    import datetime as dt

    engine.create_topic("dim", TopicConfig(partitions=2))
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        # partition 0: u1 written repeatedly -> high offsets, OLD times
        *[
            Row(partition=0, key=b"u1", value=f"old{i}".encode(),
                timestamp=base + dt.timedelta(seconds=i))
            for i in range(5)
        ],
        # partition 1: single NEWER write of u1 at offset 0
        Row(partition=1, key=b"u1", value=b"new",
            timestamp=base + dt.timedelta(hours=1)),
    ]
    engine.produce(
        "dim",
        spark.createDataFrame(
            rows, "partition int, key binary, value binary, timestamp timestamp"
        ),
    )
    dim = dim_from_topic(engine, "dim", decode=_decode)
    got = {r["user"]: r["segment"] for r in dim.collect()}
    assert got == {"u1": "new"}  # p1's later timestamp beats p0's offset 4


def test_stream_stream_left_outer_emits_unmatched_after_watermark(
    engine, spark, tmp_path
):
    """Outer-join semantics surfaced unchanged from Spark: a left row with
    no in-skew partner emits null-padded ONCE its window is closed by the
    other side's watermark advancing (a later-timestamped right row
    drives the watermark past the window in the same availableNow run)."""
    import datetime

    from redpanda_spark.streaming.joins import stream_stream_join

    engine.create_topic("lc", TopicConfig(partitions=1))
    engine.create_topic("rv", TopicConfig(partitions=1))
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def rows(kvs):
        return spark.createDataFrame(
            [
                Row(
                    key=k.encode(),
                    value=v.encode(),
                    timestamp=base + datetime.timedelta(seconds=dt),
                )
                for k, v, dt in kvs
            ],
            "key binary, value binary, timestamp timestamp",
        )

    # u1 matches in-skew; u2 never matches; the late u9 right row exists
    # only to push the right watermark far past u2's join window
    engine.produce("lc", rows([("u1", "c1", 0), ("u2", "c2", 0)]))
    engine.produce("rv", rows([("u1", "v1", 2), ("u9", "v9", 600)]))

    def topic_stream(name):
        return engine.log_stream(name).select(
            F.col("key").cast("string").alias("user"),
            F.col("value").cast("string").alias(f"ev_{name}"),
            F.col("timestamp"),
        )

    out_dir = str(tmp_path / "oj")

    def run():
        joined = stream_stream_join(
            topic_stream("lc"),
            topic_stream("rv"),
            on="user",
            watermark="5 seconds",
            max_skew="5 seconds",
            how="left_outer",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ojckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = {
        (r["user"], r["ev_lc"], r["ev_rv_r"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert ("u1", "c1", "v1") in got  # in-skew pair emits immediately

    # Spark advances the watermark BETWEEN micro-batches, and the GLOBAL
    # watermark is the MIN across both inputs (multipleWatermarkPolicy
    # default) — so BOTH sides need late rows: batch 2's starting
    # watermark (both sides' batch-1 max event time - 5s, min'd) must
    # pass u2's join window, and batch 2 itself needs data to run.
    engine.produce("lc", rows([("u7", "c7", 600)]))
    engine.produce("rv", rows([("u8", "v8", 610)]))
    run()
    engine.produce("lc", rows([("u7b", "c7b", 620)]))
    engine.produce("rv", rows([("u8b", "v8b", 630)]))
    run()
    got = {
        (r["user"], r["ev_lc"], r["ev_rv_r"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert ("u2", "c2", None) in got  # unmatched left emitted null-padded
    assert not any(u == "u9" for u, _, _ in got)  # right-only never on left side
    # every emitted row is either an in-skew pair or a closed-window
    # null-pad — no in-window left row leaks early
    assert all(v is not None or u in ("u2", "u7") for u, _, v in got)
