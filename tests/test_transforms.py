"""Data-transform tests mirroring the reference's e2e transform cases
(`tests/rptest/tests/data_transforms_test.py:244-629`): identity, filter,
transcode, multi-output routing, chaining, and streaming execution."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from redpanda_spark.engine import TopicConfig, TopicEngine
from redpanda_spark.streaming.transforms import (
    TransformProcessor,
    fanout_by_key_transform,
    filter_transform,
    identity_transform,
    uppercase_value_transform,
)


@pytest.fixture()
def engine(spark, tmp_path):
    return TopicEngine(spark, str(tmp_path / "topics"))


def produce_strs(engine, spark, topic, kvs):
    rows = [
        Row(key=(k.encode() if k else None), value=(v.encode() if v else None))
        for k, v in kvs
    ]
    engine.produce(topic, spark.createDataFrame(rows, "key binary, value binary"))


def values(engine, topic):
    return sorted(
        bytes(r["value"]).decode()
        for r in engine.log(topic).collect()
        if r["value"] is not None
    )


def test_identity_transform(engine, spark):
    engine.create_topic("in", TopicConfig(partitions=2))
    engine.create_topic("out", TopicConfig(partitions=2))
    produce_strs(engine, spark, "in", [("a", "1"), ("b", "2"), ("c", "3")])
    tp = TransformProcessor(engine, "in", identity_transform("out"), ["out"])
    bases = tp.run_once_batch()
    assert "out" in bases
    assert values(engine, "out") == ["1", "2", "3"]


def test_filter_and_transcode(engine, spark):
    engine.create_topic("in", TopicConfig(partitions=1))
    engine.create_topic("big", TopicConfig(partitions=1))
    produce_strs(engine, spark, "in", [("a", "keep"), ("b", "drop-me"), ("c", "keepers")])
    tp = TransformProcessor(
        engine,
        "in",
        filter_transform("big", lambda r: r["value"] is not None and r["value"].startswith(b"keep")),
        ["big"],
    )
    tp.run_once_batch()
    assert values(engine, "big") == ["keep", "keepers"]

    engine.create_topic("upper", TopicConfig(partitions=1))
    TransformProcessor(
        engine, "big", uppercase_value_transform("upper"), ["upper"]
    ).run_once_batch()
    assert values(engine, "upper") == ["KEEP", "KEEPERS"]


def test_multi_output_routing(engine, spark):
    engine.create_topic("in", TopicConfig(partitions=1))
    engine.create_topic("evens", TopicConfig(partitions=1))
    engine.create_topic("odds", TopicConfig(partitions=1))
    produce_strs(engine, spark, "in", [(str(i), str(i)) for i in range(6)])
    tp = TransformProcessor(
        engine,
        "in",
        fanout_by_key_transform(
            lambda r: "evens" if int(r["value"]) % 2 == 0 else "odds"
        ),
        ["evens", "odds"],
    )
    tp.run_once_batch()
    assert values(engine, "evens") == ["0", "2", "4"]
    assert values(engine, "odds") == ["1", "3", "5"]


def test_streaming_transform_available_now(engine, spark, tmp_path):
    engine.create_topic("sin", TopicConfig(partitions=1))
    engine.create_topic("sout", TopicConfig(partitions=1))
    produce_strs(engine, spark, "sin", [("k1", "a"), ("k2", "b")])
    tp = TransformProcessor(
        engine,
        "sin",
        identity_transform("sout"),
        ["sout"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = tp.start_stream(trigger_available_now=True)
    q.awaitTermination(120)
    assert values(engine, "sout") == ["a", "b"]

    # produce more, run the stream again from the checkpoint: only the new
    # records are processed (at-least-once with offset tracking)
    produce_strs(engine, spark, "sin", [("k3", "c")])
    q2 = tp.start_stream(trigger_available_now=True)
    q2.awaitTermination(120)
    assert values(engine, "sout") == ["a", "b", "c"]


def test_streaming_transform_crash_resume_no_dup_no_loss(engine, spark, tmp_path):
    """Kill the stream mid-run (between micro-batches) and redeploy from the
    checkpoint: committed batches are not reprocessed, uncommitted ones are,
    and the output ends exactly-once. Mirrors the reference's redeploy-from-
    committed-offset behavior (tests/rptest/tests/data_transforms_test.py:
    409-487, commit_batcher parity)."""
    import os

    engine.create_topic("cin", TopicConfig(partitions=1))
    engine.create_topic("cout", TopicConfig(partitions=1))
    # two produce calls -> two parquet files; maxFilesPerTrigger=1 makes them
    # two separate micro-batches
    produce_strs(engine, spark, "cin", [("k1", "a"), ("k2", "b")])
    produce_strs(engine, spark, "cin", [("k3", "c"), ("k4", "d")])

    sentinel = str(tmp_path / "crash_on_c")
    with open(sentinel, "w") as f:
        f.write("1")

    def crashy(rec: dict):
        v = rec.get("value")
        if v == b"c" and os.path.exists(sentinel):
            raise RuntimeError("injected crash before second batch commits")
        yield "cout", rec

    def make_tp():
        return TransformProcessor(
            engine, "cin", crashy, ["cout"],
            checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1,
        )

    q = make_tp().start_stream(trigger_available_now=True)
    try:
        q.awaitTermination(120)
    except Exception:
        pass  # the injected crash fails the query after batch 0 commits
    assert values(engine, "cout") == ["a", "b"]  # batch 0 landed, batch 1 didn't

    os.remove(sentinel)  # "fix" the transform, redeploy from checkpoint
    q2 = make_tp().start_stream(trigger_available_now=True)
    q2.awaitTermination(120)
    assert values(engine, "cout") == ["a", "b", "c", "d"]  # no dup, no loss


def test_dlq_routes_poison_records(engine, spark):
    """A transform that raises on one record: with a DLQ configured, good
    records flow, the poison record lands on the DLQ with the exception
    text as a dlq.error header, and the job completes."""
    engine.create_topic("pin", TopicConfig(partitions=1))
    engine.create_topic("pout", TopicConfig(partitions=1))
    engine.create_topic("pdlq", TopicConfig(partitions=1))
    produce_strs(engine, spark, "pin", [("k1", "a"), ("k2", "BOOM"), ("k3", "c")])

    def fussy(rec):
        if rec.get("value") == b"BOOM":
            raise ValueError("cannot transcode")
        yield "pout", rec

    tp = TransformProcessor(engine, "pin", fussy, ["pout"], dlq_topic="pdlq")
    tp.run_once_batch()
    assert values(engine, "pout") == ["a", "c"]
    dlq = engine.log("pdlq").collect()
    assert len(dlq) == 1
    assert bytes(dlq[0]["value"]) == b"BOOM"
    hdrs = {h["key"]: bytes(h["value"]).decode() for h in dlq[0]["headers"]}
    assert "cannot transcode" in hdrs["dlq.error"]


def test_no_dlq_poison_fails_job(engine, spark):
    engine.create_topic("qin", TopicConfig(partitions=1))
    engine.create_topic("qout", TopicConfig(partitions=1))
    produce_strs(engine, spark, "qin", [("k1", "BOOM")])

    def fussy(rec):
        raise ValueError("nope")
        yield  # pragma: no cover

    tp = TransformProcessor(engine, "qin", fussy, ["qout"])
    with pytest.raises(Exception, match="nope"):
        tp.run_once_batch()


def test_dlq_streaming_poison_does_not_stall(engine, spark, tmp_path):
    engine.create_topic("sin2", TopicConfig(partitions=1))
    engine.create_topic("sout2", TopicConfig(partitions=1))
    engine.create_topic("sdlq2", TopicConfig(partitions=1))
    produce_strs(engine, spark, "sin2", [("k1", "x"), ("k2", "BOOM")])

    def fussy(rec):
        if rec.get("value") == b"BOOM":
            raise RuntimeError("poison")
        yield "sout2", rec

    tp = TransformProcessor(
        engine, "sin2", fussy, ["sout2"],
        checkpoint_dir=str(tmp_path / "ckpt2"), dlq_topic="sdlq2",
    )
    q = tp.start_stream(trigger_available_now=True)
    q.awaitTermination(120)
    assert values(engine, "sout2") == ["x"]
    assert values(engine, "sdlq2") == ["BOOM"]


def test_undeclared_output_topic_fails_loudly(engine, spark):
    """r9 regression: records the fn routes to a topic missing from
    output_topics (and not the DLQ) must FAIL the transform — the
    reference SDK rejects writes to undeclared topics; silently dropping
    them loses data."""
    engine.create_topic("in", TopicConfig(partitions=1))
    engine.create_topic("out", TopicConfig(partitions=1))
    engine.create_topic("elsewhere", TopicConfig(partitions=1))
    produce_strs(engine, spark, "in", [("a", "1"), ("b", "2")])

    def fn(rec):
        # routes half its records somewhere undeclared
        t = "out" if rec["value"] == b"1" else "elsewhere"
        yield t, rec

    tp = TransformProcessor(engine, "in", fn, ["out"])
    with pytest.raises(ValueError, match="undeclared topic 'elsewhere'"):
        tp.run_once_batch()
