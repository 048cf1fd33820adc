"""Randomized produce/consume verification — kgo-verifier analog
(`tests/rptest/services/kgo_verifier_services.py` discipline: payloads
embed identity + checksum; every invariant checked from the consumed
log itself)."""

from __future__ import annotations

import struct
import zlib

import pytest

from redpanda_spark.engine import TopicConfig, TopicEngine
from redpanda_spark.verifier import (
    encode_value,
    run_workload,
    verify_compaction,
    verify_log_invariants,
)


def test_payload_roundtrip():
    v = encode_value(b"k1", 7)
    assert struct.unpack(">q", v[:8])[0] == 7
    assert struct.unpack(">I", v[8:12])[0] == zlib.crc32(b"k1" + v[:8])


def test_clean_produce_passes_all_invariants(spark, tmp_path):
    engine = TopicEngine(spark, str(tmp_path))
    engine.create_topic("t", TopicConfig(partitions=4))
    rows = []
    for i in range(300):
        key = f"k{i % 40}".encode()
        rows.append((key, encode_value(key, i)))
    engine.produce(topic="t", batch=spark.createDataFrame(rows, "key binary, value binary"))
    rep = verify_log_invariants(engine, "t", expected_rows=300)
    assert rep["ok"], rep
    assert rep["rows"] == 300 and rep["missing"] == 0


def test_verifier_detects_injected_corruption(spark, tmp_path):
    """Mutation test: three records carry a payload whose embedded crc
    doesn't match (a buggy-producer simulation — on-disk bit flips are
    already caught below the verifier by parquet page checksums); the crc
    sweep must count exactly the damaged rows."""
    engine = TopicEngine(spark, str(tmp_path))
    engine.create_topic("t", TopicConfig(partitions=2))
    rows = []
    for i in range(50):
        key = f"k{i}".encode()
        v = encode_value(key, i)
        if i in (3, 17, 40):  # flip a crc byte
            v = v[:8] + bytes([v[8] ^ 0xFF]) + v[9:]
        rows.append((key, v))
    engine.produce(topic="t", batch=spark.createDataFrame(rows, "key binary, value binary"))
    rep = verify_log_invariants(engine, "t")
    assert not rep["ok"]
    assert rep["corrupt"] == 3


def test_compaction_keep_latest_validity(spark, tmp_path):
    engine = TopicEngine(spark, str(tmp_path))
    engine.create_topic("t", TopicConfig(partitions=2, cleanup_policy="compact"))
    rows = []
    for i in range(200):
        key = f"k{i % 25}".encode()  # 8 versions per key
        rows.append((key, encode_value(key, i)))
    engine.produce(topic="t", batch=spark.createDataFrame(rows, "key binary, value binary"))
    before = engine.log("t").persist()
    before.count()
    engine.run_compaction("t")
    rep = verify_compaction(before, engine.log("t"))
    before.unpersist()
    assert rep["ok"], rep
    assert engine.log("t").count() == 25


def test_compaction_check_detects_wrong_survivor(spark, tmp_path):
    """Negative control: feed verify_compaction an 'after' frame keeping
    the OLDEST record per key — it must flag every key."""
    from pyspark.sql import functions as F

    engine = TopicEngine(spark, str(tmp_path))
    engine.create_topic("t", TopicConfig(partitions=1))
    rows = []
    for i in range(60):
        key = f"k{i % 10}".encode()
        rows.append((key, encode_value(key, i)))
    engine.produce(topic="t", batch=spark.createDataFrame(rows, "key binary, value binary"))
    log = engine.log("t")
    oldest = (
        log.groupBy("key")
        .agg(F.min_by(F.struct(*log.columns), "offset").alias("s"))
        .select("s.*")
    )
    rep = verify_compaction(log, oldest)
    assert not rep["ok"]
    assert rep["wrong_survivor"] == 10


@pytest.mark.parametrize("seed", [1, 7])
def test_randomized_workload_all_green(spark, tmp_path, seed):
    reports = run_workload(
        spark, str(tmp_path / f"w{seed}"), seed=seed, n_ops=8, rows_per_batch=200
    )
    bad = [r for r in reports if not r.get("ok")]
    assert not bad, bad
    ops = {r["op"] for r in reports}
    assert "produce" in ops  # workload actually exercised the surface


def test_replicate_topic_incremental_offset_preserving(spark, tmp_path):
    """MirrorMaker analog: replica matches source byte-for-byte including
    offsets (empty destination, untruncated source); a second pass copies
    only the new tail; the verifier passes on the replica."""
    from redpanda_spark.replication import replicate_topic

    src = TopicEngine(spark, str(tmp_path / "src"))
    dst = TopicEngine(spark, str(tmp_path / "dst"))
    src.create_topic("t", TopicConfig(partitions=4))
    rows = []
    for i in range(300):
        key = f"k{i % 40}".encode()
        rows.append((key, encode_value(key, i)))
    src.produce(topic="t", batch=spark.createDataFrame(rows, "key binary, value binary"))

    copied = replicate_topic(src, dst, "t")
    assert sum(copied.values()) == 300
    cols = ["partition", "offset", "key", "value"]
    a = sorted(map(tuple, src.log("t").select(cols).collect()))
    b = sorted(map(tuple, dst.log("t").select(cols).collect()))
    assert a == b
    assert src.high_watermarks("t") == dst.high_watermarks("t")
    assert verify_log_invariants(dst, "t", expected_rows=300)["ok"]

    # incremental: only the new tail copies; no-op pass copies nothing
    rows2 = [(b"k1", encode_value(b"k1", 1000))]
    src.produce(topic="t", batch=spark.createDataFrame(rows2, "key binary, value binary"))
    copied2 = replicate_topic(src, dst, "t")
    assert sum(copied2.values()) == 1
    assert replicate_topic(src, dst, "t") == {}
    assert dst.log("t").count() == 301
    assert verify_log_invariants(dst, "t", expected_rows=301)["ok"]


@pytest.mark.parametrize("seed", [10])  # seed draws produce_idem under the 8-op mix
def test_randomized_workload_with_idempotent_retries(spark, tmp_path, seed):
    reports = run_workload(
        spark, str(tmp_path / f"wi{seed}"), seed=seed, n_ops=10, rows_per_batch=150
    )
    bad = [r for r in reports if not r.get("ok")]
    assert not bad, bad
    idem = [r for r in reports if r["op"] == "produce_idem"]
    assert idem and all(r["rows_added"] == 30 for r in idem)  # retries no-op'd


def test_workload_covers_record_path_and_tail(spark, tmp_path):
    """The randomized workload must exercise the record-list produce op,
    and its hot-tail-vs-durable-log consistency check must pass."""
    from redpanda_spark.verifier import run_workload

    reports = run_workload(
        spark, str(tmp_path / "w"), seed=3, n_ops=10, rows_per_batch=150
    )
    assert all(r["ok"] for r in reports), [r for r in reports if not r["ok"]]
    rec_ops = [r for r in reports if r["op"] == "produce_records"]
    if not rec_ops:  # different seed mix: force one deterministically
        reports = run_workload(
            spark, str(tmp_path / "w2"), seed=7, n_ops=14, rows_per_batch=150
        )
        rec_ops = [r for r in reports if r["op"] == "produce_records"]
        assert all(r["ok"] for r in reports)
    assert rec_ops and all(r["tail_ok"] for r in rec_ops)


def test_workload_tx_interleavings_hold_invariants(spark, tmp_path):
    """Transactional commit/abort ops mixed into the randomized workload:
    log invariants + BOTH tail-isolation twins (read_uncommitted byte
    parity and read_committed LSO/aborted parity) stay green, including
    compaction over a log that contains aborted ranges."""
    from redpanda_spark.verifier import run_workload

    found = []
    for seed in (2, 5, 13):
        reports = run_workload(
            spark, str(tmp_path / f"t{seed}"), seed=seed, n_ops=12,
            rows_per_batch=150,
        )
        assert all(r["ok"] for r in reports), [r for r in reports if not r["ok"]]
        found += [r for r in reports if r["op"].startswith("tx_")]
        if {"tx_commit", "tx_abort"} <= {r["op"] for r in found}:
            break
    assert {"tx_commit", "tx_abort"} <= {r["op"] for r in found}, found
    assert all(r["tail_ok"] for r in found)


def test_tiered_workload_seeds(spark, tmp_path):
    """Chaos loop over a tiered topic: archival/retention interleaved with
    produce/truncate/merge, every step green (tier-move byte equality,
    value thread, contiguity, watermark, hot-tail twins)."""
    from redpanda_spark.verifier import run_workload_tiered

    for seed in (1, 7):
        reports = run_workload_tiered(
            spark, str(tmp_path / f"w{seed}"), seed=seed, n_ops=10
        )
        bad = [r for r in reports if not r["ok"]]
        assert not bad, bad
        assert any(r["op"] == "archive" and r.get("moved", 0) > 0 for r in reports)
