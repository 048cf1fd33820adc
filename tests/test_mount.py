"""Topic unmount/mount — tiered-storage migration between clusters (the
reference's `cloud_storage/topic_mount_handler.h` +
`cluster/data_migration_backend.cc` flow): unmount flushes everything to
the bucket and detaches; mount adopts the bucket topic, writable, on any
cluster sharing the archive root."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from redpanda_spark.engine import FencedWriterError, TopicConfig, TopicEngine

BASE = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _mk_engine(spark, tmp_path, name, cold):
    return TopicEngine(
        spark, str(tmp_path / name), archive_root=str(cold)
    )


def _produce(eng, topic, vals, partition=0):
    eng.produce(
        topic,
        [
            {"value": v.encode(), "timestamp": BASE, "partition": partition}
            for v in vals
        ],
    )


def _cfg(**kw):
    kw.setdefault("partitions", 2)
    kw.setdefault("remote_write", True)
    kw.setdefault("local_retention_ms", 60_000)
    return TopicConfig(**kw)


def _rowset(df):
    return {
        (r["partition"], r["offset"], bytes(r["value"])) for r in df.collect()
    }


def test_unmount_then_mount_same_cluster(spark, tmp_path):
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg())
    _produce(a, "t", ["v1", "v2"], partition=0)
    _produce(a, "t", ["v3"], partition=1)
    before = _rowset(a.log("t"))
    hwm = a.high_watermarks("t")

    res = a.unmount_topic("t")
    assert res["segments"] >= 1
    assert "t" not in a.list_topics()
    # the bucket is self-describing: data + topic manifest
    man = json.loads(
        open(os.path.join(res["archive_dir"], "_topic_manifest.json")).read()
    )
    assert man["config"]["partitions"] == 2

    res2 = a.mount_topic("t")
    assert res2["high_watermarks"] == {int(k): v for k, v in hwm.items()}
    assert _rowset(a.log("t")) == before
    # manifest consumed: topic exists in exactly one place
    assert not os.path.exists(
        os.path.join(res["archive_dir"], "_topic_manifest.json")
    )


def test_migration_to_second_cluster_continues_offsets(spark, tmp_path):
    """The real migration: cluster A unmounts, cluster B (different root,
    same bucket) mounts — rows identical, offsets continue contiguously,
    the mounted topic is fully writable and tiered."""
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    # partition 1 stays EMPTY: only the bucket manifest can preserve its
    # existence (footer inference cannot see a partition with no rows)
    a.create_topic("t", _cfg(partitions=3))
    _produce(a, "t", ["v1", "v2"], partition=0)
    _produce(a, "t", ["v3"], partition=2)
    before = _rowset(a.log("t"))
    a.unmount_topic("t")

    b = _mk_engine(spark, tmp_path, "b", cold)
    res = b.mount_topic("t")
    assert res["segments"] >= 1
    cfg = b.list_topics()["t"]
    assert cfg.partitions == 3  # empty partition slot preserved
    assert _rowset(b.log("t")) == before
    # offsets continue where A left off
    _produce(b, "t", ["v4"], partition=0)
    offs = sorted(
        r["offset"]
        for r in b.log("t").where("partition = 0").collect()
    )
    assert offs == [0, 1, 2]
    # and the mounted topic is a normal tiered topic: archival works
    b.run_archival(
        "t", now_ms=int((BASE + dt.timedelta(hours=2)).timestamp() * 1000)
    )
    assert _rowset(b.log("t")) == before | {(0, 2, b"v4")}


def test_unmount_guards(spark, tmp_path):
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("plain", TopicConfig(partitions=1))
    _produce(a, "plain", ["v"])
    with pytest.raises(ValueError, match="remote_write"):
        a.unmount_topic("plain")
    # a fenced (stale) writer cannot migrate the topic away
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v"])
    TopicEngine(spark, str(tmp_path / "a"), archive_root=str(cold))
    with pytest.raises(FencedWriterError):
        a.unmount_topic("t")


def test_mount_without_manifest_falls_back_to_recovery(spark, tmp_path):
    """A bucket with data but no topic manifest (e.g. the origin cluster
    died before unmounting) still mounts via footer recovery — the DR
    path — losing only what footers can't know (empty partitions)."""
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v1", "v2"])
    a.run_archival(
        "t", now_ms=int((BASE + dt.timedelta(hours=2)).timestamp() * 1000)
    )
    before = _rowset(a.log("t"))

    b = _mk_engine(spark, tmp_path, "b", cold)
    b.mount_topic("t")
    assert _rowset(b.log("t")) == before


def test_mount_existing_topic_refused(spark, tmp_path):
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    with pytest.raises(ValueError, match="exists"):
        a.mount_topic("t")


def test_cli_unmount_mount_roundtrip(spark, tmp_path, capsys):
    from redpanda_spark.cli import main

    root = str(tmp_path / "root")
    cold = str(tmp_path / "bucket")
    eng = TopicEngine(spark, root, archive_root=cold)
    eng.create_topic("t", _cfg(partitions=1))
    _produce(eng, "t", ["v1"])
    assert (
        main(["--root", root, "--archive-root", cold, "topic", "unmount", "t"])
        == 0
    )
    out = json.loads(capsys.readouterr().out)
    assert out["unmounted"] == "t"
    assert (
        main(["--root", root, "--archive-root", cold, "topic", "mount", "t"])
        == 0
    )
    out = json.loads(capsys.readouterr().out)
    assert out["mounted"] == "t"


def test_migration_carries_consumer_offsets_via_export_import(spark, tmp_path):
    """The reference migrates consumer offsets as an opt-in step next to
    the topic data; here the same composition: offsets exported on A stay
    VALID after mount on B (offsets are preserved by the migration), so
    group import resumes consumption at the exact lag."""
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v1", "v2", "v3"])
    a.offset_commit("g1", "t", 0, 2)  # consumed v1, v2
    exported = [
        {
            "group": "g1",
            "topic": r["topic"],
            "partition": r["partition"],
            "offset": r["committed_offset"],
        }
        for r in a.offset_fetch("g1").collect()
    ]
    a.unmount_topic("t")

    b = _mk_engine(spark, tmp_path, "b", cold)
    b.mount_topic("t")
    for rec in exported:
        b.offset_commit("g1", rec["topic"], rec["partition"], rec["offset"])
    committed = {
        (r["topic"], r["partition"]): r["committed_offset"]
        for r in b.offset_fetch("g1").collect()
    }
    assert committed == {("t", 0): 2}
    # resuming at the committed offset yields exactly the unread tail
    rows = b.fetch_rows("t", 0, offset=2)
    assert [bytes(r["value"]) for r in rows] == [b"v3"]


def test_rest_unmount_mount_routes(spark, tmp_path):
    """The admin-surface analog (reference data_migration_frontend on the
    admin API): POST /topics/<t>/unmount then /mount over the WSGI path,
    including the 409 contract for invalid migrations."""
    from redpanda_spark.rest import RestApp

    cold = tmp_path / "bucket"
    eng = _mk_engine(spark, tmp_path, "a", cold)
    eng.create_topic("t", _cfg(partitions=1))
    _produce(eng, "t", ["v1", "v2"])
    app = RestApp(eng)
    status, out = app.handle("POST", "/topics/t/unmount")
    assert status == 200 and out["unmounted"] == "t"
    assert "t" not in eng.list_topics()
    status, out = app.handle("POST", "/topics/t/mount")
    assert status == 200 and out["mounted"] == "t"
    assert out["high_watermarks"] == {"0": 2}
    # invalid: mounting an existing topic is a 409, not a 500
    status, out = app.handle("POST", "/topics/t/mount")
    assert status == 409 and out["error_code"] == 40902
    # invalid: unmounting a non-tiered topic is a 409
    eng.create_topic("plain", TopicConfig(partitions=1))
    status, out = app.handle("POST", "/topics/plain/unmount")
    assert status == 409


def test_unmount_crash_before_tier_flip_is_clean_undo(spark, tmp_path):
    """Crash before the phase-1 manifest commit: the uploaded copies are
    unreferenced orphans (collected at reopen) and the topic is exactly
    as before — unmount simply didn't happen."""
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v1", "v2"])
    before = _rowset(a.log("t"))

    def power_cut(topic):
        raise RuntimeError("power cut")

    a._commit_manifest = power_cut
    with pytest.raises(RuntimeError):
        a.unmount_topic("t")
    a2 = _mk_engine(spark, tmp_path, "a", cold)
    assert _rowset(a2.log("t")) == before
    # ... and the retried unmount migrates cleanly
    a2.unmount_topic("t")
    b = _mk_engine(spark, tmp_path, "b", cold)
    b.mount_topic("t")
    assert _rowset(b.log("t")) == before


def test_unmount_crash_after_tier_flip_leaves_tiered_topic(spark, tmp_path):
    """Crash after phase 1 (tier flip committed) but before the detach:
    the topic is a normal fully-tiered, still-locally-owned topic — rows
    intact, unmount retryable."""
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v1", "v2"])
    before = _rowset(a.log("t"))

    def crash_detach():
        raise RuntimeError("power cut mid-detach")

    a._save_state = crash_detach
    with pytest.raises(RuntimeError):
        a.unmount_topic("t")
    a2 = _mk_engine(spark, tmp_path, "a", cold)
    assert _rowset(a2.log("t")) == before
    assert a2.topic_stats("t")["segments"] == 0  # fully tiered
    assert a2.topic_stats("t")["archived_segments"] >= 1
    a2.unmount_topic("t")  # retry completes the migration
    b = _mk_engine(spark, tmp_path, "b", cold)
    b.mount_topic("t")
    assert _rowset(b.log("t")) == before


def test_unmount_crash_before_bucket_manifest_is_dr_recoverable(
    spark, tmp_path
):
    """Crash between the local detach and the bucket-manifest write: the
    topic is gone locally and the bucket has data but no handoff token —
    the DR path (mount falls back to footer recovery) restores every
    row, and no state ever had two owners."""
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v1", "v2"])
    before = _rowset(a.log("t"))

    real_write = a._afsio.write_text_atomic

    def crash_on_manifest(path, text):
        if path.endswith("_topic_manifest.json"):
            raise RuntimeError("power cut before handoff")
        return real_write(path, text)

    a._afsio.write_text_atomic = crash_on_manifest
    with pytest.raises(RuntimeError):
        a.unmount_topic("t")
    a2 = _mk_engine(spark, tmp_path, "a", cold)
    assert "t" not in a2.list_topics()  # detach committed
    b = _mk_engine(spark, tmp_path, "b", cold)
    b.mount_topic("t")  # footer-recovery fallback
    assert _rowset(b.log("t")) == before


def test_migration_preserves_aborted_tx_ranges(spark, tmp_path):
    """read_committed must filter identically on the target cluster: the
    aborted ranges (side-table metadata here; in-log markers in the
    reference) travel inside the bucket handoff manifest."""
    from pyspark.sql import Row

    from redpanda_spark.operators.txcoord import TX_RANGE_SCHEMA

    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v0"])
    # a transactional batch that will be ABORTED (offsets 1-2)
    a.produce(
        "t",
        [
            {
                "value": v.encode(),
                "timestamp": BASE,
                "partition": 0,
                "producer_id": 7,
                "producer_epoch": 0,
                "base_sequence": i,
                "is_transactional": True,
            }
            for i, v in enumerate(["v1", "v2"])
        ],
    )
    _produce(a, "t", ["v3"])
    a.append_tx_ranges(
        spark.createDataFrame(
            [
                Row(
                    topic="t",
                    partition=0,
                    producer_id=7,
                    first_offset=1,
                    last_offset=2,
                    outcome="aborted",
                )
            ],
            TX_RANGE_SCHEMA,
        )
    )

    def rc(eng):
        return sorted(
            bytes(r["value"])
            for r in eng.fetch("t", 0, isolation="read_committed").collect()
        )

    assert rc(a) == [b"v0", b"v3"]
    a.unmount_topic("t")
    b = _mk_engine(spark, tmp_path, "b", cold)
    b.mount_topic("t")
    assert rc(b) == [b"v0", b"v3"]  # aborted rows stay invisible
    assert b.log("t").count() == 4  # ... but the data itself migrated


def test_unmount_refuses_open_transaction(spark, tmp_path):
    from pyspark.sql import Row

    from redpanda_spark.operators.txcoord import TX_RANGE_SCHEMA

    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v0", "v1"])
    a.append_tx_ranges(
        spark.createDataFrame(
            [
                Row(
                    topic="t",
                    partition=0,
                    producer_id=9,
                    first_offset=1,
                    last_offset=None,
                    outcome="open",
                )
            ],
            TX_RANGE_SCHEMA,
        )
    )
    with pytest.raises(ValueError, match="open transaction"):
        a.unmount_topic("t")


def test_crash_sweep_unmount_never_loses_rows(spark, tmp_path):
    """Kill-point sweep over unmount's metadata mutations on BOTH
    filesystems (engine root and bucket): whatever mutation the crash
    lands on, recovery finds one of unmount's three documented
    consistent states — topic intact locally, fully-tiered locally, or
    detached-and-mountable (handoff manifest or DR fallback) — and the
    full row set is always readable. Zero row loss at every kill-point."""
    from redpanda_spark.engine import TopicEngine

    class _Crash(Exception):
        pass

    class _Inject:
        """Shared mutation budget across the two filesystems."""

        _MUTATORS = {
            "write_text_atomic",
            "write_bytes_atomic",
            "rename",
            "delete",
            "mkdirs",
            "delete_dir_if_empty",
        }

        def __init__(self, budget):
            self.budget = budget
            self.mutations = 0

        def wrap(self, inner):
            counter = self

            class _FS:
                def __getattr__(self, name):
                    attr = getattr(inner, name)
                    if name not in counter._MUTATORS or not callable(attr):
                        return attr

                    def guarded(*a, **kw):
                        counter.mutations += 1
                        if counter.mutations >= counter.budget:
                            raise _Crash(f"mutation #{counter.mutations}: {name}")
                        return attr(*a, **kw)

                    return guarded

            return _FS()

    crashes = 0
    for budget in range(1, 30):
        root = str(tmp_path / f"b{budget}" / "root")
        cold = str(tmp_path / f"b{budget}" / "bucket")
        a = TopicEngine(spark, root, archive_root=cold)
        a.create_topic("t", _cfg(partitions=2))
        _produce(a, "t", ["v1", "v2"], partition=0)
        _produce(a, "t", ["v3"], partition=1)
        expected = _rowset(a.log("t"))
        inj = _Inject(budget)
        a._fsio = inj.wrap(a._fsio)
        a._afsio = inj.wrap(a._afsio)
        try:
            a.unmount_topic("t")
            completed = True
        except _Crash:
            completed = False
            crashes += 1
        rec = TopicEngine(spark, root, archive_root=cold)
        if "t" in rec.list_topics():
            assert not completed, f"budget {budget}: completed but not detached"
            assert _rowset(rec.log("t")) == expected, f"budget {budget}"
        else:
            rec.mount_topic("t")  # handoff manifest, or DR footer fallback
            assert _rowset(rec.log("t")) == expected, f"budget {budget}"
        if completed:
            break
    assert crashes >= 5, f"sweep only crashed {crashes} times — injector unwired?"


def test_compacted_topic_migrates_with_keep_latest(spark, tmp_path):
    """Compacted-topic migration (the reference migrates any topic —
    `cluster/data_migration_backend.cc` has no policy restriction):
    unmount runs one FINAL keep-latest compaction, the bucket carries
    the compacted view, and mount on a second cluster preserves exactly
    latest-per-key — including a fresh tombstone still inside its grace
    window."""
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic(
        "c",
        _cfg(partitions=1, cleanup_policy="compact", delete_retention_ms=10_000),
    )
    now = BASE + dt.timedelta(minutes=1)
    a.produce(
        "c",
        [
            {"key": b"k1", "value": b"old1", "timestamp": BASE, "partition": 0},
            {"key": b"k2", "value": b"old2", "timestamp": BASE, "partition": 0},
            {"key": b"k1", "value": b"new1", "timestamp": BASE, "partition": 0},
            # fresh tombstone for k2: inside delete.retention grace at
            # unmount time, so it must survive the final compaction
            {"key": b"k2", "value": None, "timestamp": now, "partition": 0},
        ],
    )
    res = a.unmount_topic("c", now_ms=int(now.timestamp() * 1000))
    assert res["unmounted"] == "c"

    b = _mk_engine(spark, tmp_path, "b", cold)
    b.mount_topic("c")
    assert b.list_topics()["c"].cleanup_policy == "compact"
    rows = {
        bytes(r["key"]): (None if r["value"] is None else bytes(r["value"]))
        for r in b.log("c").collect()
    }
    # keep-latest intact: old1/old2 compacted away, tombstone retained
    assert rows == {b"k1": b"new1", b"k2": None}


def test_unmount_with_groups_migrates_consumer_offsets(spark, tmp_path):
    """First-class consumer-offset migration (reference:
    `cluster/data_migration_types.h:184,231` carries `groups` in the
    migration object): unmount(with_groups=[...]) rides the committed
    offsets in the bucket manifest; mount replays them — the consumer
    resumes at its exact position on the target cluster with NO manual
    export/import. Groups not opted in stay behind."""
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v1", "v2", "v3"])
    a.offset_commit("g1", "t", 0, 2)  # consumed v1, v2
    a.offset_commit("g2", "t", 0, 1)  # NOT migrated
    a.unmount_topic("t", with_groups=["g1"])

    b = _mk_engine(spark, tmp_path, "b", cold)
    b.mount_topic("t")
    committed = {
        (r["group_id"], r["partition"]): r["committed_offset"]
        for r in b.offset_fetch().where("topic = 't'").collect()
    }
    assert committed == {("g1", 0): 2}
    # resuming at the committed offset yields exactly the unread tail
    rows = b.fetch_rows("t", 0, offset=2)
    assert [bytes(r["value"]) for r in rows] == [b"v3"]


def test_unmount_with_groups_true_migrates_every_group(spark, tmp_path):
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=2))
    _produce(a, "t", ["v1", "v2"], partition=0)
    _produce(a, "t", ["v3"], partition=1)
    a.offset_commit("g1", "t", 0, 1)
    a.offset_commit("g2", "t", 1, 1)
    a.unmount_topic("t", with_groups=True)
    b = _mk_engine(spark, tmp_path, "b", cold)
    b.mount_topic("t")
    committed = {
        (r["group_id"], r["partition"]): r["committed_offset"]
        for r in b.offset_fetch().where("topic = 't'").collect()
    }
    assert committed == {("g1", 0): 1, ("g2", 1): 1}


def test_mount_claim_is_first_winner_only(spark, tmp_path):
    """The ADVICE double-mount hazard: mount must CLAIM the bucket
    manifest (atomic rename to the handoff-token name) BEFORE adopting
    locally, so a crash mid-mount — or a concurrent mount on another
    cluster — can never leave the topic owned twice."""
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v1"])
    res = a.unmount_topic("t")
    ad = res["archive_dir"]

    # simulate a mount that crashed between claim and adopt: the token
    # exists under its claimed name, the plain manifest is gone
    os.rename(
        os.path.join(ad, "_topic_manifest.json"),
        os.path.join(ad, "_topic_manifest.claimed.json"),
    )
    b = _mk_engine(spark, tmp_path, "b", cold)
    with pytest.raises(ValueError, match="resume_claim"):
        b.mount_topic("t")
    assert "t" not in b.list_topics()
    # operator-driven recovery: resume from the orphaned token
    b.mount_topic("t", resume_claim=True)
    assert [bytes(r["value"]) for r in b.fetch_rows("t", 0)] == [b"v1"]
    # token consumed — a third cluster can no longer claim-mount
    assert not os.path.exists(os.path.join(ad, "_topic_manifest.claimed.json"))
    c = _mk_engine(spark, tmp_path, "c", cold)
    with pytest.raises(ValueError, match="no claimed manifest"):
        c.mount_topic("t", resume_claim=True)


def test_mount_adopt_failure_rolls_back_and_returns_token(spark, tmp_path):
    """A failure DURING adoption (here: the tx-range restore) must undo
    the local commit and put the bucket manifest back under its plain
    name, so the mount is retryable — on this or any other cluster.
    Pre-fix the topic stayed half-mounted locally while the bucket
    manifest survived, mountable by a second cluster: two owners."""
    from pyspark.sql import Row

    from redpanda_spark.operators.txcoord import TX_RANGE_SCHEMA

    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v1", "v2"])
    # give the manifest a tx_ranges payload so the restore step runs
    a.produce(
        "t",
        [
            {
                "value": b"aborted",
                "timestamp": BASE,
                "partition": 0,
                "producer_id": 7,
                "producer_epoch": 0,
                "base_sequence": 0,
                "is_transactional": True,
            }
        ],
    )
    a.append_tx_ranges(
        spark.createDataFrame(
            [
                Row(
                    topic="t",
                    partition=0,
                    producer_id=7,
                    first_offset=2,
                    last_offset=2,
                    outcome="aborted",
                )
            ],
            TX_RANGE_SCHEMA,
        )
    )
    res = a.unmount_topic("t")
    ad = res["archive_dir"]

    b = _mk_engine(spark, tmp_path, "b", cold)
    real_append = b.append_tx_ranges
    b.append_tx_ranges = lambda df: (_ for _ in ()).throw(
        RuntimeError("injected adopt failure")
    )
    with pytest.raises(RuntimeError, match="injected"):
        b.mount_topic("t")
    # rolled back locally...
    assert "t" not in b.list_topics()
    assert "t" not in TopicEngine(
        spark, str(tmp_path / "b"), archive_root=str(cold), read_only=True
    ).list_topics()
    # ...and the token returned to its plain name: retry succeeds
    assert os.path.exists(os.path.join(ad, "_topic_manifest.json"))
    b.append_tx_ranges = real_append
    b.mount_topic("t")
    vals = {
        bytes(r["value"])
        for r in b.fetch("t", 0, isolation="read_committed").collect()
    }
    assert vals == {b"v1", b"v2"}  # the aborted row stays filtered


def test_rest_fenced_writer_maps_to_409(spark, tmp_path):
    """A fenced REST mutation keeps the JSON error contract (409 with a
    fenced-writer error code) instead of escaping as an HTML 500 — the
    reference returns NOT_LEADER-class errors for the same condition."""
    from redpanda_spark.rest import RestApp

    cold = tmp_path / "bucket"
    eng = _mk_engine(spark, tmp_path, "a", cold)
    eng.create_topic("t", _cfg(partitions=1))
    _produce(eng, "t", ["v1"])
    app = RestApp(eng)
    # a second engine claims the topic: eng is now a stale writer
    _mk_engine(spark, tmp_path, "a", cold)
    status, out = app.handle(
        "POST",
        "/topics/t",
        {"records": [{"value": "djI="}]},
    )
    assert status == 409, out
    assert out["error_code"] == 40903
    assert "fenced" in out["message"]


def test_crash_sweep_mount_never_double_owns_or_loses_rows(spark, tmp_path):
    """Kill-point sweep over mount's mutations on BOTH filesystems:
    whatever mutation the crash lands on, the topic is owned by AT MOST
    one cluster, the full row set stays reachable (retry, resume_claim,
    or the already-mounted topic), and a second cluster can never adopt
    a topic someone else completed (the claim token is gone)."""

    class _Crash(Exception):
        pass

    class _Inject:
        _MUTATORS = {
            "write_text_atomic",
            "write_bytes_atomic",
            "rename",
            "delete",
            "mkdirs",
            "delete_dir_if_empty",
            "create_exclusive",
        }

        def __init__(self, budget):
            self.budget = budget
            self.mutations = 0

        def wrap(self, inner):
            counter = self

            class _FS:
                def __getattr__(self, name):
                    attr = getattr(inner, name)
                    if name not in counter._MUTATORS or not callable(attr):
                        return attr

                    def guarded(*a, **kw):
                        counter.mutations += 1
                        if counter.mutations >= counter.budget:
                            raise _Crash(f"mutation #{counter.mutations}: {name}")
                        return attr(*a, **kw)

                    return guarded

            return _FS()

    crashes = 0
    for budget in range(1, 25):
        cold = str(tmp_path / f"m{budget}" / "bucket")
        a = TopicEngine(
            spark, str(tmp_path / f"m{budget}" / "a"), archive_root=cold
        )
        a.create_topic("t", _cfg(partitions=2))
        _produce(a, "t", ["v1", "v2"], partition=0)
        _produce(a, "t", ["v3"], partition=1)
        expected = _rowset(a.log("t"))
        a.unmount_topic("t")

        root_b = str(tmp_path / f"m{budget}" / "b")
        b = TopicEngine(spark, root_b, archive_root=cold)
        inj = _Inject(budget)
        b._fsio = inj.wrap(b._fsio)
        b._afsio = inj.wrap(b._afsio)
        try:
            b.mount_topic("t")
            completed = True
        except _Crash:
            completed = False
            crashes += 1

        rec = TopicEngine(spark, root_b, archive_root=cold)
        if "t" in rec.list_topics():
            # mounted here: the token must be consumed or consumable by
            # NO other cluster (no plain manifest left in the bucket)
            assert not os.path.exists(
                os.path.join(cold, "t", "_topic_manifest.json")
            ), f"budget {budget}: mounted AND still claimable — two owners"
            assert _rowset(rec.log("t")) == expected, f"budget {budget}"
        else:
            # not mounted: recover via retry or the resume path
            try:
                rec.mount_topic("t")
            except ValueError as e:
                assert "resume_claim" in str(e), f"budget {budget}: {e}"
                rec.mount_topic("t", resume_claim=True)
            assert _rowset(rec.log("t")) == expected, f"budget {budget}"
        if completed:
            break
    assert crashes >= 4, f"sweep only crashed {crashes} times — injector unwired?"


def test_rest_and_cli_group_migration_surfaces(spark, tmp_path, capsys):
    """The with_groups opt-in rides through both admin surfaces: REST
    body {"with_groups": [...]} and CLI --with-groups."""
    from redpanda_spark.cli import main
    from redpanda_spark.rest import RestApp

    # REST: unmount with groups, mount, offsets present on the target
    cold = tmp_path / "bucket"
    a = _mk_engine(spark, tmp_path, "a", cold)
    a.create_topic("t", _cfg(partitions=1))
    _produce(a, "t", ["v1", "v2"])
    a.offset_commit("g1", "t", 0, 1)
    app = RestApp(a)
    status, out = app.handle(
        "POST", "/topics/t/unmount", {"with_groups": ["g1"]}
    )
    assert status == 200 and out["unmounted"] == "t"
    b = _mk_engine(spark, tmp_path, "b", cold)
    RestApp(b).handle("POST", "/topics/t/mount")
    committed = {
        (r["group_id"], r["partition"]): r["committed_offset"]
        for r in b.offset_fetch().where("topic = 't'").collect()
    }
    assert committed == {("g1", 0): 1}

    # CLI: --with-groups with no names migrates every group
    root = str(tmp_path / "c")
    cold2 = str(tmp_path / "bucket2")
    eng = TopicEngine(spark, root, archive_root=cold2)
    eng.create_topic("u", _cfg(partitions=1))
    _produce(eng, "u", ["x"])
    eng.offset_commit("g2", "u", 0, 1)
    assert main([
        "--root", root, "--archive-root", cold2,
        "topic", "unmount", "u", "--with-groups",
    ]) == 0
    capsys.readouterr()
    root_d = str(tmp_path / "d")
    assert main([
        "--root", root_d, "--archive-root", cold2, "topic", "mount", "u",
    ]) == 0
    capsys.readouterr()
    d = TopicEngine(spark, root_d, archive_root=cold2, read_only=True)
    committed = {
        (r["group_id"], r["partition"]): r["committed_offset"]
        for r in d.offset_fetch().where("topic = 'u'").collect()
    }
    assert committed == {("g2", 0): 1}
