"""Consumer-group offsets + transactional visibility tests, mirroring
reference scenarios from `kafka/server/tests/group_test.cc` and the
rm_stm / fetch read_committed paths."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from redpanda_spark.operators.groups import group_lag, offset_fetch
from redpanda_spark.operators.transactions import (
    idempotent_dedup,
    last_stable_offset,
    read_committed,
)


def commits_df(spark, rows):
    base = dict(leader_epoch=0, metadata="", deleted=False)
    return spark.createDataFrame([Row(**{**base, **r}) for r in rows])


def test_offset_fetch_keeps_latest_commit(spark):
    commits = commits_df(
        spark,
        [
            dict(group_id="g1", topic="t", partition=0, committed_offset=5, commit_seq=1),
            dict(group_id="g1", topic="t", partition=0, committed_offset=9, commit_seq=2),
            dict(group_id="g1", topic="t", partition=1, committed_offset=3, commit_seq=3),
        ],
    )
    out = {(r["group_id"], r["partition"]): r["committed_offset"] for r in offset_fetch(commits).collect()}
    assert out[("g1", 0)] == 9
    assert out[("g1", 1)] == 3


def test_offset_delete_tombstone_excluded(spark):
    commits = commits_df(
        spark,
        [
            dict(group_id="g1", topic="t", partition=0, committed_offset=5, commit_seq=1),
            dict(group_id="g1", topic="t", partition=0, committed_offset=0, commit_seq=2, deleted=True),
        ],
    )
    assert offset_fetch(commits).count() == 0


def test_group_lag(spark):
    commits = commits_df(
        spark,
        [dict(group_id="g1", topic="t", partition=0, committed_offset=7, commit_seq=1)],
    )
    ends = spark.createDataFrame([Row(topic="t", partition=0, high_watermark=10)])
    out = group_lag(commits, ends).collect()
    assert out[0]["lag"] == 3


def _txlog(spark):
    rows = []
    for off in range(10):
        rows.append(
            Row(
                partition=0,
                offset=off,
                producer_id=1 if 2 <= off <= 4 else (2 if 5 <= off <= 6 else -1),
                is_transactional=2 <= off <= 6,
                is_control=off == 9,
                payload=f"p{off}",
            )
        )
    return spark.createDataFrame(rows)


def test_read_committed_filters_aborted_and_lso(spark):
    log = _txlog(spark)
    tx = spark.createDataFrame(
        [
            Row(topic="t", partition=0, producer_id=1, first_offset=2, last_offset=4, outcome="aborted"),
            Row(topic="t", partition=0, producer_id=2, first_offset=5, last_offset=6, outcome="committed"),
        ]
    )
    out = sorted(r["offset"] for r in read_committed(log, tx).collect())
    # aborted range 2-4 dropped, control row 9 dropped, committed 5-6 kept
    assert out == [0, 1, 5, 6, 7, 8]


def test_lso_gates_open_transactions(spark):
    log = _txlog(spark)
    tx = spark.createDataFrame(
        [Row(topic="t", partition=0, producer_id=1, first_offset=2, last_offset=4, outcome="open")]
    )
    lso = last_stable_offset(log, tx).collect()[0]["lso"]
    assert lso == 2  # reads stop at the first open txn's first offset
    out = sorted(r["offset"] for r in read_committed(log, tx).collect())
    assert out == [0, 1]


def test_idempotent_dedup_keeps_first(spark):
    rows = [
        Row(partition=0, offset=0, producer_id=1, producer_epoch=0, base_sequence=0, v="a"),
        Row(partition=0, offset=1, producer_id=1, producer_epoch=0, base_sequence=0, v="dup"),
        Row(partition=0, offset=2, producer_id=1, producer_epoch=0, base_sequence=1, v="b"),
        Row(partition=0, offset=3, producer_id=-1, producer_epoch=-1, base_sequence=-1, v="x"),
        Row(partition=0, offset=4, producer_id=-1, producer_epoch=-1, base_sequence=-1, v="y"),
    ]
    log = spark.createDataFrame(rows)
    out = idempotent_dedup(log)
    offsets = sorted(r["offset"] for r in out.collect())
    # dup at offset 1 dropped; non-idempotent rows (pid=-1) never deduped
    assert offsets == [0, 2, 3, 4]


def test_expired_offsets_kip211_rules(spark):
    from redpanda_spark.operators.groups import expired_offsets

    ms = 1_000_000  # ns per ms
    commits = commits_df(
        spark,
        [
            # stale group: latest commit far past retention -> expirable
            dict(group_id="dead", topic="t", partition=0, committed_offset=5, commit_seq=10 * ms),
            # fresh commit protects its slot
            dict(group_id="live", topic="t", partition=0, committed_offset=7, commit_seq=990 * ms),
            # stale latest, but group has active members -> protected
            dict(group_id="act", topic="t", partition=0, committed_offset=3, commit_seq=10 * ms),
            # earlier stale commit shadowed by a fresh one -> protected
            dict(group_id="live", topic="t", partition=1, committed_offset=1, commit_seq=10 * ms),
            dict(group_id="live", topic="t", partition=1, committed_offset=2, commit_seq=995 * ms),
        ],
    )
    active = spark.createDataFrame([("act",)], "group_id string")
    out = expired_offsets(
        commits, now_ns=1000 * ms, retention_ms=100, active_groups=active
    ).collect()
    assert [(r["group_id"], r["partition"]) for r in out] == [("dead", 0)]


def test_engine_expire_offsets_tombstones(spark, tmp_path):
    import time

    from redpanda_spark.engine import TopicConfig, TopicEngine

    eng = TopicEngine(spark, str(tmp_path / "root"))
    eng.create_topic("t", TopicConfig(partitions=2))
    old = time.time_ns() - 3600 * 1_000_000_000  # an hour ago
    # doctor an old commit by writing through offset_commit then expiring
    eng.offset_commit("g_old", "t", 0, 11)
    eng.offset_commit("g_new", "t", 0, 22)
    # force g_old's commit_seq into the past
    import pyspark.sql.functions as F

    d = eng._commits_dir()
    df = spark.read.parquet(d)
    rows = df.withColumn(
        "commit_seq",
        F.when(F.col("group_id") == "g_old", F.lit(old)).otherwise(
            F.col("commit_seq")
        ),
    ).collect()
    spark.createDataFrame(rows, df.schema).write.mode("overwrite").parquet(d)
    n = eng.expire_offsets(retention_ms=600_000)
    assert n == 1
    left = {r["group_id"] for r in eng.offset_fetch().collect()}
    assert left == {"g_new"}
    # idempotent: second run expires nothing new
    assert eng.expire_offsets(retention_ms=600_000) == 0


def test_compact_offsets_bounds_commit_log(spark, tmp_path):
    from redpanda_spark.engine import TopicConfig, TopicEngine

    eng = TopicEngine(spark, str(tmp_path / "root"))
    eng.create_topic("t", TopicConfig(partitions=2))
    for off in (1, 2, 3):
        eng.offset_commit("g", "t", 0, off)
    eng.offset_commit("g", "t", 1, 5)
    eng.offset_commit("gone", "t", 0, 9)
    eng.offset_delete("gone", "t", 0)
    stats = eng.compact_offsets()
    assert stats["before"] == 6 and stats["after"] == 2
    out = {
        (r["group_id"], r["partition"]): r["committed_offset"]
        for r in eng.offset_fetch().collect()
    }
    # latest offsets survive, tombstoned group is gone for good
    assert out == {("g", 0): 3, ("g", 1): 5}
    # commits after compaction still win keep-latest
    eng.offset_commit("g", "t", 0, 7)
    assert {
        r["committed_offset"]
        for r in eng.offset_fetch("g").where("partition = 0").collect()
    } == {7}
