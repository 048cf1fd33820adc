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
