"""Log-operator semantics tests, mirroring the reference's storage tests
(`src/v/storage/tests/`: timequery_test.cc, log_retention_tests.cc,
log_truncate_test.cc, compaction_e2e_test.cc scenarios)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from redpanda_spark.operators import log as LOG
from redpanda_spark.operators.compaction import (
    compact_keep_latest,
    compact_with_tombstone_grace,
)
from redpanda_spark.sources.tables import topic_view


def make_log(spark, rows):
    return spark.createDataFrame(rows)


def test_topic_view_offsets_contiguous(spark, sf_dir):
    log = topic_view(spark, sf_dir)
    per_part = (
        log.groupBy("partition")
        .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    assert len(per_part) > 0
    for r in per_part:
        assert r["lo"] == 0
        assert r["hi"] == r["n"] - 1  # contiguous, no gaps


def test_fetch_range_bounds(spark, sf_dir):
    log = topic_view(spark, sf_dir)
    out = LOG.fetch(log, partition=1, start_offset=10, end_offset=20).collect()
    assert all(r["partition"] == 1 and 10 <= r["offset"] < 20 for r in out)
    offsets = [r["offset"] for r in out]
    assert offsets == sorted(offsets)


def test_fetch_max_records(spark, sf_dir):
    log = topic_view(spark, sf_dir)
    out = LOG.fetch(log, partition=1, start_offset=0, max_records=5).collect()
    assert len(out) == 5
    assert [r["offset"] for r in out] == [0, 1, 2, 3, 4]


def test_fetch_unbounded_has_no_global_sort(spark, sf_dir):
    """An unbounded fetch does exactly one range exchange on
    (partition, offset) + a LOCAL sort — skew-proof (a hot topic partition
    splits across tasks) with no global merge sort. With max_records the
    plan is TakeOrderedAndProject (per-partition top-k), never a full
    sort."""
    log = topic_view(spark, sf_dir)
    unbounded = LOG.fetch(log, start_offset=0)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(partition" in unbounded
    # the only Sort nodes are local (global=false)
    for line in unbounded.splitlines():
        if line.strip().startswith(("Sort ", "+- Sort ", ":- Sort ")):
            assert "false, 0" in line, line
    bounded = LOG.fetch(log, start_offset=0, max_records=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in bounded


def test_list_offsets_earliest_latest(spark, sf_dir):
    log = topic_view(spark, sf_dir)
    res = {r["partition"]: r for r in LOG.list_offsets(log).collect()}
    counts = {r["partition"]: r["n"] for r in log.groupBy("partition").agg(F.count("*").alias("n")).collect()}
    for p, r in res.items():
        assert r["earliest_offset"] == 0
        assert r["latest_offset"] == counts[p]


def test_timequery_returns_first_matching_offset(spark):
    rows = [
        Row(partition=0, offset=i, timestamp=f"2024-01-{d:02d} 00:00:00")
        for i, d in enumerate([1, 2, 3, 10, 20])
    ]
    log = make_log(spark, rows).withColumn("timestamp", F.to_timestamp("timestamp"))
    out = {r["partition"]: r["offset"] for r in LOG.timequery(log, "2024-01-03 00:00:00").collect()}
    assert out[0] == 2
    # T past the end → no row (reference returns 'not found')
    assert LOG.timequery(log, "2025-01-01 00:00:00").count() == 0


def test_retention_by_time(spark):
    rows = [
        Row(partition=0, offset=i, timestamp=f"2024-01-{d:02d} 00:00:00")
        for i, d in enumerate([1, 2, 3, 10, 20])
    ]
    log = make_log(spark, rows).withColumn("timestamp", F.to_timestamp("timestamp"))
    kept = LOG.retain_by_time(log, "2024-01-03 00:00:00").collect()
    assert sorted(r["offset"] for r in kept) == [2, 3, 4]


def test_retention_by_size(spark):
    rows = [Row(partition=0, offset=i, nbytes=100) for i in range(10)]
    log = make_log(spark, rows)
    kept = LOG.retain_by_size(log, 350, "nbytes").collect()
    # newest records that fit in 350 bytes = last 3
    assert sorted(r["offset"] for r in kept) == [7, 8, 9]


def test_delete_records_prefix_truncate(spark):
    rows = [Row(partition=p, offset=i) for p in (0, 1) for i in range(10)]
    log = make_log(spark, rows)
    kept = LOG.delete_records(log, {0: 5}).collect()
    p0 = sorted(r["offset"] for r in kept if r["partition"] == 0)
    p1 = sorted(r["offset"] for r in kept if r["partition"] == 1)
    assert p0 == [5, 6, 7, 8, 9]
    assert p1 == list(range(10))  # untouched partition keeps everything


def test_assign_offsets_contiguous_with_base(spark):
    rows = [Row(partition=p, ingest_seq=i) for p in (0, 1) for i in range(5)]
    batch = make_log(spark, rows)
    out = LOG.assign_offsets(batch, base_offsets={0: 100}).collect()
    p0 = sorted(r["offset"] for r in out if r["partition"] == 0)
    p1 = sorted(r["offset"] for r in out if r["partition"] == 1)
    assert p0 == [100, 101, 102, 103, 104]
    assert p1 == [0, 1, 2, 3, 4]


def test_compaction_keep_latest(spark):
    rows = [
        Row(partition=0, offset=0, key="a", value="v0"),
        Row(partition=0, offset=1, key="b", value="v1"),
        Row(partition=0, offset=2, key="a", value="v2"),
        Row(partition=0, offset=3, key="a", value="v3"),
    ]
    log = make_log(spark, rows)
    out = {r["key"]: r for r in compact_keep_latest(log, ["partition", "key"]).collect()}
    assert out["a"]["value"] == "v3" and out["a"]["offset"] == 3
    assert out["b"]["value"] == "v1"


def test_compaction_tombstone_grace(spark):
    rows = [
        Row(partition=0, offset=0, key="a", value="v0", timestamp="2024-01-01 00:00:00"),
        Row(partition=0, offset=1, key="a", value=None, timestamp="2024-01-02 00:00:00"),
        Row(partition=0, offset=2, key="b", value=None, timestamp="2024-01-09 00:00:00"),
        Row(partition=0, offset=3, key="c", value="v3", timestamp="2024-01-01 00:00:00"),
    ]
    log = make_log(spark, rows).withColumn("timestamp", F.to_timestamp("timestamp"))
    # now = Jan 10, grace = 2 days: key a's tombstone (Jan 2) is expired → gone;
    # key b's tombstone (Jan 9) still within grace → visible
    out = compact_with_tombstone_grace(
        log, ["partition", "key"], "value", "2024-01-10 00:00:00", 2 * 86400 * 1000
    ).collect()
    keys = sorted(r["key"] for r in out)
    assert keys == ["b", "c"]


def test_asof_join_basic_and_equal_time(spark):
    """Non-strict: a version AT t applies to a fact AT t; strict: it
    doesn't. Facts before any version get NULL (left semantics)."""
    from redpanda_spark.operators.asof import asof_join

    versions = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u2", 15, "x")],
        "k string, ts long, state string",
    )
    facts = spark.createDataFrame(
        [("u1", 5, 1), ("u1", 10, 2), ("u1", 19, 3), ("u1", 20, 4),
         ("u2", 14, 5), ("u3", 99, 6)],
        "k string, ts long, fid int",
    )
    out = {
        r["fid"]: r["state"]
        for r in asof_join(facts, versions, on="k").collect()
    }
    assert out == {1: None, 2: "a", 3: "a", 4: "b", 5: None, 6: None}

    strict = {
        r["fid"]: r["state"]
        for r in asof_join(facts, versions, on="k", strict=True).collect()
    }
    assert strict[2] is None and strict[4] == "a"  # co-timed version excluded


def test_asof_join_payload_collision_rejected(spark):
    from redpanda_spark.operators.asof import asof_join

    versions = spark.createDataFrame([("u1", 1, "a")], "k string, ts long, fid string")
    facts = spark.createDataFrame([("u1", 2, 7)], "k string, ts long, fid int")
    with pytest.raises(ValueError, match="collides"):
        asof_join(facts, versions, on="k")


def test_asof_join_single_shuffle_plan(spark):
    """The as-of must compile to ONE exchange on the key (union-window),
    not a range join: at 100 TB a facts x versions range join explodes."""
    from redpanda_spark.operators.asof import asof_join

    versions = spark.createDataFrame([("u1", 1, "a")], "k string, ts long, state string")
    facts = spark.createDataFrame([("u1", 2, 7)], "k string, ts long, fid int")
    plan = asof_join(facts, versions, on="k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_interval_join_matches_and_boundaries(spark):
    from redpanda_spark.operators.interval import interval_join

    iv = spark.createDataFrame(
        [("u1", 100, 200, "w1"), ("u1", 150, 250, "w2"), ("u2", 0, 50, "w3")],
        "k string, start long, end long, wid string",
    )
    facts = spark.createDataFrame(
        [("u1", 100, 1), ("u1", 175, 2), ("u1", 200, 3), ("u1", 250, 4),
         ("u1", 99, 5), ("u2", 50, 6), ("u3", 10, 7)],
        "k string, ts long, fid int",
    )
    got = {
        (r["fid"], r["wid"])
        for r in interval_join(
            facts, iv, on="k", bucket=100, time_unit_is_timestamp=False
        ).collect()
    }
    # inclusive ends: ts=200 in w1 and w2; ts=250 in w2; ts=50 in w3
    assert got == {(1, "w1"), (2, "w1"), (2, "w2"), (3, "w1"), (3, "w2"),
                   (4, "w2"), (6, "w3")}
    excl = {
        (r["fid"], r["wid"])
        for r in interval_join(
            facts, iv, on="k", bucket=100, time_unit_is_timestamp=False,
            end_exclusive=True,
        ).collect()
    }
    assert excl == {(1, "w1"), (2, "w1"), (2, "w2"), (3, "w2")}


def test_interval_join_no_nested_loop_plan(spark):
    from redpanda_spark.operators.interval import interval_join

    iv = spark.createDataFrame([("u1", 0, 10, "w")], "k string, start long, end long, wid string")
    facts = spark.createDataFrame([("u1", 5, 1)], "k string, ts long, fid int")
    plan = interval_join(
        facts, iv, on="k", bucket=10, time_unit_is_timestamp=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_interval_join_overlong_interval_rejected(spark):
    from redpanda_spark.operators.interval import interval_join

    iv = spark.createDataFrame([("u1", 0, 10_000_000, "w")], "k string, start long, end long, wid string")
    facts = spark.createDataFrame([("u1", 5, 1)], "k string, ts long, fid int")
    with pytest.raises(ValueError, match="buckets"):
        interval_join(
            facts, iv, on="k", bucket=10, time_unit_is_timestamp=False
        ).count()
