"""Consumer-client e2e — the consumer_group_test.py lifecycle: group
formation, partition split, exactly-once consumption across members,
committed-offset resume, rebalance on leave, static-member restart."""

from __future__ import annotations

from pyspark.sql import Row

from redpanda_spark.consumer import Consumer
from redpanda_spark.engine import TopicConfig, TopicEngine
from redpanda_spark.operators.coordinator import GroupManager


def _setup(spark, tmp_path, n_parts=4, n_msgs=40):
    engine = TopicEngine(spark, str(tmp_path / "root"))
    engine.create_topic("t", TopicConfig(partitions=n_parts))
    rows = [
        Row(partition=i % n_parts, key=f"k{i}".encode(), value=f"v{i}".encode())
        for i in range(n_msgs)
    ]
    engine.produce(
        "t", spark.createDataFrame(rows, "partition int, key binary, value binary")
    )
    mgr = GroupManager({"t": n_parts}, engine=engine)
    return engine, mgr


def _drain(consumer):
    vals = []
    for rows in consumer.poll().values():
        vals += [bytes(r["value"]).decode() for r in rows]
    return vals


def test_two_consumers_split_partitions_exactly_once(spark, tmp_path):
    engine, mgr = _setup(spark, tmp_path)
    a = Consumer(engine, mgr, "g", ["t"])
    b = Consumer(engine, mgr, "g", ["t"])
    a.subscribe()
    assert b.subscribe() == {}          # group rebalancing: b waits
    a.heartbeat()                        # a rejoins -> generation completes
    got_b = b.subscribe()
    got_a = a.assignment
    # the 4 partitions split disjointly and completely
    pa, pb = set(got_a.get("t", [])), set(got_b.get("t", []))
    assert pa and pb and not (pa & pb) and pa | pb == {0, 1, 2, 3}

    va, vb = _drain(a), _drain(b)
    assert not (set(va) & set(vb))
    assert sorted(va + vb) == sorted(f"v{i}" for i in range(40))  # exactly once
    a.commit()
    b.commit()

    # new records: next polls see ONLY them (resume from committed)
    engine.produce(
        "t",
        spark.createDataFrame(
            [Row(partition=0, key=b"kx", value=b"new0"),
             Row(partition=3, key=b"ky", value=b"new3")],
            "partition int, key binary, value binary",
        ),
    )
    fresh = _drain(a) + _drain(b)
    assert sorted(fresh) == ["new0", "new3"]


def test_committed_offsets_survive_member_restart(spark, tmp_path):
    engine, mgr = _setup(spark, tmp_path, n_parts=2, n_msgs=10)
    c = Consumer(engine, mgr, "g2", ["t"])
    c.subscribe()
    assert len(_drain(c)) == 10
    c.commit()
    c.close()

    c2 = Consumer(engine, mgr, "g2", ["t"])
    c2.subscribe()
    assert _drain(c2) == []  # nothing new; committed offsets held
    # latest-reset consumer in a FRESH group skips the backlog
    c3 = Consumer(engine, mgr, "g3", ["t"], auto_offset_reset="latest")
    c3.subscribe()
    assert _drain(c3) == []
    # earliest-reset fresh group reads everything
    c4 = Consumer(engine, mgr, "g4", ["t"])
    c4.subscribe()
    assert len(_drain(c4)) == 10


def test_rebalance_on_member_leave(spark, tmp_path):
    engine, mgr = _setup(spark, tmp_path, n_parts=2, n_msgs=4)
    a = Consumer(engine, mgr, "g5", ["t"])
    b = Consumer(engine, mgr, "g5", ["t"])
    a.subscribe(); b.subscribe(); a.heartbeat(); b.subscribe()
    assert len(a.assignment.get("t", [])) == 1
    b.close()  # dynamic leave -> rebalance
    a.heartbeat()  # rejoin picks up both partitions
    assert sorted(a.assignment["t"]) == [0, 1]


def test_static_consumer_restart_keeps_assignment(spark, tmp_path):
    engine, mgr = _setup(spark, tmp_path, n_parts=2, n_msgs=4)
    s = Consumer(engine, mgr, "g6", ["t"], group_instance_id="app-0")
    assigned = s.subscribe()
    gen = s.generation
    s.close()  # static: slot survives
    s2 = Consumer(engine, mgr, "g6", ["t"], group_instance_id="app-0")
    assert s2.subscribe() == assigned
    assert s2.generation == gen  # no rebalance happened
