"""Group-coordinator FSM tests mirroring the reference's group_test.cc and
consumer_group_test.py scenarios: join/sync lifecycle, generation bumps,
protocol vote, leader failover, session expiry, assignor correctness."""

from __future__ import annotations

import pytest

from redpanda_spark.operators.coordinator import (
    ASSIGNORS,
    CoordinatorError,
    GroupCoordinator,
    GroupManager,
    GroupState,
    range_assign,
    roundrobin_assign,
)

TP = {"t1": 6, "t2": 3}


def test_range_assignor_contiguous_split():
    members = {"m1": ["t1"], "m2": ["t1"]}
    out = range_assign(members, {"t1": 5})
    assert out["m1"]["t1"] == [0, 1, 2]  # first member gets the remainder
    assert out["m2"]["t1"] == [3, 4]


def test_roundrobin_assignor_deals_alternately():
    members = {"m1": ["t1", "t2"], "m2": ["t1"]}
    out = roundrobin_assign(members, {"t1": 4, "t2": 2})
    all_pairs = {(t, p) for a in out.values() for t, ps in a.items() for p in ps}
    assert all_pairs == {("t1", 0), ("t1", 1), ("t1", 2), ("t1", 3), ("t2", 0), ("t2", 1)}
    assert out["m2"].get("t2") is None  # m2 never gets unsubscribed topics


def test_full_join_sync_lifecycle():
    g = GroupCoordinator("g", TP)
    r1 = g.join_group(None, {"range": ["t1"]})
    assert r1["is_leader"] and r1["generation"] == 1
    assert g.state == GroupState.COMPLETING_REBALANCE
    assign = g.sync_group(r1["member_id"], 1)
    assert g.state == GroupState.STABLE
    assert assign == {"t1": [0, 1, 2, 3, 4, 5]}  # sole member owns everything


def test_second_member_triggers_rebalance_and_split():
    g = GroupCoordinator("g", TP)
    r1 = g.join_group(None, {"range": ["t1"]})
    g.sync_group(r1["member_id"], 1)
    # new joiner → PreparingRebalance; old member must rejoin
    r2 = g.join_group(None, {"range": ["t1"]})
    assert g.state == GroupState.PREPARING_REBALANCE
    assert g.heartbeat(r1["member_id"], 1) == "REBALANCE_IN_PROGRESS"
    r1b = g.join_group(r1["member_id"], {"range": ["t1"]})
    assert r1b["generation"] == 2
    a1 = g.sync_group(r1["member_id"], 2)
    a2 = g.sync_group(r2["member_id"], 2)
    owned = sorted(a1.get("t1", []) + a2.get("t1", []))
    assert owned == [0, 1, 2, 3, 4, 5]  # disjoint cover
    assert set(a1["t1"]).isdisjoint(a2["t1"])


def test_protocol_vote_intersection():
    g = GroupCoordinator("g", TP)
    r1 = g.join_group(None, {"range": ["t1"], "roundrobin": ["t1"]})
    g.join_group(None, {"roundrobin": ["t1"]})
    g.join_group(r1["member_id"], {"range": ["t1"], "roundrobin": ["t1"]})
    assert g.protocol == "roundrobin"  # only protocol all members support


def test_no_common_protocol_rejected():
    g = GroupCoordinator("g", TP)
    g.join_group(None, {"range": ["t1"]})
    with pytest.raises(CoordinatorError) as e:
        g.join_group(None, {"sticky": ["t1"]})
    assert e.value.code == "INCONSISTENT_GROUP_PROTOCOL"


def test_illegal_generation_and_unknown_member():
    g = GroupCoordinator("g", TP)
    r = g.join_group(None, {"range": ["t1"]})
    with pytest.raises(CoordinatorError) as e:
        g.heartbeat(r["member_id"], 99)
    assert e.value.code == "ILLEGAL_GENERATION"
    with pytest.raises(CoordinatorError) as e:
        g.sync_group("ghost", 1)
    assert e.value.code == "UNKNOWN_MEMBER_ID"


def test_leader_failover_on_leave():
    g = GroupCoordinator("g", TP)
    r1 = g.join_group(None, {"range": ["t1"]})
    g.sync_group(r1["member_id"], 1)
    r2 = g.join_group(None, {"range": ["t1"]})
    g.join_group(r1["member_id"], {"range": ["t1"]})
    g.sync_group(r1["member_id"], 2)
    g.leave_group(r1["member_id"])
    assert g.leader == r2["member_id"]
    assert g.state == GroupState.PREPARING_REBALANCE
    r2b = g.join_group(r2["member_id"], {"range": ["t1"]})
    assert r2b["generation"] == 3
    a = g.sync_group(r2["member_id"], 3)
    assert a["t1"] == [0, 1, 2, 3, 4, 5]


def test_session_expiry_sweep():
    g = GroupCoordinator("g", TP)
    r1 = g.join_group(None, {"range": ["t1"]}, session_timeout_s=0.01)
    g.sync_group(r1["member_id"], 1)
    import time

    time.sleep(0.05)
    dead = g.expire_members()
    assert dead == [r1["member_id"]]
    assert g.state == GroupState.EMPTY and g.generation == 1


def test_group_manager_lifecycle():
    mgr = GroupManager(TP)
    g = mgr.get("g1")
    r = g.join_group(None, {"range": ["t1"]})
    assert mgr.list_groups() == [{"group_id": "g1", "state": "CompletingRebalance"}]
    with pytest.raises(CoordinatorError) as e:
        mgr.delete_group("g1")
    assert e.value.code == "NON_EMPTY_GROUP"
    g.leave_group(r["member_id"])
    mgr.delete_group("g1")
    assert mgr.list_groups() == []


def test_empty_group_rejoin_after_death():
    mgr = GroupManager(TP)
    g = mgr.get("g1")
    r = g.join_group(None, {"range": ["t1"]})
    g.leave_group(r["member_id"])
    mgr.delete_group("g1")
    g2 = mgr.get("g1")  # recreated fresh
    assert g2.state == GroupState.EMPTY


def test_describe_groups_and_find_coordinator():
    from redpanda_spark.operators.coordinator import GroupManager

    mgr = GroupManager({"t": 4})
    g = mgr.get("g1")
    r1 = g.join_group(None, {"range": ["t"]})
    r2 = g.join_group(None, {"range": ["t"]})
    r1b = g.join_group(r1["member_id"], {"range": ["t"]})
    g.sync_group(r1["member_id"], r1b["generation"])
    g.sync_group(r2["member_id"], r1b["generation"])
    desc = mgr.describe_groups(["g1", "missing"])
    assert len(desc) == 1
    d = desc[0]
    assert d["group_id"] == "g1" and d["state"] == "Stable"
    assert {m["member_id"] for m in d["members"]} == {r1["member_id"], r2["member_id"]}
    assert mgr.find_coordinator("g1") == 0
    assert 0 <= mgr.find_coordinator("g1", n_coordinators=8) < 8


def test_group_manager_recovers_stable_group_from_engine(spark, tmp_path):
    """Kill the coordinator mid-Stable and reconstruct it over the same
    engine: generation, protocol, leader, membership and assignments all
    survive (group_recovery_consumer.cc replay parity)."""
    from redpanda_spark.engine import TopicConfig, TopicEngine

    engine = TopicEngine(spark, str(tmp_path / "topics"))
    engine.create_topic("t", TopicConfig(partitions=6))

    mgr = GroupManager({"t": 6}, engine=engine)
    g = mgr.get("g1")
    r1 = g.join_group(None, {"range": ["t"]})
    r2 = g.join_group(None, {"range": ["t"]})
    r1b = g.join_group(r1["member_id"], {"range": ["t"]})
    gen = r1b["generation"]
    a_leader = g.sync_group(r1["member_id"], gen)
    a_follower = g.sync_group(r2["member_id"], gen)
    assert g.state == GroupState.STABLE

    # coordinator dies; a new one replays the _groups table
    mgr2 = GroupManager({"t": 6}, engine=engine)
    g2 = mgr2.get("g1")
    assert g2.state == GroupState.STABLE
    assert g2.generation == gen
    assert g2.protocol == "range"
    assert g2.leader == r1["member_id"]
    assert set(g2.members) == {r1["member_id"], r2["member_id"]}
    assert g2.sync_group(r1["member_id"], gen) == a_leader
    assert g2.sync_group(r2["member_id"], gen) == a_follower
    # recovered members are live: heartbeat at the recovered generation works
    assert g2.heartbeat(r1["member_id"], gen) == "NONE"
    # and the FSM continues: a new member triggers the next rebalance
    r3 = g2.join_group(None, {"range": ["t"]})
    assert g2.state == GroupState.PREPARING_REBALANCE
    assert r3["member_id"] not in (r1["member_id"], r2["member_id"])


def test_group_manager_recovery_after_member_departure(spark, tmp_path):
    """Departure checkpoints too: a member that left before the crash must
    not resurrect on recovery."""
    from redpanda_spark.engine import TopicConfig, TopicEngine

    engine = TopicEngine(spark, str(tmp_path / "topics"))
    engine.create_topic("t", TopicConfig(partitions=4))
    mgr = GroupManager({"t": 4}, engine=engine)
    g = mgr.get("g1")
    r1 = g.join_group(None, {"range": ["t"]})
    r2 = g.join_group(None, {"range": ["t"]})
    g.join_group(r1["member_id"], {"range": ["t"]})
    g.sync_group(r1["member_id"], 2)
    g.leave_group(r2["member_id"])

    mgr2 = GroupManager({"t": 4}, engine=engine)
    g2 = mgr2.get("g1")
    assert set(g2.members) == {r1["member_id"]}
    assert g2.state == GroupState.PREPARING_REBALANCE  # departure forced one


def test_deleted_group_stays_dead_across_recovery(spark, tmp_path):
    from redpanda_spark.engine import TopicConfig, TopicEngine

    engine = TopicEngine(spark, str(tmp_path / "topics"))
    engine.create_topic("t", TopicConfig(partitions=2))
    mgr = GroupManager({"t": 2}, engine=engine)
    g = mgr.get("g1")
    r = g.join_group(None, {"range": ["t"]})
    g.sync_group(r["member_id"], 1)
    g.leave_group(r["member_id"])
    mgr.delete_group("g1")

    mgr2 = GroupManager({"t": 2}, engine=engine)
    assert mgr2.list_groups() == []


def test_sticky_assignor_balance_and_coverage():
    from redpanda_spark.operators.coordinator import sticky_assign

    members = {"a": ["t1"], "b": ["t1"], "c": ["t1"]}
    out = sticky_assign(members, {"t1": 7})
    owned = sorted(p for a in out.values() for p in a.get("t1", []))
    assert owned == list(range(7))  # exact cover
    sizes = sorted(len(a.get("t1", [])) for a in out.values())
    assert sizes == [2, 2, 3]  # balanced within one


def test_sticky_assignor_keeps_prior_ownership():
    from redpanda_spark.operators.coordinator import sticky_assign

    members = {"a": ["t1"], "b": ["t1"]}
    prev = sticky_assign(members, {"t1": 6})
    # unchanged membership: identical assignment (full stickiness)
    again = sticky_assign(members, {"t1": 6}, prev)
    assert again == prev
    # a third member joins: survivors keep a balanced subset of their OWN
    # prior partitions — only the surplus moves
    members3 = {"a": ["t1"], "b": ["t1"], "c": ["t1"]}
    out = sticky_assign(members3, {"t1": 6}, prev)
    sizes = {m: len(a.get("t1", [])) for m, a in out.items()}
    assert sorted(sizes.values()) == [2, 2, 2]
    for m in ("a", "b"):
        kept = set(out[m].get("t1", [])) & set(prev[m].get("t1", []))
        assert len(kept) == 2  # every retained partition was already theirs
    # member leaves: the survivor keeps ALL its prior partitions
    out2 = sticky_assign({"a": ["t1"]}, {"t1": 6}, out)
    assert set(out["a"].get("t1", [])) <= set(out2["a"]["t1"])
    assert sorted(out2["a"]["t1"]) == list(range(6))


def test_sticky_assignor_subscription_validity():
    from redpanda_spark.operators.coordinator import sticky_assign

    # b unsubscribed from t1: its prior t1 partitions must move
    prev = {"a": {"t1": [0, 1]}, "b": {"t1": [2, 3]}}
    out = sticky_assign({"a": ["t1"], "b": ["t2"]}, {"t1": 4, "t2": 2}, prev)
    assert sorted(out["a"]["t1"]) == [0, 1, 2, 3]
    assert sorted(out["b"]["t2"]) == [0, 1]


def test_group_lifecycle_with_sticky_protocol():
    g = GroupCoordinator("gs", TP)
    r1 = g.join_group(None, {"sticky": ["t1"]})
    g.sync_group(r1["member_id"], 1)
    a1_gen1 = dict(g.members[r1["member_id"]].assignment)
    r2 = g.join_group(None, {"sticky": ["t1"]})
    g.join_group(r1["member_id"], {"sticky": ["t1"]})
    a1 = g.sync_group(r1["member_id"], 2)
    a2 = g.sync_group(r2["member_id"], 2)
    assert g.protocol == "sticky"
    owned = sorted(a1.get("t1", []) + a2.get("t1", []))
    assert owned == [0, 1, 2, 3, 4, 5]
    # member 1 only kept partitions it already had (sticky, not reshuffle)
    assert set(a1["t1"]) <= set(a1_gen1["t1"])


def _stable_static_pair(gid="gst"):
    """Two-member stable group: one static (instance id 'app-0'), one dynamic."""
    g = GroupCoordinator(gid, TP)
    r1 = g.join_group(None, {"range": ["t1"]}, group_instance_id="app-0")
    r2 = g.join_group(None, {"range": ["t1"]})
    g.join_group(r1["member_id"], {"range": ["t1"]}, group_instance_id="app-0")
    g.sync_group(r1["member_id"], g.generation)
    g.sync_group(r2["member_id"], g.generation)
    assert g.state == GroupState.STABLE
    return g, r1["member_id"], r2["member_id"]


def test_static_member_rejoin_keeps_generation_and_assignment():
    g, m1, m2 = _stable_static_pair()
    gen, prior = g.generation, dict(g.members[m1].assignment)
    # restart: same instance id, no member id — swapped in, NO rebalance
    r = g.join_group(None, {"range": ["t1"]}, group_instance_id="app-0")
    assert r["member_id"] != m1
    assert g.generation == gen and g.state == GroupState.STABLE
    assert g.sync_group(r["member_id"], gen) == prior
    # the old incarnation's member id is dead
    with pytest.raises(CoordinatorError, match="UNKNOWN_MEMBER_ID"):
        g.heartbeat(m1, gen)


def test_static_member_zombie_fenced():
    g, m1, _ = _stable_static_pair("gst2")
    with pytest.raises(CoordinatorError, match="FENCED_INSTANCE_ID"):
        g.join_group("not-the-bound-id", {"range": ["t1"]}, group_instance_id="app-0")
    # binding survives a failed fence attempt
    assert g.members[m1].group_instance_id == "app-0"


def test_static_rejoin_with_changed_subscription_rebalances():
    g, _, _ = _stable_static_pair("gst3")
    gen = g.generation
    g.join_group(None, {"range": ["t1", "t2"]}, group_instance_id="app-0")
    assert g.state == GroupState.PREPARING_REBALANCE
    assert g.generation == gen  # bumps once the dynamic member rejoins


def test_static_leader_rejoin_retains_leadership():
    g = GroupCoordinator("gst4", TP)
    r1 = g.join_group(None, {"range": ["t1"]}, group_instance_id="app-0")
    g.sync_group(r1["member_id"], 1)
    r = g.join_group(None, {"range": ["t1"]}, group_instance_id="app-0")
    assert r["is_leader"] and g.leader == r["member_id"]


def test_remove_static_member_rebalances():
    g, _, m2 = _stable_static_pair("gst5")
    g.remove_static_member("app-0")
    assert set(g.members) == {m2}
    assert g.state == GroupState.PREPARING_REBALANCE
    with pytest.raises(CoordinatorError, match="UNKNOWN_MEMBER_ID"):
        g.remove_static_member("app-0")


def test_static_binding_survives_snapshot_restore():
    g, m1, _ = _stable_static_pair("gst6")
    g2 = GroupCoordinator.restore(g.snapshot(), TP)
    gen = g2.generation
    r = g2.join_group(None, {"range": ["t1"]}, group_instance_id="app-0")
    assert r["member_id"] != m1
    assert g2.generation == gen and g2.state == GroupState.STABLE


# -- KIP-429 cooperative (incremental) rebalancing --------------------------


def _owned(g):
    """{(topic, partition): member} across the group; asserts no dupes."""
    seen = {}
    for mid, m in g.members.items():
        for t, parts in m.assignment.items():
            for p in parts:
                assert (t, p) not in seen, f"double-owned {(t, p)}"
                seen[(t, p)] = mid
    return seen


def test_cooperative_sticky_two_phase_rebalance():
    g = GroupCoordinator("cg", {"t": 4})
    ra = g.join_group(None, {"cooperative-sticky": ["t"]})
    a_id = ra["member_id"]
    a1 = g.sync_group(a_id, ra["generation"])
    assert a1 == {"t": [0, 1, 2, 3]}

    # B joins -> phase 1: partitions moving A->B are assigned to NEITHER
    rb = g.join_group(None, {"cooperative-sticky": ["t"]})
    b_id = rb["member_id"]
    ra2 = g.join_group(a_id, {"cooperative-sticky": ["t"]})
    gen2 = ra2["generation"]
    a2 = g.sync_group(a_id, gen2)
    b2 = g.sync_group(b_id, gen2)
    owned = _owned(g)  # never double-owned
    kept = sorted(a2.get("t", []))
    assert len(kept) == 2 and set(kept) <= {0, 1, 2, 3}  # A keeps 2, revokes 2
    assert b2 == {}  # B waits for the follow-up grant
    assert len(owned) == 2

    # heartbeat triggers phase 2; both rejoin; target reached
    assert g.heartbeat(a_id, gen2) == "REBALANCE_IN_PROGRESS"
    g.join_group(a_id, {"cooperative-sticky": ["t"]})
    rb3 = g.join_group(b_id, {"cooperative-sticky": ["t"]})
    gen3 = rb3["generation"]  # generation advances when the last member rejoins
    a3 = g.sync_group(a_id, gen3)
    b3 = g.sync_group(b_id, gen3)
    assert sorted(a3["t"]) == kept  # unchanged member keeps its partitions
    assert sorted(b3["t"]) == sorted(set(range(4)) - set(kept))
    assert len(_owned(g)) == 4
    # settled: no further follow-up
    assert g.heartbeat(a_id, gen3) == "NONE"


def test_cooperative_no_followup_when_nothing_moves():
    g = GroupCoordinator("cg2", {"t": 2})
    r = g.join_group(None, {"cooperative-sticky": ["t"]})
    g.sync_group(r["member_id"], r["generation"])
    # rejoin with the same single member: same target, nothing withheld
    r2 = g.join_group(r["member_id"], {"cooperative-sticky": ["t"]})
    out = g.sync_group(r["member_id"], r2["generation"])
    assert out == {"t": [0, 1]}
    assert g.heartbeat(r["member_id"], r2["generation"]) == "NONE"


def test_cooperative_followup_survives_restart():
    store = {}

    def persist(snap):
        store["snap"] = snap

    g = GroupCoordinator("cg3", {"t": 2}, persist=persist)
    ra = g.join_group(None, {"cooperative-sticky": ["t"]})
    a_id = ra["member_id"]
    g.sync_group(a_id, ra["generation"])
    rb = g.join_group(None, {"cooperative-sticky": ["t"]})
    b_id = rb["member_id"]
    ra2 = g.join_group(a_id, {"cooperative-sticky": ["t"]})
    g.sync_group(a_id, ra2["generation"])
    g.sync_group(b_id, ra2["generation"])

    g2 = GroupCoordinator.restore(store["snap"].snapshot(), {"t": 2}, persist=persist)
    # the pending follow-up was persisted: first heartbeat re-triggers it
    assert g2._coop_followup is True


def test_rejoin_during_completing_is_noop_no_livelock():
    """r9 regression: a known member re-joining with unchanged protocols
    while the group is COMPLETING_REBALANCE must get the CURRENT
    generation back (Kafka's no-op rejoin) — restarting the rebalance
    there lets two members' alternating join/sync retries bump the
    generation forever without anyone syncing."""
    g = GroupCoordinator("g", TP)
    r1 = g.join_group(None, {"range": ["t1"]})
    m1 = r1["member_id"]
    r2 = g.join_group(None, {"range": ["t1"]})
    m2 = r2["member_id"]
    # m1 rejoins to complete the bumped generation
    r1b = g.join_group(m1, {"range": ["t1"]})
    gen = r1b["generation"]
    assert g.state is GroupState.COMPLETING_REBALANCE
    # follower sync races ahead of the leader: told to retry
    with pytest.raises(CoordinatorError, match="REBALANCE_IN_PROGRESS"):
        g.sync_group(m2, gen)
    # the follower's retry loop re-joins — must NOT restart the rebalance
    r2b = g.join_group(m2, {"range": ["t1"]})
    assert r2b["generation"] == gen
    assert g.state is GroupState.COMPLETING_REBALANCE
    # heartbeats during COMPLETING say rebalance (Kafka), not NONE
    assert g.heartbeat(m1, gen) == "REBALANCE_IN_PROGRESS"
    # leader syncs; the raced follower then syncs and gets its partitions
    a1 = g.sync_group(m1 if r1b["is_leader"] else m2, gen)
    a2 = g.sync_group(m2 if r1b["is_leader"] else m1, gen)
    assert g.state is GroupState.STABLE
    got = sorted(a1.get("t1", []) + a2.get("t1", []))
    assert got == list(range(TP["t1"]))


def test_sync_omitted_member_gets_empty_assignment():
    """r9 regression: a member the leader's assignment map omits must end
    the generation with an EMPTY assignment (Kafka), never a stale
    carried-over one that double-owns partitions."""
    g = GroupCoordinator("g", TP)
    m1 = g.join_group(None, {"range": ["t1"]})["member_id"]
    gen = g.join_group(m1, {"range": ["t1"]})["generation"]
    g.sync_group(m1, gen)
    # second member joins; both rejoin; leader assigns EVERYTHING to
    # itself, omitting the follower from the map
    m2 = g.join_group(None, {"range": ["t1"]})["member_id"]
    gen = g.join_group(m1, {"range": ["t1"]})["generation"]
    g.join_group(m2, {"range": ["t1"]})
    all_parts = {"t1": list(range(TP["t1"]))}
    a1 = g.sync_group(m1, gen, assignments={m1: all_parts})
    assert a1 == all_parts
    assert g.sync_group(m2, gen) == {}  # not the stale previous split


def test_bulk_range_assignment_matches_driver_assignor(spark):
    """The Spark bulk range assignor must equal `range_assign` (the
    coordinator's driver-side computation) on randomized multi-group
    configurations — members, topic sets, partition counts, and partial
    subscriptions all varied under a fixed seed."""
    import random

    from redpanda_spark.operators.coordinator import (
        bulk_range_assignment,
        range_assign,
    )

    rng = random.Random(1337)
    topics = {f"t{i}": rng.randint(1, 9) for i in range(6)}
    groups = {}
    for g in range(8):
        members = {
            f"m{j:02d}": sorted(
                t for t in topics if rng.random() < 0.7
            )
            for j in range(rng.randint(1, 7))
        }
        groups[f"g{g}"] = {m: ts for m, ts in members.items() if ts}
    expected = set()
    for gid, members in groups.items():
        if not members:
            continue
        for m, per_topic in range_assign(members, topics).items():
            for t, parts in per_topic.items():
                for p in parts:
                    expected.add((gid, t, m, p))
    subs = spark.createDataFrame(
        [
            (gid, m, t)
            for gid, members in groups.items()
            for m, ts in members.items()
            for t in ts
        ],
        "group_id string, member_id string, topic string",
    )
    tp = spark.createDataFrame(
        list(topics.items()), "topic string, n_partitions int"
    )
    got = {
        (r["group_id"], r["topic"], r["member_id"], r["partition"])
        for r in bulk_range_assignment(subs, tp).collect()
    }
    assert got == expected


def test_bulk_roundrobin_assignment_matches_driver_assignor(spark):
    """The Spark bulk roundrobin assignor must equal `roundrobin_assign`
    for its declared scope: uniform subscription (every member of a
    group subscribes the group's whole topic set)."""
    import random

    from redpanda_spark.operators.coordinator import (
        bulk_roundrobin_assignment,
        roundrobin_assign,
    )

    rng = random.Random(4242)
    topics = {f"t{i}": rng.randint(1, 8) for i in range(5)}
    expected = set()
    gt_rows, gm_rows = [], []
    for g in range(7):
        gid = f"g{g}"
        gtopics = sorted(t for t in topics if rng.random() < 0.8) or ["t0"]
        members = [f"m{j}" for j in range(rng.randint(1, 6))]
        gt_rows += [(gid, t) for t in gtopics]
        gm_rows += [(gid, m) for m in members]
        uniform = {m: gtopics for m in members}
        gparts = {t: topics[t] for t in gtopics}
        for m, per_topic in roundrobin_assign(uniform, gparts).items():
            for t, parts in per_topic.items():
                for p in parts:
                    expected.add((gid, t, m, p))
    got = {
        (r["group_id"], r["topic"], r["member_id"], r["partition"])
        for r in bulk_roundrobin_assignment(
            spark.createDataFrame(gt_rows, "group_id string, topic string"),
            spark.createDataFrame(gm_rows, "group_id string, member_id string"),
            spark.createDataFrame(
                list(topics.items()), "topic string, n_partitions int"
            ),
        ).collect()
    }
    assert got == expected
