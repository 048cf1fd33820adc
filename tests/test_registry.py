"""Schema-registry tests mirroring the reference's compatibility matrix
(`pandaproxy/schema_registry`: avro.cc / compatibility.cc test cases)."""

from __future__ import annotations

import json

import pytest

from redpanda_spark.registry import CompatibilityError, SchemaRegistry


def avro_record(fields):
    return json.dumps(
        {"type": "record", "name": "R", "fields": fields}
    )


V1 = avro_record([{"name": "a", "type": "int"}])
V2_ADD_DEFAULT = avro_record(
    [{"name": "a", "type": "int"}, {"name": "b", "type": "string", "default": "x"}]
)
V2_ADD_NO_DEFAULT = avro_record(
    [{"name": "a", "type": "int"}, {"name": "b", "type": "string"}]
)
V2_PROMOTE = avro_record([{"name": "a", "type": "long"}])
V2_NARROW = avro_record([{"name": "a", "type": "string"}])


def test_register_and_lookup():
    r = SchemaRegistry()
    sid = r.register("events-value", V1)
    assert r.get_by_id(sid).schema == V1
    assert r.get_latest("events-value").version == 1
    assert r.versions("events-value") == [1]
    # identical re-registration returns same id, no new version
    assert r.register("events-value", V1) == sid
    assert r.versions("events-value") == [1]


def test_backward_compat_add_field_with_default_ok():
    r = SchemaRegistry()  # global default BACKWARD
    r.register("s", V1)
    r.register("s", V2_ADD_DEFAULT)
    assert r.versions("s") == [1, 2]


def test_backward_compat_add_field_without_default_rejected():
    r = SchemaRegistry()
    r.register("s", V1)
    with pytest.raises(CompatibilityError):
        r.register("s", V2_ADD_NO_DEFAULT)


def test_type_promotion_backward_ok_forward_rejected():
    r = SchemaRegistry()
    r.register("s", V1)
    r.register("s", V2_PROMOTE)  # int→long readable by new reader
    r2 = SchemaRegistry()
    r2.set_compatibility("FORWARD")
    r2.register("s", V1)
    with pytest.raises(CompatibilityError):
        r2.register("s", V2_PROMOTE)  # old reader (int) can't read long


def test_incompatible_type_change_rejected():
    r = SchemaRegistry()
    r.register("s", V1)
    with pytest.raises(CompatibilityError):
        r.register("s", V2_NARROW)


def test_full_transitive_checks_all_versions():
    r = SchemaRegistry()
    r.set_compatibility("BACKWARD_TRANSITIVE", "s")
    r.register("s", V1)
    r.register("s", V2_ADD_DEFAULT)
    v3 = avro_record(
        [
            {"name": "a", "type": "int"},
            {"name": "b", "type": "string", "default": "x"},
            {"name": "c", "type": "int", "default": 0},
        ]
    )
    r.register("s", v3)
    assert r.versions("s") == [1, 2, 3]


def test_none_level_allows_anything():
    r = SchemaRegistry()
    r.set_compatibility("NONE", "s")
    r.register("s", V1)
    r.register("s", V2_NARROW)
    assert r.versions("s") == [1, 2]


def test_json_schema_compat():
    r = SchemaRegistry()
    old = json.dumps(
        {"type": "object", "properties": {"x": {"type": "integer"}}, "required": ["x"]}
    )
    new_ok = json.dumps(
        {
            "type": "object",
            "properties": {"x": {"type": "integer"}, "y": {"type": "string"}},
            "required": ["x"],
        }
    )
    new_bad = json.dumps(
        {
            "type": "object",
            "properties": {"x": {"type": "integer"}, "y": {"type": "string"}},
            "required": ["x", "z"],
        }
    )
    r.register("j", old, "JSON")
    r.register("j", new_ok, "JSON")
    with pytest.raises(CompatibilityError):
        r.register("j", new_bad, "JSON")


def test_soft_delete_and_subjects():
    r = SchemaRegistry()
    r.register("s1", V1)
    r.register("s2", V1)
    assert sorted(r.subjects()) == ["s1", "s2"]
    r.delete_subject("s2")
    assert r.subjects() == ["s1"]
    with pytest.raises(KeyError):
        r.get_latest("s2")


def test_wire_format_validation():
    r = SchemaRegistry()
    sid = r.register("t-value", V1)
    good = SchemaRegistry.wire_encode(sid, b"payload")
    assert r.validate_wire_bytes(good, "t-value")
    assert not r.validate_wire_bytes(good, "other-value")  # wrong subject
    assert not r.validate_wire_bytes(b"\x01" + good[1:], "t-value")  # bad magic
    assert not r.validate_wire_bytes(b"\x00\x00", "t-value")  # truncated
    assert not r.validate_wire_bytes(
        SchemaRegistry.wire_encode(9999, b"x"), "t-value"
    )  # unknown id


def test_persistence_roundtrip(tmp_path):
    p = str(tmp_path / "reg.json")
    r = SchemaRegistry(p)
    sid = r.register("s", V1)
    r2 = SchemaRegistry(p)
    assert r2.get_by_id(sid).schema == V1
    assert r2.versions("s") == [1]


def test_schema_id_produce_validation(spark, tmp_path):
    """Broker-side schema-id gate (produce.cc:360-362): batches whose
    values lack a registered wire-format id are rejected atomically."""
    import pytest
    from pyspark.sql import Row

    from redpanda_spark.engine import ProduceError, TopicConfig, TopicEngine
    from redpanda_spark.registry.store import SchemaRegistry

    reg = SchemaRegistry()
    sid = reg.register("t-value", '{"type": "record", "name": "r", "fields": []}')
    eng = TopicEngine(spark, str(tmp_path / "topics"), registry=reg)
    eng.create_topic("t", TopicConfig(partitions=1, value_schema_subject="t-value"))

    good = SchemaRegistry.wire_encode(sid, b"payload")
    ok_batch = spark.createDataFrame(
        [Row(key=None, value=good, partition=0), Row(key=None, value=None, partition=0)],
        "key binary, value binary, partition int",
    )
    eng.produce("t", ok_batch)  # tombstones + valid ids pass
    assert eng.log("t").count() == 2

    for bad in (b"raw-bytes", b"\x01" + sid.to_bytes(4, "big") + b"x",
                SchemaRegistry.wire_encode(sid + 999, b"x"), b"\x00\x00"):
        batch = spark.createDataFrame(
            [Row(key=None, value=bad, partition=0)],
            "key binary, value binary, partition int",
        )
        with pytest.raises(ProduceError):
            eng.produce("t", batch)
    assert eng.log("t").count() == 2  # nothing leaked from rejected batches
