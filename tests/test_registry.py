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


# -- protobuf field-number compatibility -----------------------------------
# Scenario shapes mirror the reference's
# `pandaproxy/schema_registry/test/compatibility_protobuf.cc`.


def _proto_compat(old, new, level):
    from redpanda_spark.registry.store import test_compatibility

    return test_compatibility(old, new, "PROTOBUF", level)[0]


def test_protobuf_wire_group_compat():
    p = 'syntax = "proto3"; message Test { %s id = 1; }'
    # same wire/semantic group: compatible both ways
    for a, b in [("int32", "uint32"), ("int32", "uint64"), ("int32", "bool"),
                 ("sint32", "sint64"), ("string", "bytes"),
                 ("fixed32", "sfixed32"), ("fixed64", "sfixed64")]:
        assert _proto_compat(p % a, p % b, "FULL"), (a, b)
    # cross-group: incompatible
    for a, b in [("int32", "string"), ("int32", "fixed32"),
                 ("fixed32", "fixed64"), ("float", "double")]:
        assert not _proto_compat(p % a, p % b, "BACKWARD"), (a, b)
        assert not _proto_compat(p % a, p % b, "FORWARD"), (a, b)


def test_protobuf_rename_and_add_field_compatible():
    old = 'syntax = "proto3"; message Simple { string id = 1; }'
    renamed = 'syntax = "proto3"; message Simple { string identifier = 1; }'
    added = 'syntax = "proto3"; message Simple { string id = 1; string name = 2; }'
    assert _proto_compat(old, renamed, "FULL")
    assert _proto_compat(old, added, "FULL")


def test_protobuf_message_added_removed():
    one = 'syntax = "proto3"; message Simple { string id = 1; }'
    two = ('syntax = "proto3"; message Simple { string id = 1; } '
           'message Simple2 { int64 id = 1; }')
    # new schema adds a message: backward ok, forward not (old reader lacks it)
    assert _proto_compat(one, two, "BACKWARD")
    assert not _proto_compat(one, two, "FORWARD")
    # new schema removes a message: backward incompatible
    assert not _proto_compat(two, one, "BACKWARD")


def test_protobuf_nested_named_type_change():
    a = ('syntax = "proto3"; message Outer { message Inner { int32 id = 1; } '
         'message Inner2 { int32 id = 1; } Inner x = 1; }')
    b = ('syntax = "proto3"; message Outer { message Inner { int32 id = 1; } '
         'message Inner2 { int32 id = 1; } Inner2 x = 1; }')
    assert not _proto_compat(a, b, "BACKWARD")
    assert _proto_compat(a, a, "FULL")


def test_protobuf_required_field_rules():
    base = 'syntax = "proto2"; message Simple { optional int32 id = 1; }'
    with_req = ('syntax = "proto2"; message Simple { optional int32 id = 1; '
                'required int32 new_id = 2; }')
    with_opt = ('syntax = "proto2"; message Simple { optional int32 id = 1; '
                'optional int32 new_id = 2; }')
    reserved = 'syntax = "proto2"; message Simple { optional int32 id = 1; reserved 2; }'
    # adding/removing a required field is incompatible either way
    assert not _proto_compat(base, with_req, "BACKWARD")
    assert not _proto_compat(with_req, base, "BACKWARD")
    # making a required field reserved (and the reverse) is incompatible
    assert not _proto_compat(with_req, reserved, "BACKWARD")
    assert not _proto_compat(reserved, with_req, "BACKWARD")
    # the same dance with optional fields is fine
    assert _proto_compat(with_opt, reserved, "BACKWARD")
    assert _proto_compat(reserved, with_opt, "BACKWARD")
    assert _proto_compat(base, with_opt, "FULL")


def test_protobuf_oneof_rules():
    plain_one = 'syntax = "proto3"; message Simple { int32 id = 1; }'
    oneof_one = 'syntax = "proto3"; message Simple { oneof wrapper { int32 id = 1; } }'
    plain_two = 'syntax = "proto3"; message Simple { int32 id = 1; int32 new_id = 2; }'
    oneof_two = ('syntax = "proto3"; message Simple { oneof wrapper '
                 '{ int32 id = 1; int32 new_id = 2; } }')
    # moving one existing field into a oneof: backward-compatible
    assert _proto_compat(plain_one, oneof_one, "BACKWARD")
    # moving two existing fields into one oneof: incompatible
    assert not _proto_compat(plain_two, oneof_two, "BACKWARD")


def test_protobuf_recursive_and_packaged_types():
    recursive = ('syntax = "proto3"; package recursive; '
                 'message Payload { oneof payload { .recursive.Message message = 1; } } '
                 'message Message { string rule_name = 1; .recursive.Payload payload = 2; }')
    assert _proto_compat(recursive, recursive, "FULL")


def test_protobuf_registry_rejects_incompatible_register(tmp_path):
    import pytest

    from redpanda_spark.registry.store import CompatibilityError, SchemaRegistry

    reg = SchemaRegistry()
    reg.register("p-value", 'syntax = "proto3"; message T { int32 id = 1; }',
                 schema_type="PROTOBUF")
    with pytest.raises(CompatibilityError):
        reg.register("p-value", 'syntax = "proto3"; message T { string id = 1; }',
                     schema_type="PROTOBUF")
    # wire-group-compatible evolution registers fine
    sid = reg.register("p-value", 'syntax = "proto3"; message T { uint64 id = 1; }',
                       schema_type="PROTOBUF")
    assert sid > 0


def test_protobuf_fields_after_enum_not_dropped():
    # Regression: _skip_to starting ON the enum's '{' used to count it into
    # depth and overshoot to the NEXT '}', silently dropping every field
    # declared after an enum block.
    from redpanda_spark.registry.protobuf_compat import parse_proto

    src = ('syntax = "proto3"; message M { enum E { A = 0; B = 1; } '
           'int32 id = 1; string name = 2; }')
    schema = parse_proto(src)
    m = schema.messages["M"]
    assert set(m.fields) == {1, 2}, m.fields
    assert "M.E" in schema.enums
    # and the compat gate actually sees those fields now
    incompat = ('syntax = "proto3"; message M { enum E { A = 0; B = 1; } '
                'int32 id = 1; fixed64 name = 2; }')
    assert not _proto_compat(src, incompat, "BACKWARD")
    assert not _proto_compat(src, incompat, "FORWARD")
    # nested message after an enum survives too
    nested = ('syntax = "proto3"; message M { enum E { A = 0; } '
              'message Inner { string s = 1; } Inner inner = 3; }')
    s2 = parse_proto(nested)
    assert "M.Inner" in s2.messages
    assert 3 in s2.messages["M"].fields


ADDR = json.dumps(
    {
        "type": "record",
        "name": "Address",
        "fields": [
            {"name": "city", "type": "string"},
            {"name": "zip", "type": "string"},
        ],
    }
)
PERSON = json.dumps(
    {
        "type": "record",
        "name": "Person",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "home", "type": "Address"},
            {"name": "work", "type": ["null", "Address"]},
        ],
    }
)


def test_schema_references_register_and_resolve():
    reg = SchemaRegistry()
    reg.register("address", ADDR)
    sid = reg.register(
        "person",
        PERSON,
        references=[{"name": "Address", "subject": "address", "version": 1}],
    )
    v = reg.get_by_id(sid)
    assert v.references == [{"name": "Address", "subject": "address", "version": 1}]
    resolved = json.loads(reg.resolved_schema(v))
    # first use inlined, second use stays a name (define-once Avro rule)
    assert resolved["fields"][1]["type"]["name"] == "Address"
    assert resolved["fields"][2]["type"] == ["null", "Address"]

    # the resolved schema actually drives the codec end-to-end
    from redpanda_spark.registry.avro_codec import avro_decode, avro_encode

    datum = {
        "name": "ada",
        "home": {"city": "x", "zip": "1"},
        "work": {"city": "y", "zip": "2"},
    }
    payload = avro_encode(reg.resolved_schema(v), datum)
    assert avro_decode(reg.resolved_schema(v), payload) == datum


def test_schema_references_must_exist():
    reg = SchemaRegistry()
    with pytest.raises(KeyError):
        reg.register(
            "person",
            PERSON,
            references=[{"name": "Address", "subject": "address", "version": 1}],
        )


def test_referenced_version_is_undeletable():
    reg = SchemaRegistry()
    reg.register("address", ADDR)
    sid = reg.register(
        "person",
        PERSON,
        references=[{"name": "Address", "subject": "address", "version": 1}],
    )
    assert reg.referenced_by("address", 1) == [sid]
    with pytest.raises(CompatibilityError, match="referenced by"):
        reg.delete_version("address", 1)
    with pytest.raises(CompatibilityError, match="referenced by"):
        reg.delete_subject("address")
    # dropping the referencing subject releases the guard
    reg.delete_subject("person")
    assert reg.referenced_by("address", 1) == []
    reg.delete_subject("address")
    assert "address" not in reg.subjects()


def test_schema_references_persistence(tmp_path):
    p = str(tmp_path / "reg.json")
    reg = SchemaRegistry(p)
    reg.register("address", ADDR)
    reg.register(
        "person",
        PERSON,
        references=[{"name": "Address", "subject": "address", "version": 1}],
    )
    reg2 = SchemaRegistry(p)
    v = reg2.get_latest("person")
    assert v.references and v.references[0]["name"] == "Address"
    assert json.loads(reg2.resolved_schema(v))["fields"][1]["type"]["name"] == "Address"


# -- operating mode (api-doc/schema_registry.json /mode, types.h:50-54) ----


def test_mode_readonly_gates_writes():
    from redpanda_spark.registry import ModeError

    reg = SchemaRegistry()
    reg.register("s", V1)
    assert reg.get_mode() == "READWRITE"
    reg.set_mode("READONLY")
    with pytest.raises(ModeError, match="READONLY"):
        reg.register("s", V2_ADD_DEFAULT)
    with pytest.raises(ModeError, match="READONLY"):
        reg.delete_version("s", 1)
    with pytest.raises(ModeError, match="READONLY"):
        reg.delete_subject("s")
    with pytest.raises(ModeError, match="READONLY"):
        reg.set_compatibility("NONE")
    # reads stay open, and leaving READONLY is always possible
    assert reg.get_latest("s").version == 1
    reg.set_mode("READWRITE")
    reg.register("s", V2_ADD_DEFAULT)
    assert reg.get_latest("s").version == 2


def test_mode_subject_override_and_fallback():
    from redpanda_spark.registry import ModeError

    reg = SchemaRegistry()
    reg.set_mode("READONLY", subject="frozen")
    assert reg.get_mode("frozen") == "READONLY"
    assert reg.get_mode("other") == "READWRITE"
    with pytest.raises(ModeError):
        reg.register("frozen", V1)
    reg.register("other", V1)  # unaffected
    reg.delete_mode("frozen")  # falls back to global
    reg.register("frozen", V1)
    with pytest.raises(ValueError, match="unknown mode"):
        reg.set_mode("BOGUS")


def test_mode_import_requires_explicit_id():
    from redpanda_spark.registry import ModeError

    reg = SchemaRegistry()
    reg.register("live", V1)  # takes id 1
    reg.set_mode("IMPORT", subject="mig")
    with pytest.raises(ModeError, match="IMPORT"):
        reg.register("mig", V1)  # no id -> rejected in IMPORT
    sid = reg.register("mig", V1, schema_id=100)
    assert sid == 100 and reg.get_by_id(100).subject == "mig"
    with pytest.raises(ValueError, match="already taken"):
        reg.register("mig", V2_ADD_DEFAULT, schema_id=1)
    # broker-assigned ids resume past the imported one
    assert reg.register("live", V2_ADD_DEFAULT) == 101
    # explicit ids are an IMPORT-only affordance
    with pytest.raises(ModeError, match="IMPORT"):
        reg.register("live", V2_PROMOTE, schema_id=200)


def test_mode_persistence(tmp_path):
    p = str(tmp_path / "reg.json")
    reg = SchemaRegistry(p)
    reg.set_mode("READONLY", subject="s")
    reg.set_mode("IMPORT")
    reg2 = SchemaRegistry(p)
    assert reg2.get_mode() == "IMPORT"
    assert reg2.get_mode("s") == "READONLY"


def test_mode_rest_endpoints(tmp_path):
    from redpanda_spark.rest import RestApp

    # registry-only surface: no engine/Spark needed for the mode routes
    app = RestApp.__new__(RestApp)
    app.registry = SchemaRegistry()
    import re as _re

    routes = [
        ("GET", r"^/mode$", app._get_mode),
        ("PUT", r"^/mode$", app._put_mode),
        ("GET", r"^/mode/([^/]+)$", app._get_mode_subject),
        ("PUT", r"^/mode/([^/]+)$", app._put_mode_subject),
        ("DELETE", r"^/mode/([^/]+)$", app._delete_mode_subject),
    ]

    def call(method, path, body=None):
        for m, pat, fn in routes:
            if m == method and _re.match(pat, path):
                g = _re.match(pat, path).groups()
                return fn(*g, body=body or {}, query={})
        raise AssertionError("no route")

    assert call("GET", "/mode") == (200, {"mode": "READWRITE"})
    assert call("PUT", "/mode", {"mode": "READONLY"}) == (200, {"mode": "READONLY"})
    assert call("GET", "/mode") == (200, {"mode": "READONLY"})
    assert call("PUT", "/mode/s", {"mode": "READWRITE"})[0] == 200
    assert call("GET", "/mode/s") == (200, {"mode": "READWRITE"})
    assert call("DELETE", "/mode/s")[0] == 200
    assert call("GET", "/mode/s") == (200, {"mode": "READONLY"})  # fallback


def test_rest_schema_lookup_and_deletes():
    """POST /subjects/{s} lookup + DELETE subject/version routes
    (api-doc post_subject / delete_subject)."""
    from redpanda_spark.rest import RestApp

    app = RestApp.__new__(RestApp)
    app.registry = SchemaRegistry()
    sid = app.registry.register("s", V1)
    app.registry.register("s", V2_ADD_DEFAULT)

    code, out = app._lookup_schema("s", {"schema": V1}, {})
    assert code == 200 and out["id"] == sid and out["version"] == 1
    # whitespace-insensitive lookup (canonical form)
    code, out = app._lookup_schema("s", {"schema": V1.replace(",", " , ")}, {})
    assert code == 200 and out["id"] == sid
    code, out = app._lookup_schema("s", {"schema": V2_PROMOTE}, {})
    assert code == 404 and out["error_code"] == 40403

    code, out = app._delete_version("s", "1", {}, {})
    assert code == 200
    assert app.registry.versions("s") == [2]
    code, out = app._delete_subject("s", {}, {})
    assert code == 200 and out == [2]
    assert app.registry.subjects() == []


def test_rest_id_lookups_and_compat_check():
    from redpanda_spark.rest import RestApp

    app = RestApp.__new__(RestApp)
    app.registry = SchemaRegistry()
    sid = app.registry.register("s", V1)
    code, out = app._id_versions(str(sid), {}, {})
    assert code == 200 and out == [{"subject": "s", "version": 1}]
    code, out = app._id_subjects(str(sid), {}, {})
    assert code == 200 and out == ["s"]
    code, out = app._compat_check("s", "latest", {"schema": V2_ADD_DEFAULT}, {})
    assert code == 200 and out == {"is_compatible": True}
    code, out = app._compat_check("s", "1", {"schema": V2_NARROW}, {})
    assert code == 200 and out == {"is_compatible": False}


def test_store_save_is_atomic_under_crash(tmp_path, monkeypatch):
    """A crash mid-save must leave the previous registry state intact:
    _save writes a tmp file and renames, so the target is never
    truncated (the reference's compacted-topic store is append-only and
    crash-safe; the file analog must match)."""
    import os as _os

    from redpanda_spark.registry.store import SchemaRegistry

    path = str(tmp_path / "registry.json")
    reg = SchemaRegistry(path)
    reg.register("s-value", '{"type": "string"}', "AVRO")
    before = open(path).read()

    real_replace = _os.replace

    def boom(src, dst):
        raise OSError("simulated crash before rename")

    # persistence now routes through the filesystem abstraction; the
    # atomic rename to crash lives in fsio (LocalFS.write_text_atomic)
    monkeypatch.setattr("redpanda_spark.fsio.os.replace", boom)
    try:
        reg.register("s2-value", '{"type": "int"}', "AVRO")
    except OSError:
        pass
    monkeypatch.setattr("redpanda_spark.fsio.os.replace", real_replace)

    # the durable file still holds the pre-crash state, parseable
    assert open(path).read() == before
    reloaded = SchemaRegistry(path)
    assert reloaded.get_latest("s-value").schema == '{"type": "string"}'


def test_fixed_size_change_rejected():
    """r9 regression: Avro resolution matches fixed only with the SAME
    name and size — a size change passed the old rt==wt fallthrough and
    would corrupt every decoded value."""
    import json

    import pytest

    from redpanda_spark.registry import CompatibilityError, SchemaRegistry

    r = SchemaRegistry()
    f16 = json.dumps({"type": "fixed", "name": "F", "size": 16})
    f8 = json.dumps({"type": "fixed", "name": "F", "size": 8})
    r.register("s", f16)
    with pytest.raises(CompatibilityError, match="size mismatch"):
        r.register("s", f8)
    r.register("s", f16)  # identical re-register still fine


def test_versions_never_reused_after_soft_delete():
    """r9 regression: (subject, version) coordinates are permanent — a
    re-created subject continues numbering past the deleted versions
    (Confluent semantics), so cached 'v1' never silently changes."""
    import json

    from redpanda_spark.registry import SchemaRegistry

    r = SchemaRegistry()
    mk = lambda n: json.dumps(
        {"type": "record", "name": "R",
         "fields": [{"name": "a", "type": "string"},
                    {"name": n, "type": "string", "default": ""}]}
    )
    r.register("s", mk("b"))   # v1
    r.register("s", mk("c"))   # v2
    r.delete_subject("s")      # soft delete both
    r.register("s", mk("d"))
    assert r.versions("s") == [3]  # NOT a recycled v1


def test_proto_negative_enum_constant_parses():
    """r9 regression: '-' tokenized separately from digits, silently
    dropping negative enum constants from the symbol table."""
    from redpanda_spark.registry.protobuf_compat import parse_proto

    schema = parse_proto(
        "syntax = \"proto3\"; enum E { UNKNOWN = 0; ERR = -1; OK = 2; }"
    )
    assert schema.enums["E"] == {0: "UNKNOWN", -1: "ERR", 2: "OK"}
