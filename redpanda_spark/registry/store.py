"""Schema registry — subjects, versions, global ids, compatibility.

Reference: `src/v/pandaproxy/schema_registry/` — subjects map to versioned
schemas of type AVRO | JSON | PROTOBUF (`types.h:67`), compatibility levels
NONE/BACKWARD/FORWARD/FULL (+ _TRANSITIVE) (`types.h:481`), per-type
compatibility checkers (`avro.cc`, `compatibility.cc`), soft-delete
semantics, and schema-id produce validation
(`schema_id_validation.h`, produce.cc:360-362).

This implementation keeps the store driver-side (schemas are tiny metadata;
the reference likewise keeps them on a single _schemas topic) and persists
to a JSON file so engines across sessions share state. The Avro
compatibility checker implements the record-field rules that cover the
reference's test matrix: reader ignores removed fields only with defaults,
added reader fields need defaults, type promotions int→long→float→double.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from typing import Any

SCHEMA_TYPES = ("AVRO", "JSON", "PROTOBUF")
COMPAT_LEVELS = (
    "NONE",
    "BACKWARD",
    "FORWARD",
    "FULL",
    "BACKWARD_TRANSITIVE",
    "FORWARD_TRANSITIVE",
    "FULL_TRANSITIVE",
)

# Avro numeric promotions: writer type -> acceptable reader types
_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


class CompatibilityError(Exception):
    pass


class ModeError(Exception):
    """Write rejected by the registry mode (READONLY/IMPORT gating,
    `seq_writer.cc:122-123` mode_is_readonly; REST maps this to 42205)."""


MODES = ("READWRITE", "READONLY", "IMPORT")


@dataclass
class SchemaVersion:
    subject: str
    version: int
    id: int
    type: str
    schema: str
    deleted: bool = False
    # schema references (types.h `schema_reference`: {name, subject,
    # version}): named types this schema uses that live in OTHER subjects
    references: list | None = None


class SchemaRegistry:
    def __init__(self, path: str | None = None, fsio=None):
        self._path = path
        # optional filesystem abstraction (pass engine._fsio to persist
        # the registry under a URI / object-store root); default = plain
        # local paths, byte-identical to the previous raw-os behavior
        if fsio is None:
            from redpanda_spark.fsio import LocalFS

            fsio = LocalFS()
        self._fsio = fsio
        self._subjects: dict[str, list[SchemaVersion]] = {}
        self._by_id: dict[int, SchemaVersion] = {}
        self._compat: dict[str, str] = {}
        self._global_compat = "BACKWARD"
        # operating mode, global + per-subject overrides
        # (api-doc/schema_registry.json /mode, types.h:50-54)
        self._mode: dict[str, str] = {}
        self._global_mode = "READWRITE"
        self._next_id = 1
        if path and self._fsio.exists(path):
            self._load()

    # -- persistence ------------------------------------------------------

    def _load(self) -> None:
        raw = json.loads(self._fsio.read_text(self._path))
        self._subjects = {
            s: [SchemaVersion(**v) for v in vs] for s, vs in raw["subjects"].items()
        }
        self._by_id = {v.id: v for vs in self._subjects.values() for v in vs}
        self._compat = raw["compat"]
        self._global_compat = raw["global_compat"]
        self._mode = raw.get("mode", {})
        self._global_mode = raw.get("global_mode", "READWRITE")
        self._next_id = raw["next_id"]

    def _save(self) -> None:
        if not self._path:
            return
        # tmp + rename: the registry is the whole cluster's schema state;
        # a crash mid-write must never truncate it (the reference keeps it
        # in a compacted topic, crash-safe by append — `_schemas`)
        self._fsio.write_text_atomic(
            self._path,
            json.dumps(
                {
                    "subjects": {
                        s: [asdict(v) for v in vs] for s, vs in self._subjects.items()
                    },
                    "compat": self._compat,
                    "global_compat": self._global_compat,
                    "mode": self._mode,
                    "global_mode": self._global_mode,
                    "next_id": self._next_id,
                }
            ),
        )

    # -- registration -----------------------------------------------------

    def register(
        self,
        subject: str,
        schema: str,
        schema_type: str = "AVRO",
        references: list[dict] | None = None,
        schema_id: int | None = None,
    ) -> int:
        """Register a schema version; returns the global schema id.
        Re-registering an identical schema returns the existing id.

        ``references`` ([{name, subject, version}], types.h
        `schema_reference`) must point at live versions; referenced
        versions become undeletable while a live referencing schema
        exists (the reference's 409 "has references" rule,
        `sharded_store.cc` delete guards).

        Mode gating (`seq_writer.cc:122-123`): READONLY rejects all
        writes; IMPORT accepts only registrations carrying an explicit
        ``schema_id`` (the migration flow — ids must survive the copy);
        READWRITE rejects explicit ids (they're broker-assigned)."""
        if schema_type not in SCHEMA_TYPES:
            raise ValueError(f"unknown schema type: {schema_type}")
        mode = self.get_mode(subject)
        if mode == "READONLY":
            raise ModeError(f"subject {subject} is in READONLY mode")
        if mode == "IMPORT" and schema_id is None:
            raise ModeError(
                f"subject {subject} is in IMPORT mode: registration "
                "requires an explicit schema id"
            )
        if mode == "READWRITE" and schema_id is not None:
            raise ModeError(
                "explicit schema ids are only accepted in IMPORT mode"
            )
        if schema_id is not None and schema_id in self._by_id:
            existing = self._by_id[schema_id]
            raise ValueError(
                f"schema id {schema_id} already taken by "
                f"{existing.subject} v{existing.version}"
            )
        for ref in references or []:
            # raises KeyError if the referenced version doesn't exist/live
            self.get_version(ref["subject"], ref["version"])
        versions = self._subjects.setdefault(subject, [])
        canon = _canonical(schema, schema_type)
        for v in versions:
            if (
                not v.deleted
                and _canonical(v.schema, v.type) == canon
                and (v.references or []) == (references or [])
            ):
                return v.id
        level = self.get_compatibility(subject)
        live = [v for v in versions if not v.deleted]
        if live and level != "NONE":
            check_against = live if level.endswith("_TRANSITIVE") else [live[-1]]
            for prev in check_against:
                self._check_pair(prev, schema, schema_type, level)
        if schema_id is not None:
            sid = schema_id
            self._next_id = max(self._next_id, sid + 1)
        else:
            sid = self._next_id
            self._next_id += 1
        ver = SchemaVersion(
            subject=subject,
            # max EVER assigned + 1, soft-deleted included: Confluent
            # never reuses a (subject, version) coordinate — reviving a
            # deleted subject at v1 would silently change what cached
            # clients think v1 means
            version=(max(v.version for v in versions) + 1) if versions else 1,
            id=sid,
            type=schema_type,
            schema=schema,
            references=list(references) if references else None,
        )
        versions.append(ver)
        self._by_id[sid] = ver
        self._save()
        return sid

    def _check_pair(
        self, prev: SchemaVersion, schema: str, schema_type: str, level: str
    ) -> None:
        if prev.type != schema_type:
            raise CompatibilityError(
                f"schema type changed: {prev.type} -> {schema_type}"
            )
        base = level.replace("_TRANSITIVE", "")
        ok, why = test_compatibility(prev.schema, schema, schema_type, base)
        if not ok:
            raise CompatibilityError(
                f"incompatible with version {prev.version} under {level}: {why}"
            )

    # -- lookup -----------------------------------------------------------

    def get_by_id(self, schema_id: int) -> SchemaVersion:
        return self._by_id[schema_id]

    def get_latest(self, subject: str) -> SchemaVersion:
        live = [v for v in self._subjects.get(subject, []) if not v.deleted]
        if not live:
            raise KeyError(f"no live versions for subject {subject}")
        return live[-1]

    def get_version(self, subject: str, version: int) -> SchemaVersion:
        for v in self._subjects.get(subject, []):
            if v.version == version and not v.deleted:
                return v
        raise KeyError(f"{subject} v{version}")

    def versions(self, subject: str) -> list[int]:
        return [v.version for v in self._subjects.get(subject, []) if not v.deleted]

    def subjects(self) -> list[str]:
        return [
            s for s, vs in self._subjects.items() if any(not v.deleted for v in vs)
        ]

    def referenced_by(self, subject: str, version: int) -> list[int]:
        """Schema ids of live schemas referencing (subject, version) —
        GET /subjects/{s}/versions/{v}/referencedby."""
        return [
            v.id
            for vs in self._subjects.values()
            for v in vs
            if not v.deleted
            and any(
                r["subject"] == subject and r["version"] == version
                for r in (v.references or [])
            )
        ]

    def delete_version(self, subject: str, version: int) -> None:
        if self.get_mode(subject) == "READONLY":
            raise ModeError(f"subject {subject} is in READONLY mode")
        holders = self.referenced_by(subject, version)
        if holders:
            raise CompatibilityError(
                f"{subject} v{version} is referenced by schema ids {holders}"
            )
        self.get_version(subject, version).deleted = True
        self._save()

    def delete_subject(self, subject: str) -> list[int]:
        if self.get_mode(subject) == "READONLY":
            raise ModeError(f"subject {subject} is in READONLY mode")
        for v in self._subjects.get(subject, []):
            if not v.deleted:
                holders = [
                    h
                    for h in self.referenced_by(subject, v.version)
                    # a subject may self-reference across versions; deleting
                    # the whole subject removes holder and holdee together
                    if self._by_id[h].subject != subject
                ]
                if holders:
                    raise CompatibilityError(
                        f"{subject} v{v.version} is referenced by schema ids {holders}"
                    )
        out = []
        for v in self._subjects.get(subject, []):
            if not v.deleted:
                v.deleted = True
                out.append(v.version)
        self._save()
        return out

    def resolved_schema(self, v: SchemaVersion) -> str:
        """The schema text with references resolved.

        AVRO: referenced named types are inlined at their first use (the
        standard define-once expansion, recursively — what the reference's
        `avro::compileJsonSchema` does with its resolved import set).
        JSON/PROTOBUF references are stored and guarded but not inlined
        here; the proto codec takes a single self-contained text
        (documented capability edge)."""
        if not v.references:
            return v.schema
        if v.type != "AVRO":
            return v.schema
        defs: dict[str, Any] = {}
        for ref in v.references:
            rv = self.get_version(ref["subject"], ref["version"])
            defs[ref["name"]] = json.loads(self.resolved_schema(rv))
        defined: set[str] = set()

        def walk_type(t):
            if isinstance(t, str):
                if t in defs and t not in defined:
                    defined.add(t)
                    return walk_schema(dict(defs[t]))
                return t
            if isinstance(t, list):
                return [walk_type(b) for b in t]
            return walk_schema(dict(t))

        def walk_schema(d):
            tt = d.get("type")
            if tt == "record":
                d["fields"] = [
                    {**f, "type": walk_type(f["type"])} for f in d["fields"]
                ]
            elif tt == "array":
                d["items"] = walk_type(d["items"])
            elif tt == "map":
                d["values"] = walk_type(d["values"])
            elif tt is not None and tt not in ("enum", "fixed"):
                d["type"] = walk_type(tt)
            return d

        return json.dumps(walk_type(json.loads(v.schema)))

    # -- compatibility config --------------------------------------------

    # -- mode (api-doc/schema_registry.json /mode, types.h:50-54) ---------

    def set_mode(self, mode: str, subject: str | None = None) -> None:
        """Global or per-subject mode: READWRITE | READONLY | IMPORT.
        Mode changes themselves are always allowed (the reference stores
        mode on the _schemas topic but gates only schema/config writes —
        otherwise READONLY could never be left)."""
        if mode not in MODES:
            raise ValueError(f"unknown mode: {mode} (expected one of {MODES})")
        if subject is None:
            self._global_mode = mode
        else:
            self._mode[subject] = mode
        self._save()

    def get_mode(self, subject: str | None = None) -> str:
        if subject is not None and subject in self._mode:
            return self._mode[subject]
        return self._global_mode

    def delete_mode(self, subject: str) -> str:
        """Drop a subject override; the subject falls back to the global
        mode (DELETE /mode/{subject})."""
        return self._mode.pop(subject, self._global_mode)

    def set_compatibility(self, level: str, subject: str | None = None) -> None:
        if level not in COMPAT_LEVELS:
            raise ValueError(f"unknown level {level}")
        if self.get_mode(subject) == "READONLY":
            raise ModeError(
                f"{'subject ' + subject if subject else 'registry'} is in "
                "READONLY mode"
            )
        if subject is None:
            self._global_compat = level
        else:
            self._compat[subject] = level
        self._save()

    def get_compatibility(self, subject: str | None = None) -> str:
        if subject is not None and subject in self._compat:
            return self._compat[subject]
        return self._global_compat

    # -- schema-id wire-format validation (produce gate) ------------------

    def validate_wire_bytes(self, payload: bytes, subject: str) -> bool:
        """Confluent wire format: MAGIC=0x00 + 4-byte big-endian schema id.
        True iff the id exists and belongs to ``subject``
        (reference: schema_id_validation.h, produce.cc:360-362)."""
        if payload is None or len(payload) < 5 or payload[0] != 0:
            return False
        sid = int.from_bytes(payload[1:5], "big")
        v = self._by_id.get(sid)
        return v is not None and not v.deleted and v.subject == subject

    @staticmethod
    def wire_encode(schema_id: int, body: bytes) -> bytes:
        return b"\x00" + schema_id.to_bytes(4, "big") + body


# -- compatibility checkers ------------------------------------------------


def _canonical(schema: str, schema_type: str) -> str:
    if schema_type in ("AVRO", "JSON"):
        try:
            return json.dumps(json.loads(schema), sort_keys=True)
        except json.JSONDecodeError:
            return schema.strip()
    return schema.strip()


def test_compatibility(
    old_schema: str, new_schema: str, schema_type: str, level: str
) -> tuple[bool, str]:
    """Can data written with ``old`` be handled per ``level`` with ``new``?

    BACKWARD: new reader reads old data. FORWARD: old reader reads new data.
    FULL: both.
    """
    if level == "NONE":
        return True, ""
    if schema_type == "AVRO":
        checks = []
        if level in ("BACKWARD", "FULL"):
            checks.append(("BACKWARD", _avro_can_read(new_schema, old_schema)))
        if level in ("FORWARD", "FULL"):
            checks.append(("FORWARD", _avro_can_read(old_schema, new_schema)))
        for mode, (ok, why) in checks:
            if not ok:
                return False, f"{mode}: {why}"
        return True, ""
    if schema_type == "JSON":
        return _json_compat(old_schema, new_schema, level)
    # PROTOBUF: field-number / wire-format level checks
    # (reference `pandaproxy/schema_registry/protobuf.cc`).
    from redpanda_spark.registry.protobuf_compat import proto_can_read

    checks = []
    if level in ("BACKWARD", "FULL"):
        checks.append(("BACKWARD", proto_can_read(new_schema, old_schema)))
    if level in ("FORWARD", "FULL"):
        checks.append(("FORWARD", proto_can_read(old_schema, new_schema)))
    for mode, (ok, why) in checks:
        if not ok:
            return False, f"{mode}: {why}"
    return True, ""


def _avro_can_read(reader_s: str, writer_s: str) -> tuple[bool, str]:
    """Record-level Avro resolution: every reader field is either present in
    the writer (with a resolvable type) or has a default."""
    try:
        reader, writer = json.loads(reader_s), json.loads(writer_s)
    except json.JSONDecodeError as e:
        return False, f"unparseable schema: {e}"
    return _avro_resolve(reader, writer)


def _avro_resolve(reader, writer) -> tuple[bool, str]:
    rt, wt = _avro_type(reader), _avro_type(writer)
    if rt == "record" and wt == "record":
        wfields = {f["name"]: f for f in writer.get("fields", [])}
        for rf in reader.get("fields", []):
            wf = wfields.get(rf["name"])
            if wf is None:
                if "default" not in rf:
                    return False, f"reader field '{rf['name']}' has no default"
            else:
                ok, why = _avro_resolve(rf["type"], wf["type"])
                if not ok:
                    return False, f"field '{rf['name']}': {why}"
        return True, ""
    if rt == "union" or wt == "union":
        wbranches = writer if wt == "union" else [writer]
        rbranches = reader if rt == "union" else [reader]
        for wb in wbranches:
            if not any(_avro_resolve(rb, wb)[0] for rb in rbranches):
                return False, f"writer union branch {_avro_type(wb)} unreadable"
        return True, ""
    if rt == "array" and wt == "array":
        return _avro_resolve(reader["items"], writer["items"])
    if rt == "map" and wt == "map":
        return _avro_resolve(reader["values"], writer["values"])
    if rt == "fixed" and wt == "fixed":
        # Avro spec schema-resolution: fixed matches only with the SAME
        # size (and unqualified name); falling through to rt == wt would
        # accept a size change that corrupts every decoded value
        if reader.get("size") != writer.get("size"):
            return False, (
                f"fixed size mismatch reader={reader.get('size')} "
                f"writer={writer.get('size')}"
            )
        if reader.get("name") != writer.get("name"):
            return False, (
                f"fixed name mismatch reader={reader.get('name')!r} "
                f"writer={writer.get('name')!r}"
            )
        return True, ""
    if rt == "enum" and wt == "enum":
        missing = set(writer.get("symbols", [])) - set(reader.get("symbols", []))
        if missing:
            return False, f"enum symbols unknown to reader: {sorted(missing)}"
        return True, ""
    if wt in _PROMOTIONS:
        if rt in _PROMOTIONS[wt]:
            return True, ""
        return False, f"cannot promote writer {wt} to reader {rt}"
    if rt == wt:
        return True, ""
    return False, f"type mismatch reader={rt} writer={wt}"


def _avro_type(s):
    if isinstance(s, str):
        return s
    if isinstance(s, list):
        return "union"
    return s.get("type")


def _json_compat(old_s: str, new_s: str, level: str) -> tuple[bool, str]:
    """JSON-schema object compatibility (required/properties subset rules):
    BACKWARD: new schema must accept old data → new required ⊆ old
    (required+defaulted) and shared property types equal."""
    try:
        old, new = json.loads(old_s), json.loads(new_s)
    except json.JSONDecodeError as e:
        return False, f"unparseable: {e}"

    def accepts(reader: dict, writer: dict) -> tuple[bool, str]:
        w_known = set(writer.get("properties", {}))
        for req in reader.get("required", []):
            if req not in set(writer.get("required", [])) and req not in w_known:
                return False, f"new required property '{req}' absent in old data"
        for name, spec in reader.get("properties", {}).items():
            wspec = writer.get("properties", {}).get(name)
            if wspec and spec.get("type") != wspec.get("type"):
                return False, f"property '{name}' type changed"
        return True, ""

    if level in ("BACKWARD", "FULL"):
        ok, why = accepts(new, old)
        if not ok:
            return False, f"BACKWARD: {why}"
    if level in ("FORWARD", "FULL"):
        ok, why = accepts(old, new)
        if not ok:
            return False, f"FORWARD: {why}"
    return True, ""
