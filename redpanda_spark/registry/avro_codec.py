"""Pure-Python Avro binary codec (encoder + decoder) for datalake decode.

Written from the public Apache Avro 1.11 specification (binary encoding
chapter): zigzag-varint ints/longs, little-endian IEEE float/double,
length-prefixed bytes/string, records as field concatenation, arrays/maps
as blocked sequences, unions as branch-index + value, enums as index,
fixed as raw bytes.

Role parity: the reference decodes Avro-valued topics into typed columnar
rows in its datalake path (`/root/reference/src/v/datalake/schema_avro.cc`,
`record_translator.cc:68-98`). Spark's `from_avro` lives in the external
spark-avro package which is not present in this environment, so the decode
runs as an Arrow-batched UDF over this codec instead (see
`sources/datalake.translate_avro_topic`); the codec is also the fixture
encoder for tests/oracles.
"""

from __future__ import annotations

import json
import struct
from typing import Any

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = _zigzag_encode(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _zigzag_decode(acc), pos
        shift += 7


# ---------------------------------------------------------------------------
# schema-driven encode / decode
# ---------------------------------------------------------------------------


def _type_of(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


def resolve_names(schema: Any, names: dict | None = None) -> Any:
    """Resolve named-type references (Avro spec "Names"): a record/enum/
    fixed defined once may be used later by its (full) name. Returns a
    structure-shared copy where every such string reference points at the
    definition object — recursive schemas become shared-reference cycles,
    which the data-driven encoder/decoder walks naturally. Define-before-
    use order is required (same as avro-python); an unknown name raises."""
    names = {} if names is None else names
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise ValueError(f"undefined named type {schema}")
    if isinstance(schema, list):
        return [resolve_names(b, names) for b in schema]
    t = schema.get("type")
    out = dict(schema)
    if t in ("record", "enum", "fixed") and "name" in schema:
        name = schema["name"]
        ns = schema.get("namespace")
        # register BEFORE walking fields so self-references resolve
        names[name] = out
        if ns and "." not in name:
            names[f"{ns}.{name}"] = out
    if t == "record":
        out["fields"] = [
            {**f, "type": resolve_names(f["type"], names)} for f in schema["fields"]
        ]
    elif t == "array":
        out["items"] = resolve_names(schema["items"], names)
    elif t == "map":
        out["values"] = resolve_names(schema["values"], names)
    elif not isinstance(t, str) or (
        t not in _PRIMITIVES and t not in ("record", "enum", "fixed")
    ):
        # {"type": <nested/union/named-ref>} wrapper form
        out["type"] = resolve_names(t, names)
    return out


def encode_datum(schema: Any, value: Any, out: bytearray) -> None:
    t = _type_of(schema)
    if t == "union":
        for idx, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(out, idx)
                encode_datum(branch, value, out)
                return
        raise ValueError(f"no union branch for {value!r}")
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "bytes":
        b = bytes(value)
        _write_long(out, len(b))
        out += b
    elif t == "string":
        b = str(value).encode("utf-8")
        _write_long(out, len(b))
        out += b
    elif t == "record":
        for f in schema["fields"]:
            encode_datum(f["type"], value[f["name"]], out)
    elif t == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for it in items:
                encode_datum(schema["items"], it, out)
        _write_long(out, 0)
    elif t == "map":
        entries = list(value.items())
        if entries:
            _write_long(out, len(entries))
            for k, v in entries:
                kb = str(k).encode("utf-8")
                _write_long(out, len(kb))
                out += kb
                encode_datum(schema["values"], v, out)
        _write_long(out, 0)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out += b
    else:
        raise ValueError(f"unsupported avro type {t}")


def _matches(branch: Any, value: Any) -> bool:
    t = _type_of(branch)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        # ints are accepted for float/double branches (matches fastavro /
        # avro-python behavior; {"x": 1} must encode against ["null","double"])
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    if t == "enum":
        return isinstance(value, str)
    return False


def decode_datum(schema: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    t = _type_of(schema)
    if t == "union":
        idx, pos = _read_long(buf, pos)
        return decode_datum(schema[idx], buf, pos)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if t == "string":
        n, pos = _read_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = decode_datum(f["type"], buf, pos)
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:  # block with byte-size prefix (spec-legal)
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                it, pos = decode_datum(schema["items"], buf, pos)
                items.append(it)
    if t == "map":
        m = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return m, pos
            if n < 0:
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                klen, pos = _read_long(buf, pos)
                k = buf[pos : pos + klen].decode("utf-8")
                pos += klen
                m[k], pos = decode_datum(schema["values"], buf, pos)
    if t == "enum":
        idx, pos = _read_long(buf, pos)
        return schema["symbols"][idx], pos
    if t == "fixed":
        n = schema["size"]
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type {t}")


def avro_encode(schema_json: str | Any, value: Any) -> bytes:
    schema = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    out = bytearray()
    encode_datum(resolve_names(schema), value, out)
    return bytes(out)


def avro_decode(schema_json: str | Any, payload: bytes) -> Any:
    schema = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    value, pos = decode_datum(resolve_names(schema), payload, 0)
    if pos != len(payload):
        raise ValueError(f"trailing bytes after avro datum ({len(payload)-pos})")
    return value
