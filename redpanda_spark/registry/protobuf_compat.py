"""Protobuf schema compatibility at field-number / wire-format depth.

Re-expresses the reference's protobuf checker semantics
(`src/v/pandaproxy/schema_registry/protobuf.cc`, test shapes in
`.../test/compatibility_protobuf.cc`) with a stdlib-only .proto parser:

- scalar types are compatible iff they share a wire/semantic group:
  varint {int32,int64,uint32,uint64,bool}, zigzag {sint32,sint64},
  length-delimited {string,bytes}, {fixed32,sfixed32}, {fixed64,sfixed64};
  float and double are each their own group (value encoding differs)
- renaming a field keeping its number is compatible; renumbering is a
  type-flip on the new number and fails the group check
- removing a message the writer schema declares is incompatible
  (MESSAGE_REMOVED); adding reader-side messages is fine
- a named-type field (message/enum) must reference the same resolved type
  name in both schemas (FIELD_NAMED_TYPE_CHANGED)
- proto2 `required` fields must exist on both sides of the pair
  (REQUIRED_FIELD_ADDED / REQUIRED_FIELD_REMOVED, incl. `reserved` swaps)
- moving >=2 existing plain fields into one new oneof is incompatible
  (MULTIPLE_FIELDS_MOVED_TO_ONEOF); moving a single field is fine

`proto_can_read(reader, writer)` answers: can a parser generated from
``reader`` decode bytes written with ``writer``.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field

_SCALARS = {
    "int32": "varint",
    "int64": "varint",
    "uint32": "varint",
    "uint64": "varint",
    "bool": "varint",
    "sint32": "zigzag",
    "sint64": "zigzag",
    "string": "bytes",
    "bytes": "bytes",
    "fixed32": "fix32",
    "sfixed32": "fix32",
    "fixed64": "fix64",
    "sfixed64": "fix64",
    "float": "float",
    "double": "double",
}

# negative numbers tokenize as ONE token ('-1', not '-','1') so
# negative enum constants parse; bare '-' still matches last
_TOKEN = re.compile(r'-\d[\w.]*|[\w.]+|"[^"]*"|[{}<>=;,\[\]\-]')


@dataclass
class ProtoField:
    name: str
    type: str  # raw type token, or normalized "map<k,v>"
    number: int
    label: str = ""  # "", "optional", "required", "repeated"
    oneof: str | None = None


@dataclass
class ProtoMessage:
    full_name: str
    fields: dict[int, ProtoField] = field(default_factory=dict)
    reserved: set[int] = field(default_factory=set)


@dataclass
class ProtoSchema:
    syntax: str
    package: str
    messages: dict[str, ProtoMessage]
    # enum full-name -> {number: symbol}; `name in schema.enums` works as
    # it did when this was a set, and the symbol table feeds enum decode
    # (schema_protobuf.cc maps enums to their symbol strings)
    enums: dict[str, dict[int, str]]


def _strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    return re.sub(r"//[^\n]*", " ", text)


class ProtoParseError(ValueError):
    pass


def parse_proto(text: str) -> ProtoSchema:
    toks = _TOKEN.findall(_strip_comments(text))
    schema = ProtoSchema(syntax="proto3", package="", messages={}, enums={})
    _parse_body(toks, 0, "", schema, top=True)
    return schema


def _skip_to(toks: list[str], i: int, stop: str) -> int:
    """Skip to just past ``stop`` at brace-depth 0.

    With ``stop='}'`` this works whether ``i`` points AT the opening '{'
    (depth rises to 1, returns past its matching close) or just inside the
    block (first unmatched '}' returns) — the decrement-then-check order is
    what makes the on-the-brace call style find the MATCHING close instead
    of overshooting to the next one.
    """
    depth = 0
    while i < len(toks):
        t = toks[i]
        if t == "{":
            depth += 1
        elif t == "}":
            depth -= 1
            if stop == "}" and depth <= 0:
                return i + 1
        elif t == stop and depth == 0:
            return i + 1
        i += 1
    return i


def _parse_body(toks, i, scope, schema: ProtoSchema, top=False, oneof=None):
    """Parse statements until the matching '}' (or EOF at top level)."""
    msg = schema.messages.get(scope)
    while i < len(toks):
        t = toks[i]
        if t == "}":
            return i + 1
        if t == "syntax" and top:
            if i + 2 < len(toks):
                schema.syntax = toks[i + 2].strip('"')
            i = _skip_to(toks, i, ";")
        elif t == "package" and top:
            schema.package = toks[i + 1]
            i = _skip_to(toks, i, ";")
        elif t in ("import", "option", "extensions", "extend"):
            # extend blocks are brace-delimited; the rest end at ';'
            j = i + 1
            while j < len(toks) and toks[j] not in (";", "{"):
                j += 1
            i = _skip_to(toks, j, "}" if j < len(toks) and toks[j] == "{" else ";")
        elif t == "message":
            name = toks[i + 1]
            full = f"{scope}.{name}" if scope else name
            schema.messages[full] = ProtoMessage(full)
            if toks[i + 2] != "{":
                raise ProtoParseError(f"expected '{{' after message {name}")
            i = _parse_body(toks, i + 3, full, schema)
        elif t == "enum":
            name = toks[i + 1]
            full = f"{scope}.{name}" if scope else name
            symbols: dict[int, str] = {}
            # body: SYMBOL = number ; (plus option/reserved lines, skipped)
            j = i + 3  # past 'enum', name, '{'
            while j < len(toks) and toks[j] != "}":
                if (
                    toks[j] not in ("option", "reserved")
                    and j + 2 < len(toks)
                    and toks[j + 1] == "="
                    and toks[j + 2].lstrip("-").isdigit()
                ):
                    symbols[int(toks[j + 2])] = toks[j]
                j = _skip_to(toks, j, ";")
            schema.enums[full] = symbols
            i = j + 1
        elif t == "oneof":
            if msg is None:
                raise ProtoParseError("oneof outside message")
            i = _parse_body(toks, i + 3, scope, schema, oneof=toks[i + 1])
        elif t == "reserved":
            if msg is None:
                raise ProtoParseError("reserved outside message")
            j = i + 1
            last = None
            while j < len(toks) and toks[j] != ";":
                tk = toks[j]
                if tk.isdigit():
                    msg.reserved.add(int(tk))
                    last = int(tk)
                elif tk == "to" and last is not None and toks[j + 1].isdigit():
                    msg.reserved.update(range(last, int(toks[j + 1]) + 1))
                j += 1
            i = j + 1
        else:
            # a field: [label] type name = number [options] ;
            if msg is None:
                i = _skip_to(toks, i, ";")
                continue
            label = ""
            if t in ("optional", "required", "repeated"):
                label = t
                i += 1
                t = toks[i]
            if t == "map":
                # map < k , v > name = number
                k, v = toks[i + 2], toks[i + 4]
                ftype = f"map<{k},{v}>"
                fname = toks[i + 6]
                fnum = int(toks[i + 8])
            else:
                ftype = t
                fname = toks[i + 1]
                if toks[i + 2] != "=":
                    raise ProtoParseError(f"expected '=' in field {fname}")
                fnum = int(toks[i + 3])
            msg.fields[fnum] = ProtoField(fname, ftype, fnum, label, oneof)
            i = _skip_to(toks, i, ";")
    return i


def _resolve(type_name: str, scope: str, schema: ProtoSchema) -> str:
    """Resolve a (possibly relative) named-type reference to a declared
    message/enum full name, protoc scoping rules: innermost scope outward."""
    if type_name.startswith("."):
        n = type_name[1:]
        if schema.package and n.startswith(schema.package + "."):
            n = n[len(schema.package) + 1 :]
        return n
    parts = scope.split(".") if scope else []
    for k in range(len(parts), -1, -1):
        cand = ".".join(parts[:k] + [type_name])
        if cand in schema.messages or cand in schema.enums:
            return cand
    return type_name


def _field_type_compat(
    rf: ProtoField, wf: ProtoField, scope: str, rs: ProtoSchema, ws: ProtoSchema
) -> tuple[bool, str]:
    r_scalar, w_scalar = rf.type in _SCALARS, wf.type in _SCALARS
    if r_scalar and w_scalar:
        if _SCALARS[rf.type] != _SCALARS[wf.type]:
            return False, (
                f"field {wf.number}: encoding changed "
                f"{wf.type}({_SCALARS[wf.type]}) -> {rf.type}({_SCALARS[rf.type]})"
            )
        return True, ""
    if r_scalar != w_scalar:
        return False, f"field {wf.number}: kind changed {wf.type} -> {rf.type}"
    rname, wname = _resolve(rf.type, scope, rs), _resolve(wf.type, scope, ws)
    if rname != wname:
        return False, f"field {wf.number}: named type changed {wname} -> {rname}"
    return True, ""


def proto_can_read(reader_text: str, writer_text: str) -> tuple[bool, str]:
    """Can a ``reader``-schema parser decode data written with ``writer``?"""
    try:
        rs, ws = parse_proto(reader_text), parse_proto(writer_text)
    except (ProtoParseError, IndexError, ValueError) as e:
        return False, f"unparseable protobuf schema: {e}"

    for name in ws.messages:
        if name not in rs.messages:
            return False, f"message '{name}' removed"

    for name, wmsg in ws.messages.items():
        rmsg = rs.messages[name]
        scope = name
        for num, wf in wmsg.fields.items():
            rf = rmsg.fields.get(num)
            if rf is None:
                if wf.label == "required":
                    return False, f"{name}: required field {num} removed"
                continue
            ok, why = _field_type_compat(rf, wf, scope, rs, ws)
            if not ok:
                return False, f"{name}: {why}"
        for num, rf in rmsg.fields.items():
            if rf.label == "required" and num not in wmsg.fields:
                return False, f"{name}: required field {num} added"
        moved: dict[str, int] = defaultdict(int)
        for num, rf in rmsg.fields.items():
            wf = wmsg.fields.get(num)
            if rf.oneof is not None and wf is not None and wf.oneof is None:
                moved[rf.oneof] += 1
        for oneof_name, n in moved.items():
            if n >= 2:
                return False, (
                    f"{name}: {n} existing fields moved into oneof '{oneof_name}'"
                )
    return True, ""
