"""Datalake sink: typed record translation + hour-partitioned table output.

Reference: the Iceberg/datalake subsystem translates topic records into
typed columnar rows, attaching a ``redpanda`` system struct
{partition, offset, timestamp, headers, key} to every row
(`src/v/datalake/record_translator.cc:68-98`) and partitioning tables by
hour(timestamp) (`src/v/datalake/table_definition.cc:57-66`).

Spark-first: this is Spark's home turf — ``from_json`` decodes the value
per the registered schema, the system struct is one `struct()` expression,
and the hour partitioning is `partitionBy` on a derived column, giving
partition pruning on every downstream read.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def redpanda_system_struct() -> Column:
    """The per-row provenance struct (record_translator.cc:68-98)."""
    return F.struct(
        F.col("partition").alias("partition"),
        F.col("offset").alias("offset"),
        F.col("timestamp").alias("timestamp"),
        F.col("headers").alias("headers"),
        F.col("key").alias("key"),
    ).alias("redpanda")


def translate_json_topic(
    log: DataFrame,
    value_schema: T.StructType | str,
) -> DataFrame:
    """Decode JSON values into typed columns + the system struct + hour col.

    Output: redpanda struct, flattened value fields, ``_hour`` partition
    column (hour-truncated timestamp, the reference's default partition
    spec).
    """
    cols = [redpanda_system_struct()] if "headers" in log.columns else [
        F.struct(
            F.col("partition"), F.col("offset"), F.col("timestamp"),
            F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
            F.col("key"),
        ).alias("redpanda")
    ]
    decoded = log.select(
        *cols,
        F.from_json(F.col("value").cast("string"), value_schema).alias("_v"),
        F.date_trunc("hour", F.col("timestamp")).alias("_hour"),
    )
    value_fields = decoded.select("_v.*").columns
    return decoded.select(
        "redpanda", *[F.col(f"_v.{f}").alias(f) for f in value_fields], "_hour"
    )


# --------------------------------------------------------------------------
# Avro / Protobuf typed translation
# --------------------------------------------------------------------------
#
# The reference translates all three registry schema types to columnar rows
# (`src/v/datalake/schema_avro.cc`, `schema_protobuf.cc`,
# `record_translator.cc:68-98`). Spark's from_avro/from_protobuf live in
# external packages absent here, so decode runs as an Arrow-batched pandas
# UDF over the pure-Python codecs in registry/ — one Python stage, plan
# identical to the JSON path otherwise (system struct + hour partition stay
# JVM-side).


def avro_spark_type(schema: Any) -> T.DataType:
    """Avro schema → Spark type, mirroring the reference's Iceberg mapping
    (`schema_avro.cc`; SURVEY.md §1.3/§1.4): enum→string, fixed→binary,
    [null, X] unions→nullable X."""
    if isinstance(schema, str):
        prim = {
            "null": T.NullType(),
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }
        if schema in prim:
            return prim[schema]
        raise ValueError(f"unsupported avro type {schema}")
    if isinstance(schema, list):  # union
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise ValueError("only [null, X] unions map to a column type")
        return avro_spark_type(branches[0])
    t = schema["type"]
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_spark_type(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_spark_type(schema["items"]), True)
    if t == "map":
        return T.MapType(T.StringType(), avro_spark_type(schema["values"]), True)
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    return avro_spark_type(t)


_PROTO_SPARK = {
    "int32": T.IntegerType(),
    "sint32": T.IntegerType(),
    "sfixed32": T.IntegerType(),
    "uint32": T.LongType(),
    "int64": T.LongType(),
    "sint64": T.LongType(),
    "sfixed64": T.LongType(),
    "uint64": T.LongType(),  # top bit may overflow; reference maps to long too
    "fixed32": T.LongType(),
    "fixed64": T.LongType(),
    "bool": T.BooleanType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def proto_spark_type(schema, msg_name: str) -> T.StructType:
    """Proto message → Spark struct (`schema_protobuf.cc` analog)."""
    from redpanda_spark.registry.proto_codec import _lookup
    from redpanda_spark.registry.protobuf_compat import _resolve

    msg = _lookup(schema, msg_name)
    fields = []
    for num in sorted(msg.fields):
        f = msg.fields[num]
        if f.type in _PROTO_SPARK:
            ftype: T.DataType = _PROTO_SPARK[f.type]
        else:
            ftype = proto_spark_type(schema, _resolve(f.type, msg.full_name, schema))
        if f.label == "repeated":
            ftype = T.ArrayType(ftype, True)
        fields.append(T.StructField(f.name, ftype, True))
    return T.StructType(fields)


def _system_cols(log: DataFrame) -> list[Column]:
    if "headers" in log.columns:
        return [redpanda_system_struct()]
    return [
        F.struct(
            F.col("partition"), F.col("offset"), F.col("timestamp"),
            F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
            F.col("key"),
        ).alias("redpanda")
    ]


def _strip_wire_header(payload: bytes, wire_framed: bool) -> bytes:
    # Confluent wire format: MAGIC 0x00 + 4-byte big-endian schema id
    # (registry/store.py::wire_encode, produce.cc:360-362)
    return payload[5:] if wire_framed else payload


def translate_avro_topic(
    log: DataFrame,
    schema_json: str,
    wire_framed: bool = False,
) -> DataFrame:
    """Decode Avro binary values into typed columns + system struct + hour.

    Same output shape as translate_json_topic; decode is an Arrow-batched
    pandas UDF over registry.avro_codec (schema_avro.cc parity). Scales as
    a narrow per-row map — no shuffle, no driver involvement; the Python
    stage is the cost and is bounded by Arrow batch size.
    """
    from redpanda_spark.registry.avro_codec import decode_datum

    schema = json.loads(schema_json)
    value_type = avro_spark_type(schema)
    if not isinstance(value_type, T.StructType):
        raise ValueError("top-level avro schema must be a record")

    @F.pandas_udf(returnType=value_type)
    def decode(vals: pd.Series) -> pd.DataFrame:
        rows = []
        for b in vals:
            if b is None:
                rows.append({f.name: None for f in value_type.fields})
                continue
            v, _ = decode_datum(schema, _strip_wire_header(bytes(b), wire_framed), 0)
            rows.append(v)
        return pd.DataFrame(rows, columns=[f.name for f in value_type.fields])

    decoded = log.select(
        *_system_cols(log),
        decode(F.col("value")).alias("_v"),
        F.date_trunc("hour", F.col("timestamp")).alias("_hour"),
    )
    return decoded.select(
        "redpanda",
        *[F.col(f"_v.{f.name}").alias(f.name) for f in value_type.fields],
        "_hour",
    )


def translate_proto_topic(
    log: DataFrame,
    proto_text: str,
    msg_name: str,
    wire_framed: bool = False,
) -> DataFrame:
    """Decode Protobuf wire-format values into typed columns + system struct
    + hour (schema_protobuf.cc parity), via registry.proto_codec."""
    from redpanda_spark.registry.proto_codec import decode_message
    from redpanda_spark.registry.protobuf_compat import parse_proto

    schema = parse_proto(proto_text)
    value_type = proto_spark_type(schema, msg_name)

    @F.pandas_udf(returnType=value_type)
    def decode(vals: pd.Series) -> pd.DataFrame:
        rows = []
        for b in vals:
            if b is None:
                rows.append({f.name: None for f in value_type.fields})
                continue
            rows.append(
                decode_message(schema, msg_name, _strip_wire_header(bytes(b), wire_framed))
            )
        return pd.DataFrame(rows, columns=[f.name for f in value_type.fields])

    decoded = log.select(
        *_system_cols(log),
        decode(F.col("value")).alias("_v"),
        F.date_trunc("hour", F.col("timestamp")).alias("_hour"),
    )
    return decoded.select(
        "redpanda",
        *[F.col(f"_v.{f.name}").alias(f.name) for f in value_type.fields],
        "_hour",
    )


def write_datalake(
    df: DataFrame, path: str, mode: str = "append", fmt: str = "parquet"
) -> list[str]:
    """Hour-partitioned table write with snapshot semantics.

    Iceberg-commit analog (`datalake/coordinator/iceberg_file_committer.cc`):
    data files land under ``path`` first, then a ``_manifest.json`` holding
    the snapshot history — each snapshot is the complete live-file list at
    its commit — is swapped in with one atomic rename, the same commit
    pattern the engine uses for topic mutations (engine.py::
    _commit_manifest). Readers that honor the manifest (read_datalake)
    never observe a half-written snapshot; a crash before the rename leaves
    the previous manifest intact and the orphaned files invisible. Returns
    the newly committed snapshot's file list (path-relative).
    """
    df.write.mode(mode).partitionBy("_hour").format(fmt).save(path)
    files: list[str] = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.startswith(("_", ".")):
                continue
            files.append(os.path.relpath(os.path.join(root, n), path))
    files.sort()
    manifest = os.path.join(path, "_manifest.json")
    snapshots: list[dict] = []
    if os.path.exists(manifest):
        with open(manifest) as f:
            prev = json.load(f)
        snapshots = prev.get("snapshots") or (
            # migrate a v1 single-snapshot manifest
            [{"id": 1, "files": prev["files"]}] if "files" in prev else []
        )
    snapshots.append({"id": len(snapshots) + 1, "files": files})
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"format": fmt, "snapshots": snapshots}, f)
    os.replace(tmp, manifest)
    return files


def read_datalake(spark, path: str, snapshot_id: int | None = None) -> DataFrame:
    """Snapshot read: only files listed in the committed manifest.

    ``snapshot_id`` selects a historical snapshot (Iceberg time-travel
    analog); default is the latest.
    """
    manifest = os.path.join(path, "_manifest.json")
    with open(manifest) as f:
        m = json.load(f)
    snapshots = m.get("snapshots") or [{"id": 1, "files": m["files"]}]
    if snapshot_id is None:
        snap = snapshots[-1]
    else:
        matches = [s for s in snapshots if s["id"] == snapshot_id]
        if not matches:
            raise ValueError(f"no snapshot {snapshot_id} in {manifest}")
        snap = matches[0]
    full = [os.path.join(path, p) for p in snap["files"]]
    return (
        spark.read.format(m.get("format", "parquet"))
        .option("basePath", path)
        .load(full)
    )
