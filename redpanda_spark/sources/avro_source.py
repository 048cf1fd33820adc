"""Avro Object Container File source + sink.

The environment ships no spark-avro connector jar, but Avro is the
lingua franca of Kafka-adjacent pipelines (the reference's datalake
translates Avro-framed topics, `schema_avro.cc`), so ingesting/emitting
.avro files must not depend on an absent jar. This source reads OCF
files with the repo's pure-Python Avro codec (`registry/avro_codec.py`)
inside Arrow-batched tasks — one task per file, schema inferred from the
first file's header driver-side — and the sink writes one OCF per
partition.

Scale notes:
- parallelism = file count (each OCF decodes independently; Avro blocks
  within one file are sequential by format — sync-marker splitting is a
  possible refinement, same as Hadoop's AvroInputFormat);
- the decode is the slow path vs parquet (row-at-a-time binary format);
  the intended use is ingest-once → parquet/engine topics, not repeated
  scans — mirroring the reference, where Avro exists at the wire/lake
  boundary and columnar formats serve queries;
- column pruning cannot reach into the Avro decode (whole-record
  format); select-after-read prunes the DataFrame, not the file read.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from redpanda_spark.sources.datalake import avro_spark_type
from redpanda_spark.sources.iceberg_export import avro_ocf_read, avro_ocf_write


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro")
        )
    hits = sorted(_glob.glob(path))
    if not hits:
        raise FileNotFoundError(f"no avro files match {path}")
    return hits


def read_avro_ocf(spark: SparkSession, path: str) -> DataFrame:
    """Read .avro OCF file(s) (a file, a directory, or a glob) as a
    DataFrame. The writer schema must be a record; all files must share
    it (first file's header wins, per-file mismatch raises in-task)."""
    files = _list_files(path)
    schema_json, _, _ = _header_schema(files[0])
    spark_schema = avro_spark_type(schema_json)
    if not isinstance(spark_schema, T.StructType):
        raise ValueError("top-level avro schema must be a record")
    want = json.dumps(schema_json, sort_keys=True)
    cols = [f.name for f in spark_schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fp in pdf["path"]:
                schema, _, records = avro_ocf_read(fp)
                if json.dumps(schema, sort_keys=True) != want:
                    raise ValueError(
                        f"{fp}: writer schema differs from {files[0]}"
                    )
                yield pd.DataFrame(
                    {c: [r.get(c) for r in records] for c in cols},
                    columns=cols,
                )

    paths = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(len(files))
    return paths.mapInPandas(decode, spark_schema)


def _header_schema(path: str) -> tuple[Any, dict, None]:
    """Parse only the OCF header (magic + metadata map) — no block scan."""
    from redpanda_spark.registry.avro_codec import decode_datum, resolve_names

    with open(path, "rb") as f:
        buf = f.read(1 << 20)  # header fits well within 1 MiB
    if buf[:4] != b"Obj\x01":
        raise ValueError(f"{path}: not an Avro object container file")
    meta, _ = decode_datum(
        resolve_names({"type": "map", "values": "bytes"}), buf, 4
    )
    return json.loads(meta["avro.schema"]), meta, None


def spark_avro_schema(schema: T.StructType, name: str = "row") -> dict:
    """Spark schema → Avro record schema (inverse of avro_spark_type;
    nullable fields become [null, X] unions, timestamps become
    timestamp-micros longs)."""

    def conv(dt: T.DataType) -> Any:
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.IntegerType | T.ShortType | T.ByteType):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.TimestampType | T.TimestampNTZType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.DecimalType):
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": conv(dt.elementType)}
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise ValueError("avro maps require string keys")
            return {"type": "map", "values": conv(dt.valueType)}
        if isinstance(dt, T.StructType):
            return spark_avro_schema(dt, name=f"{name}_struct")
        raise ValueError(f"unsupported spark type for avro: {dt}")

    return {
        "type": "record",
        "name": name,
        "fields": [
            {
                "name": f.name,
                "type": ["null", conv(f.dataType)] if f.nullable else conv(f.dataType),
            }
            for f in schema.fields
        ],
    }


def write_avro_ocf(df: DataFrame, out_dir: str, record_name: str = "row") -> list[str]:
    """Write the DataFrame as one OCF file per partition under
    ``out_dir``; returns the written paths. Timestamps are encoded as
    timestamp-micros longs, decimals as big-endian unscaled bytes (the
    Avro logical-type conventions)."""
    import datetime as _dt
    import decimal as _dec

    os.makedirs(out_dir, exist_ok=True)
    avro_schema = spark_avro_schema(df.schema, name=record_name)
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    day0 = _dt.date(1970, 1, 1)

    def enc_cell(v: Any) -> Any:
        import numpy as np

        if isinstance(v, pd.Timestamp):
            # Arrow hands timestamps to pandas tasks as naive Timestamps
            v = v.to_pydatetime()
        if isinstance(v, _dt.datetime):
            if v.tzinfo is None:
                v = v.astimezone()
            return (v - epoch) // _dt.timedelta(microseconds=1)
        if isinstance(v, _dt.date):
            return (v - day0).days
        if isinstance(v, _dec.Decimal):
            _, _, exp = v.as_tuple()
            unscaled = int(v.scaleb(-exp))
            n = max(1, (unscaled.bit_length() + 8) // 8)
            return unscaled.to_bytes(n, "big", signed=True)
        if isinstance(v, bytearray):
            return bytes(v)
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        if isinstance(v, np.bool_):
            return bool(v)
        if isinstance(v, np.ndarray | list):
            return [enc_cell(x) for x in v]
        if isinstance(v, dict):
            return {k: enc_cell(x) for k, x in v.items()}
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return None
        return v

    cols = df.columns

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid as _uuid

        rows = []
        for pdf in batches:
            for i in range(len(pdf)):
                rows.append({c: enc_cell(pdf[c].iloc[i]) for c in cols})
        if not rows:
            return
        fp = os.path.join(out_dir, f"part-{_uuid.uuid4().hex}.avro")
        avro_ocf_write(fp, avro_schema, rows)
        yield pd.DataFrame({"path": [fp], "rows": [len(rows)]})

    out = df.mapInPandas(write_part, "path string, rows long").collect()
    return [r["path"] for r in out]
