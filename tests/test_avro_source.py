"""Avro OCF source/sink: round trips, multi-file reads, and JVM
cross-validation (no spark-avro jar in this environment — the source is
the pure-Python codec in Arrow-batched tasks)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from redpanda_spark.sources.avro_source import (
    read_avro_ocf,
    spark_avro_schema,
    write_avro_ocf,
)


def test_roundtrip_primitives_and_nulls(spark, tmp_path):
    df = spark.createDataFrame(
        [
            Row(i=1, s="a", d=1.5, b=b"\x00\x01", ok=True, arr=[1, 2]),
            Row(i=2, s=None, d=None, b=None, ok=False, arr=[]),
        ],
        "i long, s string, d double, b binary, ok boolean, arr array<long>",
    )
    out = str(tmp_path / "avro")
    paths = write_avro_ocf(df, out)
    assert paths and all(p.endswith(".avro") for p in paths)
    back = read_avro_ocf(spark, out)
    a = sorted(
        (r["i"], r["s"], r["d"], bytes(r["b"]) if r["b"] is not None else None,
         r["ok"], tuple(r["arr"]))
        for r in df.collect()
    )
    bk = sorted(
        (r["i"], r["s"], r["d"], bytes(r["b"]) if r["b"] is not None else None,
         r["ok"], tuple(r["arr"]))
        for r in back.collect()
    )
    assert a == bk


def test_multi_file_read_parallelism_and_glob(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartition(4)
    out = str(tmp_path / "many")
    paths = write_avro_ocf(df, out)
    assert len(paths) == 4  # one OCF per partition
    back = read_avro_ocf(spark, out)
    assert back.rdd.getNumPartitions() == 4  # one task per file
    assert sorted(r["id"] for r in back.collect()) == list(range(100))
    # glob form
    back2 = read_avro_ocf(spark, os.path.join(out, "part-*.avro"))
    assert back2.count() == 100


def test_timestamp_and_struct_encoding(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(ts="2024-03-01 10:00:00", st=Row(x=1, y="p"))],
        "ts string, st struct<x:long,y:string>",
    ).select(F.to_timestamp("ts").alias("ts"), "st")
    out = str(tmp_path / "ts")
    write_avro_ocf(df, out)
    [r] = read_avro_ocf(spark, out).collect()
    # timestamps land as timestamp-micros longs (documented read shape)
    want_us = df.select(F.unix_micros("ts")).collect()[0][0]
    assert r["ts"] == want_us
    assert r["st"]["x"] == 1 and r["st"]["y"] == "p"


def test_jvm_avro_reads_our_files(spark, tmp_path):
    """Cross-decoder proof: the official Apache Avro JVM library reads
    the sink's files and sees the same record count."""
    df = spark.range(50).select(F.col("id"), F.col("id").cast("string").alias("s"))
    out = str(tmp_path / "jvm")
    [path] = write_avro_ocf(df.coalesce(1), out)
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    n = 0
    while rdr.hasNext():
        rdr.next()
        n += 1
    assert n == 50


def test_schema_mismatch_and_missing_path_raise(spark, tmp_path):
    a = str(tmp_path / "mix")
    write_avro_ocf(spark.range(3).select("id"), a)
    write_avro_ocf(
        spark.range(3).select(F.col("id").cast("string").alias("id")), a
    )
    with pytest.raises(Exception, match="writer schema differs"):
        read_avro_ocf(spark, a).collect()
    with pytest.raises(FileNotFoundError):
        read_avro_ocf(spark, str(tmp_path / "nope" / "*.avro"))


def test_spark_avro_schema_nullable_unions():
    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), False),
        ]
    )
    avro = spark_avro_schema(sch)
    assert avro["fields"][0]["type"] == ["null", "long"]
    assert avro["fields"][1]["type"] == "string"
