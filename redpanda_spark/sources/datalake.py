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


def write_datalake(
    df: DataFrame, path: str, mode: str = "append", fmt: str = "parquet"
) -> None:
    """Hour-partitioned table write (Iceberg commit analog: the parquet/
    Delta directory commit). Swap fmt='iceberg' + writeTo on clusters with
    the Iceberg catalog configured."""
    df.write.mode(mode).partitionBy("_hour").format(fmt).save(path)
