"""SparkSession builder tuned for the engine.

Local testing runs on ``local[N]``; the config choices below are the ones
that matter at cluster scale too: AQE on (runtime re-plan, skew-join
handling), shuffle partitions sized for the data volume, Arrow enabled for
the few Pandas-UDF paths, and broadcast threshold high enough that dimension
tables always broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "redpanda_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Prefer shuffled-hash over sort-merge when the planner's size
        # guards allow it (guide §3.1): drops both sort passes from
        # shuffle joins; SHJ spills gracefully since Spark 3.2. Measured
        # on the sf0.1 headline heavy set: 14.49 -> 13.08 s
        # (dedup_minhash -16%, dedup_ngram -28%, tpch_q21ish -15%), and
        # flat at sf1 (dedup_minhash 4.55 vs 4.14 s warm).
        # NOTE: the companion AQE rewrite
        # (spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=128m)
        # was tried and REVERTED: it made sf1 dedup_minhash 51 s vs 4 s
        # (pathological runtime SMJ->SHJ rewrites on the verify joins) —
        # it stays at its 0 default unless explicitly overridden.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"))
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP", "0"))
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # manifest-based visibility makes _SUCCESS markers dead weight; on
        # object stores they'd be an extra PUT per micro-batch
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        # testdata parquet may lack the UTC-adjusted flag; read event time as
        # TIMESTAMP (not NTZ) so watermarks/epoch arithmetic work uniformly
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
