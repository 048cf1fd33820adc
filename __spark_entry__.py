"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (keep-latest key compaction over the topic
                 view) at sf0.001.
queries()      — every implemented operator from SURVEY.md §2 as
                 (spark, sf_dir) -> DataFrame.
oracle_sql()   — matching DuckDB SQL for the driver's correctness gate.

Implementation lives in redpanda_spark/ (see SURVEY.md for the design).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redpanda_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: keep-latest key compaction (the reference's signature
    log-storage operator, `disk_log_impl.cc:560-700`) over the sf0.001
    events topic view."""
    return QUERIES["log_compact"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate holds 50 slots; the catalog is larger. Queries
# listed here run FIRST so entries without a recent driver row (and this
# round's fixes/additions) are guaranteed a slot; the remainder keep their
# catalog order and rotate through the leftover slots in later rounds.
_PRIORITY = [
    # never driver-checked before round 4
    "pipeline_split",
    "pipeline_mix",
    "pipeline_redact",
    "pipeline_pack",
    "emb_quantize",
    "datalake_translate",
    "tpch_q2ish",
    "tpch_q8ish",
    "tpch_q9ish",
    "tpch_q11ish",
    "tpch_q16ish",
    "tpch_q17ish",
    "tpch_q20ish",
    "tpch_q21ish",
    "tpch_q22ish",
    # new in round 4
    "datalake_translate_avro",
    "datalake_translate_proto",
    "mm_audio_metadata",
    "tpch_q12ish",
    "mm_jpeg_metadata",
    # regressed in r3, fixed in r4 (TIMESTAMP_NTZ normalization)
    "log_compact_tombstones",
    "events_sessionize",
    "stream_window_stats",
    "stream_sessionize",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
