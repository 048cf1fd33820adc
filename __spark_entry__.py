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
#
# ROUND-7 ROTATION NOTE: this list = round-6-new queries (7, no rows yet)
# + the queries whose newest driver row is r4. The catalog (102) now
# exceeds 2x the gate (50), so a strict every-row-within-one-round is no
# longer possible; the invariant becomes "no row older than two rounds".
# Next round's priority: new r7 queries + the displaced r4-row holders
# (tpch_q12ish onward through pipeline_pack — every r4-row holder past
# slot 50; put them FIRST) + the 45 r5-row holders.
_PRIORITY = [
    # new in round 6 (no driver row yet)
    "doc_perplexity_serve",
    "log_fetch_bytes",
    "doc_chunk",
    "mixture_plan",
    "pipeline_upsample",
    "events_window_topk",
    "iceberg_export_counts",
    "ann_pq",
    "doc_gopher_rules",
    "ann_ivfpq",
    "events_rollup",
    "doc_lang_eval",
    # changed in round 6
    "log_fetch",  # engine produce/fetch hot path + tail cache touched
    "dedup_simhash",  # banded join: localCheckpoint + max_bucket
    "mm_image_dedup",  # dhash top-bit mask change
    "log_retention_time",  # integer-us cutoff unification
    # only r4 driver rows — rotate in so no row ages past one round
    "log_list_offsets",
    "log_timequery",
    "log_delete_records",
    "log_compact",
    "log_idempotent_dedup",
    "group_offset_fetch",
    "group_lag",
    "tx_read_committed",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5ish",
    "events_daily",
    "doc_token_stats",
    "doc_lang_id",
    "doc_fingerprint",
    "dedup_exact",
    "emb_near_dup",
    "ann_topk",
    "ann_ivf",
    "log_compact_tombstones",
    "log_retention_size",
    "group_list_groups",
    "events_sessionize",
    "mm_audio_metadata",
    "mm_jpeg_metadata",
    "stream_window_stats",
    "stream_sessionize",
    "emb_quantize",
    "tpch_q8ish",
    "tpch_q17ish",
    "datalake_translate",
    "tpch_q12ish",
    "tpch_q2ish",
    "tpch_q9ish",
    "tpch_q11ish",
    "tpch_q16ish",
    "tpch_q20ish",
    "tpch_q21ish",
    "tpch_q22ish",
    "pipeline_split",
    "pipeline_mix",
    "pipeline_redact",
    "pipeline_pack",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
