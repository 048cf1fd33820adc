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
# ROUND-6 ROTATION NOTE: this round's priority list fills 49 of 50 slots
# with round-5-new/changed queries plus the 20 queries that only had r3
# rows. The 45 queries NOT in this list all hold green r4 driver rows;
# next round, swap this list for (new r6 queries + those 45, oldest rows
# first) so no row ages past one round.
_PRIORITY = [
    # new in round 5
    "dedup_cluster",
    "events_approx_users",
    "events_quantiles",
    "pipeline_shuffle",
    "bpe_pair_counts",
    "bpe_train",
    "curation_dedup",
    "dedup_incremental",
    "doc_perplexity",
    "log_max_timestamp",
    "corpus_report",
    "events_funnel",
    "mm_image_dedup",
    "datalake_translate_registry",
    "decontaminate",
    "doc_repetition",
    "dedup_semantic",
    "events_enrich",
    "events_asof",
    "events_interval",
    "doc_span_dedup",
    "pipeline_sample",
    "doc_quality_classifier",
    "emb_project",
    "curation_v2",
    # code changed in round 5 (enum field; flat-layout engine; unpersist)
    "datalake_translate_proto",
    "datalake_translate_avro",
    "dedup_minhash",
    "dedup_ngram",
    # only r3 driver rows — rotate in so no query's row is older than one
    # round (the gate checks the first 50 queries() entries)
    "events_props_extract",
    "events_topk_users",
    "tpch_q6",
    "tpch_q10ish",
    "mm_image_metadata",
    "mm_frame_sample",
    "mm_video_metadata",
    "mm2_routing",
    "doc_quality",
    "tpch_q4ish",
    "tpch_q14",
    "tpch_q18",
    "doc_bpe_tokens",
    "tpch_q7ish",
    "tpch_q19ish",
    "stream_idempotent_dedup",
    "tpch_q13ish",
    "tpch_q15ish",
    "transform_fanout",
    "curation_pipeline",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
