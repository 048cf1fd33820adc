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
# ROUND-9 ROTATION (current list, from `tools/rotate_priority.py --slots 50
# --changed <the 27 representation-converted queries>`): the 27 queries whose
# OUTPUT REPRESENTATION changed this round (the r8 decimal-canonicalization
# red class plus 7 same-class conversions that held green r5 rows —
# events_topk_users, tpch_q6/q10ish/q18/q7ish/q19ish/q15ish — all now
# emitting double/string, plus pipeline_shuffle's r9 bucketed-rank rewrite
# with long positions) take the head slots so every fix
# gets a fresh driver row; then the r4-row holders (pipeline_mix/redact/
# pack) and the oldest r5-row holders up to the 50-slot cutoff. With the
# catalog at 136 and 50 slots, steady-state worst staleness is
# ceil(136/50) = 3 rounds; after this round no query's newest row is older
# than 3 rounds (r5 holders events_interval..events_funnel roll next).
#
# CANARY PROTOCOL (policy, from the r8 verdict): any output-representation
# convention change lands on tpch_q1 + mixture_plan in their own commit
# FIRST and converts the rest of the catalog in a follow-up commit, so a
# skipped driver round bounds the blast radius of a wrong convention to 2
# slots, not 19.
_PRIORITY = [
    "tpch_q1",  # changed
    "tpch_q3",  # changed
    "tpch_q5ish",  # changed
    "tpch_q9ish",  # changed
    "tpch_q11ish",  # changed
    "tpch_q22ish",  # changed
    "events_daily",  # changed
    "events_rollup",  # changed
    "events_retention",  # changed
    "events_anomaly",  # changed
    "events_skew_join",  # changed
    "events_bucketed_join",  # changed
    "iceberg_delete_read",  # changed
    "iceberg_upsert_read",  # changed
    "iceberg_eq_delete_read",  # changed
    "mixture_plan",  # changed
    "dedup_rate_by_source",  # changed
    "doc_bm25",  # changed
    "emb_covariance",  # changed
    "pipeline_shuffle",  # changed (r9: bucketed rank, pos int->long)
    "pipeline_mix",  # r4
    "pipeline_redact",  # r4
    "pipeline_pack",  # r4
    "dedup_ngram",  # r5
    "dedup_minhash",  # r5
    "events_props_extract",  # r5
    "events_topk_users",  # changed
    "tpch_q6",  # changed
    "tpch_q10ish",  # changed
    "mm_image_metadata",  # r5
    "mm_frame_sample",  # r5
    "mm_video_metadata",  # r5
    "mm2_routing",  # r5
    "doc_quality",  # r5
    "tpch_q4ish",  # r5
    "tpch_q14",  # r5
    "tpch_q18",  # changed
    "doc_bpe_tokens",  # r5
    "tpch_q7ish",  # changed
    "tpch_q19ish",  # changed
    "stream_idempotent_dedup",  # r5
    "tpch_q13ish",  # r5
    "tpch_q15ish",  # changed
    "transform_fanout",  # r5
    "datalake_translate_avro",  # r5
    "datalake_translate_proto",  # r5
    "datalake_translate_registry",  # r5
    "decontaminate",  # r5
    "doc_repetition",  # r5
    "events_enrich",  # r5
    "events_asof",  # r5
    "events_interval",  # r5
    "doc_span_dedup",  # r5
    "pipeline_sample",  # r5
    "doc_quality_classifier",  # r5
    "emb_project",  # r5
    "curation_v2",  # r5
    "dedup_cluster",  # r5
    "events_approx_users",  # r5
    "events_quantiles",  # r5
    "bpe_pair_counts",  # r5
    "bpe_train",  # r5
    "curation_dedup",  # r5
    "dedup_incremental",  # r5
    "doc_perplexity",  # r5
    "log_max_timestamp",  # r5
    "corpus_report",  # r5
    "events_funnel",  # r5
    "log_list_offsets",  # r6
    "log_timequery",  # r6
    "log_retention_time",  # r6
    "log_delete_records",  # r6
    "log_compact",  # r6
    "log_idempotent_dedup",  # r6
    "group_offset_fetch",  # r6
    "group_lag",  # r6
    "doc_token_stats",  # r6
    "doc_lang_id",  # r6
    "doc_fingerprint",  # r6
    "dedup_exact",  # r6
    "dedup_simhash",  # r6
    "ann_topk",  # r6
    "log_compact_tombstones",  # r6
    "log_retention_size",  # r6
    "group_list_groups",  # r6
    "events_sessionize",  # r6
    "mm_audio_metadata",  # r6
    "mm_jpeg_metadata",  # r6
    "stream_window_stats",  # r6
    "stream_sessionize",  # r6
    "emb_quantize",  # r6
    "tpch_q8ish",  # r6
    "tpch_q17ish",  # r6
    "datalake_translate",  # r6
    "tpch_q12ish",  # r6
    "tpch_q2ish",  # r6
    "mm_image_dedup",  # r6
    "doc_perplexity_serve",  # r6
    "doc_chunk",  # r6
    "pipeline_upsample",  # r6
    "iceberg_export_counts",  # r6
    "events_window_topk",  # r6
    "ann_pq",  # r6
    "doc_gopher_rules",  # r6
    "doc_lang_eval",  # r6
    "log_fetch",  # r8
    "tx_read_committed",  # r8
    "emb_near_dup",  # r8
    "ann_ivf",  # r8
    "curation_pipeline",  # r8
    "tpch_q16ish",  # r8
    "tpch_q20ish",  # r8
    "tpch_q21ish",  # r8
    "pipeline_split",  # r8
    "dedup_semantic",  # r8
    "log_fetch_bytes",  # r8
    "ann_ivfpq",  # r8
    "doc_ngram_topk",  # r8
    "log_segments",  # r8
    "ann_nsw",  # r8
    "ann_nsw_incremental",  # r8
    "ann_nsw_delete",  # r8
    "ann_nsw_filtered",  # r8
    "doc_hybrid_search",  # r8
    "decontaminate_semantic",  # r8
    "emb_kmeans",  # r8
    "pipeline_dsir",  # r8
    "events_sketch_merge",  # r8
    "events_zorder",  # r8
    "log_fetch_tiered",  # r8
    "log_tiered_timequery",  # r8
    "log_tiered_retention",  # r8
    "doc_tfidf_terms",  # r8
    "events_histogram",  # r8
    "pipeline_curriculum",  # r8
    "log_replica_fetch",  # r8
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
