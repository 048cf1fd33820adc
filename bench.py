"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Headline set = the operators that dominate a 100 TB deployment: keep-latest
compaction, offset/time scans, read_committed visibility, the heavy
analytics joins, and the training-data ops (dedup, ANN, text stats).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redpanda_spark.plans.queries import QUERIES
from redpanda_spark.session import get_spark

BENCH_QUERIES = [
    "log_fetch",
    "log_list_offsets",
    "log_timequery",
    "log_compact",
    "log_idempotent_dedup",
    "group_offset_fetch",
    "tx_read_committed",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5ish",
    "events_daily",
    "doc_token_stats",
    "doc_lang_id",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram",
    "ann_topk",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("redpanda-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing so per-query numbers measure the plans
    QUERIES["log_list_offsets"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)
        # Queries that persist intermediates (LSH band frames) must not
        # bleed cache/GC pressure into the next query's measurement.
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
