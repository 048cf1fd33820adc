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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
