"""Bucketed tables: co-located, shuffle-free fact-fact joins.

At 100 TB the single biggest shuffle in most pipelines is the fact-fact
join (lineitem x orders, events x profile). Spark's answer is bucketing:
both tables are written pre-hash-partitioned into the same number of
buckets on the join key (``bucketBy(n, key).sortBy(key)``), and a join on
that key then reads bucket i of each side into the same task — **no
Exchange on either side** (with ``sortBy``, no Sort either: the scan
feeds SortMergeJoin directly). The cost is paid once at write time and
amortized over every subsequent join/aggregation on the key, exactly like
the reference's producer-side murmur2 hash partitioning pays ingest-time
cost for read-side locality (`cluster/partition_allocator.cc`).

Notes that matter at scale:
- both tables MUST use the same bucket count and key, or Spark falls
  back to shuffling the mismatched side;
- ``spark.sql.sources.bucketing.enabled`` is on by default; writes go
  through ``saveAsTable`` because bucket metadata lives in the catalog;
- a groupBy on the bucket key is also shuffle-free (partial = final);
- bucket pruning applies to equality filters on the bucket key.

``assert_no_exchange`` is the test hook: it fails if any Exchange node
survives in the executed plan, which is the property this module exists
to provide.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) on ``key``.

    ``buckets`` should be sized so one bucket of the bigger table fits an
    executor's task comfortably (rows/buckets x row width ~ 100-500 MB at
    cluster scale).

    The input is repartitioned to (buckets, key) first — Spark's bucket
    assignment and ``repartition``'s hash partitioning use the same
    murmur3-pmod function, so this yields exactly ONE file per bucket.
    Without it every input task writes its own file per bucket
    (tasks x buckets small files), and with multiple sorted files per
    bucket Spark must re-Sort on read, forfeiting the sortBy."""
    src = df.repartition(buckets, F.col(key))
    w = src.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with zero
    Exchange nodes when the bucket specs line up (assert with
    ``assert_no_exchange`` in tests).

    The merge hint pins a sort-merge join: without it a dim table under
    the session's autoBroadcastJoinThreshold plans a BroadcastExchange —
    correct but defeating the co-location this helper exists to use (and
    every caller previously had to hand-roll a threshold disable/restore
    around the plan assertion)."""
    return spark.table(left_table).join(
        spark.table(right_table).hint("merge"), key, how
    )


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_EXCHANGE_NODE = re.compile(r"\b(?:BroadcastExchange|ShuffleExchange|Exchange)\b")


def assert_no_exchange(df: DataFrame) -> None:
    """Raise if the physical plan contains any Exchange NODE (shuffle or
    broadcast) — the co-location guarantee bucketing is for. Matches node
    names on word boundaries, not a bare substring (a column named
    ``ExchangeRate`` must not fail a shuffle-free plan)."""
    plan = plan_string(df)
    if _EXCHANGE_NODE.search(plan):
        raise AssertionError(f"plan contains an Exchange:\n{plan}")
