"""Query catalog: every implemented operator as a (spark, sf_dir) -> DataFrame
callable plus a DuckDB oracle SQL string (SURVEY.md §2 coverage).

Cross-engine determinism conventions (driver hash-compares values):
- money/float aggregates: cast to DECIMAL(18,4) first (exact, order-free
  sums), cast the result to double, round(…, 6)
- every ranking has a unique-key tiebreak
- int widths cast explicitly on both sides (Spark row_number is int,
  DuckDB's is bigint, etc.)

The log operators run over the ``events`` table adapted to the canonical
topic/partition/offset shape (sources.tables.topic_view); idempotence /
group-commit / transaction inputs are deterministic simulations derived
from event columns, mirrored exactly in the oracle CTEs.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redpanda_spark.dedup.exact import exact_dedup_ids
from redpanda_spark.dedup.minhash import near_dup_pairs
from redpanda_spark.dedup.ngram import ngram_jaccard_pairs
from redpanda_spark.dedup.simhash import simhash_near_dups
from redpanda_spark.functions import text as TXT
from redpanda_spark.functions.vectors import as_double
from redpanda_spark.operators import log as LOG
from redpanda_spark.operators.compaction import compact_keep_latest
from redpanda_spark.operators.groups import group_lag, offset_fetch
from redpanda_spark.operators.transactions import idempotent_dedup, read_committed
from redpanda_spark.similarity.ann import (
    brute_force_topk,
    fit_ivf_centroids,
    ivf_assign,
    ivf_topk,
)
from redpanda_spark.sources.tables import (
    load_table,
    parallelize_narrow,
    topic_view,
    topic_view_oracle_sql,
)

NUM_PARTITIONS = 8
TIMEQUERY_TS = "2024-01-15 00:00:00"
RETENTION_CUTOFF = "2024-01-10 00:00:00"
DELETE_RECORDS_STARTS = {0: 50, 1: 100, 2: 150, 3: 200}

LOG_CTE = f"log AS ({topic_view_oracle_sql(NUM_PARTITIONS)})"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Log-storage operators (SURVEY.md §2.1–2.2)
# --------------------------------------------------------------------------


def q_log_fetch(spark, sf_dir):
    """Fetch RPC: offset-range scan of one partition (fetch.cc:300)."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS)
    return LOG.fetch(log, partition=3, start_offset=100, end_offset=300).select(
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("event_id").alias("event_id"),
        F.col("event_type").alias("event_type"),
    )


SQL_LOG_FETCH = f"""
WITH {LOG_CTE}
SELECT CAST(partition AS INTEGER) AS partition, CAST("offset" AS BIGINT) AS "offset",
       event_id, event_type
FROM log WHERE partition = 3 AND "offset" >= 100 AND "offset" < 300
"""


def q_log_list_offsets(spark, sf_dir):
    """ListOffsets earliest/latest specials (list_offsets.cc:100-132)."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS)
    return LOG.list_offsets(log).select(
        F.col("partition").cast("int"),
        F.col("earliest_offset").cast("long"),
        F.col("latest_offset").cast("long"),
    )


SQL_LOG_LIST_OFFSETS = f"""
WITH {LOG_CTE}
SELECT CAST(partition AS INTEGER) AS partition,
       CAST(MIN("offset") AS BIGINT) AS earliest_offset,
       CAST(MAX("offset") + 1 AS BIGINT) AS latest_offset
FROM log GROUP BY partition
"""


def q_log_timequery(spark, sf_dir):
    """ListOffsets timequery: first offset with ts >= T (disk_log_impl.cc:2545)."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS).withColumnRenamed("ts", "timestamp")
    return LOG.timequery(log, F.to_timestamp(F.lit(TIMEQUERY_TS))).select(
        F.col("partition").cast("int"), F.col("offset").cast("long")
    )


SQL_LOG_TIMEQUERY = f"""
WITH {LOG_CTE}
SELECT CAST(partition AS INTEGER) AS partition,
       CAST(MIN("offset") AS BIGINT) AS "offset"
FROM log WHERE ts >= TIMESTAMP '{TIMEQUERY_TS}' GROUP BY partition
"""


def q_log_retention_time(spark, sf_dir):
    """Time-retention GC survivors (disk_log_impl.cc:260-366)."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS).withColumnRenamed("ts", "timestamp")
    kept = LOG.retain_by_time(log, F.to_timestamp(F.lit(RETENTION_CUTOFF)))
    return kept.groupBy(F.col("partition").cast("int").alias("partition")).agg(
        F.count("*").alias("n_kept"),
        F.min("offset").cast("long").alias("first_kept_offset"),
    )


SQL_LOG_RETENTION_TIME = f"""
WITH {LOG_CTE}
SELECT CAST(partition AS INTEGER) AS partition, COUNT(*) AS n_kept,
       CAST(MIN("offset") AS BIGINT) AS first_kept_offset
FROM log WHERE ts >= TIMESTAMP '{RETENTION_CUTOFF}' GROUP BY partition
"""


def q_log_delete_records(spark, sf_dir):
    """DeleteRecords prefix truncation (delete_records.cc:115-172)."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS)
    kept = LOG.delete_records(log, DELETE_RECORDS_STARTS)
    return kept.groupBy(F.col("partition").cast("int").alias("partition")).agg(
        F.count("*").alias("n_kept"), F.min("offset").cast("long").alias("log_start_offset")
    )


_starts_case = " ".join(
    f"WHEN {p} THEN {o}" for p, o in DELETE_RECORDS_STARTS.items()
)
SQL_LOG_DELETE_RECORDS = f"""
WITH {LOG_CTE}
SELECT CAST(partition AS INTEGER) AS partition, COUNT(*) AS n_kept,
       CAST(MIN("offset") AS BIGINT) AS log_start_offset
FROM log WHERE "offset" >= (CASE partition {_starts_case} ELSE 0 END)
GROUP BY partition
"""


def q_log_compact(spark, sf_dir):
    """Keep-latest key compaction (disk_log_impl.cc:560-700, key_offset_map.h)."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS).select(
        "partition", "offset", "event_id", "user_id", "event_type", "value"
    )
    out = compact_keep_latest(log, ["partition", "user_id"], order_col="offset")
    return out.select(
        F.col("partition").cast("int"),
        F.col("user_id"),
        F.col("offset").cast("long"),
        F.col("event_id"),
        F.col("event_type"),
    )


SQL_LOG_COMPACT = f"""
WITH {LOG_CTE}
SELECT CAST(partition AS INTEGER) AS partition, user_id,
       CAST("offset" AS BIGINT) AS "offset", event_id, event_type
FROM log
QUALIFY ROW_NUMBER() OVER (PARTITION BY partition, user_id ORDER BY "offset" DESC) = 1
"""


def q_log_idempotent_dedup(spark, sf_dir):
    """Idempotent-produce dedup on (pid, epoch, seq) (rm_stm.h:67-73).

    Simulated producer metadata: producer_id=user_id, epoch=0,
    base_sequence=event_id/2 (adjacent events collide → duplicates)."""
    log = (
        topic_view(spark, sf_dir, NUM_PARTITIONS)
        .withColumn("producer_id", F.col("user_id"))
        .withColumn("producer_epoch", F.lit(0).cast("short"))
        .withColumn("base_sequence", F.expr("event_id div 2").cast("int"))
        .select("partition", "offset", "producer_id", "producer_epoch", "base_sequence")
    )
    out = idempotent_dedup(log)
    return out.groupBy(F.col("partition").cast("int").alias("partition")).agg(
        F.count("*").alias("n_after_dedup"),
        F.max("offset").cast("long").alias("max_offset"),
    )


SQL_LOG_IDEMPOTENT_DEDUP = f"""
WITH {LOG_CTE},
deduped AS (
  SELECT partition, "offset"
  FROM log
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY partition, user_id, CAST(event_id // 2 AS INTEGER)
    ORDER BY "offset") = 1
)
SELECT CAST(partition AS INTEGER) AS partition, COUNT(*) AS n_after_dedup,
       CAST(MAX("offset") AS BIGINT) AS max_offset
FROM deduped GROUP BY partition
"""


# --------------------------------------------------------------------------
# Consumer groups (SURVEY.md §2.3)
# --------------------------------------------------------------------------


def _sim_commits(spark, sf_dir):
    """Deterministic commit log derived from events: each event is an
    offset-commit by group=event_type for its partition."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS)
    return log.select(
        F.col("event_type").alias("group_id"),
        F.lit("events").alias("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("committed_offset"),
        F.lit(0).alias("leader_epoch"),
        F.lit(None).cast("string").alias("metadata"),
        F.col("event_id").alias("commit_seq"),
        (F.col("event_id") % 97 == 0).alias("deleted"),
    )


_SIM_COMMITS_CTE = f"""
commits AS (
  SELECT event_type AS group_id, 'events' AS topic,
         CAST(partition AS INTEGER) AS partition,
         CAST("offset" AS BIGINT) AS committed_offset,
         0 AS leader_epoch, NULL AS metadata,
         event_id AS commit_seq, (event_id % 97 = 0) AS deleted
  FROM log
)
"""


def q_group_offset_fetch(spark, sf_dir):
    """OffsetFetch: latest non-tombstoned commit per (group, partition)
    (group_metadata.h:71,121; compacted __consumer_offsets replay)."""
    commits = _sim_commits(spark, sf_dir)
    return offset_fetch(commits).select("group_id", "partition", "committed_offset")


SQL_GROUP_OFFSET_FETCH = f"""
WITH {LOG_CTE}, {_SIM_COMMITS_CTE},
latest AS (
  SELECT * FROM commits
  QUALIFY ROW_NUMBER() OVER (PARTITION BY group_id, topic, partition
                             ORDER BY commit_seq DESC) = 1
)
SELECT group_id, partition, committed_offset FROM latest WHERE NOT deleted
"""


def q_group_lag(spark, sf_dir):
    """Per-group lag = high watermark − committed offset."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS)
    commits = _sim_commits(spark, sf_dir)
    ends = LOG.high_watermark(log).select(
        F.lit("events").alias("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("high_watermark").cast("long"),
    )
    return group_lag(commits, ends).select(
        "group_id", "partition", F.col("lag").cast("long")
    )


SQL_GROUP_LAG = f"""
WITH {LOG_CTE}, {_SIM_COMMITS_CTE},
latest AS (
  SELECT * FROM commits
  QUALIFY ROW_NUMBER() OVER (PARTITION BY group_id, topic, partition
                             ORDER BY commit_seq DESC) = 1
),
ends AS (
  SELECT CAST(partition AS INTEGER) AS partition,
         CAST(MAX("offset") + 1 AS BIGINT) AS hwm
  FROM log GROUP BY partition
)
SELECT l.group_id, l.partition, CAST(e.hwm - l.committed_offset AS BIGINT) AS lag
FROM latest l JOIN ends e USING (partition) WHERE NOT l.deleted
"""


# --------------------------------------------------------------------------
# Transactions / read_committed (SURVEY.md §2.4)
# --------------------------------------------------------------------------


def _sim_txlog(spark, sf_dir):
    # NOT cached (r13 measurement): read_committed consumes the windowed
    # log 4 ways with different columns pruned per subtree, so the plan
    # windows the events table 4x — but each re-execution is narrow
    # (2-3 columns) and caching the full-width window output measured
    # SLOWER (1.05 s vs 0.90 s at sf0.1) than the pruned recomputes.
    log = (
        topic_view(spark, sf_dir, NUM_PARTITIONS)
        .withColumn("producer_id", F.col("user_id"))
        .withColumn("is_transactional", F.col("event_type") == "purchase")
        .withColumn("is_control", F.col("event_id") % 101 == 0)
    )
    first_purchase = (
        log.where(F.col("is_transactional"))
        .groupBy("partition", "producer_id")
        .agg(F.min("offset").alias("first_offset"))
    )
    tx_ranges = first_purchase.select(
        F.lit("events").alias("topic"),
        "partition",
        "producer_id",
        "first_offset",
        (F.col("first_offset") + 20).alias("last_offset"),
        F.when(F.col("producer_id") % 3 == 0, "aborted")
        .when(F.col("producer_id") % 3 == 1, "committed")
        .otherwise("open")
        .alias("outcome"),
    )
    return log, tx_ranges


_SIM_TX_CTE = """
txlog AS (
  SELECT *, user_id AS producer_id,
         (event_type = 'purchase') AS is_transactional,
         (event_id % 101 = 0) AS is_control
  FROM log
),
tx_ranges AS (
  SELECT partition, producer_id, MIN("offset") AS first_offset,
         MIN("offset") + 20 AS last_offset,
         CASE CAST(producer_id % 3 AS INTEGER) WHEN 0 THEN 'aborted'
              WHEN 1 THEN 'committed' ELSE 'open' END AS outcome
  FROM txlog WHERE is_transactional GROUP BY partition, producer_id
),
lso AS (
  SELECT h.partition,
         LEAST(COALESCE(o.open_first, h.hwm), h.hwm) AS lso
  FROM (SELECT partition, MAX("offset") + 1 AS hwm FROM log GROUP BY partition) h
  LEFT JOIN (SELECT partition, MIN(first_offset) AS open_first
             FROM tx_ranges WHERE outcome = 'open' GROUP BY partition) o
  USING (partition)
)
"""


def q_tx_read_committed(spark, sf_dir):
    """read_committed fetch view: drop control rows, aborted ranges, rows ≥ LSO
    (fetch.cc:116-187,341-399)."""
    log, tx_ranges = _sim_txlog(spark, sf_dir)
    vis = read_committed(log, tx_ranges)
    return vis.groupBy(F.col("partition").cast("int").alias("partition")).agg(
        F.count("*").alias("n_visible"), F.max("offset").cast("long").alias("max_offset")
    )


SQL_TX_READ_COMMITTED = f"""
WITH {LOG_CTE}, {_SIM_TX_CTE}
SELECT CAST(t.partition AS INTEGER) AS partition, COUNT(*) AS n_visible,
       CAST(MAX(t."offset") AS BIGINT) AS max_offset
FROM txlog t
JOIN lso USING (partition)
WHERE NOT t.is_control AND t."offset" < lso.lso
  AND NOT EXISTS (
    SELECT 1 FROM tx_ranges a
    WHERE a.outcome = 'aborted' AND a.partition = t.partition
      AND a.producer_id = t.producer_id AND t.is_transactional
      AND t."offset" BETWEEN a.first_offset AND a.last_offset)
GROUP BY t.partition
"""


# --------------------------------------------------------------------------
# Analytics layer: TPC-H-style aggregations/joins over the star schema
# --------------------------------------------------------------------------


def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00"))
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # decimal arithmetic internally (exact, order-independent sums);
            # final emit = CAST(CAST(ROUND(decimal,6) AS VARCHAR) AS DOUBLE): both engines
            # round the identical exact decimal, then cast to the identical
            # IEEE-754 double. Emitting the decimal itself fails the driver
            # hash (DuckDB .df() renders DECIMAL as float64 while Spark
            # keeps Decimal — r8, 19/50 red).
            F.round(F.sum(dec("l_quantity")), 6).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 6).cast("double").alias("sum_base_price"),
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))), 6).cast("double").alias("sum_disc_price"),
            F.round(
                (F.sum(dec("l_quantity")) / F.count("*")).cast("double"), 6
            ).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 6) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) / COUNT(*) AS DOUBLE), 6) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1995-03-15 00:00:00"))
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    # shuffle_hash on the orders side (guide §3.1, r14): the planner's
    # choice here is estimate-driven and wrong in both directions — at sf10
    # it sort-merges (two sorts), while sibling queries broadcast the 15M-row
    # orders side off a <64 MB column-pruned estimate (~240 MB real). The
    # hint pins the strategy whose per-partition build (rows/width × ~40 B)
    # stays a few MB at any data-scaled width. Measured (interleaved,
    # outputs identical): sf10 4.07→3.44 s best, sf0.1 0.68→0.57 s.
    return (
        li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))), 6).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 6) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_tpch_q5ish(spark, sf_dir):
    """Revenue per nation (supplier-side), region-filtered broadcast joins."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    dims = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "n_name", "r_name")
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))), 6).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_TPCH_Q5ISH = """
SELECT r_name, n_name,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 6) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_events_daily(spark, sf_dir):
    """Streaming-analytics analog: per-type daily counts + exact value sums."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("event_type"), F.to_date(F.col("ts")).alias("day")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 6).cast("double").alias(
                "sum_value"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


SQL_EVENTS_DAILY = """
SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type, CAST(ts AS DATE)
"""


# --------------------------------------------------------------------------
# Training-data pipeline: text analysis + dedup + similarity
# --------------------------------------------------------------------------


def q_doc_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TXT.token_count("text").alias("n_tokens"),
        TXT.char_count("text").cast("long").alias("n_chars_computed"),
        F.round(TXT.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(TXT.stopword_ratio("text"), 6).alias("stopword_ratio"),
    )


_SW = ", ".join(f"'{w}'" for w in TXT.STOPWORDS_EN)
SQL_DOC_TOKEN_STATS = f"""
SELECT doc_id,
  CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')) AS INTEGER) AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_computed,
  ROUND(CASE WHEN length(text) > 0
    THEN CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) / length(text)
    ELSE 0.0 END, 6) AS punct_ratio,
  ROUND(CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')) > 0
    THEN CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              t -> lower(t) IN ({_SW}))) AS DOUBLE)
         / len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != ''))
    ELSE 0.0 END, 6) AS stopword_ratio
FROM documents
"""


def q_doc_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TXT.lang_id("text").alias("lang_pred"))


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in TXT.LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split_regex(trim(text), '\\s+'), "
        f"t -> lower(t) IN ({markers})))"
    )


# argmax with ties → higher language code wins (matches Spark's struct
# (score, lang) array_max): first match in code-descending order whose score
# is positive and >= all others.
_langs_desc = sorted(TXT.LANG_MARKERS, reverse=True)
_lang_case = "CASE "
for lang in _langs_desc:
    all_ge = " AND ".join(f"s_{lang} >= s_{o}" for o in _langs_desc if o != lang)
    _lang_case += f"WHEN s_{lang} > 0 AND {all_ge} THEN '{lang}' "
_lang_case += "ELSE 'und' END"

_lang_scores_select = ", ".join(
    f"{_lang_score_sql(lang)} AS s_{lang}" for lang in TXT.LANG_MARKERS
)
SQL_DOC_LANG_ID = f"""
WITH scored AS (SELECT doc_id, {_lang_scores_select} FROM documents)
SELECT doc_id, {_lang_case} AS lang_pred FROM scored
"""


def q_doc_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TXT.fingerprint("text").cast("long").alias("fp")
    )


SQL_DOC_FINGERPRINT = f"""
SELECT doc_id, CAST(list_reduce(
  list_prepend(CAST(0 AS BIGINT),
    list_transform(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != ''),
                   t -> CAST(length(t) * 97 + ascii(t) AS BIGINT))),
  (acc, x) -> (acc * 31 + x) % {TXT.FP_MOD}) AS BIGINT) AS fp
FROM documents
"""


def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup_ids(docs)


SQL_DEDUP_EXACT = """
SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
"""


def _parquet_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count straight from parquet footers (no Spark job).
    Footer num_rows is authoritative for the file's contents, so the
    value is safe anywhere an exact COUNT(*) of the raw table is needed
    (load_table's type adaptions are row-preserving); returns None when
    the layout is unreadable so callers fall back to counting."""
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, f"{name}.parquet")
    try:
        paths = (
            [os.path.join(src, f) for f in sorted(os.listdir(src))
             if f.endswith(".parquet")]
            if os.path.isdir(src)
            else [src]
        )
        return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    except Exception:
        return None


def q_dedup_ngram(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, shingle_n=2, threshold=0.3,
        n_docs_hint=_parquet_rows(sf_dir, "documents"),
    )


SQL_DEDUP_NGRAM = """
WITH sh AS MATERIALIZED (
  SELECT doc_id AS id, unnest(list_distinct(
    list_transform(range(len(toks) - 1),
      i -> toks[i + 1] || ' ' || toks[i + 2]))) AS s
  FROM (SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks
        FROM documents)
  WHERE len(toks) >= 2
  UNION ALL
  SELECT doc_id AS id, list_aggregate(toks, 'string_agg', ' ') AS s
  FROM (SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks
        FROM documents)
  WHERE len(toks) < 2
),
sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
  ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.3
"""


def q_dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup pairs ≥ 0.5 Jaccard.

    Oracle: the exact shingle-Jaccard pair set. Sound because the output
    is exact-verified (candidates are re-scored with true Jaccard before
    the threshold), so Spark ⊆ oracle ALWAYS — zero false positives at
    any scale. Recall is the banded-LSH S-curve: on this corpus every
    real pair up to sf10 is a high-jaccard planted dup where detection
    ≈ 1, so Spark = oracle exactly there (asserted sf0.01/0.1/1/10 —
    which is why this can be a hash-matched gate row). sf100 is the
    first scale with BORDERLINE pairs (chance cross-copy overlaps at
    j 0.5-0.6, detection 0.40-0.67 at 8 bands x 4 rows), where misses
    are expected LSH behavior, not a bug: tools/sampled_oracle.py
    adjudicates them against the S-curve — exact precision, exact
    recall for j >= ~0.91, per-miss probability printed. Turning
    num_hashes/bands up buys recall at the threshold (the user-facing
    knob); exact recall at the boundary is not a property banded LSH
    has at bounded cost."""
    docs = _t(spark, sf_dir, "documents")
    return near_dup_pairs(docs, threshold=0.5)


SQL_DEDUP_MINHASH = r"""
WITH sh AS MATERIALIZED (
  SELECT doc_id AS id, unnest(list_distinct(
    list_transform(range(len(toks) - 2),
      i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS s
  FROM (SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS toks
        FROM documents)
  WHERE len(toks) >= 3
  UNION ALL
  SELECT doc_id AS id, list_aggregate(toks, 'string_agg', ' ') AS s
  FROM (SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS toks
        FROM documents)
  WHERE len(toks) < 3
),
sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
  ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
"""


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs within hamming ≤ 3.

    Uses the 48-bit md5 token-hash variant so DuckDB can replay the whole
    pipeline (bit votes → sign packing → banded self-join → hamming)
    bit-for-bit; production default stays xxhash64. Banding recall is
    exactly 1.0 by pigeonhole (4 bands, ≤3 differing bits), so the banded
    output equals the full pairwise filter the oracle computes."""
    from redpanda_spark.dedup.simhash import md5_hash48

    docs = _t(spark, sf_dir, "documents")
    return simhash_near_dups(docs, max_hamming=3, bits=48, token_hash=md5_hash48)


SQL_DEDUP_SIMHASH = r"""
WITH tok AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(trim(text), '\s+'), t -> t != '')) AS t
  FROM documents
),
h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS hv FROM tok),
bitsum AS (
  SELECT doc_id, r.b AS b, SUM(CASE WHEN (hv >> r.b) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM h, range(48) r(b) GROUP BY doc_id, r.b
),
sim AS (
  SELECT doc_id, SUM(CASE WHEN c > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sh
  FROM bitsum GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""


def q_emb_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact, per-side norms + broadcast)."""
    from redpanda_spark.dedup.embedding import cosine_pairs_exact

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_pairs_exact(emb, threshold=0.35)


SQL_EMB_NEAR_DUP = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND(list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, cos FROM p WHERE cos >= 0.35
"""


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-10 for query vectors vec_id < 20."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    corpus = emb
    return brute_force_topk(corpus, queries, k=10).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos"
    )


SQL_ANN_TOPK = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    ROUND(list_dot_product(q.qv, c.v) /
          (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
  FROM q JOIN e c ON c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 10
"""


def q_ann_ivf(spark, sf_dir):
    """IVF approximate top-k with deterministic centroids (the first 16
    corpus vectors), so assignment/probing/rerank are all SQL-replayable.
    The k-means-fit path (fit_ivf_centroids) is exercised by unit tests
    with recall assertions; this gate checks the search machinery —
    cell assignment, nprobe cell probing, exact rerank — value-for-value
    against DuckDB."""
    import numpy as np

    from redpanda_spark.functions.vectors import as_double

    emb = _t(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.where(F.col("vec_id") < 16)
        .orderBy("vec_id")
        .select(as_double("embedding").alias("v"))
        .collect()
    )
    cents = np.array([r["v"] for r in cent_rows])
    corpus = ivf_assign(emb, cents)
    queries = emb.where(F.col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    return ivf_topk(corpus, queries, cents, k=10, nprobe=4)


SQL_ANN_IVF = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT CAST(vec_id AS INTEGER) AS cell, v AS cv FROM e WHERE vec_id < 16),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, cent.cell,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY round(list_dot_product(e.v, cent.cv), 6) DESC, cent.cell) AS rn
    FROM e, cent) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
probe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, cent.cell,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
        ORDER BY round(list_dot_product(q.qv, cent.cv), 6) DESC, cent.cell) AS rn
    FROM q, cent) WHERE rn <= 4
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN assign a ON a.cell = p.cell
  WHERE a.vec_id != p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
    ROUND(list_dot_product(q.qv, e.v) /
          (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cos
  FROM cand c JOIN q ON q.query_id = c.query_id JOIN e ON e.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= 10
"""


# --------------------------------------------------------------------------
# Catalog
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "log_fetch": q_log_fetch,
    "log_list_offsets": q_log_list_offsets,
    "log_timequery": q_log_timequery,
    "log_retention_time": q_log_retention_time,
    "log_delete_records": q_log_delete_records,
    "log_compact": q_log_compact,
    "log_idempotent_dedup": q_log_idempotent_dedup,
    "group_offset_fetch": q_group_offset_fetch,
    "group_lag": q_group_lag,
    "tx_read_committed": q_tx_read_committed,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5ish": q_tpch_q5ish,
    "events_daily": q_events_daily,
    "doc_token_stats": q_doc_token_stats,
    "doc_lang_id": q_doc_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram": q_dedup_ngram,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "emb_near_dup": q_emb_near_dup,
    "ann_topk": q_ann_topk,
    "ann_ivf": q_ann_ivf,
}

ORACLES: dict[str, str] = {
    "log_fetch": SQL_LOG_FETCH,
    "log_list_offsets": SQL_LOG_LIST_OFFSETS,
    "log_timequery": SQL_LOG_TIMEQUERY,
    "log_retention_time": SQL_LOG_RETENTION_TIME,
    "log_delete_records": SQL_LOG_DELETE_RECORDS,
    "log_compact": SQL_LOG_COMPACT,
    "log_idempotent_dedup": SQL_LOG_IDEMPOTENT_DEDUP,
    "group_offset_fetch": SQL_GROUP_OFFSET_FETCH,
    "group_lag": SQL_GROUP_LAG,
    "tx_read_committed": SQL_TX_READ_COMMITTED,
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q5ish": SQL_TPCH_Q5ISH,
    "events_daily": SQL_EVENTS_DAILY,
    "doc_token_stats": SQL_DOC_TOKEN_STATS,
    "doc_lang_id": SQL_DOC_LANG_ID,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram": SQL_DEDUP_NGRAM,
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "emb_near_dup": SQL_EMB_NEAR_DUP,
    "ann_topk": SQL_ANN_TOPK,
    "ann_ivf": SQL_ANN_IVF,
}


# --------------------------------------------------------------------------
# Extended catalog: tombstone compaction, size retention, list_groups,
# JSON decode, sessionization, more TPC-H, multimodal metadata
# --------------------------------------------------------------------------

FAR_FUTURE = "2030-01-01 00:00:00"


def q_log_compact_tombstones(spark, sf_dir):
    """Compaction with tombstone removal after grace (disk_log_impl.cc
    sliding-window + tombstone grace). Simulated tombstones: error events
    carry a NULL value; grace elapsed -> latest-is-tombstone keys vanish."""
    from redpanda_spark.operators.compaction import compact_with_tombstone_grace

    log = (
        topic_view(spark, sf_dir, NUM_PARTITIONS)
        .withColumn("v", F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(F.col("value")))
        .withColumnRenamed("ts", "timestamp")
        .select("partition", "offset", "user_id", "timestamp", "v")
    )
    out = compact_with_tombstone_grace(
        log, ["partition", "user_id"], "v", F.to_timestamp(F.lit(FAR_FUTURE)), 0
    )
    return out.select(
        F.col("partition").cast("int"), F.col("user_id"), F.col("offset").cast("long")
    )


SQL_LOG_COMPACT_TOMBSTONES = f"""
WITH {LOG_CTE},
latest AS (
  SELECT CAST(partition AS INTEGER) AS partition, user_id,
         CAST("offset" AS BIGINT) AS "offset",
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM log
  QUALIFY ROW_NUMBER() OVER (PARTITION BY partition, user_id ORDER BY "offset" DESC) = 1
)
SELECT partition, user_id, "offset" FROM latest WHERE v IS NOT NULL
"""


def q_log_retention_size(spark, sf_dir):
    """Size-based retention: newest records within a per-partition byte
    budget (disk_log_impl.cc:367-417). Row size = 16B header + payload."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS).withColumn(
        "nbytes", F.lit(16) + F.length("event_type") + F.length("props")
    )
    kept = LOG.retain_by_size(log, 4096, "nbytes")
    return kept.groupBy(F.col("partition").cast("int").alias("partition")).agg(
        F.count("*").alias("n_kept"), F.min("offset").cast("long").alias("min_offset")
    )


SQL_LOG_RETENTION_SIZE = f"""
WITH {LOG_CTE},
sized AS (
  SELECT partition, "offset",
         SUM(16 + length(event_type) + length(props)) OVER (
           PARTITION BY partition ORDER BY "offset" DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM log
)
SELECT CAST(partition AS INTEGER) AS partition, COUNT(*) AS n_kept,
       CAST(MIN("offset") AS BIGINT) AS min_offset
FROM sized WHERE cum <= 4096 GROUP BY partition
"""


def q_group_list_groups(spark, sf_dir):
    """ListGroups RPC: enumerate known groups."""
    commits = _sim_commits(spark, sf_dir)
    return commits.select("group_id").distinct()


SQL_GROUP_LIST_GROUPS = f"""
WITH {LOG_CTE}, {_SIM_COMMITS_CTE}
SELECT DISTINCT group_id FROM commits
"""


def q_events_props_extract(spark, sf_dir):
    """Typed JSON decode of the value payload (datalake record_translator
    analog over the events.props column)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )


SQL_EVENTS_PROPS_EXTRACT = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


SESSION_GAP_S = 1800


def q_events_sessionize(spark, sf_dir):
    """Sessionization: count sessions per user with a 30-min inactivity gap
    (streaming session_window analog, batch form)."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # cast→timestamp first so the arithmetic survives either TIMESTAMP or
    # TIMESTAMP_NTZ inputs (NTZ cannot cast straight to double)
    ts_s = F.col("ts").cast("timestamp").cast("double")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(F.sum("new_sess").cast("long").alias("n_sessions"), F.count("*").alias("n_events"))
    )


SQL_EVENTS_SESSIONIZE = f"""
WITH marked AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_S}
              OR lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM marked GROUP BY user_id
"""


def q_events_topk_users(spark, sf_dir):
    """Top-10 users by exact total value (decimal-safe), id tiebreak."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 6).cast("double").alias("total_value"),
        F.count("*").alias("n"),
    )
    return agg.orderBy(F.col("total_value").desc(), F.col("user_id")).limit(10)


SQL_EVENTS_TOPK_USERS = """
SELECT user_id,
       CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS total_value,
       COUNT(*) AS n
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 10
"""


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecast revenue: tight scan with pushed-down predicates."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(dec("l_extendedprice") * dec("l_discount")), 6).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


SQL_TPCH_Q6 = """
SELECT CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q10ish(spark, sf_dir):
    """Top-20 customers by returned-item revenue (Q10 shape): big fact join
    + broadcast dims + ranked output."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    # shuffle_hash on orders (guide §3.1, r14 — same fact-to-fact shape as
    # q3/q9ish; unhinted, sf10 broadcasts the 15M-row orders side off a
    # <64 MB estimate): measured sf10 11.43→5.44 s best (−52%), sf0.1
    # 0.66→0.45 s, outputs identical.
    return (
        li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))), 6).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10ISH = """
SELECT c_custkey, c_name, n_name,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 6) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_mm_image_metadata(spark, sf_dir):
    """Multimodal plumbing over binary columns: per-media decode metadata
    (stub codec, real Spark path). Media = document text bytes."""
    from redpanda_spark.functions.multimodal import image_metadata

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), F.col("text").cast("binary").alias("payload")
    )
    return image_metadata(media).select(
        "media_id",
        F.col("width").cast("int"),
        F.col("height").cast("int"),
        F.col("channels").cast("int"),
        "sha256",
    )


SQL_MM_IMAGE_METADATA = """
SELECT doc_id AS media_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels, sha256(text) AS sha256
FROM documents
"""


def _mm_y4m_media(spark, sf_dir):
    """Synthesize REAL YUV4MPEG2 containers deterministically: media_id
    doc_id < 100; 6 + id%5 frames of 8x8 mono luma, frame i filled with the
    printable byte 32 + (id*7 + i*13) % 95 — so the DuckDB oracle can
    rebuild the exact frame bytes with repeat(chr(v)) and md5 them."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from redpanda_spark.functions.multimodal import encode_y4m

    @pandas_udf("binary")
    def make_y4m(mids: pd.Series) -> pd.Series:
        out = []
        for mid in mids:
            mid = int(mid)
            frames = [
                np.full((8, 8), 32 + (mid * 7 + i * 13) % 95, dtype=np.uint8)
                for i in range(6 + mid % 5)
            ]
            out.append(encode_y4m(frames))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return docs.select(
        F.col("doc_id").alias("media_id"), make_y4m("doc_id").alias("payload")
    )


def q_mm_frame_sample(spark, sf_dir):
    """Video frame sampling on REAL container bytes: Y4M streams are built
    per media id, parsed by the real YUV4MPEG2 decoder (decode_y4m), and
    every 2nd frame (up to 4) is emitted; the oracle rebuilds each sampled
    frame's bytes arithmetically and md5-compares."""
    from redpanda_spark.functions.multimodal import frame_sample

    media = _mm_y4m_media(spark, sf_dir)
    return frame_sample(media, every_n=2, n_frames=4).select(
        "media_id",
        F.col("frame_idx").cast("int"),
        F.md5("frame").alias("frame_md5"),
    )


SQL_MM_FRAME_SAMPLE = """
WITH m AS (SELECT doc_id AS media_id, 6 + doc_id % 5 AS nf
           FROM documents WHERE doc_id < 100),
idx AS (SELECT media_id, CAST(i AS INTEGER) AS frame_idx
        FROM m, UNNEST(range(0, nf, 2)) AS t(i)
        WHERE i < 8)
SELECT media_id, frame_idx,
       md5(repeat(chr(CAST(32 + (media_id * 7 + frame_idx * 13) % 95
                          AS INTEGER)), 64)) AS frame_md5
FROM idx
"""


def q_mm_video_metadata(spark, sf_dir):
    """Container-level video metadata (real Y4M header + frame-count
    parse)."""
    from redpanda_spark.functions.multimodal import video_metadata

    media = _mm_y4m_media(spark, sf_dir)
    return video_metadata(media).select(
        "media_id",
        F.col("width").cast("int"),
        F.col("height").cast("int"),
        F.col("n_frames").cast("int"),
        F.col("fps_num").cast("int"),
        F.col("fps_den").cast("int"),
        "colorspace",
    )


SQL_MM_VIDEO_METADATA = """
SELECT doc_id AS media_id, CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(6 + doc_id % 5 AS INTEGER) AS n_frames,
       CAST(25 AS INTEGER) AS fps_num, CAST(1 AS INTEGER) AS fps_den,
       'mono' AS colorspace
FROM documents WHERE doc_id < 100
"""


def q_mm_jpeg_metadata(spark, sf_dir):
    """Image metadata over REAL baseline-JPEG payloads: per media id a flat
    RGB image of deterministic dimensions is encoded by the pure-numpy T.81
    codec and decoded back through the image pipeline; the oracle recomputes
    the dimension arithmetic. Proves the JPEG branch of the capability
    ladder on real wire bytes (no PIL in this container)."""
    from redpanda_spark.functions.multimodal import image_metadata

    @F.pandas_udf("binary")
    def make_jpeg(mids: pd.Series) -> pd.Series:
        import numpy as np

        from redpanda_spark.functions.jpeg_codec import encode_jpeg

        out = []
        for mid in mids:
            mid = int(mid)
            w, h = 8 + (mid % 5) * 2, 10 + (mid % 3) * 4
            img = np.full((h, w, 3), (mid * 37) % 256, dtype=np.uint8)
            out.append(encode_jpeg(img, quality=90))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    media = docs.select(
        F.col("doc_id").alias("media_id"), make_jpeg("doc_id").alias("payload")
    )
    return image_metadata(media).select(
        "media_id",
        F.col("width").cast("int"),
        F.col("height").cast("int"),
        F.col("channels").cast("int"),
        "format",
    )


SQL_MM_JPEG_METADATA = """
SELECT doc_id AS media_id,
       CAST(8 + (doc_id % 5) * 2 AS INTEGER) AS width,
       CAST(10 + (doc_id % 3) * 4 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       'jpeg' AS format
FROM documents WHERE doc_id < 100
"""


def q_mm_audio_metadata(spark, sf_dir):
    """Audio metadata over REAL RIFF/WAVE payloads: 16-bit mono PCM files
    are synthesized deterministically per media id (sample rate
    8/16/32/40 kHz by id%4, 1000 + (id%7)*500 samples of a simple
    arithmetic wave), decoded by the stdlib-backed WAV parser
    (functions/multimodal.decode_wav), and the oracle recomputes the
    rate/sample-count/duration arithmetic directly."""
    from redpanda_spark.functions.multimodal import audio_metadata, encode_wav

    @F.pandas_udf("binary")
    def make_wav(mids: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for mid in mids:
            mid = int(mid)
            sr = (8000, 16000, 32000, 40000)[mid % 4]
            n = 1000 + (mid % 7) * 500
            i = np.arange(n, dtype=np.int64)
            samples = (((mid * 31 + i * 17) % 65536) - 32768).astype("<i2")
            out.append(encode_wav(samples, sr))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    media = docs.select(
        F.col("doc_id").alias("media_id"), make_wav("doc_id").alias("payload")
    )
    return audio_metadata(media).select(
        "media_id",
        F.col("sample_rate").cast("int"),
        F.col("n_samples").cast("long"),
        F.round("duration_s", 6).alias("duration_s"),
    )


SQL_MM_AUDIO_METADATA = """
SELECT doc_id AS media_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                            WHEN 2 THEN 32000 ELSE 40000 END AS INTEGER) AS sample_rate,
       CAST(1000 + (doc_id % 7) * 500 AS BIGINT) AS n_samples,
       ROUND(CAST(1000 + (doc_id % 7) * 500 AS DOUBLE) /
             (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                              WHEN 2 THEN 32000 ELSE 40000 END), 6) AS duration_s
FROM documents WHERE doc_id < 100
"""


def q_mm2_routing(spark, sf_dir):
    """Byte-compat murmur2 key->partition routing distribution.

    Oracle: Kafka murmur2 UNROLLED IN SQL — c_name is always exactly 18
    ASCII bytes ('Customer#%09d'), so the 4 little-endian chunk mixes +
    2-byte tail + finalizer are a fixed closed-form expression DuckDB can
    evaluate with masked BIGINT arithmetic. Golden vectors in
    tests/test_functions.py additionally pin the kernel on
    variable-length keys."""
    from redpanda_spark.functions.hashes import murmur2_partition_udf

    cust = _t(spark, sf_dir, "customer")
    routed = cust.select(
        murmur2_partition_udf(16)(F.col("c_name").cast("binary")).alias("partition")
    )
    return routed.groupBy("partition").agg(F.count("*").alias("n"))


# Kafka murmur2 for fixed-length-18 keys, unrolled: seed 0x9747b28c ^ 18 =
# 2538058398, M = 0x5bd1e995 = 1540483477, all products masked to 32 bits
# (max intermediate 0xFFFFFFFF * M < 2^63, so BIGINT never overflows).
SQL_MM2_ROUTING = """
WITH raw AS (
  SELECT list_transform(range(1, 19),
                        i -> CAST(ord(substr(c_name, i, 1)) AS BIGINT)) AS by
  FROM customer
),
ch AS (
  SELECT
    by[1] + by[2]*256 + by[3]*65536 + by[4]*16777216 AS k1,
    by[5] + by[6]*256 + by[7]*65536 + by[8]*16777216 AS k2,
    by[9] + by[10]*256 + by[11]*65536 + by[12]*16777216 AS k3,
    by[13] + by[14]*256 + by[15]*65536 + by[16]*16777216 AS k4,
    by[17] AS t0, by[18] AS t1
  FROM raw
),
mix AS (
  SELECT t0, t1,
    ((xor((k1*1540483477) & 4294967295, ((k1*1540483477) & 4294967295) >> 24)) * 1540483477) & 4294967295 AS m1,
    ((xor((k2*1540483477) & 4294967295, ((k2*1540483477) & 4294967295) >> 24)) * 1540483477) & 4294967295 AS m2,
    ((xor((k3*1540483477) & 4294967295, ((k3*1540483477) & 4294967295) >> 24)) * 1540483477) & 4294967295 AS m3,
    ((xor((k4*1540483477) & 4294967295, ((k4*1540483477) & 4294967295) >> 24)) * 1540483477) & 4294967295 AS m4
  FROM ch
),
fold AS (
  SELECT t0, t1,
    xor((xor((xor((xor((2538058398::BIGINT*1540483477) & 4294967295, m1)*1540483477) & 4294967295, m2)*1540483477) & 4294967295, m3)*1540483477) & 4294967295, m4) AS h4
  FROM mix
),
tl AS (
  SELECT ((xor(xor(h4, t1 << 8), t0)) * 1540483477) & 4294967295 AS ht FROM fold
),
fin AS (
  SELECT xor((xor(ht, ht >> 13) * 1540483477) & 4294967295,
             ((xor(ht, ht >> 13) * 1540483477) & 4294967295) >> 15) AS h
  FROM tl
)
SELECT CAST((h & 2147483647) % 16 AS INTEGER) AS partition, COUNT(*) AS n
FROM fin GROUP BY 1
"""


QUERIES.update(
    {
        "log_compact_tombstones": q_log_compact_tombstones,
        "log_retention_size": q_log_retention_size,
        "group_list_groups": q_group_list_groups,
        "events_props_extract": q_events_props_extract,
        "events_sessionize": q_events_sessionize,
        "events_topk_users": q_events_topk_users,
        "tpch_q6": q_tpch_q6,
        "tpch_q10ish": q_tpch_q10ish,
        "mm_image_metadata": q_mm_image_metadata,
        "mm_frame_sample": q_mm_frame_sample,
        "mm_video_metadata": q_mm_video_metadata,
        "mm_audio_metadata": q_mm_audio_metadata,
        "mm_jpeg_metadata": q_mm_jpeg_metadata,
        "mm2_routing": q_mm2_routing,
    }
)

ORACLES.update(
    {
        "log_compact_tombstones": SQL_LOG_COMPACT_TOMBSTONES,
        "log_retention_size": SQL_LOG_RETENTION_SIZE,
        "group_list_groups": SQL_GROUP_LIST_GROUPS,
        "events_props_extract": SQL_EVENTS_PROPS_EXTRACT,
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
        "events_topk_users": SQL_EVENTS_TOPK_USERS,
        "tpch_q6": SQL_TPCH_Q6,
        "tpch_q10ish": SQL_TPCH_Q10ISH,
        "mm_image_metadata": SQL_MM_IMAGE_METADATA,
        "mm2_routing": SQL_MM2_ROUTING,
        "mm_frame_sample": SQL_MM_FRAME_SAMPLE,
        "mm_video_metadata": SQL_MM_VIDEO_METADATA,
        "mm_audio_metadata": SQL_MM_AUDIO_METADATA,
        "mm_jpeg_metadata": SQL_MM_JPEG_METADATA,
    }
)


# --------------------------------------------------------------------------
# Catalog 3: document quality scoring + wider TPC-H shapes (Q4/Q14/Q18)
# --------------------------------------------------------------------------


def q_doc_quality(spark, sf_dir):
    """Composite document quality heuristic (length / stopword / punctuation)
    — the filter stage of a training-data pipeline; all JVM-side exprs."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TXT.quality_score("text").alias("quality"),
    )


_SW_SQL = ", ".join(f"'{w}'" for w in TXT.STOPWORDS_EN)
SQL_DOC_QUALITY = f"""
WITH feats AS (
  SELECT doc_id,
    len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')) AS n_tok,
    CASE WHEN length(text) > 0
      THEN CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) / length(text)
      ELSE 0.0 END AS punct_r,
    CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')) > 0
      THEN CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                t -> lower(t) IN ({_SW_SQL}))) AS DOUBLE)
           / len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != ''))
      ELSE 0.0 END AS sw_r
  FROM documents)
SELECT doc_id,
  ROUND((least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
       + least(sw_r * 4.0, 1.0)
       + greatest(1.0 - punct_r * 4.0, 0.0)) / 3.0, 6) AS quality
FROM feats
"""


def q_tpch_q4ish(spark, sf_dir):
    """Q4 shape: order-priority census via EXISTS → left-semi join.

    (The testdata lacks l_commitdate/l_receiptdate, so "late" =
    shipped > 60 days after the order date.) Catalyst plans the semi join
    with the equi-key on l_orderkey and the inequality as a join filter —
    no fact-side shuffle duplication."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01 00:00:00")))
    )
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_TPCH_Q4ISH = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q14(spark, sf_dir):
    """Q14 promo revenue: fact scan + broadcast part join + conditional agg."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    joined = li.where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-03-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
                / F.sum(rev).cast("double")
            ),
            6,
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n"),
    )


SQL_TPCH_Q14 = """
SELECT ROUND(
    100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
    6) AS promo_revenue_pct,
  COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


Q18_QTY = 120


def q_tpch_q18(spark, sf_dir):
    """Q18 large-volume orders: pre-aggregate the fact on its natural key
    (map-side partials), then join orders+customer only for survivors."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 6).cast("double").alias("sum_qty"))
        .where(F.col("sum_qty") > Q18_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey"),
            F.col("o_orderdate"),
            F.col("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_Q18 = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey,
         CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE sum_qty > {Q18_QTY}
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


QUERIES.update(
    {
        "doc_quality": q_doc_quality,
        "tpch_q4ish": q_tpch_q4ish,
        "tpch_q14": q_tpch_q14,
        "tpch_q18": q_tpch_q18,
    }
)

ORACLES.update(
    {
        "doc_quality": SQL_DOC_QUALITY,
        "tpch_q4ish": SQL_TPCH_Q4ISH,
        "tpch_q14": SQL_TPCH_Q14,
        "tpch_q18": SQL_TPCH_Q18,
    }
)


# --------------------------------------------------------------------------
# Catalog 4: Structured Streaming queries surfaced through the batch gate.
# Each runs a real availableNow stream (file source → stateful op → memory
# sink) and returns the drained result, so the oracle checks streaming
# semantics against plain SQL.
# --------------------------------------------------------------------------

import uuid as _uuid


def _stream_events(spark, sf_dir):
    """readStream over events.parquet with the same nanos→micros adaption
    as load_table (streaming sources need an explicit schema)."""
    _t(spark, sf_dir, "events")  # side effect: sets nanosAsLong conf
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw.schema)
        # the file source wants a directory; select just the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        # withWatermark requires TIMESTAMP; see tables.normalize_event_time
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _state_partitions(sf_dir: str) -> int:
    """State-store partition count sized to the stream's input volume
    (~32 MB of source per partition, floor 4, cap 1024). Streaming state
    commit cost is per-partition-per-batch, so a small stream on the
    session's batch shuffle width pays pure overhead (measured 3x on
    stream-stream join at sf0.1), while a 100 TB stream sizes UP to
    whatever the data needs — the knob tracks bytes, not a constant."""
    try:
        sz = os.path.getsize(os.path.join(sf_dir, "events.parquet"))
    except OSError:
        return 8
    return max(4, min(sz >> 25, 1024))


import threading as _threading

# serializes the save/mutate/restore of the session-wide shuffle width in
# _drain: two overlapping drains (or a concurrent batch query) on the
# shared session could otherwise pick up — or restore — the wrong width
_CONF_LOCK = _threading.Lock()


def _drain(spark, out, mode="complete", state_partitions=None):
    """Run a streaming frame to completion (availableNow) into a memory
    sink. ``state_partitions`` scopes spark.sql.shuffle.partitions around
    query START only — streaming fixes its state partitioning at checkpoint
    creation, so this is the one place the width can be set; batch conf is
    restored immediately after (under _CONF_LOCK against overlapping
    drains)."""
    name = "q" + _uuid.uuid4().hex[:12]
    if state_partitions is None:
        return _drain_locked(spark, out, mode, name, None, None)
    with _CONF_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        return _drain_locked(spark, out, mode, name, state_partitions, prev)


def _drain_locked(spark, out, mode, name, state_partitions, prev):
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        # micro-batches plan asynchronously after start(), so the conf
        # must stay pinned until the run drains. awaitTermination returns
        # False on timeout — in that case batches may STILL be planning
        # when the conf is restored, and spark.table() would silently
        # return a partially-drained sink: stop and fail loudly instead.
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                f"availableNow drain of {name} did not terminate in 300s"
            )
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def q_stream_window_stats(spark, sf_dir):
    """Watermarked tumbling-window throughput per event_type — the
    quota/metrics surface (quota_manager.h:101-112) as a streaming agg."""
    ev = _stream_events(spark, sf_dir)
    out = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("props")).alias("props_bytes"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start_s"),
            "event_type",
            "n",
            "props_bytes",
        )
    )
    return _drain(spark, out, state_partitions=_state_partitions(sf_dir))


SQL_STREAM_WINDOW_STATS = """
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start_s,
       event_type, COUNT(*) AS n,
       CAST(SUM(length(props)) AS BIGINT) AS props_bytes
FROM events GROUP BY 1, 2
"""


def q_stream_sessionize(spark, sf_dir):
    """Streaming session_window per user (30-min gap), drained to a static
    frame. Session = [min ts, max ts + gap); Spark starts a new session
    when the gap is >= 30 min, which the oracle replicates."""
    from redpanda_spark.streaming.stateful import streaming_sessionize

    ev = _stream_events(spark, sf_dir)
    out = streaming_sessionize(ev, ts_col="ts", user_col="user_id", gap="30 minutes")
    sess = _drain(spark, out, state_partitions=_state_partitions(sf_dir))
    return sess.select(
        "user_id",
        F.unix_timestamp("session_start").alias("start_s"),
        F.unix_timestamp("session_end").alias("end_s"),
        "n_events",
    )


SQL_STREAM_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS start_s,
       CAST(floor(epoch(MAX(ts)) + 1800) AS BIGINT) AS end_s,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


QUERIES.update(
    {
        "stream_window_stats": q_stream_window_stats,
        "stream_sessionize": q_stream_sessionize,
    }
)

ORACLES.update(
    {
        "stream_window_stats": SQL_STREAM_WINDOW_STATS,
        "stream_sessionize": SQL_STREAM_SESSIONIZE,
    }
)


def q_stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream interval self-join (streaming/joins.py):
    click→purchase attribution pairs per user within ±4 hours, both
    sides event-time-bounded so buffered state evicts with the watermark
    (bounded memory at any rate). Inner-join semantics are exactly the
    batch interval join, which is the oracle. ±4h on the synthetic
    corpus yields a few hundred pairs — a meaty value hash."""
    from redpanda_spark.streaming.joins import stream_stream_join

    ev = _stream_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = stream_stream_join(
        clicks,
        buys,
        on="user_id",
        left_time="ts",
        right_time="ts",
        watermark="8 hours",
        max_skew="4 hours",
    )
    out = joined.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        (F.unix_timestamp("ts_r") - F.unix_timestamp("ts"))
        .cast("bigint")
        .alias("delta_s"),
    )
    return _drain(
        spark, out, mode="append", state_partitions=_state_partitions(sf_dir)
    )


SQL_STREAM_STREAM_JOIN = """
SELECT l.user_id, l.event_id AS click_id, r.event_id AS purchase_id,
       CAST(floor(epoch(r.ts)) - floor(epoch(l.ts)) AS BIGINT) AS delta_s
FROM events l JOIN events r ON l.user_id = r.user_id
WHERE l.event_type = 'click' AND r.event_type = 'purchase'
  AND r.ts >= l.ts - INTERVAL 4 HOUR
  AND r.ts <= l.ts + INTERVAL 4 HOUR
"""

QUERIES.update({"stream_stream_join": q_stream_stream_join})
ORACLES.update({"stream_stream_join": SQL_STREAM_STREAM_JOIN})


def q_stream_restart_join(spark, sf_dir):
    """Stream-stream join SURVIVING a checkpoint restart, as a gate row:
    the click→purchase ±4h attribution join is drained in TWO staged
    availableNow runs over ONE checkpoint — the source split by event
    time, the query STOPPED and a fresh query started between stages —
    into a parquet sink whose file-commit log makes the union
    exactly-once. Pairs whose click and purchase live in different
    stages can only exist if the restarted query rebuilt the first
    run's join buffers from the checkpoint, so the result equals the
    batch interval join (the oracle) ONLY when state recovery is
    correct (the reference's crash-consistent commit batcher,
    `transform/commit_batcher.cc`; pytest twin:
    tests/test_streaming_restart.py). Built once per input fingerprint
    (staged drains are seconds-scale), then served from the sink."""
    import hashlib
    import shutil
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        "redpanda_spark_restart_join",
        hashlib.md5(
            f"{sf_dir}|{_events_fingerprint(sf_dir)}".encode()
        ).hexdigest(),
    )
    src = os.path.join(base, "src")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    marker = os.path.join(base, "_built")
    if not os.path.exists(marker):
        from redpanda_spark.streaming.joins import stream_stream_join

        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "event_type"
        )
        # time-contiguous halves: stage 2 is never behind the recovered
        # watermark, so restart recovery — not late-data drop — is what
        # the staged drains exercise
        t_split = ev.selectExpr(
            "percentile_approx(ts, 0.5, 10000) AS t"
        ).collect()[0]["t"]
        stages = [
            ev.where(F.col("ts") < F.lit(t_split)),
            ev.where(F.col("ts") >= F.lit(t_split)),
        ]
        schema = None
        for stage_df in stages:
            stage_df.write.mode("append").parquet(src)
            schema = schema or spark.read.parquet(src).schema
            stream = spark.readStream.schema(schema).parquet(src)
            clicks = stream.where(F.col("event_type") == "click").select(
                "user_id", "ts", "event_id"
            )
            buys = stream.where(F.col("event_type") == "purchase").select(
                "user_id", "ts", "event_id"
            )
            joined = stream_stream_join(
                clicks,
                buys,
                on="user_id",
                left_time="ts",
                right_time="ts",
                watermark="8 hours",
                max_skew="4 hours",
            ).select(
                "user_id",
                F.col("event_id").alias("click_id"),
                F.col("event_id_r").alias("purchase_id"),
                (F.unix_timestamp("ts_r") - F.unix_timestamp("ts"))
                .cast("bigint")
                .alias("delta_s"),
            )
            # state width pinned around START only (state partitioning is
            # fixed at checkpoint creation), same discipline as _drain
            with _CONF_LOCK:
                prev = spark.conf.get("spark.sql.shuffle.partitions")
                spark.conf.set(
                    "spark.sql.shuffle.partitions",
                    str(_state_partitions(sf_dir)),
                )
                try:
                    q = (
                        joined.writeStream.format("parquet")
                        .option("path", sink)
                        .option("checkpointLocation", ckpt)
                        .outputMode("append")
                        .trigger(availableNow=True)
                        .start()
                    )
                    if not q.awaitTermination(300):
                        q.stop()
                        raise TimeoutError(
                            "staged restart-join drain did not terminate"
                        )
                finally:
                    spark.conf.set("spark.sql.shuffle.partitions", prev)
        open(marker, "w").write("1")
    return spark.read.parquet(sink).select(
        "user_id", "click_id", "purchase_id", "delta_s"
    )


# the union across the restart must equal the batch interval join — same
# oracle as the one-shot drain, restart-invariance being the claim
SQL_STREAM_RESTART_JOIN = SQL_STREAM_STREAM_JOIN

QUERIES.update({"stream_restart_join": q_stream_restart_join})
ORACLES.update({"stream_restart_join": SQL_STREAM_RESTART_JOIN})


def q_stream_restart_sessionize(spark, sf_dir):
    """Session-window MERGE surviving a checkpoint restart, as a gate
    row (the flatMapGroupsWithState-style-recovery companion to
    q_stream_restart_join, which covers join buffers): per-user
    30-min-gap sessions drain in TWO staged availableNow runs over ONE
    checkpoint — the source split at the median event time, the query
    stopped and a fresh one started between stages — into a parquet
    sink. Sessions still OPEN at the end of stage 1 (last event inside
    watermark+gap of the split) exist in the output only if the
    restarted query rebuilt the open-session state from the checkpoint,
    so the union equals the batch lag()-sessionize oracle ONLY when
    state recovery is correct (the reference resumes transforms from
    committed offsets the same way, `transform/commit_batcher.cc`;
    pytest twin: tests/test_streaming_restart.py). A far-future
    sentinel row appended to stage 2 advances the final watermark past
    every real session end so append mode emits them all; the
    sentinel's own still-open session never emits and its user is
    filtered. Built once per input fingerprint, then served from the
    sink."""
    import hashlib
    import shutil
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        "redpanda_spark_restart_sessionize",
        hashlib.md5(
            f"{sf_dir}|{_events_fingerprint(sf_dir)}".encode()
        ).hexdigest(),
    )
    src = os.path.join(base, "src")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    marker = os.path.join(base, "_built")
    if not os.path.exists(marker):
        from redpanda_spark.streaming.stateful import streaming_sessionize

        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
        t_split = ev.selectExpr(
            "percentile_approx(ts, 0.5, 10000) AS t"
        ).collect()[0]["t"]
        mx = ev.agg(F.max("ts").alias("mx")).collect()[0]["mx"]
        sentinel = spark.range(1).select(
            F.lit(-1).cast("bigint").alias("event_id"),
            F.lit(-1).cast("bigint").alias("user_id"),
            (F.lit(mx) + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        )
        stages = [
            # time-contiguous halves (stage 2 never behind the recovered
            # watermark: restart recovery, not late-data drop, is what
            # the staged drains exercise), sentinel rides stage 2
            ev.where(F.col("ts") < F.lit(t_split)),
            ev.where(F.col("ts") >= F.lit(t_split)).unionByName(sentinel),
        ]
        schema = None
        for stage_df in stages:
            stage_df.write.mode("append").parquet(src)
            schema = schema or spark.read.parquet(src).schema
            stream = spark.readStream.schema(schema).parquet(src)
            out = streaming_sessionize(
                stream, ts_col="ts", user_col="user_id", gap="30 minutes"
            )
            with _CONF_LOCK:
                prev = spark.conf.get("spark.sql.shuffle.partitions")
                spark.conf.set(
                    "spark.sql.shuffle.partitions",
                    str(_state_partitions(sf_dir)),
                )
                try:
                    q = (
                        out.writeStream.format("parquet")
                        .option("path", sink)
                        .option("checkpointLocation", ckpt)
                        .outputMode("append")
                        .trigger(availableNow=True)
                        .start()
                    )
                    if not q.awaitTermination(300):
                        q.stop()
                        raise TimeoutError(
                            "staged restart-sessionize drain did not "
                            "terminate"
                        )
                finally:
                    spark.conf.set("spark.sql.shuffle.partitions", prev)
        open(marker, "w").write("1")
    return (
        spark.read.parquet(sink)
        .where(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.unix_timestamp("session_start").alias("start_s"),
            F.unix_timestamp("session_end").alias("end_s"),
            "n_events",
        )
    )


# restart-invariance IS the claim: the union across the restart must
# equal the one-shot batch sessionize — same oracle as stream_sessionize
SQL_STREAM_RESTART_SESSIONIZE = SQL_STREAM_SESSIONIZE

QUERIES.update({"stream_restart_sessionize": q_stream_restart_sessionize})
ORACLES.update({"stream_restart_sessionize": SQL_STREAM_RESTART_SESSIONIZE})


# --------------------------------------------------------------------------
# Catalog 5: BPE-ish token counting (the second mandated tokenizer)
# --------------------------------------------------------------------------


def q_doc_bpe_tokens(spark, sf_dir):
    """Token counts under the BPE-style regex pre-tokenizer (letters runs /
    digit runs / single punctuation) next to whitespace tokens."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TXT.token_count("text").alias("ws_tokens"),
        TXT.bpe_token_count("text").alias("bpe_tokens"),
    )


SQL_DOC_BPE_TOKENS = f"""
SELECT doc_id,
  CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')) AS INTEGER) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '{TXT.BPE_REGEX}')) AS INTEGER) AS bpe_tokens
FROM documents
"""

QUERIES.update({"doc_bpe_tokens": q_doc_bpe_tokens})
ORACLES.update({"doc_bpe_tokens": SQL_DOC_BPE_TOKENS})


# --------------------------------------------------------------------------
# Catalog 6: TPC-H Q7 (nation-pair volume) and Q19 (disjunctive pushdown)
# --------------------------------------------------------------------------

_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"


def q_tpch_q7ish(spark, sf_dir):
    """Q7 shape: two-sided dimension chain (supplier-nation, customer-
    nation), nation-pair filter, yearly volume. Both nation joins broadcast;
    the only big shuffles are fact-fact on orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    vol = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    j = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        # shuffle_hash on the orders build (guide §3.1, r14): unhinted,
        # sf10 broadcasts the 15M-row orders side off a <64 MB column-
        # pruned estimate (~240 MB real). Measured sf10 10.77→4.30 s best
        # (−60%), outputs identical; sf0.1 within noise (fixed costs).
        .join(orders.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2))
            | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(vol), 6).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_Q7ISH = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(CAST(ROUND(SUM(volume), 6) AS VARCHAR) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
     OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q_tpch_q19ish(spark, sf_dir):
    """Q19 shape: disjunctive brand/quantity predicates — Catalyst folds the
    OR into the join filter and pushes the common l_quantity bound to the
    scan."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).where(
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("l_quantity").between(20, 40)))
    )
    return j.agg(
        F.round(F.sum(rev), 6).cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )


SQL_TPCH_Q19ISH = """
SELECT CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
         * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 6) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 40)
"""

QUERIES.update({"tpch_q7ish": q_tpch_q7ish, "tpch_q19ish": q_tpch_q19ish})
ORACLES.update({"tpch_q7ish": SQL_TPCH_Q7ISH, "tpch_q19ish": SQL_TPCH_Q19ISH})


# --------------------------------------------------------------------------
# Catalog 7: stateful-streaming idempotent dedup through the gate.
# The applyInPandasWithState operator (rm_stm analog) is SQL-oracle-able
# here: with a single epoch the admit rule is "seq > running max of all
# previously arrived seqs per producer", a window expression.
# --------------------------------------------------------------------------


def q_stream_idempotent_dedup(spark, sf_dir):
    """Streaming idempotent-producer dedup (stateful, epoch-fencing FSM)
    drained via an availableNow run. Producer sim mirrors
    log_idempotent_dedup: pid=user_id, epoch=0, seq=event_id div 2; each
    producer lives in one partition so arrival order (offset) is total."""
    import tempfile as _tf

    from redpanda_spark.streaming.stateful import idempotent_dedup_stream

    sim = topic_view(spark, sf_dir, NUM_PARTITIONS).select(
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("user_id").cast("long").alias("producer_id"),
        F.lit(0).cast("int").alias("producer_epoch"),
        F.expr("event_id div 2").cast("long").alias("base_sequence"),
    )
    d = _tf.mkdtemp(prefix="sim_dedup_")
    # single file -> single micro-batch: a deterministic arrival stream
    sim.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(sim.schema).parquet(d)
    out = idempotent_dedup_stream(stream, payload_cols=("partition", "offset"))
    drained = _drain(
        spark, out, mode="append", state_partitions=_state_partitions(sf_dir)
    )
    return drained.groupBy(F.col("partition").cast("int").alias("partition")).agg(
        F.count("*").alias("n_admitted"),
        F.max("offset").cast("long").alias("max_offset"),
    )


SQL_STREAM_IDEMPOTENT_DEDUP = f"""
WITH {LOG_CTE},
sim AS (
  SELECT partition, "offset", user_id AS pid,
         CAST(event_id // 2 AS BIGINT) AS seq
  FROM log),
adm AS (
  SELECT *, MAX(seq) OVER (PARTITION BY pid ORDER BY "offset"
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM sim)
SELECT CAST(partition AS INTEGER) AS partition,
       COUNT(*) AS n_admitted,
       CAST(MAX("offset") AS BIGINT) AS max_offset
FROM adm WHERE prevmax IS NULL OR seq > prevmax
GROUP BY partition
"""

QUERIES.update({"stream_idempotent_dedup": q_stream_idempotent_dedup})
ORACLES.update({"stream_idempotent_dedup": SQL_STREAM_IDEMPOTENT_DEDUP})


# --------------------------------------------------------------------------
# Catalog 8: TPC-H Q13 (outer-join distribution) and Q15 (top-revenue view)
# --------------------------------------------------------------------------


def q_tpch_q13ish(spark, sf_dir):
    """Q13 shape: customer LEFT OUTER JOIN filtered orders, per-customer
    order count, then the count distribution. Exercises null-preserving
    outer join + two cascaded aggregations; both shuffles key on columns
    with near-uniform cardinality (custkey, then small count domain with
    map-side partial agg), so the plan holds at 100 TB."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != F.lit("1-URGENT")
    )
    # shuffle_hash on the filtered-orders build (guide §3.1, r14): the left
    # outer join builds the right side — (o_custkey, o_orderkey) pairs,
    # rows/width × 16 B per partition at any data-scaled width; unhinted,
    # sf10 broadcasts all 15M filtered orders rows off a <64 MB estimate.
    # Measured sf10 7.75→1.31 s best (−83%), sf0.1 0.39→0.31 s, outputs
    # identical.
    per_cust = (
        cust.join(orders.hint("shuffle_hash"),
                  F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_TPCH_Q13ISH = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q15ish(spark, sf_dir):
    """Q15 shape: quarterly per-supplier revenue view, join back against the
    view's max (scalar subquery → broadcast of a 1-row frame). The revenue
    aggregation is the only big shuffle; the max side is an agg of the
    already-computed view, and the final equality join broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    vol = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(vol), 6).cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_TPCH_Q15ISH = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 6) AS VARCHAR) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""

QUERIES.update({"tpch_q13ish": q_tpch_q13ish, "tpch_q15ish": q_tpch_q15ish})
ORACLES.update({"tpch_q13ish": SQL_TPCH_Q13ISH, "tpch_q15ish": SQL_TPCH_Q15ISH})


# --------------------------------------------------------------------------
# Catalog 9: per-record transform fanout through the gate (SURVEY.md §2.5).
# Runs the real mapInPandas flatMap executor (streaming/transforms.py) in
# batch mode: 0..2 outputs per record across 3 output topics, with a
# transcode, a drop rule, and a dual-emit — the OnRecordWritten surface.
# --------------------------------------------------------------------------


def q_transform_fanout(spark, sf_dir):
    """Wasm-transform analog (`transform_processor.h:78`, SDK flatMap
    `sdk.go:21-29`): click/view → engagement (uppercased), signup →
    engagement (as-is), purchase → revenue AND audit (dual emit), error →
    dropped. The flatMap is narrow (no shuffle); outputs are decoded to
    strings so the oracle row-compares the full fanout."""
    from redpanda_spark.streaming.transforms import _OUT_SCHEMA, _flatmap_batches

    ev = _t(spark, sf_dir, "events")
    # key/value only across the Python boundary (guide §4.1): the fanout
    # fn never reads the timestamp, the emitted timestamp column is
    # dropped by the final select, and mapInPandas ships every input
    # column it is given — so the ts column would cross JVM->Python->JVM
    # twice for nothing.
    recs = ev.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.concat_ws(":", "event_type", F.col("event_id").cast("string"))
        .cast("binary")
        .alias("value"),
    )

    def fanout(rec):
        val = bytes(rec["value"]).decode()
        etype = val.split(":", 1)[0]
        if etype in ("click", "view"):
            yield "engagement", {"key": rec["key"], "value": val.upper().encode()}
        elif etype == "signup":
            yield "engagement", {"key": rec["key"], "value": rec["value"]}
        elif etype == "purchase":
            yield "revenue", {"key": rec["key"], "value": rec["value"]}
            yield "audit", {"key": b"a:" + bytes(rec["key"]), "value": rec["value"]}
        # error → dropped (0 outputs)

    out = recs.mapInPandas(_flatmap_batches(fanout), _OUT_SCHEMA)
    return out.select(
        "out_topic",
        F.col("key").cast("string").alias("key_s"),
        F.col("value").cast("string").alias("value_s"),
    )


SQL_TRANSFORM_FANOUT = """
WITH src AS (
  SELECT CAST(user_id AS VARCHAR) AS key_s,
         event_type || ':' || CAST(event_id AS VARCHAR) AS value_s,
         event_type
  FROM events)
SELECT 'engagement' AS out_topic, key_s,
       CASE WHEN event_type IN ('click','view') THEN upper(value_s)
            ELSE value_s END AS value_s
FROM src WHERE event_type IN ('click','view','signup')
UNION ALL
SELECT 'revenue', key_s, value_s FROM src WHERE event_type = 'purchase'
UNION ALL
SELECT 'audit', 'a:' || key_s, value_s FROM src WHERE event_type = 'purchase'
"""

QUERIES.update({"transform_fanout": q_transform_fanout})
ORACLES.update({"transform_fanout": SQL_TRANSFORM_FANOUT})


# --------------------------------------------------------------------------
# Catalog 10: end-to-end training-data curation pipeline — the composed
# filter → language-gate → fingerprint-dedup stage every large-scale
# corpus build runs, as ONE oracle-checked query. Single scan of documents,
# all-JVM expressions; the only shuffle is the final per-language agg.
# --------------------------------------------------------------------------


def _doc_fingerprint(sf_dir: str) -> str:
    """size/mtime fingerprint of the documents parquet (file or dir) —
    the cache-invalidation key (regenerating fixtures in place must not
    replay stale scores)."""
    src = os.path.join(sf_dir, "documents.parquet")
    parts = [src]
    if os.path.isdir(src):
        parts = [os.path.join(src, f) for f in sorted(os.listdir(src))]
    return ";".join(
        f"{p}:{st.st_size}:{st.st_mtime_ns}"
        for p in parts
        if os.path.exists(p)
        for st in [os.stat(p)]
    )


def q_curation_pipeline(spark, sf_dir):
    """quality >= 0.5 AND identified language → per-language kept-doc count,
    unique-fingerprint count (exact-dedup cardinality) and mean quality.

    Scale note (r13 optimization, superseding the r7 module-cache
    design): the NARROW scored frame (doc_id/quality/lang/fp — ~0.01% of
    the corpus bytes at 100 TB, never the text) is persisted PER CALL
    with a lazy mark — the caller's single action materializes it, the
    filter and aggregation read materialized values (no double
    evaluation from filter pushdown, the r7 problem), and the blocks are
    freed on the next catalog query via the deferred-unpersist registry.
    The r7-era module-level cache dict is GONE: under the bench's
    clearCache-per-query discipline it degraded to recomputing the
    scoring with the pushdown double-eval every run (measured 1.7-1.9 s
    at sf0.1 vs 0.70 s for a clean per-call persist). A persist-free
    one-pass variant (aggregate-derived group filters so nothing pushes
    below the agg) was also built and measured: equal at sf1, 0.24 s
    slower at sf0.1 — the cached-narrow-frame shape stays."""
    from redpanda_spark.sources.tables import (
        defer_unpersist,
        drain_deferred_unpersist,
        parallelize_narrow,
    )

    drain_deferred_unpersist()
    # the scoring projection is the per-row-heavy stage; a single-split
    # local parquet file would otherwise evaluate it on one core (no-op
    # at scale, where the scan has thousands of splits)
    docs = parallelize_narrow(_t(spark, sf_dir, "documents"))
    toks = F.col("_toks")
    scored = (
        docs.withColumn("_toks", TXT.tokens("text"))
        .select(
            "doc_id",
            TXT.quality_score("text", toks=toks).alias("quality"),
            TXT.lang_id("text", toks=toks).alias("lang"),
            TXT.fingerprint("text", toks=toks).cast("long").alias("fp"),
        )
        .persist()
    )
    defer_unpersist(scored)
    kept = scored.where((F.col("quality") >= 0.5) & (F.col("lang") != "und"))
    return (
        kept.groupBy(
            "lang", F.floor(F.col("quality") * 10).cast("int").alias("q_decile")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("lang", "q_decile")
    )


SQL_CURATION_PIPELINE = f"""
WITH q AS ({SQL_DOC_QUALITY}),
l AS ({SQL_DOC_LANG_ID}),
f AS ({SQL_DOC_FINGERPRINT})
SELECT l.lang_pred AS lang,
       CAST(FLOOR(q.quality * 10) AS INTEGER) AS q_decile,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT f.fp) AS n_unique,
       ROUND(AVG(q.quality), 6) AS avg_quality
FROM q JOIN l ON q.doc_id = l.doc_id JOIN f ON q.doc_id = f.doc_id
WHERE q.quality >= 0.5 AND l.lang_pred <> 'und'
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES.update({"curation_pipeline": q_curation_pipeline})
ORACLES.update({"curation_pipeline": SQL_CURATION_PIPELINE})


# --------------------------------------------------------------------------
# Catalog 11: embedding normalize + int8 quantization — the vector-prep op
# of an embedding pipeline (storage/ANN-index prep), all-JVM higher-order
# array expressions; scalar digests so the oracle hash-compares exactly.
# --------------------------------------------------------------------------


def q_emb_quantize(spark, sf_dir):
    """L2-normalize each embedding and quantize to int8 (round(127*x/norm)):
    per-vector norm, component-sum / L1 digests and saturation count.
    Double-precision left folds in both engines — bit-identical."""
    emb = _t(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")
    norm = F.sqrt(
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + xd(x) * xd(x))
    )
    qv = F.transform(
        "embedding",
        lambda x: F.round(xd(x) * F.lit(127.0) / F.col("_norm")).cast("int"),
    )
    return (
        emb.withColumn("_norm", norm)
        .where(F.col("_norm") > 0)
        .withColumn("_qv", qv)
        .select(
            "vec_id",
            F.round("_norm", 6).alias("norm"),
            F.aggregate("_qv", F.lit(0), lambda a, v: a + v).alias("q_sum"),
            F.aggregate("_qv", F.lit(0), lambda a, v: a + F.abs(v)).alias("q_l1"),
            F.aggregate(
                "_qv",
                F.lit(0),
                lambda a, v: a + F.when(F.abs(v) >= 127, 1).otherwise(0),
            ).alias("n_sat"),
        )
    )


SQL_EMB_QUANTIZE = """
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (a, b) -> a + b)) AS nrm
  FROM embeddings),
q AS (
  SELECT vec_id, nrm,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / nrm) AS INTEGER)) AS qv
  FROM n WHERE nrm > 0)
SELECT vec_id, ROUND(nrm, 6) AS norm,
       CAST(list_reduce(list_prepend(0, qv), (a, b) -> a + b) AS INTEGER) AS q_sum,
       CAST(list_reduce(list_prepend(0, list_transform(qv, v -> abs(v))),
            (a, b) -> a + b) AS INTEGER) AS q_l1,
       CAST(len(list_filter(qv, v -> abs(v) >= 127)) AS INTEGER) AS n_sat
FROM q
"""

QUERIES.update({"emb_quantize": q_emb_quantize})
ORACLES.update({"emb_quantize": SQL_EMB_QUANTIZE})


# --------------------------------------------------------------------------
# Catalog 12: TPC-H Q8 shape — national market share (conditional-agg ratio
# over a two-sided dimension chain; customer-nation bounds the region,
# supplier-nation is the share numerator).
# --------------------------------------------------------------------------

_Q8_REGION, _Q8_NATION = "ASIA", "NATION_8"


def q_tpch_q8ish(spark, sf_dir):
    """Q8 shape: per-year ratio of a target supplier-nation's revenue to all
    revenue sold into one region. All five dimension joins broadcast; the
    single big shuffle is lineitem⋈orders on orderkey, then one partial-
    aggregated groupBy(year)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    cnat = (
        nat.join(
            F.broadcast(reg.where(F.col("r_name") == _Q8_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    snat = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    vol = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                (
                    F.sum(F.when(F.col("supp_nation") == _Q8_NATION, vol)).cast(
                        "double"
                    )
                    / F.sum(vol).cast("double")
                ),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


SQL_TPCH_Q8ISH = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n2.n_name = '{_Q8_NATION}' THEN volume END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT o_orderdate,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS volume,
         c_nationkey, s_nationkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
) t
JOIN nation n1 ON t.c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = '{_Q8_REGION}'
JOIN nation n2 ON t.s_nationkey = n2.n_nationkey
GROUP BY 1 ORDER BY 1
"""

QUERIES.update({"tpch_q8ish": q_tpch_q8ish})
ORACLES.update({"tpch_q8ish": SQL_TPCH_Q8ISH})


# --------------------------------------------------------------------------
# Catalog 13: TPC-H Q17 shape — correlated scalar subquery (per-part avg
# quantity) re-expressed as aggregate + self-join.
# --------------------------------------------------------------------------


def q_tpch_q17ish(spark, sf_dir):
    """Q17 shape: revenue of small-quantity line items (l_quantity < 0.2 x
    the part's average) for one brand. The correlated subquery becomes a
    per-part aggregate joined back; the filtered part dimension broadcasts,
    and the per-part averages are computed on the brand-pruned lineitem
    slice, not the full fact table."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#4")
    branded = li.join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    avgs = branded.groupBy("l_partkey").agg(
        (F.avg(F.col("l_quantity").cast("double")) * F.lit(0.2)).alias("qty_bound")
    )
    small = branded.join(
        F.broadcast(avgs.withColumnRenamed("l_partkey", "a_partkey")),
        F.col("l_partkey") == F.col("a_partkey"),
    ).where(F.col("l_quantity").cast("double") < F.col("qty_bound"))
    return small.agg(
        F.round((F.sum(F.col("l_extendedprice").cast("double")) / F.lit(7.0)), 6).alias(
            "avg_yearly"
        ),
        F.count("*").cast("long").alias("n_small"),
    )


SQL_TPCH_Q17ISH = """
WITH branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#4'),
avgs AS (
  SELECT l_partkey AS a_partkey,
         0.2 * AVG(CAST(l_quantity AS DOUBLE)) AS qty_bound
  FROM branded GROUP BY 1)
SELECT ROUND(SUM(CAST(l_extendedprice AS DOUBLE)) / 7.0, 6) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM branded JOIN avgs ON l_partkey = a_partkey
WHERE CAST(l_quantity AS DOUBLE) < qty_bound
"""

QUERIES.update({"tpch_q17ish": q_tpch_q17ish})
ORACLES.update({"tpch_q17ish": SQL_TPCH_Q17ISH})


# --------------------------------------------------------------------------
# Catalog 14: datalake typed translation through the gate (SURVEY.md §1.3,
# record_translator.cc:68-98 + table_definition.cc:57-66). Records round-trip
# value JSON (to_json → from_json), attach the redpanda system struct and
# the hour partition column; the oracle recomputes every field directly.
# --------------------------------------------------------------------------


def q_datalake_translate(spark, sf_dir):
    """Iceberg-mode translation: JSON value decode to typed columns + the
    per-row provenance struct + hour(timestamp) partition value."""
    from redpanda_spark.sources.datalake import translate_json_topic

    log = topic_view(spark, sf_dir, NUM_PARTITIONS)
    rec = log.select(
        "partition",
        "offset",
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct("event_type", "value")).cast("binary").alias("value"),
        F.lit(None)
        .cast("array<struct<key:string,value:binary>>")
        .alias("headers"),
    )
    typed = translate_json_topic(rec, "event_type string, value double")
    return typed.select(
        F.col("redpanda.partition").cast("int").alias("partition"),
        F.col("redpanda.offset").cast("long").alias("offset"),
        F.col("redpanda.key").cast("string").alias("key_s"),
        "event_type",
        F.round(F.col("value"), 6).alias("val"),
        F.date_format("_hour", "yyyy-MM-dd HH").alias("hour_part"),
    )


SQL_DATALAKE_TRANSLATE = f"""
WITH {LOG_CTE}
SELECT CAST(partition AS INTEGER) AS partition,
       CAST("offset" AS BIGINT) AS "offset",
       CAST(user_id AS VARCHAR) AS key_s,
       event_type,
       ROUND(value, 6) AS val,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour_part
FROM log
"""

QUERIES.update({"datalake_translate": q_datalake_translate})
ORACLES.update({"datalake_translate": SQL_DATALAKE_TRANSLATE})


AVRO_EVENT_SCHEMA = (
    '{"type":"record","name":"ev","fields":['
    '{"name":"event_type","type":"string"},'
    '{"name":"value","type":["null","double"]},'
    '{"name":"event_id","type":"long"}]}'
)

PROTO_EVENT_SCHEMA = """
syntax = "proto3";
enum Level { INFO = 0; WARN = 1; ERROR = 2; }
message Event {
  string event_type = 1;
  double value = 2;
  int64 event_id = 3;
  Level level = 4;
}
"""


def _datalake_record_view(spark, sf_dir):
    log = topic_view(spark, sf_dir, NUM_PARTITIONS)
    return log.select(
        "partition",
        "offset",
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").cast("binary").alias("key"),
        "event_type",
        "value",
        "event_id",
    )


def _select_translated(typed, *extra: str):
    return typed.select(
        F.col("redpanda.partition").cast("int").alias("partition"),
        F.col("redpanda.offset").cast("long").alias("offset"),
        F.col("redpanda.key").cast("string").alias("key_s"),
        "event_type",
        F.round(F.col("value"), 6).alias("val"),
        F.col("event_id").cast("long").alias("event_id"),
        *extra,
        F.date_format("_hour", "yyyy-MM-dd HH").alias("hour_part"),
    )


def q_datalake_translate_avro(spark, sf_dir):
    """Iceberg-mode translation of an Avro-valued topic: encode each record
    with the registry Avro codec (Confluent wire framing), then decode to
    typed columns + system struct + hour partition (schema_avro.cc +
    record_translator.cc:68-98 parity). Encode and decode are independent
    Arrow-batched stages, so the decode path is exercised on real wire
    bytes, not shared state."""
    import pandas as pd

    from redpanda_spark.registry.avro_codec import avro_encode
    from redpanda_spark.registry.store import SchemaRegistry
    from redpanda_spark.sources.datalake import translate_avro_topic

    schema_json = AVRO_EVENT_SCHEMA

    @F.pandas_udf("binary")
    def enc(event_type: pd.Series, value: pd.Series, event_id: pd.Series) -> pd.Series:
        return pd.Series(
            [
                SchemaRegistry.wire_encode(
                    1,
                    avro_encode(
                        schema_json,
                        {"event_type": t, "value": v, "event_id": int(i)},
                    ),
                )
                for t, v, i in zip(event_type, value, event_id)
            ]
        )

    rec = _datalake_record_view(spark, sf_dir)
    wire = rec.select(
        "partition", "offset", "timestamp", "key",
        enc("event_type", "value", "event_id").alias("value"),
    )
    typed = translate_avro_topic(wire, schema_json, wire_framed=True)
    return _select_translated(typed)


def q_datalake_translate_proto(spark, sf_dir):
    """Same translation for a Protobuf-valued topic via the wire-format
    codec (schema_protobuf.cc parity), including an enum field decoded to
    its symbol string (level = event_id % 3)."""
    import pandas as pd

    from redpanda_spark.registry.proto_codec import encode_message
    from redpanda_spark.registry.protobuf_compat import parse_proto
    from redpanda_spark.registry.store import SchemaRegistry
    from redpanda_spark.sources.datalake import translate_proto_topic

    pschema = parse_proto(PROTO_EVENT_SCHEMA)

    @F.pandas_udf("binary")
    def enc(event_type: pd.Series, value: pd.Series, event_id: pd.Series) -> pd.Series:
        return pd.Series(
            [
                SchemaRegistry.wire_encode(
                    2,
                    encode_message(
                        pschema,
                        "Event",
                        {
                            "event_type": t,
                            "value": float(v),
                            "event_id": int(i),
                            "level": int(i) % 3,
                        },
                    ),
                )
                for t, v, i in zip(event_type, value, event_id)
            ]
        )

    rec = _datalake_record_view(spark, sf_dir)
    wire = rec.select(
        "partition", "offset", "timestamp", "key",
        enc("event_type", "value", "event_id").alias("value"),
    )
    typed = translate_proto_topic(wire, PROTO_EVENT_SCHEMA, "Event", wire_framed=True)
    return _select_translated(typed, "level")


SQL_DATALAKE_TRANSLATE_TYPED = f"""
WITH {LOG_CTE}
SELECT CAST(partition AS INTEGER) AS partition,
       CAST("offset" AS BIGINT) AS "offset",
       CAST(user_id AS VARCHAR) AS key_s,
       event_type,
       ROUND(value, 6) AS val,
       CAST(event_id AS BIGINT) AS event_id,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour_part
FROM log
"""

SQL_DATALAKE_TRANSLATE_PROTO = f"""
WITH {LOG_CTE}
SELECT CAST(partition AS INTEGER) AS partition,
       CAST("offset" AS BIGINT) AS "offset",
       CAST(user_id AS VARCHAR) AS key_s,
       event_type,
       ROUND(value, 6) AS val,
       CAST(event_id AS BIGINT) AS event_id,
       CASE CAST(event_id % 3 AS INTEGER)
            WHEN 0 THEN 'INFO' WHEN 1 THEN 'WARN' ELSE 'ERROR' END AS level,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour_part
FROM log
"""

QUERIES.update(
    {
        "datalake_translate_avro": q_datalake_translate_avro,
        "datalake_translate_proto": q_datalake_translate_proto,
    }
)
ORACLES.update(
    {
        "datalake_translate_avro": SQL_DATALAKE_TRANSLATE_TYPED,
        "datalake_translate_proto": SQL_DATALAKE_TRANSLATE_PROTO,
    }
)


AVRO_EVENT_SCHEMA_V1 = (
    '{"type":"record","name":"ev","fields":['
    '{"name":"event_type","type":"string"},'
    '{"name":"value","type":["null","double"]}]}'
)
AVRO_EVENT_SCHEMA_V2 = (
    '{"type":"record","name":"ev","fields":['
    '{"name":"event_type","type":"string"},'
    '{"name":"value","type":["null","double"]},'
    '{"name":"event_id","type":"long","default":0}]}'
)


def q_datalake_translate_registry(spark, sf_dir):
    """Registry-driven dispatch (`record_schema_resolver.cc` parity): the
    topic carries TWO live schema versions of one subject — even event_ids
    are wire-framed with v2 (has event_id), odd with v1 (doesn't) — and
    translate_topic resolves each record's writer schema from its own wire
    header. Output columns follow the latest version; v1 rows surface
    event_id as NULL (Iceberg add-column semantics)."""
    import pandas as pd

    from redpanda_spark.registry.avro_codec import avro_encode
    from redpanda_spark.registry.store import SchemaRegistry
    from redpanda_spark.sources.datalake import translate_topic

    registry = SchemaRegistry()
    id_v1 = registry.register("ev-value", AVRO_EVENT_SCHEMA_V1, "AVRO")
    id_v2 = registry.register("ev-value", AVRO_EVENT_SCHEMA_V2, "AVRO")
    s_v1, s_v2 = AVRO_EVENT_SCHEMA_V1, AVRO_EVENT_SCHEMA_V2

    @F.pandas_udf("binary")
    def enc(event_type: pd.Series, value: pd.Series, event_id: pd.Series) -> pd.Series:
        out = []
        for t, v, i in zip(event_type, value, event_id):
            if int(i) % 2 == 0:
                body = avro_encode(
                    s_v2, {"event_type": t, "value": v, "event_id": int(i)}
                )
                out.append(SchemaRegistry.wire_encode(id_v2, body))
            else:
                body = avro_encode(s_v1, {"event_type": t, "value": v})
                out.append(SchemaRegistry.wire_encode(id_v1, body))
        return pd.Series(out)

    rec = _datalake_record_view(spark, sf_dir)
    wire = rec.select(
        "partition", "offset", "timestamp", "key",
        enc("event_type", "value", "event_id").alias("value"),
    )
    typed = translate_topic(wire, registry, "ev-value")
    return _select_translated(typed)


SQL_DATALAKE_TRANSLATE_REGISTRY = f"""
WITH {LOG_CTE}
SELECT CAST(partition AS INTEGER) AS partition,
       CAST("offset" AS BIGINT) AS "offset",
       CAST(user_id AS VARCHAR) AS key_s,
       event_type,
       ROUND(value, 6) AS val,
       CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS BIGINT) END AS event_id,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour_part
FROM log
"""

QUERIES.update({"datalake_translate_registry": q_datalake_translate_registry})
ORACLES.update({"datalake_translate_registry": SQL_DATALAKE_TRANSLATE_REGISTRY})


# --------------------------------------------------------------------------
# Catalog 16: benchmark decontamination (training-data hygiene — n-gram
# overlap rule of the GPT-3/PaLM/Llama data cards). Benchmarks = the
# doc_id % 17 == 0 subset standing in for an eval suite; self-pairs
# excluded.
# --------------------------------------------------------------------------


def q_decontaminate(spark, sf_dir):
    """Contamination sweep: every (training doc, benchmark doc) pair
    sharing >= 1 distinct word 5-gram, with the shared-gram count. The
    benchmark side broadcasts (tiny dimension), so the corpus side
    streams through a hash probe shuffle-free. n=5 tracks the published
    n-gram windows (8..13 on natural text — this corpus's ~60-word vocab
    makes 3-grams collide semantically-meaninglessly, and the n=3 run
    measured 133k flagged pairs at sf0.1 = pure join blowup, 7.4s vs
    ~0.6s at n=5 with 167 real overlaps)."""
    from redpanda_spark.pipeline.decontaminate import contamination_pairs

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 17 == 0)
    pairs = contamination_pairs(docs, bench, n=5)
    return pairs.where(F.col("doc_id") != F.col("bench_id")).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("bench_id").cast("long").alias("bench_id"),
        F.col("common_ngrams").cast("long").alias("common_ngrams"),
    )


SQL_DECONTAMINATE = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks
  FROM documents),
g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - 4),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
         toks[i+4] || ' ' || toks[i+5]))) AS gram
  FROM toks WHERE len(toks) >= 5)
SELECT d.doc_id AS doc_id, b.doc_id AS bench_id,
       CAST(COUNT(*) AS BIGINT) AS common_ngrams
FROM g d JOIN g b ON d.gram = b.gram
WHERE b.doc_id % 17 = 0 AND d.doc_id != b.doc_id
GROUP BY d.doc_id, b.doc_id
"""

QUERIES.update({"decontaminate": q_decontaminate})
ORACLES.update({"decontaminate": SQL_DECONTAMINATE})


def q_doc_repetition(spark, sf_dir):
    """Gopher repetition quality signals per document (Rae et al. 2021
    filter rules): duplicate-token fraction, top-2-gram dominance,
    duplicate-5-gram fraction — all-JVM, one scan."""
    from redpanda_spark.functions.text import repetition_metrics, tokens

    docs = _t(spark, sf_dir, "documents")
    m = repetition_metrics("text")
    return (
        docs.where(F.size(tokens(F.col("text"))) >= 5)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.round(m["dup_token_frac"], 6).alias("dup_token_frac"),
            F.round(m["top_2gram_frac"], 6).alias("top_2gram_frac"),
            F.round(m["dup_5gram_frac"], 6).alias("dup_5gram_frac"),
        )
    )


SQL_DOC_REPETITION = """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS toks
  FROM documents),
g AS (
  SELECT doc_id, toks,
    list_transform(range(len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]) AS g2,
    list_transform(range(len(toks) - 4),
      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
           toks[i+4] || ' ' || toks[i+5]) AS g5
  FROM t WHERE len(toks) >= 5)
SELECT doc_id,
  ROUND(1 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS dup_token_frac,
  ROUND(CAST(list_max(list_transform(list_distinct(g2),
      d -> len(list_filter(g2, x -> x = d)))) AS DOUBLE) / len(g2), 6) AS top_2gram_frac,
  ROUND(CAST(list_sum(list_transform(list_distinct(g5),
      d -> CASE WHEN len(list_filter(g5, x -> x = d)) > 1
                THEN len(list_filter(g5, x -> x = d)) ELSE 0 END)) AS DOUBLE)
        / len(g5), 6) AS dup_5gram_frac
FROM g
"""

QUERIES.update({"doc_repetition": q_doc_repetition})
ORACLES.update({"doc_repetition": SQL_DOC_REPETITION})


# --------------------------------------------------------------------------
# Catalog 15: remaining TPC-H query shapes (Q2/Q9/Q11/Q16/Q20/Q21/Q22
# analogs) — the testdata has no partsupp table, so the part-supplier
# relation derives from lineitem (distinct (l_partkey, l_suppkey), unit
# cost = min extendedprice/quantity). Each keeps the original query's
# *plan shape*: correlated-min join-back (Q2), multi-dim star join (Q9),
# global-scalar HAVING (Q11), distinct-agg + NOT IN (Q16), half-sum
# semi-join (Q20), exists/not-exists self-join (Q21), scalar-avg +
# anti-join (Q22).
# --------------------------------------------------------------------------

_Q2_SIZE, _Q2_REGION = 15, "EUROPE"


def q_tpch_q2ish(spark, sf_dir):
    """Q2 shape: min-cost supplier per part. The correlated MIN becomes a
    per-part aggregate broadcast back onto the scoped supply relation; all
    dimensions (part slice, supplier, nation, region) broadcast, so the
    only shuffles are the two aggregates on the derived supply relation —
    both keyed by (part, supp) / part, never by row."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_size") == _Q2_SIZE)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == _Q2_REGION)

    # Pre-filter lineitem by the part slice BEFORE the (partkey, suppkey)
    # aggregate (guide §2.3, r14): the slice filter is on the aggregate key,
    # so min(unit_cost) per surviving pair is unchanged — Catalyst cannot
    # push a join below an aggregate itself. The aggregate's input drops
    # ~50× (p_size is 1-of-50). Measured (interleaved, outputs identical):
    # sf10 9.60→1.42 s best (−85%), sf0.1 0.82→0.38 s.
    li = li.join(
        F.broadcast(part.select(F.col("p_partkey").alias("pk_f"))),
        F.col("l_partkey") == F.col("pk_f"),
    ).drop("pk_f")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    scoped = (
        supply.join(F.broadcast(part.select("p_partkey")),
                    F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    mins = scoped.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        scoped.join(
            F.broadcast(mins),
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select(
            F.round(F.col("s_acctbal").cast("double"), 6).alias("sab"),
            "s_name",
            "n_name",
            F.col("p_partkey").cast("long").alias("pk"),
            F.round(F.col("min_cost").cast("double"), 6).alias("mc"),
        )
        .orderBy(F.desc("sab"), "s_name", "pk")
        .limit(100)
    )


SQL_TPCH_Q2ISH = f"""
WITH supply AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2),
scoped AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name, unit_cost
  FROM supply
  JOIN part ON l_partkey = p_partkey AND p_size = {_Q2_SIZE}
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = '{_Q2_REGION}'),
mins AS (SELECT p_partkey AS m_partkey, MIN(unit_cost) AS min_cost
         FROM scoped GROUP BY 1)
SELECT ROUND(CAST(s_acctbal AS DOUBLE), 6) AS sab, s_name, n_name,
       CAST(p_partkey AS BIGINT) AS pk, ROUND(CAST(min_cost AS DOUBLE), 6) AS mc
FROM scoped JOIN mins ON p_partkey = m_partkey AND unit_cost = min_cost
ORDER BY sab DESC, s_name, pk LIMIT 100
"""


def q_tpch_q9ish(spark, sf_dir):
    """Q9 shape (product-type profit): lineitem x filtered part x supplier
    x nation x orders, profit = revenue - synthetic supply cost
    (0.1 x retailprice x qty, since there is no partsupp). Dims broadcast;
    the orders join is the one big sort-merge on orderkey. Decimal-exact
    sums, order-free."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    profit = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")) - (
        F.lit(0.1).cast("decimal(18,4)") * dec("p_retailprice") * dec("l_quantity")
    )
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_retailprice")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        # shuffle_hash (guide §3.1, r14): without the hint the planner
        # BROADCASTS the 15M-row orders side at sf10 (column-pruned
        # estimate < 64 MB, ~240 MB real — the guide's "estimates are
        # often badly wrong" OOM shape) and sort-merges once estimates
        # grow. The partitioned build is (o_orderkey, o_orderdate) =
        # rows/width × 16 B per partition — trivially in memory at any
        # data-scaled width. Measured sf10 10.86→3.48 s best (−68%),
        # sf0.1 0.75→0.64 s, outputs identical.
        .join(orders.select("o_orderkey", "o_orderdate").hint("shuffle_hash"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(profit), 6).cast("double").alias("profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


SQL_TPCH_Q9ISH = """
SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
             - CAST(0.1 AS DECIMAL(18,4)) * CAST(p_retailprice AS DECIMAL(18,4))
                 * CAST(l_quantity AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2 ORDER BY 1, 2 DESC
"""

_Q11_NATION, _Q11_FRACTION = "NATION_3", 0.002


def q_tpch_q11ish(spark, sf_dir):
    """Q11 shape (important inventory value): per-part value restricted to
    one nation's suppliers, kept when above a global-scalar fraction of the
    total. The scalar HAVING threshold is a 1-row aggregate cross-joined
    (broadcast) — no second scan collect; the nation's supplier set
    broadcasts so lineitem shuffles once, on partkey."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == _Q11_NATION)
    val = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    )
    natsupply = (
        li.join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", val.alias("val"))
    )
    per_part = natsupply.groupBy("l_partkey").agg(F.sum("val").alias("part_val"))
    total = natsupply.agg(
        (F.sum("val") * F.lit(_Q11_FRACTION)).alias("threshold")
    )
    return (
        # 1-row scalar broadcast: compiles to a BroadcastNestedLoopJoin with
        # a single build row — how Spark executes scalar subqueries; bounded
        per_part.join(F.broadcast(total), F.col("part_val") > F.col("threshold"))
        .select(
            F.col("l_partkey").cast("long").alias("partkey"),
            F.round(F.col("part_val"), 6).cast("double").alias("total_value"),
        )
        .orderBy(F.desc("total_value"), "partkey")
        .limit(100)
    )


SQL_TPCH_Q11ISH = f"""
WITH natsupply AS (
  SELECT l_partkey,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = '{_Q11_NATION}')
SELECT CAST(l_partkey AS BIGINT) AS partkey,
       CAST(CAST(ROUND(SUM(val), 6) AS VARCHAR) AS DOUBLE) AS total_value
FROM natsupply GROUP BY 1
HAVING SUM(val) > (SELECT SUM(val) * {_Q11_FRACTION} FROM natsupply)
ORDER BY total_value DESC, partkey LIMIT 100
"""


def q_tpch_q16ish(spark, sf_dir):
    """Q16 shape (supplier count by part attrs): distinct part-supplier
    pairs from lineitem, part-attribute filters, NOT IN excluded-supplier
    subquery as a broadcast anti-join, COUNT(DISTINCT) per (brand, type,
    size). The distinct and the count-distinct are the two shuffles, both
    on narrow key columns."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 15, 25, 40)
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    # Broadcast-join the filtered part slice BELOW the distinct (guide §2.3,
    # r14): p_partkey is unique, so dedup over (l_partkey, l_suppkey) after
    # the join equals distinct-then-join — but the distinct's shuffle now
    # carries only the slice's rows (~12% by p_size alone). Measured
    # (interleaved, outputs identical): sf10 6.90→2.47 s best (−64%),
    # sf0.1 0.63→0.48 s.
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .dropDuplicates(["l_partkey", "l_suppkey"])
    )
    return (
        pairs
        .join(F.broadcast(bad_supp.select("s_suppkey")),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(100)
    )


SQL_TPCH_Q16ISH = """
SELECT p_brand, p_type, CAST(p_size AS INTEGER) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) s
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 15, 25, 40)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100
"""


def q_tpch_q20ish(spark, sf_dir):
    """Q20 shape (excess/dominant suppliers): per (supplier, part) shipped
    quantity of a name-filtered part slice in one year, kept when above
    half the part's total — the original's availqty > 0.5 x sum(shipped)
    half-sum subquery. The per-part total broadcasts back; supplier and
    nation dims broadcast; one shuffle on (suppkey, partkey)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("small"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    return (
        shipped.join(F.broadcast(tot), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("qty") > F.lit(0.5) * F.col("total_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )


SQL_TPCH_Q20ISH = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate < TIMESTAMP '1999-01-01'
  GROUP BY 1, 2),
tot AS (SELECT l_partkey AS t_partkey, SUM(qty) AS total_qty
        FROM shipped GROUP BY 1)
SELECT DISTINCT s_name, n_name
FROM shipped JOIN tot ON l_partkey = t_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE qty > 0.5 * total_qty
ORDER BY s_name
"""


def q_tpch_q12ish(spark, sf_dir):
    """Q12 shape (shipping priority split): 1996 lineitems joined to their
    orders, counting high- vs low-priority lines per linestatus (the
    schema's shipmode stand-in). Large×large join on the order key — both
    sides shuffle on l_orderkey/o_orderkey; the date filter is pushed to
    the lineitem scan so only the year's files are read."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("int")).cast("long").alias("high_line_count"),
            F.sum((~high).cast("int")).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


SQL_TPCH_Q12ISH = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus ORDER BY l_linestatus
"""

QUERIES.update({"tpch_q12ish": q_tpch_q12ish})
ORACLES.update({"tpch_q12ish": SQL_TPCH_Q12ISH})


def q_tpch_q21ish(spark, sf_dir):
    """Q21 shape (suppliers who kept orders waiting): the EXISTS /
    NOT EXISTS pair of correlated self-joins is re-expressed as one
    per-order aggregate — n_suppliers and n_late_suppliers per finished
    order — joined back to the late rows; the aggregate and the join-back
    share the l_orderkey partitioning so Catalyst reuses the exchange.
    'Late' derives from shipdate > orderdate + 60 days (no receiptdate in
    the schema). Supplier dim broadcasts."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    late_flag = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    # shuffle_hash on the F-status orders build (guide §3.1, r14): two
    # skinny columns per partition instead of the estimate-driven SMJ sorts
    # at sf10; the downstream aggregates re-shuffle by their own keys either
    # way. Measured sf10 7.78→6.15 s best, sf0.1 0.88→0.82 s, outputs
    # identical.
    rows = li.join(
        orders.select("o_orderkey", "o_orderdate").hint("shuffle_hash"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("l_orderkey", "l_suppkey", late_flag.alias("late"))
    # two-level agg instead of a double countDistinct: the (orderkey,
    # suppkey) pre-aggregate has map-side combine and avoids the Expand
    # node countDistinct plans through (which would re-shuffle every
    # lineitem row once per distinct aggregate at 100 TB)
    per_supp = rows.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("supp_late")
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count("*").alias("n_supp"),
        F.sum("supp_late").alias("n_late"),
    )
    return (
        rows.where(F.col("late") == 1)
        .join(per_order, F.col("l_orderkey") == F.col("g_orderkey"))
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


SQL_TPCH_Q21ISH = """
WITH f_orders AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'),
li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN f_orders ON l_orderkey = o_orderkey),
per_order AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
  FROM li GROUP BY 1)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM li JOIN per_order ON li.l_orderkey = per_order.l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20
"""

_Q22_CUTOFF = "2000-01-01"


def q_tpch_q22ish(spark, sf_dir):
    """Q22 shape (idle wealthy customers): global scalar average (positive
    balances) broadcast-cross-joined, anti-join against recent orders, then
    a per-segment rollup (the schema has no phone country code; mktsegment
    plays that role). Orders side is pre-filtered by date before the
    anti-join so the shuffle carries only the recent slice's custkeys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        # 1-row scalar broadcast (see q_tpch_q11ish note)
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a"))
        .join(orders.select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 6).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


SQL_TPCH_Q22ISH = f"""
WITH avg_bal AS (SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0),
idle AS (
  SELECT c_mktsegment, c_acctbal FROM customer, avg_bal
  WHERE c_acctbal > a AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'))
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE)
         AS totacctbal
FROM idle GROUP BY 1 ORDER BY 1
"""

QUERIES.update({
    "tpch_q2ish": q_tpch_q2ish,
    "tpch_q9ish": q_tpch_q9ish,
    "tpch_q11ish": q_tpch_q11ish,
    "tpch_q16ish": q_tpch_q16ish,
    "tpch_q20ish": q_tpch_q20ish,
    "tpch_q21ish": q_tpch_q21ish,
    "tpch_q22ish": q_tpch_q22ish,
})
ORACLES.update({
    "tpch_q2ish": SQL_TPCH_Q2ISH,
    "tpch_q9ish": SQL_TPCH_Q9ISH,
    "tpch_q11ish": SQL_TPCH_Q11ISH,
    "tpch_q16ish": SQL_TPCH_Q16ISH,
    "tpch_q20ish": SQL_TPCH_Q20ISH,
    "tpch_q21ish": SQL_TPCH_Q21ISH,
    "tpch_q22ish": SQL_TPCH_Q22ISH,
})


# --------------------------------------------------------------------------
# Catalog 16: dataset-assembly pipeline (pipeline/dataset.py) — the ops a
# training-data pipeline runs downstream of the log store: deterministic
# split, domain mixing, PII scrub, sequence packing. All pure-JVM and
# deterministic, so each has a full value-hash oracle.
# --------------------------------------------------------------------------

_TOKCNT_SQL = "len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != ''))"


def q_pipeline_split(spark, sf_dir):
    """Deterministic train/val/test split (Knuth-hash buckets on doc_id —
    stable under re-partitioning, unlike rand(seed)) rolled up per
    (split, source). Narrow until the final small rollup."""
    from redpanda_spark.pipeline.dataset import assign_split

    docs = _t(spark, sf_dir, "documents")
    d = docs.withColumn("n_tokens", TXT.token_count("text"))
    return (
        assign_split(d, weights={"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("split", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("split", "source")
    )


def _split_sql_case() -> str:
    from redpanda_spark.pipeline.dataset import BUCKETS, split_bucket_sql

    b = split_bucket_sql("doc_id")
    return (
        f"CASE WHEN {b} < {int(0.9 * BUCKETS)} THEN 'train' "
        f"WHEN {b} < {int(0.95 * BUCKETS)} THEN 'val' ELSE 'test' END"
    )


SQL_PIPELINE_SPLIT = f"""
SELECT {_split_sql_case()} AS split, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({_TOKCNT_SQL}) AS BIGINT) AS n_tokens
FROM documents GROUP BY 1, 2 ORDER BY 1, 2
"""

_MIX_WEIGHTS = {"src0": 0.3, "src1": 0.2, "src2": 0.2, "src3": 0.3}
_MIX_BUDGET = 50_000


def q_pipeline_mix(spark, sf_dir):
    """Domain mixing: per-source token budgets (mixture weights x total
    budget), documents taken in deterministic hash-priority order until
    the budget fills. One per-source sort-shuffle."""
    from redpanda_spark.pipeline.dataset import weighted_mix

    docs = _t(spark, sf_dir, "documents")
    d = docs.withColumn("n_tokens", TXT.token_count("text"))
    return weighted_mix(d, _MIX_WEIGHTS, _MIX_BUDGET).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


def _mix_sql() -> str:
    from redpanda_spark.pipeline.dataset import split_bucket_sql

    pri = split_bucket_sql("doc_id")
    budget = " ".join(
        f"WHEN source = '{s}' THEN {int(f * _MIX_BUDGET)}"
        for s, f in _MIX_WEIGHTS.items()
    )
    return f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKCNT_SQL} AS n_tokens, {pri} AS pri
  FROM documents),
cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM toks)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cum
WHERE cum_tokens <= (CASE {budget} ELSE 0 END)
"""


def q_pipeline_redact(spark, sf_dir):
    """PII scrub: deterministic synthetic PII (emails / ipv4s / phones
    derived from doc_id) is injected, counted, redacted, and re-counted;
    the md5 of the redacted text proves byte-equality with the oracle.
    All regexp built-ins — no Python in the row path."""
    from redpanda_spark.pipeline.dataset import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents")
    injected = docs.withColumn(
        "text2",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 100).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    (100 + F.col("doc_id") % 900).cast("string"),
                    F.lit("-"),
                    (1000 + F.col("doc_id") % 9000).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    cts = pii_counts("text2")
    red = redact_pii("text2")
    residual = pii_counts(red)
    return injected.select(
        "doc_id",
        cts["email"].cast("long").alias("n_email"),
        cts["ipv4"].cast("long").alias("n_ipv4"),
        cts["phone"].cast("long").alias("n_phone"),
        (residual["email"] + residual["ipv4"] + residual["phone"])
        .cast("long")
        .alias("n_residual"),
        F.md5(red.cast("binary")).alias("redacted_md5"),
    )


def _redact_sql() -> str:
    from redpanda_spark.pipeline.dataset import PII_PATTERNS

    email, ipv4, phone = (
        PII_PATTERNS["email"],
        PII_PATTERNS["ipv4"],
        PII_PATTERNS["phone"],
    )
    inj = (
        "text || "
        "(CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) || "
        "(CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END) || "
        "(CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR) || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END)"
    )
    red = (
        f"regexp_replace(regexp_replace(regexp_replace(text2, '{email}', '[PII]', 'g'),"
        f" '{ipv4}', '[PII]', 'g'), '{phone}', '[PII]', 'g')"
    )
    return f"""
WITH injected AS (SELECT doc_id, {inj} AS text2 FROM documents),
redacted AS (SELECT doc_id, text2, {red} AS red FROM injected)
SELECT doc_id,
  CAST(len(regexp_extract_all(text2, '{email}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text2, '{ipv4}')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text2, '{phone}')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(red, '{email}'))
     + len(regexp_extract_all(red, '{ipv4}'))
     + len(regexp_extract_all(red, '{phone}')) AS BIGINT) AS n_residual,
  md5(red) AS redacted_md5
FROM redacted
"""


_PACK_WINDOW = 256


def q_pipeline_pack(spark, sf_dir):
    """GPT-style sequence packing: concatenate per-source in doc_id order,
    chop at fixed token windows; per-document window coordinates."""
    from redpanda_spark.pipeline.dataset import pack_offsets

    docs = _t(spark, sf_dir, "documents")
    d = docs.withColumn("n_tokens", TXT.token_count("text"))
    return pack_offsets(d, _PACK_WINDOW).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("start_off").cast("long").alias("start_off"),
        F.col("begin_win").cast("long").alias("begin_win"),
        F.col("end_win").cast("long").alias("end_win"),
        F.col("spans").cast("long").alias("spans"),
    )


SQL_PIPELINE_PACK = f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKCNT_SQL} AS n_tokens FROM documents),
cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM toks)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens - n_tokens AS BIGINT) AS start_off,
       CAST((cum_tokens - n_tokens) // {_PACK_WINDOW} AS BIGINT) AS begin_win,
       CAST(GREATEST((cum_tokens - 1) // {_PACK_WINDOW},
                     (cum_tokens - n_tokens) // {_PACK_WINDOW}) AS BIGINT)
         AS end_win,
       CAST(GREATEST((cum_tokens - 1) // {_PACK_WINDOW},
                     (cum_tokens - n_tokens) // {_PACK_WINDOW})
            - (cum_tokens - n_tokens) // {_PACK_WINDOW} + 1 AS BIGINT) AS spans
FROM cum
"""

QUERIES.update({
    "pipeline_split": q_pipeline_split,
    "pipeline_mix": q_pipeline_mix,
    "pipeline_redact": q_pipeline_redact,
    "pipeline_pack": q_pipeline_pack,
})
ORACLES.update({
    "pipeline_split": SQL_PIPELINE_SPLIT,
    "pipeline_mix": _mix_sql(),
    "pipeline_redact": _redact_sql(),
    "pipeline_pack": SQL_PIPELINE_PACK,
})


# -- SemDedup: semantic (embedding-cluster) deduplication -------------------


def q_dedup_semantic(spark, sf_dir):
    """SemDedup verdicts with deterministic centroids (the first 12 corpus
    vectors) so cell assignment and the intra-cell lowest-id-wins rule are
    exactly SQL-replayable. The sample-fit k-means path
    (semantic_dedup_kmeans) is exercised by unit tests with behavioral
    assertions; this gate checks the dedup machinery value-for-value."""
    import numpy as np

    from redpanda_spark.dedup.semantic import semantic_dedup
    from redpanda_spark.functions.vectors import as_double

    emb = _t(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.where(F.col("vec_id") < 12)
        .orderBy("vec_id")
        .select(as_double("embedding").alias("v"))
        .collect()
    )
    cents = np.array([r["v"] for r in cent_rows])
    return semantic_dedup(emb, cents, tau=0.30).select(
        "vec_id", F.col("cell").cast("int").alias("cell"), "is_dup", "dup_of"
    )


SQL_DEDUP_SEMANTIC = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT CAST(vec_id AS INTEGER) AS cell, v AS cv FROM e WHERE vec_id < 12),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, cent.cell,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY round(list_dot_product(e.v, cent.cv), 6) DESC, cent.cell) AS rn
    FROM e, cent) WHERE rn = 1),
d AS (SELECT a.vec_id, a.cell, e.v FROM assign a JOIN e USING (vec_id)),
dup AS (
  SELECT hi.vec_id AS vec_id, MIN(lo.vec_id) AS dup_of
  FROM d hi JOIN d lo ON hi.cell = lo.cell AND lo.vec_id < hi.vec_id
  WHERE ROUND(list_dot_product(hi.v, lo.v) /
        (sqrt(list_dot_product(hi.v, hi.v)) * sqrt(list_dot_product(lo.v, lo.v))), 6)
        >= 0.30
  GROUP BY hi.vec_id)
SELECT d.vec_id, d.cell, dup.dup_of IS NOT NULL AS is_dup, dup.dup_of
FROM d LEFT JOIN dup USING (vec_id)
"""

QUERIES.update({"dedup_semantic": q_dedup_semantic})
ORACLES.update({"dedup_semantic": SQL_DEDUP_SEMANTIC})


# -- Stream/dim enrichment (KTable-style lookup join) ------------------------


def q_events_enrich(spark, sf_dir):
    """Every event annotated with its user's latest-profile snapshot
    (keep-latest by event_id — the compacted-topic KTable idiom) and the
    customer dim — both sides broadcast, the fact side never shuffles."""
    from redpanda_spark.streaming.enrich import enrich

    events = _t(spark, sf_dir, "events")
    customer = _t(spark, sf_dir, "customer")
    profile = (
        events.groupBy("user_id")
        .agg(
            F.max_by(F.struct("event_type", "value"), "event_id").alias("s"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("s.event_type").alias("latest_type"),
            F.round(F.col("s.value"), 6).alias("latest_value"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )
    dim = customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    out = enrich(enrich(events, profile, "user_id"), dim, "user_id")
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        "latest_type",
        "latest_value",
        "n_events",
        "c_mktsegment",
    )


SQL_EVENTS_ENRICH = """
WITH prof AS (
  SELECT user_id,
         max_by(event_type, event_id) AS latest_type,
         ROUND(max_by("value", event_id), 6) AS latest_value,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id)
SELECT e.event_id, e.user_id, e.event_type, p.latest_type, p.latest_value,
       p.n_events, c.c_mktsegment
FROM events e
LEFT JOIN prof p USING (user_id)
LEFT JOIN customer c ON c.c_custkey = e.user_id
"""

QUERIES.update({"events_enrich": q_events_enrich})
ORACLES.update({"events_enrich": SQL_EVENTS_ENRICH})


# -- As-of (temporal) join ---------------------------------------------------


def q_events_asof(spark, sf_dir):
    """Event-time temporal join: odd events are state updates (a versioned
    dim history per user), even events are facts — each fact picks up the
    state in effect AT ITS OWN ts. One shuffle on user_id (union-window
    as-of, operators/asof.py); the oracle replays it with DuckDB's native
    ASOF JOIN, so the semantics are checked against an independent
    implementation, not our own algebra."""
    from redpanda_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    versions = (
        ev.where(F.col("event_id") % 2 == 1)
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("state"))
    )
    facts = ev.where(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "ts", "event_type"
    )
    out = asof_join(facts, versions, on="user_id", facts_time="ts", versions_time="ts")
    return out.select("event_id", "user_id", "event_type", "state")


SQL_EVENTS_ASOF = """
WITH v AS (
  SELECT user_id, ts, max_by(event_type, event_id) AS state
  FROM events WHERE event_id % 2 = 1 GROUP BY user_id, ts),
f AS (SELECT event_id, user_id, ts, event_type FROM events WHERE event_id % 2 = 0)
SELECT f.event_id, f.user_id, f.event_type, v.state
FROM f ASOF LEFT JOIN v ON f.user_id = v.user_id AND f.ts >= v.ts
"""

QUERIES.update({"events_asof": q_events_asof})
ORACLES.update({"events_asof": SQL_EVENTS_ASOF})


# -- Interval (range-overlap) join -------------------------------------------


def q_events_interval(spark, sf_dir):
    """Window-coverage attribution: odd events open 1-hour windows per
    user, even events are facts — per covered fact, how many windows
    cover it and the earliest covering window. Bucketed equi-join
    (operators/interval.py), no nested loop; the oracle replays the raw
    range join in DuckDB (IEJoin) independently."""
    from redpanda_spark.operators.interval import interval_join

    ev = _t(spark, sf_dir, "events")
    iv = ev.where(F.col("event_id") % 2 == 1).select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
        F.col("event_id").alias("window_id"),
    )
    facts = ev.where(F.col("event_id") % 2 == 0).select("event_id", "user_id", "ts")
    pairs = interval_join(facts, iv, on="user_id", end_exclusive=True)
    return pairs.groupBy("event_id", "user_id").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.min("window_id").alias("first_window"),
    )


SQL_EVENTS_INTERVAL = """
WITH iv AS (
  SELECT user_id, ts AS start, ts + INTERVAL 1 HOUR AS "end",
         event_id AS window_id
  FROM events WHERE event_id % 2 = 1),
f AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 2 = 0)
SELECT f.event_id, f.user_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
       MIN(iv.window_id) AS first_window
FROM f JOIN iv ON f.user_id = iv.user_id
               AND f.ts >= iv.start AND f.ts < iv."end"
GROUP BY f.event_id, f.user_id
"""

QUERIES.update({"events_interval": q_events_interval})
ORACLES.update({"events_interval": SQL_EVENTS_INTERVAL})


# -- Cross-document repeated-span (line-level) dedup -------------------------


def q_doc_span_dedup(spark, sf_dir):
    """RefinedWeb-style span dedup profile: fixed 10-token spans, spans
    shared by >=2 distinct docs are boilerplate; per-doc counts +
    scrubbed-text fingerprint (dedup/spans.py — two shuffles, no UDFs)."""
    from redpanda_spark.dedup.spans import span_dedup_stats

    docs = _t(spark, sf_dir, "documents")
    return span_dedup_stats(docs, span_tokens=10, min_docs=2)


SQL_DOC_SPAN_DEDUP = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t,
         unnest(generate_series(1, CAST(ceil(len(t)/10.0) AS BIGINT))) AS span_idx
        FROM toks),
hashed AS (
  SELECT doc_id, span_idx,
         array_to_string(t[((span_idx-1)*10+1):(span_idx*10)], ' ') AS span,
         md5(array_to_string(t[((span_idx-1)*10+1):(span_idx*10)], ' ')) AS h
  FROM idx),
shared AS (SELECT h FROM hashed GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_spans,
  CAST(SUM(CASE WHEN h IN (SELECT h FROM shared) THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_spans,
  ROUND(SUM(CASE WHEN h IN (SELECT h FROM shared) THEN 1 ELSE 0 END) * 1.0
        / COUNT(*), 6) AS dup_fraction,
  md5(COALESCE(string_agg(CASE WHEN h NOT IN (SELECT h FROM shared) THEN span END,
                          ' ' ORDER BY span_idx), '')) AS cleaned_md5
FROM hashed GROUP BY doc_id
"""

QUERIES.update({"doc_span_dedup": q_doc_span_dedup})
ORACLES.update({"doc_span_dedup": SQL_DOC_SPAN_DEDUP})


# -- Stratified (importance) sampling ---------------------------------------

_SAMPLE_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}


def q_pipeline_sample(spark, sf_dir):
    """Deterministic per-domain downsampling (importance sampling):
    Knuth-hash keep-rule, narrow/no-shuffle, nested across rates.
    Reports the surviving docs per stratum with token totals."""
    from redpanda_spark.pipeline.dataset import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    kept = stratified_sample(docs, _SAMPLE_RATES)
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(TXT.token_count("text")).cast("long").alias("n_tokens"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


def _sample_sql() -> str:
    from redpanda_spark.pipeline.dataset import BUCKETS, split_bucket_sql

    b = split_bucket_sql("doc_id")
    keep = " ".join(
        f"WHEN source = '{s}' THEN {b} < {int(r * BUCKETS)}"
        for s, r in _SAMPLE_RATES.items()
    )
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({_TOKCNT_SQL}) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents
WHERE CASE {keep} ELSE FALSE END
GROUP BY source
"""


QUERIES.update({"pipeline_sample": q_pipeline_sample})
ORACLES.update({"pipeline_sample": _sample_sql()})


# -- Hashing-trick quality classifier ---------------------------------------

_CLF_DIM = 64
# deterministic integer milli-weights: exact integer fold in both engines
_CLF_W = [((i * 2654435761) % 1000) - 500 for i in range(_CLF_DIM)]


def q_doc_quality_classifier(spark, sf_dir):
    """Linear quality scoring with fixed hashed-token weights: the
    UDF-free serving path of functions/classifier.py (train half is
    exercised in unit tests with real pyspark.ml fits). Integer weight
    fold -> one double division, so Spark and DuckDB agree exactly."""
    from redpanda_spark.functions.classifier import token_bucket

    docs = _t(spark, sf_dir, "documents")
    w = F.array(*[F.lit(int(x)) for x in _CLF_W])
    toks = F.split(F.col("text"), " ")
    total = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(w, (token_bucket(t, _CLF_DIM) + 1).cast("int")),
    )
    score = F.round(total / (F.lit(1000.0) * F.size(toks)), 6)
    return docs.select(
        "doc_id",
        score.alias("score"),
        (score > 0).alias("keep"),
    )


def _clf_sql() -> str:
    wt_rows = ", ".join(f"({i}, {w})" for i, w in enumerate(_CLF_W))
    return f"""
WITH w(i, wt) AS (VALUES {wt_rows}),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
b AS (SELECT doc_id,
        CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {_CLF_DIM} AS bucket
      FROM toks),
s AS (SELECT b.doc_id,
        ROUND(SUM(w.wt) / (1000.0 * COUNT(*)), 6) AS score
      FROM b JOIN w ON w.i = b.bucket GROUP BY b.doc_id)
SELECT doc_id, score, score > 0 AS keep FROM s
"""


QUERIES.update({"doc_quality_classifier": q_doc_quality_classifier})
ORACLES.update({"doc_quality_classifier": _clf_sql()})


# -- Sign random projection (JL dimensionality reduction) --------------------

_SRP_K, _SRP_DIM = 8, 64


def q_emb_project(spark, sf_dir):
    """64-dim embeddings -> 8 exact-integer SRP components (hash-derived
    ±1 hyperplanes, milli-unit quantization). The all-JVM expression
    path; the Arrow matmul twin is parity-tested equal in unit tests."""
    from redpanda_spark.similarity.projection import project_expr

    emb = _t(spark, sf_dir, "embeddings")
    out = project_expr(emb, _SRP_K, _SRP_DIM)
    return out.select(
        "vec_id",
        *[F.element_at("proj", i + 1).alias(f"p{i}") for i in range(_SRP_K)],
    )


def _srp_sql() -> str:
    from redpanda_spark.similarity.projection import _sign

    comps = []
    for i in range(_SRP_K):
        terms = " + ".join(
            f"({'' if _sign(i, j, _SRP_DIM, 0) == 1 else '-'}q[{j + 1}])"
            for j in range(_SRP_DIM)
        )
        comps.append(f"CAST({terms} AS BIGINT) AS p{i}")
    cols = ", ".join(comps)
    return f"""
WITH q AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(ROUND(x * 1000) AS BIGINT)) AS q
  FROM embeddings)
SELECT vec_id, {cols} FROM q
"""


QUERIES.update({"emb_project": q_emb_project})
ORACLES.update({"emb_project": _srp_sql()})


# -- Curation v2: classifier + span-dedup + repetition composed --------------


def q_curation_v2(spark, sf_dir):
    """The round-5 primitives composed into one keep-decision pipeline:
    per doc, the trained-classifier-style linear score, the cross-doc
    boilerplate (span-dup) fraction, and the duplicate-token repetition
    signal; keep = positive score AND <50% boilerplate AND <30% repeated
    tokens; per-source keep counts + mean signals. Two shuffles total
    (the span-dedup pair from dedup/spans.py) + one broadcast-side agg —
    the published curation recipe (quality filter -> dedup -> repetition
    gate) as one plan."""
    from redpanda_spark.dedup.spans import span_dedup_stats
    from redpanda_spark.functions.classifier import token_bucket

    docs = _t(spark, sf_dir, "documents")
    w = F.array(*[F.lit(int(x)) for x in _CLF_W])
    toks = F.split(F.col("text"), " ")
    total = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(w, (token_bucket(t, _CLF_DIM) + 1).cast("int")),
    )
    score = F.round(total / (F.lit(1000.0) * F.size(toks)), 6)
    rep = F.round(
        (F.size(toks) - F.size(F.array_distinct(toks))) / F.size(toks), 6
    )
    scored = docs.select("doc_id", "source", score.alias("score"), rep.alias("rep"))
    spans = span_dedup_stats(docs, span_tokens=10, min_docs=2).select(
        "doc_id", "dup_fraction"
    )
    joined = scored.join(spans, "doc_id")
    keep = (
        (F.col("score") > 0)
        & (F.col("dup_fraction") < 0.5)
        & (F.col("rep") < 0.3)
    )
    return (
        joined.withColumn("keep", keep)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.round(F.avg("dup_fraction"), 6).alias("avg_dup_fraction"),
            F.round(F.avg("rep"), 6).alias("avg_rep"),
        )
    )


def _curation_v2_sql() -> str:
    wt_rows = ", ".join(f"({i}, {w})" for i, w in enumerate(_CLF_W))
    return f"""
WITH w(i, wt) AS (VALUES {wt_rows}),
toks0 AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
clf AS (
  SELECT b.doc_id, ROUND(SUM(w.wt) / (1000.0 * COUNT(*)), 6) AS score
  FROM (SELECT doc_id,
          CAST(concat('0x', substr(md5(unnest(t)), 1, 8)) AS BIGINT) % {_CLF_DIM}
            AS bucket
        FROM toks0) b
  JOIN w ON w.i = b.bucket GROUP BY b.doc_id),
rep AS (
  SELECT doc_id,
    ROUND((len(t) - len(list_distinct(t))) * 1.0 / len(t), 6) AS rep
  FROM toks0),
idx AS (SELECT doc_id, t,
         unnest(generate_series(1, CAST(ceil(len(t)/10.0) AS BIGINT))) AS span_idx
        FROM toks0),
hashed AS (
  SELECT doc_id, span_idx,
         md5(array_to_string(t[((span_idx-1)*10+1):(span_idx*10)], ' ')) AS h
  FROM idx),
shared AS (SELECT h FROM hashed GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
spans AS (
  SELECT doc_id,
    ROUND(SUM(CASE WHEN h IN (SELECT h FROM shared) THEN 1 ELSE 0 END) * 1.0
          / COUNT(*), 6) AS dup_fraction
  FROM hashed GROUP BY doc_id),
joined AS (
  SELECT d.doc_id, d.source, clf.score, spans.dup_fraction, rep.rep,
         (clf.score > 0 AND spans.dup_fraction < 0.5 AND rep.rep < 0.3) AS keep
  FROM documents d
  JOIN clf USING (doc_id) JOIN spans USING (doc_id) JOIN rep USING (doc_id))
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(AVG(score), 6) AS avg_score,
       ROUND(AVG(dup_fraction), 6) AS avg_dup_fraction,
       ROUND(AVG(rep), 6) AS avg_rep
FROM joined GROUP BY source
"""


QUERIES.update({"curation_v2": q_curation_v2})
ORACLES.update({"curation_v2": _curation_v2_sql()})


# -- Duplicate-cluster assignment (connected components) ---------------------


def q_dedup_cluster(spark, sf_dir):
    """Pair -> cluster: connected components (alternating large-star /
    small-star, dedup/cluster.py) over the MinHash-LSH near-dup pairs,
    mapping every clustered document to its canonical (minimum-id)
    representative plus the cluster size. The oracle replays transitive
    closure over the exact-Jaccard pair set with a recursive CTE — sound
    because dedup_minhash already pins Spark's pair set equal to the
    oracle's on this corpus."""
    from redpanda_spark.dedup.cluster import duplicate_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = near_dup_pairs(docs, threshold=0.5)
    return duplicate_clusters(pairs).select("id", "canonical_id", "cluster_size")


SQL_DEDUP_CLUSTER = (
    "WITH RECURSIVE pairs AS MATERIALIZED (\n"
    + SQL_DEDUP_MINHASH
    + """
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
walk(u, lbl) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, w.lbl FROM walk w JOIN edges e ON e.u = w.u WHERE w.lbl < e.v
),
comp AS (SELECT u AS id, MIN(lbl) AS canonical_id FROM walk GROUP BY u)
SELECT id, canonical_id, CAST(cnt AS BIGINT) AS cluster_size
FROM comp
JOIN (SELECT canonical_id, COUNT(*) AS cnt FROM comp GROUP BY canonical_id)
  USING (canonical_id)
"""
)

QUERIES.update({"dedup_cluster": q_dedup_cluster})
ORACLES.update({"dedup_cluster": SQL_DEDUP_CLUSTER})


# -- Approximate sketches (HLL distinct, quantile) ---------------------------
#
# At 100 TB, exact COUNT(DISTINCT) shuffles every distinct key and exact
# percentiles shuffle every value; the sketch forms (HyperLogLog++ /
# approx_percentile's KLL-style summary) are map-side combinable constant
# state per group — the only viable shape for high-cardinality telemetry.
# The gate keeps hash-checkability by returning the EXACT statistic plus a
# boolean asserting the sketch landed within tolerance, so a sketch
# accuracy regression flips the boolean and fails the value-hash.


def q_events_approx_users(spark, sf_dir):
    """Per-type daily uniques: exact countDistinct next to HLL++ (2%
    target sd), asserted within 5%."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.to_date(F.col("ts")).alias("day"))
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("_a"),
        )
        .select(
            "event_type",
            "day",
            "exact_users",
            (
                F.abs(F.col("_a") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("hll_within_5pct"),
        )
    )


SQL_EVENTS_APPROX_USERS = """
SELECT event_type, CAST(ts AS DATE) AS day,
  COUNT(DISTINCT user_id) AS exact_users,
  TRUE AS hll_within_5pct
FROM events GROUP BY event_type, CAST(ts AS DATE)
"""


def q_events_quantiles(spark, sf_dir):
    """Per-type value quantiles: exact interpolated percentile (matches
    DuckDB quantile_cont bit-for-bit at 6dp) plus the approx_percentile
    sketch asserted within 2% relative error at p50/p95."""
    ev = _t(spark, sf_dir, "events")
    exact = F.expr("percentile(value, array(0.5, 0.95))")
    approx = F.expr("approx_percentile(value, array(0.5, 0.95), 5000)")
    return (
        ev.groupBy("event_type")
        .agg(exact.alias("_e"), approx.alias("_a"))
        .select(
            "event_type",
            F.round(F.element_at("_e", 1), 6).alias("p50"),
            F.round(F.element_at("_e", 2), 6).alias("p95"),
            (
                (F.abs(F.element_at("_a", 1) - F.element_at("_e", 1))
                 <= 0.02 * F.abs(F.element_at("_e", 1)))
                & (F.abs(F.element_at("_a", 2) - F.element_at("_e", 2))
                   <= 0.02 * F.abs(F.element_at("_e", 2)))
            ).alias("sketch_within_2pct"),
        )
    )


SQL_EVENTS_QUANTILES = """
SELECT event_type,
  ROUND(quantile_cont(value, 0.5), 6) AS p50,
  ROUND(quantile_cont(value, 0.95), 6) AS p95,
  TRUE AS sketch_within_2pct
FROM events GROUP BY event_type
"""

QUERIES.update(
    {
        "events_approx_users": q_events_approx_users,
        "events_quantiles": q_events_quantiles,
    }
)
ORACLES.update(
    {
        "events_approx_users": SQL_EVENTS_APPROX_USERS,
        "events_quantiles": SQL_EVENTS_QUANTILES,
    }
)


# -- Deterministic corpus shuffle -------------------------------------------


def q_pipeline_shuffle(spark, sf_dir):
    """Deterministic global shuffle for training order: every document
    gets a stable pseudo-random position keyed by md5(seed || doc_id) —
    breaks source/crawl ordering so a sequential reader sees an i.i.d.
    stream, reproducible across engines and runs. At scale this is a
    bucketed two-phase rank (256 key-prefix buckets, per-bucket parallel
    windows + an exact ≤256-row prefix-sum offset) — no single-partition
    global window at any corpus size; the md5 key is uniform so the
    buckets are skew-free by construction."""
    from redpanda_spark.pipeline.dataset import shuffle_deterministic

    docs = _t(spark, sf_dir, "documents")
    return shuffle_deterministic(docs, seed="r5").select(
        "doc_id", "source", "shuffle_pos"
    )


SQL_PIPELINE_SHUFFLE = """
SELECT doc_id, source,
  ROW_NUMBER() OVER (ORDER BY md5('r5:' || CAST(doc_id AS VARCHAR))) AS shuffle_pos
FROM documents
"""

QUERIES.update({"pipeline_shuffle": q_pipeline_shuffle})
ORACLES.update({"pipeline_shuffle": SQL_PIPELINE_SHUFFLE})


# -- BPE tokenizer training (distributed inner loop + driver-looped trainer) -


def q_bpe_pair_counts(spark, sf_dir):
    """The distributed inner loop of BPE training (functions/bpe.py):
    frequency-weighted adjacent-symbol-pair counts over the word-frequency
    table (Sennrich trick — iterations touch the vocab, not the corpus).
    Top-30 pairs with deterministic (cnt DESC, a, b) ranking."""
    from pyspark.sql import Window

    from redpanda_spark.functions.bpe import _init_symbols, pair_counts, word_freqs

    docs = _t(spark, sf_dir, "documents")
    pc = pair_counts(_init_symbols(word_freqs(docs)))
    # two-phase top-k: TakeOrderedAndProject reduces the pair table to 30
    # rows in parallel; the unpartitioned ranking window then runs over
    # those 30 survivors only — never a single-partition pass over the
    # full (vocab-sized) pair table
    order = [F.desc("cnt"), F.asc("a"), F.asc("b")]
    top = pc.orderBy(*order).limit(30)
    w = Window.orderBy(*order)
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "a", "b", "cnt"
    )


SQL_BPE_PAIR_COUNTS = r"""
WITH words AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), t -> t != '')) AS word
  FROM documents),
wf AS (SELECT word, COUNT(*) AS freq FROM words GROUP BY word),
sym AS (
  SELECT freq,
    list_transform(string_split(word, ''),
      (c, i) -> CASE WHEN i = len(string_split(word, '')) THEN c || '</w>' ELSE c END) AS s
  FROM wf),
idx AS (
  SELECT freq, s, unnest(generate_series(1, len(s) - 1)) AS i
  FROM sym WHERE len(s) >= 2),
pc AS (
  SELECT s[i] AS a, s[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM idx GROUP BY s[i], s[i + 1])
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, a, b) AS INT) AS rank, a, b, cnt
FROM pc ORDER BY cnt DESC, a, b LIMIT 30
"""


def q_bpe_train(spark, sf_dir):
    """Full BPE training, 8 merges (iterative driver-looped algorithm).
    Oracle-paired since r10: the SQL-unrolled trainer below (see
    `_bpe_train_sql`) replays all 8 merge iterations in DuckDB, so the
    driver hash-checks values, not just row counts. The trainer is also
    pinned value-for-value against a pure-Python reference implementation
    in unit tests, and its distributed inner loop is the hash-checked
    bpe_pair_counts gate."""
    from redpanda_spark.functions.bpe import train_bpe

    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=8)
    return spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "rank int, a string, b string, cnt bigint",
    )


def _bpe_train_sql(n_merges: int = 8) -> str:
    """SQL-unrolled BPE trainer (the `emb_kmeans` Lloyd-oracle pattern):
    the fixed merge count unrolls as chained CTEs — per iteration a pair
    count, an argmax, and the merge application. The greedy left-to-right
    merge fold is EXACTLY leftmost non-overlapping string replace over a
    control-char-wrapped symbol string: each symbol is \\x1E<sym>\\x1F, so
    pattern \\x1E a \\x1F\\x1E b \\x1F -> \\x1E ab \\x1F can neither match a
    partial symbol nor consume a delimiter a following match needs (both
    engines verified char-identical on the corpus, which contains no
    \\x1E/\\x1F bytes)."""
    A, B, SEP = r"e'\x1E'", r"e'\x1F'", r"e'\x1F\x1E'"
    parts = [
        r"""WITH words AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), t -> t != '')) AS word
  FROM documents),
wf AS (SELECT word, COUNT(*) AS freq FROM words GROUP BY word),
sym0 AS (
  SELECT freq, """
        + A
        + r""" || array_to_string(
    list_transform(string_split(word, ''),
      (c, i) -> CASE WHEN i = len(string_split(word, '')) THEN c || '</w>' ELSE c END),
    """
        + SEP
        + r""") || """
        + B
        + r""" AS s
  FROM wf)"""
    ]
    for i in range(n_merges):
        parts.append(
            f"""lst{i} AS (
  SELECT freq, string_split(substr(s, 2, len(s) - 2), {SEP}) AS l FROM sym{i}),
idx{i} AS (
  SELECT freq, l, unnest(generate_series(1, len(l) - 1)) AS i
  FROM lst{i} WHERE len(l) >= 2),
pc{i} AS (
  SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM idx{i} GROUP BY l[i], l[i + 1]),
best{i} AS (SELECT a, b, cnt FROM pc{i} ORDER BY cnt DESC, a, b LIMIT 1),
sym{i + 1} AS (
  SELECT freq, replace(s, {A} || a || {SEP} || b || {B}, {A} || a || b || {B}) AS s
  FROM sym{i}, best{i})"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS INT) AS rank, a, b, cnt FROM best{i}"
        for i in range(n_merges)
    )
    return ",\n".join(parts) + "\n" + union + "\nORDER BY rank"


SQL_BPE_TRAIN = _bpe_train_sql(8)

QUERIES.update(
    {"bpe_pair_counts": q_bpe_pair_counts, "bpe_train": q_bpe_train}
)
ORACLES.update(
    {"bpe_pair_counts": SQL_BPE_PAIR_COUNTS, "bpe_train": SQL_BPE_TRAIN}
)


# -- Curation with cluster-level dedup (keep one per near-dup cluster) -------


def q_curation_dedup(spark, sf_dir):
    """The keep/drop decision a dedup pipeline actually ships: every
    document keeps iff it is its near-dup cluster's canonical (minimum id)
    or belongs to no cluster; per-source kept/dropped counts + kept token
    volume. Composes near_dup_pairs → connected components → anti-join,
    all distributed."""
    from redpanda_spark.dedup.cluster import duplicate_clusters

    docs = _t(spark, sf_dir, "documents")
    clusters = duplicate_clusters(near_dup_pairs(docs, threshold=0.5))
    dropped = clusters.where(F.col("id") != F.col("canonical_id")).select(
        F.col("id").alias("doc_id")
    )
    flagged = docs.join(
        F.broadcast(dropped.withColumn("_drop", F.lit(True))), "doc_id", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("_drop"), 0).otherwise(1)).cast("long").alias("n_kept"),
            F.sum(
                F.when(F.col("_drop"), 0).otherwise(TXT.token_count("text"))
            ).cast("long").alias("kept_tokens"),
        )
        .orderBy("source")
    )


SQL_CURATION_DEDUP = (
    "WITH RECURSIVE clusters AS MATERIALIZED (\n"
    + SQL_DEDUP_CLUSTER
    + """
),
dropped AS (SELECT id AS doc_id FROM clusters WHERE id <> canonical_id)
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM dropped) THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM dropped) THEN 0 ELSE """
    + _TOKCNT_SQL
    + """ END) AS BIGINT) AS kept_tokens
FROM documents GROUP BY source ORDER BY source
"""
)

QUERIES.update({"curation_dedup": q_curation_dedup})
ORACLES.update({"curation_dedup": SQL_CURATION_DEDUP})


# -- Incremental dedup (new batch vs stored corpus signatures) ---------------

_INC_SPLIT = 250  # doc_id < split = "corpus", >= split = arriving increment


def q_dedup_incremental(spark, sf_dir):
    """Incremental MinHash dedup: the arriving increment is checked
    against the corpus via its STORED signature table (the corpus is
    never re-shingled; corpus x corpus pairs are never generated) plus
    against earlier docs in the same increment. Returns the surviving
    new-doc ids. At 100 TB this is the daily-ingest shape: cost scales
    with the increment and the touched buckets, not the corpus."""
    from redpanda_spark.dedup.minhash import (
        incremental_dedup_ids,
        minhash_signature,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") < _INC_SPLIT)
    new = docs.where(F.col("doc_id") >= _INC_SPLIT)
    # stands in for the signature store persisted by the previous run
    corpus_sigs = minhash_signature(corpus)
    return incremental_dedup_ids(corpus_sigs, new, docs, threshold=0.5)


SQL_DEDUP_INCREMENTAL = (
    "WITH pairs AS (\n"
    + SQL_DEDUP_MINHASH
    + f"""
)
SELECT doc_id FROM documents d
WHERE d.doc_id >= {_INC_SPLIT}
  AND NOT EXISTS (SELECT 1 FROM pairs p WHERE p.id_b = d.doc_id)
"""
)

QUERIES.update({"dedup_incremental": q_dedup_incremental})
ORACLES.update({"dedup_incremental": SQL_DEDUP_INCREMENTAL})


# -- N-gram LM perplexity scoring (CCNet-style quality filter) ---------------


def q_doc_perplexity(spark, sf_dir):
    """Train an add-one-smoothed bigram LM on the corpus, score every
    document by mean -ln P(w2|w1) (functions/lm.py). The top-level
    statistic: per-source doc counts and the corpus' best/worst document
    by cross-entropy — the bucketing decision a CCNet-style filter
    makes."""
    from redpanda_spark.functions.lm import score_perplexity, train_bigram_lm

    docs = _t(spark, sf_dir, "documents")
    lm = train_bigram_lm(docs)
    scored = score_perplexity(docs, lm).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("cross_entropy"), 6).alias("avg_ce"),
            F.round(F.min("cross_entropy"), 6).alias("min_ce"),
            F.round(F.max("cross_entropy"), 6).alias("max_ce"),
        )
        .orderBy("source")
    )


SQL_DOC_PERPLEXITY = r"""
WITH toks AS (
  SELECT doc_id, source,
    list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS t
  FROM documents),
bg AS (
  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, source, t,
          unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)),
big AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, SUM(c) AS ctx FROM big GROUP BY w1),
vocab AS (SELECT COUNT(DISTINCT tok) AS v
          FROM (SELECT unnest(t) AS tok FROM toks)),
lm AS (
  SELECT w1, w2, (c + 1.0) / (ctx + v) AS p
  FROM big JOIN ctx USING (w1) CROSS JOIN vocab),
scored AS (
  SELECT doc_id, ANY_VALUE(source) AS source,
    ROUND(AVG(ROUND(-ln(p), 9)), 6) AS ce
  FROM bg JOIN lm USING (w1, w2) GROUP BY doc_id)
SELECT source, COUNT(*) AS n_docs,
  ROUND(AVG(ce), 6) AS avg_ce,
  ROUND(MIN(ce), 6) AS min_ce,
  ROUND(MAX(ce), 6) AS max_ce
FROM scored GROUP BY source ORDER BY source
"""

QUERIES.update({"doc_perplexity": q_doc_perplexity})
ORACLES.update({"doc_perplexity": SQL_DOC_PERPLEXITY})


# -- ListOffsets MAX_TIMESTAMP (-3, KIP-734) ---------------------------------


def q_log_max_timestamp(spark, sf_dir):
    """Per partition: offset + value of the record with the largest
    timestamp (ListOffsets -3; ties break to the higher offset, the
    broker's scan order). One struct-max aggregation — no sort/window."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS).withColumnRenamed("ts", "timestamp")
    return LOG.max_timestamp_offsets(log).select(
        F.col("partition").cast("int"),
        F.col("offset").cast("long"),
        F.col("max_timestamp").cast("timestamp"),
    )


SQL_LOG_MAX_TIMESTAMP = f"""
WITH {LOG_CTE}
SELECT CAST(l.partition AS INTEGER) AS partition,
       CAST(MAX(l."offset") AS BIGINT) AS "offset",
       CAST(m.mt AS TIMESTAMP) AS max_timestamp
FROM log l
JOIN (SELECT partition, MAX(ts) AS mt FROM log GROUP BY partition) m
  ON l.partition = m.partition AND l.ts = m.mt
GROUP BY l.partition, m.mt
"""

QUERIES.update({"log_max_timestamp": q_log_max_timestamp})
ORACLES.update({"log_max_timestamp": SQL_LOG_MAX_TIMESTAMP})


# -- Corpus datasheet (one-row dataset report) -------------------------------


def q_corpus_report(spark, sf_dir):
    """The dataset-datasheet numbers every released corpus publishes
    (counts, token volume, language/source spread, quality mean, exact
    duplicate rate), computed in one scan + one global aggregate. At
    100 TB this is the cheapest full-corpus job there is: every statistic
    is map-side combinable, and the duplicate rate rides the same pass as
    a countDistinct over the text hash."""
    from redpanda_spark.sources.tables import parallelize_narrow

    docs = parallelize_narrow(_t(spark, sf_dir, "documents"))
    toks = F.col("_toks")
    base = docs.withColumn("_toks", TXT.tokens("text"))
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.countDistinct(TXT.lang_id("text", toks=toks)).alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg(TXT.quality_score("text", toks=toks)), 6).alias("avg_quality"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct(F.md5("text")))
            / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


SQL_CORPUS_REPORT = f"""
WITH q AS ({SQL_DOC_QUALITY}),
l AS ({SQL_DOC_LANG_ID})
SELECT COUNT(*) AS n_docs,
  CAST(SUM({_TOKCNT_SQL}) AS BIGINT) AS n_tokens,
  (SELECT COUNT(DISTINCT lang_pred) FROM l) AS n_langs,
  COUNT(DISTINCT source) AS n_sources,
  ROUND((SELECT AVG(quality) FROM q), 6) AS avg_quality,
  ROUND((COUNT(*) - COUNT(DISTINCT md5(text))) * 1.0 / COUNT(*), 6)
    AS exact_dup_rate,
  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
  CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
"""

QUERIES.update({"corpus_report": q_corpus_report})
ORACLES.update({"corpus_report": SQL_CORPUS_REPORT})


# -- Funnel analysis (ordered event sequence per user) -----------------------


def q_events_funnel(spark, sf_dir):
    """view -> click -> purchase funnel: per-user earliest qualifying
    timestamp per stage (each stage strictly after the previous one),
    counted corpus-wide. One aggregation per stage over (user, type)
    slices — conditional min-timestamps with map-side combine, no
    self-joins, no windows; the standard product-analytics funnel at
    event-log scale."""
    ev = _t(spark, sf_dir, "events")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    agg = ev.groupBy("user_id").agg(
        t_view.alias("t1"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("event_type") == "click", F.col("ts"))
            )
        ).alias("clicks"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            )
        ).alias("purchases"),
    )
    # earliest click strictly after t1; earliest purchase strictly after t2
    t2 = F.array_min(F.filter("clicks", lambda c: c > F.col("t1")))
    funnel = agg.select(
        "user_id", "t1", t2.alias("t2"), F.col("purchases")
    ).select(
        "user_id",
        "t1",
        "t2",
        F.array_min(
            F.filter("purchases", lambda p: p > F.col("t2"))
        ).alias("t3"),
    )
    return funnel.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("stage_view"),
        F.count("t2").alias("stage_click"),
        F.count("t3").alias("stage_purchase"),
    )


SQL_EVENTS_FUNNEL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY user_id),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
       (SELECT COUNT(*) FROM t1) AS stage_view,
       (SELECT COUNT(*) FROM t2) AS stage_click,
       (SELECT COUNT(*) FROM t3) AS stage_purchase
"""

QUERIES.update({"events_funnel": q_events_funnel})
ORACLES.update({"events_funnel": SQL_EVENTS_FUNNEL})


# -- Perceptual image dedup (dHash + banded hamming join) --------------------


def q_mm_image_dedup(spark, sf_dir):
    """Image near-dup detection over REAL PNG wire bytes: per media id a
    32x32 grayscale pattern keyed by class = id % 23 (md5-seeded), with a
    per-member uniform brightness offset — different bytes, same
    gradients. dHash is brightness-invariant, so every same-class pair
    lands at hamming 0 and the oracle enumerates pairs arithmetically;
    cross-class patterns are random 63-bit hashes (no pair within 4 bits
    on this fixed fixture set)."""
    from redpanda_spark.functions.multimodal import image_near_dups

    docs = _t(spark, sf_dir, "documents")
    ids = docs.where(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("media_id")
    )

    @F.pandas_udf("binary")
    def make_png(mids: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        from redpanda_spark.functions.multimodal import encode_png

        out = []
        for mid in mids:
            mid = int(mid)
            cls, member = mid % 23, mid // 23
            seed = int.from_bytes(
                hashlib.md5(f"imgcls-{cls}".encode()).digest()[:4], "big"
            )
            rng = np.random.RandomState(seed)
            base = rng.randint(0, 180, (32, 32)).astype(np.int64)
            img = (base + (member * 13) % 40).astype(np.uint8)
            out.append(encode_png(img))
        return pd.Series(out)

    media = ids.select("media_id", make_png("media_id").alias("payload"))
    return image_near_dups(media, max_hamming=4).select(
        "id_a", "id_b", F.col("hamming").cast("int")
    )


SQL_MM_IMAGE_DEDUP = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INTEGER) AS hamming
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND a.doc_id % 23 = b.doc_id % 23
WHERE a.doc_id < 100 AND b.doc_id < 100
"""

QUERIES.update({"mm_image_dedup": q_mm_image_dedup})
ORACLES.update({"mm_image_dedup": SQL_MM_IMAGE_DEDUP})


# -- Train-once perplexity serving (persisted model table) -------------------


def q_doc_perplexity_serve(spark, sf_dir):
    """CCNet's actual deployment shape: the bigram LM is trained ONCE on a
    deterministic 10% sample (doc_id % 10 == 0), persisted as a model
    table, and every scoring call joins the corpus against the PERSISTED
    model — no training pass in the serving path. OOV bigrams (routine
    when the model saw only a sample) are excluded from the mean and
    surfaced as a per-source OOV rate, the gate a CCNet-style filter
    puts on out-of-distribution text.

    At 100 TB this is the whole point of train-once: the model is
    vocabulary-sized and broadcast; serving is one corpus pass with a
    map-side join — retraining per scoring run would add a full
    shuffle-aggregate over the corpus every time."""
    import hashlib
    import os
    import shutil
    import tempfile

    from redpanda_spark.functions.lm import score_perplexity, train_bigram_lm
    from redpanda_spark.sources.tables import parallelize_narrow

    docs = _t(spark, sf_dir, "documents")
    cache = os.path.join(
        tempfile.gettempdir(),
        "redpanda_spark_lm",
        hashlib.md5(sf_dir.encode()).hexdigest(),
    )
    model_path = os.path.join(cache, "bigram_lm.parquet")
    if not os.path.isdir(model_path):
        tmp = f"{model_path}.tmp-{os.getpid()}"
        train_bigram_lm(
            docs.where(F.col("doc_id") % 10 == 0)
        ).write.mode("overwrite").parquet(tmp)
        try:
            os.replace(tmp, model_path)  # atomic vs concurrent trainers
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # raced: loser yields
    lm = spark.read.parquet(model_path)
    # the bigram explode is per-row-heavy and the small parquet arrives as
    # one split: spread the scoring pass across cores (no-op at scale)
    scored = score_perplexity(parallelize_narrow(docs), lm).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("cross_entropy"), 6).alias("avg_ce"),
            F.round(F.sum("n_oov") / F.sum("n_bigrams"), 6).alias("oov_rate"),
        )
        .orderBy("source")
    )


SQL_DOC_PERPLEXITY_SERVE = r"""
WITH toks AS (
  SELECT doc_id, source,
    list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS t
  FROM documents),
bg AS (
  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, source, t,
          unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)),
big AS (SELECT w1, w2, COUNT(*) AS c FROM bg
        WHERE doc_id % 10 = 0 GROUP BY w1, w2),
ctx AS (SELECT w1, SUM(c) AS ctx FROM big GROUP BY w1),
vocab AS (SELECT COUNT(DISTINCT tok) AS v
          FROM (SELECT unnest(t) AS tok FROM toks WHERE doc_id % 10 = 0)),
lm AS (
  SELECT w1, w2, (c + 1.0) / (ctx + v) AS p
  FROM big JOIN ctx USING (w1) CROSS JOIN vocab),
scored AS (
  SELECT bg.doc_id, ANY_VALUE(bg.source) AS source,
    COUNT(*) AS n_bigrams,
    SUM(CASE WHEN lm.p IS NULL THEN 1 ELSE 0 END) AS n_oov,
    ROUND(AVG(ROUND(-ln(lm.p), 9)), 6) AS ce
  FROM bg LEFT JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
  GROUP BY bg.doc_id)
SELECT source, COUNT(*) AS n_docs,
  ROUND(AVG(ce), 6) AS avg_ce,
  ROUND(SUM(n_oov) * 1.0 / SUM(n_bigrams), 6) AS oov_rate
FROM scored GROUP BY source ORDER BY source
"""

QUERIES.update({"doc_perplexity_serve": q_doc_perplexity_serve})
ORACLES.update({"doc_perplexity_serve": SQL_DOC_PERPLEXITY_SERVE})


# -- Fetch byte budget (max.partition.fetch.bytes) ---------------------------


def q_log_fetch_bytes(spark, sf_dir):
    """Fetch with the Kafka byte budget (`handlers/fetch.cc` op_context
    byte accounting): records of one partition from a start offset until
    the cumulative wire size exceeds the budget — whole records only,
    first record always returned."""
    log = topic_view(spark, sf_dir, NUM_PARTITIONS).select(
        "partition",
        "offset",
        "event_id",
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.col("props").cast("binary").alias("value"),
    )
    return LOG.fetch_max_bytes(
        log, max_bytes=4096, partition=2, start_offset=50
    ).select(
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        "event_id",
        F.length("value").cast("int").alias("n_value_bytes"),
    )


SQL_LOG_FETCH_BYTES = f"""
WITH {LOG_CTE},
sized AS (
  SELECT partition, "offset", event_id,
         16 + octet_length(encode(CAST(user_id AS VARCHAR))) + octet_length(encode(props)) AS sz
  FROM log WHERE partition = 2 AND "offset" >= 50),
runsum AS (
  SELECT *, SUM(sz) OVER (PARTITION BY partition ORDER BY "offset"
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM sized)
SELECT CAST(partition AS INTEGER) AS partition,
       CAST("offset" AS BIGINT) AS "offset",
       event_id,
       CAST(octet_length(encode((SELECT props FROM log l
                          WHERE l.partition = runsum.partition
                            AND l."offset" = runsum."offset"))) AS INTEGER)
         AS n_value_bytes
FROM runsum WHERE cum - sz < 4096
"""

QUERIES.update({"log_fetch_bytes": q_log_fetch_bytes})
ORACLES.update({"log_fetch_bytes": SQL_LOG_FETCH_BYTES})


# -- Document chunking (RAG / long-context training windows) -----------------


def q_doc_chunk(spark, sf_dir):
    """Overlapping token-window chunking (window=32, stride=24): the
    RAG-index / training-split operator, one narrow JVM pass."""
    from redpanda_spark.pipeline.dataset import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, 32, 24).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("n_chunks").cast("int").alias("n_chunks"),
        "chunk_text",
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )


SQL_DOC_CHUNK = r"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS t
  FROM documents),
starts AS (
  SELECT doc_id, t, CAST(ceil(len(t) / 24.0) AS INTEGER) AS n_chunks,
         unnest(range(0, len(t), 24)) AS s
  FROM toks WHERE len(t) > 0)
SELECT doc_id, CAST(s / 24 AS INTEGER) AS chunk_idx, n_chunks,
  array_to_string(t[s + 1 : s + 32], ' ') AS chunk_text,
  CAST(len(t[s + 1 : s + 32]) AS INTEGER) AS n_tokens
FROM starts
"""

QUERIES.update({"doc_chunk": q_doc_chunk})
ORACLES.update({"doc_chunk": SQL_DOC_CHUNK})


# -- Dataset mixture planning ------------------------------------------------

_PLAN_WEIGHTS = {"src0": 0.3, "src1": 0.25, "src2": 0.2, "src3": 0.15}
_PLAN_BUDGET = 4000


def q_mixture_plan(spark, sf_dir):
    """DoReMi-style mixture planning: target token allocation, capped
    sampling rate, epochs-over-source, and deficit per source for a fixed
    token budget and target weights."""
    from redpanda_spark.functions.text import token_count
    from redpanda_spark.pipeline.dataset import mixture_plan

    docs = _t(spark, sf_dir, "documents").select(
        "source", token_count("text").alias("n_tokens")
    )
    return mixture_plan(docs, _PLAN_WEIGHTS, _PLAN_BUDGET).orderBy("source")


_MIX_CASE = " ".join(
    f"WHEN source = '{s}' THEN {w}" for s, w in _PLAN_WEIGHTS.items()
)
SQL_MIXTURE_PLAN = rf"""
WITH sized AS (
  SELECT source,
    len(list_filter(string_split_regex(trim(text), '\s+'), t -> t != ''))
      AS n_tokens,
    CASE {_MIX_CASE} ELSE 0.0 END AS weight
  FROM documents),
per AS (
  SELECT source, SUM(n_tokens) AS available_tokens,
         COUNT(*) AS n_docs, ANY_VALUE(weight) AS weight
  FROM sized GROUP BY source)
SELECT source, n_docs, CAST(available_tokens AS BIGINT) AS available_tokens,
  CAST(ROUND(weight * {_PLAN_BUDGET}) AS BIGINT) AS target_tokens,
  LEAST(1.0, CAST(CAST(ROUND(weight * {_PLAN_BUDGET}) AS BIGINT) AS DOUBLE)
             / CAST(available_tokens AS DOUBLE)) AS sample_rate,
  CAST(CAST(ROUND(weight * {_PLAN_BUDGET}) AS BIGINT) AS DOUBLE)
    / CAST(available_tokens AS DOUBLE) AS epochs,
  CAST(GREATEST(0, CAST(ROUND(weight * {_PLAN_BUDGET}) AS BIGINT)
              - available_tokens) AS BIGINT) AS deficit_tokens
FROM per ORDER BY source
"""

QUERIES.update({"mixture_plan": q_mixture_plan})
ORACLES.update({"mixture_plan": SQL_MIXTURE_PLAN})


# -- Quality-weighted upsampling ---------------------------------------------


def q_pipeline_upsample(spark, sf_dir):
    """Deterministic quality-weighted repetition: weight = 1 + 2 *
    stopword_ratio (a cheap quality proxy) -> floor copies + hash-decided
    fractional copy. Returns per-source copy counts (stable aggregate of
    the exploded set)."""
    from redpanda_spark.pipeline.dataset import upsample_by_quality

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (F.lit(1.0) + F.lit(2.0) * F.round(TXT.stopword_ratio("text"), 6)).alias(
            "w"
        ),
    )
    up = upsample_by_quality(docs, "w")
    return up.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("copy").cast("int").alias("max_copy"),
    ).orderBy("source")


SQL_PIPELINE_UPSAMPLE = rf"""
WITH sized AS (
  SELECT doc_id, source,
    1.0 + 2.0 * ROUND(CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'), t -> t != '')) > 0
      THEN CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                t -> lower(t) IN ({_SW}))) AS DOUBLE)
           / len(list_filter(string_split_regex(trim(text), '\s+'), t -> t != ''))
      ELSE 0.0 END, 6) AS w
  FROM documents),
counted AS (
  SELECT doc_id, source,
    CAST(FLOOR(w) AS INTEGER)
    + CASE WHEN (doc_id % 2147483647) * 2654435761 % 1000000
                < (w - FLOOR(w)) * 1000000 THEN 1 ELSE 0 END AS n_copies
  FROM sized),
exploded AS (
  SELECT doc_id, source, unnest(range(0, n_copies)) AS copy
  FROM counted WHERE n_copies > 0)
SELECT source, COUNT(*) AS n_copies, COUNT(DISTINCT doc_id) AS n_docs,
       CAST(MAX(copy) AS INTEGER) AS max_copy
FROM exploded GROUP BY source ORDER BY source
"""

QUERIES.update({"pipeline_upsample": q_pipeline_upsample})
ORACLES.update({"pipeline_upsample": SQL_PIPELINE_UPSAMPLE})


# -- Iceberg export metadata gate --------------------------------------------


def q_iceberg_export_counts(spark, sf_dir):
    """Round-trips the Iceberg v2 export (sources/iceberg_export.py): a
    deterministic events-derived datalake table is exported once (cached),
    and the MANIFEST ENTRIES — decoded from the Avro container file, not
    from the data — report per-hour record counts. The oracle recomputes
    the same counts from the raw events table in DuckDB, so a lie anywhere
    in the export chain (partition value encoding, entry record_count,
    file copy) breaks the value hash."""
    import hashlib
    import os
    import shutil
    import tempfile

    from redpanda_spark.sources.datalake import write_datalake
    from redpanda_spark.sources.iceberg_export import (
        avro_ocf_read,
        export_iceberg,
    )

    cache = os.path.join(
        tempfile.gettempdir(),
        "redpanda_spark_ice",
        hashlib.md5(sf_dir.encode()).hexdigest(),
    )
    meta_file = os.path.join(cache, "ice", "metadata", "v1.metadata.json")
    if not os.path.exists(meta_file):
        # export in place (the metadata embeds absolute paths, so a
        # tmp+rename dance would orphan them); a half-built cache from a
        # crash is rebuilt from scratch
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        ev = _t(spark, sf_dir, "events")
        df = ev.select(
            "event_id",
            "event_type",
            "value",
            F.date_trunc("hour", F.col("ts")).alias("_hour"),
        )
        write_datalake(df, os.path.join(cache, "lake"))
        export_iceberg(
            spark, os.path.join(cache, "lake"), os.path.join(cache, "ice")
        )
    # manifest-list path out of the (path-rewritten) table metadata
    import json as _json

    meta = _json.load(open(meta_file))
    [snap] = meta["snapshots"]
    _s, _m, mfiles = avro_ocf_read(snap["manifest-list"])
    rows = []
    for mf in mfiles:
        _es, _em, entries = avro_ocf_read(mf["manifest_path"])
        for e in entries:
            rows.append(
                (
                    int(e["data_file"]["partition"]["_hour"]),
                    int(e["data_file"]["record_count"]),
                )
            )
    agg: dict[int, int] = {}
    for h, n in rows:
        agg[h] = agg.get(h, 0) + n
    return spark.createDataFrame(
        sorted(agg.items()), "hour_us long, n_rows long"
    )


SQL_ICEBERG_EXPORT_COUNTS = """
SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
       COUNT(*) AS n_rows
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES.update({"iceberg_export_counts": q_iceberg_export_counts})
ORACLES.update({"iceberg_export_counts": SQL_ICEBERG_EXPORT_COUNTS})


# -- Windowed top-k (per tumbling window, per type) --------------------------


def q_events_window_topk(spark, sf_dir):
    """Top-3 users per (1-hour tumbling window, event_type) by event
    count, user_id tiebreak — the windowed leaderboard shape (streaming
    twin in streaming/stateful tests). rank-over-aggregate: the heavy
    aggregation is map-side combinable; the rank window runs over the
    already-reduced per-(window,type,user) rows, never over raw events."""
    ev = _t(spark, sf_dir, "events")
    agg = (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "user_id",
            "n",
        )
    )
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("win_start_us", "event_type").orderBy(
            F.col("n").desc(), F.col("user_id")
        )
    )
    return (
        agg.withColumn("rank", rk.cast("int"))
        .where(F.col("rank") <= 3)
        .orderBy("win_start_us", "event_type", "rank")
    )


SQL_EVENTS_WINDOW_TOPK = """
WITH agg AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS win_start_us,
         event_type, user_id, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY win_start_us, event_type
      ORDER BY n DESC, user_id) AS INTEGER) AS rank
  FROM agg)
SELECT win_start_us, event_type, user_id, n, rank
FROM ranked WHERE rank <= 3
ORDER BY win_start_us, event_type, rank
"""

QUERIES.update({"events_window_topk": q_events_window_topk})
ORACLES.update({"events_window_topk": SQL_EVENTS_WINDOW_TOPK})


# -- Product-quantization ANN (ADC) ------------------------------------------


def q_ann_pq(spark, sf_dir):
    """PQ-ADC shortlist + exact re-rank (similarity/pq.py): codebooks fit
    on a deterministic id-hash sample, vectors encoded to 8x16 codes, the
    query scored JVM-side via an unrolled lookup-table sum. Output = the
    EXACT top-10 by squared L2 (hash-checkable against the oracle's list
    arithmetic) plus `recall_ok` asserting the ADC shortlist captured
    >= 50% of the exact top-10 — a PQ accuracy regression flips the
    boolean and fails the value hash (same sketch-gate pattern as the
    HLL/quantile queries). The shortlist budget scales with corpus size
    (max(50, n/20)) for the same reason as ann_ivfpq: the synthetic
    embeddings are distance-concentrated, so 8-byte codes need a deeper
    refine pass as density grows."""
    import numpy as np
    from pyspark.sql import Window as W

    from redpanda_spark.similarity.pq import (
        fit_pq_codebooks,
        pq_adc_topk,
        pq_encode,
    )
    from redpanda_spark.sources.tables import parallelize_narrow

    emb = _t(spark, sf_dir, "embeddings")
    # footer count, no Spark job (exact — sizes the shortlist budget)
    n_emb = _parquet_rows(sf_dir, "embeddings") or emb.count()
    books = fit_pq_codebooks(emb)
    q = np.array(
        emb.where(F.col("vec_id") == 1)
        .select(as_double("embedding").alias("v"))
        .collect()[0]["v"]
    )
    codes = pq_encode(parallelize_narrow(emb), books)
    k_adc = max(50, n_emb // 20)  # corpus-scaled rerank budget (docstring)
    shortlist = {
        r["vec_id"] for r in pq_adc_topk(codes, q, books, k=k_adc).collect()
    }
    # one array literal, not d per-component F.lit py4j round trips
    qlit = F.lit([float(x) for x in q])
    dist = F.aggregate(
        F.zip_with(as_double("embedding"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ranked = (
        emb.select("vec_id", dist.alias("d"))
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("d"), F.col("vec_id"))).cast("int"),
        )
        .where(F.col("rank") <= 10)
    )
    exact_ids = [r["vec_id"] for r in ranked.select("vec_id").collect()]
    recall_ok = sum(1 for i in exact_ids if i in shortlist) >= 5
    return ranked.select(
        "rank",
        "vec_id",
        F.round("d", 6).alias("dist"),
        F.lit(bool(recall_ok)).alias("recall_ok"),
    ).orderBy("rank")


SQL_ANN_PQ = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1),
d AS (
  SELECT vec_id,
    list_sum(list_transform(range(len(qv)),
      i -> (CAST(embedding AS DOUBLE[])[i + 1] - qv[i + 1])
           * (CAST(embedding AS DOUBLE[])[i + 1] - qv[i + 1]))) AS dd
  FROM embeddings, q),
r AS (
  SELECT vec_id, dd,
    CAST(ROW_NUMBER() OVER (ORDER BY dd, vec_id) AS INTEGER) AS rank
  FROM d)
SELECT rank, vec_id, ROUND(dd, 6) AS dist, TRUE AS recall_ok
FROM r WHERE rank <= 10 ORDER BY rank
"""

QUERIES.update({"ann_pq": q_ann_pq})
ORACLES.update({"ann_pq": SQL_ANN_PQ})


# -- Gopher quality rules ------------------------------------------------------


def q_doc_gopher_rules(spark, sf_dir):
    """Per-document Gopher quality signals + verdict (functions/text.py
    gopher_rules; Rae et al. 2021 thresholds)."""
    docs = _t(spark, sf_dir, "documents")
    # synthetic-corpus tuning (documented in gopher_rules): the fixture
    # vocabulary carries few English function words, so the stopword
    # floor drops to 1 — the verdict then actually discriminates
    sig = TXT.gopher_rules("text", min_words=50, min_stopwords=1)
    return docs.select(
        "doc_id", *[v.alias(k) for k, v in sig.items()]
    )


_GSW = ", ".join(f"'{w}'" for w in TXT.GOPHER_STOPWORDS)
SQL_DOC_GOPHER_RULES = rf"""
WITH t AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS toks
  FROM documents),
sig AS (
  SELECT doc_id,
    len(toks) AS n,
    GREATEST(len(toks), 1) AS nz,
    list_sum(list_transform(toks, x -> length(x))) AS charsum,
    len(string_split(text, '#')) - 1 AS n_hash,
    len(string_split(text, '...')) - 1 AS n_ellipsis,
    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
    len(list_filter([{_GSW}],
        s -> list_contains(list_transform(toks, x -> lower(x)), s))) AS stop_hits
  FROM t)
SELECT doc_id,
  CAST(n AS INTEGER) AS n_words,
  ROUND(COALESCE(charsum, 0) * 1.0 / nz, 6) AS mean_word_len,
  ROUND((n_hash + n_ellipsis) * 1.0 / nz, 6) AS symbol_ratio,
  ROUND(n_alpha * 1.0 / nz, 6) AS alpha_frac,
  CAST(stop_hits AS INTEGER) AS stopword_hits,
  (n BETWEEN 50 AND 100000
   AND ROUND(COALESCE(charsum, 0) * 1.0 / nz, 6) BETWEEN 3.0 AND 10.0
   AND ROUND((n_hash + n_ellipsis) * 1.0 / nz, 6) <= 0.1
   AND ROUND(n_alpha * 1.0 / nz, 6) >= 0.8
   AND stop_hits >= 1) AS gopher_pass
FROM sig
"""

QUERIES.update({"doc_gopher_rules": q_doc_gopher_rules})
ORACLES.update({"doc_gopher_rules": SQL_DOC_GOPHER_RULES})


# -- IVF + PQ composed ANN (the FAISS IVFPQ shape) ----------------------------


def q_ann_ivfpq(spark, sf_dir):
    """The billion-scale ANN layout: IVF cells prune WHICH vectors to
    score (nprobe of n_cells), PQ-ADC prunes WHAT scoring costs (m table
    lookups per candidate). Gate = exact top-10 by squared L2
    (hash-checked) + recall_ok asserting the IVFPQ shortlist (nprobe=8
    of 16 cells) captures >= 50% of it. The ADC shortlist (rerank
    budget) scales with corpus size — max(50, n/20): these synthetic
    embeddings are distance-concentrated (near-uniform in 64-dim), so
    8-byte codes need a deeper refine pass as density grows; measured at
    sf1 the IVF stage still holds 9/10 of the exact set, and this budget
    recovers >= 8/10 (real clustered embeddings discriminate at a fixed
    refine factor — FAISS IndexRefineFlat's shape)."""
    import numpy as np
    from pyspark.sql import Window as W

    from redpanda_spark.similarity.pq import (
        fit_pq_codebooks,
        pq_adc_topk,
        pq_encode,
    )
    from redpanda_spark.sources.tables import parallelize_narrow

    emb = _t(spark, sf_dir, "embeddings")
    # footer count, no Spark job (exact — sizes the shortlist budget)
    n_emb = _parquet_rows(sf_dir, "embeddings") or emb.count()
    cents = fit_ivf_centroids(emb, n_cells=16)
    corpus = ivf_assign(parallelize_narrow(emb), cents).select("vec_id", "cell")
    books = fit_pq_codebooks(emb)
    codes = pq_encode(parallelize_narrow(emb), books)
    q = np.array(
        emb.where(F.col("vec_id") == 2)
        .select(as_double("embedding").alias("v"))
        .collect()[0]["v"]
    )
    # probe cells driver-side: centroids are engine metadata, not data
    sims = np.round(cents @ q, 6)
    probed = [int(c) for c in np.argsort(-sims)[:8]]
    cands = codes.join(corpus, "vec_id").where(F.col("cell").isin(probed))
    k_adc = max(50, n_emb // 20)  # corpus-scaled rerank budget (docstring)
    shortlist = {
        r["vec_id"] for r in pq_adc_topk(cands, q, books, k=k_adc).collect()
    }
    # one array literal, not d per-component F.lit py4j round trips
    qlit = F.lit([float(x) for x in q])
    dist = F.aggregate(
        F.zip_with(as_double("embedding"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ranked = (
        emb.select("vec_id", dist.alias("d"))
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("d"), F.col("vec_id"))).cast("int"),
        )
        .where(F.col("rank") <= 10)
    )
    exact_ids = [r["vec_id"] for r in ranked.select("vec_id").collect()]
    recall_ok = sum(1 for i in exact_ids if i in shortlist) >= 5
    return ranked.select(
        "rank",
        "vec_id",
        F.round("d", 6).alias("dist"),
        F.lit(bool(recall_ok)).alias("recall_ok"),
    ).orderBy("rank")


SQL_ANN_IVFPQ = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 2),
d AS (
  SELECT vec_id,
    list_sum(list_transform(range(len(qv)),
      i -> (CAST(embedding AS DOUBLE[])[i + 1] - qv[i + 1])
           * (CAST(embedding AS DOUBLE[])[i + 1] - qv[i + 1]))) AS dd
  FROM embeddings, q),
r AS (
  SELECT vec_id, dd,
    CAST(ROW_NUMBER() OVER (ORDER BY dd, vec_id) AS INTEGER) AS rank
  FROM d)
SELECT rank, vec_id, ROUND(dd, 6) AS dist, TRUE AS recall_ok
FROM r WHERE rank <= 10 ORDER BY rank
"""

QUERIES.update({"ann_ivfpq": q_ann_ivfpq})
ORACLES.update({"ann_ivfpq": SQL_ANN_IVFPQ})


# -- Continuous rollup (hypertable downsampling) -----------------------------


def q_events_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate (streaming/rollup.py): the
    events table is folded into the rollup store in TWO incremental
    merges (odd/even event ids — every window is touched twice, so the
    stored+new combine path actually runs), then read back. The oracle is
    a single-pass SQL GROUP BY over the full input: the merge algebra is
    hash-checked value-for-value, not assumed."""
    import hashlib
    import os
    import shutil
    import tempfile

    from redpanda_spark.streaming.rollup import merge_rollup, read_rollup

    ev = _t(spark, sf_dir, "events")
    # cache key = path + input fingerprint (size/mtime of every file under
    # the events parquet): regenerating fixtures in place MUST invalidate
    # the store — a path-only key silently replays a stale rollup
    src = os.path.join(sf_dir, "events.parquet")
    parts = [src]
    if os.path.isdir(src):
        parts = [os.path.join(src, f) for f in sorted(os.listdir(src))]
    fp = ";".join(
        f"{p}:{st.st_size}:{st.st_mtime_ns}"
        for p in parts
        if os.path.exists(p)
        for st in [os.stat(p)]
    )
    cache = os.path.join(
        tempfile.gettempdir(),
        "redpanda_spark_rollup",
        hashlib.md5(f"{sf_dir}|{fp}".encode()).hexdigest(),
    )
    marker = os.path.join(cache, "_built")
    if not os.path.exists(marker):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        merge_rollup(cache, ev.where(F.col("event_id") % 2 == 0))
        merge_rollup(cache, ev.where(F.col("event_id") % 2 == 1))
        open(marker, "w").write("1")
    out = read_rollup(spark, cache)
    # avg as EXACT half-up integer micro-units — ROUND(double,6) hits
    # exact .5 ties at sf1 (2-dp values / round counts, e.g.
    # 13911.3/320 = 43.4728125) where Spark (BigDecimal on the double's
    # true value) and DuckDB (multiply-based) round apart. All-integer:
    # sum is decimal(18,4) ⇒ sum*1e4 exact BIGINT; half-up(x*100/n) =
    # (200x + n) div 2n for non-negative sums. BIGINT headroom to ~sf100
    # gate fixtures; production rollups keep the decimal sum.
    return out.select(
        F.unix_micros("window_start").alias("win_us"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("sum_value"), 6).cast("double").alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
        F.expr(
            "(CAST(sum_value * 10000 AS BIGINT) * 200 + n) div (n * 2)"
        ).alias("avg_micros"),
    ).orderBy("win_us", "event_type")


SQL_EVENTS_ROLLUP = """
SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS win_us,
  event_type, COUNT(*) AS n,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS sum_value,
  ROUND(MIN(value), 6) AS min_value,
  ROUND(MAX(value), 6) AS max_value,
  (CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) * 200 + COUNT(*))
    // (COUNT(*) * 2) AS avg_micros
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES.update({"events_rollup": q_events_rollup})
ORACLES.update({"events_rollup": SQL_EVENTS_ROLLUP})


# -- Language-ID evaluation (confusion matrix) -------------------------------


def q_doc_lang_eval(spark, sf_dir):
    """Language-filter evaluation: confusion matrix of the labeled `lang`
    column vs the marker-heuristic prediction, with per-label fractions —
    the quality dashboard any lang-filtered corpus pipeline keeps. One
    scan + one small groupBy; the per-label normalization joins the
    already-reduced matrix (25 rows), never the corpus."""
    docs = parallelize_narrow(_t(spark, sf_dir, "documents"))
    cm = (
        docs.select("lang", TXT.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cm.groupBy("lang").agg(F.sum("n").alias("t"))
    return (
        cm.join(tot, "lang")
        .select(
            "lang",
            "lang_pred",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("t"), 6).alias("frac"),
        )
        .orderBy("lang", "lang_pred")
    )


SQL_DOC_LANG_EVAL = f"""
WITH scored AS (SELECT lang, {_lang_scores_select} FROM documents),
pred AS (SELECT lang, {_lang_case} AS lang_pred FROM scored),
cm AS (SELECT lang, lang_pred, COUNT(*) AS n FROM pred GROUP BY 1, 2),
tot AS (SELECT lang, SUM(n) AS t FROM cm GROUP BY 1)
SELECT cm.lang, lang_pred, n, ROUND(n * 1.0 / t, 6) AS frac
FROM cm JOIN tot USING (lang) ORDER BY 1, 2
"""

QUERIES.update({"doc_lang_eval": q_doc_lang_eval})
ORACLES.update({"doc_lang_eval": SQL_DOC_LANG_EVAL})


# -- BM25 ranked keyword retrieval (round 7) ---------------------------------

_BM25_TERMS = ["hash", "join", "window"]


def q_doc_bm25(spark, sf_dir):
    """BM25 top-20 for a fixed query-term set (similarity/bm25.py): the
    sparse lexical retriever of the search family — tf from token-array
    filters (no explode, no shuffle), 1-row corpus-stats broadcast,
    fixed-order per-term sum (9dp inner round, the repo's cross-engine
    ln convention), distributed TakeOrderedAndProject top-k."""
    from redpanda_spark.similarity.bm25 import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=20)


def _bm25_sql() -> str:
    k1, b = 1.2, 0.75
    tf_cols = ",\n    ".join(
        f"CAST(len(list_filter(toks, t -> t = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    term_sum = "\n      + ".join(
        f"ROUND(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * {k1 + 1.0} / (tf_{i} + {k1} *"
        f" (1.0 - {b} + {b} * dl / avgdl)), 9)"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH tokd AS (
  SELECT doc_id,
    list_transform(
      list_filter(string_split_regex(trim(text), '\\s+'), t -> t != ''),
      t -> lower(t)) AS toks
  FROM documents),
per_doc AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
    {tf_cols}
  FROM tokd),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl, {df_cols}
  FROM per_doc),
scored AS (
  SELECT doc_id,
    CAST(CAST(ROUND({term_sum}, 6) AS VARCHAR) AS DOUBLE) AS score
  FROM per_doc, stats),
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
           AS rank, doc_id, score
  FROM scored WHERE score > 0)
SELECT rank, doc_id, score FROM ranked WHERE rank <= 20 ORDER BY rank
"""


QUERIES.update({"doc_bm25": q_doc_bm25})
ORACLES.update({"doc_bm25": _bm25_sql()})


# -- Day-over-day user retention (round 7) -----------------------------------


def q_events_retention(spark, sf_dir):
    """Cohort retention: per activity day, distinct active users and how
    many are active again the NEXT day. Scale shape: ONE shuffle on
    user_id (groupBy + collect_set of the bounded per-user day set), the
    consecutive-day flag is an array lookup, and the per-day counts are a
    map-side-combinable aggregate over the exploded (user, day) rows."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.select(
        "user_id", F.to_date(F.col("ts")).alias("d")
    ).groupBy("user_id").agg(F.collect_set("d").alias("days"))
    flagged = per_user.select(
        "user_id",
        F.explode("days").alias("day"),
        F.col("days").alias("_days"),
    ).select(
        "user_id",
        "day",
        F.array_contains(F.col("_days"), F.date_add(F.col("day"), 1))
        .cast("int")
        .alias("retained"),
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_users"),
            F.sum("retained").cast("long").alias("retained_next_day"),
        )
        .select(
            "day",
            "active_users",
            "retained_next_day",
            # pure double division of exact int64s — IEEE `/` is correctly
            # rounded, bit-identical across engines; ROUND(double,6)
            # diverges in the last bit and decimal output fails the
            # driver's canonicalization (r8).
            (
                F.col("retained_next_day").cast("double")
                / F.col("active_users").cast("double")
            ).alias("retention_rate"),
        )
        .orderBy("day")
    )


SQL_EVENTS_RETENTION = """
WITH daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT a.day, COUNT(*) AS active_users,
  CAST(SUM(CASE WHEN EXISTS (
        SELECT 1 FROM daily b
        WHERE b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY)
      THEN 1 ELSE 0 END) AS BIGINT) AS retained_next_day,
  CAST(SUM(CASE WHEN EXISTS (
        SELECT 1 FROM daily b
        WHERE b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY)
      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    AS retention_rate
FROM daily a GROUP BY a.day ORDER BY a.day
"""

QUERIES.update({"events_retention": q_events_retention})
ORACLES.update({"events_retention": SQL_EVENTS_RETENTION})


# -- Per-source dedup-rate observability (round 7) ---------------------------


def q_dedup_rate_by_source(spark, sf_dir):
    """Exact-duplicate observability per source: the dedup dashboard any
    corpus build keeps (how dirty is each feed). countDistinct over the
    md5 of the text — the hash (not the text) is what shuffles."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct(F.md5(F.col("text").cast("binary")))
            .cast("long")
            .alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            # exact-int double division, no ROUND: bit-identical across
            # engines (see retention_rate note).
            (
                (F.col("n_docs") - F.col("n_unique")).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


SQL_DEDUP_RATE_BY_SOURCE = """
SELECT source, COUNT(*) AS n_docs,
  COUNT(DISTINCT md5(text)) AS n_unique,
  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE)
       / CAST(COUNT(*) AS DOUBLE) AS dup_rate
FROM documents GROUP BY source ORDER BY source
"""

QUERIES.update({"dedup_rate_by_source": q_dedup_rate_by_source})
ORACLES.update({"dedup_rate_by_source": SQL_DEDUP_RATE_BY_SOURCE})


# -- Corpus n-gram heavy hitters (round 7) -----------------------------------


def q_doc_ngram_topk(spark, sf_dir):
    """Top-20 word bigrams corpus-wide — the heavy-hitter scan every
    corpus datasheet includes (and the contamination screen's unit of
    account). Scale shape: bigram explode feeds ONE map-side-combinable
    count aggregate; top-k is TakeOrderedAndProject after the reduced
    (distinct-bigram-sized) table, never a global sort of the corpus."""
    from redpanda_spark.sources.tables import parallelize_narrow

    # local fixtures arrive as 1-2 splits; the explode is per-row-heavy
    docs = parallelize_narrow(_t(spark, sf_dir, "documents"))
    toks = TXT.tokens("text")
    # arrays_zip of two shifted slices, not transform+element_at: no
    # lambda in the hot path keeps the explode inside whole-stage codegen
    # (the lm.doc_bigrams shape — measured ~3x); docs with <2 tokens
    # contribute nothing, matching the oracle's len >= 2 guard
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
        F.slice(toks, 2, F.size(toks) - 1).alias("w2"),
    )
    counts = (
        docs.where(F.size(toks) >= 2)
        .select(F.explode(pairs).alias("b"))
        .select(F.concat_ws(" ", F.col("b.w1"), F.col("b.w2")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), "bigram").limit(20)
    w = Window.orderBy(F.col("cnt").desc(), "bigram")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "bigram", "cnt"
    )


SQL_DOC_NGRAM_TOPK = r"""
WITH toks AS (
  SELECT list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS t
  FROM documents),
bi AS (
  SELECT t[i] || ' ' || t[i + 1] AS bigram
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)),
c AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM bi GROUP BY bigram)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, bigram) AS INT) AS rank,
       bigram, cnt
FROM c ORDER BY cnt DESC, bigram LIMIT 20
"""

QUERIES.update({"doc_ngram_topk": q_doc_ngram_topk})
ORACLES.update({"doc_ngram_topk": SQL_DOC_NGRAM_TOPK})


# -- Daily-volume anomaly screen (round 7) -----------------------------------


def q_events_anomaly(spark, sf_dir):
    """Per event-type daily-volume z-scores with |z| > 2 flags — the
    topic-health anomaly screen. Cross-engine exactness: mean/variance
    are derived from EXACT integer sums (sum, sum of squares, day count)
    with an identical expression order on both sides — never
    stddev_samp, whose streaming accumulation is summation-order-
    dependent. Two tiny aggregates (days x types, then types)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count(F.lit(1)).alias("d"),
    )
    mean = F.col("s1") / F.col("d")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("d")) / (
        F.col("d") - 1
    )
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .where(F.col("d") > 1)
        .select(
            "event_type",
            "day",
            "n",
            # raw double z, no ROUND: every step (int64->double casts,
            # -, /, sqrt) is IEEE correctly-rounded with an identical
            # expression tree on both sides -> bit-identical result.
            z.alias("z"),
            (F.abs(z) > 2).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


SQL_EVENTS_ANOMALY = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, SUM(n) AS s1, SUM(n * n) AS s2, COUNT(*) AS d
  FROM daily GROUP BY 1)
SELECT daily.event_type, day, n,
  (n - s1 / d) / sqrt((s2 - s1 * s1 / d) / (d - 1)) AS z,
  abs((n - s1 / d) / sqrt((s2 - s1 * s1 / d) / (d - 1))) > 2 AS is_anomaly
FROM daily JOIN stats USING (event_type)
WHERE d > 1
ORDER BY event_type, day
"""

QUERIES.update({"events_anomaly": q_events_anomaly})
ORACLES.update({"events_anomaly": SQL_EVENTS_ANOMALY})


# -- Segment manifest stats (round 7) ----------------------------------------


def q_log_segments(spark, sf_dir):
    """The engine's manifest pruning index, value-for-value: a real topic
    is built from events in four deterministic record batches (one
    segment each), and each segment's footer stats — partition range,
    offset range, row count, timestamp range in integer µs — are emitted
    in append order. The oracle recomputes every stat from the events
    table alone, so the sparse-index analog the fetch path prunes with
    (reference `storage/index_state.h`) is hash-checked, not assumed.
    The driver-side build is gate-SF test scaffolding (cached by input
    fingerprint, like events_rollup's store); at scale segments are
    born from produce batches and the stats ride the same manifest."""
    import datetime as _dt
    import hashlib
    import shutil
    import tempfile

    from redpanda_spark.engine import TopicConfig, TopicEngine

    root = os.path.join(
        tempfile.gettempdir(),
        "redpanda_spark_segments",
        hashlib.md5(f"{sf_dir}|{_doc_fingerprint(sf_dir)}".encode()).hexdigest(),
    )
    marker = os.path.join(root, "_built")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        # bounded build: ≤400k events → ≤100k records per batch, which
        # keeps every batch on the deterministic record-list produce path
        # (the DF fallback writes one file per task — segment ordinals
        # would no longer be the 4 batches). No-op at the gate SF.
        ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 400_000)
        # ts arrives as TIMESTAMP or (nanosAsLong sessions) as LONG nanos
        ts_us = (
            F.unix_micros(F.col("ts"))
            if ev.schema["ts"].dataType.typeName().startswith("timestamp")
            else F.expr("ts div 1000").cast("long")
        )
        rows = (
            ev.select(
                "event_id",
                F.pmod(F.col("user_id"), F.lit(NUM_PARTITIONS))
                .cast("int")
                .alias("p"),
                ts_us.alias("ts_us"),
            )
            .orderBy("event_id")
            .collect()
        )
        eng = TopicEngine(spark, root)
        eng.create_topic("seg", TopicConfig(partitions=NUM_PARTITIONS))
        utc = _dt.timezone.utc
        for b in range(4):
            recs = [
                {
                    "partition": r["p"],
                    "value": str(r["event_id"]).encode(),
                    "timestamp": _dt.datetime.fromtimestamp(
                        r["ts_us"] / 1e6, tz=utc
                    ),
                }
                for r in rows
                if r["event_id"] % 4 == b
            ]
            eng.produce("seg", recs)
        open(marker, "w").write("1")
    # read_only: a stats read must not claim the fixture root's writer
    # epoch (and skips the claim-file write per bench iteration)
    eng = TopicEngine(spark, root, read_only=True)
    stats = eng._stats["seg"]
    out = [
        (i, s[0], s[1], s[2], s[3], s[4], s[5], s[6])
        for i, f in enumerate(eng._files["seg"])
        for s in [stats[f]]
    ]
    return spark.createDataFrame(
        out,
        "seg int, min_partition int, max_partition int, base_offset bigint,"
        " last_offset bigint, n_rows bigint, min_ts_us bigint, max_ts_us bigint",
    ).orderBy("seg")


SQL_LOG_SEGMENTS = f"""
WITH sim AS (
  SELECT CAST(event_id % 4 AS INTEGER) AS seg,
    CAST(user_id % {NUM_PARTITIONS} AS INTEGER) AS partition,
    CAST(epoch_us(ts) AS BIGINT) AS ts_us,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY user_id % {NUM_PARTITIONS}
      ORDER BY event_id % 4, event_id) - 1 AS BIGINT) AS "offset"
  FROM events WHERE event_id < 400000)
SELECT seg, MIN(partition) AS min_partition, MAX(partition) AS max_partition,
  MIN("offset") AS base_offset, MAX("offset") AS last_offset,
  COUNT(*) AS n_rows, MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us
FROM sim GROUP BY seg ORDER BY seg
"""

QUERIES.update({"log_segments": q_log_segments})
ORACLES.update({"log_segments": SQL_LOG_SEGMENTS})


def q_log_mount_migration(spark, sf_dir):
    """Tiered-storage migration, value-for-value: a real topic is built
    on 'cluster A' from three deterministic record batches, UNMOUNTED
    (full flush to the shared bucket + self-describing manifest +
    detach), MOUNTED on 'cluster B' (a different root over the same
    bucket), and the fourth batch is produced post-migration. The log
    read from B must equal the oracle's pure-SQL replay of the routing
    and offset assignment — rows AND offsets survive the migration
    byte-for-byte and continue contiguously on the new cluster
    (reference `cloud_storage/topic_mount_handler.h`,
    `cluster/data_migration_backend.cc`). Cached by input fingerprint;
    the migrated topic is read with a read_only open."""
    import hashlib
    import shutil
    import tempfile

    from redpanda_spark.engine import TopicConfig, TopicEngine

    base = os.path.join(
        tempfile.gettempdir(),
        "redpanda_spark_migration",
        hashlib.md5(
            f"{sf_dir}|{_events_fingerprint(sf_dir)}".encode()
        ).hexdigest(),
    )
    root_a, root_b = os.path.join(base, "a"), os.path.join(base, "b")
    cold = os.path.join(base, "bucket")
    marker = os.path.join(base, "_built")
    if not os.path.exists(marker):
        shutil.rmtree(base, ignore_errors=True)
        ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 400_000)
        rows = (
            ev.select(
                "event_id",
                F.pmod(F.col("user_id"), F.lit(NUM_PARTITIONS))
                .cast("int")
                .alias("p"),
            )
            .orderBy("event_id")
            .collect()
        )
        a = TopicEngine(spark, root_a, archive_root=cold)
        a.create_topic(
            "mig",
            TopicConfig(
                partitions=NUM_PARTITIONS,
                remote_write=True,
                local_retention_ms=60_000,
            ),
        )

        def _batch(b):
            return [
                {"partition": r["p"], "value": str(r["event_id"]).encode()}
                for r in rows
                if r["event_id"] % 4 == b
            ]

        for b in range(3):
            a.produce("mig", _batch(b))
        a.unmount_topic("mig")
        b_eng = TopicEngine(spark, root_b, archive_root=cold)
        b_eng.mount_topic("mig")
        b_eng.produce("mig", _batch(3))
        open(marker, "w").write("1")
    eng = TopicEngine(spark, root_b, archive_root=cold, read_only=True)
    return (
        eng.log("mig")
        .select(
            F.col("partition").cast("int").alias("partition"),
            F.col("offset").cast("long").alias("offset"),
            F.col("value").cast("string").cast("int").alias("event_id"),
            (F.col("value").cast("string").cast("int") % 4 != 3).alias(
                "from_origin"
            ),
        )
        .orderBy("partition", "offset")
    )


SQL_LOG_MOUNT_MIGRATION = f"""
SELECT CAST(user_id % {NUM_PARTITIONS} AS INTEGER) AS partition,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY user_id % {NUM_PARTITIONS}
    ORDER BY event_id % 4, event_id) - 1 AS BIGINT) AS "offset",
  CAST(event_id AS INTEGER) AS event_id,
  event_id % 4 <> 3 AS from_origin
FROM events WHERE event_id < 400000
ORDER BY partition, "offset"
"""

QUERIES.update({"log_mount_migration": q_log_mount_migration})
ORACLES.update({"log_mount_migration": SQL_LOG_MOUNT_MIGRATION})


# -- Graph ANN: per-segment NSW, the HNSW deployment shape (round 7) ----------



def _emb_fingerprint(sf_dir: str) -> str:
    """size/mtime fingerprint of the embeddings parquet (the
    cache-invalidation key — regenerated fixtures must rebuild)."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    parts = [src]
    if os.path.isdir(src):
        parts = [os.path.join(src, f) for f in sorted(os.listdir(src))]
    return ";".join(
        f"{p}:{st.st_size}:{st.st_mtime_ns}"
        for p in parts
        if os.path.exists(p)
        for st in [os.stat(p)]
    )


def _nsw_index_store(spark, sf_dir, subset="full"):
    """A persisted NSW index, built once per (fixture fingerprint,
    corpus subset) and loaded thereafter. ``full`` is shared by
    ann_nsw / ann_nsw_delete / ann_nsw_filtered (they would otherwise
    each rebuild the identical structure); ``base80`` is
    ann_nsw_incremental's pre-existing index — inserting into a STORED
    index is precisely that operator's semantics. Parquet in a
    fingerprint-keyed tempdir (the rollup/segments/curation pattern —
    regenerated fixtures rebuild; graph_ann's parquet round-trip test
    pins load-vs-rebuild search equivalence); an in-memory cache would
    not even survive the bench harness's per-query clearCache."""
    import hashlib
    import tempfile

    from redpanda_spark.similarity.graph_ann import build_nsw_index

    tag = hashlib.md5(
        f"{sf_dir}|{subset}|{_emb_fingerprint(sf_dir)}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"rp_nsw_{tag}")
    marker = os.path.join(root, "_built")
    if not os.path.exists(marker):
        emb = _t(spark, sf_dir, "embeddings")
        if subset == "base80":
            emb = emb.where(F.col("vec_id") % 5 != 0)
        idx = build_nsw_index(emb, n_shards=None, m=8, ef_construction=48)
        idx.write.mode("overwrite").parquet(os.path.join(root, "index"))
        open(marker, "w").write("1")
    return spark.read.parquet(os.path.join(root, "index"))


def _nsw_full_index(spark, sf_dir):
    return _nsw_index_store(spark, sf_dir, "full")


def q_ann_nsw(spark, sf_dir):
    """Graph ANN (similarity/graph_ann.py): one navigable-small-world graph
    per id-hash shard (the Lucene/Elasticsearch per-segment HNSW layout),
    searched greedily per shard and merged exactly. Output = the EXACT
    top-10 by squared L2 (hash-checkable) plus `recall_ok` asserting the
    graph walk's 50-wide merged shortlist captured >= 8 of the exact
    top-10 — a graph-quality regression flips the boolean and fails the
    value hash (same sketch-gate pattern as ann_pq/ann_ivf)."""
    import numpy as np
    from pyspark.sql import Window as W

    from redpanda_spark.similarity.graph_ann import nsw_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = np.array(
        emb.where(F.col("vec_id") == 1)
        .select(as_double("embedding").alias("v"))
        .collect()[0]["v"]
    )
    idx = _nsw_full_index(spark, sf_dir)
    shortlist = {r["vec_id"] for r in nsw_topk(idx, q, k=50, ef_search=64).collect()}
    # one array literal, not d per-component F.lit py4j round trips
    qlit = F.lit([float(x) for x in q])
    dist = F.aggregate(
        F.zip_with(as_double("embedding"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ranked = (
        emb.select("vec_id", dist.alias("d"))
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("d"), F.col("vec_id"))).cast("int"),
        )
        .where(F.col("rank") <= 10)
    )
    exact_ids = [r["vec_id"] for r in ranked.select("vec_id").collect()]
    recall_ok = sum(1 for i in exact_ids if i in shortlist) >= 8
    return ranked.select(
        "rank",
        "vec_id",
        F.round("d", 6).alias("dist"),
        F.lit(bool(recall_ok)).alias("recall_ok"),
    ).orderBy("rank")


SQL_ANN_NSW = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1),
d AS (
  SELECT vec_id,
    list_sum(list_transform(range(len(qv)),
      i -> (CAST(embedding AS DOUBLE[])[i + 1] - qv[i + 1])
           * (CAST(embedding AS DOUBLE[])[i + 1] - qv[i + 1]))) AS dd
  FROM embeddings, q),
r AS (
  SELECT vec_id, dd,
    CAST(ROW_NUMBER() OVER (ORDER BY dd, vec_id) AS INTEGER) AS rank
  FROM d)
SELECT rank, vec_id, ROUND(dd, 6) AS dist, TRUE AS recall_ok
FROM r WHERE rank <= 10 ORDER BY rank
"""

QUERIES.update({"ann_nsw": q_ann_nsw})
ORACLES.update({"ann_nsw": SQL_ANN_NSW})


# -- Skew-salted join (round 7) -----------------------------------------------


def q_events_skew_join(spark, sf_dir):
    """Salted fact-dim join (operators/skew.py): hot user_ids detected by
    share (deterministic count threshold), their fact rows spread over 8
    hash-of-event_id sub-keys and the matching dim rows replicated per
    sub-key — then the usual segment rollup. The oracle is the PLAIN
    join+aggregate: salting must be row-invisible, which is exactly what
    the hash check proves. At 100 TB this is the shape that keeps one
    10%-of-the-corpus user from pinning a single reducer."""
    from redpanda_spark.operators.skew import detect_hot_keys, salted_join

    events = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    hot = detect_hot_keys(events, "user_id", min_share=0.005)
    joined = salted_join(
        events, cust, key="user_id", spread_col="event_id",
        salt_factor=8, hot_keys=hot,
    )
    return (
        joined.groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 6)
            .cast("double")
            .alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("c_mktsegment", "event_type")
    )


SQL_EVENTS_SKEW_JOIN = """
SELECT c_mktsegment, event_type, COUNT(*) AS n,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
ORDER BY c_mktsegment, event_type
"""

QUERIES.update({"events_skew_join": q_events_skew_join})
ORACLES.update({"events_skew_join": SQL_EVENTS_SKEW_JOIN})


# -- Graph ANN incremental maintenance (round 7) -------------------------------


def q_ann_nsw_incremental(spark, sf_dir):
    """Incremental NSW maintenance (similarity/graph_ann.py nsw_insert):
    the index is built on 80% of the corpus, the remaining vectors fold in
    WITHOUT a rebuild (O(increment) work, untouched shards pass through
    unchanged — the continuous-ingest story, same shape as
    dedup_incremental). Output = the EXACT top-10 on the full corpus plus
    `recall_ok` asserting the maintained index's 50-wide shortlist still
    captures >= 8 of the exact top-10 — an insert-path regression that
    degrades the graph flips the boolean and fails the value hash."""
    import numpy as np
    from pyspark.sql import Window as W

    from redpanda_spark.similarity.graph_ann import nsw_insert, nsw_topk

    emb = _t(spark, sf_dir, "embeddings")
    inc = emb.where(F.col("vec_id") % 5 == 0)
    q = np.array(
        emb.where(F.col("vec_id") == 1)
        .select(as_double("embedding").alias("v"))
        .collect()[0]["v"]
    )
    idx = nsw_insert(_nsw_index_store(spark, sf_dir, "base80"), inc)
    shortlist = {r["vec_id"] for r in nsw_topk(idx, q, k=50, ef_search=64).collect()}
    # one array literal, not d per-component F.lit py4j round trips
    qlit = F.lit([float(x) for x in q])
    dist = F.aggregate(
        F.zip_with(as_double("embedding"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ranked = (
        emb.select("vec_id", dist.alias("d"))
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("d"), F.col("vec_id"))).cast("int"),
        )
        .where(F.col("rank") <= 10)
    )
    exact_ids = [r["vec_id"] for r in ranked.select("vec_id").collect()]
    recall_ok = sum(1 for i in exact_ids if i in shortlist) >= 8
    return ranked.select(
        "rank",
        "vec_id",
        F.round("d", 6).alias("dist"),
        F.lit(bool(recall_ok)).alias("recall_ok"),
    ).orderBy("rank")


QUERIES.update({"ann_nsw_incremental": q_ann_nsw_incremental})
ORACLES.update({"ann_nsw_incremental": SQL_ANN_NSW})


# -- Bucketed co-located join (round 7) ----------------------------------------


def q_events_bucketed_join(spark, sf_dir):
    """Bucketed fact-dim join (sources/bucketed.py): both tables are
    written bucketBy(8, user_id).sortBy once per fixture fingerprint,
    and the join then runs with ZERO Exchange nodes — asserted IN the
    query (a planner regression that reintroduces a shuffle errors the
    gate row, not just a unit test). The oracle is the plain join+agg:
    bucketing must be value-invisible. At 100 TB this is the
    write-once/amortize-forever shuffle eliminator for every recurring
    join/groupBy on the bucket key (the read-side payoff of the
    reference's producer-side murmur2 partitioning)."""
    import hashlib
    import tempfile

    from redpanda_spark.sources.bucketed import assert_no_exchange

    ev = os.path.join(sf_dir, "events.parquet")
    cu = os.path.join(sf_dir, "customer.parquet")

    def _fp(path):
        parts = [path]
        if os.path.isdir(path):
            parts = [os.path.join(path, f) for f in sorted(os.listdir(path))]
        return ";".join(
            f"{p}:{st.st_size}:{st.st_mtime_ns}"
            for p in parts
            if os.path.exists(p)
            for st in [os.stat(p)]
        )

    tag = hashlib.md5(f"{sf_dir}|{_fp(ev)}|{_fp(cu)}".encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"rp_bucketed_{tag}")
    t_ev, t_cu = f"rp_bkt_events_{tag}", f"rp_bkt_customer_{tag}"
    events = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("value").cast("decimal(18,4)").alias("v")
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    # bucket metadata is session-catalog state: (re)register every run —
    # the data rewrite is keyed to the fingerprint path, so regenerated
    # fixtures can never replay stale buckets (rollup/segments pattern).
    # The DATA writes are the amortized half of the operator ("write
    # once, join shuffle-free forever"): when the fingerprint-keyed
    # bucket store already exists on disk, only the catalog entries are
    # refreshed (metadata-only) — the r13 optimization pass measured the
    # unconditional rewrite at ~1 s/run of pure re-layout of unchanged
    # input. A missing/renamed fixture changes the fingerprint, which
    # changes `root`, so stale buckets can never be replayed.
    marker = os.path.join(root, "_built")
    if not os.path.exists(marker):
        events.write.format("parquet").mode("overwrite").bucketBy(8, "user_id").sortBy(
            "user_id"
        ).option("path", os.path.join(root, "ev")).saveAsTable(t_ev)
        cust.write.format("parquet").mode("overwrite").bucketBy(8, "user_id").sortBy(
            "user_id"
        ).option("path", os.path.join(root, "cu")).saveAsTable(t_cu)
        open(marker, "w").write("1")
    else:
        for t, sub, src in ((t_ev, "ev", events), (t_cu, "cu", cust)):
            if not spark.catalog.tableExists(t):
                schema = ", ".join(
                    f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema
                )
                spark.sql(
                    f"CREATE TABLE {t} ({schema}) USING parquet "
                    f"CLUSTERED BY (user_id) SORTED BY (user_id) INTO 8 BUCKETS "
                    f"LOCATION '{os.path.join(root, sub)}'"
                )
    from redpanda_spark.sources.bucketed import bucketed_join

    # the merge hint inside bucketed_join pins SMJ (no session-conf
    # fiddling needed — a broadcast would be correct but defeat the
    # co-location this gate exists to prove)
    joined = bucketed_join(spark, t_ev, t_cu, "user_id")
    out = (
        joined.groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("v"), 6).cast("double").alias("sum_value"),
        )
        .orderBy("c_mktsegment", "event_type")
    )
    assert_no_exchange(joined)  # the property this operator exists for
    return out


SQL_EVENTS_BUCKETED_JOIN = """
SELECT c_mktsegment, event_type, COUNT(*) AS n,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
ORDER BY c_mktsegment, event_type
"""

QUERIES.update({"events_bucketed_join": q_events_bucketed_join})
ORACLES.update({"events_bucketed_join": SQL_EVENTS_BUCKETED_JOIN})


# -- Graph ANN soft delete (round 7) --------------------------------------------


def q_ann_nsw_delete(spark, sf_dir):
    """Tombstoned ANN (similarity/graph_ann.py nsw_delete): every vec_id
    divisible by 7 is soft-deleted — the rows stay in the graph as routing
    waypoints (hnswlib mark_deleted / Lucene liveDocs semantics) but can
    never be returned. Output = the EXACT top-10 over the SURVIVORS (the
    oracle recomputes it with a WHERE) plus `recall_ok` asserting the
    tombstone-aware walk still captures >= 8 of that top-10 — returning a
    deleted id or losing routing recall flips the boolean."""
    import numpy as np
    from pyspark.sql import Window as W

    from redpanda_spark.similarity.graph_ann import nsw_delete, nsw_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = np.array(
        emb.where(F.col("vec_id") == 1)
        .select(as_double("embedding").alias("v"))
        .collect()[0]["v"]
    )
    dels = emb.where(F.col("vec_id") % 7 == 0).select("vec_id")
    idx = nsw_delete(_nsw_full_index(spark, sf_dir), dels)
    hits = nsw_topk(idx, q, k=50, ef_search=64).collect()
    shortlist = {r["vec_id"] for r in hits}
    no_deleted_returned = all(r["vec_id"] % 7 != 0 for r in hits)
    survivors = emb.where(F.col("vec_id") % 7 != 0)
    # one array literal, not d per-component F.lit py4j round trips
    qlit = F.lit([float(x) for x in q])
    dist = F.aggregate(
        F.zip_with(as_double("embedding"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ranked = (
        survivors.select("vec_id", dist.alias("d"))
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("d"), F.col("vec_id"))).cast("int"),
        )
        .where(F.col("rank") <= 10)
    )
    exact_ids = [r["vec_id"] for r in ranked.select("vec_id").collect()]
    recall_ok = (
        sum(1 for i in exact_ids if i in shortlist) >= 8 and no_deleted_returned
    )
    return ranked.select(
        "rank",
        "vec_id",
        F.round("d", 6).alias("dist"),
        F.lit(bool(recall_ok)).alias("recall_ok"),
    ).orderBy("rank")


SQL_ANN_NSW_DELETE = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1),
d AS (
  SELECT vec_id,
    list_sum(list_transform(range(len(qv)),
      i -> (CAST(embedding AS DOUBLE[])[i + 1] - qv[i + 1])
           * (CAST(embedding AS DOUBLE[])[i + 1] - qv[i + 1]))) AS dd
  FROM embeddings, q WHERE vec_id % 7 <> 0),
r AS (
  SELECT vec_id, dd,
    CAST(ROW_NUMBER() OVER (ORDER BY dd, vec_id) AS INTEGER) AS rank
  FROM d)
SELECT rank, vec_id, ROUND(dd, 6) AS dist, TRUE AS recall_ok
FROM r WHERE rank <= 10 ORDER BY rank
"""

QUERIES.update({"ann_nsw_delete": q_ann_nsw_delete})
ORACLES.update({"ann_nsw_delete": SQL_ANN_NSW_DELETE})


# -- Filtered graph ANN (round 7) -----------------------------------------------


def q_ann_nsw_filtered(spark, sf_dir):
    """Pre-filtered vector search (similarity/graph_ann.py nsw_topk
    allow_col): the predicate (label = 3, joined metadata, plain Spark
    expression) masks the walk's RESULT set while deleted/filtered nodes
    keep routing — the pgvector/qdrant filtered-ANN semantics, reusing
    the tombstone machinery. Output = the EXACT top-10 among matching
    rows (oracle recomputes with a WHERE) + `recall_ok` asserting the
    filtered walk captured >= 8 of it and returned only matching ids."""
    import numpy as np
    from pyspark.sql import Window as W

    from redpanda_spark.similarity.graph_ann import nsw_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = np.array(
        emb.where(F.col("vec_id") == 1)
        .select(as_double("embedding").alias("v"))
        .collect()[0]["v"]
    )
    idx = _nsw_full_index(spark, sf_dir).join(
        emb.select("vec_id", (F.col("label") == 3).alias("_match")), "vec_id"
    )
    hits = nsw_topk(idx, q, k=50, ef_search=64, allow_col="_match").collect()
    shortlist = {r["vec_id"] for r in hits}
    matching = emb.where(F.col("label") == 3)
    only_matching = shortlist <= {r["vec_id"] for r in matching.select("vec_id").collect()}
    # one array literal, not d per-component F.lit py4j round trips
    qlit = F.lit([float(x) for x in q])
    dist = F.aggregate(
        F.zip_with(as_double("embedding"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ranked = (
        matching.select("vec_id", dist.alias("d"))
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("d"), F.col("vec_id"))).cast("int"),
        )
        .where(F.col("rank") <= 10)
    )
    exact_ids = [r["vec_id"] for r in ranked.select("vec_id").collect()]
    recall_ok = sum(1 for i in exact_ids if i in shortlist) >= 8 and only_matching
    return ranked.select(
        "rank",
        "vec_id",
        F.round("d", 6).alias("dist"),
        F.lit(bool(recall_ok)).alias("recall_ok"),
    ).orderBy("rank")


SQL_ANN_NSW_FILTERED = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1),
d AS (
  SELECT vec_id,
    list_sum(list_transform(range(len(qv)),
      i -> (CAST(embedding AS DOUBLE[])[i + 1] - qv[i + 1])
           * (CAST(embedding AS DOUBLE[])[i + 1] - qv[i + 1]))) AS dd
  FROM embeddings, q WHERE label = 3),
r AS (
  SELECT vec_id, dd,
    CAST(ROW_NUMBER() OVER (ORDER BY dd, vec_id) AS INTEGER) AS rank
  FROM d)
SELECT rank, vec_id, ROUND(dd, 6) AS dist, TRUE AS recall_ok
FROM r WHERE rank <= 10 ORDER BY rank
"""

QUERIES.update({"ann_nsw_filtered": q_ann_nsw_filtered})
ORACLES.update({"ann_nsw_filtered": SQL_ANN_NSW_FILTERED})


# -- Hybrid retrieval: BM25 + dense ANN via reciprocal-rank fusion (round 7) ---


def q_doc_hybrid_search(spark, sf_dir):
    """Hybrid first-stage retrieval — the standard RAG/curation shape:
    a lexical leg (BM25 top-50, similarity/bm25.py) and a dense leg
    (exact cosine top-50 around document 1's embedding, similarity/ann.py)
    fused by reciprocal-rank fusion, rrf = sum 1/(60 + rank_leg)
    (Cormack, Clarke & Buettcher, SIGIR 2009 — rank-only fusion, no score
    calibration across legs needed, which is why every hybrid search
    engine ships it). Both legs are existing oracle-proven operators; the
    fusion is a full-outer join of two <=50-row frames — free. RRF values
    are small division-derived doubles (safe as ROUND(double, 9) per the
    repo's cross-engine float law)."""
    from redpanda_spark.similarity.ann import brute_force_topk
    from redpanda_spark.similarity.bm25 import bm25_topk

    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    qv = emb.where(F.col("vec_id") == 1).withColumnRenamed("vec_id", "query_id")
    dense = brute_force_topk(emb, qv, k=50).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("dr")
    )
    lex = bm25_topk(docs, _BM25_TERMS, k=50).select(
        "doc_id", F.col("rank").alias("lr")
    )
    rrf = (
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("dr")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lr")), F.lit(0.0))
    )
    from pyspark.sql import Window as W

    fused = dense.join(lex, "doc_id", "full").select(
        "doc_id", F.round(rrf, 9).alias("rrf")
    )
    w = W.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 10)
        .select("rank", "doc_id", "rrf")
        .orderBy("rank")
    )


def _hybrid_sql() -> str:
    k1, b = 1.2, 0.75
    tf_cols = ",\n    ".join(
        f"CAST(len(list_filter(toks, t -> t = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    term_sum = "\n      + ".join(
        f"ROUND(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * {k1 + 1.0} / (tf_{i} + {k1} *"
        f" (1.0 - {b} + {b} * dl / avgdl)), 9)"
        for i in range(len(_BM25_TERMS))
    )
    return rf"""
WITH tokd AS (
  SELECT doc_id,
    list_transform(
      list_filter(string_split_regex(trim(text), '\s+'), t -> t != ''),
      t -> lower(t)) AS toks
  FROM documents),
per_doc AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
    {tf_cols}
  FROM tokd),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl, {df_cols}
  FROM per_doc),
bm_scored AS (
  SELECT doc_id,
    CAST(CAST(ROUND({term_sum}, 6) AS VARCHAR) AS DOUBLE) AS score
  FROM per_doc, stats),
lex AS (
  SELECT doc_id, rank AS lr FROM (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
             AS rank, doc_id
    FROM bm_scored WHERE score > 0)
  WHERE rank <= 50),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qe AS (SELECT v AS qv FROM e WHERE vec_id = 1),
cos_scored AS (
  SELECT c.vec_id AS doc_id,
    ROUND(list_dot_product(qe.qv, c.v) /
          (sqrt(list_dot_product(qe.qv, qe.qv)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
  FROM qe, e c WHERE c.vec_id != 1),
dense AS (
  SELECT doc_id, rank AS dr FROM (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS INTEGER)
             AS rank, doc_id
    FROM cos_scored)
  WHERE rank <= 50),
fused AS (
  SELECT COALESCE(dense.doc_id, lex.doc_id) AS doc_id,
    ROUND(COALESCE(1.0 / (60 + dr), 0.0) + COALESCE(1.0 / (60 + lr), 0.0), 9)
      AS rrf
  FROM dense FULL JOIN lex ON dense.doc_id = lex.doc_id)
SELECT rank, doc_id, rrf FROM (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER)
           AS rank, doc_id, rrf
  FROM fused)
WHERE rank <= 10 ORDER BY rank
"""


QUERIES.update({"doc_hybrid_search": q_doc_hybrid_search})
ORACLES.update({"doc_hybrid_search": _hybrid_sql()})


# -- Semantic decontamination (round 7) ----------------------------------------


def q_decontaminate_semantic(spark, sf_dir):
    """Embedding-space benchmark decontamination — the semantic complement
    of the n-gram `decontaminate` gate (paraphrased eval questions leak
    past n-gram matching; cosine against the benchmark's embeddings
    catches them). Benchmark = docs 0-24 (same convention as the n-gram
    gate's benchmark slice); every other document reports its max cosine
    against the benchmark set and a contaminated verdict at 0.80.
    Scale shape: the benchmark embeddings BROADCAST (a benchmark is small
    by definition) and the corpus side never shuffles — one narrow
    map-side pass, exactly `pipeline/decontaminate.py`'s probe shape in
    dense space. Max-per-row, ties irrelevant; cosine rounded 6dp (the
    ann_topk convention) so the verdict boundary is cross-engine exact."""
    from redpanda_spark.functions.vectors import dot, norm
    from redpanda_spark.sources.tables import parallelize_narrow

    emb = _t(spark, sf_dir, "embeddings")
    # per-side norms hoisted below the join (the ann.py convention):
    # computed per (corpus, bench) pair they'd cost 2 of the 3 folds
    # n·b times instead of n+b; same folds, same dot/(n·n) grouping —
    # bit-identical rounded score
    bench = emb.where(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("bench_id"),
        as_double("embedding").alias("bv"),
        norm(as_double("embedding")).alias("bn"),
    )
    corpus = emb.where(F.col("vec_id") >= 25).select(
        F.col("vec_id").alias("doc_id"),
        as_double("embedding").alias("cv"),
        norm(as_double("embedding")).alias("cn"),
    )

    scored = (
        parallelize_narrow(corpus)
        .join(F.broadcast(bench))
        .select(
            "doc_id",
            F.round(
                dot(F.col("cv"), F.col("bv")) / (F.col("cn") * F.col("bn")), 6
            ).alias("cos"),
        )
        .groupBy("doc_id")
        .agg(F.max("cos").alias("max_cos"))
    )
    return scored.select(
        "doc_id",
        "max_cos",
        (F.col("max_cos") > 0.80).alias("contaminated"),
    ).orderBy("doc_id")


SQL_DECONTAMINATE_SEMANTIC = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
bench AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE vec_id < 25),
corpus AS (SELECT vec_id AS doc_id, v AS cv FROM e WHERE vec_id >= 25),
scored AS (
  SELECT doc_id,
    MAX(ROUND(list_dot_product(cv, bv) /
        (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(bv, bv))), 6))
      AS max_cos
  FROM corpus, bench GROUP BY doc_id)
SELECT doc_id, max_cos, max_cos > 0.80 AS contaminated
FROM scored ORDER BY doc_id
"""

QUERIES.update({"decontaminate_semantic": q_decontaminate_semantic})
ORACLES.update({"decontaminate_semantic": SQL_DECONTAMINATE_SEMANTIC})


# ---------------------------------------------------------------------------
# Distributed k-means over the embedding corpus (similarity/kmeans.py)
# ---------------------------------------------------------------------------


def q_emb_kmeans(spark, sf_dir):
    """Topic clustering for curation: 2 distributed Lloyd iterations over
    the embeddings table, k=8, deterministic lowest-id init. Output is
    the surviving clusters' size and first two centroid components —
    every float is ROUND(avg, 6) (division-derived) and every distance
    argmin is 9-decimal pre-rounded, so an independent engine reproduces
    the run value-for-value (the oracle below unrolls both iterations in
    SQL). Scale shape: per iteration one narrow JVM scan + one k-group
    map-side-combinable agg; driver sees k rows."""
    from redpanda_spark.similarity.kmeans import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_fit(emb, k=8, iters=2).orderBy("cluster_id")


def _kmeans_sql(k: int = 8, dims: int = 64) -> str:
    cent_list = ", ".join(f"ROUND(avg(v[{i + 1}]), 6)" for i in range(dims))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
seed AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}),
k0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
       FROM seed),
d1 AS (SELECT e.vec_id, e.v, k0.cid,
         ROUND(list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, k0.v)
               + list_dot_product(k0.v, k0.v), 9) AS d
       FROM e CROSS JOIN k0),
a1 AS (SELECT vec_id, v, cid FROM (
         SELECT vec_id, v, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         FROM d1) WHERE rn = 1),
k1 AS (SELECT cid, [{cent_list}] AS v FROM a1 GROUP BY cid),
d2 AS (SELECT e.vec_id, e.v, k1.cid,
         ROUND(list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, k1.v)
               + list_dot_product(k1.v, k1.v), 9) AS d
       FROM e CROSS JOIN k1),
a2 AS (SELECT vec_id, v, cid FROM (
         SELECT vec_id, v, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         FROM d2) WHERE rn = 1)
SELECT cid AS cluster_id, COUNT(*) AS n_points,
  ROUND(avg(v[1]), 6) AS c0, ROUND(avg(v[2]), 6) AS c1
FROM a2 GROUP BY cid ORDER BY cluster_id
"""


QUERIES.update({"emb_kmeans": q_emb_kmeans})
ORACLES.update({"emb_kmeans": _kmeans_sql()})


# ---------------------------------------------------------------------------
# DSIR importance resampling (pipeline/dsir.py)
# ---------------------------------------------------------------------------


def q_pipeline_dsir(spark, sf_dir):
    """Importance-resampling selection (Xie et al. 2023): score every
    document by its mean per-token log p_target/p_raw (target = the
    English slice), keep the top 20% by score-quantile threshold. All
    floats follow the cross-engine law (per-ln ROUND 9, per-doc ROUND 6,
    exact interpolated percentile threshold). Scale shape: two
    partial-aggregated count passes, broadcast vocab-sized weight
    table, scalar threshold — no global sort."""
    from redpanda_spark.pipeline.dsir import dsir_select

    docs = _t(spark, sf_dir, "documents")
    return dsir_select(docs, F.col("lang") == "en", 0.2).orderBy("doc_id")


SQL_PIPELINE_DSIR = r"""
WITH tokd AS (
  SELECT doc_id, lang,
    unnest(list_filter(string_split_regex(trim(text), '\s+'), t -> t != ''))
      AS t
  FROM documents),
raw AS (
  SELECT t, CAST(COUNT(*) AS DOUBLE) AS cr,
    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS ct
  FROM tokd GROUP BY t),
tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS nr,
    CAST(COUNT(DISTINCT t) AS DOUBLE) AS vsz,
    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS nt
  FROM tokd),
w AS (
  SELECT t,
    ROUND(ln((ct + 1.0) / (nt + vsz)), 9)
      - ROUND(ln((cr + 1.0) / (nr + vsz)), 9) AS lw
  FROM raw, tot),
scored AS (
  SELECT doc_id, ROUND(avg(lw), 6) + 0.0 AS dsir_score
  FROM tokd JOIN w ON tokd.t = w.t GROUP BY doc_id),
thr AS (SELECT ROUND(quantile_cont(dsir_score, 0.8), 6) + 0.0 AS th FROM scored)
SELECT doc_id, dsir_score, dsir_score >= th AS selected
FROM scored, thr ORDER BY doc_id
"""


QUERIES.update({"pipeline_dsir": q_pipeline_dsir})
ORACLES.update({"pipeline_dsir": SQL_PIPELINE_DSIR})


# ---------------------------------------------------------------------------
# Mergeable-sketch re-aggregation: daily HLL partials -> weekly uniques
# ---------------------------------------------------------------------------


def q_events_sketch_merge(spark, sf_dir):
    """The re-aggregation algebra behind every rollup hierarchy: build
    one Datasketches HLL sketch per (event_type, day) — the partial a
    continuous rollup would persist — then MERGE the daily partials
    into weekly estimates with `hll_union_agg`, never re-touching the
    raw events. The gate asserts the merged estimate lands within 5% of
    the exact weekly distinct count (computed side-by-side), so sketch
    regressions fail the value hash. At 100 TB the daily sketch table
    is O(types x days) rows of constant-size state; the weekly roll
    reads partials only — the same contract as streaming/rollup.py's
    decimal sums, extended to the non-additive COUNT DISTINCT."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.to_date(F.col("ts")).alias("day"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    weekly = daily.groupBy("event_type", "week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est")
    )
    exact = ev.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return (
        exact.join(weekly, ["event_type", "week"])
        .select(
            "event_type",
            "week",
            "exact_users",
            (
                F.abs(F.col("_est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("merged_within_5pct"),
        )
        .orderBy("event_type", "week")
    )


SQL_EVENTS_SKETCH_MERGE = """
SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
  COUNT(DISTINCT user_id) AS exact_users,
  TRUE AS merged_within_5pct
FROM events GROUP BY event_type, CAST(date_trunc('week', ts) AS DATE)
ORDER BY event_type, week
"""


QUERIES.update({"events_sketch_merge": q_events_sketch_merge})
ORACLES.update({"events_sketch_merge": SQL_EVENTS_SKETCH_MERGE})


# ---------------------------------------------------------------------------
# Iceberg maintenance lifecycle: position deletes -> compaction -> expiry
# (sources/iceberg_maintain.py)
# ---------------------------------------------------------------------------


def q_iceberg_delete_read(spark, sf_dir):
    """Full v2 maintenance lifecycle against an events-derived Iceberg
    table: position-delete every 7th event (merge-on-read, no data file
    rewritten), COMPACT the small files (REPLACE snapshot that applies
    the deletes and drops the absorbed delete file), then EXPIRE the
    superseded snapshots and GC their files. The gate reads the table
    back through read_iceberg and aggregates per event type; the oracle
    recomputes the same numbers from raw events minus the deleted
    slice, so a row lost/duplicated/resurrected anywhere in the
    delete->compact->expire chain breaks the value hash.
    ``maintained_ok`` additionally pins the STRUCTURAL facts (deletes
    committed, compaction reduced the file count, expiry pruned to one
    snapshot) the value columns alone can't see."""
    import hashlib
    import os
    import shutil
    import tempfile

    from redpanda_spark.sources.datalake import write_datalake
    from redpanda_spark.sources.iceberg_export import (
        export_iceberg,
        read_iceberg,
        _current_metadata,
    )
    from redpanda_spark.sources.iceberg_maintain import (
        compact_data_files,
        delete_where,
        expire_snapshots,
        live_entries,
    )

    cache = os.path.join(
        tempfile.gettempdir(),
        "redpanda_spark_ice_maint",
        hashlib.md5(sf_dir.encode()).hexdigest(),
    )
    marker = os.path.join(cache, "_maint_done.json")
    import json as _json

    if not os.path.exists(marker):
        # a half-built cache (crash mid-lifecycle) is rebuilt from scratch
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        ev = _t(spark, sf_dir, "events")
        # day-grained partitions (the exporter keys on the column NAME
        # _hour), hash-split 6 ways so every partition holds several
        # small files — the layout compaction exists to fix
        df = ev.select(
            "event_id",
            "event_type",
            "user_id",
            "value",
            F.date_trunc("day", F.col("ts")).alias("_hour"),
        ).repartition(6, F.col("event_id"))
        ice = os.path.join(cache, "ice")
        write_datalake(df, os.path.join(cache, "lake"))
        export_iceberg(spark, os.path.join(cache, "lake"), ice)
        files_before = len(live_entries(_current_metadata(ice))[0])
        dres = delete_where(spark, ice, "event_id % 7 = 0")
        cres = compact_data_files(spark, ice, target_bytes=256 * 1024 * 1024)
        eres = expire_snapshots(ice, keep_last=1)
        ok = (
            dres["deleted_rows"] > 0
            and cres["new_files"] > 0
            and len(live_entries(_current_metadata(ice))[0]) < files_before
            and eres["expired"] >= 2
            and len(_current_metadata(ice)["snapshots"]) == 1
        )
        with open(marker + ".tmp", "w") as f:
            _json.dump({"maintained_ok": ok}, f)
        os.replace(marker + ".tmp", marker)
    ok = _json.load(open(marker))["maintained_ok"]
    ice = os.path.join(cache, "ice")
    return (
        read_iceberg(spark, ice)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 6)
            .cast("double")
            .alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .withColumn("maintained_ok", F.lit(bool(ok)))
        .orderBy("event_type")
    )


SQL_ICEBERG_DELETE_READ = """
SELECT event_type, COUNT(*) AS n,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS n_users,
  TRUE AS maintained_ok
FROM events WHERE event_id % 7 != 0
GROUP BY event_type ORDER BY event_type
"""


QUERIES.update({"iceberg_delete_read": q_iceberg_delete_read})
ORACLES.update({"iceberg_delete_read": SQL_ICEBERG_DELETE_READ})


def q_iceberg_upsert_read(spark, sf_dir):
    """MERGE INTO analog (merge-on-read): every 11th event's value is
    bumped by 1000 via merge_upsert (position delete + new data file in
    ONE snapshot) and 100 synthetic rows are inserted in the same call.
    The gate reads the table back and aggregates per event type; the
    oracle recomputes from raw events with the same CASE bump plus the
    synthetic block — a row that kept its old value (delete missed), was
    double-counted (old copy resurrected), or never landed (insert lost)
    breaks the value hash."""
    import hashlib
    import os
    import shutil
    import tempfile

    from redpanda_spark.sources.datalake import write_datalake
    from redpanda_spark.sources.iceberg_export import export_iceberg, read_iceberg
    from redpanda_spark.sources.iceberg_maintain import merge_upsert

    cache = os.path.join(
        tempfile.gettempdir(),
        "redpanda_spark_ice_upsert",
        hashlib.md5(sf_dir.encode()).hexdigest(),
    )
    marker = os.path.join(cache, "_upsert_done")
    if not os.path.exists(marker):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        ev = _t(spark, sf_dir, "events")
        base = ev.select(
            "event_id",
            "event_type",
            "user_id",
            "value",
            F.date_trunc("day", F.col("ts")).alias("_hour"),
        )
        ice = os.path.join(cache, "ice")
        write_datalake(base, os.path.join(cache, "lake"))
        export_iceberg(spark, os.path.join(cache, "lake"), ice)
        updates = base.where(F.col("event_id") % 11 == 0).withColumn(
            "value", F.col("value") + F.lit(1000.0)
        )
        inserts = spark.range(100).select(
            (-1 - F.col("id")).alias("event_id"),
            F.lit("synthetic").alias("event_type"),
            F.col("id").alias("user_id"),
            (F.col("id") * 0.5).alias("value"),
            F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("_hour"),
        )
        merge_upsert(spark, ice, updates.unionByName(inserts), ["event_id"])
        with open(marker + ".tmp", "w") as f:
            f.write("ok")
        os.replace(marker + ".tmp", marker)
    ice = os.path.join(cache, "ice")
    return (
        read_iceberg(spark, ice)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 6)
            .cast("double")
            .alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


SQL_ICEBERG_UPSERT_READ = """
SELECT event_type, COUNT(*) AS n,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS n_users
FROM (
  SELECT event_type, user_id,
    CASE WHEN event_id % 11 = 0 THEN value + 1000.0 ELSE value END AS value
  FROM events
  UNION ALL
  SELECT 'synthetic', i, i * 0.5 FROM range(0, 100) t(i)
)
GROUP BY event_type ORDER BY event_type
"""


QUERIES.update({"iceberg_upsert_read": q_iceberg_upsert_read})
ORACLES.update({"iceberg_upsert_read": SQL_ICEBERG_UPSERT_READ})


# ---------------------------------------------------------------------------
# Z-order layout (operators/zorder.py)
# ---------------------------------------------------------------------------


def q_events_zorder(spark, sf_dir):
    """Morton-key computation over events — the exact integer algebra
    behind the z-order layout (operators/zorder.py). Both engines build
    the key from the same shift/mask ladder and integer division, so
    the per-bucket histogram (key >> 26 = 64 curve segments — exactly
    the file boundaries zorder_write would draw) hash-matches
    bit-for-bit. The layout win itself (file-level min/max pruning on
    BOTH columns) is asserted in tests/test_zorder.py with real parquet
    footers."""
    from redpanda_spark.operators.zorder import zorder_key

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    keyed = zorder_key(ev, "user_id", "event_id")
    return (
        keyed.groupBy(F.shiftright(F.col("_z"), 26).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("_z").alias("z_min"),
            F.max("_z").alias("z_max"),
            F.min("user_id").alias("u_min"),
            F.max("user_id").alias("u_max"),
        )
        .orderBy("bucket")
    )


def _zorder_sql() -> str:
    from redpanda_spark.operators.zorder import zvalue2_sql

    # the bounds arrive as scalars from the stats CTE (symbolic names,
    # not literals — unlike the Spark side, which inlines the collected
    # min/max); the shift/mask ladder itself is shared via zvalue2_sql
    x = "((user_id - mnu) * 65535) // NULLIF(mxu - mnu, 0)"
    y = "((event_id - mne) * 65535) // NULLIF(mxe - mne, 0)"
    z = zvalue2_sql(x, y)
    return f"""
WITH stats AS (
  SELECT MIN(user_id) AS mnu, MAX(user_id) AS mxu,
         MIN(event_id) AS mne, MAX(event_id) AS mxe
  FROM events),
keyed AS (
  SELECT user_id, {z} AS z FROM events, stats)
SELECT z >> 26 AS bucket, COUNT(*) AS n,
  MIN(z) AS z_min, MAX(z) AS z_max,
  MIN(user_id) AS u_min, MAX(user_id) AS u_max
FROM keyed GROUP BY 1 ORDER BY 1
"""


QUERIES.update({"events_zorder": q_events_zorder})
ORACLES.update({"events_zorder": _zorder_sql()})


# -- Tiered storage: archival + tier-spanning reads + cloud retention ---------
# (round 8; reference `cluster/archival/ntp_archiver_service.cc` upload
# loop, `cloud_storage/remote_partition.cc` tier-routing reads,
# `cluster/archival/archival_policy.cc` cloud retention)


def _events_fingerprint(sf_dir: str) -> str:
    """size/mtime fingerprint of the events parquet (file or dir) — the
    cache-invalidation key for engine stores built from events."""
    src = os.path.join(sf_dir, "events.parquet")
    parts = [src]
    if os.path.isdir(src):
        parts = [os.path.join(src, f) for f in sorted(os.listdir(src))]
    return ";".join(
        f"{p}:{st.st_size}:{st.st_mtime_ns}"
        for p in parts
        if os.path.exists(p)
        for st in [os.stat(p)]
    )


# exact integer-µs retention cutoff shared with the oracle: epoch µs of
# RETENTION_CUTOFF ('2024-01-10'), and a now/retention pair that makes the
# engine's float cutoff arithmetic land on it exactly (both multiples of
# 1000 ms, product < 2^53)
_TIER_RET_CUTOFF_US = 1_704_844_800_000_000
_TIER_RET_MS = 86_400_000
_TIER_RET_NOW_MS = _TIER_RET_CUTOFF_US // 1000 + _TIER_RET_MS


def _tiered_engine(spark, sf_dir: str, retained: bool):
    """A real tiered topic built from events: 4 chronological produce
    batches (one segment each), the older two archived to the cold tier.
    ``retained`` additionally applies cloud retention at RETENTION_CUTOFF
    (a separate store — retention mutates the log). Cached per input
    fingerprint; the driver-side build is gate-SF scaffolding (bounded at
    400k events), at scale segments are born from produce batches and
    archival runs as the maintenance tick."""
    import datetime as _dt
    import hashlib
    import shutil
    import tempfile

    from redpanda_spark.engine import TopicConfig, TopicEngine

    tag = "tiered_ret" if retained else "tiered"
    root = os.path.join(
        tempfile.gettempdir(),
        f"redpanda_spark_{tag}",
        hashlib.md5(f"{sf_dir}|{_events_fingerprint(sf_dir)}".encode()).hexdigest(),
    )
    marker = os.path.join(root, "_built")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 400_000)
        ts_us = (
            F.unix_micros(F.col("ts"))
            if ev.schema["ts"].dataType.typeName().startswith("timestamp")
            else F.expr("ts div 1000").cast("long")
        )
        rows = (
            ev.select(
                "event_id",
                F.pmod(F.col("user_id"), F.lit(NUM_PARTITIONS))
                .cast("int")
                .alias("p"),
                ts_us.alias("ts_us"),
            )
            .orderBy("ts_us", "event_id")
            .collect()
        )
        eng = TopicEngine(spark, root)
        eng.create_topic(
            "tier",
            TopicConfig(
                partitions=NUM_PARTITIONS,
                remote_write=True,
                local_retention_ms=60_000,
                retention_ms=_TIER_RET_MS if retained else None,
            ),
        )
        epoch0 = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        n = len(rows)
        bounds = [0, n // 4, n // 2, (3 * n) // 4, n]
        for b in range(4):
            chunk = rows[bounds[b] : bounds[b + 1]]
            eng.produce(
                "tier",
                [
                    {
                        "partition": r["p"],
                        "value": str(r["event_id"]).encode(),
                        "timestamp": epoch0
                        + _dt.timedelta(microseconds=r["ts_us"]),
                    }
                    for r in chunk
                ],
            )
        # archive the two oldest segments: cutoff 60s past batch 1's max
        # (archival classifies on max_ts only, so the exact cutoff µs is
        # non-critical — any value between the batch maxima works)
        b1_max_us = rows[bounds[2] - 1]["ts_us"]
        eng.run_archival("tier", now_ms=b1_max_us // 1000 + 120_000)
        if eng.topic_stats("tier")["archived_segments"] != 2:
            raise AssertionError("tiered fixture: expected 2 archived segments")
        if retained:
            # cloud retention: cutoff EXACTLY at RETENTION_CUTOFF µs —
            # aged cold segments drop, the straddling one rewrites
            eng.run_retention("tier", now_ms=_TIER_RET_NOW_MS)
        open(marker, "w").write("1")
    from redpanda_spark.engine import TopicEngine as _TE

    # read_only: the tiered fetch/timequery queries only READ the cached
    # fixture — don't claim its writer epoch on every bench iteration
    return _TE(spark, root, read_only=True)


_TIER_SIM_CTE = f"""sim AS (
  SELECT CAST(user_id % {NUM_PARTITIONS} AS INTEGER) AS partition,
    CAST(event_id AS BIGINT) AS event_id,
    CAST(epoch_us(ts) AS BIGINT) AS ts_us,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY user_id % {NUM_PARTITIONS}
      ORDER BY epoch_us(ts), event_id) - 1 AS BIGINT) AS "offset"
  FROM events WHERE event_id < 400000)"""


def q_log_fetch_tiered(spark, sf_dir):
    """Fetch spanning BOTH tiers: partition 2 from offset 0 over a topic
    whose two oldest segments live in the archive. The per-tier manifest
    pruning drops the other partitions' files; the rows themselves are
    hash-checked against the events recomputation, so the tier move is
    proven invisible to readers (remote_partition.cc contract)."""
    eng = _tiered_engine(spark, sf_dir, retained=False)
    return eng.fetch("tier", partition=2, offset=0).select(
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("value").cast("string").cast("long").alias("event_id"),
    )


SQL_LOG_FETCH_TIERED = f"""
WITH {_TIER_SIM_CTE}
SELECT partition, "offset", event_id FROM sim WHERE partition = 2
"""


def q_log_tiered_timequery(spark, sf_dir):
    """ListOffsets timequery whose answer lies in the ARCHIVED tier
    (cloud timequery, `cloud_storage/remote_partition.cc` timequery
    routing): first offset with ts >= 2024-01-15 per partition."""
    eng = _tiered_engine(spark, sf_dir, retained=False)
    return eng.timequery("tier", F.to_timestamp(F.lit(TIMEQUERY_TS))).select(
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
    )


SQL_LOG_TIERED_TIMEQUERY = f"""
WITH {_TIER_SIM_CTE}
SELECT partition, CAST(MIN("offset") AS BIGINT) AS "offset"
FROM sim WHERE ts_us >= {1_705_276_800_000_000}
GROUP BY partition
"""


def q_log_tiered_retention(spark, sf_dir):
    """Cloud retention over a tiered topic: retention_ms bounds the TOTAL
    log, so the tick drops fully-aged ARCHIVED segments metadata-only and
    row-filter-rewrites the one cold segment straddling the cutoff —
    survivors per partition are value-checked against the plain ts >=
    cutoff recomputation (archival_policy.cc, row-exact here)."""
    eng = _tiered_engine(spark, sf_dir, retained=True)
    return (
        eng.log("tier")
        .groupBy(F.col("partition").cast("int").alias("partition"))
        .agg(
            F.count("*").alias("n_kept"),
            F.min("offset").cast("long").alias("first_kept_offset"),
            F.max("offset").cast("long").alias("last_offset"),
        )
    )


SQL_LOG_TIERED_RETENTION = f"""
WITH {_TIER_SIM_CTE}
SELECT partition, COUNT(*) AS n_kept,
  CAST(MIN("offset") AS BIGINT) AS first_kept_offset,
  CAST(MAX("offset") AS BIGINT) AS last_offset
FROM sim WHERE ts_us >= {_TIER_RET_CUTOFF_US}
GROUP BY partition
"""


QUERIES.update(
    {
        "log_fetch_tiered": q_log_fetch_tiered,
        "log_tiered_timequery": q_log_tiered_timequery,
        "log_tiered_retention": q_log_tiered_retention,
    }
)
ORACLES.update(
    {
        "log_fetch_tiered": SQL_LOG_FETCH_TIERED,
        "log_tiered_timequery": SQL_LOG_TIERED_TIMEQUERY,
        "log_tiered_retention": SQL_LOG_TIERED_RETENTION,
    }
)


# -- Round-8 analytics: distributed Gram matrix, TF-IDF terms, histogram ------


def q_emb_covariance(spark, sf_dir):
    """Distributed Gram matrix over the embedding corpus — the reduction
    at the heart of PCA/whitening for a 100 TB embedding store: each Arrow
    batch contributes a d x d integer partial (numpy X^T X), the shuffle
    moves ONLY d*d*partitions tiny rows, never vectors. Embeddings are
    quantized to 1e-3 (round(x*1000) int) so the sums are EXACT integers —
    order-free, hash-identical on any engine (the emb_quantize
    discipline); sums ride decimal(38,0), overflow-free at any corpus
    size. Upper triangle only (the matrix is symmetric). PCA itself is a
    driver-side eigh of this d x d result (see
    functions/pca.py:pca_components)."""
    import pandas as pd  # noqa: F811

    emb = _t(spark, sf_dir, "embeddings").select("embedding")
    d = 64

    def gram(batches):
        import numpy as np

        acc = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.rint(x * 1000.0).astype(np.int64)
            acc += q.T @ q
        iu = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": (iu[0] + 1).astype("int32"),
                "j": (iu[1] + 1).astype("int32"),
                "partial": acc[iu],
            }
        )

    partials = emb.mapInPandas(gram, "i int, j int, partial long")
    return (
        partials.groupBy("i", "j")
        # exact decimal(38,0) sum internally; emit as STRING: the values
        # can exceed 2^53 (float64 would lose digits) and emitting the
        # decimal itself fails the driver's canonicalization (DuckDB .df()
        # renders DECIMAL as float64, Spark keeps Decimal — r8 red).
        # scale-0 decimal stringifies identically on both engines.
        .agg(
            F.sum(F.col("partial").cast("decimal(38,0)"))
            .cast("string")
            .alias("gram")
        )
        .orderBy("i", "j")
    )


SQL_EMB_COVARIANCE = """
WITH q AS (
  SELECT list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings)
SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
       CAST(SUM(CAST(v[i] * v[j] AS DECIMAL(38,0))) AS VARCHAR) AS gram
FROM q, generate_series(1, 64) AS gi(i), generate_series(1, 64) AS gj(j)
WHERE i <= j GROUP BY i, j ORDER BY i, j
"""


def q_doc_tfidf_terms(spark, sf_dir):
    """Corpus top-30 terms by total TF-IDF — the signature-term scan of a
    corpus datasheet (what characterizes this dataset vs the reference
    corpus). Scale shape: the token explode feeds ONE two-phase aggregate
    (count + distinct-doc count per term, map-side partial); idf applies
    to the reduced distinct-term table; top-k is TakeOrderedAndProject.
    Term = lowercased whitespace token, alphabetic only."""
    from redpanda_spark.sources.tables import parallelize_narrow

    docs = parallelize_narrow(_t(spark, sf_dir, "documents"))
    # footer count, no Spark job (exact — N in the idf formula)
    n_docs = _parquet_rows(sf_dir, "documents") or _t(
        spark, sf_dir, "documents"
    ).count()
    terms = docs.select(
        "doc_id", F.explode(TXT.tokens("text")).alias("tok")
    ).select("doc_id", F.lower("tok").alias("term"))
    terms = terms.where(F.col("term").rlike("^[a-z]+$"))
    stats = terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("total_tf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    scored = stats.withColumn(
        "tfidf",
        F.round(
            F.col("total_tf")
            * (F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0),
            6,
        ),
    )
    top = scored.orderBy(
        F.col("tfidf").desc(), F.col("term")
    ).limit(30)
    w = Window.orderBy(F.col("tfidf").desc(), F.col("term"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "term",
        "total_tf",
        "df",
        "tfidf",
    )


SQL_DOC_TFIDF_TERMS = r"""
WITH toks AS (
  SELECT doc_id, lower(tok) AS term
  FROM (SELECT doc_id,
          unnest(list_filter(string_split_regex(trim(text), '\s+'),
                             t -> t != '')) AS tok
        FROM documents)
  WHERE regexp_full_match(lower(tok), '[a-z]+')),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
stats AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS total_tf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY term),
scored AS (
  SELECT term, total_tf, df,
    ROUND(total_tf * (LN((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
  FROM stats, n)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY tfidf DESC, term) AS INT) AS rank,
       term, total_tf, df, tfidf
FROM scored ORDER BY tfidf DESC, term LIMIT 30
"""


def q_events_histogram(spark, sf_dir):
    """Fixed-width value histogram per event type (bin width 10) — the
    /public_metrics-style distribution probe, exact integer counts in one
    map-side-combinable aggregate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.floor(F.col("value") / F.lit(10.0)).cast("long").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("event_type", "bin")
    )


SQL_EVENTS_HISTOGRAM = """
SELECT event_type, CAST(FLOOR(value / 10.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type, bin ORDER BY event_type, bin
"""


QUERIES.update(
    {
        "emb_covariance": q_emb_covariance,
        "doc_tfidf_terms": q_doc_tfidf_terms,
        "events_histogram": q_events_histogram,
    }
)
ORACLES.update(
    {
        "emb_covariance": SQL_EMB_COVARIANCE,
        "doc_tfidf_terms": SQL_DOC_TFIDF_TERMS,
        "events_histogram": SQL_EVENTS_HISTOGRAM,
    }
)


# -- pipeline_curriculum (round 8) --------------------------------------------


def q_pipeline_curriculum(spark, sf_dir):
    """Curriculum-learning schedule over the corpus: fixed quality bands
    (easy -> hard training order), per-stage doc/token budgets, exact
    mean quality, cumulative start positions
    (pipeline/dataset.py:curriculum_plan)."""
    from redpanda_spark.pipeline.dataset import curriculum_plan

    docs = _t(spark, sf_dir, "documents")
    toks = TXT.tokens("text")
    scored = docs.select(
        TXT.quality_score("text").alias("quality"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    return curriculum_plan(scored)


SQL_PIPELINE_CURRICULUM = f"""
WITH feats AS (
  SELECT doc_id,
    len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')) AS n_tok,
    CASE WHEN length(text) > 0
      THEN CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) / length(text)
      ELSE 0.0 END AS punct_r,
    CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')) > 0
      THEN CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                t -> lower(t) IN ({_SW_SQL}))) AS DOUBLE)
           / len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t != ''))
      ELSE 0.0 END AS sw_r
  FROM documents),
scored AS (
  SELECT ROUND((least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
       + least(sw_r * 4.0, 1.0)
       + greatest(1.0 - punct_r * 4.0, 0.0)) / 3.0, 6) AS quality,
    CAST(n_tok AS BIGINT) AS n_tokens
  FROM feats),
per AS (
  SELECT LEAST(CAST(FLOOR(quality * 10) AS INTEGER), 9) AS stage,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
    SUM(CAST(quality AS DECIMAL(18,6))) AS sum_q
  FROM scored GROUP BY 1)
SELECT stage, n_docs, n_tokens,
  ROUND(CAST(sum_q AS DOUBLE) / n_docs, 6) AS mean_quality,
  CAST(COALESCE(SUM(n_tokens) OVER (
    ORDER BY stage DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0) AS BIGINT) AS start_token,
  CAST(ROW_NUMBER() OVER (ORDER BY stage DESC) AS INTEGER) AS train_order
FROM per ORDER BY train_order
"""

QUERIES.update({"pipeline_curriculum": q_pipeline_curriculum})
ORACLES.update({"pipeline_curriculum": SQL_PIPELINE_CURRICULUM})


# -- log_replica_fetch: remote read replica served from the bucket (round 8) --


def q_log_replica_fetch(spark, sf_dir):
    """Remote Read Replica correctness: a SECOND engine (its own root)
    attaches the tiered fixture's archive bucket and serves partition 1
    read-only. The replica sees exactly the source's UPLOADED prefix —
    the two archived chronological batches, i.e. the first half of the
    global (ts, event_id) order — which the oracle recomputes from the
    events table alone (`cloud_storage/remote_partition.cc` remote-read
    topics)."""
    src_eng = _tiered_engine(spark, sf_dir, retained=False)
    replica_root = os.path.join(src_eng.root, "replica")
    from redpanda_spark.engine import TopicEngine

    rep = TopicEngine(spark, replica_root, archive_root=src_eng.archive_root)
    if "tier" not in rep.list_topics():
        rep.attach_read_replica("tier")
    else:
        rep.refresh_read_replica("tier")
    return rep.fetch("tier", partition=1, offset=0).select(
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("value").cast("string").cast("long").alias("event_id"),
    )


SQL_LOG_REPLICA_FETCH = f"""
WITH ranked AS (
  SELECT CAST(user_id % {NUM_PARTITIONS} AS INTEGER) AS partition,
    CAST(event_id AS BIGINT) AS event_id,
    ROW_NUMBER() OVER (ORDER BY epoch_us(ts), event_id) AS gr,
    COUNT(*) OVER () AS n,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY user_id % {NUM_PARTITIONS}
      ORDER BY epoch_us(ts), event_id) - 1 AS BIGINT) AS "offset"
  FROM events WHERE event_id < 400000)
SELECT partition, "offset", event_id
FROM ranked WHERE gr <= n // 2 AND partition = 1
"""

QUERIES.update({"log_replica_fetch": q_log_replica_fetch})
ORACLES.update({"log_replica_fetch": SQL_LOG_REPLICA_FETCH})


# -- iceberg_eq_delete_read: equality deletes end-to-end (round 8) ------------


def q_iceberg_eq_delete_read(spark, sf_dir):
    """Equality deletes (v2 content=2) end-to-end: delete BY KEY —
    user_ids ending in 3 — via one equality-delete file (no row
    addresses located, the CDC shape), then append a LATER batch that
    reuses some of those keys. read_iceberg must hide the old rows and
    keep the new ones (the spec's strict sequence rule), and the oracle
    recomputes exactly that from raw events
    (sources/iceberg_maintain.py:equality_delete)."""
    import hashlib
    import json as _json
    import shutil
    import tempfile

    from redpanda_spark.sources.datalake import write_datalake
    from redpanda_spark.sources.iceberg_export import export_iceberg, read_iceberg
    from redpanda_spark.sources.iceberg_maintain import equality_delete

    cache = os.path.join(
        tempfile.gettempdir(),
        "redpanda_spark_ice_eqdel",
        hashlib.md5(f"{sf_dir}|{_events_fingerprint(sf_dir)}".encode()).hexdigest(),
    )
    marker = os.path.join(cache, "_done.json")
    ice = os.path.join(cache, "ice")
    if not os.path.exists(marker):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        ev = _t(spark, sf_dir, "events")
        base = ev.where(F.col("event_id") % 2 == 0).select(
            "event_id",
            "event_type",
            "user_id",
            "value",
            F.date_trunc("day", F.col("ts")).alias("_hour"),
        )
        lake = os.path.join(cache, "lake")
        write_datalake(base, lake)
        export_iceberg(spark, lake, ice)
        # delete-by-key: every user_id ending in 3 that exists in base
        keys = [
            {"user_id": r["user_id"]}
            for r in base.where(F.col("user_id") % 10 == 3)
            .select("user_id")
            .distinct()
            .orderBy("user_id")
            .collect()
        ]
        res = equality_delete(spark, ice, ["user_id"], keys)
        # LATER batch (odd event ids), including rows with deleted keys —
        # the strict sequence rule must keep every one of them
        late = ev.where(F.col("event_id") % 2 == 1).select(
            "event_id",
            "event_type",
            "user_id",
            "value",
            F.date_trunc("day", F.col("ts")).alias("_hour"),
        )
        write_datalake(late, lake)
        export_iceberg(spark, lake, ice)
        with open(marker + ".tmp", "w") as f:
            _json.dump({"deleted_keys": res["deleted_keys"]}, f)
        os.replace(marker + ".tmp", marker)
    return (
        read_iceberg(spark, ice)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 6)
            .cast("double")
            .alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


SQL_ICEBERG_EQ_DELETE_READ = """
WITH live AS (
  SELECT * FROM events
  WHERE event_id % 2 = 1                                   -- late batch: all
     OR user_id % 10 != 3                                  -- base: key kept
)
SELECT event_type, COUNT(*) AS n,
  CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 6) AS VARCHAR) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS n_users
FROM live GROUP BY event_type ORDER BY event_type
"""

QUERIES.update({"iceberg_eq_delete_read": q_iceberg_eq_delete_read})
ORACLES.update({"iceberg_eq_delete_read": SQL_ICEBERG_EQ_DELETE_READ})


# --------------------------------------------------------------------------
# Coordination algebra as data-plane gate rows (SURVEY.md §2.1 rows 8-15,
# 32-35): the assignor and authorizer semantics, previously unit-only,
# hash-checked against independent SQL re-derivations.
# --------------------------------------------------------------------------


def q_group_bulk_assignment(spark, sf_dir):
    """Bulk consumer-group assignment audit (Kafka RangeAssignor +
    RoundRobinAssignor semantics, reference `group.cc:562-612` leader
    assignment; assignors mirrored from the upstream client): groups,
    members, topic partition counts and subscriptions all derived
    deterministically from customer x nation, assignments computed by
    the Spark bulk operators (operators/coordinator.py — one window
    shuffle, broadcast partition counts, output-linear expansion)."""
    from redpanda_spark.operators.coordinator import (
        bulk_range_assignment,
        bulk_roundrobin_assignment,
    )

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    members = cust.select(
        F.col("c_nationkey").alias("gkey"),
        (F.col("c_custkey") % 8).alias("mnum"),
    ).distinct()
    topics = nat.select(
        F.col("n_name").alias("topic"),
        F.col("n_nationkey"),
        (F.col("n_nationkey") % 7 + 1).cast("int").alias("n_partitions"),
    )
    gid = F.concat(F.lit("g"), F.col("gkey").cast("string")).alias("group_id")
    mid = F.concat(F.lit("m"), F.col("mnum").cast("string")).alias("member_id")
    subs = members.join(
        topics, (F.col("mnum") + F.col("n_nationkey")) % 3 != 0
    ).select(gid, mid, "topic")
    tp = topics.select("topic", "n_partitions")
    rng = bulk_range_assignment(subs, tp).withColumn(
        "strategy", F.lit("range")
    )
    gt = (
        members.select("gkey")
        .distinct()
        .join(topics, (F.col("gkey") + F.col("n_nationkey")) % 4 != 0)
        .select(gid, "topic")
    )
    gm = members.select(gid, mid)
    rr = bulk_roundrobin_assignment(gt, gm, tp).withColumn(
        "strategy", F.lit("roundrobin")
    )
    return rng.unionByName(rr).select(
        "strategy",
        "group_id",
        "topic",
        "member_id",
        F.col("partition").cast("int").alias("partition"),
    )


SQL_GROUP_BULK_ASSIGNMENT = """
WITH members AS (
  SELECT DISTINCT c_nationkey AS gkey, c_custkey % 8 AS mnum FROM customer
), topics AS (
  SELECT n_name AS topic, n_nationkey,
         CAST(n_nationkey % 7 + 1 AS INTEGER) AS n_partitions
  FROM nation
), subs AS (
  SELECT 'g' || gkey AS group_id, 'm' || mnum AS member_id,
         topic, n_partitions
  FROM members JOIN topics ON (mnum + n_nationkey) % 3 <> 0
), ranked AS (
  SELECT group_id, topic, member_id, n_partitions,
         ROW_NUMBER() OVER (PARTITION BY group_id, topic ORDER BY member_id) - 1 AS midx,
         COUNT(*) OVER (PARTITION BY group_id, topic) AS n_subs
  FROM subs
), rng AS (
  SELECT group_id, topic, member_id, midx,
         n_partitions // n_subs AS per, n_partitions % n_subs AS extra
  FROM ranked
), range_out AS (
  SELECT 'range' AS strategy, group_id, topic, member_id,
         UNNEST(range(midx * per + LEAST(midx, extra),
                      midx * per + LEAST(midx, extra) + per
                        + CASE WHEN midx < extra THEN 1 ELSE 0 END)) AS partition
  FROM rng
), rr_topics AS (
  SELECT 'g' || gkey AS group_id, topic, n_partitions
  FROM (SELECT DISTINCT gkey FROM members) g
  JOIN topics ON (gkey + n_nationkey) % 4 <> 0
), rr_pairs AS (
  SELECT group_id, topic, UNNEST(range(n_partitions)) AS partition
  FROM rr_topics
), rr_dealt AS (
  SELECT group_id, topic, partition,
         ROW_NUMBER() OVER (PARTITION BY group_id ORDER BY topic, partition) - 1 AS deal_idx
  FROM rr_pairs
), rr_members AS (
  SELECT 'g' || gkey AS group_id, 'm' || mnum AS member_id,
         ROW_NUMBER() OVER (PARTITION BY gkey ORDER BY 'm' || mnum) - 1 AS midx,
         COUNT(*) OVER (PARTITION BY gkey) AS n_members
  FROM members
), rr_out AS (
  SELECT 'roundrobin' AS strategy, d.group_id, d.topic, m.member_id, d.partition
  FROM rr_dealt d
  JOIN rr_members m
    ON d.group_id = m.group_id AND d.deal_idx % m.n_members = m.midx
)
SELECT strategy, group_id, topic, member_id, CAST(partition AS INTEGER) AS partition
FROM (SELECT * FROM range_out UNION ALL SELECT * FROM rr_out)
"""


# One literal bindings table feeds BOTH the Spark query and the generated
# DuckDB VALUES clause — a single source of truth, like the reference
# keeps bindings in one controller store (`security/acl_store.h`).
_ACL_AUDIT_BINDINGS = [
    # (principal, resource_type, resource_name, pattern_type, operation, permission, host)
    ("*", "topic", "click", "literal", "read", "allow", "*"),
    ("*", "topic", "view", "literal", "read", "allow", "*"),
    ("User:u1", "topic", "*", "literal", "write", "allow", "*"),
    ("User:u2", "topic", "purchase", "literal", "all", "allow", "*"),
    ("User:u2", "topic", "error", "literal", "all", "deny", "*"),
    ("User:u3", "topic", "s", "prefixed", "read", "allow", "*"),
    ("User:u3", "topic", "sign", "prefixed", "write", "deny", "*"),
    ("User:u4", "topic", "p", "prefixed", "alter", "allow", "*"),
    ("User:u5", "topic", "click", "literal", "write", "allow", "h1"),
    ("*", "topic", "error", "literal", "describe", "allow", "h2"),
    ("User:u6", "topic", "*", "literal", "read", "deny", "*"),
    ("User:u6", "topic", "view", "literal", "all", "allow", "*"),
]


def q_acl_authorize(spark, sf_dir):
    """Authorization audit (Kafka ACL algebra, reference
    `security/acl_store.h` + upstream AclAuthorizer): the events table
    replayed as a request log — principal/operation/host derived
    deterministically per event, resource = event_type — decided by the
    Spark `authorize_audit` operator (security.py: broadcast bindings,
    pattern match map-side, one aggregation shuffle), then rolled up to
    decision counts. Exercises DENY precedence, implied DESCRIBE,
    prefixed patterns, host scoping, and the super-user bypass."""
    from redpanda_spark.security import authorize_audit

    ev = _t(spark, sf_dir, "events")
    req = ev.select(
        F.concat(F.lit("User:u"), (F.col("user_id") % 7).cast("string")).alias(
            "principal"
        ),
        F.element_at(
            F.array(
                F.lit("read"), F.lit("write"), F.lit("describe"), F.lit("alter")
            ),
            (F.col("event_id") % 4 + 1).cast("int"),
        ).alias("operation"),
        F.lit("topic").alias("resource_type"),
        F.col("event_type").alias("resource_name"),
        F.concat(F.lit("h"), (F.col("user_id") % 3).cast("string")).alias(
            "host"
        ),
    )
    bdf = spark.createDataFrame(
        _ACL_AUDIT_BINDINGS,
        "principal string, resource_type string, resource_name string,"
        " pattern_type string, operation string, permission string,"
        " host string",
    )
    # scale shape: the decision is a pure function of (principal,
    # operation, resource, host), so the 100-TB-sized request log
    # collapses to its distinct decision tuples FIRST (one map-side-
    # combined shuffle); the authorizer then evaluates a tiny table
    distinct_req = req.groupBy(
        "principal", "operation", "resource_type", "resource_name", "host"
    ).agg(F.count(F.lit(1)).alias("n"))
    decided = authorize_audit(distinct_req, bdf, superusers=("User:u0",))
    return decided.groupBy(
        F.col("principal"),
        F.col("operation"),
        F.col("resource_name").alias("resource"),
    ).agg(
        F.max(F.col("allowed").cast("int")).alias("allowed"),
        F.sum("n").cast("long").alias("n_requests"),
    )


def _acl_bindings_values_sql() -> str:
    rows = ",\n    ".join(
        "(" + ", ".join(f"'{v}'" for v in b) + ")" for b in _ACL_AUDIT_BINDINGS
    )
    return rows


SQL_ACL_AUTHORIZE = f"""
WITH bindings(principal, resource_type, resource_name, pattern_type,
              operation, permission, host) AS (
  VALUES
    {_acl_bindings_values_sql()}
), req AS (
  SELECT 'User:u' || (user_id % 7) AS principal,
         CASE event_id % 4 WHEN 0 THEN 'read' WHEN 1 THEN 'write'
                           WHEN 2 THEN 'describe' ELSE 'alter' END AS operation,
         'topic' AS resource_type,
         event_type AS resource_name,
         'h' || (user_id % 3) AS host
  FROM events
), distinct_req AS (
  SELECT principal, operation, resource_type, resource_name, host,
         COUNT(*) AS n
  FROM req GROUP BY 1, 2, 3, 4, 5
), flags AS (
  SELECT r.principal, r.operation, r.resource_name, r.host, r.n,
    MAX(CASE WHEN (b.principal = '*' OR b.principal = r.principal)
              AND (b.host = '*' OR b.host = r.host)
              AND b.permission = 'deny'
              AND (b.operation = 'all' OR b.operation = r.operation)
         THEN 1 ELSE 0 END) AS any_deny,
    MAX(CASE WHEN (b.principal = '*' OR b.principal = r.principal)
              AND (b.host = '*' OR b.host = r.host)
              AND b.permission = 'allow'
              AND (b.operation = 'all' OR b.operation = r.operation
                   OR (r.operation = 'describe'
                       AND b.operation IN ('read', 'write', 'delete', 'alter'))
                   OR (r.operation = 'describe_configs'
                       AND b.operation = 'alter_configs'))
         THEN 1 ELSE 0 END) AS any_allow
  FROM distinct_req r
  LEFT JOIN bindings b
    ON b.resource_type = r.resource_type
   AND ((b.pattern_type = 'literal'
         AND (b.resource_name = '*' OR b.resource_name = r.resource_name))
     OR (b.pattern_type = 'prefixed'
         AND r.resource_name LIKE b.resource_name || '%'))
  GROUP BY r.principal, r.operation, r.resource_name, r.host, r.n
), decided AS (
  SELECT principal, operation, resource_name, n,
         CASE WHEN principal = 'User:u0' THEN 1
              WHEN any_deny = 1 THEN 0
              WHEN any_allow = 1 THEN 1
              ELSE 0 END AS allowed
  FROM flags
)
SELECT principal, operation, resource_name AS resource,
       CAST(MAX(allowed) AS INTEGER) AS allowed,
       CAST(SUM(n) AS BIGINT) AS n_requests
FROM decided GROUP BY 1, 2, 3
"""

QUERIES.update(
    {
        "group_bulk_assignment": q_group_bulk_assignment,
        "acl_authorize": q_acl_authorize,
    }
)
ORACLES.update(
    {
        "group_bulk_assignment": SQL_GROUP_BULK_ASSIGNMENT,
        "acl_authorize": SQL_ACL_AUTHORIZE,
    }
)
