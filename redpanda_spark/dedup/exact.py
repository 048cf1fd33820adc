"""Exact deduplication: hash-groupBy keep-first.

Grouping on md5(text) instead of the raw text keeps shuffle rows small
(16-byte keys instead of document bodies) — at 100 TB the shuffle moves
only (hash, id) pairs and the winner set joins back against the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_ids(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Surviving doc ids: the minimum id per distinct text hash."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Full surviving rows (semi-join of corpus against winner ids)."""
    winners = exact_dedup_ids(docs, text_col, id_col)
    return docs.join(winners, id_col, "left_semi")


def dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(hash, n_dups, min_id) for every text appearing more than once."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )
