"""Exact n-gram Jaccard similarity via token-posting self-join.

SQL-expressible (and oracle-checkable): explode distinct shingles →
self-join on shingle → count common → Jaccard. The join fans out only over
shared shingles, so cost is Σ posting-list², not n² — at 100 TB you cap
hot shingles (document-frequency filter) exactly like stop-word removal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redpanda_spark.functions.text import word_shingles


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    threshold: float = 0.3,
    max_df: int | None = None,
) -> DataFrame:
    """(id_a < id_b, jaccard) for all pairs ≥ threshold, computed exactly."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle_n))).alias("s"),
    )
    if max_df is not None:
        dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
        keep = dfreq.where(F.col("df") <= F.lit(max_df)).select("s")
        sh = sh.join(F.broadcast(keep), "s", "left_semi")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    common = (
        sh.alias("a")
        .join(sh.alias("b"), "s")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )
