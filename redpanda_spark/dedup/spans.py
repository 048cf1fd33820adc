"""Cross-document repeated-span removal — the line-level dedup of the
published web-corpus pipelines (RefinedWeb "line-wise deduplication",
Gopher's repeated-passage filters; see PAPERS.md) re-expressed for
token-span granularity.

Whole-document dedup (exact/MinHash/SemDedup ladders here) misses
boilerplate REUSE: navigation chrome, license blocks, templated
paragraphs repeated across thousands of otherwise-distinct pages. The
published remedy is span-level: chop every document into smallish spans,
find spans shared across distinct documents, then score or scrub.

Pipeline (all relational — two shuffles, both on the span hash / doc id,
no UDFs anywhere):

  1. tokenize + chunk: fixed ``span_tokens`` windows (deterministic, so
     an independent SQL engine reproduces the same chunking)
  2. explode to (doc_id, span_idx, span_hash)
  3. spans shared by >= ``min_docs`` DISTINCT docs are "duplicated"
  4. per-doc stats (span counts, duplicate fraction) and optionally the
     scrubbed text (duplicated spans dropped, order preserved)

At 100 TB: the exploded frame is ~tokens/span_tokens rows per doc; the
hash aggregation is a map-side-combinable count-distinct on the span
hash (hot boilerplate spans are exactly the high-frequency keys the
partial aggregation collapses). Nothing is ever collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 10,
) -> DataFrame:
    """(doc_id, span_idx, span) — fixed token-window chunking."""
    from redpanda_spark.sources.tables import parallelize_narrow

    # span hashing is CPU-bound; small corpus parquet arrives as 1-2
    # splits — spread it first (no-op at scale)
    docs = parallelize_narrow(docs)
    toks = F.split(F.col(text_col), " ")
    n = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"), n.alias("_n"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("span_idx"),
            "_t",
        )
        .select(
            "doc_id",
            "span_idx",
            F.concat_ws(
                " ",
                F.slice(
                    F.col("_t"),
                    (F.col("span_idx") - 1) * span_tokens + 1,
                    span_tokens,
                ),
            ).alias("span"),
        )
    )


def span_dedup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Per-doc boilerplate profile: (doc_id, n_spans, n_dup_spans,
    dup_fraction, cleaned_md5) where dup spans appear in >= ``min_docs``
    distinct docs and cleaned_md5 fingerprints the text with those spans
    scrubbed (span order preserved) — the RefinedWeb line-removal result
    in oracle-comparable form."""
    spans = doc_spans(docs, text_col, id_col, span_tokens)
    hashed = spans.select(
        "doc_id", "span_idx", "span", F.md5(F.col("span")).alias("h")
    )
    shared = (
        hashed.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= F.lit(min_docs))
        .select("h")
    )
    marked = hashed.join(shared.withColumn("_dup", F.lit(1)), "h", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).cast("long").alias("n_dup_spans"),
            F.round(
                F.sum(F.coalesce(F.col("_dup"), F.lit(0))) / F.count("*"), 6
            ).alias("dup_fraction"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_dup").isNull(),
                                F.struct("span_idx", "span"),
                            )
                        )
                    ).getField("span"),
                )
            ).alias("cleaned_md5"),
        )
    )
