"""Count-based n-gram language model for perplexity-style quality scoring.

The published web-corpus pipelines (CCNet and its descendants; see
PAPERS.md) score documents with a small language model and drop/bucket the
high-perplexity tail. This is the distributed count-based version: train =
one map-side-combinable bigram count aggregation over the corpus; score =
join each document's bigrams against the model and average the negative
log conditional probability (add-one smoothing over the unigram
vocabulary).

Everything is relational — two aggregations and one join keyed on the
bigram — so an independent SQL engine reproduces scores value-for-value
(the DuckDB oracle of the `doc_perplexity` gate query does exactly that).

At 100 TB the refinements are standard and orthogonal: prune the model to
top-k bigrams with a backoff weight, broadcast it if it fits, and train on
a sample — none of which changes the execution shape (counts are still
partial-aggregated; the score join still shuffles (w1, w2) keys only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redpanda_spark.functions.text import tokens


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair; docs with <2
    tokens contribute nothing."""
    from redpanda_spark.sources.tables import parallelize_narrow

    # the explode + map-side count is CPU-bound and a small corpus
    # parquet arrives as 1-2 splits — spread it first (no-op at scale)
    docs = parallelize_narrow(docs)
    toks = tokens(F.col(text_col))
    # arrays_zip of two shifted slices instead of transform+element_at:
    # no lambda expression in the hot path, so the explode stays inside
    # whole-stage codegen (measured ~3x on the serve-path scoring pass)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
        F.slice(toks, 2, F.size(toks) - 1).alias("w2"),
    )
    return (
        docs.where(F.size(toks) >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("b"))
        .select(id_col, "b.w1", "b.w2")
    )


def train_bigram_lm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, p): add-one-smoothed conditional probability
    P(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V), V = unigram vocabulary
    size. One corpus pass; counts combine map-side."""
    bg = doc_bigrams(docs.select(F.lit(0).alias("doc_id"), text_col), text_col, "doc_id")
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    ctx = big.groupBy("w1").agg(F.sum("c").alias("ctx"))
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    return (
        big.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            ((F.col("c") + 1) / (F.col("ctx") + F.col("v"))).alias("p"),
        )
    )


def score_perplexity(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_p: float | None = None,
) -> DataFrame:
    """(id, n_bigrams, n_oov, cross_entropy): mean -ln P(w2|w1) over the
    doc's bigrams — the quality signal (lower = more in-distribution).

    Bigrams absent from the model (never the case when scoring the
    training corpus itself; routine when scoring NEW documents) follow
    ``oov_p``: None excludes them from the mean (their count is still
    reported in n_oov so a caller can gate on OOV fraction), a float
    charges that floor probability — the add-one-smoothing unseen mass
    is ``1 / vocabulary_size``. Each -ln term is pre-rounded to 9
    decimals so independent engines' libm ulp differences can't leak
    into the 6-decimal result."""
    bg = doc_bigrams(docs, text_col, id_col)
    p = F.col("p") if oov_p is None else F.coalesce("p", F.lit(float(oov_p)))
    # the model is vocabulary-sized (and pruned at web scale, see module
    # docstring) while the bigram side is corpus-sized: broadcast the
    # model so scoring never shuffles the corpus
    return (
        bg.join(F.broadcast(lm), ["w1", "w2"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("p").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.round(F.avg(F.round(-F.log(p), 9)), 6).alias("cross_entropy"),
        )
    )
