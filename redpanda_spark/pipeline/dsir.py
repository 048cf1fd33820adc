"""DSIR-style importance resampling — select raw-corpus documents whose
token distribution looks like a target corpus.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169) scores each raw document with an importance log-ratio
log p_target(x) / p_raw(x) under hashed n-gram bag-of-words models and
keeps the top-weighted documents. This is the distributed unigram
version with add-one smoothing: two map-side-combinable count
aggregations build the two distributions, a vocabulary-sized weight
table is broadcast back onto the token stream, and the per-document
score is the mean per-token log-ratio. Selection is threshold-based
(score ≥ the (1-keep_fraction) quantile) rather than rank-based, so no
global sort ever happens — the shape that survives 100 TB:

- token counts: one exploded scan, partial-aggregated on the token key;
- the weight table is |vocab| rows — broadcast, so scoring never
  shuffles the corpus;
- the threshold is one scalar aggregate cross-joined back.

Determinism / oracle parity: each ln() is ROUND(·, 9) before the
subtraction (libm ulp differences round away — the doc_perplexity
discipline, functions/lm.py), the per-doc mean is ROUND(·, 6)
(division-derived), and the quantile threshold is the exact
interpolated percentile both engines compute bit-identically on the
already-6dp scores (the events_quantiles precedent).

Reference parity: no analog in the reference (storage/streaming
engine); LLM-pipeline extension per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from redpanda_spark.functions.text import tokens


def _token_stream(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, t): one row per token occurrence. Docs with no tokens drop
    out here (and therefore from the scored output) on every engine."""
    return docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t")
    )


def dsir_weights(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(t, lw): per-token importance log-weight
    ROUND(ln p_target, 9) − ROUND(ln p_raw, 9), add-one smoothing over
    the raw vocabulary. ``target`` is a boolean Column marking the
    target-domain rows (evaluated per document)."""
    tok = docs.select(
        F.col(id_col), target.alias("_tgt"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    raw = tok.groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("cr"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).cast("double").alias("ct"),
    )
    tot = tok.agg(
        F.count(F.lit(1)).cast("double").alias("nr"),
        F.countDistinct("t").cast("double").alias("vsz"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).cast("double").alias("nt"),
    )
    lt = F.round(F.log((F.col("ct") + 1.0) / (F.col("nt") + F.col("vsz"))), 9)
    lr = F.round(F.log((F.col("cr") + 1.0) / (F.col("nr") + F.col("vsz"))), 9)
    return raw.crossJoin(F.broadcast(tot)).select("t", (lt - lr).alias("lw"))


def dsir_select(
    docs: DataFrame,
    target: Column,
    keep_fraction: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, dsir_score, selected): mean per-token log-ratio per document
    and whether it clears the (1−keep_fraction) score quantile. The
    weight table is broadcast (vocabulary-sized); the threshold is one
    scalar aggregate — no global sort anywhere."""
    w = dsir_weights(docs, target, text_col, id_col)
    scored = (
        _token_stream(docs, text_col, id_col)
        .join(F.broadcast(w), "t")
        .groupBy(id_col)
        # + 0.0 normalizes IEEE negative zero: Spark's ROUND can yield
        # -0.0 where DuckDB yields +0.0 (or vice versa), and the driver's
        # full-precision value hash distinguishes them.
        .agg((F.round(F.avg("lw"), 6) + F.lit(0.0)).alias("dsir_score"))
    )
    thr = scored.agg(
        (
            F.round(F.expr(f"percentile(dsir_score, {1.0 - keep_fraction})"), 6)
            + F.lit(0.0)
        ).alias("_th")
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        id_col,
        "dsir_score",
        (F.col("dsir_score") >= F.col("_th")).alias("selected"),
    )
