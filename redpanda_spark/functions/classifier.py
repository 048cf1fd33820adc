"""Hashing-trick linear text classifier — the "quality classifier" stage
of published LLM data recipes (GPT-3's Wikipedia-vs-CommonCrawl logistic
regression, CCNet's fasttext filter; see PAPERS.md) in two halves:

  TRAIN  pyspark.ml LogisticRegression over hashed bag-of-tokens
         features (distributed, sample-sized — classifier fitting is
         cheap next to the corpus scan)
  SCORE  a pure JVM expression: token -> md5-prefix bucket -> weight
         lookup in a literal array -> mean logit. NO UDF on the scoring
         path, which is the one that runs over 100 TB — the trained
         weights compile into the expression exactly like the built-in
         quality heuristics in functions/text.py.

The bucket hash is the first 8 hex chars of md5(token) mod dim —
deliberately replayable bit-for-bit in DuckDB (the gate query's oracle
replays scoring against fixed weights), unlike Spark's murmur3 `hash()`
or ml.HashingTF, which no second engine reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_bucket(tok: Column, dim: int) -> Column:
    """md5-prefix feature bucket in [0, dim) — engine-portable."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long"), F.lit(dim)
    )


def linear_score(
    text_col: Column | str,
    weights: list[float],
    bias: float = 0.0,
) -> Column:
    """Mean-pooled linear logit over hashed token features, 6-dp rounded:
    round(bias + avg_t weights[bucket(t)], 6). All-JVM (array literal +
    higher-order aggregate); weights ride the plan, fine up to ~10k dims
    — bigger models should broadcast and use a pandas UDF instead."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    dim = len(weights)
    w = F.array(*[F.lit(float(x)) for x in weights])
    toks = F.split(c, " ")
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(w, (token_bucket(t, dim) + 1).cast("int")),
    )
    return F.round(F.lit(bias) + total / F.size(toks), 6)


def hashed_features(df: DataFrame, text_col: str, dim: int) -> DataFrame:
    """Adds ``features`` (ml Vector): normalized hashed bag-of-tokens —
    the training-side representation matching linear_score's lookup."""
    from pyspark.ml.functions import array_to_vector

    toks = F.split(F.col(text_col), " ")
    buckets = F.transform(toks, lambda t: token_bucket(t, dim))
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(F.filter(buckets, lambda b: b == i.cast("long")))
        / F.size(toks),
    )
    return df.withColumn("features", array_to_vector(counts.cast("array<double>")))


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 64,
    reg: float = 0.0,
) -> tuple[list[float], float]:
    """Fit logistic regression on hashed features; returns (weights,
    bias) ready for linear_score — train with ml, serve as expression."""
    from pyspark.ml.classification import LogisticRegression

    feats = hashed_features(labeled, text_col, dim).select(
        F.col(label_col).cast("double").alias("label"), "features"
    )
    model = LogisticRegression(regParam=reg, maxIter=50).fit(feats)
    return list(model.coefficients.toArray()), float(model.intercept)
