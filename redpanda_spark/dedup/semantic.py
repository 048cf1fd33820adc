"""SemDedup — semantic (embedding-cluster) deduplication.

Public method (Abbas et al. 2023, "SemDedup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): k-means the
corpus embeddings, then inside each cluster drop every item whose cosine
similarity to another kept item exceeds a threshold — near-duplicate
SEMANTICS (paraphrases, re-encodes), which hash/shingle dedup can't see.
This is the missing rung between MinHash (lexical) and exact embedding
near-dup (`dedup/embedding.py`, all-pairs within LSH blocks) in the
dedup ladder: clustering bounds the candidate set so the quadratic term
is per-cluster, not per-corpus.

Spark shape (100 TB): centroid fit is sample-based (driver numpy,
`similarity/ann.py::fit_ivf_centroids` — cost independent of corpus
size); cell assignment is one Arrow-batched matmul over a broadcast
centroid matrix; the intra-cell pair scan is a self-join that shuffles
on ``cell`` only — cluster count scales with corpus size to keep cells
bounded (the paper uses ~100k clusters at web scale), and a ``max_cell``
guard caps degenerate clusters. No all-pairs stage anywhere.

Keep rule: within a cell, an item is a DUPLICATE iff some other item
with a SMALLER id is within ``tau`` cosine — deterministic, order-free,
and exactly replayable in SQL (the gate query's oracle). The paper keeps
a random representative; lowest-id is the deterministic choice of the
same equivalence.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redpanda_spark.functions.vectors import as_double, dot, norm
from redpanda_spark.similarity.ann import fit_ivf_centroids, ivf_assign
from redpanda_spark.sources.tables import (
    defer_unpersist,
    drain_deferred_unpersist,
    parallelize_narrow,
)


def semantic_dedup(
    emb: DataFrame,
    centroids: np.ndarray,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = 10_000,
) -> DataFrame:
    """Per-item verdicts: (id, cell, is_dup, dup_of).

    ``dup_of`` is the smallest same-cell id within ``tau`` cosine (NULL
    for kept items). ``max_cell`` drops pair generation for degenerate
    clusters (skew guard — the same hot-bucket cap as MinHash LSH);
    items in an over-cap cell are all KEPT, conservatively.
    """
    # Lazy persist: the (id, cell, v) frame feeds FOUR subtrees of the one
    # returned plan (cell census, both join sides of the pair scan, final
    # verdict join) — without a live cache mark the Arrow-matmul ivf_assign
    # recomputes once per subtree under the caller's action. The previous
    # eager persist was unpersisted in a `finally` BEFORE the caller ever
    # acted, so it cached nothing; the deferred-unpersist registry frees
    # the blocks on the next invocation instead (bounded single-invocation
    # leak, same pattern as minhash/bm25/kmeans).
    drain_deferred_unpersist()
    docs = parallelize_narrow(
        ivf_assign(emb, centroids, vec_col=vec_col).select(
            F.col(id_col).alias("id"), F.col("cell"), as_double(vec_col).alias("v")
        )
    ).persist()
    defer_unpersist(docs)
    cells = docs.groupBy("cell").agg(F.count("*").alias("_n"))
    ok_cells = cells.where(
        F.lit(max_cell is None) | (F.col("_n") <= F.lit(max_cell or 0))
    ).select("cell")
    scannable = docs.join(F.broadcast(ok_cells), "cell", "left_semi")
    # per-row norms hoisted below the join: within a cell of size c
    # the pair scan is c² rows, so computing the 2 norm folds per PAIR
    # (as cosine() would) costs 2c² folds where per-side hoisting
    # costs 2c — same fold, same dot/(n·n) grouping, bit-identical
    # rounded score
    lo = scannable.select(
        "cell",
        F.col("id").alias("lo_id"),
        F.col("v").alias("lo_v"),
        norm(F.col("v")).alias("lo_n"),
    )
    hi = scannable.select(
        "cell",
        F.col("id").alias("id"),
        F.col("v").alias("hi_v"),
        norm(F.col("v")).alias("hi_n"),
    )
    # shuffles both sides on cell; within a cell the join is the
    # paper's quadratic scan, bounded by cell size. Plan note: this
    # compiles to a sort-merge join on `cell` — the right shape here,
    # both sides are the same corpus (equal size, no broadcast side)
    # and SMJ streams each cell without holding it in a hash table.
    dup_of = (
        hi.join(lo, "cell")
        .where(F.col("lo_id") < F.col("id"))
        .where(
            F.round(
                dot(F.col("hi_v"), F.col("lo_v"))
                / (F.col("hi_n") * F.col("lo_n")),
                6,
            )
            >= F.lit(tau)
        )
        .groupBy("id")
        .agg(F.min("lo_id").alias("dup_of"))
    )
    return (
        docs.join(dup_of, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cell",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
        )
    )


def semantic_dedup_kmeans(
    emb: DataFrame,
    n_cells: int = 64,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    **kw,
) -> DataFrame:
    """End-to-end SemDedup: sample-fit k-means centroids, then dedup."""
    cents = fit_ivf_centroids(emb, n_cells=n_cells, vec_col=vec_col, seed=seed)
    return semantic_dedup(emb, cents, tau=tau, id_col=id_col, vec_col=vec_col, **kw)
