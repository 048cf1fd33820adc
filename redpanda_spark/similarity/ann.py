"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — broadcast the (small) query set,
cross-join against the corpus, window top-k per query. The corpus side
never shuffles (queries are broadcast) and the top-k is a partial
aggregation, so this scales to the full corpus size linearly.

Scale path: IVF — k-means-style coarse centroids (sampled, driver-fit via
numpy), assign each corpus vector to its nearest centroid once, and probe
only ``nprobe`` cells per query: the cross-join shrinks by ~n_cells/nprobe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from redpanda_spark.functions.vectors import as_double, dot, norm
from redpanda_spark.sources.tables import parallelize_narrow


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cos).

    Ties broken by neighbor id (deterministic, oracle-matchable).
    """
    # Norms are hoisted BELOW the join (one per query row / one per corpus
    # row): computed per joined pair they cost 2 of the 3 array folds q·n
    # times instead of q+n — at 100 TB the pair count is the whole bill.
    # Same fold, same values, same dot/(qn·cn) grouping as cosine(), so
    # the rounded score is bit-identical.
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double(vec_col).alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    # Small parquet corpora arrive as one split; spread the O(n·q) cosine
    # work across cores. No-op when the corpus already has enough splits.
    c = parallelize_narrow(
        corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
    ).withColumn("cn", norm(F.col("cv")))
    joined = c.join(F.broadcast(q))
    if not include_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cos",
        F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def fit_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 64,
    vec_col: str = "embedding",
    sample_fraction: float = 0.2,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Mini k-means on a sample (driver-side numpy on ≤ ~100k sampled rows).

    At 100 TB the sample fraction drops accordingly — centroid fitting cost
    is independent of corpus size.

    The sample is DETERMINISTIC under any physical partitioning: rows are
    chosen by a content hash (xxhash64 of the vector) bucket filter and
    collected in hash order — never ``df.sample``/bare ``limit``, whose
    output depends on partition layout and would let a repartition shift
    the centroids (and flip downstream recall gates).
    """
    modulus = max(1, int(round(1.0 / max(sample_fraction, 1e-9))))
    h = F.pmod(F.xxhash64(F.col("v")), F.lit(modulus))
    sample = (
        emb.select(as_double(vec_col).alias("v"))
        .withColumn("h", h)
        .where(F.col("h") == 0)
        .withColumn("ho", F.xxhash64(F.col("v")))
        .orderBy("ho")
        .limit(100_000)
        .collect()
    )
    x = np.array([r["v"] for r in sample])
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        d = x @ cents.T
        assign = d.argmax(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cents[c] = v / (np.linalg.norm(v) + 1e-12)
    return cents


def ivf_assign(emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Attach ``cell`` = nearest-centroid id (argmax dot, 6-decimal rounded,
    ties to the lowest cell — deterministic and oracle-matchable).

    Scale design: the centroid matrix rides a SparkContext broadcast into a
    vectorized Arrow-batched UDF — one BLAS matmul per batch, plan size
    O(1) in n_cells. (The previous form inlined every centroid as a
    literal array; at a realistic 4k–65k cells the Catalyst plan/codegen
    explodes. A broadcast matrix serializes once per executor and supports
    65k×1k-dim float64 = ~0.5 GB without touching the plan.)
    """
    C = np.asarray(centroids, dtype=np.float64)
    bc = emb.sparkSession.sparkContext.broadcast(C)

    @pandas_udf("int")
    def cell_udf(vs: pd.Series) -> pd.Series:
        M = bc.value
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        x = np.array(list(vs), dtype=np.float64)
        s = np.round(x @ M.T, 6)
        return pd.Series(s.argmax(axis=1).astype("int32"))

    return emb.withColumn("cell", cell_udf(as_double(vec_col)))


def ivf_topk(
    corpus_with_cells: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF search: probe the nprobe closest cells per query, exact rerank."""
    q = ivf_probe_cells(queries, centroids, nprobe, vec_col, query_id_col).withColumn(
        "qn", norm(F.col("qv"))
    )
    c = parallelize_narrow(
        corpus_with_cells.select(
            F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"), "cell"
        )
    ).withColumn("cn", norm(F.col("cv")))
    joined = c.join(F.broadcast(q), "cell").where(F.col("neighbor_id") != F.col("query_id"))
    # per-side norms hoisted below the join (see brute_force_topk) —
    # bit-identical rounded score, 1 fold per pair instead of 3
    scored = joined.withColumn(
        "cos",
        F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .select("query_id", "neighbor_id", "rank", "cos")
        .dropDuplicates(["query_id", "neighbor_id"])
    )


def ivf_probe_cells(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, qv, cell) with one row per probed cell — the ``nprobe``
    highest-dot centroids per query (rounded, ties to the lowest cell).
    Same broadcast-matrix design as ivf_assign: plan size O(1) in
    n_cells."""
    C = np.asarray(centroids, dtype=np.float64)
    bc = queries.sparkSession.sparkContext.broadcast(C)

    @pandas_udf("array<int>")
    def probe_udf(vs: pd.Series) -> pd.Series:
        M = bc.value
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        x = np.array(list(vs), dtype=np.float64)
        s = np.round(x @ M.T, 6)
        # stable sort of -score: ties keep ascending cell order
        order = np.argsort(-s, axis=1, kind="stable")[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    v = as_double(vec_col)
    return queries.select(
        F.col(query_id_col).alias("query_id"),
        v.alias("qv"),
        F.explode(probe_udf(v)).alias("cell"),
    )


KMEANS_PARTIAL_SCHEMA = "cell int, cnt long, s array<double>"


def fit_kmeans(
    emb: DataFrame,
    k: int = 64,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Distributed Lloyd k-means over the FULL corpus (spherical: centroids
    L2-normalized, assignment by max dot product — cosine geometry, same
    convention as ivf_assign).

    Per iteration, one job: a single ``mapInPandas`` pass fuses assignment
    (broadcast centroid matmul) with map-side partial sums — each Arrow
    batch emits at most k (cell, count, sum) rows — then a k-row groupBy
    reduces the partials. Only k x dim floats ever reach the driver
    (exactly MLlib KMeans' treeAggregate contract), so corpus size only
    affects the scan. Use ``fit_ivf_centroids`` when a sampled fit is
    enough; this is the exact trainer.

    Init is deterministic and spread-aware (k-means|| shape, MLlib's
    contract): a hash-ordered candidate pool of min(8k, n) rows comes to
    the driver (bounded: 8k x dim floats, layout-independent order), then
    greedy farthest-point (maxmin) selection picks k well-separated
    centers from it — so k seeds landing inside one true cluster (the
    classic Lloyd bad-init stagnation) cannot happen when the pool spans
    the clusters. No RNG anywhere: same data => same centroids.
    """
    from collections.abc import Iterator

    if init_centroids is not None:
        cents = np.asarray(init_centroids, dtype=np.float64)
    else:
        pool_rows = (
            emb.select(F.col(id_col), as_double(vec_col).alias("v"))
            .withColumn(
                "h",
                F.pmod(
                    F.pmod(F.col(id_col), F.lit(2147483647)) * F.lit(2654435761),
                    F.lit(1_000_000),
                ),
            )
            .orderBy("h", id_col)
            .limit(8 * k)
            .collect()
        )
        if not pool_rows:
            raise ValueError("fit_kmeans: no vectors to initialize from")
        pool = np.array([r["v"] for r in pool_rows], dtype=np.float64)
        pool = pool / (np.linalg.norm(pool, axis=1, keepdims=True) + 1e-12)
        # greedy maxmin in cosine geometry: next center = pool point with
        # the smallest max-similarity to the centers chosen so far
        chosen = [0]
        best_sim = pool @ pool[0]
        for _ in range(1, min(k, len(pool))):
            nxt = int(np.argmin(best_sim))
            chosen.append(nxt)
            best_sim = np.maximum(best_sim, pool @ pool[nxt])
        while len(chosen) < k:  # degenerate: pool smaller than k
            chosen.append(chosen[len(chosen) % len(pool)])
        cents = pool[chosen]
    cents = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12)

    spark = emb.sparkSession
    vecs = emb.select(as_double(vec_col).alias("v"))
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)

        def partial_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            M = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.array(list(pdf["v"]), dtype=np.float64)
                assign = np.round(x @ M.T, 6).argmax(axis=1)
                cells, inv = np.unique(assign, return_inverse=True)
                sums = np.zeros((len(cells), x.shape[1]))
                np.add.at(sums, inv, x)
                cnts = np.bincount(inv, minlength=len(cells))
                yield pd.DataFrame(
                    {
                        "cell": cells.astype("int32"),
                        "cnt": cnts.astype("int64"),
                        "s": list(sums),
                    }
                )

        def combine(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "cell": [int(pdf["cell"].iloc[0])],
                    "cnt": [int(pdf["cnt"].sum())],
                    "s": [np.sum(np.array(list(pdf["s"])), axis=0)],
                }
            )

        rows = (
            vecs.mapInPandas(partial_sums, KMEANS_PARTIAL_SCHEMA)
            .groupBy("cell")
            .applyInPandas(combine, KMEANS_PARTIAL_SCHEMA)
            .collect()
        )
        new = cents.copy()
        for r in rows:
            c = int(r["cell"])
            v = np.array(r["s"]) / max(int(r["cnt"]), 1)
            new[c] = v / (np.linalg.norm(v) + 1e-12)
        cents = new
        bc.unpersist()
    return cents
