"""Distributed Lloyd's k-means over an embedding column — topic/domain
clustering for training-data curation.

The published curation pipelines cluster corpus embeddings to balance
domain mixtures and to drive cluster-based dedup/filtering (SemDeDup
prunes within k-means cells; DoReMi / data-mixing work groups documents
by cluster before reweighting — see PAPERS.md). This is the exact,
deterministic, engine-reproducible version of the same primitive the
IVF index already uses internally (`similarity/ann.py:fit_ivf_centroids`
fits on a driver-side sample); here the ITERATIONS themselves are
distributed, so the assignment step scans the full corpus and scales
with it.

Execution shape per iteration (the only shape that survives 100 TB):

- centroids are k×d control material — broadcast into the plan as
  literal arrays (k here is small; at thousands of cells switch to the
  SparkContext-broadcast matrix UDF `ivf_assign` uses — same algebra),
- one narrow corpus scan computes the k squared distances JVM-side
  (`aggregate`/`zip_with` folds — no Python, no shuffle) and takes the
  argmin via `array_min` over (distance, cluster) structs,
- the update is one map-side-combinable groupBy producing k rows
  (count + per-dimension mean) — the only shuffle, k groups wide,
- the driver only ever sees k centroid rows per iteration (bounded
  control material, same discipline as the IVF/PQ fitters).

Determinism / oracle parity (the cross-engine float law, COVERAGE.md):

- distances use the dot-product identity ‖x‖² − 2x·c + ‖c‖² with every
  dot product a left-to-right fold over the array — the same order
  DuckDB's `list_dot_product` folds in — and are pre-rounded to 9
  decimals before the argmin, so libm/summation ulp differences cannot
  flip an assignment; ties prefer the lower cluster id,
- updated centroid components are ROUND(avg, 6) — division-derived
  small values, the documented safe class — so iteration t+1 on any
  engine starts from byte-identical centroids,
- initialization is the k lowest-id vectors (rank order = cluster id):
  no RNG, no partition-order dependence,
- clusters that receive no points simply drop out of the next round on
  both engines (no respawn heuristic — reproducibility over elegance).

Reference parity: the reference has no clustering operator (it is a
streaming/storage engine); this belongs to the LLM-pipeline extension
the build brief requires alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from redpanda_spark.functions.vectors import as_double, dot
from redpanda_spark.sources.tables import (
    defer_unpersist,
    drain_deferred_unpersist,
    parallelize_narrow,
)


def init_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> dict[int, list[float]]:
    """Deterministic seed centroids: the k lowest-id vectors, cluster id =
    rank by id. Driver-side cost is k rows — bounded control material."""
    rows = (
        emb.select(F.col(id_col).alias("i"), as_double(vec_col).alias("v"))
        .orderBy("i")
        .limit(k)
        .collect()
    )
    return {j: list(r["v"]) for j, r in enumerate(rows)}


def assign_clusters(
    emb: DataFrame,
    centroids: dict[int, list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, cluster, dist2): nearest centroid per row, computed in one
    JVM pass (no shuffle, no Python). dist2 is the 9-decimal-rounded
    squared euclidean distance; ties prefer the lower cluster id."""
    base = emb.select(F.col(id_col), as_double(vec_col).alias("v")).withColumn(
        "_xx", dot(F.col("v"), F.col("v"))
    )
    # Each centroid enters the plan as ONE array literal (not d
    # per-component F.lit calls): expression BUILD time is driver-side
    # py4j round trips, and the per-component form measured ~1 s per
    # assign_clusters call at d=64, k=8 before a single task ran. The k
    # candidates stay INLINED per centroid — a `transform` lambda over a
    # literal matrix was also tried (iteration-invariant plan shape) and
    # measured ~0.5 s SLOWER end-to-end: higher-order lambdas evaluate
    # interpreted per element, losing more at runtime than the codegen
    # cache saved. Same Literal values, same fold order as before — only
    # the construction path changes.
    cands = []
    for cid in sorted(centroids):
        c = centroids[cid]
        cc = 0.0  # left-to-right fold — the order every engine folds in
        for x in c:
            cc += x * x
        carr = F.lit([float(x) for x in c])
        d = F.round(F.col("_xx") - 2.0 * dot(F.col("v"), carr) + F.lit(cc), 9)
        cands.append(F.struct(d.alias("d"), F.lit(int(cid)).alias("c")))
    best = F.array_min(F.array(*cands))
    return base.select(
        id_col,
        "v",
        best["c"].alias("cluster"),
        best["d"].alias("dist2"),
    )


def update_centroids(assigned: DataFrame, dims: int) -> dict[int, list[float]]:
    """Per-cluster component means, ROUND(·, 6) so the next iteration is
    byte-identical on any engine. Returns ≤k rows to the driver; empty
    clusters drop out."""
    aggs = [F.round(F.avg(F.col("v")[i]), 6).alias(f"_c{i}") for i in range(dims)]
    rows = assigned.groupBy("cluster").agg(*aggs).collect()
    return {int(r["cluster"]): [r[f"_c{i}"] for i in range(dims)] for r in rows}


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd assignment steps (each followed by a centroid
    update except the last, whose update IS the returned aggregate) and
    return the final cluster summary:

    (cluster_id, n_points, c0, c1) — size and the first two updated
    centroid components (ROUND 6) per surviving cluster.

    The full per-row assignment of the last step is the intermediate
    ``assign_clusters`` frame; callers that need labels (SemDeDup-style
    within-cluster pruning) use that directly.
    """
    # One narrow (id, v) frame persisted for the whole fit: every Lloyd
    # pass (and the seed scan) reads the cached post-exchange rows instead
    # of re-scanning + re-repartitioning the input per job — iters+1 full
    # jobs share one materialization. Lazy persist, drained on the NEXT
    # operator invocation (the defer registry pattern), so the caller's
    # action on the returned frame still finds the cache live. Values are
    # untouched: persist changes where rows are read from, never what the
    # per-pass expressions compute.
    drain_deferred_unpersist()
    src = (
        parallelize_narrow(emb)
        .select(F.col(id_col), as_double(vec_col).alias("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cents = init_centroids(src, k, id_col, "v")
    # dims straight off the collected seed vectors — the separate
    # size()-limit(1) probe job bought nothing the seeds don't carry
    dims = len(next(iter(cents.values())))
    for _ in range(iters - 1):
        cents = update_centroids(assign_clusters(src, cents, id_col, "v"), dims)
    final = assign_clusters(src, cents, id_col, "v")
    defer_unpersist(src)
    return (
        final.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.avg(F.col("v")[0]), 6).alias("c0"),
            F.round(F.avg(F.col("v")[1]), 6).alias("c1"),
        )
        .select(
            F.col("cluster").cast("int").alias("cluster_id"), "n_points", "c0", "c1"
        )
    )
