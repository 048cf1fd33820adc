"""Distributed k-means (similarity/kmeans.py), DSIR importance
resampling (pipeline/dsir.py), and the HLL partial-merge rollup query:
determinism, partition invariance, and semantic sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpanda_spark.pipeline.dsir import dsir_select, dsir_weights
from redpanda_spark.plans.queries import QUERIES
from redpanda_spark.similarity.kmeans import (
    assign_clusters,
    init_centroids,
    kmeans_fit,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_kmeans_partition_invariance(spark, sf_dir):
    """Repartitioning the corpus must not move a single point or shift a
    centroid component — the determinism contract the IVF/PQ fitters
    already hold (content-addressed init, pre-rounded distances)."""
    emb = _emb(spark, sf_dir)
    a = sorted(map(tuple, kmeans_fit(emb, k=8, iters=2).collect()))
    b = sorted(map(tuple, kmeans_fit(emb.repartition(7), k=8, iters=2).collect()))
    assert a == b


def test_kmeans_covers_corpus_and_is_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    n = emb.count()
    rows = kmeans_fit(emb, k=8, iters=2).collect()
    assert sum(r["n_points"] for r in rows) == n
    assert len(rows) <= 8
    assert len({r["cluster_id"] for r in rows}) == len(rows)


def test_kmeans_assignment_is_nearest_centroid(spark, sf_dir):
    """Every row's recorded dist2 equals the minimum over the centroid
    set (argmin actually taken), ties to the lower cluster id."""
    emb = _emb(spark, sf_dir).where(F.col("vec_id") < 50)
    cents = init_centroids(emb, 4)
    rows = assign_clusters(emb, cents).collect()
    import math

    for r in rows:
        v = r["v"]
        best = min(
            (
                round(
                    math.fsum([x * x for x in v])
                    - 2 * sum(a * b for a, b in zip(v, c))
                    + sum(x * x for x in c),
                    9,
                ),
                cid,
            )
            for cid, c in cents.items()
        )
        assert r["cluster"] == best[1]


def test_dsir_weight_sign(spark):
    """A token seen only in target docs gets a positive log-ratio; one
    seen only in raw (non-target) docs gets a negative one."""
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta", "en"),
            (2, "gamma beta", "fr"),
            (3, "gamma gamma delta", "fr"),
        ],
        ["doc_id", "text", "lang"],
    )
    w = {
        r["t"]: r["lw"]
        for r in dsir_weights(docs, F.col("lang") == "en").collect()
    }
    assert w["alpha"] > 0  # target-only
    assert w["gamma"] < 0  # raw-only
    assert set(w) == {"alpha", "beta", "gamma", "delta"}


def test_dsir_select_fraction_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = dsir_select(docs, F.col("lang") == "en", 0.2)
    rows = out.collect()
    n = len(rows)
    kept = sum(1 for r in rows if r["selected"])
    # threshold semantics: at least the top 20% clear the quantile; ties
    # may add a few
    assert n > 0 and kept >= 0.19 * n and kept <= 0.5 * n
    again = sorted(map(tuple, dsir_select(docs, F.col("lang") == "en", 0.2).collect()))
    assert sorted(map(tuple, rows)) == again


def test_sketch_merge_within_tolerance(spark, sf_dir):
    rows = QUERIES["events_sketch_merge"](spark, sf_dir).collect()
    assert rows and all(r["merged_within_5pct"] for r in rows)


# -- PCA (round 8) -------------------------------------------------------


def test_pca_components_partition_invariant(spark, sf_dir):
    from redpanda_spark.functions.pca import pca_components
    from redpanda_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    c1, mu1, ev1 = pca_components(emb.repartition(7), "embedding", 64, 4)
    c2, mu2, ev2 = pca_components(emb.coalesce(1), "embedding", 64, 4)
    import numpy as np

    assert np.array_equal(c1, c2) and np.array_equal(mu1, mu2)
    # eigenvalues descending
    assert all(ev1[i] >= ev1[i + 1] - 1e-12 for i in range(len(ev1) - 1))


def test_pca_projection_variance_ordering(spark, sf_dir):
    from redpanda_spark.functions.pca import pca_components, pca_project
    from redpanda_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    comps, mu, ev = pca_components(emb, "embedding", 64, 3)
    proj = pca_project(emb, "embedding", comps, mu)
    from pyspark.sql import functions as F

    stats = proj.agg(
        *[F.variance(f"pc{k}").alias(f"v{k}") for k in (1, 2, 3)]
    ).collect()[0]
    # projected variances follow the eigenvalue order (loose: quantized
    # components applied to unquantized data)
    assert stats["v1"] >= stats["v2"] >= stats["v3"]
    # pc1 variance matches its eigenvalue within quantization tolerance
    assert abs(stats["v1"] - ev[0]) / max(ev[0], 1e-9) < 0.05
    # zero Python in the serve plan
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
