"""Per-segment NSW graph ANN (similarity/graph_ann.py).

Covers: recall vs brute force, partition-invariance of the built graph,
determinism of the search shortlist, parquet round-trip of the index, and
the pure-Python walk against a numpy exact scan on planted clusters.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from redpanda_spark.functions.vectors import as_double
from redpanda_spark.similarity.graph_ann import (
    _build_shard,
    _greedy_search,
    build_nsw_index,
    nsw_topk,
)
from redpanda_spark.sources.tables import load_table


def _query_vec(emb, vec_id=1):
    return np.array(
        emb.where(F.col("vec_id") == vec_id)
        .select(as_double("embedding").alias("v"))
        .collect()[0]["v"]
    )


def _exact_topk(emb, q, k):
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dist = F.aggregate(
        F.zip_with(as_double("embedding"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return [
        r["vec_id"]
        for r in emb.select("vec_id", dist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(k)
        .collect()
    ]


def test_nsw_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    idx = build_nsw_index(emb, n_shards=4, m=8, ef_construction=48).cache()
    try:
        got = {r["vec_id"] for r in nsw_topk(idx, q, k=10, ef_search=64).collect()}
        exact = _exact_topk(emb, q, 10)
        assert sum(1 for i in exact if i in got) >= 8
    finally:
        idx.unpersist()


def test_nsw_index_partition_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    a = build_nsw_index(emb.repartition(2), n_shards=3, m=6).collect()
    b = build_nsw_index(emb.repartition(11), n_shards=3, m=6).collect()
    norm = lambda rows: sorted((r["vec_id"], tuple(r["neighbors"])) for r in rows)
    assert norm(a) == norm(b)


def test_nsw_search_deterministic_and_sorted(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vec(emb, vec_id=7)
    idx = build_nsw_index(emb, n_shards=4, m=8).cache()
    try:
        r1 = [(r["vec_id"], round(r["d"], 9)) for r in nsw_topk(idx, q, k=20).collect()]
        r2 = [(r["vec_id"], round(r["d"], 9)) for r in nsw_topk(idx, q, k=20).collect()]
        assert r1 == r2
        assert r1 == sorted(r1, key=lambda t: (t[1], t[0]))
    finally:
        idx.unpersist()


def test_nsw_index_parquet_roundtrip(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").limit(150)
    q = _query_vec(emb, vec_id=2)
    idx = build_nsw_index(emb, n_shards=2, m=6)
    path = str(tmp_path / "nsw_index")
    idx.write.parquet(path)
    reloaded = spark.read.parquet(path)
    a = [r["vec_id"] for r in nsw_topk(idx, q, k=10).collect()]
    b = [r["vec_id"] for r in nsw_topk(reloaded, q, k=10).collect()]
    assert a == b


def test_build_shard_walk_finds_planted_cluster():
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(5, 16)) * 10
    x = np.vstack([c + rng.normal(size=(40, 16)) for c in centers])
    adj = _build_shard(x, m=8, ef_construction=48)
    assert all(len(a) >= 1 for a in adj[1:])
    # query = a point near cluster 3's center; walk must find in-cluster ids
    q = centers[3] + 0.01
    found = [i for _, i in _greedy_search(x, adj, len(x), q, 20)]
    exact = np.argsort(((x - q) ** 2).sum(axis=1), kind="stable")[:10]
    assert len(set(found) & set(int(i) for i in exact)) >= 8


def test_greedy_search_empty_and_single():
    x = np.zeros((1, 4))
    assert _greedy_search(x, [[]], 0, np.zeros(4), 5) == []
    out = _greedy_search(x, [[]], 1, np.ones(4), 5)
    assert [i for _, i in out] == [0]


@pytest.mark.parametrize("n_shards", [1, 4])
def test_nsw_shard_count_preserves_corpus(spark, sf_dir, n_shards):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_nsw_index(emb, n_shards=n_shards, m=6)
    assert idx.count() == emb.count()
    assert idx.select("vec_id").distinct().count() == emb.count()
