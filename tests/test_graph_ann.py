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


# -- property tests (pure numpy; no Spark round-trip) --------------------------

import hypothesis.strategies as st
from hypothesis import given, settings

_corpus = st.integers(min_value=2, max_value=60).flatmap(
    lambda n: st.lists(
        st.lists(
            st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=n, max_size=n,
    )
)


@given(_corpus)
@settings(max_examples=150, deadline=None)
def test_build_shard_structural_invariants(vecs):
    x = np.array(vecs, dtype=np.float64)
    m = 4
    adj = _build_shard(x, m=m, ef_construction=12)
    assert len(adj) == len(x)
    for i, nbrs in enumerate(adj):
        assert len(nbrs) <= 2 * m                 # degree bound
        assert nbrs == sorted(set(nbrs))          # sorted, unique
        assert i not in nbrs                      # no self-loop
        assert all(0 <= j < len(x) for j in nbrs)
        if i > 0:
            assert len(nbrs) >= 1                 # every insert links


@given(_corpus)
@settings(max_examples=150, deadline=None)
def test_select_neighbors_properties(vecs):
    from redpanda_spark.similarity.graph_ann import _select_neighbors

    x = np.array(vecs, dtype=np.float64)
    cands = list(range(len(x)))
    m = 3
    kept = _select_neighbors(x, 0, cands, m)
    assert len(kept) <= m
    assert kept == sorted(set(kept))
    assert 0 not in kept                          # never links to itself
    assert set(kept) <= set(cands)
    if len(x) > 1:
        # the globally nearest candidate is never "covered": something at
        # its distance survives (ties break by index)
        d = ((x[1:] - x[0]) ** 2).sum(axis=1)
        assert any(
            float(((x[k] - x[0]) ** 2).sum()) <= float(d.min()) for k in kept
        )


@given(_corpus, st.integers(min_value=1, max_value=20))
@settings(max_examples=150, deadline=None)
def test_greedy_search_output_contract(vecs, ef):
    x = np.array(vecs, dtype=np.float64)
    adj = _build_shard(x, m=4, ef_construction=12)
    q = x[0] + 0.1
    found = _greedy_search(x, adj, len(x), q, ef)
    assert len(found) <= max(ef, 1)
    ids = [i for _, i in found]
    assert len(ids) == len(set(ids))              # unique
    ds = [d for d, _ in found]
    assert ds == sorted(ds)                       # ascending distance
    # reported distances are the true distances
    for d, i in found:
        assert d == float(((x[i] - q) ** 2).sum())


# -- incremental insert (nsw_insert) -------------------------------------------

from redpanda_spark.similarity.graph_ann import nsw_insert


def test_nsw_insert_preserves_corpus_and_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    inc = emb.where(F.col("vec_id") % 5 == 0)
    idx = build_nsw_index(base, n_shards=4, m=8)
    idx2 = nsw_insert(idx, inc, m=8).cache()
    try:
        assert idx2.count() == emb.count()
        assert idx2.select("vec_id").distinct().count() == emb.count()
        q = _query_vec(emb)
        got = {r["vec_id"] for r in nsw_topk(idx2, q, k=10, ef_search=64).collect()}
        exact = _exact_topk(emb, q, 10)
        assert sum(1 for i in exact if i in got) >= 8
    finally:
        idx2.unpersist()


def test_nsw_insert_untouched_shards_unchanged(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    base = emb.where(F.col("vec_id") != 3)
    one = emb.where(F.col("vec_id") == 3)
    idx = build_nsw_index(base, n_shards=4, m=6)
    before = {
        r["vec_id"]: tuple(r["neighbors"])
        for r in idx.collect()
    }
    touched_shard = nsw_insert(idx, one, m=6).where(
        F.col("vec_id") == 3
    ).collect()[0]["shard"]
    after_rows = nsw_insert(idx, one, m=6).collect()
    for r in after_rows:
        if r["shard"] != touched_shard and r["vec_id"] != 3:
            assert tuple(r["neighbors"]) == before[r["vec_id"]]


def test_nsw_insert_deterministic_under_repartition(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    base = emb.where(F.col("vec_id") % 4 != 0)
    inc = emb.where(F.col("vec_id") % 4 == 0)
    idx = build_nsw_index(base, n_shards=3, m=6)
    norm = lambda rows: sorted((r["vec_id"], tuple(r["neighbors"])) for r in rows)
    a = nsw_insert(idx, inc.repartition(2), m=6).collect()
    b = nsw_insert(idx, inc.repartition(9), m=6).collect()
    assert norm(a) == norm(b)


def test_nsw_insert_empty_increment_is_identity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    idx = build_nsw_index(emb, n_shards=2, m=6)
    inc = emb.where(F.lit(False))
    norm = lambda rows: sorted((r["vec_id"], tuple(r["neighbors"])) for r in rows)
    assert norm(nsw_insert(idx, inc).collect()) == norm(idx.collect())


# -- soft delete + compaction ---------------------------------------------------

from redpanda_spark.similarity.graph_ann import nsw_compact, nsw_delete


def test_nsw_delete_excludes_from_results_but_keeps_routing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    exact = _exact_topk(emb, q, 10)
    # tombstone the 3 nearest neighbors: results must exclude them AND
    # recall on the remainder must hold (deleted nodes still route)
    dels = spark.createDataFrame([(i,) for i in exact[:3]], "vec_id long")
    idx = nsw_delete(build_nsw_index(emb, n_shards=4, m=8), dels).cache()
    try:
        got = [r["vec_id"] for r in nsw_topk(idx, q, k=10, ef_search=64).collect()]
        assert not set(got) & set(exact[:3])
        remaining_exact = _exact_topk(
            emb.where(~F.col("vec_id").isin(*exact[:3])), q, 10
        )
        assert sum(1 for i in remaining_exact if i in got) >= 8
    finally:
        idx.unpersist()


def test_nsw_delete_is_idempotent_and_compact_drops_rows(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    dels = emb.where(F.col("vec_id") % 7 == 0).select("vec_id")
    n_del = dels.count()
    idx = build_nsw_index(emb, n_shards=3, m=6)
    once = nsw_delete(idx, dels)
    twice = nsw_delete(once, dels)
    assert once.where("deleted").count() == n_del
    assert twice.where("deleted").count() == n_del
    compacted = nsw_compact(twice, m=6)
    assert "deleted" not in compacted.columns
    assert compacted.count() == emb.count() - n_del
    # survivors' neighbor lists contain no tombstoned ids
    dead = {r["vec_id"] for r in dels.collect()}
    for r in compacted.collect():
        assert not set(r["neighbors"]) & dead


def test_nsw_compact_search_recall_on_survivors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    dels = emb.where(F.col("vec_id") % 3 == 0).select("vec_id")
    idx = nsw_compact(nsw_delete(build_nsw_index(emb, n_shards=4, m=8), dels), m=8)
    got = {r["vec_id"] for r in nsw_topk(idx, q, k=10, ef_search=64).collect()}
    survivors = emb.where(F.col("vec_id") % 3 != 0)
    exact = _exact_topk(survivors, q, 10)
    assert sum(1 for i in exact if i in got) >= 8


def test_nsw_insert_after_delete_preserves_tombstones(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    base = emb.where(F.col("vec_id") % 4 != 0)
    inc = emb.where(F.col("vec_id") % 4 == 0)
    dels = base.where(F.col("vec_id") % 9 == 0).select("vec_id")
    idx = nsw_delete(build_nsw_index(base, n_shards=3, m=6), dels)
    grown = nsw_insert(idx, inc, m=6)
    assert "deleted" in grown.columns
    assert grown.where("deleted").count() == dels.count()
    assert grown.count() == emb.count()


# -- filtered search (allow_col) -------------------------------------------------


def test_nsw_filtered_search_only_matching_and_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    idx = build_nsw_index(emb, n_shards=4, m=8).join(
        emb.select("vec_id", (F.col("label") % 2 == 0).alias("_ok")), "vec_id"
    )
    got = [
        r["vec_id"]
        for r in nsw_topk(idx, q, k=10, ef_search=64, allow_col="_ok").collect()
    ]
    allowed_ids = {
        r["vec_id"] for r in emb.where(F.col("label") % 2 == 0).collect()
    }
    assert set(got) <= allowed_ids
    exact = _exact_topk(emb.where(F.col("label") % 2 == 0), q, 10)
    assert sum(1 for i in exact if i in got) >= 8


def test_nsw_filtered_composes_with_tombstones(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    q = _query_vec(emb)
    dels = emb.where(F.col("vec_id") % 11 == 0).select("vec_id")
    idx = nsw_delete(build_nsw_index(emb, n_shards=3, m=8), dels).join(
        emb.select("vec_id", (F.col("label") < 5).alias("_ok")), "vec_id"
    )
    got = [
        r["vec_id"]
        for r in nsw_topk(idx, q, k=10, ef_search=64, allow_col="_ok").collect()
    ]
    for i in got:
        assert i % 11 != 0                        # tombstones excluded
    allowed = {r["vec_id"] for r in emb.where(F.col("label") < 5).collect()}
    assert set(got) <= allowed                    # predicate enforced


# -- streaming ingest: foreachBatch folds micro-batches into the index ----------


def test_streaming_nsw_ingest_maintains_index(spark, sf_dir, tmp_path):
    """Continuous-ingest ANN: embedding micro-batches stream in via
    foreachBatch -> nsw_insert over a parquet-persisted index (the same
    read-modify-write store shape as the streaming dedup store). After
    the stream drains, the maintained index answers with full-corpus
    recall — no rebuild ever ran."""
    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    base = emb.where(F.col("vec_id") % 3 == 0)
    inc = emb.where(F.col("vec_id") % 3 != 0)
    store = str(tmp_path / "nsw_store")
    build_nsw_index(base, n_shards=3, m=8).write.parquet(store)

    src_dir = str(tmp_path / "incoming")
    # two appends -> several files -> several micro-batches (1 file each)
    inc.where(F.col("vec_id") % 3 == 1).coalesce(1).write.mode("append").parquet(src_dir)
    inc.where(F.col("vec_id") % 3 == 2).coalesce(1).write.mode("append").parquet(src_dir)

    def fold(batch_df, batch_id):
        if not batch_df.take(1):
            return
        idx = spark.read.parquet(store)
        grown = nsw_insert(idx, batch_df, m=8).collect()
        cols = ["shard", "vec_id", "v", "neighbors", "n_shards"]
        spark.createDataFrame(grown).select(*cols).write.mode(
            "overwrite"
        ).parquet(store)

    q = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    final = spark.read.parquet(store)
    assert final.count() == emb.count()
    qv = _query_vec(emb)
    got = {r["vec_id"] for r in nsw_topk(final, qv, k=10, ef_search=64).collect()}
    exact = _exact_topk(emb, qv, 10)
    assert sum(1 for i in exact if i in got) >= 8


# -- code-review regression tests ----------------------------------------------


def test_greedy_search_tie_keeps_smaller_index():
    # two equidistant nodes at the ef=1 boundary: the SMALLER index must
    # survive eviction (res heap stores (-d, -i) so ties evict the larger)
    x = np.array([[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0]])
    adj = [[1, 2], [0], [0]]
    found = _greedy_search(x, adj, 3, np.array([0.0, 0.0]), 1)
    # node 0 is exact; raise query off origin so 1 and 2 tie non-trivially
    found = _greedy_search(x, adj, 3, np.array([0.0, 5.0]), 2)
    ids = [i for _, i in found]
    assert ids[0] == 0 and ids[1] == 1  # 1 and 2 tie; smaller id kept


def test_nsw_insert_redelivery_is_idempotent(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    base = emb.where(F.col("vec_id") % 4 != 0)
    inc = emb.where(F.col("vec_id") % 4 == 0)
    idx = build_nsw_index(base, n_shards=3, m=6)
    once = nsw_insert(idx, inc, m=6)
    # redelivery: the SAME increment (plus some already-base ids) again
    twice = nsw_insert(once, inc.unionByName(base.limit(5)), m=6)
    norm = lambda rows: sorted((r["vec_id"], tuple(r["neighbors"])) for r in rows)
    assert norm(twice.collect()) == norm(once.collect())
    assert twice.count() == emb.count()  # no duplicate rows
