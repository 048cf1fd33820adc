"""Graph ANN: per-segment navigable-small-world (NSW) indexes.

This closes the ANN ladder (brute -> IVF -> PQ -> IVFPQ -> graph) with the
HNSW-equivalent shape every production vector store deploys at scale:
Lucene/Elasticsearch build ONE small-world graph PER SEGMENT, search every
segment's graph independently (sublinear in segment size), and merge the
per-segment top-k exactly. That per-segment layout — not one global graph —
is the distributed-engine form of HNSW, and it maps 1:1 onto Spark:

- segment = deterministic id-hash shard (pure function of vec_id, so the
  index is identical under any physical partitioning or session config);
- graph build = one ``applyInPandas`` task per shard (numpy inside; a
  shard is bounded — at 100 TB you raise ``n_shards`` so each task stays
  ~1M vectors, build cost per task is O(n·ef·M), embarrassingly parallel);
- search = one Arrow-batched task per shard doing a greedy best-first walk
  visiting ~ef·M of the shard's vectors instead of all of them, then a
  global exact merge of the tiny per-shard candidate lists.

Everything is deterministic: insertion order, neighbor selection, and walk
expansion all break distance ties by vec_id, so the same corpus yields the
same graph and the same candidates under any partitioning (the property
the repo's PQ/IVF fits also guarantee; see similarity/pq.py _sample_rows).

Published basis: Malkov & Yashunin, "Efficient and robust approximate
nearest neighbor search using Hierarchical Navigable Small World graphs"
(IEEE TPAMI 2018) — built here as the single-layer NSW variant with a
fixed entry point, which is what per-segment sharding needs (segments are
small enough that the hierarchy's log-n hop saving is immaterial; the
sharding supplies the scale-out instead). The reference engine has no
native ANN; this extends the training-data similarity toolkit per the
brief, matching Lucene's per-segment HNSW deployment model.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redpanda_spark.functions.vectors import as_double

INDEX_SCHEMA = (
    "shard int, vec_id long, v array<double>, neighbors array<long>,"
    " n_shards int"
)
CAND_SCHEMA = "vec_id long, d double"


def _knuth_shard(id_col: str, n_shards: int) -> F.Column:
    """Shard id as a pure function of the row id (layout-independent)."""
    return F.pmod(
        F.pmod(F.col(id_col), F.lit(2147483647)) * F.lit(2654435761),
        F.lit(n_shards),
    ).cast("int")


def _greedy_search(
    x: np.ndarray,
    adj: list[list[int]],
    bound: int,
    q: np.ndarray,
    ef: int,
    allowed: np.ndarray | None = None,
) -> list[tuple[float, int]]:
    """Best-first walk over nodes [0, bound) from entry node 0.

    Returns up to ``ef`` (dist, local_idx) pairs, ascending. Ties break by
    local index (== vec_id order) everywhere, so the walk is a pure
    function of the data. ``allowed`` (tombstone mask) gates only what the
    RESULT set may contain — the walk still routes through disallowed
    nodes, the hnswlib mark_deleted semantics.
    """
    if bound <= 0:
        return []

    def ok(i: int) -> bool:
        return allowed is None or bool(allowed[i])

    d0 = float(((x[0] - q) ** 2).sum())
    visited = {0}
    cand: list[tuple[float, int]] = [(d0, 0)]  # min-heap
    # result max-heap holds (-d, -i): the root is then the worst distance
    # and, among worst-distance ties, the LARGEST index — so eviction
    # removes the larger id and "ties prefer smaller vec_id" actually
    # holds (storing (-d, i) would pop the smaller id first on ties)
    res: list[tuple[float, int]] = [(-d0, 0)] if ok(0) else []
    while cand:
        d, u = heapq.heappop(cand)
        if res and len(res) >= ef and d > -res[0][0]:
            break
        new = [w for w in adj[u] if w < bound and w not in visited]
        if not new:
            continue
        visited.update(new)
        # one vectorized distance batch per expanded node (the hot loop)
        dists = ((x[new] - q) ** 2).sum(axis=1)
        for w, dw in zip(new, dists):
            dw = float(dw)
            if (
                len(res) < ef
                or dw < -res[0][0]
                or (dw == -res[0][0] and w < -res[0][1])
            ):
                heapq.heappush(cand, (dw, w))
                if ok(w):
                    heapq.heappush(res, (-dw, -w))
                    if len(res) > ef:
                        heapq.heappop(res)
    return sorted(((-nd, -ni) for nd, ni in res))


def _select_neighbors(x: np.ndarray, node: int, cands: list[int], m: int) -> list[int]:
    """HNSW's neighbor-selection heuristic (Malkov & Yashunin, Alg. 4).

    Walking candidates nearest-first, keep one only if NO already-kept
    neighbor is closer to it than the node is — so well-separated regions
    keep their bridge edges instead of being pruned to m same-cluster
    links (distance-only pruning disconnects planted clusters and strands
    the greedy walk at the entry point's cluster). Discarded candidates
    back-fill to m (the keepPrunedConnections variant) to hold the degree.
    Ties break by index everywhere — deterministic.
    """
    uniq = sorted(set(cands) - {node})
    if len(uniq) <= m:
        return uniq
    d_node = ((x[uniq] - x[node]) ** 2).sum(axis=1)
    order = sorted(range(len(uniq)), key=lambda i: (d_node[i], uniq[i]))
    kept: list[int] = []
    discarded: list[int] = []
    for oi in order:
        c = uniq[oi]
        if len(kept) >= m:
            break
        covered = bool(
            kept
            and (((x[kept] - x[c]) ** 2).sum(axis=1) < float(d_node[oi])).any()
        )
        (discarded if covered else kept).append(c)
    for c in discarded:
        if len(kept) >= m:
            break
        kept.append(c)
    return sorted(kept)


def _insert_nodes(
    x: np.ndarray,
    adj: list[list[int]],
    start: int,
    m: int,
    ef_construction: int,
) -> None:
    """Insert nodes [start, len(x)) into an existing graph in index order.

    Each node links to m candidates chosen by the HNSW heuristic from the
    ef_construction nodes a graph search finds; links are bidirectional
    and over-full lists are re-selected (same heuristic) back to 2m.
    """
    m_max = 2 * m
    for i in range(max(start, 1), len(x)):
        found = _greedy_search(x, adj, i, x[i], ef_construction)
        links = _select_neighbors(x, i, [j for _, j in found], m)
        for j in links:
            adj[i].append(j)
            adj[j].append(i)
            if len(adj[j]) > m_max:
                adj[j] = _select_neighbors(x, j, adj[j], m_max)
        adj[i] = sorted(set(adj[i]))


def _build_shard(x: np.ndarray, m: int, ef_construction: int) -> list[list[int]]:
    """Insertion-order NSW build over one shard (rows sorted by vec_id)."""
    adj: list[list[int]] = [[] for _ in range(len(x))]
    _insert_nodes(x, adj, 0, m, ef_construction)
    return adj


def build_nsw_index(
    emb: DataFrame,
    n_shards: int | None = 4,
    m: int = 8,
    ef_construction: int = 48,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_shard_rows: int = 512,
) -> DataFrame:
    """(shard, vec_id, v, neighbors) — one NSW graph per id-hash shard.

    Neighbors hold vec_ids (not local indices) so the index is
    self-describing and survives being written/read as parquet. One build
    task per shard. ``n_shards=None`` sizes shards from the corpus count
    (one count job) at ~``target_shard_rows`` rows each, never below 4 —
    insertion cost per shard is superlinear, so bounded shards keep the
    build wall-clock flat as the corpus grows (shards build in parallel;
    at 100 TB raise target_shard_rows to ~1M and let the shard count
    carry the scale). The shard hash is a pure function of the id, so a
    given (corpus, n_shards) always yields the same index.
    """
    if n_shards is None:
        n_shards = max(4, -(-emb.count() // target_shard_rows))

    shard_count = int(n_shards)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        x = np.array(list(pdf["v"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        adj = _build_shard(x, m, ef_construction)
        return pd.DataFrame(
            {
                "shard": pdf["shard"],
                "vec_id": ids,
                "v": list(pdf["v"]),
                "neighbors": [[int(ids[j]) for j in row] for row in adj],
                "n_shards": shard_count,
            }
        )

    shards = emb.select(
        _knuth_shard(id_col, n_shards).alias("shard"),
        F.col(id_col).alias("vec_id"),
        as_double(vec_col).alias("v"),
    )
    return shards.groupBy("shard").applyInPandas(build, INDEX_SCHEMA)


def nsw_topk(
    index: DataFrame,
    query_vec: np.ndarray,
    k: int = 10,
    ef_search: int = 64,
    allow_col: str | None = None,
) -> DataFrame:
    """Search every shard's graph, merge exactly: (vec_id, d) top-k.

    Each shard task walks ~ef_search·m nodes instead of scanning the
    shard; the merge input is n_shards × ef_search rows — tiny. The final
    order is exact squared-L2 ascending, ties by vec_id.

    FILTERED SEARCH: ``allow_col`` names a boolean column on ``index``
    (join any metadata and compute the predicate with normal Spark
    expressions first); rows where it is false are treated exactly like
    tombstones — the walk still routes through them, the result set never
    contains them. This is the pre-filtered vector-search semantics
    (pgvector/qdrant "filtered ANN"): correct for any predicate, with
    recall degrading gracefully as the allowed set thins instead of the
    graph disconnecting (post-filtering would return < k; hard-filtering
    the graph would strand the walk).
    """
    # plain closure capture (the query vector is tiny); an explicit
    # sparkContext.broadcast here would leak one broadcast block per call
    # in a long-lived query service
    q = np.asarray(query_vec, dtype=np.float64)
    ef = max(ef_search, k)

    def search(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        x = np.array(list(pdf["v"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        pos = {int(v): i for i, v in enumerate(ids)}
        adj = [[pos[n] for n in row if n in pos] for row in pdf["neighbors"]]
        allowed = None
        if "deleted" in pdf.columns or allow_col is not None:
            mask = np.ones(len(pdf), dtype=bool)
            if "deleted" in pdf.columns:
                mask &= ~pdf["deleted"].to_numpy().astype(bool)
            if allow_col is not None:
                mask &= pdf[allow_col].to_numpy().astype(bool)
            allowed = mask
        found = _greedy_search(x, adj, len(x), q, ef, allowed)
        return pd.DataFrame(
            {
                "vec_id": [int(ids[i]) for _, i in found],
                "d": [d for d, _ in found],
            }
        )

    cands = index.groupBy("shard").applyInPandas(search, CAND_SCHEMA)
    return cands.orderBy(F.col("d"), F.col("vec_id")).limit(k)


def nsw_insert(
    index: DataFrame,
    new_emb: DataFrame,
    m: int = 8,
    ef_construction: int = 48,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fold new vectors into an existing index WITHOUT a full rebuild —
    the continuous-ingest sibling of ``build_nsw_index`` (same shape as
    dedup/minhash.py's incremental store: O(increment) work, stored
    structure reused).

    New ids hash to their shard with the index's own recorded shard count
    (``n_shards`` column — the index is self-describing, so the caller
    cannot desync the routing); each touched shard re-enters one
    ``applyInPandas`` task that replays ONLY the new nodes through the
    same insertion loop the builder uses (existing adjacency is loaded,
    not recomputed). Untouched shards pass through unchanged, so the cost
    is O(new vectors · ef), independent of corpus size. Deterministic:
    existing graphs are stored state, and new nodes insert in vec_id
    order with the builder's tie-breaking.
    """
    head = index.select("n_shards").first()
    if head is None:
        raise ValueError("nsw_insert: index has no rows — build_nsw_index first")
    n_shards = int(head["n_shards"])
    has_tombstones = "deleted" in index.columns
    # idempotent under redelivery: an id already indexed is dropped (the
    # at-least-once streaming case — without this, the shard's vec_id ->
    # position map would silently remap stored edges onto the duplicate
    # row and top-k could return the same id twice)
    new_emb = new_emb.join(
        index.select("vec_id").withColumnRenamed("vec_id", id_col),
        id_col,
        "left_anti",
    )
    new = new_emb.select(
        _knuth_shard(id_col, n_shards).alias("shard"),
        F.col(id_col).alias("vec_id"),
        as_double(vec_col).alias("v"),
        F.lit(None).cast("array<long>").alias("neighbors"),
        F.lit(n_shards).alias("n_shards"),
        F.lit(False).alias("deleted"),
    )
    base = index if has_tombstones else index.withColumn("deleted", F.lit(False))
    combined = base.select(
        "shard", "vec_id", "v", "neighbors", "n_shards", "deleted"
    ).unionByName(new)
    out_schema = INDEX_SCHEMA + ", deleted boolean"

    def upd(pdf: pd.DataFrame) -> pd.DataFrame:
        is_new = pdf["neighbors"].isna()
        old = pdf[~is_new].sort_values("vec_id").reset_index(drop=True)
        add = pdf[is_new].sort_values("vec_id").reset_index(drop=True)
        if len(add) == 0:
            return pdf
        ids = list(old["vec_id"]) + list(add["vec_id"])
        x = np.array(list(old["v"]) + list(add["v"]), dtype=np.float64)
        pos = {int(v): i for i, v in enumerate(ids)}
        adj = [
            [pos[n] for n in row if n in pos] for row in old["neighbors"]
        ] + [[] for _ in range(len(add))]
        _insert_nodes(x, adj, len(old), m, ef_construction)
        return pd.DataFrame(
            {
                "shard": [pdf["shard"].iloc[0]] * len(ids),
                "vec_id": ids,
                "v": list(old["v"]) + list(add["v"]),
                "neighbors": [[int(ids[j]) for j in row] for row in adj],
                "n_shards": [n_shards] * len(ids),
                "deleted": list(old["deleted"]) + [False] * len(add),
            }
        )

    result = combined.groupBy("shard").applyInPandas(upd, out_schema)
    # an index that never saw a delete keeps its lean schema
    return result if has_tombstones else result.drop("deleted")


def nsw_delete(index: DataFrame, ids_df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Soft-delete: tombstone the given ids (hnswlib ``mark_deleted`` /
    Lucene liveDocs semantics). The rows STAY in the graph as routing
    waypoints — physically removing a node also removes the paths through
    it and degrades recall for its neighborhood — but ``nsw_topk`` never
    returns them. One narrow broadcast-join pass; no graph surgery.
    Reclaim space later with ``nsw_compact``."""
    dels = ids_df.select(F.col(id_col).alias("vec_id")).distinct().withColumn(
        "_del", F.lit(True)
    )
    joined = index.join(F.broadcast(dels), "vec_id", "left")
    deleted = (
        F.coalesce(F.col("_del"), F.col("deleted"))
        if "deleted" in index.columns
        else F.coalesce(F.col("_del"), F.lit(False))
    )
    keep = [c for c in index.columns if c != "deleted"]
    return joined.select(*keep, deleted.alias("deleted"))


def nsw_compact(
    index: DataFrame, m: int = 8, ef_construction: int = 48
) -> DataFrame:
    """Physically drop tombstoned rows and rebuild each affected shard's
    graph over the survivors — the Lucene segment-merge analog. Shards
    with no tombstones pass through unchanged; rebuild cost is per-shard
    and parallel, like the original build."""
    if "deleted" not in index.columns:
        return index

    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        if not pdf["deleted"].any():
            return pdf.drop(columns=["deleted"])
        live = pdf[~pdf["deleted"]].sort_values("vec_id").reset_index(drop=True)
        x = np.array(list(live["v"]), dtype=np.float64)
        ids = live["vec_id"].to_numpy()
        adj = _build_shard(x, m, ef_construction)
        return pd.DataFrame(
            {
                "shard": live["shard"],
                "vec_id": ids,
                "v": list(live["v"]),
                "neighbors": [[int(ids[j]) for j in row] for row in adj],
                "n_shards": live["n_shards"],
            }
        )

    return index.groupBy("shard").applyInPandas(rebuild, INDEX_SCHEMA)
