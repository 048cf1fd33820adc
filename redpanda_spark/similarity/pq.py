"""Product quantization (PQ) for embedding ANN at 100 TB.

The IVF ladder (similarity/ann.py) prunes WHICH vectors to score; PQ
shrinks HOW MUCH it costs to score one: each vector becomes m uint8 codes
(one per subvector, nearest of k codebook centroids), and a query scores a
candidate with m table lookups (ADC — asymmetric distance computation)
instead of a d-dim float dot product. 64-dim float32 → 8 bytes per vector
(32x), which is what makes billion-vector shortlists RAM-resident.

Spark-first shapes:
- codebook fit is driver-side numpy over a DETERMINISTIC id-hash sample
  (never ``df.sample``, whose output depends on partitioning — the same
  corpus must yield the same codebooks under any session config);
- encoding is one Arrow-batched pass (argmin over k=16 centroids per
  subvector);
- ADC scoring is PURE JVM: the query's m x k lookup table is a literal
  array-of-arrays and the distance is an unrolled sum of element_at
  lookups — no Python, no shuffle, whole-stage codegen keeps it in the
  scan pipeline. orderBy+limit compiles to TakeOrderedAndProject.

Published basis: Jégou et al., "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011) — the standard IVF-ADC layout every vector store
uses. The reference engine has no native ANN; this extends the repo's
training-data similarity toolkit per the brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redpanda_spark.functions.vectors import as_double


def _sample_rows(
    emb: DataFrame, vec_col: str, id_col: str, modulus: int
) -> np.ndarray:
    """Deterministic sample: ids whose Knuth hash falls in 1/modulus of the
    bucket space — a pure function of the id, identical under any
    partitioning/session (unlike df.sample)."""
    bucket = F.pmod(F.pmod(F.col(id_col), F.lit(2147483647)) * F.lit(2654435761), F.lit(modulus))
    rows = (
        emb.where(bucket == 0)
        .select(F.col(id_col).alias("i"), as_double(vec_col).alias("v"))
        # id-ordered cap: which rows survive AND their order must be pure
        # functions of the data (k-means init is order-sensitive), never
        # of the physical partitioning
        .orderBy("i")
        .limit(100_000)
        .collect()
    )
    return np.array([r["v"] for r in rows], dtype=np.float64)


def _lloyd(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Plain numpy Lloyd on a (sampled) subvector matrix; deterministic
    spread init (farthest-point from a seeded start)."""
    n = x.shape[0]
    if n <= k:
        out = np.zeros((k, x.shape[1]))
        out[: max(n, 0)] = x
        return out
    rng = np.random.default_rng(seed)
    cent = [x[int(rng.integers(n))]]
    d2 = ((x - cent[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        cent.append(x[int(np.argmax(d2))])
        d2 = np.minimum(d2, ((x - cent[-1]) ** 2).sum(axis=1))
    c = np.array(cent)
    for _ in range(iters):
        dist = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = dist.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                c[j] = x[mask].mean(axis=0)
    return c


def fit_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_modulus: int = 2,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """(m, k, d/m) codebooks — one k-means per subvector on the
    deterministic sample. Fit cost is independent of corpus size (the
    sample caps at 100k rows); at 100 TB only the modulus grows."""
    x = _sample_rows(emb, vec_col, id_col, sample_modulus)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    books = np.zeros((m, k, ds))
    for j in range(m):
        books[j] = _lloyd(x[:, j * ds : (j + 1) * ds], k, iters, seed + j)
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """(id, pq_code array<int>) — one Arrow-batched argmin pass; the
    codebooks broadcast with the serialized UDF (m*k*ds floats)."""
    m, k, ds = codebooks.shape
    books = codebooks  # captured

    @F.pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        # whole-batch vectorization: one (n, k) distance argmin per
        # subspace instead of a per-row Python loop — same pairwise ops
        # and first-min tie-break, ~10x on Arrow-sized batches
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        codes = np.empty((x.shape[0], m), dtype=np.int64)
        # Row-chunked: the (rows, k, ds) float64 broadcast temporary is
        # bounded to 512*k*ds*8 bytes (~16 MB at k=256, ds=16) regardless
        # of Arrow batch size — a full 10k-row batch would transiently
        # need ~330 MB per subspace per concurrent worker. Chunking (not
        # the matmul expansion) keeps the arithmetic, and therefore every
        # argmin tie-break, byte-identical to the reference kernel.
        step = 512
        for j in range(m):
            book = books[j][None, :, :]
            for s in range(0, x.shape[0], step):
                sub = x[s : s + step, j * ds : (j + 1) * ds]
                d2 = ((sub[:, None, :] - book) ** 2).sum(axis=2)
                codes[s : s + step, j] = d2.argmin(axis=1)
        return pd.Series([c.tolist() for c in codes])

    return emb.select(F.col(id_col), encode(as_double(vec_col)).alias(code_col))


def pq_adc_topk(
    codes: DataFrame,
    query: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """ADC top-k: approximate squared-L2 distance = sum over subvectors of
    lut[j][code[j]], lut built driver-side from the query (m x 16 floats,
    a literal — no join, no Python). Returns (id, adc_dist) ordered by
    (dist, id), limit k — TakeOrderedAndProject, no full sort."""
    m, kk, ds = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    lut = [
        [float(((codebooks[j, c] - q[j * ds : (j + 1) * ds]) ** 2).sum()) for c in range(kk)]
        for j in range(m)
    ]
    lut_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    code = F.col(code_col)
    dist = None
    for j in range(m):  # unrolled: stays inside whole-stage codegen
        term = F.element_at(
            F.element_at(lut_lit, j + 1), F.element_at(code, j + 1) + F.lit(1)
        )
        dist = term if dist is None else dist + term
    return (
        codes.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.col("adc_dist"), F.col(id_col))
        .limit(k)
    )
