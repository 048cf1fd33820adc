"""PCA over an embedding column — the whitening/compaction step of a
large-scale embedding pipeline.

Scale shape (the standard distributed-PCA decomposition): the ONLY
distributed work is the d x d Gram matrix + d-vector sum reduction
(each Arrow batch contributes a numpy partial; the shuffle moves
d*d*partitions tiny rows, never vectors). The eigendecomposition is a
driver-side `numpy.linalg.eigh` of the d x d covariance — O(d^3) on 64
dims is microseconds, corpus-size-independent. Projection back over the
corpus is pure-JVM (zip_with + aggregate folds per component), so the
serve path has zero Python in it.

Gram sums are computed on 1e-3-quantized integers (round(x*1000)), so
the reduction is EXACT and partition-order-invariant — identical
components on any cluster layout (the partition-invariance discipline
of similarity/pq.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_and_sums(df: DataFrame, col: str, d: int):
    """Exact quantized Gram matrix (d x d numpy int object) and per-dim
    sums + row count from one distributed pass."""
    import numpy as np
    import pandas as pd

    def part(batches):
        acc = np.zeros((d, d), dtype=np.int64)
        s = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            x = np.stack(pdf[col].to_numpy()).astype(np.float64)
            q = np.rint(x * 1000.0).astype(np.int64)
            acc += q.T @ q
            s += q.sum(axis=0)
            n += len(q)
        iu = np.triu_indices(d)
        out = pd.DataFrame(
            {
                "i": (iu[0] + 1).astype("int32"),
                "j": (iu[1] + 1).astype("int32"),
                "partial": acc[iu],
            }
        )
        sums = pd.DataFrame(
            {"i": np.arange(1, d + 1, dtype="int32"), "j": 0, "partial": s}
        )
        cnt = pd.DataFrame({"i": [0], "j": [0], "partial": [n]})
        yield pd.concat([out, sums, cnt], ignore_index=True)

    rows = (
        df.select(col)
        .mapInPandas(part, "i int, j int, partial long")
        .groupBy("i", "j")
        .agg(F.sum(F.col("partial").cast("decimal(38,0)")).alias("v"))
        .collect()
    )
    G = np.zeros((d, d), dtype=object)
    sums = np.zeros(d, dtype=object)
    n = 0
    for r in rows:
        i, j, v = r["i"], r["j"], int(r["v"])
        if i == 0 and j == 0:
            n = v
        elif j == 0:
            sums[i - 1] = v
        else:
            G[i - 1][j - 1] = v
            G[j - 1][i - 1] = v
    return G, sums, n


def pca_components(df: DataFrame, col: str, d: int, k: int):
    """Top-k principal components (k x d float64, unit rows) of the
    quantized embedding distribution, plus the (unquantized-scale) mean.
    Sign convention: each component's largest-|coeff| entry is positive,
    so the result is deterministic up to exact eigenvalue ties."""
    import numpy as np

    G, sums, n = gram_and_sums(df, col, d)
    if n == 0:
        raise ValueError("empty embedding corpus")
    Gf = G.astype(np.float64)
    mu = sums.astype(np.float64) / n
    cov = Gf / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps, mu / 1000.0, vals[order] / 1e6


def pca_project(df: DataFrame, col: str, components, mean) -> DataFrame:
    """Project the embedding column onto the given components — pure-JVM
    fold per component (no Python in the serve path): out_k =
    sum_d (x_d - mu_d) * c_kd, appended as `pc1..pck` double columns."""
    out = df
    for kidx, comp in enumerate(components):
        arr = F.array(*[F.lit(float(c)) for c in comp])
        mu = F.array(*[F.lit(float(m)) for m in mean])
        centered = F.zip_with(
            F.col(col).cast("array<double>"), mu, lambda x, m: x - m
        )
        dot = F.aggregate(
            F.zip_with(centered, arr, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out.withColumn(f"pc{kidx + 1}", dot)
    return out
