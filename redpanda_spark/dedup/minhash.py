"""MinHash + LSH near-duplicate detection — all JVM-side expressions.

Pipeline: word-shingle → k minhashes → band signatures → bucket self-join
on (band, band_hash) → candidate pairs → exact Jaccard verify.

Performance design (matters at 100 TB):
- The k-permutation signature is ONE fold over the shingle array: each
  shingle is hashed k ways (xxhash64 with seed = permutation index) and
  folded into an elementwise-min accumulator — shingles are materialized
  once, not re-evaluated per permutation.
- The signature frame is persisted before banding: the LSH self-join reads
  it from cache instead of recomputing the signatures for each side.
- The only shuffles move (band_hash, id) pairs — never document bodies —
  and the verify join touches candidate pairs only, never O(n²).
- Pathological buckets (identical boilerplate) are capped by ``max_bucket``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from redpanda_spark.functions.text import word_shingles
from redpanda_spark.sources.tables import parallelize_narrow

_MAX_LONG = (1 << 63) - 1


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint> of length num_hashes) — single pass."""
    sh = word_shingles(F.col(text_col), shingle_n)
    init = F.array(*[F.lit(_MAX_LONG).cast("long")] * num_hashes)
    sig = F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(s, F.lit(i)) for i in range(num_hashes)]),
            lambda a, h: F.least(a, h),
        ),
    )
    return docs.select(F.col(id_col), sig.alias("sig"))


def lsh_bands(sig_df: DataFrame, id_col: str = "doc_id", bands: int = 8) -> DataFrame:
    """(id, band, band_hash): one row per signature band."""
    return sig_df.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("sig"),
                        b * (F.size(F.col("sig")) / bands).cast("int") + 1,
                        (F.size(F.col("sig")) / bands).cast("int"),
                    ).cast("string"),
                    b,
                ),
            )
        ).alias("band", "band_hash"),
    )


def candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH bucket."""
    sig = minhash_signature(docs, text_col, id_col, num_hashes, shingle_n)
    banded = lsh_bands(sig, id_col, bands).persist(StorageLevel.MEMORY_AND_DISK)
    a = banded.select("band", "band_hash", F.col(id_col).alias("id_a"))
    b = banded.select("band", "band_hash", F.col(id_col).alias("id_b"))
    sized = banded.groupBy("band", "band_hash").agg(F.count("*").alias("n"))
    ok = sized.where(F.col("n") <= F.lit(max_bucket)).select("band", "band_hash")
    a = a.join(F.broadcast(ok), ["band", "band_hash"], "left_semi")
    b = b.join(F.broadcast(ok), ["band", "band_hash"], "left_semi")
    return (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for each candidate pair."""
    sets = docs.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return (
        pairs.join(sets.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(sets.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
        .withColumn("inter", F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))))
        .withColumn(
            "union", F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - F.col("inter")
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter").cast("double") / F.col("union"), 6).alias("jaccard"),
        )
    )


def near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    **kwargs,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs above the Jaccard threshold."""
    docs = parallelize_narrow(docs)
    pairs = candidate_pairs(docs, **kwargs)
    shingle_n = kwargs.get("shingle_n", 3)
    text_col = kwargs.get("text_col", "text")
    id_col = kwargs.get("id_col", "doc_id")
    jac = jaccard_pairs(docs, pairs, text_col, id_col, shingle_n)
    return jac.where(F.col("jaccard") >= F.lit(threshold))
