"""Embedding-cosine near-duplicate detection.

Exact variant: block-nested self-join with cosine filter (for modest n or
as the verify stage). Scale variant: random-hyperplane LSH — sign-bit
sketch via JVM expressions, bucket join, cosine verify on candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redpanda_spark.functions.vectors import as_double, dot, norm
from redpanda_spark.sources.tables import parallelize_narrow


def cosine_pairs_exact(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine ≥ threshold — exact O(n²)/blocked.

    Use only for ≤ ~10⁵ vectors per blocking group, or as the verify stage
    after LSH blocking (`lsh_near_dup_pairs`).
    """
    # Per-row norm hoisted as a column, scored dot/(na·nb) per pair — the
    # oracle's own formula (vs the previous normalize-then-dot, whose
    # per-element transform lambda re-evaluated the whole norm fold per
    # element: O(d²) folds per row, d× the work at embedding widths).
    # One fold per pair either way; the left side is spread across cores
    # (one-split parquet otherwise serializes the cross product).
    a = parallelize_narrow(
        emb.select(
            F.col(id_col).alias("id_a"),
            as_double(vec_col).alias("va"),
            norm(as_double(vec_col)).alias("na"),
        )
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        as_double(vec_col).alias("vb"),
        norm(as_double(vec_col)).alias("nb"),
    )
    return (
        a.crossJoin(F.broadcast(b))
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
        .where(F.col("cos") >= F.lit(threshold))
        .select("id_a", "id_b", "cos")
    )


def hyperplane_sketch(vec, planes: list[list[float]]):
    """Sign-bit sketch: bit i = 1 iff dot(vec, plane_i) > 0. JVM fold."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(x) for x in p]), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for p in planes
    ]
    packed = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        packed = packed.bitwiseOR(F.shiftleft(b, i))
    return packed


def lsh_near_dup_pairs(
    emb: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    band_bits: int = 8,
) -> DataFrame:
    """Random-hyperplane LSH blocking + exact cosine verify on candidates."""
    n_bits = len(planes)
    emb = parallelize_narrow(emb)
    # per-doc norm computed once here and carried through banding (one
    # extra double per shuffled row) instead of twice per candidate pair
    # in the verify — same fold, bit-identical rounded cosine
    sk = emb.select(
        F.col(id_col).alias("id"),
        as_double(vec_col).alias("v"),
        norm(as_double(vec_col)).alias("nv"),
        hyperplane_sketch(as_double(vec_col), planes).alias("sk"),
    )
    n_bands = max(1, n_bits // band_bits)
    mask = (1 << band_bits) - 1
    banded = sk.select(
        "id",
        "v",
        "nv",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sk"), i * band_bits).bitwiseAND(F.lit(mask))
                    for i in range(n_bands)
                ]
            )
        ).alias("band", "band_val"),
    )
    a = banded.select(
        "band",
        "band_val",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
    )
    b = banded.select(
        "band",
        "band_val",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb", "na", "nb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "cos",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
        .where(F.col("cos") >= F.lit(threshold))
        .select("id_a", "id_b", "cos")
    )
