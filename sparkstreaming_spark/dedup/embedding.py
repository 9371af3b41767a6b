"""Embedding-cosine near-duplicate pairs.

Brute-force variant: self-join with id ordering + built-in array math —
correct but O(n²); fine to a few thousand vectors per run.

LSH variant (`embedding_near_dup_pairs(..., lsh_planes=p)`): random-
hyperplane signatures — sign of dot(v, h_j) per deterministic md5-derived
hyperplane — bucket-join on the p-bit signature, then exact cosine verify.
At 100 TB this is the only viable shape: candidates come from an
equi-join on signature, never a cross join. Hyperplanes are derived from
md5 so runs are reproducible without a seed exchange.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def _hyperplane(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from md5 bytes."""
    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{plane_idx}:{i}".encode()).digest()
        for off in range(0, 16, 2):
            if len(vals) >= dim:
                break
            u = int.from_bytes(h[off : off + 2], "big")
            vals.append(u / 32767.5 - 1.0)
        i += 1
    return vals


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    lsh_planes: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with cosine ≥ threshold."""
    base = df.select(
        F.col(id_col).cast("bigint").alias("vid"), F.col(vec_col).alias("v")
    )
    if lsh_planes:
        dim = len(base.select("v").first()["v"])
        sig = None
        for j in range(lsh_planes):
            plane = F.array(*[F.lit(x) for x in _hyperplane(j, dim)])
            d = F.aggregate(
                F.zip_with(F.col("v").cast("array<double>"), plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit = F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
            sig = bit if sig is None else sig + bit
        base = base.withColumn("sig", sig.cast("bigint"))
        a, b = base.alias("a"), base.alias("b")
        join_cond = (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vid") < F.col("b.vid"))
    else:
        a, b = base.alias("a"), base.alias("b")
        join_cond = F.col("a.vid") < F.col("b.vid")
    cos = cosine_similarity(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, join_cond)
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            "cosine",
        )
    )
