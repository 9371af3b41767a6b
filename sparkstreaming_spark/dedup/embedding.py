"""Embedding-cosine near-duplicate pairs.

Brute-force variant: blocked matrix multiply. The candidate side streams
through `mapInPandas` in Arrow batches; the comparison side is an
L2-normalized NumPy matrix shipped once per executor via
`SparkContext.broadcast`. Each task computes X_block @ M.T with BLAS —
the vectorized "Pandas-UDF slow path done right": per-row JVM
higher-order-function evaluation of a 64-dim dot product is interpreted
(not codegen) and ~100× slower than one BLAS GEMM per batch.

Scale shape: all-pairs-above-threshold fundamentally requires comparing
every block against every block; this implementation broadcasts the full
matrix, which holds to ~10⁶ vectors (64-dim float64 ≈ 0.5 GB). Beyond
that, switch to `lsh_planes=...`: random-hyperplane signatures bucket the
vectors and the pair search becomes a signature equi-join + in-bucket
verify — no broadcast of the full matrix, no cross join.

Results are deterministic: cosine in float64, rounded to 6 dp before the
threshold, matching the DuckDB oracle (BLAS vs sequential summation
differ at ~1e-15, far below the rounding grain).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    """(id_a, id_b, cosine) for pairs with cosine ≥ threshold, id_a < id_b."""
    import numpy as np

    spark = df.sparkSession
    base = df.select(
        F.col(id_col).cast("bigint").alias("vid"), F.col(vec_col).alias("v")
    )

    if lsh_planes:
        return _lsh_pairs(base, threshold, lsh_planes)

    pdf = base.toPandas()
    ids = pdf["vid"].to_numpy(dtype="int64")
    M = np.stack(pdf["v"].to_numpy()).astype("float64")
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, M))

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_m = bc.value
        for chunk in batches:
            x_ids = chunk["vid"].to_numpy(dtype="int64")
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            sims = np.round(X @ all_m.T, 6)
            rows_i, cols_j = np.nonzero(
                (sims >= threshold) & (x_ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": x_ids[rows_i],
                    "id_b": all_ids[cols_j],
                    "cosine": sims[rows_i, cols_j],
                }
            )

    many = base.repartition(spark.sparkContext.defaultParallelism)
    return many.mapInPandas(block, schema="id_a bigint, id_b bigint, cosine double")


def _lsh_pairs(base: DataFrame, threshold: float, planes: int) -> DataFrame:
    """Signature-bucketed pair search (approximate): equi-join on the
    hyperplane sign signature, exact cosine verify inside buckets."""
    from ..functions.vectors import cosine_similarity

    dim = len(base.select("v").first()["v"])
    sig = None
    for j in range(planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(j, dim)])
        d = F.aggregate(
            F.zip_with(F.col("v").cast("array<double>"), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    banded = base.withColumn("sig", sig.cast("bigint"))
    a, b = banded.alias("a"), banded.alias("b")
    cos = cosine_similarity(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vid") < F.col("b.vid")))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            "cosine",
        )
    )
