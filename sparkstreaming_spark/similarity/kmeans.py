"""Distributed k-means over an embedding column (semantic clustering).

The LLM-pipeline use: cluster a corpus's embeddings so downstream
sampling / semantic dedup / topic balancing can work per-cluster. The
reference has nothing like it; in Spark the idiomatic shape is Lloyd
iterations where the EXPENSIVE step (assignment + per-cluster partial
sums) is an embarrassingly-parallel Arrow pass and only k×dim floats per
partition ever cross the wire:

  per batch : assign = argmin ||x - c||  (one GEMM against broadcast C)
              emit (cluster, count, per-dim partial sum)   <- k rows max
  combine   : tiny groupBy on k rows per partition -> driver recenters

At 100 TB the per-iteration shuffle is k × dim × n_partitions doubles —
independent of row count — and the full vectors are read once per
iteration straight off parquet (no cache dependence, though callers may
persist the narrowed frame).

Determinism: init = evenly-strided rows of the id-ordered head sample
(same convention as ivf.py), no RNG anywhere; ties in argmin break to
the lowest cluster id (NumPy argmin). Iteration count is fixed (no
data-dependent convergence test) so results are reproducible run-to-run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import _train_centroids
from .knn import _collect_matrix


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 8,
    train_size: int = 2048,
):
    """Train k centroids (unit-normalized, spherical k-means) with
    distributed Lloyd iterations. Returns a (k, dim) NumPy array.

    Seeding reuses the driver-side sample trainer (ivf.py) for a good
    starting point, then refines over the FULL distributed dataset.
    """
    import numpy as np

    spark = df.sparkSession
    sample = df.orderBy(id_col).limit(train_size)
    _, S = _collect_matrix(sample, id_col, vec_col)
    C = _train_centroids(S, k, iters=4)

    if len(S) < train_size:
        # The limit never clipped ⇒ the sample IS the full dataset, so
        # the distributed rounds would recompute exactly what the driver
        # can: same normalized matrix, same assign/sum/renormalize update.
        # Saves ~2 Spark jobs per iteration; the distributed path below is
        # reached whenever the data can exceed the sample (the 100 TB
        # case), and computes the identical update per round.
        for _ in range(iters):
            assign = S @ C.T
            idx = assign.argmax(axis=1)
            for j in np.unique(idx):
                s = S[idx == j].sum(axis=0)
                norm = np.linalg.norm(s)
                if norm > 0:
                    C[j] = s / norm
        return C

    # One scan + one shuffle TOTAL: the narrowed vector frame is persisted
    # and reused by every Lloyd round (re-reading parquet per iteration
    # costs a scan × iters; at cluster scale persist to MEMORY_AND_DISK or
    # accept the re-scan explicitly — never silently).
    narrowed = (
        df.select(F.col(vec_col).alias("v"))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(C)

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cm = bc.value
            acc_n = np.zeros(len(cm), dtype="int64")
            acc_s = np.zeros_like(cm)
            for chunk in batches:
                X = np.stack(chunk["v"].to_numpy()).astype("float64")
                X /= np.linalg.norm(X, axis=1, keepdims=True)
                assign = np.argmax(X @ cm.T, axis=1)
                acc_n += np.bincount(assign, minlength=len(cm))
                for j in np.unique(assign):
                    acc_s[j] += X[assign == j].sum(axis=0)
            live = np.nonzero(acc_n)[0]
            if len(live):
                yield pd.DataFrame(
                    {
                        "cluster": live.astype("int32"),
                        "n": acc_n[live],
                        "s": list(acc_s[live]),
                    }
                )

        # Partials are ≤ k rows per partition — collect them raw and
        # combine in NumPy on the driver. A groupBy here would add a
        # full shuffle stage per iteration to merge k×n_partitions rows.
        parts = narrowed.mapInPandas(
            partial, schema="cluster int, n bigint, s array<double>"
        ).toPandas()
        C = C.copy()
        if len(parts):
            n_acc = np.zeros(len(C), dtype="int64")
            s_acc = np.zeros_like(C)
            np.add.at(n_acc, parts["cluster"].to_numpy(), parts["n"].to_numpy())
            np.add.at(
                s_acc, parts["cluster"].to_numpy(), np.stack(parts["s"].to_numpy())
            )
            for j in np.nonzero(n_acc)[0]:
                norm = np.linalg.norm(s_acc[j])
                if norm > 0:
                    C[j] = s_acc[j] / norm
        bc.destroy()
    narrowed.unpersist()
    return C


def kmeans_assign(
    df: DataFrame, centroids, id_col: str, vec_col: str
) -> DataFrame:
    """(id, cluster, cosine_to_centroid) for every row — one Arrow pass
    against the broadcast centroid matrix."""
    import numpy as np

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm = bc.value
        for chunk in batches:
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            sims = X @ cm.T
            assign = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {
                    "id": chunk["id"].to_numpy(dtype="int64"),
                    "cluster": assign.astype("int32"),
                    "cosine": np.round(sims[np.arange(len(X)), assign], 6),
                }
            )

    narrowed = df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("v")
    ).repartition(spark.sparkContext.defaultParallelism)
    return narrowed.mapInPandas(
        assign, schema="id bigint, cluster int, cosine double"
    )


def kmeans_cluster_profile(
    df: DataFrame, id_col: str, vec_col: str, k: int, iters: int = 8
) -> DataFrame:
    """fit + assign + per-cluster profile: (cluster, n_members, min_id,
    avg_cosine) — the aggregate view a data-curation pipeline reports."""
    C = kmeans_fit(df, id_col, vec_col, k, iters=iters)
    assigned = kmeans_assign(df, C, id_col, vec_col)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("id").alias("min_id"),
            F.round(F.avg("cosine"), 6).alias("avg_cosine"),
        )
        .orderBy("cluster")
    )
