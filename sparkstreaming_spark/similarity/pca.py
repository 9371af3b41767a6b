"""Distributed PCA profile over an embedding column.

The LLM-pipeline use: diagnose an embedding space before spending on it —
effective dimensionality (how many components carry the variance) drives
ANN index choice (similarity/ivf.py), whitening decisions, and detection
of collapsed/degenerate embedding runs.

Spark-first shape: PCA needs only the d×d covariance, and covariance is
an algebraic aggregate — each partition emits (n, sum_x[d], X^T X[d×d])
and the driver combines + eigendecomposes a d×d matrix. So the full
dataset is read ONCE in an embarrassingly-parallel Arrow pass, the
shuffle payload is d(d+1) doubles per partition (independent of row
count — at 100 TB with d=64 that is 33 KB per partition), and the O(d³)
eigensolve happens once on the driver where d is small by construction.
This is the classic "algebraic aggregate" decomposition (same family as
partial sums behind Catalyst's HashAggregate partial/final split), not a
distributed eigensolver — embedding dims (64-4096) never need one.

Determinism: partial sums are combined in NumPy float64 after a full
collect, eigenvalues come from a symmetric eigensolve (LAPACK syevd) on
the same matrix regardless of partitioning, and the output is variance
RATIOS (eigenvector sign ambiguity never surfaces). Rounded to 6 dp.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_variance_profile(
    df: DataFrame, vec_col: str, top: int = 10
) -> DataFrame:
    """(component, eigenvalue, explained_ratio, cumulative_ratio) for the
    `top` leading principal components of the embedding column."""
    import numpy as np

    spark = df.sparkSession
    narrowed = df.select(F.col(vec_col).alias("v")).repartition(
        spark.sparkContext.defaultParallelism
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for chunk in batches:
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            n += len(X)
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            g = X.T @ X if g is None else g + X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s], "g": [g.reshape(-1)]}
            )

    parts = narrowed.mapInPandas(
        partial, schema="n bigint, s array<double>, g array<double>"
    ).collect()

    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    d = len(s)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    evals = np.clip(evals, 0.0, None)
    total = evals.sum()
    ratios = evals / total if total > 0 else np.zeros_like(evals)
    cum = np.cumsum(ratios)
    k = min(top, d)
    rows = [
        (
            int(i + 1),
            float(round(evals[i], 6)),
            float(round(ratios[i], 6)),
            float(round(cum[i], 6)),
        )
        for i in range(k)
    ]
    return spark.createDataFrame(
        rows,
        "component int, eigenvalue double, explained_ratio double, "
        "cumulative_ratio double",
    )
