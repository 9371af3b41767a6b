"""SemDeDup-style semantic deduplication — drop near-duplicate embeddings
WITHIN pre-assigned clusters (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540:
k-means-cluster the corpus embeddings, then prune pairs above a cosine
threshold inside each cluster only — clustering turns the O(n^2) corpus
problem into sum of per-cluster problems).

Semantics here: a vector is DROPPED iff some SMALLER-ID vector in the same
cluster has cosine >= threshold with it (min-id domination). Deterministic
and order-free, so it carries a bit-exact DuckDB oracle; it prunes a
superset of the sequential greedy SemDeDup scan (which compares only
against previously-KEPT vectors), and the surviving set provably contains
no intra-cluster pair above the threshold.

Scale design (100 TB corpus, clusters from similarity/kmeans.py):
- ONE shuffle, keyed by cluster id; each cluster is one applyInPandas
  group running a single BLAS GEMM — per-task memory is O(|cluster|^2)
  floats, which is exactly the SemDeDup contract (pick k so clusters fit;
  the paper uses k ~ sqrt(n));
- `max_cluster_size` fails loudly instead of silently OOMing a task; for
  a degenerate giant cluster, fall back to
  dedup/embedding.py::embedding_near_dup_pairs (blocked block-pair GEMM)
  restricted to that cluster;
- cosines are float64 rounded to 6 dp BEFORE thresholding/max, matching
  the DuckDB oracle (BLAS-vs-sequential summation differs ~1e-15, far
  below the rounding grain);
- no driver collection anywhere.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semantic_dedup_dropped(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    threshold: float = 0.9,
    max_cluster_size: int = 100_000,
) -> DataFrame:
    """(id, cluster, best_dup_cos) for every vector DROPPED by min-id
    domination: best_dup_cos = max cosine to any smaller-id same-cluster
    vector, emitted only when >= threshold. Survivors = df anti-join this."""
    import numpy as np

    base = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(cluster_col).alias("cluster"),
        F.col(vec_col).alias("v"),
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_cluster_size:
            raise ValueError(
                f"cluster {pdf['cluster'].iloc[0]!r} has {n} vectors "
                f"(> max_cluster_size={max_cluster_size}); re-cluster with "
                "larger k or use embedding_near_dup_pairs (blocked) for it"
            )
        if n < 2:
            return pd.DataFrame(
                {"id": [], "cluster": [], "best_dup_cos": []}
            ).astype({"id": "int64", "cluster": pdf["cluster"].dtype, "best_dup_cos": "float64"})
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        M = np.stack(pdf["v"].to_numpy()[order]).astype("float64")
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        M /= norms
        sims = np.round(M @ M.T, 6)
        # column j: max over strictly-smaller-id rows i < j
        smaller = np.tril(np.ones((n, n), dtype=bool), k=-1).T
        masked = np.where(smaller, sims, -np.inf)
        best = masked.max(axis=0)
        drop = best >= threshold
        return pd.DataFrame(
            {
                "id": ids[drop],
                "cluster": pdf["cluster"].to_numpy()[order][drop],
                "best_dup_cos": best[drop],
            }
        )

    out_cluster_type = dict(base.dtypes)["cluster"]
    return base.groupBy("cluster").applyInPandas(
        prune, schema=f"id bigint, cluster {out_cluster_type}, best_dup_cos double"
    )
