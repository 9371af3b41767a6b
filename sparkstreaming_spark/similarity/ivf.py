"""IVF (inverted-file) ANN index — the centroid-bucketed scale path.

Classic IVF-Flat: k-means centroids partition the vector space; each
vector is assigned to its nearest centroid (the "inverted list"); a
query probes only the `nprobe` nearest centroids' lists and exact-scores
those candidates. Complements the hyperplane-LSH variant: IVF adapts to
the data distribution (centroids follow density), LSH is oblivious.

Spark shape:
- centroids are trained on a driver-side SAMPLE (deterministic
  `df.limit(train_size)` after id sort — reproducible without RNG state)
  with a few Lloyd iterations in NumPy; the centroid matrix is tiny
  (nlist × dim) and broadcast.
- assignment is one GEMM per Arrow batch (mapInPandas): list_id =
  argmax centroid similarity. At 100 TB the assignment pass is
  embarrassingly parallel and the inverted lists live as a partitioned
  column — no shuffle until the (small) candidate scoring.
- queries probe their nprobe nearest lists via an equi-join on list_id,
  then exact cosine + top-k (same ranked-window contract as knn.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import _collect_matrix, _ranked_topk


def _train_centroids(M, nlist: int, iters: int = 8):
    """Deterministic Lloyd iterations: init = evenly-strided rows of the
    (id-ordered) sample — no RNG, reproducible across runs."""
    import numpy as np

    stride = max(1, len(M) // nlist)
    C = M[::stride][:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        for j in range(len(C)):
            members = M[assign == j]
            if len(members):
                c = members.sum(axis=0)
                norm = np.linalg.norm(c)
                if norm > 0:
                    C[j] = c / norm
    return C


def ivf_knn(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_size: int = 2048,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rk) — approximate top-k via IVF."""
    import numpy as np

    spark = candidates.sparkSession
    sample = candidates.orderBy(id_col).limit(train_size)
    s_ids, S = _collect_matrix(sample, id_col, vec_col)
    C = _train_centroids(S, nlist)
    q_ids, Q = _collect_matrix(queries, id_col, vec_col)
    bc = spark.sparkContext.broadcast((C, q_ids, Q))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm, _, _ = bc.value
        for chunk in batches:
            ids = chunk["id"].to_numpy(dtype="int64")
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            lists = np.argmax(Xn @ cm.T, axis=1).astype("int32")
            yield pd.DataFrame({"id": ids, "list_id": lists, "v": chunk["v"]})

    narrowed = candidates.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("v")
    ).repartition(spark.sparkContext.defaultParallelism)
    assigned = narrowed.mapInPandas(
        assign, schema="id bigint, list_id int, v array<float>"
    )

    # query → its nprobe nearest lists (driver-side: queries are small)
    probe_rows = []
    for i, qid in enumerate(q_ids):
        top_lists = np.argsort(-(Q[i] @ C.T))[:nprobe]
        probe_rows.extend((int(qid), int(l)) for l in top_lists)
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "query_id bigint, list_id int")
    )

    cand_pairs = (
        assigned.join(probes, "list_id")
        .filter(F.col("query_id") != F.col("id"))
        .select("query_id", F.col("id").alias("neighbor_id"), "v")
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _, qi, qm = bc.value
        qpos = {q: i for i, q in enumerate(qi)}
        for chunk in batches:
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            qidx = chunk["query_id"].map(qpos).to_numpy(dtype="int64")
            sims = np.round(np.einsum("ij,ij->i", X, qm[qidx]), 6)
            yield pd.DataFrame(
                {
                    "query_id": chunk["query_id"].to_numpy(dtype="int64"),
                    "neighbor_id": chunk["neighbor_id"].to_numpy(dtype="int64"),
                    "cosine": sims,
                }
            )

    scored = cand_pairs.mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    return _ranked_topk(scored, k)
