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

    # query → its nprobe nearest lists, inverted to list → query indices.
    # Everything a candidate needs (centroids, probing queries, query
    # matrix) is driver-side and tiny, so the whole probe/score path fits
    # in ONE broadcast + ONE Arrow pass: assignment, probe lookup, and
    # exact scoring fused per batch. (The previous assign-join-score shape
    # shipped every vector through Arrow twice and added a join stage —
    # pure overhead, since the probe map was broadcast anyway.)
    probe_map: dict[int, list[int]] = {}
    for i in range(len(q_ids)):
        for j in np.argsort(-(Q[i] @ C.T))[:nprobe]:
            probe_map.setdefault(int(j), []).append(i)
    inv = {j: np.asarray(v, dtype="int64") for j, v in probe_map.items()}
    bc = spark.sparkContext.broadcast((C, q_ids, Q, inv))

    def assign_score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm, qi, qm, probes = bc.value
        for chunk in batches:
            ids = chunk["id"].to_numpy(dtype="int64")
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            lists = np.argmax(Xn @ cm.T, axis=1)
            out_q, out_n, out_c = [], [], []
            for j in np.unique(lists):
                qidx = probes.get(int(j))
                if qidx is None:
                    continue
                mask = lists == j
                sims = np.round(Xn[mask] @ qm[qidx].T, 6)  # (n_j, m_j)
                out_q.append(np.tile(qi[qidx], mask.sum()))
                out_n.append(np.repeat(ids[mask], len(qidx)))
                out_c.append(sims.ravel())
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    narrowed = candidates.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("v")
    ).repartition(spark.sparkContext.defaultParallelism)
    scored = narrowed.mapInPandas(
        assign_score, schema="query_id bigint, neighbor_id bigint, cosine double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    return _ranked_topk(scored, k)
