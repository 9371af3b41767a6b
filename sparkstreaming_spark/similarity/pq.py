"""Product-quantization ANN (ADC scoring) — the memory-bandwidth lever
past SQ8: split the d-dim space into `m` subspaces, learn `ksub`
centroids per subspace (deterministic Lloyd, same discipline as
ivf.py::_train_centroids), encode every vector as m one-byte codes
(d=64, m=32 ⇒ 32 bytes/vector vs 256 for float32 — 8×; structured real embeddings tolerate coarser m), and score a
query with Asymmetric Distance Computation: one m×ksub lookup table of
subspace dot products per query, candidate score = m table lookups
summed. This is the FAISS `PQ` layout re-expressed Spark-first.

Spark shape mirrors ivf.py: codebooks train on a driver-side
deterministic sample; the (codebooks, query LUTs) tuple is one small
broadcast; encode + ADC scoring fuse into ONE Arrow mapInPandas pass
(vectorized: subspace assignment is an argmax per subspace over the
batch, the ADC sum is numpy fancy-indexing — no per-row Python). A
100 TB corpus streams through at m bytes/vector of working state.

Approximate by construction (quantization error) — no SQL oracle;
recall vs brute force is pinned in tests/test_llm_ops.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import _collect_matrix, _ranked_topk


def _train_codebooks(S, m: int, ksub: int, iters: int = 8):
    """Per-subspace deterministic Lloyd (L2): init = evenly-strided rows
    of the id-ordered sample, like ivf.py. Returns (m, ksub, dsub)."""
    import numpy as np

    n, d = S.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    books = np.empty((m, ksub, dsub))
    stride = max(1, n // ksub)
    for j in range(m):
        Sub = S[:, j * dsub : (j + 1) * dsub]
        C = Sub[::stride][:ksub].copy()
        for _ in range(iters):
            d2 = ((Sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                members = Sub[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books


def pq_knn(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m: int = 32,
    ksub: int = 64,
    train_size: int = 2048,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rk) — approximate top-k by PQ/ADC.

    `cosine` is the ADC approximation of the cosine (vectors are
    L2-normalized before encoding, queries before LUT construction)."""
    import numpy as np

    spark = candidates.sparkSession
    sample = candidates.orderBy(id_col).limit(train_size)
    _ids, S = _collect_matrix(sample, id_col, vec_col)
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    books = _train_codebooks(S, m, ksub)

    q_ids, Q = _collect_matrix(queries, id_col, vec_col)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    dsub = Q.shape[1] // m
    # per-query LUT: luts[q, j, c] = dot(q_sub_j, codebook[j][c])
    luts = np.stack(
        [
            np.einsum("qd,kd->qk", Qn[:, j * dsub : (j + 1) * dsub], books[j])
            for j in range(m)
        ],
        axis=1,
    )  # (n_q, m, ksub)
    bc = spark.sparkContext.broadcast((books, q_ids, luts))

    def encode_score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bks, qi, lut = bc.value
        mm, kk, dd = bks.shape
        for chunk in batches:
            ids = chunk["id"].to_numpy(dtype="int64")
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            # codes: (n, m) — per-subspace nearest centroid (L2)
            codes = np.empty((len(Xn), mm), dtype="int64")
            for j in range(mm):
                Sub = Xn[:, j * dd : (j + 1) * dd]
                d2 = (
                    (Sub**2).sum(axis=1, keepdims=True)
                    - 2.0 * Sub @ bks[j].T
                    + (bks[j] ** 2).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            # ADC: scores[n, q] = sum_j lut[q, j, codes[n, j]]
            # lut transposed to (m, ksub, n_q) for fancy-index gather
            lt = np.transpose(lut, (1, 2, 0))  # (m, ksub, n_q)
            scores = np.zeros((len(Xn), lut.shape[0]))
            for j in range(mm):
                scores += lt[j][codes[:, j]]  # (n, n_q)
            n_q = len(qi)
            yield pd.DataFrame(
                {
                    "query_id": np.tile(qi, len(ids)),
                    "neighbor_id": np.repeat(ids, n_q),
                    "cosine": np.round(scores, 6).ravel(),
                }
            )

    narrowed = candidates.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("v")
    )
    scored = narrowed.mapInPandas(
        encode_score, schema="query_id bigint, neighbor_id bigint, cosine double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    return _ranked_topk(scored, k)
