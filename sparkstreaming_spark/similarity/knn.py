"""Approximate-nearest-neighbor search over an embedding column.

Two strategies, both NumPy-accelerated at the Arrow boundary (per-row
interpreted array math measured 10-50× slower — see BASELINE.md):

- `brute_force_knn` (baseline, exact): the small query set is collected,
  L2-normalized, and broadcast; candidates stream through `mapInPandas`
  in Arrow batches, each batch scoring X_batch @ Q.T with BLAS and
  emitting only its per-query top-k (selected under the FINAL ordering:
  rounded cosine desc, neighbor_id asc — so the global window over the
  k·batches survivors is exact). Shuffle volume: k rows per query per
  batch, not |C|·|Q|.

- `lsh_knn` (scale path, approximate): multi-table random-hyperplane
  signatures (OR-amplification) computed in the same NumPy pass for
  candidates and queries; candidates sharing ANY table bucket with a
  query get exact-scored, then top-k. Recall for a pair at angle θ is
  1 − (1 − (1−θ/π)^planes)^tables; defaults (3×16) give ≥0.9 on
  weakly-clustered data. Candidate discovery is an equi-join on
  (table_id, signature) — never a cross join.

Cosine is float64, rounded to 6 dp BEFORE ranking/thresholding with
neighbor-id tie-breaks, matching the DuckDB oracle's
list_cosine_similarity on DOUBLE[] (BLAS-vs-sequential summation differs
~1e-15, far below the rounding grain).

Hyperplanes are md5-derived (dedup/embedding.py::_hyperplane) so runs
are reproducible without a seed exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.embedding import _hyperplane


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rk").cast("int").alias("rk"))
    )


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    import numpy as np

    pdf = df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("v")
    ).toPandas()
    ids = pdf["id"].to_numpy(dtype="int64")
    M = np.stack(pdf["v"].to_numpy()).astype("float64")
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    return ids, M


def brute_force_knn(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rk) — exact top-k by cosine."""
    import numpy as np

    spark = candidates.sparkSession
    q_ids, Q = _collect_matrix(queries, id_col, vec_col)
    bc = spark.sparkContext.broadcast((q_ids, Q))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = bc.value
        for chunk in batches:
            c_ids = chunk["id"].to_numpy(dtype="int64")
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            sims = np.round(X @ qm.T, 6)  # (batch, nq)
            out_q, out_n, out_c = [], [], []
            for j in range(len(qi)):
                col = sims[:, j]
                ids = c_ids
                if not include_self:
                    mask = ids != qi[j]
                    col, ids = col[mask], ids[mask]
                # final ordering: cosine desc, id asc — lexsort is stable,
                # last key is primary
                order = np.lexsort((ids, -col))[:k]
                out_q.extend([qi[j]] * len(order))
                out_n.extend(ids[order])
                out_c.extend(col[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    narrowed = candidates.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("v")
    ).repartition(spark.sparkContext.defaultParallelism)
    scored = narrowed.mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    return _ranked_topk(scored, k)


def _signatures_pdf(ids, M, planes: int, tables: int):
    """(n·tables) rows of (id, table_id, sig) via one GEMM."""
    import numpy as np

    dim = M.shape[1]
    P = np.array(
        [_hyperplane(t * planes + j, dim) for t in range(tables) for j in range(planes)]
    )  # (tables*planes, dim)
    bits = (M @ P.T) > 0  # (n, tables*planes)
    weights = np.array([1 << j for j in range(planes)], dtype="int64")
    rows = {"id": [], "table_id": [], "sig": []}
    for t in range(tables):
        sig = bits[:, t * planes : (t + 1) * planes].astype("int64") @ weights
        rows["id"].extend(ids)
        rows["table_id"].extend([t] * len(ids))
        rows["sig"].extend(sig)
    return pd.DataFrame(rows)


def lsh_knn(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    planes: int = 3,
    tables: int = 16,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH."""
    import numpy as np

    spark = candidates.sparkSession
    q_ids, Q = _collect_matrix(queries, id_col, vec_col)
    q_sigs = _signatures_pdf(q_ids, Q, planes, tables)
    q_sig_df = F.broadcast(
        spark.createDataFrame(q_sigs, "id bigint, table_id int, sig bigint")
        .withColumnRenamed("id", "query_id")
    )
    bc = spark.sparkContext.broadcast((q_ids, Q))

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for chunk in batches:
            ids = chunk["id"].to_numpy(dtype="int64")
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            yield _signatures_pdf(ids, Xn, planes, tables).rename(
                columns={"id": "neighbor_id"}
            )

    narrowed = candidates.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("v")
    ).repartition(spark.sparkContext.defaultParallelism)
    c_sigs = narrowed.mapInPandas(
        sign, schema="neighbor_id bigint, table_id int, sig bigint"
    )
    cand_pairs = (
        c_sigs.join(q_sig_df, ["table_id", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # exact-score the candidate pairs: re-attach candidate vectors, score
    # each Arrow batch against the broadcast query matrix
    with_vec = cand_pairs.join(narrowed, cand_pairs.neighbor_id == narrowed.id).select(
        "query_id", "neighbor_id", "v"
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = bc.value
        qpos = {qid: i for i, qid in enumerate(qi)}
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

    scored = with_vec.mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    return _ranked_topk(scored, k)
