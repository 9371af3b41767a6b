"""Persisted IVF index — build once, append increments, query many times.

The in-memory `ivf.py` path re-trains and re-assigns per query call;
amortizing that is what an *index* is for. Layout (plain parquet, no
sidecar formats):

    <index_dir>/centroids.parquet      (list_id int, centroid array<double>)
    <index_dir>/lists/list_id=<j>/...  (id bigint, v array<float>) — the
                                       inverted lists as PARTITION dirs

Why partitioning is the whole trick at 100 TB: a query probes `nprobe`
of `nlist` lists, and because the lists are hive-partition dirs the
probe becomes a `list_id IN (...)` PartitionFilter — Spark never opens
the other (nlist − nprobe)/nlist of the index files. With nlist sized so
a list ≈ a few files, query cost is O(probed bytes), independent of
corpus size. Appends assign new vectors against the SAVED centroids and
append new files into the matching partition dirs — no rewrite, no
re-train, and (because assignment is a pure function of the frozen
centroids) the index state equals a from-scratch build over the union.

Same deterministic centroid training as ivf.py (strided init over the
id-ordered sample, no RNG), so `query_ivf_index ≡ ivf_knn` bit-for-bit
when built with the same parameters — pinned by test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ivf import _train_centroids
from .knn import _collect_matrix, _ranked_topk


def _assign_lists(df: DataFrame, C) -> DataFrame:
    """(id, v, list_id): argmax-centroid assignment, one GEMM per batch."""
    import numpy as np

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(C)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm = bc.value
        for chunk in batches:
            if not len(chunk):
                continue
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            chunk = chunk.copy()
            chunk["list_id"] = np.argmax(Xn @ cm.T, axis=1).astype("int32")
            yield chunk

    return df.mapInPandas(
        assign, schema="id bigint, v array<float>, list_id int"
    )


def _narrow(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("v")
    )


def build_ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    nlist: int = 16,
    train_size: int = 2048,
) -> None:
    """Train centroids on the deterministic sample, write centroids +
    list-partitioned vectors."""
    spark = df.sparkSession
    sample = df.orderBy(id_col).limit(train_size)
    _ids, S = _collect_matrix(sample, id_col, vec_col)
    C = _train_centroids(S, nlist)
    cent_rows = [(int(j), [float(x) for x in C[j]]) for j in range(len(C))]
    spark.createDataFrame(
        cent_rows, "list_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids.parquet")
    (
        _assign_lists(_narrow(df, id_col, vec_col), C)
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{index_dir}/lists")
    )


def append_to_ivf_index(
    df: DataFrame, id_col: str, vec_col: str, index_dir: str
) -> None:
    """Assign new vectors against the FROZEN centroids and append into the
    partition dirs — centroids never move, so the post-append index is
    identical to a from-scratch build whose training sample is unchanged
    (guaranteed when the appended ids sort after the original sample)."""
    import numpy as np

    spark = df.sparkSession
    cent = spark.read.parquet(f"{index_dir}/centroids.parquet").orderBy("list_id")
    C = np.stack(
        cent.toPandas()["centroid"].to_numpy()
    ).astype("float64")
    (
        _assign_lists(_narrow(df, id_col, vec_col), C)
        .write.mode("append")
        .partitionBy("list_id")
        .parquet(f"{index_dir}/lists")
    )


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rk): probe nprobe lists per query.

    The candidate scan carries `list_id IN (union of probed lists)` —
    a PartitionFilter, so only probed partition dirs are read (plan-
    tested) — and each candidate is scored only against the queries that
    probed ITS list (the per-list query-index map rides in the same
    broadcast as the query matrix)."""
    import numpy as np

    cent = spark.read.parquet(f"{index_dir}/centroids.parquet").orderBy("list_id")
    C = np.stack(cent.toPandas()["centroid"].to_numpy()).astype("float64")
    q_ids, Q = _collect_matrix(queries, id_col, vec_col)

    probe_map: dict[int, list[int]] = {}
    for i in range(len(q_ids)):
        for j in np.argsort(-(Q[i] @ C.T))[:nprobe]:
            probe_map.setdefault(int(j), []).append(i)
    inv = {j: np.asarray(v, dtype="int64") for j, v in probe_map.items()}
    bc = spark.sparkContext.broadcast((q_ids, Q, inv))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm, probes = bc.value
        for chunk in batches:
            if not len(chunk):
                continue
            ids = chunk["id"].to_numpy(dtype="int64")
            X = np.stack(chunk["v"].to_numpy()).astype("float64")
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            lists = chunk["list_id"].to_numpy(dtype="int64")
            out_q, out_n, out_c = [], [], []
            for j in np.unique(lists):
                qidx = probes.get(int(j))
                if qidx is None:
                    continue
                mask = lists == j
                sims = np.round(Xn[mask] @ qm[qidx].T, 6)
                out_q.append(np.tile(qi[qidx], int(mask.sum())))
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

    probed = sorted(probe_map)
    candidates = spark.read.parquet(f"{index_dir}/lists").filter(
        F.col("list_id").isin(probed)
    )
    scored = candidates.mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, cosine double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    return _ranked_topk(scored, k)
