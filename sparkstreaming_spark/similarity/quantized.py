"""Scalar-quantized (int8) ANN scoring — the bandwidth lever for
embedding search at corpus scale.

Exact float32 brute force (knn.py) moves 4 bytes/dim/vector through
scan, Arrow, and cache; SQ8 stores each vector as int8 codes plus one
scale — 4× less of everything, which at 100 TB of embeddings is usually
the difference between a scan-bound and a compute-bound search. Recall
loss is bounded and small (quantization noise ~0.3% of the value range
per dim); the standard production recipe is SQ8 candidate scoring with
optional float re-ranking of the short list.

Spark-first shape mirrors knn.py: quantization is one codegen'd column
expression pass (array ops, no Python); scoring is one mapInPandas GEMM
against the broadcast QUANTIZED query matrix, accumulated in int32 (the
int8 codes are widened to int32 before the matmul — int8×int8 products
up to 127² with dim-many summands need 32-bit accumulators, the same
layout a SIMD dot-product kernel uses). Per-vector scales cancel in
cosine (cos = codes·qcodes / (|codes||qcodes|)), so normalization is the
only float math. Composes with the IVF list-pruning in ivf.py (quantize
within lists) — kept separate here so each lever is independently
testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_sq8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, scale, codes array<tinyint>): v ≈ scale · codes, with
    scale = max|v_i| / 127 per vector (symmetric scalar quantization).
    Pure column expressions — stays JVM-side."""
    amax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        scale.alias("scale"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x / scale).cast("tinyint")
        ).alias("codes"),
    )


def sq8_knn(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rk): top-k by cosine computed on
    SQ8 codes both sides. Queries are quantized with the same symmetric
    scheme before broadcast; the GEMM runs in int32, and the per-vector
    scales cancel out of cosine so only the norm division is float."""
    import numpy as np

    from .knn import _collect_matrix

    spark = candidates.sparkSession
    q_ids, Q = _collect_matrix(queries, id_col, vec_col)
    # symmetric per-query SQ8: qc = round(q / (max|q|/127)), int8
    q_amax = np.abs(Q).max(axis=1)
    q_amax[q_amax == 0] = 1.0
    Qc = np.round(Q / (q_amax[:, None] / 127.0)).astype("int8")
    bc = spark.sparkContext.broadcast((q_ids, Qc))

    sq = quantize_sq8(candidates, id_col, vec_col).repartition(
        spark.sparkContext.defaultParallelism
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_, Qc_ = bc.value
        qi32 = Qc_.astype("int32")
        q_norms = np.sqrt((qi32 * qi32).sum(axis=1).astype("float64"))
        q_norms[q_norms == 0] = 1.0
        for chunk in batches:
            codes = np.stack(chunk["codes"].to_numpy()).astype("int32")
            ids = chunk["id"].to_numpy(dtype="int64")
            # int32-accumulated GEMM; scales cancel in cosine
            dots = codes @ qi32.T
            norms = np.sqrt((codes * codes).sum(axis=1).astype("float64"))
            norms[norms == 0] = 1.0
            sims = dots / norms[:, None] / q_norms[None, :]
            # per-chunk LOCAL top-k (the brute_force_knn shape): the
            # global top-k is a subset of the per-chunk top-k's, so the
            # downstream rank window sorts k·n_chunks rows per query
            # instead of the full candidate set — at corpus scale the
            # difference between shuffling k rows/task and everything
            out_q, out_n, out_c = [], [], []
            for qi, qid in enumerate(q_ids_):
                mask = ids != qid
                col = np.round(sims[mask, qi], 6)
                cand = ids[mask]
                order = np.lexsort((cand, -col))[:k]
                out_q.extend([qid] * len(order))
                out_n.extend(cand[order])
                out_c.extend(col[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    scored = sq.mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rk").cast("int").alias("rk"))
    )


def sq8_rerank_knn(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    shortlist: int = 50,
) -> DataFrame:
    """Two-stage retrieval: SQ8 coarse shortlist -> exact full-precision
    rerank — the standard production ANN shape.

    Stage 1 (cheap, whole-corpus): sq8_knn scans int8 codes (4x less
    bandwidth than float32) and keeps a `shortlist`-deep candidate set
    per query. Stage 2 (exact, tiny): join the shortlist pairs back to
    the full-precision vectors — a broadcast-able frame of
    n_queries x shortlist rows, NOT the corpus — recompute exact cosine,
    re-rank, keep top-k. Final scores are bit-identical to brute force
    for every pair the shortlist retained, so rerank converts stage-1's
    score error into (bounded) recall error only; recall@k is pinned >=
    the sq8-only path by test.

    At 100 TB: stage 1 is the only corpus scan; stage 2's join key set
    (the shortlist ids) broadcasts, so the full-precision vectors are
    fetched by a broadcast semi-join probe rather than a shuffle."""
    from pyspark.sql import Window

    coarse = sq8_knn(candidates, queries, id_col, vec_col, k=shortlist)
    pairs = coarse.select("query_id", "neighbor_id")
    vecs = candidates.select(
        F.col(id_col).cast("bigint").alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
    )
    qvecs = queries.select(
        F.col(id_col).cast("bigint").alias("query_id"),
        F.col(vec_col).alias("qv"),
    )
    # exact cosine via codegen'd higher-order funcs on the tiny pair frame
    dot = F.aggregate(
        F.zip_with("qv", "nv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    exact = (
        pairs.join(F.broadcast(qvecs), "query_id")
        .join(vecs, "neighbor_id")
        .withColumn(
            "cosine", F.round(dot / (norm(F.col("qv")) * norm(F.col("nv"))), 6)
        )
        .drop("qv", "nv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "neighbor_id", "cosine", F.col("rk").cast("int").alias("rk")
        )
    )
