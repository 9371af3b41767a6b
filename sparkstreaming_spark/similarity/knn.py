"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:

- `brute_force_knn` (baseline): broadcast the (small) query set, cross
  join against candidates, cosine via built-in array math, per-query
  top-k via a ranking window. The candidate side streams — each
  candidate partition scores all broadcast queries independently, so the
  plan is embarrassingly parallel and shuffles only (query_id, candidate,
  sim) survivors into the window. Right answer when |queries| is small,
  any |candidates|.

- `lsh_knn` (scale path): random-hyperplane signatures (as in
  dedup/embedding.py) bucket candidates; queries probe their own bucket
  (+ optional multi-probe by flipping signature bits), exact cosine
  within bucket, top-k window. Trades recall for candidate-set size —
  the standard ANN shape when queries are also numerous.

Cosine uses double math on both sides (cast array<float> → array<double>)
so results agree with the DuckDB oracle's list_cosine_similarity on
DOUBLE[]. Rank orders by rounded similarity with id tie-break so ranking
is reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.embedding import _hyperplane
from ..functions.vectors import cosine_similarity


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rk").cast("int").alias("rk"))
    )


def brute_force_knn(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rk) — exact top-k by cosine."""
    q = queries.select(
        F.col(id_col).cast("bigint").alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).cast("bigint").alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn(
        "cosine", F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
    )
    return _ranked_topk(scored, k)


def _table_signature(vec_col: str, table: int, planes: int, dim: int) -> F.Column:
    """Signature for one hash table: `planes` sign bits from deterministic
    hyperplanes (plane index namespaced by table)."""
    sig = None
    for j in range(planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(table * planes + j, dim)])
        d = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("bigint")


def _banded(df: DataFrame, id_alias: str, vec_alias: str, vec_col: str,
            id_col: str, tables: int, planes: int, dim: int) -> DataFrame:
    sigs = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_id"),
                _table_signature(vec_col, t, planes, dim).alias("sig"),
            )
            for t in range(tables)
        ]
    )
    return df.select(
        F.col(id_col).cast("bigint").alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.explode(sigs).alias("s"),
    ).select(id_alias, vec_alias, F.col("s.table_id").alias("table_id"), F.col("s.sig").alias("sig"))


def lsh_knn(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    planes: int = 3,
    tables: int = 16,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH (OR-amplification):
    `tables` independent signatures of `planes` bits each; a candidate is
    scored if it shares ANY table's bucket with the query. Recall for a
    pair at angle θ is 1 - (1 - (1-θ/π)^planes)^tables — tune tables up
    for weakly-clustered spaces. Candidates reach the exact-cosine verify
    through equi-joins only (no cross join)."""
    dim = len(candidates.select(vec_col).first()[0])
    c = _banded(candidates, "neighbor_id", "cv", vec_col, id_col, tables, planes, dim)
    q = _banded(queries, "query_id", "qv", vec_col, id_col, tables, planes, dim)
    scored = (
        c.join(F.broadcast(q), (c.table_id == q.table_id) & (c.sig == q.sig))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .distinct()
        .withColumn("cosine", F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    return _ranked_topk(scored, k)
