"""BM25 ranked retrieval over a document corpus — pure DataFrame ops.

The reference has no retrieval/scoring surface (its only text op is the
punctuation-strip helper, FileReconstitution.scala:7-12); this is a
north-star text-analysis operator: score every document against a term
query with Okapi BM25 and return the top-k.

Scale shape (the part that matters at 100 TB):
- postings are restricted to the QUERY'S terms *inside the token array*
  (higher-order `filter`) before explode — the per-document work is
  O(tokens), but nothing non-matching is ever generated, shuffled, or
  aggregated. Shuffle volume = matching postings only.
- document length (dl) rides along with the postings groupBy instead of
  joining a separate per-doc length table — one shuffle, not two.
- the IDF table is |query terms| numbers — computed driver-side from the
  persisted postings and folded into the scoring expression as literals
  (no join at all).
- corpus stats (N, avgdl) are a 1-row aggregate, collected once.
- final top-k is orderBy+limit → TakeOrderedAndProject (no full sort).

Scores are float64 rounded to 6 dp before ranking, doc_id tie-break —
same determinism contract as the ANN operators (knn.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """(doc_id, bm25) — top_k documents for `query_terms` under Okapi BM25
    with idf = ln(1 + (N - n + 0.5)/(n + 0.5)) (Lucene's non-negative
    variant). Documents containing no query term are not returned."""
    import math

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("__toks")
    )

    # Corpus stats are ONE row — collect them rather than cross-joining a
    # broadcast frame into two downstream plans (each crossJoin branch
    # would re-evaluate its input subtree).
    n_docs, avgdl = (
        toks.select(F.size("__toks").alias("dl"))
        .agg(F.count(F.lit(1)), F.avg("dl"))
        .first()
    )

    terms = [t.lower() for t in query_terms]
    postings = (
        toks.select(
            "doc_id",
            F.size("__toks").alias("dl"),
            F.explode(
                F.filter("__toks", lambda t: t.isin(*terms))
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
        .persist()  # reused by the idf count AND the scoring pass; small
    )

    # IDF is |query terms| numbers — compute driver-side from the persisted
    # postings and fold into the scoring expression as literals.
    n_t = {r.token: r.n for r in postings.groupBy("token").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()}
    idf_expr = None
    for t in terms:
        n = n_t.get(t, 0)
        w = math.log(1.0 + (n_docs - n + 0.5) / (n + 0.5))
        cond = F.col("token") == t
        idf_expr = (
            F.when(cond, w) if idf_expr is None else idf_expr.when(cond, w)
        )

    contrib = postings.select(
        "doc_id",
        (
            idf_expr.otherwise(0.0)
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl)))
        ).alias("c"),
    )
    out = (
        contrib.groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(top_k)
    )
    return out
