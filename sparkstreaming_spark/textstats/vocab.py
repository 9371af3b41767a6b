"""Deterministic vocabulary construction / categorical encoding.

Tokenizer training starts from a frequency-ranked vocabulary with
stable integer ids; feature pipelines need the same for categorical
columns (StringIndexer semantics, but reproducible across runs and
engines).  Ids are assigned by (df DESC, token ASC) — a TOTAL order, so
the mapping is a pure function of the corpus, not of partitioning.

Scale shape: the corpus-sized work is the token explode + groupBy (one
shuffle, partial-aggregated).  The ranking window runs over the
DISTINCT-TERM table, which is orders of magnitude smaller than the
corpus (vocabulary grows ~Heaps' law, |V| ~ n^0.5); a single-partition
sort of the vocabulary is the textbook trade every indexer makes.  For
a vocabulary that itself outgrows one task, swap the row_number window
for a range-partitioned sort + per-partition offset (zipWithIndex
shape) — the API contract (same total order) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize


def vocab_encode(
    df: DataFrame, text_col: str, min_df: int = 2, max_vocab: int | None = None
) -> DataFrame:
    """Build (token, token_id, df) from a text column.

    df counts DOCUMENTS containing the token (not occurrences), the
    quantity tokenizer training thresholds on.  token_id is 1-based in
    (df DESC, token ASC) order; `max_vocab` truncates to the top-k ids.
    """
    # Count each document once per token: in-row array_distinct BEFORE the
    # explode, so no (doc_id, token) distinct shuffle is ever needed —
    # the dedup happens inside the row, for free, and the only shuffle is
    # the token groupBy (partial-aggregated).
    per_doc = df.select(F.array_distinct(tokenize(text_col)).alias("toks")).select(
        F.explode("toks").alias("token")
    ).filter(F.col("token") != "")
    dft = per_doc.groupBy("token").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") >= min_df
    )
    w = Window.orderBy(F.col("df").desc(), F.col("token").asc())
    out = dft.select(
        "token", F.row_number().over(w).alias("token_id"), "df"
    )
    if max_vocab is not None:
        out = out.filter(F.col("token_id") <= max_vocab)
    return out
