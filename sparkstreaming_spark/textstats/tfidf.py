"""Sparse TF-IDF cosine similarity via an inverted-index self-join.

Complements the dense-embedding near-dup path (dedup/embedding.py):
here the vectors are term-frequency vectors over n-gram shingle terms,
so similarity is lexical, not semantic — the standard "same article,
different boilerplate" detector in web-corpus curation.

Why not all-pairs: with L2-normalized sparse vectors, cosine(a,b) is
the sum of weight products over SHARED terms only, so the pair search
is an equi-join of the postings list with itself on term — cost
sum(df_t^2) over terms, not |docs|^2.  Two prunes keep that sum
bounded at 100 TB:
- df_t = 1 terms cannot produce a pair -> dropped before the join;
- df_t > max_df terms (boilerplate n-grams: headers, licence lines)
  are dropped, exactly like dedup/ngram.py's hot-shingle cap — they
  carry near-zero IDF weight but quadratic join cost.

Everything is built-in expressions (codegen) except nothing — there is
no Python in this pipeline at all; the one driver-side action is a
scalar corpus count for the IDF denominator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_from_tokens, tokenize


def pruned_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    max_df: int = 1000,
) -> DataFrame:
    """L2-normalized TF-IDF postings (doc_id, term, wn) with the df-band
    prune applied: terms with df=1 (unpairable) or df>max_df
    (boilerplate) never leave this function. The cap is THE guard that
    keeps the downstream inverted-index self-join sub-quadratic — join
    work per term is df^2, so the pair-join input obeys
    sum(C(df_t, 2)) <= kept_terms * C(max_df, 2) by construction
    (tests/test_llm_ops.py asserts the bound on a heavy-tail corpus)."""
    toks = df.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("toks"))
    terms = toks.select(
        "doc_id", F.explode(shingles_from_tokens("toks", shingle_n)).alias("term")
    )
    # tf feeds BOTH the df aggregate and the weight join; materialize it
    # once (lazy localCheckpoint: blocks are GC-reclaimed, unlike persist)
    # so the corpus-wide shingle explosion runs a single time
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )

    # Document frequency per term; prune unpairable (df=1) and boilerplate
    # (df>max_df) terms before anything expensive touches them.
    dft = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
    )
    n_docs = df.select(id_col).count()  # one scalar to the driver

    w = tf.join(dft, "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
    )
    norm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    # wn feeds both sides of the inverted-index self-join — without
    # materialization the tf->df->weight->norm chain executes twice
    return (
        w.join(norm, "doc_id")
        .filter(F.col("nrm") > 0)
        .select("doc_id", "term", (F.col("w") / F.col("nrm")).alias("wn"))
        .localCheckpoint(eager=False)
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    max_df: int = 1000,
    min_cosine: float = 0.2,
    round_scale: int = 6,
) -> DataFrame:
    """All document pairs with TF-IDF cosine >= min_cosine.

    Returns (doc_a, doc_b, cosine) with doc_a < doc_b; cosine is
    rounded to `round_scale` BEFORE the threshold filter so the kept
    row set is identical across engines (the DuckDB oracle mirrors the
    same vector space: terms with 2 <= df <= max_df, idf = ln(N/df),
    weight = tf * idf, L2-normalized per document).
    """
    wn = pruned_postings(df, id_col, text_col, shingle_n, max_df)

    a = wn.select(
        F.col("term"), F.col("doc_id").alias("doc_a"), F.col("wn").alias("wa")
    )
    b = wn.select(
        F.col("term"), F.col("doc_id").alias("doc_b"), F.col("wn").alias("wb")
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), round_scale).alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )
    return pairs
