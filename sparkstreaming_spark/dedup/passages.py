"""Duplicated-passage detection — which length-L token windows appear in
MORE THAN ONE document, and how much of each document is made of them.
The passage-level complement to document-level near-dedup (minhash.py):
boilerplate headers, license blocks, and templated spans recur across
otherwise-distinct documents, and training pipelines down-weight or cut
them (the "deduplicating training data" passage-dedup pass).

Scale design: per-doc DISTINCT window hashes explode to ~tokens rows;
recurring hashes are found with one partial-aggregated groupBy(h) whose
output is filtered to count >= 2 BEFORE the join back (the dup-hash set
is a small fraction of all hashes), so the join's build side stays
small; the final reduce is one groupBy(doc). No self-join anywhere —
cost is 3 shuffles, all map-side combined, all keyed on 8-byte hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64, shingles_from_tokens, tokenize


def dup_passage_stats(
    df: DataFrame, id_col: str, text_col: str, window: int = 8, carry: list[str] | None = None
) -> DataFrame:
    """(id, carry..., n_windows, n_dup_windows, dup_fraction): per-doc
    count of distinct length-`window` token spans, how many of them also
    occur in at least one OTHER document, and their fraction (6 dp).
    Docs shorter than `window` tokens report (0, 0, 0.0)."""
    carry = carry or []
    staged = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).select(id_col, *carry, tokenize(text_col).alias("__toks"))
    win = staged.select(
        id_col,
        *carry,
        F.explode_outer(
            F.array_distinct(shingles_from_tokens("__toks", window))
        ).alias("__w"),
    ).select(id_col, *carry, md5_64(F.col("__w")).alias("h"))

    recurring = (
        win.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select("h", F.lit(1).alias("__dup"))
    )
    flagged = win.join(recurring, "h", "left")
    per_doc = flagged.groupBy(id_col, *carry).agg(
        F.count("h").alias("n_windows"),
        F.count("__dup").alias("n_dup_windows"),
    )
    return per_doc.withColumn(
        "dup_fraction",
        F.when(
            F.col("n_windows") > 0,
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        ).otherwise(F.lit(0.0)),
    )
