"""Exact deduplication: hash-groupBy on normalized text.

One shuffle on the content hash; the hash (md5) is computed map-side in
codegen, so the exchange carries (hash, doc_id) not the document body.
At 100 TB: group keys are uniformly distributed hashes → no skew; output
is one row per distinct content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest id per distinct normalized text.

    Returns (content_hash, keep_id, n_copies); downstream `join` on keep_id
    recovers the surviving rows without re-shuffling the text bodies.
    """
    return (
        df.select(
            F.md5(normalize_text(text_col)).alias("content_hash"),
            F.col(id_col).cast("bigint").alias("id"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
