"""MinHash + LSH near-duplicate detection.

Pipeline (all built-in expressions — no Python in the hot path):

  shingle → minhash signature → band → bucket-join → verify

1. `minhash_signatures`: explode distinct word-n-gram shingles, then ONE
   groupBy(doc) computing k min-aggregates, where hash_i(shingle) =
   md5("i:" + shingle) truncated to 60 bits. k independent hash functions
   via seed-prefixing, one shuffle total, map-side partial mins.
2. `lsh_bands`: signature → b bands of r rows; band key = md5 of the
   band's signature slice.
3. `candidate_pairs`: self-equi-join on (band_id, band_hash). This is the
   scale move: candidates come from hash-bucket joins, never an O(n²)
   cross join. Skewed buckets (boilerplate-heavy corpora) are split by
   AQE's skew-join handling.
4. `minhash_near_dup_pairs`: verify candidates with exact shingle-set
   Jaccard (array_intersect on the per-doc distinct shingle arrays).

md5 (not xxhash64) keeps every step reproducible in the DuckDB oracle
(suite/llm.py generates the equivalent SQL with the same constants).

Probability a true pair with Jaccard j becomes a candidate:
1 - (1 - j^r)^b; defaults (k=16, b=4, r=4) catch j ≳ 0.7 reliably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64, shingles


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 16, shingle_n: int = 2
) -> DataFrame:
    sh = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("shingle"),
    )
    aggs = [
        F.min(md5_64(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_perm)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_bands(sig_df: DataFrame, num_perm: int = 16, bands: int = 4) -> DataFrame:
    rows = num_perm // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"mh{b * rows + i}").cast("string") for i in range(rows)]
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sig_df.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash"))


def candidate_pairs(bands_df: DataFrame) -> DataFrame:
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Full pipeline: LSH candidates verified with exact Jaccard ≥ threshold.

    Returns (doc_a, doc_b, jaccard) with jaccard rounded to 6 dp.
    """
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_n)
    cands = candidate_pairs(lsh_bands(sigs, num_perm, bands))
    sets_df = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.array_distinct(shingles(text_col, shingle_n)).alias("sh"),
    )
    a = sets_df.alias("sa")
    b = sets_df.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
    union = F.size(F.col("sa.sh")) + F.size(F.col("sb.sh")) - inter
    return (
        cands.join(a, cands.doc_a == F.col("sa.doc_id"))
        .join(b, cands.doc_b == F.col("sb.doc_id"))
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
