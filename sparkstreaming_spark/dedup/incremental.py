"""Incremental dedup — classify an INCOMING batch of documents against an
EXISTING corpus (the daily-crawl ingestion gate of a training-data
pipeline: before new data joins the corpus, drop what the corpus already
has, exactly or nearly).

Extends the reference's text surface (its only text op is the normalize
pass, FileReconstitution.scala:7-12); the batch-vs-corpus shape is the
incremental sibling of the whole-corpus passes in dedup/exact.py and
dedup/ngram.py.

Per incoming document the verdict is:
- ``exact``  — its normalized-text hash already exists in the corpus;
- ``near``   — not exact, but >= `near_threshold` of its distinct word
  n-gram shingles already occur somewhere in the corpus (asymmetric
  containment, the quote/subset-dup signal);
- ``new``    — everything else (including docs too short to shingle).

Scale design (100 TB corpus, incoming batch typically 1000x smaller):
- the corpus side reduces to two DISTINCT hash sets (content hashes and
  shingle hashes) — partial-aggregated map-side, shuffled as 8/16-byte
  keys, never broadcast (a 100 TB corpus's shingle set is itself huge);
- both membership checks are hash-shuffle left joins keyed on those
  hashes; the incoming batch explodes per-doc-DISTINCT shingles once and
  reduces with a single groupBy(id) — shuffles are bounded by
  O(|incoming shingles| + |corpus distinct hashes|), no self-join,
  no driver collection;
- exact dups are resolved BEFORE shingling, so the expensive
  tokenize/shingle pass runs only on the non-exact remainder;
- hashes are md5-derived (functions/text.py::md5_64) so the DuckDB
  oracle reproduces every verdict bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64, normalize_text, shingles_from_tokens, tokenize


def incremental_dedup(
    corpus: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    near_threshold: float = 0.5,
) -> DataFrame:
    """(id, status, n_shingles, n_overlap, containment) for every incoming
    row; `status` in {'exact','near','new'}, containment rounded 6dp."""
    spark = corpus.sparkSession

    corpus_hashes = (
        corpus.select(F.md5(normalize_text(text_col)).alias("__ch"))
        .distinct()
        .withColumn("__exact_hit", F.lit(1))
    )
    inc_keyed = incoming.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        F.md5(normalize_text(text_col)).alias("__ch"),
    )
    # hash-shuffle join (corpus side is distinct-reduced, NOT broadcast)
    flagged = inc_keyed.join(corpus_hashes, "__ch", "left")
    exacts = flagged.filter(F.col("__exact_hit").isNotNull()).select(
        "id",
        F.lit("exact").alias("status"),
        F.lit(0).cast("bigint").alias("n_shingles"),
        F.lit(0).cast("bigint").alias("n_overlap"),
        F.lit(0.0).alias("containment"),
    )
    remainder = flagged.filter(F.col("__exact_hit").isNull()).select("id", "__text")

    # shingle only the non-exact remainder; repartition before the
    # CPU-heavy tokenize/shingle projections (same fix as dedup/minhash)
    staged = remainder.repartition(
        spark.sparkContext.defaultParallelism
    ).select("id", tokenize("__text").alias("__toks"))
    inc_sh = staged.select(
        "id",
        F.explode_outer(
            F.array_distinct(shingles_from_tokens("__toks", n))
        ).alias("__shingle"),
    ).select("id", md5_64(F.col("__shingle")).alias("h"))

    corpus_staged = corpus.repartition(
        spark.sparkContext.defaultParallelism
    ).select(tokenize(text_col).alias("__toks"))
    corpus_sh = (
        corpus_staged.select(
            F.explode(F.array_distinct(shingles_from_tokens("__toks", n))).alias(
                "__shingle"
            )
        )
        .select(md5_64(F.col("__shingle")).alias("h"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    overlap = (
        inc_sh.join(corpus_sh, "h", "left")
        .groupBy("id")
        .agg(
            F.count("h").alias("n_shingles"),
            F.count("__hit").alias("n_overlap"),
        )
    )
    near_or_new = overlap.select(
        "id",
        F.when(
            (F.col("n_shingles") > 0)
            & (F.col("n_overlap") / F.col("n_shingles") >= near_threshold),
            F.lit("near"),
        )
        .otherwise(F.lit("new"))
        .alias("status"),
        "n_shingles",
        "n_overlap",
        # floor-based half-up rounding, not round(): a ratio of small ints
        # can land exactly on a .5 tie where engines' round() rules differ
        (
            F.floor(
                F.when(
                    F.col("n_shingles") > 0,
                    F.col("n_overlap") / F.col("n_shingles"),
                ).otherwise(F.lit(0.0))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("containment"),
    )
    return exacts.unionByName(near_or_new)
