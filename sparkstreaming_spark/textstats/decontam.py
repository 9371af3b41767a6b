"""Benchmark decontamination — flag corpus documents sharing word n-grams
with a benchmark/holdout set (the standard pre-training hygiene pass:
a training doc that overlaps an eval benchmark leaks the benchmark).

Extends the reference's text surface (its only text op is the
normalize pass, FileReconstitution.scala:7-12) with the contamination
check every LLM data pipeline runs before training.

Scale design (100 TB corpus vs a small benchmark):
- the BENCHMARK side's distinct shingle-hash set is tiny (eval sets are
  thousands of docs) → broadcast; the corpus never self-joins.
- the corpus stages its token array ONCE (shingles_from_tokens contract),
  explodes per-doc-distinct shingles, resolves membership with a
  broadcast left join, and reduces with a single groupBy(doc_id) —
  exactly one shuffle, keyed by doc_id, partial-aggregated map-side.
- hashes are md5-derived 64-bit (functions/text.py::md5_64) so the
  DuckDB oracle reproduces them bit-for-bit, and so the shuffle carries
  8-byte keys instead of shingle strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64, shingles_from_tokens, tokenize


def _doc_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, carry: list[str]
) -> DataFrame:
    """(id, carry..., h) with one row per per-doc-DISTINCT shingle; docs
    with < n tokens keep one row with h NULL (explode_outer) so they
    survive into the per-doc accounting with n_shingles = 0."""
    # repartition BEFORE the CPU-heavy tokenize/shingle projections: a
    # single-file parquet table scans as one partition, serializing all
    # the regex/shingle work onto one core (same fix as dedup/minhash).
    staged = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).select(id_col, *carry, tokenize(text_col).alias("__toks"))
    sh = staged.select(
        id_col,
        *carry,
        F.explode_outer(
            F.array_distinct(shingles_from_tokens("__toks", n))
        ).alias("__shingle"),
    )
    return sh.select(
        id_col, *carry, md5_64(F.col("__shingle")).alias("h")
    )


def contamination_stats(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    carry: list[str] | None = None,
) -> DataFrame:
    """Per-document contamination accounting against `bench`:
    (id, carry..., n_shingles, n_contaminated). A doc is contaminated
    iff n_contaminated > 0 — callers threshold/aggregate as needed."""
    carry = carry or []
    corpus_sh = _doc_shingle_hashes(docs, id_col, text_col, n, carry)
    bench_sh = (
        _doc_shingle_hashes(bench, id_col, text_col, n, [])
        .where(F.col("h").isNotNull())
        .select("h")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    flagged = corpus_sh.join(F.broadcast(bench_sh), "h", "left")
    return flagged.groupBy(id_col, *carry).agg(
        F.count("h").alias("n_shingles"),
        F.count("__hit").alias("n_contaminated"),
    )
