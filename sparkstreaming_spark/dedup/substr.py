"""ExactSubstr substring-level dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" — the suffix-array
ExactSubstr mode, re-expressed as a distributed shingle aggregation).

Unlike the document-level modes (dedup/exact.py, dedup/minhash.py,
dedup/simhash.py), this finds verbatim ≥k-token runs that occur MORE
THAN ONCE anywhere in the corpus and reports the removable token spans
*inside* otherwise-distinct documents:

1. tokenize → positional k-token shingles (posexplode keeps the start
   index; `shingles_from_tokens` is the same staged higher-order
   expression the MinHash pipeline uses),
2. hash each shingle to a 60-bit int (md5_64 — DuckDB-identical, so the
   whole pipeline keeps a SQL oracle) and count occurrences per hash in
   ONE aggregation,
3. every occurrence of a hash with count ≥ 2 covers token span
   [pos, pos+k-1]; per document, merge overlapping/adjacent spans with
   the gaps-and-islands window (running max(end) over preceding rows)
   into maximal removable intervals.

The suffix array of the paper is a single-machine construct; the
shingle-hash aggregation finds exactly the same duplicated runs (any
duplicated run of length L ≥ k is covered by its L-k+1 duplicated
k-shingles, which merge back into the full run in step 3) at the cost
of fixing the minimum length k up front.

Scale shape (100 TB): there is NO pair join anywhere — boilerplate
shingles cannot quadratic-bomb this the way they do the inverted-index
Jaccard join (dedup/ngram.py), because a shingle occurring m times
costs O(m) rows here, not O(m²). Cost is linear in total tokens:
one hash-partitioned count shuffle + one join back on the hash + one
per-doc window. The per-doc window partitions by doc_id (bounded by
document length, never by corpus size). No driver-side state at all.
Within-doc repeats are duplicates too (count is global occurrences,
not distinct docs) — same as the paper, which dedups a self-repeating
document against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_64, shingles_from_tokens, token_count, tokenize


def _positional_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(doc_id, pos, h): 0-based token start index + 60-bit shingle hash.
    Tokens are staged into their own select so the higher-order shingle
    lambda reads a materialized array (see shingles_from_tokens)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("toks")
    )
    # single-row-group parquet would run the md5-per-shingle explode as
    # one task; spread it (no-op at real scale where inputs have splits)
    if toks.rdd.getNumPartitions() < 8:
        # floor of 8 so a small-core session still honors the guard
        # threshold (ADVICE r11)
        toks = toks.repartition(
            max(toks.sparkSession.sparkContext.defaultParallelism, 8)
        )
    return toks.select(
        "doc_id",
        F.posexplode(shingles_from_tokens("toks", k)).alias("pos", "shingle"),
    ).select("doc_id", "pos", md5_64("shingle").alias("h"))


def substr_dup_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """→ (doc_id, span_start, span_end) maximal merged token spans
    (0-based, inclusive) covered by ≥k-token runs that appear at least
    twice in the corpus. A document with no duplicated run yields no
    rows."""
    sh = _positional_shingles(df, id_col, text_col, k)
    # persist: feeds both the occurrence count and the join back.
    # Lifetime note: the return value is lazy, so this function cannot
    # unpersist — the cache is intentionally scoped to the consuming
    # query's lifetime (MEMORY_AND_DISK blocks are LRU-evictable under
    # pressure; a long-lived session that re-plans should call
    # .unpersist() on its own schedule).
    sh = sh.persist()
    dup_h = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= 2)
        .select("h")
    )
    spans = sh.join(dup_h, "h").select(
        "doc_id",
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(k - 1)).alias("e"),
    )
    # gaps-and-islands: a span starts a new island iff it begins after
    # (running max end of all earlier spans) + 1 — adjacency merges, so
    # the output is exactly the union of covered token indices.
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = spans.withColumn(
        "new_island",
        F.when(prev_e.isNull() | (F.col("s") > prev_e + 1), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def substr_dedup_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Removable-span accounting per document: → (doc_id, n_tokens,
    n_spans, dup_tokens, dup_frac). Documents without duplicated runs
    appear with zeros — the left join keeps the full corpus so the
    output is a complete curation ledger, not just the offenders.
    dup_frac is rounded to 6 dp for cross-engine hash stability."""
    spans = substr_dup_spans(df, id_col, text_col, k)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
    )
    base = df.select(
        F.col(id_col).alias("doc_id"), token_count(text_col).alias("n_tokens")
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def substr_dedup_apply(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """APPLY the dedup: → (doc_id, n_tokens, n_kept, clean_text) where
    clean_text is the document with every token inside a duplicated
    span REMOVED (the aggressive variant — all occurrences go, not
    all-but-one; the accounting ledger from substr_dedup_stats tells a
    curator what was cut). Docs with no duplicated runs pass through
    with their normalized token stream intact.

    Plan shape: the span set aggregates to ONE array per affected doc
    (equi-shuffle on doc_id), equi-joined back to the corpus; the token
    drop is an in-row higher-order filter over (token, index) — pure
    codegen, no explode of the corpus, no range join."""
    spans = substr_dup_spans(df, id_col, text_col, k)
    span_arr = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("toks")
    )
    joined = base.join(span_arr, "doc_id", "left").withColumn(
        "spans", F.coalesce("spans", F.array())
    )
    kept = F.filter(
        F.col("toks"),
        lambda tok, i: ~F.exists(
            F.col("spans"),
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )
