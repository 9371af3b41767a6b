"""MinHash + LSH near-duplicate detection.

Pipeline (all built-in expressions — no Python in the hot path):

  shingle → minhash signature → band → bucket-join → verify

1. `minhash_signatures`: explode distinct word-n-gram shingles, hash each
   ONCE (md5 → 60-bit int), then ONE groupBy(doc) computing k min-
   aggregates over affine permutations h_i = (a_i·(h mod P) + b_i) mod P
   (P = 2³¹−1; a_i,b_i deterministic — `minhash_params`). One shuffle,
   map-side partial mins, one md5 per shingle instead of k.
2. `lsh_bands`: signature → b bands of r rows; band key = md5 of the
   band's signature slice.
3. `candidate_pairs`: self-equi-join on (band_id, band_hash). The scale
   move: candidates come from hash-bucket joins, never an O(n²) cross
   join. Skewed buckets (boilerplate-heavy corpora) split by AQE.
4. `minhash_near_dup_pairs`: verify candidates with exact shingle-set
   Jaccard (array_intersect on per-doc distinct shingle arrays).

md5 (not xxhash64) keeps every step reproducible in the DuckDB oracle
(suite/llm.py generates equivalent SQL from the same constants).

Small-input parallelism: a single parquet file scans as ONE partition,
serializing the (CPU-heavy) shingling; `minhash_signatures` repartitions
to the session default parallelism first. At real scale the input is
already many partitions and the repartition coalesces to a no-op-sized
shuffle of raw doc pointers.

Probability a true pair with Jaccard j becomes a candidate:
1 − (1 − j^r)^b; defaults (k=16, b=4, r=4) catch j ≳ 0.7 reliably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64, shingles_from_tokens, tokenize

MERSENNE_P = (1 << 31) - 1  # 2^31 - 1, prime


def token_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, toks: array<string>) — the tokenized corpus, spread over
    the default parallelism. The shared entry point for pipelines that
    feed SEVERAL tokenization consumers (e.g. doc_dedup_eval's exact-
    Jaccard truth leg + SimHash prediction leg): build this once,
    `localCheckpoint(eager=False)` it, and pass it to each consumer's
    `toks_df` parameter so the corpus is tokenized once, not per leg."""
    return _parallel(df).select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        tokenize(text_col).alias("toks"),
    )


def _shingle_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    toks_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sh: array<string>) — distinct shingle sets, with the token
    array STAGED in its own select so interpreted lambdas read a row value
    instead of re-running tokenization per shingle (see
    functions/text.py::shingles_from_tokens)."""
    toks = toks_df if toks_df is not None else token_arrays(df, id_col, text_col)
    return toks.select(
        "doc_id", F.array_distinct(shingles_from_tokens("toks", n)).alias("sh")
    )


def minhash_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation constants (a_i, b_i), shared with
    the SQL-oracle generator. Knuth-style multiplicative mixing keeps them
    well spread; a_i != 0 mod P."""
    params = []
    for i in range(num_perm):
        a = (2654435761 * (2 * i + 1)) % MERSENNE_P
        b = (40503 * (i + 1) * 65537 + 17) % MERSENNE_P
        params.append((a or 1, b))
    return params


def _parallel(df: DataFrame) -> DataFrame:
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _explode_shingles(sets_df: DataFrame) -> DataFrame:
    """explode the shingle-set column WITHOUT triggering Catalyst's
    InferFiltersFromGenerate: plain explode makes the optimizer infer
    `size(sh) > 0` and push it below the staging projections, inlining
    the full tokenize+shingle expression into a per-row filter — which
    reintroduces the quadratic re-evaluation the staging exists to avoid
    (measured: 450 s vs 5 s at 50 k docs). explode_outer infers no such
    filter; the null rows (empty shingle sets) are dropped by a cheap
    attribute filter instead."""
    return sets_df.select(
        "doc_id", F.explode_outer("sh").alias("shingle")
    ).filter(F.col("shingle").isNotNull())


def signatures_from_sets(sets_df: DataFrame, num_perm: int = 16) -> DataFrame:
    """Signatures from an already-built (doc_id, sh) shingle-set frame —
    lets one (persisted) shingle pass feed both the signature lineage and
    the exact-Jaccard verify join."""
    sh = _explode_shingles(sets_df).withColumn(
        "h", md5_64(F.col("shingle")) % F.lit(MERSENNE_P)
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_params(num_perm))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 16, shingle_n: int = 2
) -> DataFrame:
    return signatures_from_sets(
        _shingle_sets(df, id_col, text_col, shingle_n), num_perm
    )


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
    ONE shingle pass: the shingle-set frame is materialized once (lazy
    localCheckpoint — blocks are GC-reclaimed when the frame goes out of
    scope, unlike CacheManager-pinned persist) and feeds the signature
    lineage, the band self-join, AND the exact-Jaccard verify join —
    without it Spark would re-run tokenize+shingle once per consumer
    (three times total).
    """
    sets_df = _shingle_sets(df, id_col, text_col, shingle_n).localCheckpoint(
        eager=False
    )
    sigs = signatures_from_sets(sets_df, num_perm).localCheckpoint(eager=False)
    cands = candidate_pairs(lsh_bands(sigs, num_perm, bands))
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
