"""SimHash near-duplicate detection (60-bit, md5-derived so the DuckDB
oracle can reproduce it bit-for-bit).

`simhash_fingerprints` is one groupBy(doc) with 60 conditional-sum
aggregates — a single shuffle whose payload is 60 ints per doc, with
map-side partial sums. The per-token hash and the bit tests all run in
whole-stage codegen.

Pair finding uses the banding pigeonhole: split the 60-bit fingerprint
into `bands` equal slices; two fingerprints within Hamming distance
(bands - 1) must agree on at least one slice, so an equi-join on
(band_id, band_value) finds all such pairs without an O(n²) cross join.
Defaults (6 bands of 10 bits) guarantee recall for Hamming ≤ 5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64, tokenize

N_BITS = 60


def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    toks_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, simhash) — sign-of-weighted-bit-sum over token hashes.
    Token multiplicity weights naturally (no array_distinct).

    Repartitions first: a single small parquet file scans as one
    partition, which would serialize tokenization + 60 bit-sum aggs.
    `toks_df` optionally supplies a prebuilt (doc_id, toks) token-array
    frame (minhash.token_arrays output, ideally checkpointed) so a
    caller sharing tokenization across consumers pays it once."""
    from .minhash import token_arrays

    toks = toks_df if toks_df is not None else token_arrays(df, id_col, text_col)
    tok = toks.select(
        "doc_id",
        F.explode("toks").alias("w"),
    ).withColumn("h", md5_64(F.col("w")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), p).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{p}")
        for p in range(N_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for p in range(N_BITS):
        term = F.when(F.col(f"b{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("bigint").alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 5,
    bands: int = 6,
    toks_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming) for pairs within max_hamming.

    Guaranteed-complete only for max_hamming ≤ bands - 1 (pigeonhole);
    callers wanting a looser threshold trade recall, as usual for LSH.
    `toks_df`: see simhash_fingerprints.
    """
    assert max_hamming <= bands - 1, "pigeonhole guarantee requires max_hamming <= bands-1"
    width = N_BITS // bands
    # materialize once (lazy localCheckpoint, GC-reclaimed): the
    # fingerprint DF feeds both sides of the band self-join
    sig = simhash_fingerprints(
        df, id_col, text_col, toks_df=toks_df
    ).localCheckpoint(eager=False)
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("band_val"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "simhash", F.col("b.band_id").alias("band_id"), F.col("b.band_val").alias("band_val"))
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
