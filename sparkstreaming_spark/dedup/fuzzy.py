"""Fuzzy entity matching: bounded-edit-distance name pairs.

The LLM-pipeline use: entity resolution / catalog dedup where near-equal
strings ("old widget" / "red widget") must be linked even though hashes
differ. Exact-dup and shingle ops in this package catch document-scale
duplication; this catches value-scale (name/label) duplication.

Scale shape: fuzzy matching is quadratic in the COMPARED DOMAIN, so the
operator never compares corpus rows — it first collapses to the distinct
value domain (vocabulary-sized: names, brands, labels — orders of
magnitude smaller than the corpus, and bounded by the domain's nature,
not the data volume), self-joins THAT with a cheap length-difference
prefilter (|len(a)-len(b)| > d implies edit distance > d, and length is
computed before the join so the band predicate prunes pairs pre-
levenshtein), and uses Spark's threshold form `levenshtein(a, b, d)`
which early-exits the DP once the bound is exceeded. Corpus-side
frequencies join back against the tiny pair set (broadcast).

For domains too large to self-join even when distinct (URLs, full
titles), compose with the banding ops instead (minhash/simhash over
character n-grams) — same package, same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_value_pairs(
    df: DataFrame, value_col: str, max_dist: int = 2
) -> DataFrame:
    """(val_a, val_b, dist) for distinct values within `max_dist` edits,
    val_a < val_b. Comparison domain = distinct values of `value_col`."""
    vals = df.select(F.col(value_col).alias("v")).distinct().withColumn(
        "vlen", F.length("v")
    )
    a = vals.select(F.col("v").alias("val_a"), F.col("vlen").alias("len_a"))
    b = vals.select(F.col("v").alias("val_b"), F.col("vlen").alias("len_b"))
    # threshold form early-exits; the length band prunes before it runs
    dist = F.levenshtein(F.col("val_a"), F.col("val_b"), max_dist)
    return (
        a.join(
            b,
            (F.col("val_a") < F.col("val_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_dist),
        )
        .withColumn("dist", dist)
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("val_a", "val_b", "dist")
    )
