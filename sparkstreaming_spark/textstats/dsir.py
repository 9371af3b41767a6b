"""DSIR-style data selection with importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"):
score every document by how much more likely its hashed n-gram features
are under a TARGET domain than under the SOURCE (raw) corpus, so a
100 TB crawl can be filtered toward a high-quality / in-domain slice
with one cheap bag-of-hashed-ngrams model instead of an LLM judge.

Method (public paper, re-expressed Spark-first):
1. features(doc) = unigrams + word-bigrams, hashed into `n_buckets`
   buckets (md5-based so the DuckDB oracle reproduces every bucket).
2. Two smoothed multinomials over buckets: p_target (docs matching the
   caller's target predicate) and p_source (all docs), Laplace +1.
3. log importance weight(doc) = Σ_features log(p_t(b) / p_s(b)).
   The per-bucket log-ratio is quantized to integer MICRO-NATS
   (round(ln·1e6) as bigint) so per-doc sums are order-independent
   and bit-exact across engines — the same integer-sum trick the
   suite's other float-accumulating contracts use.
4. Selection = top-k by (weight desc, id) — deterministic; resampling
   with a Gumbel/A-ES draw is available upstream via
   operators/sampling.py::weighted_hash_sample.

Scale shape (the reason this works at 100 TB): the bucket table is
bounded (`n_buckets` rows — thousands, not corpus-sized), built with
ONE hash-partitioned count shuffle carrying map-side partial counts,
then BROADCAST back to the exploded feature stream; the per-doc sum is
the second and last shuffle. Nothing corpus-sized ever sits on the
driver. Reference parity: the reference has no curation surface at all
(three KPI jobs, Consumer.scala:127-149); this is north-star extension
work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64, shingles_from_tokens, tokenize


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int = 4096,
) -> DataFrame:
    """→ (id, is_target, n_feats, weight_micro) — per-doc DSIR log
    importance weight in integer micro-nats (divide by 1e6 for nats).

    `target` is a boolean Column over `df`'s columns marking the
    target-domain exemplars (e.g. F.col("lang") == "en")."""
    base = df.select(
        F.col(id_col).alias("id"),
        target.cast("boolean").alias("is_target"),
        tokenize(F.col(text_col)).alias("toks"),
    )
    # a small-file corpus (one row group) would run the md5-per-feature
    # explode as a single task; spread it. At real scale the input has
    # many splits and this shuffle is a sub-% of the feature hashing.
    if base.rdd.getNumPartitions() < 8:
        # floor of 8 so a small-core session still honors the guard
        # threshold (ADVICE r11)
        base = base.repartition(
            max(base.sparkSession.sparkContext.defaultParallelism, 8)
        )
    # hash features straight to bucket ids and MATERIALIZE the compact
    # (id, is_target, b) stream once (lazy localCheckpoint): both
    # consumers below — the bucket-count multinomials and the per-doc
    # scoring join — would otherwise recompute tokenize+md5 over the
    # whole corpus. The materialized form is three small ints per
    # feature (no strings), i.e. the same order as the shuffle it
    # feeds; at 100 TB this is the classic spill-vs-recompute trade and
    # the spill side wins because md5-per-feature dominates.
    feats = base.select(
        "id",
        "is_target",
        F.explode(
            F.concat(F.col("toks"), shingles_from_tokens("toks", 2))
        ).alias("feat"),
    ).select(
        "id",
        "is_target",
        F.pmod(md5_64(F.col("feat")), F.lit(n_buckets)).alias("b"),
    ).localCheckpoint(eager=False)

    # ONE shuffle builds both multinomials: per-bucket source count and
    # target count (map-side partials), then the bounded table carries
    # its own totals via a scalar aggregate broadcast back onto it.
    counts = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("cs"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
    )
    totals = counts.agg(
        F.sum("cs").alias("ts"), F.sum("ct").alias("tt")
    )
    ratio = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn(
            "lr_micro",
            F.round(
                F.log(
                    ((F.col("ct") + 1) / (F.col("tt") + n_buckets))
                    / ((F.col("cs") + 1) / (F.col("ts") + n_buckets))
                )
                * 1e6
            ).cast("bigint"),
        )
        .select("b", "lr_micro")
    )

    scored = (
        feats.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr_micro").alias("weight_micro"),
        )
    )
    # docs with zero features keep a 0 weight instead of vanishing
    return (
        base.select("id", "is_target")
        .join(scored, "id", "left")
        .select(
            "id",
            "is_target",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("weight_micro", F.lit(0)).alias("weight_micro"),
        )
    )


def dsir_select_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    k: int = 50,
    n_buckets: int = 4096,
) -> DataFrame:
    """Deterministic DSIR selection: the k source docs whose hashed
    n-gram profile is most target-like — (weight desc, id) order makes
    ties reproducible. Spark plans this as TakeOrderedAndProject (no
    global sort materialization)."""
    w = dsir_importance(df, id_col, text_col, target, n_buckets=n_buckets)
    return w.orderBy(F.col("weight_micro").desc(), F.col("id")).limit(k)
