"""fastText-shape quality classifier, trained distributed and scored
in-line (the second standard curation scorer next to DSIR — the
GPT-3/CCNet recipe: train a cheap linear model to separate a curated
"positive" slice from the raw crawl, keep documents the model likes).

Model: logistic regression over MEAN-POOLED hashed bag-of-ngram
features (unigrams + word bigrams hashed into `dim` buckets — the same
md5 feature space as textstats/dsir.py; z = Σ w_b·cnt_b / Σ cnt_b,
fastText's averaging, which keeps the pre-activation in weight scale
regardless of document length), trained with batch gradient descent
for a FIXED number of iterations.

Integer micro-unit arithmetic (the suite's cross-engine convention):
weights, probabilities and gradients live in integer MICROS (1e6 = 1.0)
and the activation is the piecewise-linear "hard sigmoid"
p = clamp(0.5 + z/4, 0, 1) of quantized-ML practice, so every training
step is exact bigint arithmetic — sums are order-independent, no float
accumulation, and the DuckDB oracle replays training bit-for-bit with
the iterations unrolled as CTEs. Floor divisions are computed as
(a - pmod(a, b)) / b, which is exact under BOTH engines' truncating
integer division because the numerator is exactly divisible.

Scale shape (100 TB): per iteration ONE hash-partitioned aggregation
over the exploded feature stream (map-side partial sums) produces a
`dim`-row gradient; the weight table is `dim` rows (thousands), held on
the driver between iterations exactly like the k-means centroids
(similarity/kmeans.py) and broadcast back into the scoring join. The
feature stream is materialized once and reused by every iteration and
the final scoring pass. Nothing corpus-sized touches the driver.

Reference parity: the reference has no ML surface (Consumer.scala's six
KPI counts); this is north-star curation work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64, shingles_from_tokens, tokenize

MICRO = 1_000_000


def hashed_gram_counts(
    df: DataFrame, id_col: str, text_col: str, dim: int = 1024
) -> DataFrame:
    """→ (id, b, cnt): occurrence counts of hashed unigram+bigram
    features per document. Same feature space as DSIR; bucket ids from
    md5_64 so the SQL oracle reproduces every bucket."""
    base = df.select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("toks")
    )
    if base.rdd.getNumPartitions() < 8:
        # single-row-group parquet would hash every feature in one task;
        # floor of 8 so a small-core session still honors the guard
        # threshold (ADVICE r11)
        base = base.repartition(
            max(base.sparkSession.sparkContext.defaultParallelism, 8)
        )
    return (
        base.select(
            "id",
            F.explode(
                F.concat(F.col("toks"), shingles_from_tokens("toks", 2))
            ).alias("feat"),
        )
        .select("id", F.pmod(md5_64(F.col("feat")), F.lit(dim)).alias("b"))
        .groupBy("id", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _floor_div(a: Column, b: Column | int) -> Column:
    """Mathematical floor division in exact integer arithmetic: subtract
    the non-negative pmod first so the quotient is exactly divisible —
    immune to the truncate-vs-floor divergence between engines."""
    b = F.lit(b) if isinstance(b, int) else b
    return ((a - F.pmod(a, b)) / b).cast("bigint")


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    dim: int = 1024,
    iters: int = 3,
    feats: DataFrame | None = None,
) -> DataFrame:
    """Train the hard-sigmoid logistic model; → ((b, w_micro) weights
    DataFrame, bias_micro int).

    `label` is a boolean Column over df's columns marking the curated
    positives (e.g. F.col("source") == "src0"). Learning rate is fixed
    at 1; weights and bias start at zero, so iteration 1's p is exactly
    0.5 everywhere — a property the oracle relies on.

    `feats` optionally supplies a prebuilt (id, b, cnt) feature frame
    over df (hashed_gram_counts output, ideally checkpointed) so a
    caller that also SCORES with the model pays the corpus
    featurization pass once, not twice. Bucket ids must be non-negative
    (hashed_gram_counts' pmod guarantees [0, dim)): the bias gradient
    rides the same aggregate as a sentinel bucket b = -1, so a caller-
    supplied -1 bucket would silently fold into the bias (ADVICE r11)."""
    spark = df.sparkSession
    if feats is None:
        feats = hashed_gram_counts(df, id_col, text_col, dim).localCheckpoint(
            eager=False
        )
    labels = df.select(
        F.col(id_col).alias("id"),
        (label.cast("boolean").cast("int") * MICRO).alias("y_micro"),
    )
    n_docs = df.count()
    joined = feats.join(labels, "id")  # (id, b, cnt, y_micro)

    weights: dict[int, int] = {}
    bias = 0
    for it in range(iters):
        if it > 0:
            wdf = spark.createDataFrame(
                list(weights.items()), "b bigint, w_micro bigint"
            )
            scored = (
                joined.join(F.broadcast(wdf), "b", "left")
                .withColumn("wm", F.coalesce("w_micro", F.lit(0)))
                .groupBy("id", "y_micro")
                .agg(
                    F.sum(F.col("wm") * F.col("cnt")).alias("zs"),
                    F.sum("cnt").alias("nf"),
                )
                .withColumn("z_micro", _floor_div(F.col("zs"), F.col("nf")))
            )
        else:
            scored = joined.groupBy("id", "y_micro").agg(
                F.lit(0).cast("bigint").alias("z_micro")
            )
        p = scored.withColumn(
            "p_micro",
            F.least(
                F.lit(MICRO),
                F.greatest(
                    F.lit(0),
                    F.lit(MICRO // 2)
                    + _floor_div(F.col("z_micro") + F.lit(bias), 4),
                ),
            ).cast("bigint"),
        ).persist()
        # ONE job per iteration: the bias gradient Σ_doc (p − y) rides the
        # per-bucket gradient aggregate as a sentinel bucket b = −1 (real
        # buckets are pmod(..) ∈ [0, dim)), so the collect returns ≤ dim+1
        # rows and the old separate bias job disappears. Python `//` is
        # mathematical floor on exact bigints — identical arithmetic to
        # the previous Spark-side _floor_div per bucket.
        contrib = (
            joined.join(
                p.select("id", "p_micro", F.col("y_micro").alias("ym")), "id"
            )
            .select(
                "b",
                ((F.col("p_micro") - F.col("ym")) * F.col("cnt")).alias("c"),
            )
        )
        bias_contrib = p.select(
            F.lit(-1).cast("bigint").alias("b"),
            (F.col("p_micro") - F.col("y_micro")).alias("c"),
        )
        grad = (
            contrib.unionByName(bias_contrib)
            .groupBy("b")
            .agg(F.sum("c").alias("gs"))
        )
        # dim-bounded collect (<= `dim`+1 rows) — the k-means-centroid
        # pattern, not a hot-path corpus collect
        for row in grad.collect():
            if row["b"] == -1:
                bias -= row["gs"] // n_docs
            else:
                weights[row["b"]] = (
                    weights.get(row["b"], 0) - row["gs"] // n_docs
                )
        p.unpersist()

    return (
        spark.createDataFrame(
            sorted(weights.items()), "b bigint, w_micro bigint"
        ),
        bias,
    )


def quality_classifier_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    dim: int = 1024,
    iters: int = 3,
) -> DataFrame:
    """Train on the corpus, then score every document with the final
    model: → (id, y, score_micro, pred). score_micro is the hard-sigmoid
    probability in micros; pred = score >= 0.5. Docs whose features all
    hash to zero-weight buckets score at the bias point.

    The feature frame is built and checkpointed ONCE and shared between
    the training iterations and the final scoring join — previously the
    scorer re-ran the full tokenize+hash+aggregate corpus pass that
    training had already materialized."""
    feats = hashed_gram_counts(df, id_col, text_col, dim).localCheckpoint(
        eager=False
    )
    weights, bias = train_quality_classifier(
        df, id_col, text_col, label, dim=dim, iters=iters, feats=feats
    )
    z = (
        feats.join(F.broadcast(weights), "b", "left")
        .withColumn("wm", F.coalesce("w_micro", F.lit(0)))
        .groupBy("id")
        .agg(
            F.sum(F.col("wm") * F.col("cnt")).alias("zs"),
            F.sum("cnt").alias("nf"),
        )
        .withColumn("z_micro", _floor_div(F.col("zs"), F.col("nf")))
    )
    base = df.select(
        F.col(id_col).alias("id"), label.cast("boolean").alias("y")
    )
    return (
        base.join(z, "id", "left")
        .withColumn("zm", F.coalesce("z_micro", F.lit(0)))
        .withColumn(
            "score_micro",
            F.least(
                F.lit(MICRO),
                F.greatest(
                    F.lit(0),
                    F.lit(MICRO // 2)
                    + _floor_div(F.col("zm") + F.lit(bias), 4),
                ),
            ).cast("bigint"),
        )
        .select(
            "id",
            "y",
            "score_micro",
            (F.col("score_micro") >= MICRO // 2).alias("pred"),
        )
    )
