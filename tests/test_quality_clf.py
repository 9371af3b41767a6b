"""Quality classifier (textstats/quality_clf.py): integer-exact
training, and real learning on a separable corpus."""

import pandas as pd
from pyspark.sql import functions as F

from sparkstreaming_spark.textstats.quality_clf import (
    hashed_gram_counts,
    quality_classifier_scores,
    train_quality_classifier,
)


def _corpus(spark, n=60):
    # positives use a disjoint "curated" vocabulary -> linearly separable
    rows = []
    for i in range(n):
        if i % 2:
            words = [f"good{(i + j) % 7}" for j in range(12)]
        else:
            words = [f"bad{(i + j) % 7}" for j in range(12)]
        rows.append((i, " ".join(words), i % 2 == 1))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "curated"])
    )


def test_learns_separable_corpus(spark):
    df = _corpus(spark)
    out = quality_classifier_scores(
        df, "doc_id", "text", F.col("curated"), dim=256, iters=3
    ).collect()
    acc = sum(1 for r in out if r["pred"] == r["y"]) / len(out)
    assert acc == 1.0
    pos = [r["score_micro"] for r in out if r["y"]]
    neg = [r["score_micro"] for r in out if not r["y"]]
    assert min(pos) > max(neg)


def test_training_is_deterministic(spark):
    df = _corpus(spark)
    w1, b1 = train_quality_classifier(
        df, "doc_id", "text", F.col("curated"), dim=256, iters=2
    )
    w2, b2 = train_quality_classifier(
        df, "doc_id", "text", F.col("curated"), dim=256, iters=2
    )
    assert b1 == b2
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))


def test_iteration_one_probability_is_half(spark):
    # w0 = 0, bias0 = 0 -> p = 0.5 for every doc; with a perfectly
    # balanced corpus the first bias step is exactly zero
    df = _corpus(spark)
    _, bias = train_quality_classifier(
        df, "doc_id", "text", F.col("curated"), dim=256, iters=1
    )
    assert bias == 0


def test_hashed_gram_counts_shape(spark):
    df = _corpus(spark, n=4)
    rows = hashed_gram_counts(df, "doc_id", "text", dim=64).collect()
    assert all(0 <= r["b"] < 64 for r in rows)
    # 12 unigrams (7 distinct) + 11 bigrams per doc
    per_doc = {}
    for r in rows:
        per_doc[r["id"]] = per_doc.get(r["id"], 0) + r["cnt"]
    assert set(per_doc.values()) == {23}


def test_scores_clamped_to_micro_range(spark):
    df = _corpus(spark)
    out = quality_classifier_scores(
        df, "doc_id", "text", F.col("curated"), dim=256, iters=3
    ).collect()
    assert all(0 <= r["score_micro"] <= 1_000_000 for r in out)
