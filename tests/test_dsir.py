"""DSIR importance-resampling tests (textstats/dsir.py): planted
domain signal ranks target-like docs first; weights are deterministic
integer micro-nats; zero-token docs survive with weight 0."""

import pandas as pd
from pyspark.sql import functions as F

from sparkstreaming_spark.textstats.dsir import dsir_importance, dsir_select_topk


def _corpus(spark):
    target_words = "quantum entangled qubit decoherence superposition".split()
    noise_words = "lorem ipsum dolor sit amet consectetur adipiscing".split()
    rows = []
    # 10 target exemplars: pure in-domain vocabulary
    for i in range(10):
        rows.append((i, " ".join(target_words * 3), True))
    # 5 in-domain source candidates (not marked target)
    for i in range(10, 15):
        rows.append((i, " ".join(target_words * 2), False))
    # 20 out-of-domain source docs
    for i in range(15, 35):
        rows.append((i, " ".join(noise_words * 3), False))
    rows.append((99, "", False))  # empty doc
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "text", "is_t"])
    )


def test_planted_signal_ranks_in_domain_first(spark):
    df = _corpus(spark)
    top = dsir_select_topk(
        df, "id", "text", F.col("is_t"), k=15, n_buckets=512
    ).collect()
    top_ids = [r["id"] for r in top]
    # the 15 in-domain docs (exemplars + unlabeled in-domain) dominate
    assert set(top_ids) == set(range(15))
    # unlabeled in-domain candidates score above every noise doc
    w = {r["id"]: r["weight_micro"] for r in dsir_importance(
        df, "id", "text", F.col("is_t"), n_buckets=512).collect()}
    assert min(w[i] for i in range(10, 15)) > max(w[i] for i in range(15, 35))


def test_weights_deterministic_across_runs(spark):
    df = _corpus(spark)
    a = sorted(dsir_importance(df, "id", "text", F.col("is_t")).collect())
    b = sorted(dsir_importance(df, "id", "text", F.col("is_t")).collect())
    assert a == b


def test_empty_doc_kept_with_zero_weight(spark):
    df = _corpus(spark)
    rows = {r["id"]: r for r in dsir_importance(
        df, "id", "text", F.col("is_t")).collect()}
    assert rows[99]["n_feats"] == 0 and rows[99]["weight_micro"] == 0


def test_no_row_python_and_broadcast_plan(spark):
    df = _corpus(spark)
    plan = dsir_importance(
        df, "id", "text", F.col("is_t")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "BroadcastExchange" in plan  # bucket table broadcast, not shuffled
