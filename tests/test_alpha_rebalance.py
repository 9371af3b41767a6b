"""Alpha-sampling rebalance tests (operators/sampling.py)."""

import pandas as pd
from pyspark.sql import functions as F

from sparkstreaming_spark.operators.sampling import alpha_rebalance


def _corpus(spark):
    rows = [(i, "en" if i < 800 else ("de" if i < 900 else "fi"))
            for i in range(1000)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "lang"]))


def test_alpha_flattens_shares(spark):
    df = _corpus(spark)
    sel = alpha_rebalance(df, "id", "lang", total=300, alpha=0.3)
    got = {r["lang"]: r["cnt"] for r in
           sel.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    # raw shares are 80/10/10%; alpha=0.3 must pull en far below 80%
    assert got["en"] / 300 < 0.55
    assert got["de"] > 30 and got["fi"] > 30  # upsampled vs raw 10%


def test_alpha_one_keeps_proportions(spark):
    df = _corpus(spark)
    sel = alpha_rebalance(df, "id", "lang", total=500, alpha=1.0)
    got = {r["lang"]: r["cnt"] for r in
           sel.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"en": 400, "de": 50, "fi": 50}


def test_target_capped_at_available(spark):
    df = _corpus(spark)
    sel = alpha_rebalance(df, "id", "lang", total=5000, alpha=0.0)
    got = {r["lang"]: r["cnt"] for r in
           sel.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    # alpha=0 equalizes targets (5000/3 each) but groups cap at n_avail
    assert got["en"] == 800 and got["de"] == 100 and got["fi"] == 100


def test_selection_deterministic(spark):
    df = _corpus(spark)
    a = sorted(r["id"] for r in alpha_rebalance(df, "id", "lang", 100).collect())
    b = sorted(r["id"] for r in alpha_rebalance(df, "id", "lang", 100).collect())
    assert a == b
