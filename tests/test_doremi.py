"""DoReMi domain reweighting (operators/sampling.py::doremi_reweight):
exponentiated-gradient dynamics, smoothing floor, determinism."""

import pandas as pd
import pytest

from sparkstreaming_spark.operators.sampling import doremi_reweight


def _run(spark, losses, **kw):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"d": [f"d{i}" for i in range(len(losses))], "loss": losses}
        )
    )
    return {
        r["domain"]: r["w_micro"]
        for r in doremi_reweight(df, "d", "loss", **kw).collect()
    }


def test_harder_domains_gain_weight_monotonically(spark):
    out = _run(spark, [6_800_000, 7_000_000, 7_500_000])
    assert out["d0"] < out["d1"] < out["d2"]
    assert abs(sum(out.values()) - 1_000_000) < 10


def test_uniform_losses_stay_uniform(spark):
    out = _run(spark, [7_000_000, 7_000_000, 7_000_000, 7_000_000])
    # identical losses -> identical weights (exact integer path)
    assert len(set(out.values())) == 1
    assert abs(sum(out.values()) - 1_000_000) < 10


def test_smoothing_floor_holds_for_collapsed_domain(spark):
    # one domain far easier than the rest: its EG weight collapses but
    # the uniform-mixture floor (smooth/k) keeps it sampled
    out = _run(spark, [1_000_000, 9_000_000, 9_000_000, 9_000_000],
               smooth_micro=100_000)
    assert out["d0"] >= 100_000 // 4
    assert out["d0"] < min(out[d] for d in ("d1", "d2", "d3"))


def test_more_iters_sharpen_the_mixture(spark):
    lo = _run(spark, [6_900_000, 7_400_000], iters=1)
    hi = _run(spark, [6_900_000, 7_400_000], iters=5)
    assert hi["d1"] > lo["d1"]


def test_empty_domains_raise(spark):
    df = spark.createDataFrame([], "d string, loss bigint")
    with pytest.raises(ValueError, match="no domains"):
        doremi_reweight(df, "d", "loss")
