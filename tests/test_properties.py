"""Property-based tests (Hypothesis; SURVEY §5.4) for the expression-level
operators. Examples are kept small — each draws a Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkstreaming_spark.functions.text import (
    normalize_text,
    shingles,
    token_count,
    tokenize,
)

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120
)
SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _one(spark, text, *cols):
    return (
        spark.createDataFrame([(text,)], "text string").select(*cols).first()
    )


@SLOW
@given(TEXT)
def test_normalize_only_lowercase_alnum_space(spark, text):
    row = _one(spark, text, normalize_text("text").alias("n"))
    assert all(c.islower() or c.isdigit() or c.isspace() for c in row.n)


@SLOW
@given(TEXT)
def test_token_count_matches_tokens(spark, text):
    row = _one(
        spark,
        text,
        token_count("text").alias("n"),
        tokenize("text").alias("toks"),
    )
    assert row.n == len(row.toks)
    assert all(t for t in row.toks), "no empty tokens"


@SLOW
@given(TEXT, st.integers(min_value=1, max_value=4))
def test_shingle_count_formula(spark, text, n):
    row = _one(
        spark,
        text,
        tokenize("text").alias("toks"),
        shingles("text", n).alias("sh"),
    )
    expect = max(0, len(row.toks) - n + 1)
    assert len(row.sh) == expect
    for s in row.sh:
        assert len(s.split(" ")) == n


@SLOW
@given(st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=30))
def test_count_by_partitions_total(spark, keys):
    """Sum of per-key counts equals the row count (the reference's implicit
    KPI invariant, SURVEY §5.4)."""
    from sparkstreaming_spark.operators.aggregates import count_by

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    counts = count_by(df, "k").collect()
    assert sum(r.cnt for r in counts) == len(keys)


@SLOW
@given(st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=30))
def test_loyalty_split_sums_to_count(spark, vals):
    """pos + neg == total per key (Consumer.scala:143-144 invariant)."""
    from sparkstreaming_spark.operators.aggregates import sum_flag_split

    df = spark.createDataFrame([("g", v) for v in vals], "k string, v string")
    row = sum_flag_split(df, "k", "v", "x", "pos", "neg").first()
    assert row.pos + row.neg == len(vals)
    assert row.pos == sum(1 for v in vals if v == "x")
