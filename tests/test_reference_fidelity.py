"""Reference-fidelity tests (SURVEY §5.3): reproduce the reference's six
KPI aggregations (Consumer.scala:127-149 + the commented-out
satisfaction-by-feature, Consumer.scala:368-401) on a synthetic
airline-satisfaction table mirroring the declared schema
(Consumer.scala:22-46), and check them against plain-Python golden
computations on the same rows."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from sparkstreaming_spark.operators.aggregates import (
    count_by,
    melt_feature_means,
    sum_flag_split,
)
from sparkstreaming_spark.operators.relational import flag


@pytest.fixture(scope="module")
def satisfaction(spark):
    rng = random.Random(42)
    rows = []
    for i in range(2000):
        rows.append(
            (
                i,
                rng.choice(["Male", "Female"]),
                rng.choice(["Loyal Customer", "disloyal Customer"]),
                rng.randint(7, 85),
                rng.choice(["Personal Travel", "Business travel"]),
                rng.choice(["Eco", "Eco Plus", "Business"]),
                rng.randint(0, 5),
                rng.choice(["satisfied", "neutral or dissatisfied"]),
            )
        )
    schema = (
        "id int, Gender string, `Customer Type` string, Age int, "
        "`Type of Travel` string, Class string, `Inflight wifi service` int, "
        "satisfaction string"
    )
    df = spark.createDataFrame(rows, schema)
    return df, rows


def test_kpi1_gender_count(satisfaction):
    """KPI1 (Consumer.scala:129): groupBy(Gender).count."""
    df, rows = satisfaction
    got = {r.Gender: r.cnt for r in count_by(df, "Gender").collect()}
    want = Counter(r[1] for r in rows)
    assert got == dict(want)


def test_kpi2_class_satisfaction(satisfaction):
    """KPI2 (Consumer.scala:133): groupBy(Class, satisfaction).count."""
    df, rows = satisfaction
    got = {
        (r.Class, r.satisfaction): r.cnt
        for r in count_by(df, "Class", "satisfaction").collect()
    }
    want = Counter((r[5], r[7]) for r in rows)
    assert got == dict(want)


def test_kpi3_travel_type(satisfaction):
    """KPI3 (Consumer.scala:135): groupBy(Type of Travel).count."""
    df, rows = satisfaction
    got = {r["Type of Travel"]: r.cnt for r in count_by(df, "Type of Travel").collect()}
    assert got == dict(Counter(r[4] for r in rows))


def test_kpi4_age_distribution(satisfaction):
    """KPI4 (Consumer.scala:137): groupBy(Age).count."""
    df, rows = satisfaction
    got = {r.Age: r.cnt for r in count_by(df, "Age").collect()}
    assert got == dict(Counter(r[3] for r in rows))


def test_kpi6_loyalty_by_age(satisfaction):
    """KPI6 (Consumer.scala:139-145): per Age, sum(loyal flag) and
    count - sum — using when/otherwise instead of the reference's UDF
    (D2 rewrite, SURVEY §2.8)."""
    df, rows = satisfaction
    got = {
        r.Age: (r.loyal, r.disloyal)
        for r in sum_flag_split(
            df, "Age", "Customer Type", "Loyal Customer", "loyal", "disloyal"
        ).collect()
    }
    want: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for r in rows:
        want[r[3]][0 if r[2] == "Loyal Customer" else 1] += 1
    assert got == {k: tuple(v) for k, v in want.items()}


def test_kpi_satisfaction_by_feature(satisfaction):
    """A7 (Consumer.scala:368-401): mean binary satisfaction per
    (feature, value) via the single-shuffle stack() melt."""
    df, rows = satisfaction
    measure = flag("satisfaction", "satisfied")
    out = melt_feature_means(
        df, ["Class", "Inflight wifi service"], measure, mean_col="mean_sat"
    ).collect()
    got = {(r.feature_name, r.feature_value): round(r.mean_sat, 9) for r in out}
    acc: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for r in rows:
        for fname, fval in (("Class", r[5]), ("Inflight wifi service", str(r[6]))):
            acc[(fname, fval)][0] += 1 if r[7] == "satisfied" else 0
            acc[(fname, fval)][1] += 1
    want = {k: round(v[0] / v[1], 9) for k, v in acc.items()}
    assert got == want


def test_approx_count_distinct_tolerance(spark):
    """HLL sketch (approx_count_distinct, rsd=0.02) lands within 5% of the
    exact distinct count — sketch ops can't be oracle-hashed, so a
    tolerance property stands in."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    approx = li.agg(F.approx_count_distinct("l_partkey", 0.02).alias("a")).first()["a"]
    assert abs(approx - exact) / exact < 0.05
