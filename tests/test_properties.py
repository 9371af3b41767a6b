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


@SLOW
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40, unique=True),
    st.integers(min_value=1, max_value=9),
)
def test_split_partitions_any_id_set(spark, ids, w):
    """For any id set and any train weight, with_split labels every row
    exactly once and stays consistent with hash_sample's threshold."""
    from sparkstreaming_spark.operators.sampling import with_split

    frac = w / 10.0
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    out = with_split(df, "doc_id", {"train": frac, "rest": 1 - frac}).collect()
    assert len(out) == len(ids)
    assert {r.doc_id for r in out} == set(ids)
    assert all(r.split in ("train", "rest") for r in out)


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 100)),
        min_size=0,
        max_size=25,
    )
)
def test_merge_upsert_key_partition(spark, upd_rows):
    """Merge result keys == (target keys − deleted) ∪ inserted, for any
    update batch with unique keys."""
    from sparkstreaming_spark.operators.merge import merge_upsert

    target_keys = set(range(0, 30))
    target = spark.createDataFrame([(k, k) for k in target_keys], "k bigint, v bigint")
    seen: dict[int, int] = {}
    for k, v in upd_rows:
        seen.setdefault(k, v)
    updates = spark.createDataFrame(
        [(k, v, v % 3 == 0) for k, v in seen.items()],
        "k bigint, v bigint, del boolean",
    )
    got = {r.k: r.v for r in merge_upsert(target, updates, ["k"], delete_col="del").collect()}
    expect_keys = (target_keys - set(seen)) | {k for k, v in seen.items() if v % 3 != 0}
    assert set(got) == expect_keys
    for k, v in seen.items():
        if v % 3 != 0:
            assert got[k] == v


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),        # key
            st.integers(min_value=0, max_value=20_000),   # offset seconds
        ),
        min_size=1,
        max_size=40,
    )
)
def test_sessionize_matches_reference(spark, rows):
    """Distributed sessionize == single-threaded reference on arbitrary
    event sets (ties included)."""
    import datetime as dt

    from sparkstreaming_spark.operators.timeseries import sessionize

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (k, t0 + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "user_id int, ts timestamp, event_id int")
    got = {
        r.event_id: (r.user_id, r.session_num)
        for r in sessionize(
            df, key="user_id", ts="ts", tiebreak="event_id", gap_seconds=600
        ).collect()
    }
    # reference: sort per key by (ts, event_id), gap > 600 starts session
    from collections import defaultdict

    per_key = defaultdict(list)
    for k, ts, i in data:
        per_key[k].append((ts, i))
    want = {}
    for k, evts in per_key.items():
        evts.sort()
        sess, prev = 1, None
        for ts, i in evts:
            if prev is not None and (ts - prev).total_seconds() > 600:
                sess += 1
            want[i] = (k, sess)
            prev = ts
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans(), st.booleans()),
        min_size=1,
        max_size=30,
    )
)
def test_route_quarantine_first_failure_wins(spark, flags):
    """The reason is always the FIRST rule (priority order) whose
    predicate is false, independent of the others."""
    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.constraints import route_quarantine

    df = spark.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(flags)],
        "id int, p1 boolean, p2 boolean, p3 boolean",
    )
    routed = route_quarantine(
        df, [("r1", F.col("p1")), ("r2", F.col("p2")), ("r3", F.col("p3"))]
    )
    got = {r.id: r.quarantine_reason for r in routed.collect()}
    for i, (a, b, c) in enumerate(flags):
        want = None if (a and b and c) else ("r1" if not a else "r2" if not b else "r3")
        assert got[i] == want, (i, a, b, c)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100)),
        min_size=2,
        max_size=24,
    )
)
def test_interpolate_stays_within_anchor_bounds(spark, vals):
    """Every interpolated value lies within [min, max] of the observed
    values (linear blending never extrapolates), and observed rows pass
    through unchanged up to rounding."""
    import datetime as dt
    import math

    from hypothesis import assume

    from sparkstreaming_spark.operators.timeseries import linear_interpolate

    observed = [v for v in vals if v is not None]
    assume(len(observed) >= 1)
    t0 = dt.datetime(2024, 1, 1)
    data = [
        ("k", t0 + dt.timedelta(hours=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(data, "key string, bucket timestamp, v double")
    out = linear_interpolate(df, "key", "bucket", "v").collect()
    lo, hi = min(observed), max(observed)
    for r in out:
        assert r.value_interp is not None
        assert lo - 1e-6 <= r.value_interp <= hi + 1e-6
    by_bucket = {r.bucket: r.value_interp for r in out}
    for i, v in enumerate(vals):
        if v is not None:
            got = by_bucket[t0 + dt.timedelta(hours=i)]
            assert math.isclose(got, v, abs_tol=1e-6)
