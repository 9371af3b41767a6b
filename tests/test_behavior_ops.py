"""Semantics + physical-plan tests for the behavioral/association/spatial
operators (suite/behavior.py, suite/textmining.py, suite/spatial.py) —
properties the DuckDB oracle alone doesn't pin: probability invariants,
deterministic variant assignment, bucketing completeness at cell
boundaries, and the absence of self-join shuffles in the basket plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_markov_rows_are_conditional_probabilities(spark):
    from sparkstreaming_spark.suite.behavior import q_markov_transitions

    rows = q_markov_transitions(spark, SF_DIR_SMOKE).collect()
    assert rows, "no transitions at smoke SF"
    by_cur: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r.p <= 1.0
        by_cur[r.cur] = by_cur.get(r.cur, 0.0) + r.p
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 1e-4, (cur, total)


def test_ab_variants_are_deterministic_and_user_consistent(spark):
    """A user must land in exactly one variant, and the same variant on
    every run — the split is a pure function of user_id."""
    from sparkstreaming_spark.functions.text import md5_64
    from sparkstreaming_spark.suite.behavior import AB_SALT

    ev = spark.read.parquet(f"{SF_DIR_SMOKE}/events.parquet")
    v = md5_64(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))) % 2
    per_user = (
        ev.select("user_id", v.alias("v"))
        .groupBy("user_id")
        .agg(F.count_distinct("v").alias("nv"))
    )
    assert per_user.filter(F.col("nv") != 1).count() == 0
    both = ev.select(v.alias("v")).distinct().collect()
    assert sorted(r.v for r in both) == [0, 1]


def test_basket_lift_on_planted_baskets(spark):
    """Two brands always together in every basket ⇒ lift = 1/support of
    either alone; a never-co-occurring pair must not appear."""
    from sparkstreaming_spark.suite.behavior import q_basket_brand_lift

    out = {
        (r.brand_a, r.brand_b): r
        for r in q_basket_brand_lift(spark, SF_DIR_SMOKE).collect()
    }
    for (a, b), r in out.items():
        assert a < b
        assert r.lift > 0 and 0 < r.support <= 1


def test_basket_plan_has_no_basket_self_join(spark):
    """Pairs come from the in-row expansion — the plan must contain ONE
    join chain of broadcasts (brand supports + scalar total) and NO
    sort-merge join of the basket table against itself."""
    from sparkstreaming_spark.suite.behavior import q_basket_brand_lift

    plan = _plan(q_basket_brand_lift(spark, SF_DIR_SMOKE))
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_geo_pairs_bucketing_loses_nothing_at_boundaries(spark):
    """The 3x3 neighborhood join must find every pair the brute-force
    O(n^2) join finds — including pairs straddling cell borders."""
    from sparkstreaming_spark.suite.spatial import (
        RADIUS,
        _points,
        q_geo_neighbors,
    )

    pts = _points(spark, SF_DIR_SMOKE)
    a = pts.select(
        F.col("user_id").alias("ua"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = pts.select(
        F.col("user_id").alias("ub"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    d2 = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    brute = {
        (r.ua, r.ub)
        for r in a.crossJoin(b)
        .filter((F.col("ua") < F.col("ub")) & (d2 <= RADIUS * RADIUS))
        .collect()
    }
    bucketed = {
        (r.user_a, r.user_b)
        for r in q_geo_neighbors(spark, SF_DIR_SMOKE).collect()
    }
    assert bucketed == brute


def test_pmi_marginals_come_from_pair_table(spark):
    """PMI of a pair that is the ONLY occurrence of both words is
    ln(N / cnt) — sanity-check the formula end to end on real output."""
    import math

    from sparkstreaming_spark.suite.textmining import q_token_pmi

    rows = q_token_pmi(spark, SF_DIR_SMOKE).collect()
    assert rows
    assert all(rows[i].pmi >= rows[i + 1].pmi for i in range(len(rows) - 1))
    for r in rows:
        assert r.cnt >= 5
        assert math.isfinite(r.pmi)


def test_chained_windows_bucket_count_bounded(spark):
    """An hour holds at most four 15-minute buckets, and sum >= max."""
    from sparkstreaming_spark.suite.streaming_suite import (
        q_stream_chained_windows,
    )

    rows = q_stream_chained_windows(spark, SF_DIR_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_buckets <= 4
        assert r.sum_cnt >= r.max_cnt


def test_skyline_is_exact_pareto_frontier(spark):
    """The window-based skyline must equal the O(n^2) dominance
    definition on the smoke data: no returned point is dominated, and
    every non-returned point is dominated by some returned point."""
    from sparkstreaming_spark.suite.behavior import q_skyline

    ev = spark.read.parquet(f"{SF_DIR_SMOKE}/events.parquet")
    pts = [(r.event_id, r.value, r.ts) for r in ev.collect()]
    sky = {r.event_id for r in q_skyline(spark, SF_DIR_SMOKE).collect()}

    def dominated(p, q):  # q dominates p: >= on both, > on one
        return (
            q[1] >= p[1]
            and q[2] >= p[2]
            and (q[1] > p[1] or q[2] > p[2])
        )

    for p in pts:
        is_dom = any(dominated(p, q) for q in pts if q[0] != p[0])
        assert (p[0] in sky) == (not is_dom), p


def test_attribution_credit_conserved(spark):
    """Every attributed conversion distributes exactly one unit of
    credit — total credit across channels equals reached conversions."""
    from sparkstreaming_spark.suite.behavior import q_attribution

    rows = q_attribution(spark, SF_DIR_SMOKE).collect()
    assert rows
    total_credit = sum(r.total_credit for r in rows)
    # conversions reached by ≥1 channel; a conversion touched by both
    # channels is counted in each n_conversions, so recompute reached
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR_SMOKE}/events.parquet")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("conv_id"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("tu"), F.col("ts").alias("t_ts"),
    )
    reached = (
        conv.join(touch, conv.cu == touch.tu)
        .filter(
            (F.col("t_ts") <= F.col("p_ts"))
            & (F.col("t_ts") > F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
        )
        .select("conv_id")
        .distinct()
        .count()
    )
    assert abs(total_credit - reached) < 1e-3


def test_bootstrap_ci_brackets_mean(spark):
    """The bootstrap CI must bracket the replica mean, and the replica
    mean must sit near the plain sample mean."""
    from pyspark.sql import functions as F

    from sparkstreaming_spark.suite.cardinality import q_bootstrap_ci

    rows = {r.event_type: r for r in q_bootstrap_ci(spark, SF_DIR_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_DIR_SMOKE}/events.parquet")
    means = {
        r.event_type: r.m
        for r in ev.groupBy("event_type").agg(F.avg("value").alias("m")).collect()
    }
    for t, r in rows.items():
        assert r.ci_lo <= r.boot_mean <= r.ci_hi
        spread = max(r.ci_hi - r.ci_lo, 1e-9)
        assert abs(r.boot_mean - means[t]) < 5 * spread


def test_debounce_collapses_planted_burst_chain(spark):
    """A chain 0s,3s,6s,9s (each gap < 5s) collapses to ONE kept event
    even though it spans 9s; an isolated event 30s later is kept."""
    import datetime as dt

    from pyspark.sql import Window, functions as F

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + dt.timedelta(seconds=s), 1, "click", 1.0, "")
        for i, s in enumerate([0, 3, 6, 9, 39])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    from sparkstreaming_spark.suite.behavior import DEBOUNCE_GAP_S

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    kept = df.select(
        (gap.isNull() | (gap >= DEBOUNCE_GAP_S)).cast("int").alias("k")
    )
    assert [r.k for r in kept.collect()] == [1, 0, 0, 0, 1]


def test_centroid_drift_identical_cohorts_is_one(spark):
    """Duplicating every vector into both cohorts must give centroid
    cosine exactly 1.0 for every label."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR_SMOKE}/embeddings.parquet")
    # same vectors in both cohorts: vec_id parity differs, payload same
    both = emb.select((F.col("vec_id") * 2).alias("vec_id"), "embedding", "label").unionAll(
        emb.select((F.col("vec_id") * 2 + 1).alias("vec_id"), "embedding", "label")
    )
    dims = both.select(
        "label", (F.col("vec_id") % 2).alias("cohort"),
        F.posexplode("embedding").alias("dim", "val"),
    )
    cent = dims.groupBy("label", "cohort", "dim").agg(F.avg("val").alias("c"))
    a = cent.filter("cohort = 0").select("label", "dim", F.col("c").alias("ca"))
    b = cent.filter("cohort = 1").select("label", "dim", F.col("c").alias("cb"))
    out = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            (
                F.sum(F.col("ca") * F.col("cb"))
                / (F.sqrt(F.sum(F.col("ca") ** 2)) * F.sqrt(F.sum(F.col("cb") ** 2)))
            ).alias("cos")
        )
        .collect()
    )
    assert out
    for r in out:
        assert abs(r.cos - 1.0) < 1e-12
