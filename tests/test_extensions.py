"""Extension-point tests: custom Python Data Source partition fan-out and
determinism; UDTF null/empty handling. The bit-exact value checks live in
the oracle differential suite (suite/extensions.py entries)."""

from __future__ import annotations


def test_custom_source_partition_fanout(spark):
    """n_parts option must become n input partitions — that IS the
    parallel-ingest contract (each shard → one task)."""
    from sparkstreaming_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_rows", 100)
        .option("n_parts", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 100


def test_custom_source_deterministic_across_layouts(spark):
    """Same seed ⇒ same corpus regardless of shard count (rows are keyed
    by doc_id, not by partition)."""
    from sparkstreaming_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)

    def snapshot(parts: int):
        return {
            (r["doc_id"], r["text"])
            for r in spark.read.format("synthetic_docs")
            .option("n_rows", 50)
            .option("n_parts", parts)
            .load()
            .collect()
        }

    assert snapshot(1) == snapshot(5)


def test_custom_source_matches_local_generator(spark):
    """Executor-side rows equal the driver-side pure function — catches
    serialization/option-plumbing drift."""
    from sparkstreaming_spark.sources.custom import (
        DEFAULT_SEED,
        register_custom_sources,
        synth_text,
    )

    register_custom_sources(spark)
    rows = (
        spark.read.format("synthetic_docs")
        .option("n_rows", 20)
        .option("n_parts", 3)
        .load()
        .collect()
    )
    for r in rows:
        assert r["text"] == synth_text(DEFAULT_SEED, r["doc_id"])


def test_sentence_udtf_null_and_empty(spark):
    """NULL text yields no rows; punctuation-only text yields no rows;
    sent_idx counts only non-empty sentences."""
    from sparkstreaming_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "en", "One. Two two! ... Three three three?"),
         (2, "en", None),
         (3, "en", "!!!")],
        "doc_id long, lang string, text string",
    ).createOrReplaceTempView("udtf_edge")
    rows = spark.sql(
        "SELECT s.* FROM udtf_edge d, "
        "LATERAL sentence_split(d.doc_id, d.lang, d.text) s"
    ).collect()
    assert {r["doc_id"] for r in rows} == {1}
    got = {(r["sent_idx"], r["n_tokens"]) for r in rows}
    assert got == {(0, 1), (1, 2), (2, 3)}


def test_cdc_apply_semantics(spark):
    """Latest change wins; a trailing delete removes the key; earlier
    deletes are overridden by later upserts."""
    from sparkstreaming_spark.operators.cdc import cdc_apply

    changes = spark.createDataFrame(
        [
            (1, 1, "U", 10.0),
            (1, 2, "U", 20.0),
            (2, 1, "U", 5.0),
            (2, 2, "D", 0.0),
            (3, 1, "D", 0.0),
            (3, 2, "U", 7.0),
        ],
        "key int, seq int, op string, val double",
    )
    got = {
        r.key: (r.seq, r.val)
        for r in cdc_apply(changes, ["key"], "seq", "op", ["val"]).collect()
    }
    assert got == {1: (2, 20.0), 3: (2, 7.0)}  # key 2 deleted


def test_scd2_history_intervals(spark):
    """Versions tile each key's timeline: half-open intervals, exactly one
    open (is_current) version per key, valid_from/valid_to chain."""
    import datetime as dt

    from sparkstreaming_spark.operators.cdc import scd2_history

    t = lambda d: dt.datetime(2024, 1, d)
    changes = spark.createDataFrame(
        [(1, t(1), "a"), (1, t(5), "b"), (2, t(3), "x")],
        "key int, ts timestamp, attr string",
    )
    hist = scd2_history(changes, ["key"], "ts", ["attr"]).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r.key, []).append(r)
    k1 = sorted(by_key[1], key=lambda r: r.valid_from)
    assert k1[0].valid_to == k1[1].valid_from and not k1[0].is_current
    assert k1[1].valid_to is None and k1[1].is_current
    assert len(by_key[2]) == 1 and by_key[2][0].is_current


def test_fuzzy_value_pairs_bounded_distance(spark):
    """Finds all-and-only pairs within the edit bound; the length-band
    prefilter must not drop qualifying pairs."""
    from sparkstreaming_spark.dedup.fuzzy import fuzzy_value_pairs

    df = spark.createDataFrame(
        [("kitten",), ("sitten",), ("sittin",), ("apple",), ("apples",), ("kitten",)],
        "name string",
    )
    got = {(r.val_a, r.val_b, r.dist) for r in fuzzy_value_pairs(df, "name", 2).collect()}
    assert ("apple", "apples", 1) in got
    assert ("kitten", "sitten", 1) in got
    assert ("kitten", "sittin", 2) in got
    assert ("sitten", "sittin", 1) in got
    assert all(d <= 2 for _, _, d in got)
    assert not any({a, b} == {"apple", "kitten"} for a, b, _ in got)


def test_interval_overlap_join_exactly_once(spark):
    """A pair overlapping many buckets must appear EXACTLY once (owner-
    bucket dedup, no distinct); non-overlapping and cross-key pairs never
    appear; touching endpoints (closed intervals) do."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.range_join import interval_overlap_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, 100, t(0), t(59)), (1, 101, t(10), t(11)), (2, 102, t(0), t(59))],
        "key int, lid int, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [(1, 200, t(30), t(40)), (1, 201, t(59), t(59)), (1, 202, t(12), t(20))],
        "key int, rid int, s timestamp, e timestamp",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "key", "s", "e", "s", "e", bucket_us=60_000_000
        )
        .select(F.col("a.lid").alias("lid"), F.col("b.rid").alias("rid"))
        .collect()
    )
    # lid=100 spans 60 one-minute buckets yet each pair appears once;
    # 101 misses 200/201 (no overlap) but NOT 202 (12>11); key 2 never joins
    assert got == [(100, 200), (100, 201), (100, 202)]


def test_approx_percentiles_within_tolerance(spark):
    """approx_percentile at LOW accuracy (true sketch regime: per-group
    count > accuracy, so summaries compress and merge) must land within 1%
    rank error of the exact continuous percentiles on each group. The
    registry query runs the same sketch at accuracy>=n where GK is exact
    and hash-oracled; this pins the approximate regime separately."""
    from pyspark.sql import functions as F

    from sparkstreaming_spark.sources.batch import read_table
    from tests.conftest import SF_DIR_CORRECT

    ev = read_table(spark, SF_DIR_CORRECT, "events")
    approx = {
        r.event_type: (r.ap50, r.ap90, r.ap99)
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_percentile(
                "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 100
            ).alias("p")
        )
        .select(
            "event_type",
            F.col("p")[0].alias("ap50"),
            F.col("p")[1].alias("ap90"),
            F.col("p")[2].alias("ap99"),
        )
        .collect()
    }
    for row in ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.49, 0.51))").alias("b50"),
        F.expr("percentile(value, array(0.89, 0.91))").alias("b90"),
        F.expr("percentile(value, array(0.98, 1.0))").alias("b99"),
    ).collect():
        a50, a90, a99 = approx[row.event_type]
        assert row.b50[0] <= a50 <= row.b50[1]
        assert row.b90[0] <= a90 <= row.b90[1]
        assert row.b99[0] <= a99 <= row.b99[1]


def test_approx_distinct_within_hll_bound(spark):
    """HLL estimate must land within ~3×rsd of the exact distinct count
    per group (rsd=0.01 registered; 3σ ≈ 3%) — the query now EMITS that
    contract as `within_3sigma`, which its DuckDB oracle pins to TRUE."""
    from sparkstreaming_spark.suite.scale_ops import q_approx_distinct
    from tests.conftest import SF_DIR_SMOKE

    rows = q_approx_distinct(spark, SF_DIR_SMOKE).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.exact_users > 0
        assert r.within_3sigma, (
            f"{r.event_type}: sketch outside 3-sigma of {r.exact_users}"
        )


def test_fingerprint_detects_single_row_change(spark):
    """Anti-entropy contract: flipping ONE row's content must flip
    exactly one bucket's xor_hash and no bucket's n_rows."""
    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.integrity import (
        row_fingerprint,
        table_fingerprint,
    )
    from tests.conftest import SF_DIR_SMOKE

    o = spark.read.parquet(f"{SF_DIR_SMOKE}/orders.parquet")
    rendered = [
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
    ]
    base = table_fingerprint(o, F.col("o_orderkey"), rendered)
    mutated_src = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 1, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    mutated = table_fingerprint(mutated_src, F.col("o_orderkey"), rendered)
    b = {r.bucket: (r.n_rows, r.xor_hash) for r in base.collect()}
    m = {r.bucket: (r.n_rows, r.xor_hash) for r in mutated.collect()}
    assert set(b) == set(m)
    diff = [k for k in b if b[k] != m[k]]
    assert len(diff) == 1, f"expected 1 divergent bucket, got {diff}"
    k = diff[0]
    assert b[k][0] == m[k][0], "row count must not change"
    assert b[k][1] != m[k][1], "xor hash must change"


def test_snapshot_diff_planted(spark):
    """Planted add/remove/change triple must classify exactly."""
    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.integrity import (
        row_fingerprint,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    ).withColumn("__h", row_fingerprint([F.col("v")]))
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "k int, v string"
    ).withColumn("__h", row_fingerprint([F.col("v")]))
    got = {r.k: r.change for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_sessionize_gap_semantics(spark):
    """Events ≤ gap apart share a session; a gap > threshold starts a
    new one; ties in ts never split a session."""
    import datetime as dt

    from sparkstreaming_spark.operators.timeseries import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1),
        (1, t0, 2),  # tie with previous → same session
        (1, t0 + dt.timedelta(seconds=1800), 3),  # exactly gap → same
        (1, t0 + dt.timedelta(seconds=3601), 4),  # > gap from prev → new
        (2, t0, 5),  # other key independent
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    got = {
        r.event_id: r.session_num
        for r in sessionize(
            df, key="user_id", ts="ts", tiebreak="event_id", gap_seconds=1800
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_triangle_count_planted(spark):
    """Planted graph: K4 on {1,2,3,4} (4 triangles) plus a pendant edge
    and a duplicate/reversed edge — count must be exactly 4."""
    from sparkstreaming_spark.operators.graph import triangle_count

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5),              # pendant — no new triangle
        (2, 1), (3, 1),      # reversed duplicates — must not double count
    ]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = triangle_count(df).collect()[0].n_triangles
    assert got == 4


def test_linear_interpolate_semantics(spark):
    """Interior gaps blend time-weighted between anchors; leading and
    trailing gaps fall back to the single available anchor."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sparkstreaming_spark.operators.timeseries import linear_interpolate

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        ("k", t0, None),          # leading gap -> nocb = 10.0
        ("k", t0 + 1 * h, 10.0),
        ("k", t0 + 2 * h, None),  # 1/3 of the way 10 -> 40
        ("k", t0 + 3 * h, None),  # 2/3 of the way
        ("k", t0 + 4 * h, 40.0),
        ("k", t0 + 5 * h, None),  # trailing gap -> locf = 40.0
    ]
    df = spark.createDataFrame(rows, "key string, bucket timestamp, v double")
    out = {
        r.bucket.hour: (r.value_interp, r.was_gap)
        for r in linear_interpolate(df, "key", "bucket", "v").collect()
    }
    assert out[0] == (10.0, True)
    assert out[1] == (10.0, False)
    assert out[2] == (20.0, True)
    assert out[3] == (30.0, True)
    assert out[4] == (40.0, False)
    assert out[5] == (40.0, True)


def test_hll_union_within_bound(spark):
    """Unioned daily HLL sketches (lgConfigK=14, rel err ~0.81%) must land
    within 3σ of the exact per-type distinct count — the query emits the
    bound as `within_3sigma`; exact counts cross-check DuckDB."""
    from sparkstreaming_spark.suite.cardinality import q_hll_union
    from tests.conftest import SF_DIR_SMOKE

    import duckdb

    exact = {
        t: n
        for t, n in duckdb.sql(
            "SELECT event_type, count(DISTINCT user_id) FROM "
            f"read_parquet('{SF_DIR_SMOKE}/events.parquet') GROUP BY 1"
        ).fetchall()
    }
    rows = q_hll_union(spark, SF_DIR_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.within_3sigma, (r.event_type, r.exact_users)
