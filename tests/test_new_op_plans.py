"""Physical-plan assertions for the training-pipeline operators added in
this round: what matters at scale is the absence of accidental shuffles
(sampling), top-k short-circuits (BM25), and broadcast labeling joins
(dup clusters) — only a plan check pins those."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hash_split_is_shuffle_free(spark):
    """Split/sample assignment must stay a codegen'd projection+filter —
    an Exchange here would mean the 'no coordination' promise is broken."""
    from sparkstreaming_spark.operators.sampling import (
        stratified_hash_sample,
        with_split,
    )

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    split_plan = _plan(with_split(docs, "doc_id", {"train": 0.9, "test": 0.1}))
    assert "Exchange" not in split_plan, split_plan[:2000]
    assert "*(1)" in split_plan  # whole-stage codegen marker
    sample_plan = _plan(
        stratified_hash_sample(docs, "doc_id", "source", {"src0": 0.5})
    )
    assert "Exchange" not in sample_plan, sample_plan[:2000]


def test_bm25_topk_uses_take_ordered(spark):
    """The final top-k must compile to TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global Sort over all scored docs."""
    from sparkstreaming_spark.textstats.ranking import bm25_topk

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    plan = _plan(bm25_topk(docs, ["spark", "join"], top_k=5))
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_dup_clusters_labels_via_broadcast(spark):
    """Labeling the full corpus with its (small) component map and sizes
    must be broadcast joins — shuffling the corpus to meet a frame that
    only holds docs-with-near-dup-evidence would be backwards."""
    from sparkstreaming_spark.dedup.clusters import dup_clusters

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], "doc_a bigint, doc_b bigint"
    )
    plan = _plan(dup_clusters(docs, pairs, "doc_id"))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]


def test_frame_sampling_is_narrow(spark):
    """1→N frame sampling is a map — no Exchange before the FlatMap."""
    from sparkstreaming_spark.multimodal.blobs import (
        sample_blob_frames,
        with_blob,
    )

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    plan = _plan(sample_blob_frames(with_blob(docs, "text"), "doc_id"))
    assert "Exchange" not in plan, plan[:2000]


def test_pii_scrub_prunes_scan_columns(spark):
    """The scrub aggregate reads only (lang, text): column pruning must
    reach the parquet scan ReadSchema."""
    from sparkstreaming_spark.textstats.cleaning import scrub

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    out = (
        scrub(docs, "text")
        .groupBy("lang")
        .agg(F.sum("n_email").alias("e"))
    )
    plan = _plan(out)
    scan = plan[plan.index("ReadSchema"):][:200]
    assert "text" in scan and "lang" in scan
    assert "doc_id" not in scan and "n_chars" not in scan, scan


def test_decontam_benchmark_side_broadcasts(spark):
    """Decontamination must resolve membership via a BROADCAST join on the
    benchmark shingle set — a shuffled join here would repartition the
    entire corpus's shingle stream at 100 TB."""
    from sparkstreaming_spark.textstats.decontam import contamination_stats

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    plan = _plan(contamination_stats(corpus, bench, "doc_id", "text", n=3))
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_decontam_planted_overlap(spark):
    """A corpus doc sharing a 3-gram with the benchmark is flagged; one
    with disjoint vocabulary is not; a doc with < n tokens reports zero
    shingles."""
    from sparkstreaming_spark.textstats.decontam import contamination_stats

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox yesterday"),  # shares "the quick brown"
            (2, "completely disjoint vocabulary here today"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in contamination_stats(corpus, bench, "doc_id", "text", n=3).collect()
    }
    assert rows[1]["n_contaminated"] == 2  # "the quick brown", "quick brown fox"
    assert rows[2]["n_contaminated"] == 0 and rows[2]["n_shingles"] == 3
    assert rows[3]["n_shingles"] == 0 and rows[3]["n_contaminated"] == 0


def test_label_cohesion_degenerate_label(spark):
    """All vectors identical within a label → centroid == vector →
    cohesion exactly 1.0."""
    from sparkstreaming_spark.suite.vectors import q_label_cohesion
    import tempfile, os

    d = tempfile.mkdtemp(prefix="cohesion_")
    spark.createDataFrame(
        [(i, [1.0, 2.0, 2.0], 0) for i in range(4)]
        + [(10 + i, [float(i), 1.0, 0.0], 1) for i in range(3)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    rows = {r["label"]: r for r in q_label_cohesion(spark, d).collect()}
    assert rows[0]["avg_cohesion"] == 1.0 and rows[0]["min_cohesion"] == 1.0
    assert rows[1]["n_vecs"] == 3 and rows[1]["avg_cohesion"] < 1.0


def test_dup_passages_planted(spark):
    """Two docs sharing an 8-token span are both flagged for exactly the
    shared windows; a unique doc reports zero; a short doc reports zero
    windows. Window hashes are per-doc DISTINCT, so a span repeated
    inside ONE doc does not count as duplicated."""
    from sparkstreaming_spark.dedup.passages import dup_passage_stats

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"start one two {shared} tail"),
            (2, f"{shared} different ending here"),
            (3, "totally unrelated words in this document body continuing onward"),
            (4, "short doc"),
            (5, f"{shared} {shared}"),  # internal repeat, also shares with 1/2
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dup_passage_stats(docs, "doc_id", "text", window=8).collect()
    }
    assert rows[1]["n_dup_windows"] == 1  # only the shared window recurs
    assert rows[2]["n_dup_windows"] == 1
    assert rows[3]["n_dup_windows"] == 0
    assert rows[4]["n_windows"] == 0 and rows[4]["dup_fraction"] == 0.0
    assert rows[5]["n_dup_windows"] >= 1


def test_cdc_apply_plan_is_partial_aggregate_not_window(spark):
    """cdc_apply's winner-per-key must plan as partial+final aggregate
    (map-side combine bounds the shuffle) — never a window sort."""
    from sparkstreaming_spark.operators.cdc import cdc_apply

    changes = spark.createDataFrame(
        [(1, 1, "U", 1.0)], "key int, seq int, op string, val double"
    )
    plan = (
        cdc_apply(changes, ["key"], "seq", "op", ["val"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "partial_max_by" in plan


def test_interval_overlap_plan_has_no_post_join_dedup(spark):
    """Owner-bucket dedup lives in the join condition — the executed plan
    must contain exactly one join and NO aggregate (the naive form needs
    a distinct, i.e. an extra shuffle of the whole result)."""
    import datetime as dt

    from sparkstreaming_spark.operators.range_join import interval_overlap_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame([(1, t(0), t(5))], "key int, s timestamp, e timestamp")
    right = spark.createDataFrame([(1, t(1), t(2))], "key int, s timestamp, e timestamp")
    plan = (
        interval_overlap_join(left, right, "key", "s", "e", "s", "e", 60_000_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == 1
    assert "Aggregate" not in plan


def test_ewma_plan_shares_one_window_sort(spark):
    """All 24 EWMA lag taps must share a single Window node and a single
    sort — the FIR formulation's whole point."""
    from pyspark.sql import Window

    from sparkstreaming_spark.operators.timeseries import truncated_ewma

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, t int, v double")
    w = Window.partitionBy("g").orderBy("t")
    plan = (
        df.select(truncated_ewma("v", w).alias("e"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window ") + plan.count("RunningWindow") == 1
    assert plan.count("Sort ") == 1


def test_shuffle_shards_single_exchange(spark):
    """Training-order shuffle = exactly one hash Exchange (on shard) +
    per-shard window sort. A range Exchange or a second hash Exchange
    would mean an accidental global sort / re-shuffle crept in."""
    from sparkstreaming_spark.operators.layout import shuffle_shards

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    plan = _plan(shuffle_shards(docs, "doc_id", n_shards=8))
    assert plan.count("Exchange") == 1, plan[:3000]
    assert "rangepartitioning" not in plan.lower(), plan[:3000]


def test_length_curriculum_bucketing_pass_has_no_sort(spark):
    """The bucketing pass compares against broadcast boundary literals —
    its plan must contain no Sort (ntile's global sort is exactly what
    this pattern avoids). Only the tiny boundary aggregate and the final
    groupBy may exchange."""
    from sparkstreaming_spark.suite import all_queries
    from tests.conftest import SF_DIR_SMOKE as S

    df = all_queries()["doc_length_curriculum"].fn(spark, S)
    plan = _plan(df)
    assert "Sort" not in plan, plan[:3000]


def test_ccnet_buckets_has_no_window_sort(spark):
    """CCNet bucketing must be the two-pass cut-then-apply shape: a tiny
    per-language percentile aggregate broadcast back to the corpus — no
    Window node anywhere (the old ntile(3) formulation needed a
    per-language TOTAL sort, a single-task bottleneck once one language
    dominates the corpus)."""
    from sparkstreaming_spark.textstats.lm import ccnet_perplexity_buckets
    from tests.conftest import SF_DIR_SMOKE as S

    docs = spark.read.parquet(f"{S}/documents.parquet")
    plan = _plan(ccnet_perplexity_buckets(docs, "text"))
    assert "Window" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_nfc_normalize_is_arrow_eval(spark):
    """The normalizer must run as an Arrow-batched python eval (vectorized
    Series.str.normalize), not a row-at-a-time BatchEvalPython."""
    from sparkstreaming_spark.textstats.cleaning import nfc_normalize

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    plan = _plan(docs.select(nfc_normalize("text").alias("n")))
    assert "ArrowEvalPython" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan, plan[:2000]


def test_zorder_key_is_codegen_no_udf(spark):
    """The Morton key must stay a whole-stage-codegen'd shift/and/or
    projection — a BatchEvalPython/ArrowEval node here would put Python
    in a per-row layout job's hot path."""
    from sparkstreaming_spark.suite.scale_ops import ZORDER_DIMS
    from sparkstreaming_spark.operators.layout import zorder_value

    li = spark.read.parquet(f"{SF_DIR_SMOKE}/lineitem.parquet")
    plan = _plan(li.select(zorder_value(ZORDER_DIMS).alias("zval")))
    assert "Python" not in plan, plan[:2000]
    assert "Exchange" not in plan, plan[:2000]
    assert "*(1)" in plan  # whole-stage codegen


def test_skew_profile_topk_uses_take_ordered(spark):
    """The hot-key top-K must compile to TakeOrderedAndProject over the
    per-key partial-aggregate counts — a global Sort over all keys would
    not survive a billion-key corpus."""
    from sparkstreaming_spark.suite.scale_ops import q_skew_profile

    plan = _plan(q_skew_profile(spark, SF_DIR_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # counts are partially aggregated map-side before the shuffle
    assert "partial_count" in plan, plan[:2000]


def test_ohlc_single_exchange(spark):
    """OHLC = one shuffle on (keys, bucket): the window sort and the
    follow-up hash aggregate must reuse the same exchange, and AQE must
    not add another."""
    from sparkstreaming_spark.suite.scale_ops import q_ohlc

    plan = _plan(q_ohlc(spark, SF_DIR_SMOKE))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"{n_exchanges} exchanges:\n{plan[:3000]}"


def test_bigram_pairs_stay_codegen(spark):
    """Adjacent-pair construction must be slice/zip_with expression work
    (codegen'd), not a posexplode self-join and not Python."""
    from sparkstreaming_spark.textstats.analysis import add_bigram_logprob

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    plan = _plan(add_bigram_logprob(docs, "text"))
    assert "Python" not in plan, plan[:2000]
    # two count models + per-doc agg; the pair build itself adds no join
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") <= 2, (
        plan[:3000]
    )


def test_sessionize_single_exchange(spark):
    """Lag-flag and running-sum windows share one ordering: the plan must
    contain exactly one hash exchange (the user_id partitioning)."""
    from sparkstreaming_spark.suite.scale_ops import q_sessionize

    plan = _plan(q_sessionize(spark, SF_DIR_SMOKE))
    n = plan.count("Exchange hashpartitioning")
    assert n == 1, f"{n} exchanges:\n{plan[:3000]}"


def test_fingerprint_is_partial_aggregate(spark):
    """The XOR combine must partially aggregate map-side: the shuffle
    carries ≤ buckets rows per partition, never row hashes."""
    from sparkstreaming_spark.suite.scale_ops import q_table_fingerprint

    plan = _plan(q_table_fingerprint(spark, SF_DIR_SMOKE))
    assert "partial_bit_xor" in plan or "partial" in plan, plan[:3000]
    assert "Python" not in plan, plan[:2000]


def test_bitmap_distinct_partial_aggregates(spark):
    """Both aggregate levels must partially combine map-side (the shuffle
    carries bitmaps, never user ids) and stay Python-free."""
    from sparkstreaming_spark.suite.cardinality import q_bitmap_distinct

    plan = _plan(q_bitmap_distinct(spark, SF_DIR_SMOKE))
    assert "partial_bitmap_construct_agg" in plan, plan[:3000]
    assert "Python" not in plan, plan[:2000]


def test_sampled_mean_filter_pushed_to_scan(spark):
    """The hash-sample predicate must reach the scan stage as a codegen'd
    filter (one pass, no pre-shuffle materialization)."""
    from sparkstreaming_spark.suite.cardinality import q_sampled_mean

    plan = _plan(q_sampled_mean(spark, SF_DIR_SMOKE))
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex == 1, f"{n_ex} exchanges:\n{plan[:3000]}"
    assert "partial_avg" in plan or "partial" in plan, plan[:3000]


def test_top_paths_takeordered(spark):
    """Top-k must be TakeOrdered (per-partition partial top-k), never a
    global sort; one exchange for the per-user window."""
    from sparkstreaming_spark.suite.analytics import q_top_paths

    plan = _plan(q_top_paths(spark, SF_DIR_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_interpolate_single_hash_exchange_per_key(spark):
    """The grid join and BOTH window directions share the event_type
    partitioning: the whole query plans exactly 2 hash exchanges (the
    bucket aggregate, then the key partitioning everything downstream
    reuses) — a third would mean a window direction re-shuffled."""
    from sparkstreaming_spark.suite.analytics import q_interpolate

    plan = _plan(q_interpolate(spark, SF_DIR_SMOKE))
    n = plan.count("Exchange hashpartitioning")
    assert n == 2, f"{n} exchanges:\n{plan[:4000]}"
    assert "Python" not in plan, plan[:2000]


def test_join_strategy_hints_are_honored(spark):
    """The full join-hint surface: broadcast / shuffle_hash / merge /
    shuffle_replicate_nl each force their physical strategy — the manual
    override lever when stats mislead the optimizer at scale."""
    o = spark.read.parquet(f"{SF_DIR_SMOKE}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR_SMOKE}/customer.parquet")
    cases = [
        ("broadcast", "BroadcastHashJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
        ("merge", "SortMergeJoin"),
    ]
    for hint, node in cases:
        plan = _plan(o.join(c.hint(hint), o.o_custkey == c.c_custkey))
        assert node in plan, f"{hint}: expected {node}\n{plan[:2000]}"
    nl = _plan(
        o.limit(10).join(c.limit(10).hint("shuffle_replicate_nl"))
    )
    assert "CartesianProduct" in nl, nl[:2000]


def test_incremental_dedup_never_broadcasts_corpus(spark):
    """The corpus hash sets must join as hash-shuffle joins (the corpus
    side is corpus-sized at 100 TB) — a BroadcastHashJoin of the corpus
    side here would OOM the driver at scale. The exact-hash and shingle
    joins both carry distinct-reduced corpus sides, so the plan should
    show partial aggregates feeding non-broadcast joins."""
    from sparkstreaming_spark.dedup.incremental import incremental_dedup

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        # the corpus sides are tiny at test scale and AQE would broadcast
        # them; disable so the plan shows the AT-SCALE (shuffle) shape
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(
            incremental_dedup(corpus, incoming, "doc_id", "text", n=3)
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in plan, plan[:3000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_psi_drift_single_data_shuffle(spark):
    """Everything after the (type, bucket) partial aggregate runs on the
    tiny contingency table: the events scan must feed exactly one
    data-sized Exchange (partial_sum markers), and the window/spine work
    shuffles only aggregate-sized rows."""
    from sparkstreaming_spark.suite.analytics import q_psi_drift

    plan = _plan(q_psi_drift(spark, SF_DIR_SMOKE))
    # partial aggregation must be map-side (partial_ markers before the
    # first Exchange)
    assert "partial_sum" in plan or "partial_count" in plan, plan[:3000]
    # the raw events scan appears exactly twice (counts + distinct types);
    # no self-join of raw events anywhere
    assert plan.count("parquet") <= 4, plan[:3000]


def test_semantic_dedup_one_cluster_exchange(spark):
    """SemDeDup = one shuffle keyed by cluster feeding the per-cluster
    GEMM (applyInPandas) — extra exchanges would mean the grouping isn't
    being reused."""
    from sparkstreaming_spark.dedup.semdedup import semantic_dedup_dropped

    emb = spark.read.parquet(f"{SF_DIR_SMOKE}/embeddings.parquet")
    plan = _plan(
        semantic_dedup_dropped(emb, "vec_id", "embedding", "label", 0.5)
    )
    assert plan.count("Exchange") == 1, plan[:3000]
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan, plan[:2000]


def test_markup_strip_is_codegen_projection(spark):
    """strip_markup must stay one whole-stage-codegen'd projection: no
    Exchange, no Python execution."""
    from sparkstreaming_spark.textstats.cleaning import strip_markup

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    plan = _plan(docs.select(strip_markup("text").alias("c")))
    assert "Exchange" not in plan, plan[:2000]
    assert "Python" not in plan, plan[:2000]
    assert "*(1)" in plan
