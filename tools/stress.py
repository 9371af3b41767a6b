"""Scale-stress harness: replicate documents/embeddings Nx (ids remapped,
text/vectors perturbed so dedup doesn't collapse the copies) into /tmp,
then time the CPU-heavy LLM operators. The point is the SHAPE of the
curve — linear-ish in input with no driver-side collection — not the
absolute numbers.

Usage: python tools/stress.py [factor] [ops...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkstreaming_spark.session import get_spark
from sparkstreaming_spark.suite import all_queries

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_OPS = [
    "doc_decontam",
    "emb_label_cohesion",
    "doc_dup_clusters",
    "doc_bm25_topk",
    "doc_repetition",
    "doc_pii_scrub",
    "doc_top_tokens",
    "emb_kmeans_profile",
    "emb_knn_ivf",
    "cdc_apply_latest",
    "scd2_history",
    "evt_ewma",
    "evt_interval_overlap",
    "evt_value_histogram",
    "emb_pca_profile",
    "doc_cms_counts",
    "doc_ngram_containment",
    "fuzzy_name_pairs",
    "emb_near_dup_cosine",
    "doc_shuffle_shards",
    "doc_length_curriculum",
    "doc_nfc_normalize",
    "emb_hard_negatives",
    "graph_triangles",
    "evt_top_paths",
    "evt_bitmap_distinct",
    "evt_sessionize",
    "ts_interpolate",
    "doc_incremental_dedup",
    "emb_semantic_dedup",
    "doc_token_entropy",
    "evt_ks_test",
    "doc_bpe_encode",
    "evt_ivm_refresh",
    "evt_markov_transitions",
    "basket_brand_lift",
    "evt_ab_test",
    "doc_token_pmi",
    "geo_radius_pairs",
    "evt_sliding_distinct",
    "doc_readability",
    "doc_tfidf_keywords",
    "evt_cusum_changepoint",
    "evt_bootstrap_ci",
    "doc_cross_source_dups",
    "doc_rrf_fusion",
    "rev_gini_by_nation",
    "evt_benford",
    "doc_audio_bands",
    "evt_anova_f",
    "udf_scalar_pandas",
    "src_file_skipping_stats",
    "evt_lift_curve",
    "evt_auc",
    "evt_seasonal_decompose",
    "evt_session_corpus",
    "doc_ngram_novelty",
    "evt_survival_km",
    "ord_cohort_ltv",
    "graph_kcore",
    "src_binary_files",
    "evt_backtest_mae",
    "doc_k_anonymity",
    "evt_skyline",
    "scd2_pit_lookup",
    "evt_attribution",
    "agg_modern_surface",
    "hof_surface",
    "evt_path_entropy",
    "evt_outage_gaps",
    "doc_feature_hashing",
    "emb_knn_pq",
    "evt_debounce",
    "evt_activity_matrix",
    "doc_zipf_fit",
    "evt_peak_detection",
    "doc_dedup_eval",
    "ord_ship_latency",
    "evt_inactive_users",
    "emb_centroid_drift",
    "evt_mom_change",
    "doc_dup_rate_by_source",
    "evt_user_growth",
    "doc_image_neardup",
    "doc_audio_neardup",
]


def build(spark, factor: int, out_dir: str) -> None:
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    copies = spark.range(factor).withColumnRenamed("id", "copy")
    big_docs = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            # perturb: suffix a copy-specific token so exact/near dedup
            # doesn't merge all replicas into one cluster
            F.concat_ws(" ", "text", F.concat(F.lit("rep"), F.col("copy"))).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 5).alias("n_chars"),
        )
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_emb = emb.count()
    big_emb = (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * n_emb).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + (F.col("copy") % 7) * 0.001 * (i % 5),
            ).cast("array<float>").alias("embedding"),
            "label",
        )
    )
    big_emb.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n_ev = ev.count()
    big_ev = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("copy") * n_ev).alias("event_id"),
        # shift each copy by its own hour so time-bucketed ops see a
        # longer series, not the same instants duplicated
        (F.col("ts") + F.make_interval(hours=F.col("copy").cast("int"))).alias("ts"),
        (F.col("user_id") + F.col("copy") * 1000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    big_ev.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )

    part = spark.read.parquet(f"{BASE}/part.parquet")
    n_part = part.count()
    big_part = part.crossJoin(copies).select(
        (F.col("p_partkey") + F.col("copy") * n_part).alias("p_partkey"),
        # suffix the name per copy so the DISTINCT-value domain (what the
        # fuzzy matcher actually scales in) grows with the factor
        F.concat_ws(" ", "p_name", F.concat(F.lit("v"), F.col("copy"))).alias("p_name"),
        "p_brand", "p_type", "p_size", "p_retailprice",
    )
    big_part.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/part.parquet"
    )

    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    n_li = li.count()
    big_li = li.crossJoin(copies).select(
        (F.col("l_orderkey") + F.col("copy") * n_li).alias("l_orderkey"),
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    )
    big_li.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )

    # orders replicated (same custkeys: per-customer rollups see 10x
    # input rows, the scale-relevant part of revenue-concentration ops);
    # dims copied as-is
    od = spark.read.parquet(f"{BASE}/orders.parquet")
    n_od = od.count()
    big_od = od.crossJoin(copies).select(
        (F.col("o_orderkey") + F.col("copy") * n_od).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    )
    big_od.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/orders.parquet"
    )
    for dim in ("customer", "nation", "region", "supplier"):
        spark.read.parquet(f"{BASE}/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{dim}.parquet")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ops = sys.argv[2:] or DEFAULT_OPS
    out_dir = f"/tmp/stress_{factor}x"
    spark = get_spark("stress")
    if not os.path.exists(f"{out_dir}/orders.parquet"):
        t0 = time.perf_counter()
        build(spark, factor, out_dir)
        print(f"built {factor}x corpus in {time.perf_counter() - t0:.1f}s")
    registry = all_queries()
    for name in ops:
        t0 = time.perf_counter()
        n = registry[name].fn(spark, out_dir).count()
        print(f"{name}: {time.perf_counter() - t0:.2f}s ({n} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
