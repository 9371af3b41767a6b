"""Similarity-search queries over `embeddings` (array<float>, 64-dim).

Cosine is computed in double on both engines (Spark casts the float
arrays; the oracle casts to DOUBLE[]) and rounded to 6 dp BEFORE ranking
or thresholding, with id tie-breaks — so ranks are reproducible across
engines despite float accumulation differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.embedding import embedding_near_dup_pairs
from ..functions.vectors import l2_norm
from ..similarity import brute_force_knn, lsh_knn
from ..sources.batch import read_table
from . import QuerySpec

N_QUERIES = 5  # first N vec_ids act as the query set
TOP_K = 10


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return brute_force_knn(emb, queries, "vec_id", "embedding", k=TOP_K)


ORACLE_KNN = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id != q.query_id
), ranked AS (
    SELECT *, row_number() OVER
        (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
    FROM scored
)
SELECT query_id, neighbor_id, cosine, cast(rk AS int) AS rk
FROM ranked WHERE rk <= {TOP_K}
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (similarity/contrastive.py): per
    vector, the most-similar DIFFERENT-label vector via the blocked
    block-pair GEMM layout — O(n·B) candidate rows then a partial-agg
    argmax reduce; rows_per_block=256 forces a multi-block plan at test
    scale so the oracle exercises the distributed shape."""
    from ..similarity.contrastive import hard_negatives

    emb = read_table(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb, "vec_id", "embedding", "label", rows_per_block=256
    )


ORACLE_HARD_NEGATIVES = """
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
           WHERE label IS NOT NULL),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.ev, b.ev), 6) AS cosine
  FROM v a JOIN v b ON a.label <> b.label
),
ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine FROM ranked WHERE rk = 1
"""


def q_near_dup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs via the blocked block-pair GEMM path — the
    scale-safe default (no corpus-sized driver collect or broadcast).
    rows_per_block=256 forces a genuinely multi-block plan even at test
    scale (sf0.01: 2 blocks, sf0.1: 8), so the driver oracle exercises
    the same distributed shape a 100 TB run would use."""
    emb = read_table(spark, sf_dir, "embeddings")
    # mode pinned: this query's CONTRACT is exactness (the oracle is the
    # all-pairs join), so it must not ride mode='auto' into the
    # approximate LSH path past the corpus-count ceiling.
    return embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, rows_per_block=256,
        mode="blocked",
    )


ORACLE_NEAR_DUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
"""


def _ann_recall_contract(
    exact: DataFrame, ann: DataFrame, bound: float
) -> DataFrame:
    """Fold an approximate-retrieval result into a hash-comparable oracle
    contract (the doc_dedup_eval pattern, per-query): emit the EXACT side
    (count + sorted neighbor ids — DuckDB-computable) plus `recall_ok`,
    a boolean derived from the ANN hits against the exact set. The ANN
    path stays load-bearing — a broken index/quantizer drops recall below
    the pinned bound, flips the boolean, and the value hash mismatches —
    while every emitted value is deterministic. Join cost: the hit probe
    is (n_queries·k) vs (n_queries·k) rows, both sides tiny and
    query-partitioned regardless of corpus size."""
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    per = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("neighbor_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("exact_ids"),
    )
    return per.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        "exact_ids",
        (
            F.coalesce(F.col("hits"), F.lit(0))
            >= F.lit(bound) * F.col("n_exact")
        ).alias("recall_ok"),
    )


def _oracle_ann_recall() -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id != q.query_id
), ranked AS (
    SELECT *, row_number() OVER
        (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
    FROM scored
)
SELECT query_id, count(*) AS n_exact,
       string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY neighbor_id)
         AS exact_ids,
       TRUE AS recall_ok
FROM ranked WHERE rk <= {TOP_K}
GROUP BY query_id
"""


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN, emitted as the per-query recall contract vs the
    exact search (_ann_recall_contract): bound 0.8 — the hyperplane
    bucketing is probabilistic but deterministic (seeded planes), so the
    measured recall is a fixed property of the data."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    ann = lsh_knn(emb, queries, "vec_id", "embedding", k=TOP_K, planes=3, tables=16)
    exact = brute_force_knn(emb, queries, "vec_id", "embedding", k=TOP_K)
    return _ann_recall_contract(exact, ann, bound=0.8)


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (centroid inverted lists, nprobe probing), emitted as
    the per-query recall contract vs the exact search; bound 0.7."""
    from ..similarity.ivf import ivf_knn

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    ann = ivf_knn(emb, queries, "vec_id", "embedding", k=TOP_K, nlist=16, nprobe=8)
    exact = brute_force_knn(emb, queries, "vec_id", "embedding", k=TOP_K)
    return _ann_recall_contract(exact, ann, bound=0.7)


def q_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array math surface: mean L2 norm per label."""
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.round(F.avg(l2_norm("embedding")), 6).alias("avg_norm"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


ORACLE_NORM_STATS = """
SELECT label,
       round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 6) AS avg_norm,
       count(*) AS n_vecs
FROM embeddings GROUP BY label
"""


def q_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode surface: per-dimension mean/min/max over all embeddings
    (the column-profile pass of an embedding-quality check)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "val"))
        .select(F.col("pos").cast("bigint").alias("pos"), "val")
        .groupBy("pos")
        .agg(
            F.round(F.avg("val"), 6).alias("mean_val"),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
        )
    )


ORACLE_DIM_STATS = """
WITH flat AS (
    SELECT unnest(generate_series(1, len(embedding))) - 1 AS pos,
           unnest(embedding) AS val
    FROM embeddings
)
SELECT pos, round(avg(val), 6) AS mean_val,
       round(min(val), 6) AS min_val,
       round(max(val), 6) AS max_val
FROM flat GROUP BY pos
"""


def q_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-cohesion profile with an EXACT oracle (unlike k-means):
    per-label centroid (posexplode → per-(label,pos) avg → rebuilt array,
    |labels|×dim rows — tiny), broadcast back onto the vectors, cosine of
    each vector to its own label centroid, aggregated per label. The fact
    table never shuffles: one pass for centroids, one broadcast-join pass
    for scoring. Cosines round to 6 dp before aggregating; the mean
    rounds to 4 so float accumulation order can't flip the hash."""
    from ..functions.vectors import cosine_similarity

    emb = read_table(spark, sf_dir, "embeddings")
    dims = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    cent = dims.groupBy("label", "pos").agg(F.avg("val").alias("cval"))
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s["cval"],
        ).alias("centroid")
    )
    scored = emb.join(F.broadcast(cent_arr), "label").select(
        "label",
        F.round(cosine_similarity("embedding", "centroid"), 6).alias("cos"),
    )
    return scored.groupBy("label").agg(
        F.round(F.avg("cos"), 4).alias("avg_cohesion"),
        F.round(F.min("cos"), 6).alias("min_cohesion"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


ORACLE_LABEL_COHESION = """
WITH flat AS (
    SELECT label, vec_id,
           unnest(generate_series(1, len(embedding))) - 1 AS pos,
           unnest(embedding::DOUBLE[]) AS val
    FROM embeddings
),
cent AS (SELECT label, pos, avg(val) AS cval FROM flat GROUP BY label, pos),
cent_arr AS (SELECT label, list(cval ORDER BY pos) AS centroid FROM cent GROUP BY label),
scored AS (
    SELECT e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) AS cos
    FROM embeddings e JOIN cent_arr c USING (label)
)
SELECT label, round(avg(cos), 4) AS avg_cohesion,
       round(min(cos), 6) AS min_cohesion, count(*) AS n_vecs
FROM scored GROUP BY label
"""


def q_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spherical k-means (similarity/kmeans.py): fit over the
    full table (per-batch partial sums, k×dim bytes shuffled/iter),
    assign, and report the per-cluster profile. Iterative — no SQL
    oracle; determinism and separation are unit-tested."""
    from ..similarity.kmeans import kmeans_cluster_profile

    emb = read_table(spark, sf_dir, "embeddings")
    return kmeans_cluster_profile(emb, "vec_id", "embedding", k=8, iters=4)


def q_pca_profile(spark, sf_dir: str):
    """Distributed PCA variance profile: one Arrow pass emitting d-dim/
    d^2 partials, driver-side d x d eigensolve. Rows-only (eigenvalues
    are not SQL-expressible); tests/test_llm_ops.py checks against an
    exact single-node NumPy PCA."""
    from .. similarity.pca import pca_variance_profile

    emb = read_table(spark, sf_dir, "embeddings")
    return pca_variance_profile(emb, "embedding", top=10)


def q_knn_sq8(spark, sf_dir: str):
    """int8 scalar-quantized ANN (similarity/quantized.py): 4x less scan/
    Arrow/cache traffic than float32 brute force — emitted as the
    per-query recall contract vs the exact search; bound 0.9 (the
    quantization grid is deterministic, so recall is a fixed property
    of the data)."""
    from ..similarity.quantized import sq8_knn

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    ann = sq8_knn(emb, queries, "vec_id", "embedding", k=TOP_K)
    exact = brute_force_knn(emb, queries, "vec_id", "embedding", k=TOP_K)
    return _ann_recall_contract(exact, ann, bound=0.9)


SEMDEDUP_THRESHOLD = 0.3  # synthetic vectors are near-orthogonal; real
# sentence embeddings would use ~0.95 (SemDeDup paper) — the operator is
# threshold-agnostic, the query pins a value that exercises it on this data


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup pruning (dedup/semdedup.py): `label` stands in for the
    k-means cluster id; emit the dropped set with each drop's best
    smaller-id cosine. One cluster-keyed shuffle, per-cluster GEMM."""
    from ..dedup.semdedup import semantic_dedup_dropped

    # NULL labels are excluded on BOTH engines: the oracle's equi-join
    # drops them silently, while groupBy would form a NULL cluster —
    # filtering keeps the semantics identical if testdata ever ships nulls
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()
    )
    return semantic_dedup_dropped(
        emb, "vec_id", "embedding", "label", threshold=SEMDEDUP_THRESHOLD
    ).select(
        F.col("id").alias("vec_id"),
        F.col("cluster").alias("label"),
        F.round("best_dup_cos", 6).alias("best_dup_cos"),
    )


ORACLE_SEMDEDUP = f"""
WITH pairs AS (
  SELECT b.vec_id AS vec_id, b.label AS label,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 6) AS c
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_id, label, max(c) AS best_dup_cos
FROM pairs WHERE c >= {SEMDEDUP_THRESHOLD}
GROUP BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "emb_semantic_dedup": QuerySpec(
        q_semantic_dedup,
        ORACLE_SEMDEDUP,
        "SemDeDup in-cluster semantic pruning (per-cluster GEMM)",
    ),
    "emb_knn_sq8": QuerySpec(
        q_knn_sq8,
        _oracle_ann_recall(),
        "int8 SQ ANN: exact top-k + per-query recall>=bound contract",
    ),
    "emb_pca_profile": QuerySpec(
        q_pca_profile, None, "PCA explained-variance profile (algebraic partials)"
    ),
    "emb_kmeans_profile": QuerySpec(
        q_kmeans_profile, None, "distributed k-means cluster profile"
    ),
    "emb_dim_stats": QuerySpec(q_dim_stats, ORACLE_DIM_STATS, "posexplode dim profile"),
    "emb_hard_negatives": QuerySpec(
        q_hard_negatives,
        ORACLE_HARD_NEGATIVES,
        "contrastive hard-negative mining (blocked GEMM, argmax reduce)",
    ),
    "emb_knn_bruteforce": QuerySpec(q_knn_bruteforce, ORACLE_KNN, "exact cosine top-k"),
    "emb_near_dup_cosine": QuerySpec(
        q_near_dup_cosine, ORACLE_NEAR_DUP, "cosine near-dup pairs"
    ),
    "emb_knn_lsh": QuerySpec(
        q_knn_lsh,
        _oracle_ann_recall(),
        "LSH ANN: exact top-k + per-query recall>=bound contract",
    ),
    "emb_knn_ivf": QuerySpec(
        q_knn_ivf,
        _oracle_ann_recall(),
        "IVF-Flat ANN: exact top-k + per-query recall>=bound contract",
    ),
    "emb_norm_stats": QuerySpec(q_norm_stats, ORACLE_NORM_STATS, "array math stats"),
    "emb_label_cohesion": QuerySpec(
        q_label_cohesion,
        ORACLE_LABEL_COHESION,
        "per-label centroid cosine cohesion (exact, broadcast centroids)",
    ),
}


STD_SAMPLE_IDS = 50  # bound the verified output; stats still use ALL rows


def q_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature scaling (the pre-training normalization pass): per-dim
    z-score standardization. Per-dimension mean/stddev_pop come from ONE
    posexplode aggregate over the whole corpus (64 rows out), get rounded
    to 9 dp (pinning the intermediate so both engines divide identical
    doubles), and are BROADCAST back onto the vectors — the stats table
    is dim-sized no matter the corpus, so the normalize pass is a narrow
    broadcast join + projection, one shuffle total. Output bounded to
    vec_id < 50 for the oracle; the aggregate is corpus-wide."""
    emb = read_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", F.col("pos").cast("bigint").alias("pos"), F.col("val").cast("double").alias("val"))
    stats = flat.groupBy("pos").agg(
        F.round(F.avg("val"), 9).alias("mu"),
        F.round(F.stddev_pop("val"), 9).alias("sd"),
    )
    z = (
        flat.filter(F.col("vec_id") < STD_SAMPLE_IDS)
        .join(F.broadcast(stats), "pos")
        .select(
            "vec_id",
            "pos",
            (
                F.floor((F.col("val") - F.col("mu")) / F.col("sd") * 1e6 + 0.5) / 1e6
            ).alias("z"),
        )
    )
    return z


ORACLE_STANDARDIZE = f"""
WITH flat AS (
  SELECT vec_id, unnest(generate_series(1, len(embedding))) - 1 AS pos,
         unnest(embedding::DOUBLE[]) AS val
  FROM embeddings
), stats AS (
  SELECT pos, round(avg(val), 9) AS mu, round(stddev_pop(val), 9) AS sd
  FROM flat GROUP BY pos
)
SELECT f.vec_id, f.pos, floor((f.val - s.mu) / s.sd * 1e6 + 0.5) / 1e6 AS z
FROM flat f JOIN stats s USING (pos)
WHERE f.vec_id < {STD_SAMPLE_IDS}
"""


QUERIES["emb_standardize"] = QuerySpec(
    q_standardize,
    ORACLE_STANDARDIZE,
    "per-dim z-score scaling (corpus stats broadcast, pinned intermediates)",
)


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC ANN (similarity/pq.py), emitted as the
    per-query recall contract vs the exact search (these isotropic
    synthetic vectors are PQ's worst case, hence the fine m=32/ksub=64
    config and the looser 0.6 per-query bound)."""
    from ..similarity.pq import pq_knn

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    ann = pq_knn(emb, queries, "vec_id", "embedding", k=TOP_K)
    exact = brute_force_knn(emb, queries, "vec_id", "embedding", k=TOP_K)
    return _ann_recall_contract(exact, ann, bound=0.6)


QUERIES["emb_knn_pq"] = QuerySpec(
    q_knn_pq,
    _oracle_ann_recall(),
    "PQ/ADC ANN: exact top-k + per-query recall>=bound contract",
)


def q_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: split the corpus into two cohorts
    (vec_id parity — stand-in for yesterday/today snapshots) and report
    the cosine between each label's per-cohort centroid. The shuffle
    carries (label, cohort, dim) partial sums — d rows per label per
    cohort, independent of corpus size; the cosine combine runs on the
    labels x d table. The production alarm for silent embedding-model
    or upstream-distribution changes."""
    emb = read_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("cohort"),
        F.posexplode("embedding").alias("dim", "val"),
    )
    cent = dims.groupBy("label", "cohort", "dim").agg(
        F.avg("val").alias("c"), F.count(F.lit(1)).alias("n")
    )
    a = cent.filter(F.col("cohort") == 0).select(
        "label", "dim", F.col("c").alias("ca"), F.col("n").alias("na")
    )
    b = cent.filter(F.col("cohort") == 1).select(
        "label", "dim", F.col("c").alias("cb"), F.col("n").alias("nb")
    )
    j = a.join(b, ["label", "dim"])
    return j.groupBy("label").agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.round(
            F.sum(F.col("ca") * F.col("cb"))
            / (
                F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
            ),
            6,
        ).alias("centroid_cosine"),
    )


ORACLE_CENTROID_DRIFT = """
WITH dims AS (
  SELECT label, vec_id % 2 AS cohort,
         unnest(generate_series(1, len(embedding))) - 1 AS dim,
         unnest(embedding) AS val
  FROM embeddings
),
cent AS (
  SELECT label, cohort, dim, avg(val) AS c, count(*) AS n
  FROM dims GROUP BY 1, 2, 3
),
j AS (
  SELECT a.label, a.dim, a.c AS ca, b.c AS cb, a.n AS na, b.n AS nb
  FROM cent a JOIN cent b
    ON a.label = b.label AND a.dim = b.dim
   AND a.cohort = 0 AND b.cohort = 1
)
SELECT label, max(na) AS n_a, max(nb) AS n_b,
       round(sum(ca * cb) / (sqrt(sum(ca * ca)) * sqrt(sum(cb * cb))), 6)
         AS centroid_cosine
FROM j GROUP BY label
"""


QUERIES["emb_centroid_drift"] = QuerySpec(
    q_centroid_drift,
    ORACLE_CENTROID_DRIFT,
    "per-label cohort centroid cosine (d-rows-per-label shuffle)",
)


def q_knn_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (similarity/quantized.py::sq8_rerank_knn):
    SQ8 coarse shortlist over int8 codes (the only corpus scan, 4x less
    bandwidth) → exact full-precision rerank of the tiny shortlist via a
    broadcast probe — the standard production ANN shape. Emitted as the
    per-query recall contract vs brute force; bound 0.9 (rerank recall
    is pinned ≥ the sq8-only path by test, and sq8 holds 0.9 here)."""
    from ..similarity.quantized import sq8_rerank_knn

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    ann = sq8_rerank_knn(emb, queries, "vec_id", "embedding", k=TOP_K, shortlist=50)
    exact = brute_force_knn(emb, queries, "vec_id", "embedding", k=TOP_K)
    return _ann_recall_contract(exact, ann, bound=0.9)


QUERIES["emb_knn_rerank"] = QuerySpec(
    q_knn_rerank,
    _oracle_ann_recall(),
    "two-stage SQ8-shortlist + exact-rerank ANN: recall contract",
)


def q_pca_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-oracled verification contract for the distributed PCA (the
    profile itself stays rows-only — eigenvalues aren't SQL): the TRACE
    IDENTITY Σλᵢ = Σ per-dim variance ties the driver-side eigensolve to
    a quantity DuckDB computes exactly from the raw vectors, and two
    structural booleans (eigenvalues descending, explained ratios
    summing to 1) pin the spectrum's shape. A broken covariance
    assembly, eigensolve, or partial-sum merge breaks the trace match
    and flips the hash. Costs one extra posexplode aggregate next to the
    PCA's single Arrow pass."""
    from ..similarity.pca import pca_variance_profile

    from pyspark.sql import Window

    emb = read_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    # .limit(dim) makes the bound PROVABLE to the plan-hygiene invariant:
    # createDataFrame under Arrow compiles to a LogicalRDD, which the
    # checker (rightly) refuses to treat as bounded input for a
    # no-partition Window. The limit is a no-op at runtime (the frame is
    # exactly dim rows) but puts a Limit node under the Window.
    spectrum = pca_variance_profile(emb, "embedding", top=dim).limit(dim)
    w = Window.orderBy("component")
    stepped = spectrum.select(
        "eigenvalue",
        "explained_ratio",
        (F.col("eigenvalue") < F.lead("eigenvalue").over(w) - 1e-6)
        .cast("int")
        .alias("increases"),
    )
    eig = stepped.agg(
        F.sum("eigenvalue").alias("eig_total"),
        (F.coalesce(F.sum("increases"), F.lit(0)) == 0).alias(
            "eigs_descending"
        ),
        (F.abs(F.sum("explained_ratio") - 1.0) < 1e-3).alias("ratios_sum_1"),
    )
    flat = emb.select(F.posexplode("embedding").alias("pos", "val")).select(
        "pos", F.col("val").cast("double").alias("val")
    )
    trace = flat.groupBy("pos").agg(F.var_pop("val").alias("v")).agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.round(F.sum("v"), 4).alias("trace_var"),
    )
    n = emb.agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        n.crossJoin(F.broadcast(trace))
        .crossJoin(F.broadcast(eig))
        .select(
            "n_vecs",
            "n_dims",
            "trace_var",
            (
                F.abs(F.col("eig_total") - F.col("trace_var"))
                < 1e-3 * F.col("trace_var")
            ).alias("trace_match"),
            "eigs_descending",
            "ratios_sum_1",
        )
    )


ORACLE_PCA_CONTRACT = """
WITH flat AS (
  SELECT unnest(generate_series(1, len(embedding))) - 1 AS pos,
         unnest(embedding::DOUBLE[]) AS val
  FROM embeddings
),
pv AS (SELECT pos, var_pop(val) AS v FROM flat GROUP BY pos)
SELECT (SELECT count(*) FROM embeddings) AS n_vecs,
       count(*) AS n_dims,
       round(sum(v), 4) AS trace_var,
       TRUE AS trace_match,
       TRUE AS eigs_descending,
       TRUE AS ratios_sum_1
FROM pv
"""


KMEANS_K = 8


def q_kmeans_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-oracled verification contract for the distributed k-means
    (the cluster profile stays rows-only): the assignment is re-verified
    INDEPENDENTLY — every vector's stored best-centroid cosine must
    match the max over all k centroids recomputed via the codegen'd
    higher-order-function cosine on a broadcast centroid table — plus a
    partition-completeness check (cluster sizes sum to the corpus).
    A drifted centroid broadcast, a wrong argmax, or a lost row flips a
    boolean and the hash. The verify pass is one broadcast join of k
    rows onto the assignment frame."""
    import numpy as np

    from ..functions.vectors import cosine_similarity
    from ..similarity.kmeans import kmeans_assign, kmeans_fit

    emb = read_table(spark, sf_dir, "embeddings")
    C = np.asarray(kmeans_fit(emb, "vec_id", "embedding", KMEANS_K, iters=4))
    assigned = kmeans_assign(emb, C, "vec_id", "embedding")
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in C[i]]) for i in range(len(C))],
        "cluster_c int, centroid array<double>",
    )
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    best = (
        vecs.crossJoin(F.broadcast(cent))
        .groupBy("id")
        .agg(F.max(cosine_similarity("v", "centroid")).alias("best_cos"))
    )
    checked = assigned.join(best, "id").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (
            F.sum(
                (F.abs(F.col("cosine") - F.col("best_cos")) > 1e-6).cast(
                    "int"
                )
            )
            == 0
        ).alias("assignment_is_argmax"),
    )
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    complete = sizes.agg(F.sum("n").alias("n_assigned"))
    return (
        checked.crossJoin(F.broadcast(complete))
        .select(
            "n_vecs",
            F.lit(KMEANS_K).alias("k"),
            "assignment_is_argmax",
            (F.col("n_assigned") == F.col("n_vecs")).alias(
                "partition_complete"
            ),
        )
    )


ORACLE_KMEANS_CONTRACT = f"""
SELECT count(*) AS n_vecs, {KMEANS_K} AS k,
       TRUE AS assignment_is_argmax,
       TRUE AS partition_complete
FROM embeddings
"""


QUERIES["emb_pca_contract"] = QuerySpec(
    q_pca_contract,
    ORACLE_PCA_CONTRACT,
    "PCA trace-identity + spectrum-shape contract (eigensolve load-bearing)",
)
QUERIES["emb_kmeans_contract"] = QuerySpec(
    q_kmeans_contract,
    ORACLE_KMEANS_CONTRACT,
    "k-means assignment-argmax + partition-completeness contract",
)


MATRYOSHKA_DIM = 16


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval evaluation (MRL, Kusupati et al.
    2022 — modern embedding models pack coarse semantics into prefix
    dims so ANN can run on a 4x-smaller slice): per query, exact top-k
    under FULL-dim cosine vs top-k under the first-16-of-64-dim prefix,
    reporting overlap, recall@k, and both neighbor-identity sums so the
    oracle pins the exact member sets, not just counts. Both searches
    are the suite's brute_force_knn (broadcast query matrix, blocked
    NumPy GEMM, round-6 + id tie-break determinism)."""
    from ..similarity.knn import brute_force_knn

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    full = brute_force_knn(emb, queries, "vec_id", "embedding", k=TOP_K)
    sliced = emb.select(
        "vec_id", F.slice("embedding", 1, MATRYOSHKA_DIM).alias("embedding")
    )
    trunc = brute_force_knn(
        sliced,
        sliced.filter(F.col("vec_id") < N_QUERIES),
        "vec_id",
        "embedding",
        k=TOP_K,
    )
    f = full.groupBy("query_id").agg(
        F.sum("neighbor_id").alias("full_id_sum")
    )
    t = trunc.groupBy("query_id").agg(
        F.sum("neighbor_id").alias("trunc_id_sum")
    )
    ov = (
        full.select("query_id", "neighbor_id")
        .join(trunc.select("query_id", "neighbor_id"),
              ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return (
        f.join(t, "query_id")
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            "full_id_sum",
            "trunc_id_sum",
            F.coalesce("overlap", F.lit(0)).alias("overlap"),
            F.round(
                F.coalesce("overlap", F.lit(0)) / F.lit(float(TOP_K)), 6
            ).alias("recall_at_k"),
        )
    )


ORACLE_MATRYOSHKA = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {N_QUERIES}),
fullr AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                   q.qv), 6) DESC,
                      e.vec_id ASC) AS rk
    FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.query_id
  ) WHERE rk <= {TOP_K}
),
truncr AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(
                        (e.embedding::DOUBLE[])[1:{MATRYOSHKA_DIM}],
                        (q.qv)[1:{MATRYOSHKA_DIM}]), 6) DESC,
                      e.vec_id ASC) AS rk
    FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.query_id
  ) WHERE rk <= {TOP_K}
)
SELECT f.query_id,
       CAST(f.s AS BIGINT) AS full_id_sum,
       CAST(t.s AS BIGINT) AS trunc_id_sum,
       CAST(coalesce(o.c, 0) AS BIGINT) AS overlap,
       round(coalesce(o.c, 0) * 1.0 / {TOP_K}, 6) AS recall_at_k
FROM (SELECT query_id, sum(neighbor_id) AS s FROM fullr GROUP BY 1) f
JOIN (SELECT query_id, sum(neighbor_id) AS s FROM truncr GROUP BY 1) t
  USING (query_id)
LEFT JOIN (SELECT query_id, count(*) AS c
           FROM fullr JOIN truncr USING (query_id, neighbor_id)
           GROUP BY query_id) o USING (query_id)
"""


QUERIES["emb_matryoshka_recall"] = QuerySpec(
    q_matryoshka_recall,
    ORACLE_MATRYOSHKA,
    "prefix-dim (Matryoshka) retrieval vs full-dim exact: member-set pinned recall",
)


CBAL_CAP = 30


def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced / inverse-density sampling (operators/
    sampling.py::cluster_balanced_sample — the DataComp-style
    rebalancing step after clustering: dense embedding regions are
    down-sampled to ~cap rows per cluster so they stop dominating the
    training mix). `label` stands in for the upstream k-means cluster
    id (same convention as emb_semantic_dedup). → per-row ledger
    (vec_id, label, n_cluster, keep). The oracle replays the cluster
    counts, the integer keep-threshold floor(cap*10000/n), and the
    exact md5-mod gate — a hash, join, or threshold-arithmetic bug
    flips the hash.

    Spark shape (100 TB): one hash aggregate to the |clusters|-sized
    count table, a broadcast-able equi-join back, and a codegen'd
    filter — no window, no per-cluster sort (the row_number
    alternative would single-task the biggest cluster)."""
    from ..operators.sampling import cluster_balanced_sample

    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()
    )
    out = cluster_balanced_sample(
        emb.select("vec_id", "label"), "vec_id", "label", cap=CBAL_CAP
    )
    return out.select("vec_id", "label", "n_cluster", "keep")


ORACLE_CLUSTER_SAMPLE = f"""
WITH counts AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_cluster
  FROM embeddings WHERE label IS NOT NULL GROUP BY label
)
SELECT e.vec_id, e.label, c.n_cluster,
       (cast(('0x' || substr(md5(concat('cbal-v1',
            CAST(e.vec_id AS VARCHAR))), 1, 15)) AS bigint) % 10000)
         < least(10000, FLOOR({CBAL_CAP} * 10000 / c.n_cluster)) AS keep
FROM embeddings e JOIN counts c USING (label)
WHERE e.label IS NOT NULL
"""


QUERIES["emb_cluster_sample"] = QuerySpec(
    q_cluster_sample,
    ORACLE_CLUSTER_SAMPLE,
    "cluster-balanced sampling: per-cluster hash-rate keep, no window",
)
