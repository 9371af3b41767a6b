"""Duplicate-cluster construction: connected components over near-dup
pairs, then keep-one-per-cluster survivor selection.

The reference has no graph/dedup machinery at all (its only dedup-adjacent
semantics is idempotent upsert-by-key, Consumer.scala:159-165); this is the
north-star piece that turns pairwise near-dup evidence (minhash/simhash/
ngram/embedding pair ops in this package) into the thing a training-data
pipeline actually needs: ONE representative per duplicate cluster.

Algorithm: iterative min-label propagation (Pregel-style), fully
distributed:

  label(v) <- min(label(v), min_{u in N(v)} label(u))   until fixpoint

Each round is one shuffle join (labels onto the symmetric edge list) plus
one min-aggregate — both partial-aggregated map-side by Catalyst. Rounds
needed = component diameter. Near-dup graphs are LSH-bucket cliques plus
short bridges, so diameter is tiny (2-4) regardless of corpus size; the
pathological chain case that motivates O(log n) alternating large-star /
small-star (Kiveris et al., "Connected Components in MapReduce and
Beyond") cannot arise from band-bucket joins, so the simpler scheme is
also the faster one at 100 TB. Per round the labels frame is
`localCheckpoint`ed: truncating lineage keeps plan size O(1) across
iterations instead of O(rounds) (classic iterative-Spark trap), and the
convergence test reuses the checkpointed result instead of recomputing
the join chain.

Convergence detection is a single scalar aggregate — sum(label) — which
strictly decreases while any label changes (labels only ever decrease),
so no self-join-and-compare is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 25
) -> DataFrame:
    """(node, cluster_id) for every node appearing in `pairs`;
    cluster_id = min node id in the component."""
    # Symmetrize in ONE pass over `pairs` (explode of a 2-struct array)
    # rather than union of two selects: the union form evaluates the
    # upstream pair pipeline (e.g. the whole MinHash-LSH plan) once per
    # branch — 2x the dominant cost at any scale.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .persist()
    )
    # Seed = round 1 fused: label(v) = min(v, min neighbors) comes out of
    # the same aggregate that would otherwise just dedup the node list, so
    # one whole join+checkpoint round disappears. Checkpoints are LAZY
    # (eager=False): the convergence-sum action right below is what
    # writes the checkpoint blocks, so each round costs ONE Spark job
    # instead of two (eager checkpoint job + sum job) — the sum reads
    # the just-written blocks, later rounds' joins reuse them, and the
    # truncated lineage is identical to the eager form.
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("min_nbr"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("min_nbr")).alias("label"),
        )
        .localCheckpoint(eager=False)
    )
    # decimal(38,0) sum: labels are 60-bit md5 ids, so an int64 sum
    # overflows (ANSI error) once the node count passes ~a dozen rows;
    # decimal keeps the strictly-decreasing convergence metric exact up
    # to 10^38 — enough for 10^18 nodes
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)"))
    ).collect()[0][0]
    for _ in range(max_iter):
        nbr = edges.join(labels, edges.v == labels.node).select(
            F.col("u").alias("node"), "label"
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select("node", F.col("label").alias("cluster_id"))


def dup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Assign every document a duplicate-cluster id and survivor flag.

    Returns (doc_id, cluster_id, cluster_size, is_survivor):
    - cluster_id: min doc_id of the near-dup component (own id for
      singletons — docs with no near-dup evidence),
    - cluster_size: docs in the cluster (1 for singletons),
    - is_survivor: this doc is the cluster representative; filtering on
      it yields the deduplicated corpus.

    The components frame is tiny relative to the corpus (only docs that
    appear in some near-dup pair), so the label join onto the full corpus
    is broadcast-able; sizes come from one count aggregate on the labeled
    corpus.
    """
    cc = connected_components(pairs)
    labeled = (
        docs.select(F.col(id_col).cast("bigint").alias("doc_id"))
        .join(F.broadcast(cc), F.col("doc_id") == cc.node, "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(F.broadcast(sizes), "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_survivor"),
    )


def quality_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Quality-ranked survivor per duplicate cluster.

    `dup_clusters` keeps the min-id doc — fine for determinism, wrong for
    corpus quality: when a cluster mixes a clean page and its boilerplate-
    ridden mirror, the pipeline should keep the BEST copy. Returns one
    row per multi-doc cluster: (cluster_id, survivor_id, cluster_size,
    survivor_score) with survivor = argmax(score), ties broken toward the
    smaller id (deterministic, oracle-matched).

    Plan shape: the components frame (only docs with near-dup evidence)
    broadcasts onto the corpus as an inner join, and the argmax is ONE
    partial-aggregated max(struct(score, -id, id)) — no window sort, no
    second shuffle of the corpus.
    """
    cc = connected_components(pairs)
    labeled = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(score_col).cast("bigint").alias("score"),
    ).join(F.broadcast(cc), F.col("doc_id") == cc.node, "inner")
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("score"),
                    (-F.col("doc_id")).alias("neg_id"),
                    F.col("doc_id").alias("survivor_id"),
                )
            ).alias("m"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .select(
            "cluster_id",
            F.col("m.survivor_id").alias("survivor_id"),
            "cluster_size",
            F.col("m.score").alias("survivor_score"),
        )
    )
