"""Deterministic corpus splitting & sampling — training-data pipeline ops.

A training pipeline needs reproducible answers to "which split is this
row in?" and "is this row in the p% sample?" that (a) never change when
the corpus is re-read, re-partitioned, or grown, and (b) require no
shuffle, no RNG state, and no coordination. The standard trick: hash the
row's stable id with a salt and compare against fixed thresholds — a
pure per-row projection that runs inside whole-stage codegen, scales
embarrassingly at 100 TB, and (because we reuse the engine-wide md5
convention, functions/text.py::md5_64) reproduces bit-for-bit in the
DuckDB oracle.

`sampleBy`/`randomSplit` exist in Spark but are seed+partition-layout
dependent (randomSplit re-evaluates per partitioning); these are not —
that's the point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_64

_BUCKETS = 10_000


def hash_bucket(id_col: str | Column, salt: str) -> Column:
    """Stable bucket in [0, 10000) from (salt, id) — md5-derived."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_64(F.concat(F.lit(salt), c.cast("string"))) % _BUCKETS


def with_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test'/...) by hash
    bucket against cumulative weight thresholds. Weights must sum to 1.
    Label assignment is independent of row order, partitioning, and
    corpus growth (a row keeps its split when new rows arrive)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, salt)
    expr: Column | None = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        hi = round(acc * _BUCKETS)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float-roundoff guard: the last threshold is exactly _BUCKETS
    return df.withColumn(out_col, expr.otherwise(list(weights)[-1]))


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample-v1"
) -> DataFrame:
    """Keep ~fraction of rows, deterministically (hash threshold)."""
    return df.filter(hash_bucket(id_col, salt) < round(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible analogue of
    `df.sampleBy`): each stratum keeps its own fraction. Strata absent
    from `fractions` keep `default_fraction`. One codegen'd projection +
    filter — no shuffle."""
    s = F.col(strata_col)
    thr: Column = F.lit(round(default_fraction * _BUCKETS))
    for value, frac in fractions.items():
        thr = F.when(s == value, round(frac * _BUCKETS)).otherwise(thr)
    return df.filter(hash_bucket(id_col, salt) < thr)


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    cluster_col: str,
    cap: int,
    salt: str = "cbal-v1",
) -> DataFrame:
    """Cluster-balanced (inverse-density) sampling — the DataComp /
    SemDeDup-pipeline rebalancing step that keeps ~`cap` rows per
    cluster so dense regions of embedding space stop dominating the
    training mix: per cluster c with n_c rows, keep-rate
    r_c = min(1, cap/n_c), gated by the engine-wide md5 hash so the
    kept set is deterministic under re-partitioning, re-runs, and
    corpus growth within a cluster's count. Adds `n_cluster` and
    boolean `keep`; the integer threshold cap*10000 // n_c avoids
    float drift cross-engine.

    Spark shape (100 TB): one hash aggregate to the |clusters|-sized
    count table, one equi-join back (AQE broadcasts it when it fits),
    then a codegen'd hash filter — no window, no per-cluster sort, the
    same scale discipline as domain_caps (textstats/domains.py). The
    exact-k alternative (row_number per cluster) would make the
    biggest cluster a single-task sort."""
    counts = df.groupBy(cluster_col).agg(F.count("*").alias("n_cluster"))
    # floor() on BOTH engines: Spark's cast(bigint) truncates while
    # DuckDB's CAST rounds — floor is the one they agree on
    thr = F.least(F.lit(_BUCKETS).cast("bigint"),
                  F.floor(F.lit(cap * _BUCKETS) / F.col("n_cluster")))
    return (
        df.join(counts, cluster_col)
        .withColumn("keep", hash_bucket(id_col, salt) < thr)
    )


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: top-k rows by
    u^(1/w), u = md5-derived uniform (Efraimidis-Spirakis A-ES keys) —
    inclusion probability proportional to weight, the importance-sampling
    primitive for quality-weighted training-data selection.

    Spark shape: the key is a codegen'd expression; top-k is
    orderBy+limit → TakeOrderedAndProject (per-partition partial top-k,
    k rows per partition cross the wire — no global sort). Deterministic
    across partitionings and engines: u is md5 arithmetic (engine-wide
    convention), the key is rounded to 12 dp before ranking, and id
    breaks ties.

    Rows with NULL or non-positive weight are excluded before keying:
    pow(u, 1/0) yields NaN/Infinity, and Spark sorts NaN above every
    real key (DuckDB doesn't), so an unguarded zero-weight row would
    both hijack the top-k and break cross-engine determinism. A-ES is
    only defined for w > 0; weight<=0 means "never sample"."""
    u = (md5_64(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % F.lit(
        2147483647
    ) + 1) / F.lit(2147483647.0)
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    key = F.round(F.pow(u, 1.0 / w), 12)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__aes_key", key)
        .orderBy(F.desc("__aes_key"), F.col(id_col).asc())
        .limit(k)
        .drop("__aes_key")
    )


def alpha_rebalance(
    df: DataFrame,
    id_col: str,
    group_col: str,
    total: int,
    alpha: float = 0.3,
    salt: str = "alpha",
) -> DataFrame:
    """Temperature-based group rebalancing (the multilingual-pretraining
    alpha-sampling of XLM-R / mT5): target share of group g ∝ p_g^alpha
    where p_g is its corpus share, so low-resource groups are upsampled
    relative to their raw frequency (alpha < 1 flattens, 1 keeps, 0
    equalizes). Selection within each group is the deterministic md5
    order (salted id hash, id tie-break), capped at the group's
    available rows — exact-k per group, reproducible across engines.

    → the selected rows of `df` plus (n_avail, target_n) bookkeeping.

    Scale shape: the share table is |groups| rows built from one count
    shuffle and broadcast back; the exact-k rank is a window PARTITIONED
    BY group — fine while per-group rows fit a partition spill
    (languages: dozens of groups over the whole corpus — this is the
    documented skew point). For corpora where a single group exceeds a
    task's comfort, swap the rank for the hash-threshold variant
    (deterministic_split-style u < target/avail), which trades exact-k
    for a binomial-sized sample with zero skew."""
    from pyspark.sql import Window

    g = F.col(group_col)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_avail"))
    tot = counts.agg(F.sum("n_avail").alias("n_total"))
    # Cross-engine determinism: quantize p^alpha to integer pico-shares
    # BEFORE summing, so the normalizer z is an order-independent bigint
    # sum (float partial-sum ordering across engines/partitions cannot
    # flip a .5 rounding boundary), then compute the half-up-rounded
    # target entirely in integer arithmetic:
    #   round(share_q*total/z) = (2*share_q*total + z) div (2*z).
    # 2*share_q*total <= 2e12*total, so budgets up to ~4.6e6 stay inside
    # int64 — far beyond any per-call sample budget.
    shares = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "share_q",
            F.round(
                F.pow(F.col("n_avail") / F.col("n_total"), alpha) * F.lit(1e12)
            ).cast("bigint"),
        )
    )
    z = shares.agg(F.sum("share_q").alias("z"))
    targets = (
        shares.crossJoin(F.broadcast(z))
        .withColumn(
            "target_n",
            F.least(
                F.col("n_avail"),
                F.expr(
                    f"(2L * share_q * {int(total)}L + z) div (2L * z)"
                ),
            ),
        )
        .select(group_col, "n_avail", "target_n")
    )
    u = md5_64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    ranked = df.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy(g).orderBy(u.asc(), F.col(id_col).asc())
        ),
    )
    return (
        ranked.join(F.broadcast(targets), group_col)
        .filter(F.col("__rn") <= F.col("target_n"))
        .drop("__rn")
    )


def doremi_reweight(
    loss_df: DataFrame,
    domain_col: str,
    loss_col: str,
    iters: int = 5,
    eta: float = 0.5,
    smooth_micro: int = 100_000,
) -> DataFrame:
    """DoReMi-style domain-mixture reweighting (Xie et al. 2023 — Group-
    DRO exponentiated gradient): given one integer micro-nat loss per
    domain, run `iters` rounds of
        w_d <- normalize(w_d * exp(eta * (loss_d - sum_e w_e loss_e)))
    (harder-than-average domains gain weight each round because the
    weighted-average baseline moves WITH w), then mix with the uniform
    distribution (`smooth_micro`/1e6 mass) the way DoReMi regularizes
    its proxy weights. → (domain, loss_micro, w_micro) with
    sum(w_micro) ~ 1e6 (floor-rounding drift < |domains|).

    Cross-engine determinism: weights live as micro-unit bigints; each
    round does ONE exp() on an identically-derived double (the repo's
    ln/exp 1-ulp convention) quantized straight back to micro ints, and
    every other step — weighted mean, clip to ±2e6 micro-nats (also the
    int64-overflow guard: w*g*1e6 <= 2.8e18), product, floor-div
    normalize — is exact integer arithmetic mirrored op-for-op in the
    SQL oracle.

    Scale shape (100 TB): everything here is |domains|-sized (a corpus
    has dozens of sources); the corpus-sized work is in the caller's
    loss computation. The crossJoins broadcast 1-row totals.

    Reference parity: no sampling surface in the reference; north-star
    extension next to alpha_rebalance (the static-temperature
    counterpart — DoReMi is the loss-adaptive one).
    """
    MICRO = 1_000_000

    def fdiv(a: Column, b: Column) -> Column:
        return ((a - F.pmod(a, b)) / b).cast("bigint")

    w = loss_df.select(
        F.col(domain_col).alias("domain"),
        F.col(loss_col).cast("bigint").alias("loss_micro"),
    )
    k = w.count()  # bounded: |domains|
    if k == 0:
        raise ValueError("no domains to reweight")
    # localCheckpoint per round cuts the lineage: each round references
    # the previous table twice (the baseline aggregate and the step), so
    # an unmaterialized chain re-derives the corpus-sized loss input
    # 2^iters times — the same fix the k-core peel uses. The
    # checkpointed table is |domains| rows.
    w = w.withColumn(
        "w", F.lit(MICRO // k).cast("bigint")
    ).localCheckpoint()
    for _ in range(iters):
        tot = w.agg(
            F.sum(F.col("w") * F.col("loss_micro")).cast("bigint").alias("s")
        )
        stepped = (
            w.crossJoin(F.broadcast(tot))
            .withColumn(
                "ex",
                F.least(
                    F.greatest(
                        F.col("loss_micro") - fdiv(F.col("s"), F.lit(MICRO)),
                        F.lit(-2 * MICRO),
                    ),
                    F.lit(2 * MICRO),
                ),
            )
            .withColumn(
                "g",
                F.round(
                    F.exp(
                        F.lit(eta)
                        * (F.col("ex").cast("double") / F.lit(float(MICRO)))
                    )
                    * MICRO
                ).cast("bigint"),
            )
            .withColumn("raw", F.col("w") * F.col("g"))
        )
        z = stepped.agg(F.sum("raw").cast("bigint").alias("z"))
        # normalize as raw // (z // 1e6), NOT (raw * 1e6) // z: Spark's
        # bigint division routes through doubles, so every intermediate
        # must stay under 2^53 for the floor-div identity to be exact
        # (raw <= 2.8e12 here; raw * 1e6 would not be). The SQL oracle
        # mirrors the same two floor-divs.
        w = stepped.crossJoin(F.broadcast(z)).select(
            "domain",
            "loss_micro",
            fdiv(F.col("raw"), fdiv(F.col("z"), F.lit(MICRO))).alias("w"),
        ).localCheckpoint()
    return w.select(
        "domain",
        "loss_micro",
        (
            fdiv(F.lit(MICRO - smooth_micro) * F.col("w"), F.lit(MICRO))
            + F.lit(smooth_micro // k)
        ).cast("bigint").alias("w_micro"),
    )


def token_budget_plan(
    df: DataFrame,
    text_col: str,
    source_col: str,
    budget_tokens: int,
    over_epochs_milli: int = 4000,
) -> DataFrame:
    """Turn a token budget into a concrete per-source sampling plan —
    the step between choosing mixture weights and actually writing
    training shards. Per source: sqrt-flattened (temperature-2) share
    of `budget_tokens`, the implied repetition factor in milli-epochs
    (alloc / available), and the Muennighoff et al. 2023
    data-constrained flag (repeating past ~4 epochs stops helping,
    arXiv:2305.16264).

    → (source, n_tokens, r_micro, alloc_tokens, epochs_milli,
    over_epoch_limit). Integer-exact cross-engine: sqrt is correctly
    rounded per IEEE-754 in both engines (unlike pow), it is quantized
    to integer micro-units BEFORE summing (so the total is an
    order-free bigint sum), and every floor-div intermediate stays
    under 2^53 (the engine-wide double-routed-division rule).

    Scale shape (100 TB): one token-count aggregate to a
    |sources|-sized table; everything after is per-row arithmetic on
    that bounded table."""
    from ..functions.text import token_count

    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count(text_col)).alias("n_tokens")
    )
    per = per.withColumn(
        "r_micro",
        F.floor(F.sqrt(F.col("n_tokens")) * F.lit(1e6)).cast("bigint"),
    )
    tot = per.agg(F.sum("r_micro").alias("__t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            "alloc_tokens",
            F.floor(
                F.col("r_micro")
                * (F.lit(float(budget_tokens)) / F.col("__t"))
            ).cast("bigint"),
        )
        .withColumn(
            "epochs_milli",
            F.floor(F.col("alloc_tokens") * 1000 / F.col("n_tokens")).cast(
                "bigint"
            ),
        )
        .withColumn(
            "over_epoch_limit",
            F.col("epochs_milli") > F.lit(over_epochs_milli),
        )
        .drop("__t")
    )
