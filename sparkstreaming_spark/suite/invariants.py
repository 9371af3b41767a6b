"""In-sim invariants for the rows-only registry entries.

Eight queries have no DuckDB oracle (iterative fixpoints, eigensolves,
FFTs — things ANSI SQL can't express). Their semantics are pinned by
dedicated pytest suites, but the driver's own correctness run only saw
"rows-only: N rows" for them. This module lifts the strongest of those
checks into driver-executable form: each entry takes (spark, sf_dir,
result_pandas) for a query that ALREADY ran and returns None when the
invariant holds, else a failure message. tools/driver_sim.py runs them
so the per-round correctness gate proves these eight too, not just the
334 oracled queries.

Checks are independent recomputations (pure-Python / NumPy references,
or structural properties like "every surviving k-core node keeps
induced degree >= k"), not re-runs of the code under test.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

InvariantFn = Callable[[SparkSession, str, pd.DataFrame], "str | None"]

INVARIANTS: dict[str, InvariantFn] = {}


def _register(name: str):
    def deco(fn: InvariantFn) -> InvariantFn:
        INVARIANTS[name] = fn
        return fn

    return deco


def _word_counts(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Corpus word frequencies under the engine-wide tokenize()
    convention — the shared input of both tokenizer-training
    references. Vocabulary-sized (not corpus-sized) driver collect."""
    from ..functions.text import tokenize
    from ..sources.batch import read_table

    d = read_table(spark, sf_dir, "documents")
    rows = (
        d.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r.word: r.n for r in rows}


@_register("graph_kcore")
def _inv_kcore(spark: SparkSession, sf_dir: str, pdf: pd.DataFrame):
    """Every surviving node's degree within the INDUCED subgraph must be
    >= k (the defining k-core property), computed with plain joins —
    independent of the peel loop's own core_degree bookkeeping — and the
    profile row must match the induced-subgraph counts."""
    from ..operators.graph import kcore_nodes
    from .enrich import KCORE_K, copurchase_edges

    raw = copurchase_edges(spark, sf_dir)
    core = kcore_nodes(raw, KCORE_K).select("node")
    # mirror the operator's graph semantics: simple undirected graph
    # (self-loops dropped, multi-edges collapsed) — the degree property
    # itself is then recounted with plain joins
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    inside = (
        edges.join(core.withColumnRenamed("node", "src"), "src")
        .join(core.withColumnRenamed("node", "dst"), "dst")
    )
    deg = (
        inside.select(F.col("src").alias("node"))
        .unionAll(inside.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    prof = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("d") / 2).cast("bigint").alias("n_edges"),
        F.min("d").alias("min_d"),
        F.max("d").alias("max_d"),
    ).first()
    if prof.min_d is not None and prof.min_d < KCORE_K:
        return f"induced degree {prof.min_d} < k={KCORE_K} inside the core"
    r = pdf.iloc[0]
    got = (r.n_core_nodes, r.n_core_edges, r.min_degree, r.max_degree)
    want = (prof.n_nodes, prof.n_edges, prof.min_d, prof.max_d)
    # An empty k-core is a VALID result (sparser corpus / higher k):
    # both sides then carry NULL/NaN degree stats — compare presence,
    # not int(NaN).
    def norm(t):
        return tuple(
            None if x is None or (isinstance(x, float) and x != x) else int(x)
            for x in t
        )
    if norm(got) != norm(want):
        return f"profile {got} != induced-subgraph recount {want}"
    return None


@_register("emb_pca_profile")
def _inv_pca(spark: SparkSession, sf_dir: str, pdf: pd.DataFrame):
    """Distributed algebraic partials must match the exact single-node
    NumPy covariance eigensolve (same check as
    tests/test_llm_ops.py::test_pca_profile_matches_exact_numpy)."""
    import numpy as np

    from ..sources.batch import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    X = np.stack(
        emb.select("embedding").toPandas()["embedding"].to_numpy()
    ).astype("float64")
    cov = np.cov(X, rowvar=False, bias=True)
    evals = np.clip(np.linalg.eigvalsh(cov)[::-1], 0, None)
    ratios = evals / evals.sum()
    cum = np.cumsum(ratios)
    for _, r in pdf.iterrows():
        i = int(r.component) - 1
        for got, want, nm in (
            (r.eigenvalue, evals[i], "eigenvalue"),
            (r.explained_ratio, ratios[i], "explained_ratio"),
            (r.cumulative_ratio, cum[i], "cumulative_ratio"),
        ):
            if abs(got - want) >= 1e-4:
                return (
                    f"component {i + 1} {nm}: spark {got} vs numpy "
                    f"{want} (>=1e-4 apart)"
                )
    return None


@_register("doc_bpe_encode")
def _inv_bpe_encode(spark: SparkSession, sf_dir: str, pdf: pd.DataFrame):
    """Re-encode a deterministic doc sample with the pure-Python
    reference encoder (textstats/bpe.py::_encode_word_py, the parity
    anchor of tests/test_bpe.py) and require identical per-doc
    (n_words, n_bpe_tokens)."""
    from ..functions.text import tokenize
    from ..sources.batch import read_table
    from ..textstats.bpe import _encode_word_py
    from .enrich import BPE_FROZEN_MERGES

    ranks = {m: i for i, m in enumerate(BPE_FROZEN_MERGES)}
    sample = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
        .filter(F.length("word") > 0)
        .collect()
    )
    if not sample:
        return "empty doc sample — invariant exercised nothing"
    want: dict[int, list[int]] = {}
    for r in sample:
        agg = want.setdefault(int(r.doc_id), [0, 0])
        agg[0] += 1
        agg[1] += len(_encode_word_py(r.word, ranks))
    got = {
        int(r.doc_id): [int(r.n_words), int(r.n_bpe_tokens)]
        for _, r in pdf.iterrows()
        if int(r.doc_id) % 97 == 0
    }
    if got != want:
        bad = {k: (got.get(k), want.get(k))
               for k in set(got) ^ set(want) or
               {k for k in want if got.get(k) != want[k]}}
        return f"encode counts diverge from reference on sample: {bad}"
    return None


@_register("doc_bpe_merges")
def _inv_bpe_merges(spark: SparkSession, sf_dir: str, pdf: pd.DataFrame):
    """Replay BPE training with the clean-room pure-Python reference
    (refimpl.reference_bpe — the same single copy tests/test_bpe.py
    anchors on, here run on the REAL corpus word counts) and require
    the identical merge sequence."""
    from .enrich import BPE_MERGES
    from .refimpl import reference_bpe

    merges = reference_bpe(_word_counts(spark, sf_dir), BPE_MERGES)
    got = [
        (r.left, r.right, int(r.pair_count))
        for _, r in pdf.sort_values("rank").iterrows()
    ]
    if got != merges:
        return f"merge sequence diverges: spark {got} vs reference {merges}"
    return None


@_register("doc_unigram_train")
def _inv_unigram_train(spark: SparkSession, sf_dir: str, pdf: pd.DataFrame):
    """Replay the substring-seed + EM training with the plain-dict
    reference (refimpl.reference_unigram_em — the same single copy
    tests/test_unigram.py anchors on) on the real corpus word counts;
    the (piece, count, lp_micro) table must match bit-for-bit."""
    from .enrich import UNIGRAM_ITERS, UNIGRAM_VOCAB
    from .refimpl import reference_unigram_em

    # max_len=6: train_unigram_vocab default, used by the query
    want = reference_unigram_em(
        _word_counts(spark, sf_dir), UNIGRAM_VOCAB, 6, UNIGRAM_ITERS
    )
    got = [
        (r["piece"], int(r["count"]), int(r["lp_micro"]))
        for _, r in pdf.iterrows()
    ]
    got = sorted(got, key=lambda t: (-t[1], t[0]))
    if got != want:
        diff = [(g, w) for g, w in zip(got, want) if g != w][:5]
        return f"EM result diverges from reference, first diffs: {diff}"
    return None


@_register("doc_audio_bands")
def _inv_audio_bands(spark: SparkSession, sf_dir: str, pdf: pd.DataFrame):
    """Recompute the whole frame/FFT/band/log pipeline in driver NumPy
    (the tests/test_audio.py parity check, here over the full sf table)
    and require the per-lang averaged profile to agree."""
    import numpy as np

    from ..sources.batch import read_table

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang")
        .toPandas()
    )
    n_fft, n_bands = 256, 8
    n_bins = n_fft // 2 + 1
    edges = [round(i * n_bins / n_bands) for i in range(n_bands + 1)]
    per_lang: dict[str, list] = {}
    for _, d in docs.iterrows():
        raw = d.text.encode("utf-8")
        samples = (np.frombuffer(raw, dtype="u1").astype("float64") - 128.0) / 128.0
        n_frames = len(samples) // n_fft
        if n_frames == 0:
            b0 = bhi = 0.0
        else:
            frames = samples[: n_frames * n_fft].reshape(n_frames, n_fft)
            spec = (np.abs(np.fft.rfft(frames, axis=1)) ** 2).mean(axis=0)
            b0 = round(
                float(np.log10(spec[edges[0]:edges[1]].mean() + 1e-12)), 6
            )
            bhi = round(
                float(np.log10(spec[edges[7]:edges[8]].mean() + 1e-12)), 6
            )
        per_lang.setdefault(d.lang, []).append((b0, bhi, n_frames))
    for _, r in pdf.iterrows():
        rows = per_lang.get(r.lang, [])
        if len(rows) != int(r.n_docs):
            return f"lang {r.lang}: n_docs {r.n_docs} vs numpy {len(rows)}"
        lo = sum(t[0] for t in rows) / len(rows)
        hi = sum(t[1] for t in rows) / len(rows)
        fr = sum(t[2] for t in rows) / len(rows)
        for got, want, nm in (
            (r.avg_band_lo, lo, "avg_band_lo"),
            (r.avg_band_hi, hi, "avg_band_hi"),
            (r.avg_frames, fr, "avg_frames"),
        ):
            # query rounds to 4dp; allow the half-ulp of that rounding
            if abs(got - want) > 5.1e-5:
                return f"lang {r.lang} {nm}: spark {got} vs numpy {want}"
    return None


@_register("layout_hilbert_key")
def _inv_hilbert(spark: SparkSession, sf_dir: str, pdf: pd.DataFrame):
    """Recompute the Hilbert index for a deterministic row sample with
    the classic pure-Python xy2d walk (operators/layout.py::
    hilbert_xy2d_py — the same reference as the pytest parity check)
    including the (col, lo, hi) quantization, and require equality."""
    from ..operators.layout import BITS, hilbert_xy2d_py
    from ..sources.batch import read_table
    from .scale_ops import ZORDER_DIMS

    li = read_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # testdata, so compare per-key hval MULTISETS instead of row-joins
    src: dict[tuple[int, int], list] = {}
    for r in (
        li.filter(F.col("l_orderkey") % 199 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .collect()
    ):
        src.setdefault((int(r.l_orderkey), int(r.l_linenumber)), []).append(
            (float(r.l_quantity), float(r.l_extendedprice))
        )
    if not src:
        return "empty lineitem sample — invariant exercised nothing"

    def quant(v: float, lo: float, hi: float) -> int:
        scaled = (v - lo) / (hi - lo)
        return int(min(max(scaled, 0.0), 1.0) * ((1 << BITS) - 1))

    (_, lox, hix), (_, loy, hiy) = ZORDER_DIMS
    want = {
        key: sorted(
            hilbert_xy2d_py(BITS, quant(q, lox, hix), quant(p, loy, hiy))
            for q, p in vals
        )
        for key, vals in src.items()
    }
    got: dict[tuple[int, int], list] = {}
    for _, r in pdf.iterrows():
        key = (int(r.l_orderkey), int(r.l_linenumber))
        if key in want:
            got.setdefault(key, []).append(int(r.hval))
    got = {k: sorted(v) for k, v in got.items()}
    if got != want:
        bad = [k for k in want if got.get(k) != want[k]][:3]
        return (
            f"hvals diverge from xy2d reference on keys {bad}: "
            f"{[(got.get(k), want[k]) for k in bad]}"
        )
    return None


@_register("emb_kmeans_profile")
def _inv_kmeans(spark: SparkSession, sf_dir: str, pdf: pd.DataFrame):
    """Structural contract of a cluster profile: clusters partition the
    corpus (sizes sum to the table count, ids within [0, k), min_id a
    real vec_id) and the seeded fit is deterministic (a re-run yields
    the identical profile; exact-NumPy update parity is pinned in
    tests/test_llm_ops.py::test_kmeans_distributed_path_matches_driver_path)."""
    from ..sources.batch import read_table
    from .vectors import q_kmeans_profile

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    if int(pdf.n_members.sum()) != n:
        return f"cluster sizes sum {pdf.n_members.sum()} != corpus {n}"
    if not pdf.cluster.between(0, 7).all():
        return f"cluster ids outside [0, 8): {sorted(pdf.cluster)}"
    if pdf.cluster.duplicated().any():
        return "duplicate cluster ids in profile"
    if not pdf.avg_cosine.between(-1.0, 1.0).all():
        return "avg_cosine outside [-1, 1]"
    rerun = (
        q_kmeans_profile(spark, sf_dir)
        .toPandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    first = pdf.sort_values("cluster").reset_index(drop=True)
    if not first.equals(rerun):
        return "profile not deterministic across re-runs"
    return None
