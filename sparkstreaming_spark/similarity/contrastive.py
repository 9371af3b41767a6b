"""Contrastive hard-negative mining over an embedding column.

For every vector, find the most-similar vector carrying a DIFFERENT
label — the "hard negative" a contrastive/metric-learning pipeline pairs
with each anchor. (The easy negatives are random; the hard ones are what
actually shape the margin, and mining them is a standard corpus-scale
preprocessing pass.)

Scale shape = the blocked block-pair GEMM layout (same as
dedup/embedding.py::_blocked_pairs): hash-split into B blocks, one
applyInPandas group per unordered block pair, one BLAS GEMM per group.
The twist vs near-dup pairs: instead of thresholded pair emission, each
group emits AT MOST ONE candidate per (row, partner-block) — its best
different-label match inside the group — and a final partial-aggregated
``max(struct(cosine, -id))`` per query reduces B candidates to the
global argmax. Output stays O(n·B) rows regardless of similarity
structure, per-task memory stays two blocks, nothing corpus-sized
touches the driver.

Determinism: float64 GEMM rounded to 6 dp, ties broken toward the
smaller neighbor id — in BOTH the in-group argmax and the global
reduce, matching the DuckDB oracle's (cosine DESC, neighbor_id ASC).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hard_negatives(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    rows_per_block: int = 4096,
    n_blocks: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine): per vector, the most-similar
    different-label vector. Rows whose label is NULL are excluded (no
    defined negative relation)."""
    import numpy as np

    base = df.select(
        F.col(id_col).cast("bigint").alias("vid"),
        F.col(vec_col).alias("v"),
        F.col(label_col).cast("string").alias("lbl"),
    ).filter(F.col("lbl").isNotNull())

    if n_blocks is None:
        n = base.count()
        n_blocks = max(1, -(-n // rows_per_block))
    b_lit = int(n_blocks)

    exploded = (
        base.select(
            "vid",
            "v",
            "lbl",
            F.pmod(F.xxhash64("vid"), F.lit(b_lit)).alias("blk"),
            F.explode(F.sequence(F.lit(0), F.lit(b_lit - 1))).alias("o"),
        )
        .select(
            "vid",
            "v",
            "lbl",
            "blk",
            F.least("blk", "o").alias("gi"),
            F.greatest("blk", "o").alias("gj"),
        )
        .dropDuplicates(["gi", "gj", "vid"])
    )

    def best_in_group(ids, labels, sims):
        """Per row of `sims`, argmax over columns with a different label;
        ties -> smallest column id. Returns (rows, best_ids, best_cos)."""
        out_r, out_n, out_c = [], [], []
        for r in range(sims.shape[0]):
            mask = labels != labels[r]
            if not mask.any():
                continue
            row = sims[r]
            best = row[mask].max()
            cand = ids[mask & (row == best)]
            out_r.append(r)
            out_n.append(cand.min())
            out_c.append(best)
        return out_r, out_n, out_c

    def gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        gi = int(pdf["gi"].iloc[0])
        gj = int(pdf["gj"].iloc[0])
        ids = pdf["vid"].to_numpy(dtype="int64")
        labels = pdf["lbl"].to_numpy()
        M = np.stack(pdf["v"].to_numpy()).astype("float64")
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        M /= norms
        q_ids, q_lbl, q_M = ids, labels, M
        c_ids, c_lbl, c_M = ids, labels, M
        if gi != gj:
            left = pdf["blk"].to_numpy() == gi
            # score both directions: left rows vs right block and back
            sims = np.round(M[left] @ M[~left].T, 6)
            frames = []
            for (qi, ql, s, ci, cl) in (
                (ids[left], labels[left], sims, ids[~left], labels[~left]),
                (ids[~left], labels[~left], sims.T, ids[left], labels[left]),
            ):
                if not len(qi) or not len(ci):
                    continue
                rows = []
                for r in range(s.shape[0]):
                    mask = cl != ql[r]
                    if not mask.any():
                        continue
                    row = s[r]
                    best = row[mask].max()
                    cand = ci[mask & (row == best)]
                    rows.append((qi[r], cand.min(), best))
                if rows:
                    frames.append(pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"]))
            if not frames:
                return pd.DataFrame(
                    {"query_id": [], "neighbor_id": [], "cosine": []}
                ).astype({"query_id": "int64", "neighbor_id": "int64", "cosine": "float64"})
            return pd.concat(frames, ignore_index=True)
        sims = np.round(q_M @ c_M.T, 6)
        np.fill_diagonal(sims, -2.0)  # self never counts
        r, nid, cos = best_in_group(c_ids, c_lbl, sims)
        return pd.DataFrame(
            {"query_id": q_ids[r], "neighbor_id": nid, "cosine": cos}
        )

    candidates = exploded.groupBy("gi", "gj").applyInPandas(
        gemm, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    best = candidates.groupBy("query_id").agg(
        F.max(
            F.struct(
                F.col("cosine"), (-F.col("neighbor_id")).alias("neg"), "neighbor_id"
            )
        ).alias("m")
    )
    return best.select(
        "query_id",
        F.col("m.neighbor_id").alias("neighbor_id"),
        F.col("m.cosine").alias("cosine"),
    )
