"""Corpus-frequency line deduplication — CCNet's paragraph/line dedup
step (Wenzek et al. 2020 §4.2: hash every normalized line, drop lines
whose hash repeats across the corpus) and the boilerplate-removal pass
RefinedWeb/Gopher run before document-level dedup. Distinct from the
suite's other line ops: rules.py::c4_line_filter is per-doc heuristics
(no corpus state) and rules.py::fineweb_line_rules measures WITHIN-doc
duplication; this module removes lines because OTHER documents contain
them — nav bars, cookie banners, footers.

Scale shape (100 TB): one explode + one line-key aggregate (map-side
partial, hash shuffle on the line key — never a pair join), then the
boilerplate set is probed with a left-anti join. The set is provably
bounded when the threshold scales with the corpus: at most
total_lines / min_doc_freq distinct keys can reach doc-frequency >=
min_doc_freq, so with min_doc_freq = f·N docs the set is <=
lines_per_doc / f keys regardless of corpus size — but with a small
ABSOLUTE threshold it is not, so the join carries no broadcast hint
and the planner/AQE picks broadcast only when the built side measures
small. Reassembly is a per-doc groupBy with an in-row array_sort —
line order never depends on shuffle order.

Reference parity: the reference has no text surface beyond
FileReconstitution.scala:7-12 (punctuation strip); north-star
extension work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Remove every line whose normalized form (lower + trim) appears in
    >= `min_doc_freq` DISTINCT documents. → (doc_id, n_lines, n_kept,
    removed_lines, cleaned) for every input doc, `cleaned` re-joined in
    original line order (empty string when everything was boilerplate).

    Doc-frequency counts each doc once however often it repeats the
    line internally (count over a (key, doc) distinct pass), matching
    CCNet's definition."""
    doc = F.col(id_col).alias("doc_id")
    lines = df.select(
        doc,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("key", F.lower(F.trim("line")))
    boiler = (
        lines.select("key", "doc_id")
        .distinct()
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") >= min_doc_freq)
        .select("key")
    )
    # no broadcast HINT: the bound above holds only when the threshold
    # scales with the corpus — with a small absolute min_doc_freq the
    # boilerplate set is not provably bounded, so let the planner (AQE
    # converts to broadcast at runtime when the built side is small)
    # make the size-checked call instead of forcing it past the guard
    kept = lines.join(boiler, "key", "left_anti")
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("cleaned"),
    )
    base = df.select(
        doc,
        F.size(F.split(F.col(text_col), "\n")).cast("bigint").alias("n_lines"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("removed_lines"),
            F.coalesce("cleaned", F.lit("")).alias("cleaned"),
        )
    )
