"""ExactSubstr substring-level dedup (dedup/substr.py) semantics:
duplicated >=k-token runs become merged removable spans, within-doc
repeats count, clean docs yield zeros."""

import pandas as pd

from sparkstreaming_spark.dedup.substr import substr_dedup_stats, substr_dup_spans

RUN = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _spans(spark, rows, k=8):
    out = substr_dup_spans(_df(spark, rows), "doc_id", "text", k=k).collect()
    return sorted((r["doc_id"], r["span_start"], r["span_end"]) for r in out)


def test_shared_run_spans_both_docs(spark):
    rows = [(1, f"one two {RUN} tail1 tailx"), (2, f"{RUN} other words here")]
    # doc 1: run at tokens 2..9; doc 2: run at 0..7
    assert _spans(spark, rows) == [(1, 2, 9), (2, 0, 7)]


def test_longer_shared_run_merges_overlapping_shingles(spark):
    # 10 shared tokens -> three 8-shingles each duplicated -> one merged span
    long_run = RUN + " iota kappa"
    rows = [(1, f"{long_run} x y z"), (2, f"pre {long_run}")]
    assert _spans(spark, rows) == [(1, 0, 9), (2, 1, 10)]


def test_within_doc_repeat_is_duplicated(spark):
    rows = [(1, f"{RUN} filler0 filler1 {RUN}"), (2, "totally different text here")]
    # run at 0..7 and at 10..17 in the same doc, nothing from doc 2
    assert _spans(spark, rows) == [(1, 0, 7), (1, 10, 17)]


def test_adjacent_spans_merge(spark):
    second = "i1 i2 i3 i4 i5 i6 i7 i8"
    # doc1 holds RUN immediately followed by SECOND; docs 2/3 each
    # duplicate one half -> doc1's two spans [0,7] [8,15] are adjacent
    rows = [(1, f"{RUN} {second}"), (2, f"{RUN} pad padb"), (3, f"padc padd {second}")]
    got = _spans(spark, rows)
    assert (1, 0, 15) in got


def test_clean_corpus_yields_no_spans(spark):
    rows = [(1, "a b c d e f g h"), (2, "p q r s t u v w")]
    assert _spans(spark, rows) == []


def test_stats_ledger_covers_all_docs(spark):
    rows = [(1, f"one two {RUN} tail1 tailx"), (2, f"{RUN} other words here"),
            (3, "no duplicates at all in this row")]
    out = {r["doc_id"]: r.asDict()
           for r in substr_dedup_stats(_df(spark, rows), "doc_id", "text", k=8).collect()}
    assert len(out) == 3
    assert out[1]["n_spans"] == 1 and out[1]["dup_tokens"] == 8
    assert out[1]["n_tokens"] == 12
    assert out[1]["dup_frac"] == round(8 / 12, 6)
    assert out[3]["n_spans"] == 0 and out[3]["dup_tokens"] == 0
    assert out[3]["dup_frac"] == 0.0


def test_short_docs_below_k_are_ignored(spark):
    rows = [(1, "same short text"), (2, "same short text")]
    assert _spans(spark, rows) == []
    out = {r["doc_id"]: r.asDict()
           for r in substr_dedup_stats(_df(spark, rows), "doc_id", "text", k=8).collect()}
    assert out[1]["n_spans"] == 0 and out[1]["n_tokens"] == 3


def test_apply_removes_covered_tokens(spark):
    from sparkstreaming_spark.dedup.substr import substr_dedup_apply

    rows = [(1, f"one two {RUN} tail1 tailx"), (2, f"{RUN} other words here")]
    out = {r["doc_id"]: r.asDict()
           for r in substr_dedup_apply(_df(spark, rows), "doc_id", "text", k=8).collect()}
    assert out[1]["clean_text"] == "one two tail1 tailx"
    assert out[1]["n_tokens"] == 12 and out[1]["n_kept"] == 4
    assert out[2]["clean_text"] == "other words here"


def test_apply_passthrough_for_clean_docs(spark):
    from sparkstreaming_spark.dedup.substr import substr_dedup_apply

    rows = [(1, "A unique sentence, here!"), (2, "Another unique one.")]
    out = {r["doc_id"]: r.asDict()
           for r in substr_dedup_apply(_df(spark, rows), "doc_id", "text", k=8).collect()}
    # passthrough is the NORMALIZED token stream (lowercase, no punct)
    assert out[1]["clean_text"] == "a unique sentence here"
    assert out[1]["n_kept"] == out[1]["n_tokens"] == 4


def test_apply_fully_duplicated_doc_empties(spark):
    from sparkstreaming_spark.dedup.substr import substr_dedup_apply

    rows = [(1, RUN), (2, RUN)]
    out = {r["doc_id"]: r.asDict()
           for r in substr_dedup_apply(_df(spark, rows), "doc_id", "text", k=8).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_kept"] == 0
    assert out[2]["clean_text"] == "" and out[2]["n_kept"] == 0
