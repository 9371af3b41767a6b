"""Corpus-frequency line dedup (dedup/lines.py): threshold semantics,
distinct-doc counting, order preservation, all-boilerplate docs."""

import pandas as pd

from sparkstreaming_spark.dedup.lines import line_dedup


def _run(spark, rows, min_df):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    return {
        r["doc_id"]: r.asDict()
        for r in line_dedup(df, "doc_id", "text", min_df).collect()
    }


def test_drops_shared_keeps_unique(spark):
    rows = [
        (1, "unique alpha\nSHARED FOOTER\nunique beta"),
        (2, "other gamma\nshared footer\nother delta"),
        (3, "solo line only"),
    ]
    out = _run(spark, rows, 2)
    # normalization: lower+trim makes the two footer variants one key
    assert out[1]["cleaned"] == "unique alpha\nunique beta"
    assert out[2]["cleaned"] == "other gamma\nother delta"
    assert out[1]["removed_lines"] == 1 and out[2]["removed_lines"] == 1
    assert out[3]["cleaned"] == "solo line only"
    assert out[3]["n_kept"] == 1 and out[3]["removed_lines"] == 0


def test_within_doc_repeats_count_one_doc(spark):
    # doc 1 repeats the line 3 times but df = 1 -> kept at min_df=2
    rows = [(1, "echo\necho\necho"), (2, "different")]
    out = _run(spark, rows, 2)
    assert out[1]["cleaned"] == "echo\necho\necho"
    assert out[1]["n_kept"] == 3


def test_all_boilerplate_doc_survives_empty(spark):
    rows = [(1, "footer"), (2, "footer"), (3, "footer\nreal content")]
    out = _run(spark, rows, 2)
    assert out[1]["cleaned"] == "" and out[1]["n_kept"] == 0
    assert out[1]["n_lines"] == 1 and out[1]["removed_lines"] == 1
    assert out[3]["cleaned"] == "real content"


def test_order_preserved_across_removals(spark):
    rows = [
        (1, "a1\nBOILER\na2\nBOILER\na3"),
        (2, "boiler"),
    ]
    out = _run(spark, rows, 2)
    assert out[1]["cleaned"] == "a1\na2\na3"


def test_threshold_boundary(spark):
    # df=2 line: dropped at min_df=2, kept at min_df=3
    rows = [(1, "pair\nown1"), (2, "pair\nown2")]
    assert _run(spark, rows, 2)[1]["cleaned"] == "own1"
    assert _run(spark, rows, 3)[1]["cleaned"] == "pair\nown1"
