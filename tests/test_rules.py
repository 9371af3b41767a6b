"""Gopher / C4 rule-filter tests (textstats/rules.py) on crafted texts
where each rule fires independently."""

import pandas as pd
from pyspark.sql import functions as F

from sparkstreaming_spark.textstats.rules import (
    c4_line_filter,
    gopher_quality_rules,
)

GOOD = ("the quick brown fox jumps over that lazy dog and it will have "
        "run with great speed to the nearby village of hills ") * 3  # 66 words


def _df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"id": range(len(texts)), "text": texts})
    )


def _gopher(spark, texts):
    rows = gopher_quality_rules(_df(spark, texts), "id", "text").collect()
    return {r["id"]: r.asDict() for r in rows}


def test_good_doc_passes_all_rules(spark):
    r = _gopher(spark, [GOOD])[0]
    assert r["gopher_ok"] is True
    assert r["stop_hits"] >= 2 and r["alpha_ratio"] >= 0.8


def test_too_short_fails_word_count_only(spark):
    r = _gopher(spark, ["the cat sat with that mat on a hill now"])[0]
    assert r["ok_word_count"] is False and r["ok_word_len"] is True
    assert r["gopher_ok"] is False


def test_symbol_ratio_rule(spark):
    r = _gopher(spark, [GOOD + " ## ## ### ... ... #### ## ## ##"])[0]
    assert r["ok_symbols"] is False


def test_bullet_and_ellipsis_line_rules(spark):
    bullets = "\n".join(f"- {GOOD[:20]}" for _ in range(10))
    r = _gopher(spark, [bullets])[0]
    assert r["bullet_ratio"] == 1.0 and r["ok_bullets"] is False
    dots = "\n".join(f"{GOOD[:20]}..." for _ in range(10))
    r2 = _gopher(spark, [dots])[0]
    assert r2["ellipsis_ratio"] == 1.0 and r2["ok_ellipsis"] is False


def test_alpha_ratio_rule(spark):
    numbers = " ".join(str(i) for i in range(100))
    r = _gopher(spark, [GOOD + " " + numbers])[0]
    assert r["ok_alpha"] is False


def test_stopword_rule(spark):
    no_stops = "zebra yak xenon walrus viper umbrella tiger snake " * 10
    r = _gopher(spark, [no_stops])[0]
    assert r["stop_hits"] == 0 and r["ok_stopwords"] is False


def test_empty_doc_all_zero(spark):
    r = _gopher(spark, [""])[0]
    assert r["n_words"] == 0 and r["gopher_ok"] is False


def test_c4_keeps_only_clean_sentences(spark):
    page = "\n".join([
        "This is a proper sentence with enough words.",  # kept
        "Too short.",                                     # < 4 words
        "no terminal punctuation here at all",            # no punct
        "Enable javascript to view this page.",           # javascript
        "body { margin: 0; } is css.",                    # brace
        "Lorem Ipsum dolor sit amet placeholder.",        # lorem ipsum
        'He said "it works fine."',                       # kept (quote end)
    ])
    out = c4_line_filter(_df(spark, [page]), "id", "text").collect()[0]
    assert out["n_lines"] == 7 and out["n_kept"] == 2
    assert out["cleaned"] == (
        'This is a proper sentence with enough words.\nHe said "it works fine."'
    )
    assert out["cleaned_len"] == len(out["cleaned"])


def test_c4_empty_result(spark):
    out = c4_line_filter(_df(spark, ["no punct line"]), "id", "text").collect()[0]
    assert out["n_kept"] == 0 and out["cleaned"] == ""


def test_rules_plans_have_no_shuffle_or_python(spark):
    df = _df(spark, [GOOD])
    for op in (
        gopher_quality_rules(df, "id", "text"),
        c4_line_filter(df, "id", "text"),
    ):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fineweb_rules_fire_independently(spark):
    from sparkstreaming_spark.textstats.rules import fineweb_line_rules

    long_line = "This line is comfortably longer than thirty characters overall."
    pages = [
        # clean: all long punct-ended unique lines
        "\n".join(f"{long_line[:-1]} variant {i}." for i in range(10)),
        # no punctuation endings
        "\n".join(f"{long_line[:-1]} variant {i}" for i in range(10)),
        # heavy duplication: same line 8 of 10 times
        "\n".join([long_line] * 8 + [f"{long_line} unique one.",
                                     f"{long_line} unique two."]),
        # mostly short lines
        "\n".join(["tiny."] * 9 + [long_line]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(pages)), "text": pages})
    )
    rows = {r["id"]: r.asDict() for r in
            fineweb_line_rules(df, "id", "text").collect()}
    assert rows[0]["fineweb_ok"] is True
    assert rows[1]["ok_punct_end"] is False and rows[1]["fineweb_ok"] is False
    assert rows[2]["ok_dup_chars"] is False and rows[2]["dup_char_ratio"] > 0.5
    assert rows[3]["ok_short_lines"] is False
    # the failing rules are independent: rows[2] still passes punct-end
    assert rows[2]["ok_punct_end"] is True


def test_fineweb_plan_no_shuffle(spark):
    from sparkstreaming_spark.textstats.rules import fineweb_line_rules

    df = spark.createDataFrame(pd.DataFrame({"id": [1], "text": ["x.\ny."]}))
    plan = fineweb_line_rules(df, "id", "text")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
