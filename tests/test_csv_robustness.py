"""Malformed-input handling on the CSV path (reference S2's format):
the three parse modes a production ingest job must choose between —
PERMISSIVE (+ _corrupt_record capture), DROPMALFORMED, FAILFAST."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SCHEMA = "id int, name string, score double"
GOOD = ["1,alice,0.5", "2,bob,1.5"]
BAD = ["3,carol,not_a_number", "4,dave"]


@pytest.fixture()
def csv_dir(tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("\n".join(GOOD + BAD) + "\n")
    return str(p)


def test_permissive_captures_corrupt_records(spark, csv_dir):
    df = spark.read.schema(SCHEMA + ", _corrupt_record string").csv(
        csv_dir, mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record"
    )
    rows = df.cache().collect()
    assert len(rows) == 4
    corrupt = df.filter(F.col("_corrupt_record").isNotNull()).collect()
    # the unparseable double is corrupt; the short row yields nulls but
    # Spark also flags it in _corrupt_record
    assert {r._corrupt_record for r in corrupt} == set(BAD)
    good = df.filter(F.col("_corrupt_record").isNull())
    assert {r.id for r in good.collect()} == {1, 2}
    df.unpersist()


def test_dropmalformed_keeps_only_clean_rows(spark, csv_dir):
    df = spark.read.schema(SCHEMA).csv(csv_dir, mode="DROPMALFORMED")
    got = sorted(r.id for r in df.collect())
    assert got == [1, 2]


def test_failfast_raises_on_first_bad_row(spark, csv_dir):
    df = spark.read.schema(SCHEMA).csv(csv_dir, mode="FAILFAST")
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)
