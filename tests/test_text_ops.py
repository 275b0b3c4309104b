"""PII redaction and repetition-ratio fixture semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_etl_pipeline_spark.llm.text import redact_pii, repetition_ratio


def test_redact_pii(spark):
    rows = [
        ("mail me at a.b+c@ex-ample.co.uk please", "mail me at <EMAIL> please"),
        ("call 9876543210 now", "call <PHONE> now"),
        ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
        ("phone inside x9876543210y stays", "phone inside x9876543210y stays"),
        ("clean text", "clean text"),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], ["t"])
    got = [r[0] for r in df.select(redact_pii(F.col("t"))).collect()]
    assert got == [r[1] for r in rows]


def test_repetition_ratio(spark):
    rows = [
        ("a b c a b c a b c", None),      # repeated trigrams -> high ratio
        ("one two three four five", 0.0),  # all distinct
        ("x y", 0.0),                      # too short for a trigram
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], ["t"])
    got = [r[0] for r in df.select(repetition_ratio(F.col("t"))).collect()]
    # 'a b c' x3: 7 trigrams, 3 distinct -> 1 - 3/7
    assert abs(got[0] - (1 - 3 / 7)) < 1e-9
    assert got[1] == 0.0 and got[2] == 0.0
