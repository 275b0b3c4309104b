"""Unit tests for the cleansing-expression library against the messy
fixture patterns in FIXTURES.md (2-digit pivot dates, impossible dates,
currency strings, sentinels, substring region quirks)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from python_etl_pipeline_spark.functions import (
    safe_val,
    safe_num,
    safe_date,
    numeric_id,
    calc_age,
    tenure_days,
    duration_months,
    customer_segment,
    risk_category,
    transaction_category,
    gender_norm,
    fraud_flag,
    region_map,
)


def _col_vals(spark, values, expr_fn, out_type=None):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    col = expr_fn(F.col("v"))
    if out_type:
        col = col.cast(out_type)
    return [r[0] for r in df.select(col).collect()]


def test_safe_val(spark):
    out = _col_vals(
        spark,
        ["  hello world  ", "NaN", "", None, "nan", "ok"],
        lambda c: safe_val(c, title=True),
    )
    assert out == ["Hello World", "Na", "Na", "Na", "Na", "Ok"]


def test_safe_val_upper_lower(spark):
    assert _col_vals(spark, ["aBc"], lambda c: safe_val(c, upper=True)) == ["ABC"]
    assert _col_vals(spark, ["aBc"], lambda c: safe_val(c, lower=True)) == ["abc"]


def test_safe_num(spark):
    out = _col_vals(
        spark,
        ["₹1,234.56", "$ 500", "1234", "", None, "garbage", "  77.5 "],
        safe_num,
        "double",
    )
    assert out == [1234.56, 500.0, 1234.0, 0.0, 0.0, 0.0, 77.5]


def test_numeric_id(spark):
    out = _col_vals(spark, ["QT0021", "QT1000", "ABC", "", None, "9x9"], numeric_id)
    assert out == [21, 1000, 0, 0, 0, 99]


def test_safe_date_formats(spark):
    d = datetime.date
    cases = {
        "27-07-1978": d(1978, 7, 27),
        "1978-07-27": d(1978, 7, 27),
        "27/07/1978": d(1978, 7, 27),
        "27.07.1978": d(1978, 7, 27),
        # 2-digit-year pivot: 78 > 26 -> 1978; 01 <= 26 -> 2001
        "27-07-78": d(1978, 7, 27),
        "15-03-01": d(2001, 3, 15),
        # day/month swap heuristic (month slot > 12)
        "11-28-1995": d(1995, 11, 28),
        "05-28-45": d(1945, 5, 28),
        # impossible date (31 Sep) -> null
        "31-09-45": None,
        # pivot: 27 > current 2-digit year (26) -> 1927, inside the guard
        # (matches reference code src/transform.py:196-199, not the
        # FIXTURES.md gloss which assumed 2027)
        "06-06-27": d(1927, 6, 6),
        "2150-01-01": None,
        "1899-12-31": None,
        # fallback: ISO timestamp with time component
        "1978-07-27 10:30:00": d(1978, 7, 27),
        "1978-07-27T10:30:00": d(1978, 7, 27),
        # junk
        "NaN": None,
        "": None,
    }
    out = _col_vals(spark, list(cases), safe_date)
    assert out == list(cases.values())


def test_calc_age_birthday_aware(spark):
    as_of = F.lit("2026-08-13").cast("date")
    out = _col_vals(
        spark,
        ["2000-08-13", "2000-08-14", "2000-08-12", "2030-01-01", None],
        lambda c: calc_age(c.cast("date"), as_of=as_of),
    )
    assert out == [26, 25, 26, 0, 0]


def test_tenure_days(spark):
    as_of = F.lit("2026-01-11").cast("date")
    out = _col_vals(
        spark,
        ["2026-01-01", "2026-01-11", "2027-01-01", None],
        lambda c: tenure_days(c.cast("date"), as_of=as_of),
    )
    assert out == [10, 0, 0, 0]


def test_duration_months_day_insensitive(spark):
    df = spark.createDataFrame(
        [("2020-01-31", "2020-02-01"), ("2020-01-01", "2021-01-01"),
         ("2021-06-01", "2020-06-01"), (None, "2020-01-01")],
        ["s", "e"],
    )
    out = [
        r[0]
        for r in df.select(
            duration_months(F.col("s").cast("date"), F.col("e").cast("date"))
        ).collect()
    ]
    # Jan31 -> Feb1 is 1 calendar month (day-insensitive); negative clamps to 0
    assert out == [1, 12, 0, 0]


def test_bandings(spark):
    assert _col_vals(spark, [730, 729, 180, 179, 1, 0, -5], customer_segment) == [
        "VIP", "Regular", "Regular", "New", "New", "NA", "NA"]
    assert _col_vals(spark, [500001, 500000, 100001, 100000, 0], risk_category) == [
        "High", "Medium", "Medium", "Low", "Low"]
    assert _col_vals(spark, [10001, 10000, 1001, 1000, 5], transaction_category) == [
        "Large", "Medium", "Medium", "Small", "Small"]


def test_gender_norm(spark):
    out = _col_vals(spark, ["m", "MALE", " F ", "female", "x", None, "1"], gender_norm)
    assert out == ["M", "M", "F", "F", "N", "N", "N"]


def test_fraud_flag(spark):
    out = _col_vals(spark, ["true", "1", "YES", "y", "no", "0", "", None], fraud_flag)
    assert out == [True, True, True, True, False, False, False, False]


def test_region_map_substring_quirk(spark):
    out = _col_vals(spark, ["UTTAR PRADESH", "UP", "Punjab", "maharashtra",
                            "TAMIL NADU", "West Bengal", "Goa", None], region_map)
    # substring semantics: 'UP' matches 'UP' itself but NOT 'UTTAR PRADESH'
    # (no contiguous 'UP' — reference code src/transform.py:251-256 is
    # plain `in`; SURVEY §2.8 F7's gloss overstated the quirk);
    # 'West Bengal' upper-cased contains 'BENGAL' -> East
    assert out == ["NA", "North", "North", "West", "South", "East", "NA", "NA"]
