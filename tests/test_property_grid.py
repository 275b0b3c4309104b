"""Exhaustive-grid property tests: the Column-expression implementations
of safe_date / safe_num must agree with an executable Python model of
the documented semantics (reference src/transform.py:181-214, with the
engine's documented day-first deviation) across thousands of generated
inputs — evaluated in one Spark job."""

from __future__ import annotations

import datetime
import re
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from python_etl_pipeline_spark.functions import safe_date, safe_num

TODAY = datetime.date.today()


def model_safe_date(s: str | None) -> datetime.date | None:
    if s is None:
        return None
    t = re.sub(r"[./]", "-", s.strip())

    def guard(d: datetime.date | None):
        return d if d is not None and 1900 <= d.year <= TODAY.year else None

    m = re.match(r"^(\d{4})-(\d{1,2})-(\d{1,2})$", t)
    if m:
        y, mo, dd = map(int, m.groups())
        try:
            return guard(datetime.date(y, mo, dd))
        except ValueError:
            return None
    m = re.match(r"^(\d{1,2})-(\d{1,2})-(\d{4})$", t)
    if m:
        d1, d2, y = map(int, m.groups())
        for mo, dd in ((d2, d1), (d1, d2)):  # day-first, then swapped
            try:
                return guard(datetime.date(y, mo, dd))
            except ValueError:
                continue
        return None
    m = re.match(r"^(\d{1,2})-(\d{1,2})-(\d{2})$", t)
    if m:
        d1, d2, yy = map(int, m.groups())
        if d2 > 12 and d1 <= 12:
            d1, d2 = d2, d1
        y = 1900 + yy if yy > TODAY.year % 100 else 2000 + yy
        try:
            return guard(datetime.date(y, d2, d1))
        except ValueError:
            return None
    return None


def test_safe_date_grid(spark):
    days = [0, 1, 5, 12, 13, 28, 29, 30, 31]
    months = [0, 1, 2, 6, 9, 12, 13, 28]
    y2s = ["00", "01", "25", "26", "27", "45", "78", "99"]
    y4s = ["1899", "1900", "1945", "1978", "2000", "2026", "2027", "2150"]
    seps = ["-", "/", "."]
    cases: list[str] = []
    for d in days:
        for m in months:
            for sep in seps[:2] if (d % 2) else seps:
                for y in y2s:
                    cases.append(f"{d:02d}{sep}{m:02d}{sep}{y}")
                for y in y4s:
                    cases.append(f"{d:02d}{sep}{m:02d}{sep}{y}")
                    cases.append(f"{y}{sep}{m:02d}{sep}{d:02d}")
    cases += ["", "NaN", "garbage", "12-31", "1-2-3-4", "99999-01-01", None]

    df = spark.createDataFrame([(c,) for c in cases], ["v"])
    got = [r[0] for r in df.select(safe_date(F.col("v"))).collect()]
    want = [model_safe_date(c) for c in cases]
    bad = [
        (c, g, w) for c, g, w in zip(cases, got, want) if g != w
    ]
    assert not bad, f"{len(bad)} mismatches of {len(cases)}; first: {bad[:5]}"


def model_safe_num(s: str | None) -> Decimal:
    default = Decimal("0.00")
    if s is None:
        return default
    cleaned = re.sub(r"[₹$,\s]", "", s)
    if not re.fullmatch(r"[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?", cleaned or ""):
        return default
    try:
        return Decimal(cleaned).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    except Exception:
        return default


def test_safe_num_grid(spark):
    bodies = [
        "0", "1", "12.3", "12.345", "12.355", "0.005", "999999999999.99",
        "-5.5", "+7", ".5", "5.", "1e3", "2.5e-2", "abc", "1.2.3", "--1", "",
    ]
    decorations = [
        "{}", "₹{}", "$ {}", " {} ", "{}  ", "₹ {},000", "{},123.45", "x{}",
    ]
    cases: list[str | None] = [None]
    for b in bodies:
        for d in decorations:
            cases.append(d.format(b))

    df = spark.createDataFrame([(c,) for c in cases], ["v"])
    got = [r[0] for r in df.select(safe_num(F.col("v"))).collect()]
    want = [model_safe_num(c) for c in cases]
    bad = [(c, g, w) for c, g, w in zip(cases, got, want) if g != w]
    assert not bad, f"{len(bad)} mismatches of {len(cases)}; first: {bad[:8]}"
