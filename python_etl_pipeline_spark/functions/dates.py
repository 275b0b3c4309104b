"""Date parsing and date-derived expressions.

The hardest scalar semantics in the reference (SURVEY.md §2.8 F2/F4/F5/F9,
src/transform.py:181-219, :310-317, :392-395), reproduced as pure Column
expressions:

* ``safe_date`` — multi-format parse with the 2-digit-year pivot
  (``yy > current_yy -> 19yy else 20yy``), a day/month swap heuristic when
  the month field exceeds 12, and a validity guard accepting only
  ``1900 <= year <= current year``.
* ``calc_age`` — birthday-aware integer age; future dob -> 0.
* ``tenure_days`` — days since a date, null -> 0, negative -> 0.
* ``duration_months`` — calendar-month period difference
  (day-insensitive — deliberately NOT Spark's fractional
  ``months_between``), null -> 0, negative -> 0.

Everything uses ``try_to_timestamp`` so malformed input yields NULL
(then the documented default) under ANSI mode rather than failing a task.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _try_date(c: Column, fmt: str) -> Column:
    return F.try_to_timestamp(c, F.lit(fmt)).cast("date")


def safe_date(c: Column | str, *, max_year: Column | None = None) -> Column:
    """Multi-format tolerant date parse (F2, src/transform.py:181-208).

    Accepted inputs (separators ``-``, ``/``, ``.`` all normalized to ``-``):
      * ``d-m-Y``  (day first, 4-digit year)   e.g. 27-07-1978
      * ``Y-m-d``  (ISO-ish)                   e.g. 1978-07-27
      * ``m`` >12 in day-first position -> day/month swapped (heuristic)
      * ``d-m-y``  (2-digit year) with pivot: yy > current 2-digit year
        -> 19yy, else 20yy; same swap heuristic.

    Output is NULL unless ``1900 <= year <= current year`` (the reference's
    validity guard at src/transform.py:189).

    Deliberate deviation: for ambiguous 4-digit-year inputs (both fields
    <= 12) the reference's first branch inherits pandas' month-first
    preference (src/transform.py:188 ``pd.to_datetime`` without
    ``dayfirst``), while its 2-digit branch and fallback are day-first.
    This engine is day-first consistently (the data locale), with the
    month-first reading as the fallback for impossible day-first values.
    """
    raw = F.trim(_as_col(c).cast("string"))
    norm = F.regexp_replace(raw, r"[./]", "-")

    # --- 4-digit-year forms -------------------------------------------------
    iso = _try_date(norm, "y-M-d")                       # 1978-07-27
    dmy = _try_date(norm, "d-M-y")                       # 27-07-1978 (needs 4-digit y)
    # restrict d-M-y to strings whose final field is a 4-digit year
    is_dmY = norm.rlike(r"^\d{1,2}-\d{1,2}-\d{4}$")
    is_Ymd = norm.rlike(r"^\d{4}-\d{1,2}-\d{1,2}$")
    dmy4 = F.when(is_dmY, dmy)
    # swap heuristic: month slot > 12 -> try M-d-y reading (11-28-1995)
    mdy4 = F.when(is_dmY, _try_date(norm, "M-d-y"))

    # --- 2-digit-year form with pivot --------------------------------------
    is_dmy2 = norm.rlike(r"^\d{1,2}-\d{1,2}-\d{2}$")
    p1 = F.regexp_extract(norm, r"^(\d{1,2})-(\d{1,2})-(\d{2})$", 1)
    p2 = F.regexp_extract(norm, r"^(\d{1,2})-(\d{1,2})-(\d{2})$", 2)
    yy = F.regexp_extract(norm, r"^(\d{1,2})-(\d{1,2})-(\d{2})$", 3)
    cur_yy = F.year(F.current_date()) % 100
    full_year = F.when(
        yy.try_cast("int") > cur_yy, yy.try_cast("int") + 1900
    ).otherwise(yy.try_cast("int") + 2000)
    # day-first unless the month slot is impossible and the day slot is a
    # valid month (the reference's swap heuristic, src/transform.py:196-199)
    swap2 = (p2.try_cast("int") > 12) & (p1.try_cast("int") <= 12)
    d2 = F.when(swap2, p2).otherwise(p1)
    m2 = F.when(swap2, p1).otherwise(p2)
    rebuilt = F.concat_ws("-", d2, m2, full_year.cast("string"))
    pivoted = F.when(is_dmy2, _try_date(rebuilt, "d-M-y"))

    # fallback (reference's final pd.to_datetime catch-all,
    # src/transform.py:203-206): ISO timestamps with a time component
    is_iso_ts = raw.rlike(r"^\d{4}-\d{1,2}-\d{1,2}[ T]\d{1,2}:\d{2}")
    iso_ts = F.when(is_iso_ts, F.try_to_timestamp(raw).cast("date"))

    parsed = F.coalesce(
        F.when(is_Ymd, iso), dmy4, mdy4, pivoted, iso_ts
    )

    hi = max_year if max_year is not None else F.year(F.current_date())
    return F.when(F.year(parsed).between(1900, hi), parsed)


def calc_age(dob: Column | str, as_of: Column | None = None) -> Column:
    """Birthday-aware age in whole years; future or null dob -> 0.

    F4 (src/transform.py:216-219): year difference minus one when the
    birthday hasn't occurred yet — exactly ``floor(months_between/12)``
    clamped at 0; the reference returns 0 for both NaT and future dobs.
    """
    d = _as_col(dob).cast("date")
    ref = as_of if as_of is not None else F.current_date()
    age = F.floor(F.months_between(ref, d) / 12).cast("int")
    return F.greatest(F.coalesce(age, F.lit(0)), F.lit(0))


def tenure_days(d: Column | str, as_of: Column | None = None) -> Column:
    """Days elapsed since ``d``; null -> 0; future date -> 0.

    F5 (src/transform.py:310-314).
    """
    ref = as_of if as_of is not None else F.current_date()
    diff = F.datediff(ref, _as_col(d).cast("date"))
    return F.greatest(F.coalesce(diff, F.lit(0)), F.lit(0)).cast("int")


def duration_months(start: Column | str, end: Column | str) -> Column:
    """Calendar-month period difference, day-insensitive; null/negative -> 0.

    F9 (src/transform.py:392-395): pandas ``Period('M')`` subtraction =
    ``(year(e)-year(s))*12 + (month(e)-month(s))`` — NOT Spark's
    ``months_between`` (fractional, day-sensitive).
    """
    s = _as_col(start).cast("date")
    e = _as_col(end).cast("date")
    months = (F.year(e) - F.year(s)) * 12 + (F.month(e) - F.month(s))
    return F.greatest(F.coalesce(months, F.lit(0)), F.lit(0)).cast("int")
