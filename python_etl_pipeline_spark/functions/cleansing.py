"""String / numeric cleansing expressions.

Reference semantics reproduced (citations into /root/reference):

* null sentinels ``{'nan','None','NaT','<NA>',''}`` -> NULL
  (``src/extract.py:297-306``; transform adds 'NULL'/'NaN',
  ``src/transform.py:171-179``)
* ``safe_val``: null-ish -> default 'NA', else strip whitespace,
  optional title/upper/lower casing (``src/transform.py:171-179``)
* ``safe_num``: strip currency symbols/commas/spaces, cast, default 0
  (``src/transform.py:210-214``)
* ``numeric_id``: concatenate the digits of an id string -> int,
  bad/missing -> 0 (``src/extract.py:272-283``) — the staging sort key
* ``file_md5``: md5 content hash driving idempotent ingestion
  (``src/extract.py:210-220``)
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import Column
from pyspark.sql import functions as F

# src/extract.py:306 + src/transform.py:172 union
NULL_SENTINELS = ["nan", "None", "NaT", "<NA>", "", "NaN", "NULL", "null", "N/A"]


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_null_sentinels(c: Column | str, sentinels: list[str] | None = None) -> Column:
    """Map sentinel strings (post-trim) to real NULL. P3 in SURVEY §2.2."""
    col = _as_col(c)
    s = sentinels if sentinels is not None else NULL_SENTINELS
    return F.when(F.trim(col).isin(s), F.lit(None).cast("string")).otherwise(col)


def safe_val(
    c: Column | str,
    default: str = "NA",
    *,
    title: bool = False,
    upper: bool = False,
    lower: bool = False,
) -> Column:
    """Cleanse a string column: null-ish -> ``default``, else trim + case-normalize.

    F1 in SURVEY §2.8 (src/transform.py:171-179). Case flags are mutually
    exclusive in the reference's call sites; precedence title > upper > lower.
    """
    trimmed = F.trim(_as_col(c).cast("string"))
    cleaned = F.when(
        trimmed.isNull() | trimmed.isin(NULL_SENTINELS), F.lit(default)
    ).otherwise(trimmed)
    if title:
        cleaned = F.initcap(cleaned)
    elif upper:
        cleaned = F.upper(cleaned)
    elif lower:
        cleaned = F.lower(cleaned)
    return cleaned


def safe_num(c: Column | str, default: float = 0, scale: int = 2) -> Column:
    """Parse a messy numeric string: strip ``₹ $ , `` and spaces, cast to
    decimal(15,scale); unparseable/null -> ``default``.

    F3 in SURVEY §2.8 (src/transform.py:210-214). ``try_cast`` keeps this
    safe under ANSI mode.
    """
    stripped = F.regexp_replace(_as_col(c).cast("string"), r"[₹$,\s]", "")
    parsed = stripped.try_cast(f"decimal(15,{scale})")
    return F.coalesce(parsed, F.lit(default).cast(f"decimal(15,{scale})"))


def numeric_id(c: Column | str) -> Column:
    """Concatenate all digits of an id string into a long; none -> 0.

    F14/O1 in SURVEY §2 (src/extract.py:272-283): 'QT0021' -> 21.
    Implemented as strip-non-digits + cast (exactly equivalent to the
    reference's regex-findall-join).
    """
    digits = F.regexp_replace(_as_col(c).cast("string"), r"[^0-9]", "")
    return F.coalesce(digits.try_cast("long"), F.lit(0))


def file_md5(path: str | Path, chunk_size: int = 4096) -> str:
    """Streaming MD5 of a local file (driver-side, per ingest file).

    F15 in SURVEY §2.8 (src/extract.py:210-220). Used by the ingest log
    (sources/ingest_log.py) to make file ingestion idempotent.
    """
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(chunk_size), b""):
            h.update(chunk)
    return h.hexdigest()
