"""Projection / validation / predicate operators (SURVEY.md §2.2).

* P1 — set-wise column validation then projection into canonical order
  (src/extract.py:380-384, :438-442)
* P2 — PK non-null / non-empty filter (src/extract.py:387-388)
* P3 — null-sentinel normalization across string columns
  (src/extract.py:297-306)

All are thin declarative wrappers: Catalyst's ColumnPruning pushes the
projection into the scan (``ReadSchema`` shows only selected columns)
and the PK predicate reaches parquet as a pushed filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleansing import NULL_SENTINELS, normalize_null_sentinels


class SchemaMismatchError(ValueError):
    """Input columns differ (set-wise) from the declared schema."""


def validate_and_project(df: DataFrame, expected_columns: list[str]) -> DataFrame:
    """P1: reject on set-mismatch, then project into canonical order."""
    have, want = set(df.columns), set(expected_columns)
    if have != want:
        raise SchemaMismatchError(
            f"column mismatch: missing={sorted(want - have)} unexpected={sorted(have - want)}"
        )
    return df.select(*expected_columns)


def prune_valid_columns(
    df: DataFrame, declared: list[str], exclude: list[str] | None = None
) -> DataFrame:
    """P4: select declared ∩ existing minus excluded (src/load.py:161-171)
    — the reference's defensive column pruning at the load boundary, which
    Catalyst turns into a narrowed ReadSchema on the scan."""
    drop = set(exclude or [])
    cols = [c for c in declared if c in set(df.columns) and c not in drop]
    return df.select(*cols)


def pk_filter(df: DataFrame, pk: str) -> DataFrame:
    """P2: drop rows whose PK is NULL or empty-string."""
    c = F.col(pk)
    return df.filter(c.isNotNull() & (F.trim(c.cast("string")) != ""))


def normalize_nulls(
    df: DataFrame,
    columns: list[str] | None = None,
    sentinels: list[str] | None = None,
) -> DataFrame:
    """P3: sentinel strings -> NULL across the given (default: all string) columns."""
    s = sentinels if sentinels is not None else NULL_SENTINELS
    cols = columns or [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    return df.select(
        *[
            normalize_null_sentinels(c, s).alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )
