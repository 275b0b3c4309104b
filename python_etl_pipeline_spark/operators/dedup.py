"""Dedup / sort-key operators (SURVEY.md §2.5–2.6).

The reference's ``drop_duplicates(keep='first'/'last')`` depends on row
order — meaningless under distributed execution unless made explicit. We
reproduce the exact semantics with a ranking window over a caller-supplied
deterministic order column (O2 src/extract.py:389, O3 src/transform.py:244).
Plain ``dropDuplicates`` is keep-arbitrary and is NOT equivalent.

Scale note: the window partitions by the dedup key, so this is one
shuffle on the key — the same cost as any keyed dedup — and AQE's skew
handling applies. No global sort is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cleansing import numeric_id


def _ranked_dedup(df: DataFrame, keys: list[str], order, keep_last: bool) -> DataFrame:
    order_cols = order if isinstance(order, (list, tuple)) else [order]
    order_exprs = [
        (F.col(c) if isinstance(c, str) else c) for c in order_cols
    ]
    if keep_last:
        order_exprs = [c.desc() for c in order_exprs]
    w = Window.partitionBy(*keys).orderBy(*order_exprs)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_first(df: DataFrame, keys: list[str] | str, order) -> DataFrame:
    """O3: keep the first occurrence per key in ``order``."""
    keys = [keys] if isinstance(keys, str) else keys
    return _ranked_dedup(df, keys, order, keep_last=False)


def dedup_keep_last(df: DataFrame, keys: list[str] | str, order) -> DataFrame:
    """O2: keep the last occurrence per key in ``order`` (last-writer-wins)."""
    keys = [keys] if isinstance(keys, str) else keys
    return _ranked_dedup(df, keys, order, keep_last=True)


def distinct_keys(df: DataFrame, pk: str) -> DataFrame:
    """A4: ``SELECT DISTINCT pk`` (src/extract.py:320)."""
    return df.select(pk).distinct()


def digit_sort_key(df: DataFrame, id_col: str, out: str = "__sort_key") -> DataFrame:
    """O1: attach the digit-concatenation numeric sort key
    (src/extract.py:272-294). Sorting itself is left to the caller
    (``df.orderBy(out)``) — at scale a total sort is a range-partition
    exchange and should only be paid at the sink."""
    return df.withColumn(out, numeric_id(id_col))
