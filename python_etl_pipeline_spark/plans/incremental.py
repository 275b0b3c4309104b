"""Incremental append + reconciliation (SURVEY.md §2.9 I3/I4).

The reference's count-offset heuristic (``LIMIT new OFFSET existing``,
src/load.py:124-205) assumes dense positional ordering — fragile and
unscalable. The engine replaces it with the two strictly-more-correct
forms:

* high-watermark filter: ``incoming.where(seq > watermark)`` — pushes
  down to the scan, no shuffle at all;
* anti-join on PK: exact, one shuffle (broadcast when the target key set
  is small).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def incremental_append_watermark(
    incoming: DataFrame, seq_col: str, watermark
) -> DataFrame:
    """I3 (watermark form): rows strictly past the high watermark.

    ``watermark`` may be a literal or a Column; the predicate is pushed
    into the parquet scan (verify via ``PushedFilters`` in explain).
    """
    wm = watermark if isinstance(watermark, Column) else F.lit(watermark)
    return incoming.filter(F.col(seq_col) > wm)


def high_watermark(target: DataFrame, seq_col: str):
    """A2: current max watermark of the target (None when empty)."""
    row = target.agg(F.max(seq_col).alias("wm")).first()
    return row["wm"]


def incremental_append_antijoin(
    incoming: DataFrame, target: DataFrame, pk: str
) -> DataFrame:
    """I3 (exact form): incoming rows whose PK is absent from the target."""
    return incoming.join(target.select(pk).distinct(), pk, "left_anti")


def reconcile_counts(src: DataFrame, dst: DataFrame) -> dict:
    """I4: row-count reconciliation report (src/load.py:317-360)."""
    s, d = src.count(), dst.count()
    return {"source_count": s, "target_count": d, "synced": s == d, "difference": s - d}
