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


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    count_col: str = "n_rows",
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental aggregate maintenance: fold a delta batch's partial
    aggregates into a persisted per-key aggregate state.

    Counts and sums are commutative monoids, so the merged state equals
    a full recompute (the oracle property) while touching only
    |state| + |delta| rows — at 100 TB this is the difference between
    re-aggregating the whole fact table per batch and a groupBy over the
    (key-cardinality-sized) state plus the new batch. Both inputs must
    already carry ``count_col`` / ``sum_cols`` (i.e. be aggregate-shaped:
    build the delta's partials with the same groupBy that built the
    state).
    """
    sum_cols = sum_cols or []
    merged = state.select(*keys, count_col, *sum_cols).unionByName(
        delta.select(*keys, count_col, *sum_cols)
    )
    aggs = [F.sum(count_col).cast("bigint").alias(count_col)] + [
        F.sum(c).alias(c) for c in sum_cols
    ]
    return merged.groupBy(*keys).agg(*aggs)
