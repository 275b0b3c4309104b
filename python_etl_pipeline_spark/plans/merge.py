"""Snapshot upsert — last-writer-wins merge (SURVEY.md §2.9 I2/K1).

The reference's ``INSERT ... ON DUPLICATE KEY UPDATE``
(src/extract.py:328-357, src/transform.py:265-274) is a per-PK
last-writer-wins merge. Plain parquet has no MERGE, so the engine
expresses it as union + ranked dedup over an explicit version column:

    merged = union(existing, incoming)
             -> row_number() over (partition by pk order by version desc)
             -> keep rn = 1

Determinism at scale: callers MUST supply an explicit ``version_col``
(ingest sequence / batch id / event time). ``monotonically_increasing_id``
is not stable across runs and is deliberately not defaulted here
(SURVEY.md §7 phase 3 note). Cost model: one shuffle on the PK — the
minimum any keyed merge pays; with a Delta/Iceberg table format the same
call maps to MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_last_writer_wins(
    existing: DataFrame,
    incoming: DataFrame,
    pk: str | list[str],
    version_col: str,
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """Merge ``incoming`` over ``existing``: highest ``version_col`` per PK
    wins; ``tiebreak`` (descending) resolves equal versions deterministically.

    ON-DUPLICATE-KEY-UPDATE semantics require the *incoming* row to win
    when versions tie (the reference's upsert unconditionally overwrites,
    src/extract.py:328-357), so an implicit source-priority column
    (incoming=1, existing=0) is always the final ordering term — the
    merge is a total order even when callers pass equal versions.
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    merged = existing.withColumn("__src", F.lit(0)).unionByName(
        incoming.withColumn("__src", F.lit(1)), allowMissingColumns=False
    )
    order = [F.col(version_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    order.append(F.col("__src").desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    pk: str | list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply an insert/update/delete change feed to a snapshot — the
    general MERGE the reference's upsert (extract.py:328-357) special-
    cases to I/U only. ``changes`` carries the snapshot's columns plus
    ``op_col`` in {'I','U','D'} and ``seq_col`` (commit sequence /
    binlog position); the highest-seq change per key decides the key's
    fate: D removes it, I/U set its final image.

    One shuffle keyed on the PK (union is exchange-free, ranked dedup
    and the tombstone filter ride the same window) — identical cost to
    the plain upsert, so a CDC-fed 100 TB table pays nothing extra for
    delete support. With Delta/Iceberg the same feed maps to
    MERGE ... WHEN MATCHED AND op='D' THEN DELETE.
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    data_cols = snapshot.columns
    base = snapshot.select(
        *data_cols,
        F.lit("I").alias(op_col),
        F.lit(None).cast(changes.schema[seq_col].dataType).alias(seq_col),
    )
    merged = base.unionByName(changes.select(*data_cols, op_col, seq_col))
    # nulls_first: snapshot rows (seq NULL) lose to any change for the key
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc_nulls_last())
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != "D"))
        .select(*data_cols)
    )
