"""As-of (temporal) join — an operator Spark lacks natively.

``asof_join(left, right, key, time)`` attaches, to every left row, the
most recent right row with the same key whose time is <= the left row's
time (backward as-of, the merge_asof default).

Implementation is the scalable union trick, NOT a range-condition join:
tag both sides, union, and take ``last(right_value, ignorenulls)`` over
a window partitioned by key and ordered by (time, side). One shuffle on
the key; no range-predicate explosion; ties (equal timestamps) resolve
right-before-left so a simultaneous right row IS visible to the left row.
At 100 TB this is the standard pattern — a theta/range join would
cross-product within key groups, and per-group ``merge_asof`` in
applyInPandas pays Python transfer; the window form stays in the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join; output = all left rows + ``{col}{suffix}``
    columns carrying the latest right values at or before the left time
    (NULL when no prior right row exists)."""
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *left.columns,
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
