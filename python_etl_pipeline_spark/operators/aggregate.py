"""Aggregation operators (SURVEY.md §2.4).

Counts, watermarks, and multi-agg summaries. All map-side-combinable
built-ins — partial aggregation happens before the shuffle, so these
stay one-exchange plans at any scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_counts(named_dfs: dict[str, DataFrame]) -> DataFrame:
    """A1: one row per table with its row count (union of scalar aggs)."""
    parts = [
        df.agg(F.count("*").alias("row_count")).select(
            F.lit(name).alias("table_name"), "row_count"
        )
        for name, df in named_dfs.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def multi_agg_summary(df: DataFrame, count_col: str, sum_cols: list[str], max_col: str) -> DataFrame:
    """A3: COUNT + SUMs + MAX in one pass (src/extract.py:573-580)."""
    aggs = [F.count(count_col).alias("n")]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    aggs.append(F.max(max_col).alias(f"max_{max_col}"))
    return df.agg(*aggs)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation: aggregate on (keys + salt)
    first, then re-aggregate on keys.

    For decomposable aggregates (sum/count/min/max) this bounds any
    single reducer's input to ~1/n_salts of the hottest key. Spark's
    map-side partial aggregation already handles most skew for these
    functions; explicit salting matters when partials can't combine
    (collect-like aggs) or when AQE skew handling is unavailable.
    ``aggs`` maps column -> one of sum|count|min|max; output columns are
    ``{fn}_{col}``.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    fn_map = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[fn_map[fn](c).alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[refn[fn](f"{fn}_{c}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )
