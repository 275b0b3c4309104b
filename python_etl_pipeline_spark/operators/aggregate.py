"""Aggregation operators (SURVEY.md §2.4).

Counts, watermarks, and multi-agg summaries. All map-side-combinable
built-ins — partial aggregation happens before the shuffle, so these
stay one-exchange plans at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from functools import reduce


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
