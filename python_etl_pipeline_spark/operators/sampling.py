"""Deterministic sampling / splitting operators for training-data
pipelines.

`df.sample()` is seed-dependent per partition split — re-running on a
re-partitioned 100 TB table samples DIFFERENT rows, which poisons
train/test hygiene. These operators key every decision off a content
hash of a stable id (md5 — identical in Spark and DuckDB, so each is
oracle-checkable): the same row lands in the same split on every run,
any cluster size, any partitioning. This is the standard
hash-bucket-split used for large-corpus train/val/test hygiene.

All pure projections — zero shuffles; the only shuffle in the query
entries is their verification aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def hash_bucket(key: Column | str, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key's
    string form. Uses the first 8 hex chars (32 bits) — uniform for any
    sane bucket count."""
    col = F.col(key) if isinstance(key, str) else key
    m = F.md5(col.cast("string"))
    h: Column = F.lit(0).cast("bigint")
    for k in range(8):
        h = h * 16 + (F.instr(F.lit(_HEX), F.substring(m, k + 1, 1)) - 1)
    return (h % n_buckets).cast("bigint")


def hash_bucket_sql(key_expr: str, n_buckets: int) -> str:
    """DuckDB twin of :func:`hash_bucket` (kept adjacent for lock-step)."""
    h = "cast(0 AS BIGINT)"
    for k in range(8):
        h = (
            f"({h} * 16 + strpos('{_HEX}', "
            f"substr(md5(cast({key_expr} AS VARCHAR)), {k + 1}, 1)) - 1)"
        )
    return f"({h} % {n_buckets})"


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test') by hash percentile.

    Percentages are integer percent points; train gets the remainder.
    Membership depends only on the key value — stable across runs,
    engines, partitionings, and appends (new rows don't reshuffle old
    ones, unlike ntile/row_number-based splits which reassign everything
    whenever the table grows).
    """
    b = hash_bucket(key, 100)
    split = (
        F.when(b < 100 - val_pct - test_pct, "train")
        .when(b < 100 - test_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    rates: dict[str, int],
    strata_col: str,
    default_pct: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash
    percentile falls under its stratum's rate (integer percent).

    The per-stratum rate map is the knob for class rebalancing (e.g.
    downsample the dominant language of a crawl while keeping all of the
    rare ones). The rate lookup compiles to a CASE chain — no join, no
    shuffle; at 100 TB this is a map-only scan.
    """
    b = hash_bucket(key, 100)
    rate: Column = F.lit(default_pct)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, pct).otherwise(rate)
    return df.filter(b < rate)
