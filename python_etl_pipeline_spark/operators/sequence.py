"""Scale-safe global dense sequences (SURVEY.md §2.5 AUTO_INCREMENT,
§2.6 LIMIT/OFFSET).

The reference materializes a MySQL AUTO_INCREMENT ``display_id``
(src/transform.py:85) and pages result sets with LIMIT/OFFSET
(src/load.py:188-193).  The naive Spark translation —
``row_number() OVER (ORDER BY k)`` with no PARTITION BY — funnels every
row through one task (``Exchange SinglePartition`` + a single WindowExec),
which is a non-starter at 100 TB.

This module implements the zipWithIndex decomposition with the DataFrame
API, keeping *exact* dense-sequence semantics while every stage over the
data stays fully parallel:

1. approxQuantile on the leading order key picks ~equi-depth split
   points; once collected they are frozen as literals, so bucket
   assignment ``bucket(k) = #{b : b <= k}`` is a pure function of the
   key — deterministic across jobs regardless of AQE re-planning.
   (An earlier draft keyed on ``spark_partition_id()`` after
   ``repartitionByRange``; AQE coalesces the range shuffle differently
   per job, so partition ids drifted between the count job and the
   ranking job.  Value-derived buckets cannot drift.)
2. per-bucket row counts — O(num_buckets) rows — are collected to the
   driver and folded into cumulative start offsets.  This is the only
   driver-side step and is bounded by the bucket count (thousands),
   never the row count; RDD ``zipWithIndex`` runs the identical job.
3. local ``row_number`` windowed per bucket — one hash exchange on the
   bucket id, each task ranks only its own ~1/N slice.
4. ``seq = offset[bucket] + local_rank`` via a broadcast literal map.

Keys equal to a split point all compare ``<= b`` identically, so ties
never straddle buckets and the cross-bucket order is total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_global_sequence",
    "with_global_prefix_sum",
    "with_global_prefix_min",
]


def _bucket_expr(key: str, boundaries: list[float]) -> Column:
    """#{b in boundaries : b <= key} — a pure, codegen-friendly function
    of the key value (boundaries are a tiny literal array, |B| =
    num_buckets - 1)."""
    if not boundaries:
        return F.lit(0)
    barr = F.array(*[F.lit(b) for b in boundaries])
    return F.size(F.filter(barr, lambda b: b <= F.col(key)))


def with_global_sequence(
    df: DataFrame,
    order_cols: list[str],
    name: str = "seq",
    num_buckets: int | None = None,
    start: int = 1,
) -> DataFrame:
    """Append a gap-free global sequence column ``name`` (``start``,
    ``start+1``, …) following ``ORDER BY order_cols``, without ever
    planning a single-partition window.

    The leading order column must be numeric and NON-NULL (it seeds the
    equi-depth bucket boundaries); trailing order columns only break
    ties.  A null leading key raises at execution time rather than being
    silently sequenced first: ``b <= NULL`` filters every boundary, so a
    null would land in bucket 0 and corrupt the order contract without
    the guard.  Empty input returns an empty frame with the sequence
    column appended — detected from the per-bucket counts collect the
    non-empty path runs anyway (an earlier draft probed ``isEmpty()``
    up front, but that re-executed the upstream plan's first partition
    on EVERY call, taxing the common non-empty path to protect the rare
    empty one; the quantile sketch over an empty input is itself a
    near-free zero-row scan).  Triggers two small Spark jobs at
    construction time (quantile sketch + per-bucket counts); their
    results — and the literal map shipped back — are O(num_buckets),
    not O(rows).
    """
    if num_buckets is None:
        num_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    key = order_cols[0]

    qs = [i / num_buckets for i in range(1, num_buckets)]
    # Frozen as literals on the driver: even if the sketch re-ran
    # differently, every downstream job sees these exact split points.
    boundaries = sorted(set(df.approxQuantile(key, qs, 0.001))) if qs else []

    # Null-key guard, woven into the bucket value so Catalyst cannot
    # prune it: assert_true returns NULL when the check passes, so
    # when(isNull, bucket) == bucket, and a null key fails the job with
    # this message instead of quietly sequencing first.
    bucket = F.when(
        F.assert_true(
            F.col(key).isNotNull(),
            F.lit(f"with_global_sequence: null in leading order column '{key}'"),
        ).isNull(),
        _bucket_expr(key, boundaries),
    )
    tagged = df.withColumn("__bkt", bucket)

    # Tiny job: one output row per bucket (zipWithIndex's count pass).
    # This collect doubles as the empty-input detector — no counts means
    # no rows (a null leading key fails this very job via assert_true,
    # it never yields empty counts).
    counts = tagged.groupBy("__bkt").agg(F.count("*").alias("__cnt")).collect()
    if not counts:
        return df.withColumn(name, F.lit(None).cast("bigint"))
    acc = start - 1
    offsets: dict[int, int] = {}
    for row in sorted(counts, key=lambda r: r["__bkt"]):
        offsets[row["__bkt"]] = acc
        acc += row["__cnt"]

    mapping: Column = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv]
    )
    w = Window.partitionBy("__bkt").orderBy(*[F.col(c) for c in order_cols])
    return (
        tagged.withColumn("__local", F.row_number().over(w))
        .withColumn(
            name,
            (F.element_at(mapping, F.col("__bkt")) + F.col("__local")).cast("bigint"),
        )
        .drop("__bkt", "__local")
    )


def with_global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    ascending: list[bool] | None = None,
    name: str = "cum",
    num_buckets: int | None = None,
) -> DataFrame:
    """Append a global running SUM of ``value_col`` following
    ``ORDER BY order_cols`` (per-column direction in ``ascending``,
    default all ascending) — the cumulative-total sibling of
    ``with_global_sequence``, with the same scale contract: no row
    ever passes through a single-partition window.

    Same zipWithIndex-style decomposition: equi-depth buckets on the
    leading order key (frozen as literals), per-bucket SUBTOTALS —
    O(num_buckets) rows — collected and folded into cumulative start
    offsets on the driver (respecting the leading key's direction),
    then a per-bucket cumulative window plus the broadcast offset.
    Exact total-order semantics (ties share a bucket because boundary
    comparison is ``<=``), fully parallel over the data.

    The leading order key must be numeric and NON-NULL (same
    assert_true guard as the sequence engine). ``value_col`` should be
    exact (integer/decimal) if cross-engine reproducibility matters:
    per-bucket floats sum in a different order than a single-partition
    window would. NULL ``value_col`` rows follow SQL SUM semantics —
    skipped from the running total (a bucket of all-NULL values
    contributes 0 to downstream offsets), and a row whose cumulative
    frame holds only NULLs gets NULL, exactly as the single-partition
    window form would produce.
    """
    if ascending is None:
        ascending = [True] * len(order_cols)
    if num_buckets is None:
        num_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    key = order_cols[0]

    qs = [i / num_buckets for i in range(1, num_buckets)]
    boundaries = sorted(set(df.approxQuantile(key, qs, 0.001))) if qs else []

    bucket = F.when(
        F.assert_true(
            F.col(key).isNotNull(),
            F.lit(
                f"with_global_prefix_sum: null in leading order column "
                f"'{key}'"
            ),
        ).isNull(),
        _bucket_expr(key, boundaries),
    )
    tagged = df.withColumn("__bkt", bucket)

    # COALESCE the per-bucket subtotal: an all-NULL bucket folds as 0
    # in the offset accumulation (SQL SUM-over-frame would skip those
    # rows too), instead of raising a driver-side TypeError. The
    # non-null COUNT rides along so the final expression can tell
    # "running total is genuinely NULL (no value yet)" from "this
    # bucket's local frame is all-NULL but earlier buckets had values"
    # — the single-window form distinguishes them, so we must too.
    subtotals = tagged.groupBy("__bkt").agg(
        F.coalesce(F.sum(value_col), F.lit(0)).alias("__sub"),
        F.count(value_col).alias("__cnt"),
    ).collect()
    if not subtotals:
        # Match the non-empty path's output type — the SUM result type
        # (bigint for ints, double for doubles, widened decimal for
        # decimals), derived from the analyzed plan so the schema does
        # not depend on input emptiness. Plan analysis only; no job.
        sum_type = df.select(F.sum(value_col).alias("__t")).schema[
            "__t"
        ].dataType
        return df.withColumn(name, F.lit(None).cast(sum_type))
    # Buckets ascend with the key; a DESCENDING leading key consumes
    # them highest-bucket-first, so the fold direction flips with it.
    acc = 0
    acc_cnt = 0
    offsets: dict[int, int] = {}
    offset_counts: dict[int, int] = {}
    for row in sorted(
        subtotals, key=lambda r: r["__bkt"], reverse=not ascending[0]
    ):
        offsets[row["__bkt"]] = acc
        offset_counts[row["__bkt"]] = acc_cnt
        acc += row["__sub"]
        acc_cnt += row["__cnt"]

    mapping: Column = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv]
    )
    cnt_mapping: Column = F.create_map(
        *[F.lit(v) for kv in offset_counts.items() for v in kv]
    )
    order_exprs = [
        F.col(c) if asc else F.col(c).desc()
        for c, asc in zip(order_cols, ascending)
    ]
    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # NULL iff the GLOBAL cumulative frame holds no value (count 0),
    # else offset + the local sum with its NULLs folded as 0 — exactly
    # the single-partition window's SUM semantics.
    cum_cnt = F.element_at(cnt_mapping, F.col("__bkt")) + F.col("__lcnt")
    return (
        tagged.withColumn("__local", F.sum(value_col).over(w))
        .withColumn("__lcnt", F.count(value_col).over(w))
        .withColumn(
            name,
            F.when(
                cum_cnt > 0,
                F.element_at(mapping, F.col("__bkt"))
                + F.coalesce(F.col("__local"), F.lit(0)),
            ),
        )
        .drop("__bkt", "__local", "__lcnt")
    )


def with_global_prefix_min(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    ascending: list[bool] | None = None,
    name: str = "runmin",
    num_buckets: int | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Append a global running MIN of ``value_col`` following
    ``ORDER BY order_cols`` — the min-monoid sibling of
    ``with_global_prefix_sum``, same scale contract (no row ever
    crosses a single-partition window) and same decomposition:
    equi-depth buckets on the leading key, O(buckets) per-bucket MINs
    folded into prefix offsets on the driver, per-bucket running-min
    windows combined with the offset via null-skipping ``least``.

    ``inclusive=False`` computes the min over STRICTLY preceding rows
    (frame ending at -1) — the form a skyline/Pareto-frontier test
    needs; the first global row gets NULL (empty prefix). MIN is an
    idempotent monoid, so bucket overlap concerns don't exist and
    NULL values are simply skipped (SQL MIN semantics) on both the
    offset and window sides."""
    if ascending is None:
        ascending = [True] * len(order_cols)
    if num_buckets is None:
        num_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    key = order_cols[0]

    qs = [i / num_buckets for i in range(1, num_buckets)]
    boundaries = sorted(set(df.approxQuantile(key, qs, 0.001))) if qs else []

    bucket = F.when(
        F.assert_true(
            F.col(key).isNotNull(),
            F.lit(
                f"with_global_prefix_min: null in leading order column "
                f"'{key}'"
            ),
        ).isNull(),
        _bucket_expr(key, boundaries),
    )
    tagged = df.withColumn("__bkt", bucket)

    subtotals = (
        tagged.groupBy("__bkt").agg(F.min(value_col).alias("__m")).collect()
    )
    if not subtotals:
        mtype = df.select(F.min(value_col).alias("__t")).schema[
            "__t"
        ].dataType
        return df.withColumn(name, F.lit(None).cast(mtype))
    offsets: dict[int, object] = {}
    acc = None
    for row in sorted(
        subtotals, key=lambda r: r["__bkt"], reverse=not ascending[0]
    ):
        offsets[row["__bkt"]] = acc
        v = row["__m"]
        if v is not None and (acc is None or v < acc):
            acc = v
    # buckets with an empty prefix (None offset) are simply absent:
    # element_at returns NULL for a missing key, and least() skips it —
    # identical semantics without relying on NULL map values
    vt = df.schema[value_col].dataType
    present = [(b, v) for b, v in offsets.items() if v is not None]
    mapping: Column = (
        F.create_map(
            *[c for b, v in present for c in (F.lit(b), F.lit(v).cast(vt))]
        )
        if present
        else F.create_map().cast(f"map<int,{vt.simpleString()}>")
    )
    order_exprs = [
        F.col(c) if asc else F.col(c).desc()
        for c, asc in zip(order_cols, ascending)
    ]
    end = 0 if inclusive else -1
    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    return (
        tagged.withColumn("__local", F.min(value_col).over(w))
        .withColumn(
            name,
            F.least(
                F.element_at(mapping, F.col("__bkt")), F.col("__local")
            ),
        )
        .drop("__bkt", "__local")
    )
