"""Data-derived blow-up caps for the dedup/similarity bucket guards.

dd2/dd3/dd5/dd11 all bound their pair fan-out with a size cap (LSH
bucket population, shingle posting-list length, k-means cell size). A
literal cap is tuned for one corpus size: at 100x the data a legitimate
posting-list tail crosses any fixed constant (the sf0.1 shingle
doc-freq fence is already 5x the sf0.01 one), while on a tiny corpus an
over-generous constant silently stops guarding. This module derives
the cap FROM the size distribution itself:

    cap = clamp(q3 + k * (q3 - q1),  floor,  hard_max)

* **q1/q3 are discrete (type-1) quantiles** computed from the size
  histogram — `min(size where cum_count >= ceil(p * n))` — pure integer
  arithmetic, so a SQL oracle reproduces the cap bit-exactly (an
  interpolated quantile would race float rounding across engines).
* **`floor`** is the recall guarantee: duplicate clusters smaller than
  the floor are never dropped, however spiky the distribution (a
  clean corpus has q3 = IQR = 1 and a bare fence would cap at 1,
  discarding every real duplicate bucket).
* **`hard_max`** is the task-memory ceiling for the operators whose
  per-group work is quadratic (the BLAS gram kernels): whatever the
  distribution says, one group must fit one executor's memory.

Scale shape: the histogram is one keyed agg over the (already grouped)
size frame, the quantile pass runs over the tiny histogram (distinct
size values — bounded by the cap itself at steady state), and the cap
joins back as a 1-row broadcast scalar. Nothing reaches the driver;
the whole derivation stays in the lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "derived_cap",
    "discrete_quantiles",
    "tukey_cap_sql_ctes",
    "filter_by_derived_cap",
]


def discrete_quantiles(
    values: DataFrame, col: str, ps: list[float], max_distinct: int = 1_000_000
) -> DataFrame:
    """One-row frame with ``__q0 .. __q{len(ps)-1}`` = the discrete
    (type-1) quantiles of ``values[col]``: q_p = min(v : cum_count(v) >=
    ceil(p * n)), computed from the value histogram. Integer-exact (no
    interpolation), so a SQL twin reproduces each quantile bit-for-bit.

    Plan shape: one keyed agg builds the histogram (distinct values —
    bounded by the cap itself at steady state for the size
    distributions this module serves), then a single global agg packs
    it into a sorted array and every quantile is a pure ``aggregate``
    fold over that array. No window at all — the earlier cumulative-sum
    window ran unpartitioned and tripped Spark's "No Partition Defined"
    alarm hundreds of times per bench run even though its input was
    histogram-sized; the fold computes the identical cum-count walk
    inside one expression.

    NULLs are excluded before the histogram: a cumulative walk that
    included them would shift every quantile by the null count on
    exactly one side of a SQL twin (engines disagree on null sort
    order). Any SQL twin must carry the same ``WHERE col IS NOT NULL``
    in its hist CTE.

    ``max_distinct`` is the single-task memory guard: the packed
    histogram is one array in one row, so the hard memory bound is the
    column's DISTINCT-value count, not its row count. The size
    distributions this module serves are discrete and cap-bounded
    (thousands of distinct values at steady state), but a caller
    pointing this at a high-cardinality continuous metric would
    otherwise OOM one task with no warning — the guard fails the job
    with an explicit message instead (woven into ``__n`` via
    ``assert_true`` so Catalyst cannot prune it). The check runs on the
    packed array, so memory up to O(max_distinct) struct entries is
    still briefly allocated before it fires — the default 1M entries is
    ~32 MB, far under task memory; raise it only with that arithmetic
    in hand. For genuinely high-cardinality inputs use
    ``DataFrame.approxQuantile`` — the sketch trades the bit-exact
    oracle twin for bounded memory."""
    vt = values.schema[col].dataType
    hist = (
        values.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count("*").alias("__c"))
    )
    guard = F.assert_true(
        F.size("__h") <= F.lit(max_distinct),
        F.lit(
            f"discrete_quantiles: histogram of '{col}' exceeds "
            f"max_distinct={max_distinct} distinct values; use "
            f"approxQuantile for high-cardinality columns"
        ),
    )
    packed = hist.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(col).alias("v"), F.col("__c").alias("c")))
        ).alias("__h")
    ).select(
        "__h",
        F.when(
            guard.isNull(),
            F.aggregate(
                "__h", F.lit(0).cast("long"), lambda acc, x: acc + x["c"]
            ),
        ).alias("__n"),
    )

    def q_expr(p: float):
        target = F.ceil(F.col("__n") * F.lit(p))
        zero = F.struct(
            F.lit(0).cast("long").alias("cum"),
            F.lit(None).cast(vt).alias("q"),
        )
        walk = F.aggregate(
            "__h",
            zero,
            lambda acc, x: F.struct(
                (acc["cum"] + x["c"]).alias("cum"),
                F.coalesce(
                    acc["q"], F.when(acc["cum"] + x["c"] >= target, x["v"])
                ).alias("q"),
            ),
        )
        return walk["q"]

    return packed.select(
        *[q_expr(p).alias(f"__q{i}") for i, p in enumerate(ps)]
    )


def derived_cap(
    sizes: DataFrame,
    size_col: str,
    floor: int,
    hard_max: int | None = None,
    k: int = 3,
) -> DataFrame:
    """One-row frame with ``__cap`` = clamp(q3 + k*IQR, floor, hard_max)
    over the values of ``sizes[size_col]`` (discrete quantiles — see
    :func:`discrete_quantiles`)."""
    qs = discrete_quantiles(sizes, size_col, [0.25, 0.75])
    cap = F.greatest(
        F.col("__q1") + F.lit(k) * (F.col("__q1") - F.col("__q0")), F.lit(floor)
    )
    if hard_max is not None:
        cap = F.least(cap, F.lit(hard_max))
    return qs.select(cap.cast("bigint").alias("__cap"))


def filter_by_derived_cap(
    df: DataFrame,
    group_cols: list[str],
    floor: int,
    hard_max: int | None = None,
    k: int = 3,
) -> DataFrame:
    """Drop every group of ``df`` (keyed by ``group_cols``) whose row
    count exceeds the :func:`derived_cap` of the group-size
    distribution. One keyed agg for sizes, the tiny quantile plan, a
    1-row broadcast cross join, and a semi-join back — no collect."""
    sizes = df.groupBy(*group_cols).agg(F.count("*").alias("__gsz"))
    cap = derived_cap(sizes.select("__gsz"), "__gsz", floor, hard_max, k)
    keep = (
        sizes.crossJoin(F.broadcast(cap))
        .filter(F.col("__gsz") <= F.col("__cap"))
        .select(*group_cols)
    )
    return df.join(keep, group_cols, "left_semi")


def tukey_cap_sql_ctes(
    src: str,
    keys: str,
    floor: int,
    hard_max: int | None = None,
    k: int = 3,
    out: str = "capped",
) -> str:
    """DuckDB twin of :func:`filter_by_derived_cap`, kept adjacent so
    the two stay in lock-step: CTE chain ending in ``{out}`` = the rows
    of CTE ``src`` whose (``keys``)-group size is within the derived
    cap. Append after a WITH chain that already defines ``src``."""
    cap_expr = f"greatest(__q3 + {k} * (__q3 - __q1), {floor})"
    if hard_max is not None:
        cap_expr = f"least({cap_expr}, {hard_max})"
    return f"""
    __bsz AS (SELECT {keys}, count(*) AS __gsz FROM {src} GROUP BY {keys}),
    __hist AS (SELECT __gsz, count(*) AS __c FROM __bsz GROUP BY __gsz),
    __cum AS (SELECT __gsz, sum(__c) OVER (ORDER BY __gsz) AS __cum,
                     sum(__c) OVER () AS __n FROM __hist),
    __qs AS (SELECT min(CASE WHEN __cum >= ceil(0.25 * __n) THEN __gsz END) AS __q1,
                    min(CASE WHEN __cum >= ceil(0.75 * __n) THEN __gsz END) AS __q3
             FROM __cum),
    __capv AS (SELECT {cap_expr} AS __cap FROM __qs),
    {out} AS (SELECT {src}.* FROM {src} JOIN __bsz USING ({keys}), __capv
              WHERE __gsz <= __cap)"""
