"""Declarative data-quality expectations — the Deequ/Great-
Expectations shape on the Spark engine: a suite of per-column checks
compiled into ONE aggregation pass per table, reported as
(table, check, metric, threshold, pass) rows.

Reference analog: the health check's row-count/connection probes
(test.py:134-160) generalized to column-level contracts. At 100 TB
the compile-to-one-agg design is the whole point: N expectations on a
table cost one scan with map-side partials, not N scans.

Check kinds (metric is always a fraction in [0, 1], pass means
metric >= threshold):

* ``not_null``  — fraction of non-null values
* ``unique``    — distinct values / rows (1.0 = fully unique)
* ``in_range``  — fraction of non-null values inside [lo, hi]
* ``in_set``    — fraction of non-null values in the allowed set
* ``matches``   — fraction of non-null values matching a regex
* ``non_empty`` — fraction of rows with non-empty trimmed text
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_KINDS = frozenset(
    {"not_null", "unique", "in_range", "in_set", "matches", "non_empty"}
)


@dataclass(frozen=True)
class Expectation:
    column: str
    kind: str
    threshold: float = 1.0
    lo: float | None = None
    hi: float | None = None
    allowed: tuple = ()
    pattern: str | None = None

    def __post_init__(self) -> None:
        # Kind-required params are validated at CONSTRUCTION (r11
        # advice): an in_range with lo/hi missing used to evaluate to
        # a NULL metric that coalesce(..., 1.0) silently PASSED —
        # indistinguishable from a vacuous check. Misconfiguration now
        # fails loudly before any Spark job runs.
        if self.kind not in _KINDS:
            raise ValueError(f"unknown expectation kind {self.kind!r}")
        if self.kind == "in_range" and (self.lo is None or self.hi is None):
            raise ValueError(
                f"in_range on {self.column!r} requires both lo and hi"
            )
        if self.kind == "in_set" and not self.allowed:
            raise ValueError(
                f"in_set on {self.column!r} requires a non-empty allowed set"
            )
        if self.kind == "matches" and not self.pattern:
            raise ValueError(
                f"matches on {self.column!r} requires a non-empty pattern"
            )

    @property
    def name(self) -> str:
        return f"{self.column}.{self.kind}"


def _metric(e: Expectation) -> Column:
    c = F.col(e.column)
    if e.kind == "not_null":
        return F.avg(F.when(c.isNotNull(), 1.0).otherwise(0.0))
    if e.kind == "unique":
        return F.count_distinct(c) / F.count(F.lit(1))
    if e.kind == "in_range":
        return F.avg(
            F.when(c.isNull(), None)
            .when((c >= F.lit(e.lo)) & (c <= F.lit(e.hi)), 1.0)
            .otherwise(0.0)
        )
    if e.kind == "in_set":
        return F.avg(
            F.when(c.isNull(), None)
            .when(c.isin(*[F.lit(v) for v in e.allowed]), 1.0)
            .otherwise(0.0)
        )
    if e.kind == "matches":
        return F.avg(
            F.when(c.isNull(), None)
            .when(c.rlike(e.pattern), 1.0)
            .otherwise(0.0)
        )
    if e.kind == "non_empty":
        return F.avg(
            F.when(
                c.isNotNull() & (F.length(F.trim(c)) > 0), 1.0
            ).otherwise(0.0)
        )
    raise ValueError(f"unknown expectation kind {e.kind!r}")


def _sql_lit(v) -> str:
    """A DuckDB literal matching Spark's TYPED comparison (r11
    advice): numbers stay unquoted (quoting them as strings leaned on
    DuckDB implicit casts and diverged from Spark's typed isin), and
    embedded single quotes are doubled so a value like ``O'Brien``
    cannot break the oracle SQL."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _metric_sql(e: Expectation) -> str:
    c = e.column
    if e.kind == "not_null":
        return f"avg(CASE WHEN {c} IS NOT NULL THEN 1e0 ELSE 0e0 END)"
    if e.kind == "unique":
        return f"count(DISTINCT {c}) * 1e0 / count(*)"
    if e.kind == "in_range":
        return (
            f"avg(CASE WHEN {c} IS NULL THEN NULL "
            f"WHEN {c} >= {e.lo} AND {c} <= {e.hi} THEN 1e0 "
            f"ELSE 0e0 END)"
        )
    if e.kind == "in_set":
        vals = ", ".join(_sql_lit(v) for v in e.allowed)
        return (
            f"avg(CASE WHEN {c} IS NULL THEN NULL "
            f"WHEN {c} IN ({vals}) THEN 1e0 ELSE 0e0 END)"
        )
    if e.kind == "matches":
        return (
            f"avg(CASE WHEN {c} IS NULL THEN NULL "
            f"WHEN regexp_matches({c}, {_sql_lit(e.pattern)}) THEN 1e0 "
            f"ELSE 0e0 END)"
        )
    if e.kind == "non_empty":
        return (
            f"avg(CASE WHEN {c} IS NOT NULL AND length(trim({c})) > 0 "
            f"THEN 1e0 ELSE 0e0 END)"
        )
    raise ValueError(f"unknown expectation kind {e.kind!r}")


def evaluate(
    df: DataFrame, table_name: str, suite: list[Expectation]
) -> DataFrame:
    """All expectations on one table in ONE agg pass; a coalesce(x, 1)
    makes a vacuous check (every value NULL in in_range/in_set/
    matches) PASS — absence of values is not a violation of a
    value-shape rule (not_null exists for that)."""
    aggs = [
        F.round(F.coalesce(_metric(e), F.lit(1.0)), 6).alias(f"m{i}")
        for i, e in enumerate(suite)
    ]
    row = df.agg(*aggs)
    # Unpivot via array-of-structs, NOT create_map (r11 advice): a
    # suite with two same-kind checks on one column (e.g. two in_range
    # bands) has duplicate names, which create_map throws on under
    # Spark's default mapKeyDedupPolicy=EXCEPTION while the DuckDB
    # twin emits both rows fine. Arrays carry duplicates natively and
    # preserve suite order, matching evaluate_sql's UNION ALL legs.
    entries = [
        F.struct(
            F.lit(e.name).alias("check_name"),
            F.col(f"m{i}").alias("metric"),
            F.lit(float(e.threshold)).alias("threshold"),
        )
        for i, e in enumerate(suite)
    ]
    kv = row.select(F.explode(F.array(*entries)).alias("v"))
    return kv.select(
        F.lit(table_name).alias("table_name"),
        F.col("v.check_name").alias("check_name"),
        F.col("v.metric").alias("metric"),
        F.col("v.threshold").alias("threshold"),
        F.when(F.col("v.metric") >= F.col("v.threshold"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("passed"),
    )


def evaluate_sql(table_name: str, suite: list[Expectation]) -> str:
    """The DuckDB twin of :func:`evaluate` for oracle parity — same
    one-agg-pass-then-unpivot shape."""
    metrics = ", ".join(
        f"round(coalesce({_metric_sql(e)}, 1e0), 6) AS m{i}"
        for i, e in enumerate(suite)
    )
    legs = " UNION ALL ".join(
        f"SELECT {_sql_lit(table_name)} AS table_name, "
        f"{_sql_lit(e.name)} AS check_name, "
        f"m{i} AS metric, {float(e.threshold)!r} AS threshold, "
        f"cast(CASE WHEN m{i} >= {float(e.threshold)!r} THEN 1 ELSE 0 END "
        f"AS BIGINT) AS passed FROM agg_{table_name}"
        for i, e in enumerate(suite)
    )
    return (
        f"agg_{table_name} AS (SELECT {metrics} FROM {table_name}), "
        f"rep_{table_name} AS ({legs})"
    )
