"""Driver-contract query registry.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL string over the same parquet tables. Names map
1:1 onto SURVEY.md §2's operator inventory (the key encodes the operator id).

Parity rules (driver compares row-count + schema + order-insensitive
value hash):
* every computed column is aliased identically in Spark and SQL;
* double aggregates are rounded in-query on both sides;
* integer-valued computed columns are cast to BIGINT on both sides
  (Spark's row_number is int32, DuckDB's is int64; DuckDB sum(BIGINT)
  is HUGEINT — casts make them agree);
* date/time constants are fixed literals so runs are deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import (
    safe_val,
    safe_num,
    safe_date,
    numeric_id,
    normalize_null_sentinels,
    calc_age,
    tenure_days,
    duration_months,
    customer_segment,
    risk_category,
    transaction_category,
    gender_norm,
    fraud_flag,
    region_map,
)
from .llm.text import let_
from .operators import (
    dedup_keep_first,
    dedup_keep_last,
    split_new_vs_existing,
    fk_join,
    range_join,
    pk_filter,
)
from .operators.sequence import with_global_sequence
from .plans import upsert_last_writer_wins, incremental_append_watermark

AS_OF = "2026-01-01"  # fixed reference date for age/tenure determinism


@dataclass
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => non-SQL-expressible; driver does rows-only check


# Query -> the round it was first registered. A query cannot carry a
# driver CORRECTNESS row from before it existed, so the staleness gate
# (tests/test_gate_policy.py) anchors a never-gated query's clock at
# ``first_round - 1``: it becomes overdue HORIZON rounds after
# registration, not retroactively on the round it lands. Only queries
# registered AFTER their round's 50-slot gate was frozen appear here —
# everything older either holds a driver row or was rotated by the
# standing policy.
_FIRST_ROUND: dict[str, int] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized parquet
        # reader rejects; read nanos as long and convert (micro precision).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # integer DIV, not `/`: double division of ~1e18 nanos loses
            # sub-microsecond precision (53-bit mantissa) and shifts
            # timestamps by up to ~100 ns after the cast.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, first_round: int | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(spark=fn, sql=sql)
        if first_round is not None:
            _FIRST_ROUND[name] = first_round
        return fn

    return deco


# ===========================================================================
# Flagship — scan → broadcast FK joins → cleanse → band → aggregate
# ===========================================================================

@register(
    "flagship_customer_segments",
    """
    SELECT r_name AS region,
           CASE WHEN c_acctbal > 5000 THEN 'VIP'
                WHEN c_acctbal > 1000 THEN 'Regular'
                WHEN c_acctbal > 0    THEN 'New'
                ELSE 'NA' END AS segment,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS sum_acctbal,
           round(avg(c_acctbal), 2) AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
)
def flagship_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's whole transform tier in one plan — FK joins
    it only declares (J3), segment banding (F6-shape), multi-agg (A3).
    Dimensions broadcast (25 + 5 rows); the agg partial-aggregates map-side."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    seg = (
        F.when(F.col("c_acctbal") > 5000, "VIP")
        .when(F.col("c_acctbal") > 1000, "Regular")
        .when(F.col("c_acctbal") > 0, "New")
        .otherwise("NA")
    )
    return (
        fk_join(customer, nation, on=[customer.c_nationkey == nation.n_nationkey], broadcast_dim=True)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("segment", seg)
        .groupBy(F.col("r_name").alias("region"), "segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
    )


# ===========================================================================
# Aggregations (A1–A6) + TPC-H Q1-style pricing summary
# ===========================================================================

@register(
    "a0_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a0_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the engine's headline agg — 8 aggregates, 2 group
    keys, filter pushed to the parquet scan, fully map-side-combinable."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "a1_table_counts",
    """
    SELECT 'customer' AS table_name, count(*) AS row_count FROM customer
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    """,
)
def a1_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-table row counts (verification surface, src/extract.py:558)."""
    from .operators import table_counts

    return table_counts(
        {name: _t(spark, sf_dir, name) for name in ("customer", "orders", "lineitem")}
    )


@register(
    "a2_max_watermark",
    "SELECT max(o_orderkey) AS max_key, max(o_orderdate) AS max_date FROM orders",
)
def a2_max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: high-watermark probe (src/load.py:133-134)."""
    return _t(spark, sf_dir, "orders").agg(
        F.max("o_orderkey").alias("max_key"), F.max("o_orderdate").alias("max_date")
    )


@register(
    "a3_multiagg_summary",
    """
    SELECT count(*) AS n, round(sum(value), 2) AS sum_value, max(ts) AS max_ts
    FROM events
    """,
)
def a3_multiagg_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: one-pass COUNT/SUM/MAX summary (src/extract.py:573-580)."""
    return _t(spark, sf_dir, "events").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.max("ts").alias("max_ts"),
    )


@register("a4_distinct_keys", "SELECT DISTINCT o_custkey FROM orders")
def a4_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: DISTINCT key projection (src/extract.py:320)."""
    return _t(spark, sf_dir, "orders").select("o_custkey").distinct()


@register(
    "a6_dedup_counters",
    """
    SELECT count(*) AS total_rows,
           count(DISTINCT o_custkey) AS distinct_keys,
           count(*) - count(DISTINCT o_custkey) AS duplicates
    FROM orders
    """,
)
def a6_dedup_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: duplicate accounting (src/transform.py:33-38)."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("total_rows"),
        F.countDistinct("o_custkey").alias("distinct_keys"),
        (F.count("*") - F.countDistinct("o_custkey")).alias("duplicates"),
    )


# ===========================================================================
# Projections / filters (P1–P5)
# ===========================================================================

@register(
    "p1_projection_reorder",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
)
def p1_projection_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: validated projection into canonical order; Catalyst prunes the
    scan to exactly these columns (check ReadSchema)."""
    from .operators import validate_and_project

    l = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"
    )
    return validate_and_project(l, ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"])


@register(
    "p2_pk_filter",
    """
    WITH messy AS (
      SELECT CASE WHEN doc_id % 10 = 0 THEN ''
                  WHEN doc_id % 10 = 5 THEN NULL
                  ELSE cast(doc_id AS VARCHAR) END AS pk
      FROM documents
    )
    SELECT pk FROM messy WHERE pk IS NOT NULL AND trim(pk) <> ''
    """,
)
def p2_pk_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: PK non-null/non-empty guard (src/extract.py:387-388)."""
    d = _t(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 10 == 0, F.lit(""))
        .when(F.col("doc_id") % 10 == 5, F.lit(None))
        .otherwise(F.col("doc_id").cast("string"))
        .alias("pk")
    )
    return pk_filter(d, "pk")


@register(
    "p3_null_sentinels",
    """
    WITH messy AS (
      SELECT event_id,
             (['ok','nan','None','NaT','<NA>','','NULL','value'])[cast(event_id % 8 + 1 AS INT)] AS raw
      FROM events
    )
    SELECT event_id,
           CASE WHEN trim(raw) IN ('nan','None','NaT','<NA>','','NaN','NULL','null','N/A')
                THEN NULL ELSE raw END AS cleaned
    FROM messy
    """,
)
def p3_null_sentinels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: null-sentinel normalization (src/extract.py:297-306)."""
    e = _t(spark, sf_dir, "events")
    choices = F.array(*[F.lit(s) for s in ["ok", "nan", "None", "NaT", "<NA>", "", "NULL", "value"]])
    raw = F.element_at(choices, (F.col("event_id") % 8 + 1).cast("int"))
    return e.select("event_id", normalize_null_sentinels(raw).alias("cleaned"))


@register(
    "p5_date_range_guard",
    """
    SELECT o_orderkey, o_orderdate FROM orders
    WHERE year(o_orderdate) BETWEEN 1900 AND 2000
    """,
)
def p5_date_range_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: year-validity range predicate (src/transform.py:189)."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderdate").filter(
        F.year("o_orderdate").between(1900, 2000)
    )


# ===========================================================================
# Joins / set ops (J1, J3, set)
# ===========================================================================

@register(
    "j1_anti_new_keys",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 420000)
    """,
)
def j1_anti_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (new half): customers absent from the existing key set — the
    reference's Python set difference (src/extract.py:397-402) as a
    distributed anti-join. The 'existing' side is the high-value-order
    key set so both halves of the split are non-empty at every sf."""
    new_rows, _ = split_new_vs_existing(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 420000)
        .withColumnRenamed("o_custkey", "c_custkey"),
        "c_custkey",
    )
    return new_rows.select("c_custkey")


@register(
    "j1_semi_existing_keys",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def j1_semi_existing_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (updated half): customers present in orders (semi join)."""
    _, updated = split_new_vs_existing(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey"),
        "c_custkey",
    )
    return updated.select("c_custkey")


@register(
    "j3_fact_dim_join",
    """
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def j3_fact_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: the fact-fact FK join (orders ⋈ lineitem on the key both sides
    shuffle on; AQE right-sizes the exchange)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "set1_except_intersect",
    """
    SELECT 'only_customers' AS side, count(*) AS n FROM (
      SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'both', count(*) FROM (
      SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders
    )
    """,
)
def set1_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: set algebra on key projections (EXCEPT / INTERSECT)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    only = c.exceptAll(o.distinct()).distinct().agg(F.count("*").alias("n")).select(
        F.lit("only_customers").alias("side"), "n"
    )
    both = c.intersect(o).agg(F.count("*").alias("n")).select(F.lit("both").alias("side"), "n")
    return only.unionByName(both)


# ===========================================================================
# Sort / dedup / windows (O1–O5, W)
# ===========================================================================

@register(
    "o1_digit_sort",
    """
    SELECT c_custkey,
           cast(coalesce(try_cast(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT), 0) AS BIGINT) AS sort_key,
           cast(row_number() OVER (
             ORDER BY coalesce(try_cast(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT), 0),
                      c_custkey) AS BIGINT) AS rn
    FROM customer
    """,
)
def o1_digit_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/F14: digit-concatenation sort key ('Customer#000000042' -> 42)
    with an observable total order (src/extract.py:272-294).

    The dense numbering rides the partition-offset sequence engine
    (operators/sequence.py) exactly like w1/o5/x32 — a bare
    ``row_number() OVER (ORDER BY ...)`` plans ``Exchange
    SinglePartition`` and funnels the whole table through one task,
    which was the last data-sized single-partition window in the
    registry (VERDICT r5 §What's wrong #1)."""
    from .operators.sequence import with_global_sequence

    c = _t(spark, sf_dir, "customer")
    key = numeric_id(F.col("c_name")).cast("bigint")
    keyed = c.select("c_custkey", key.alias("sort_key"))
    return with_global_sequence(
        keyed, ["sort_key", "c_custkey"], name="rn"
    ).select("c_custkey", "sort_key", "rn")


@register(
    "o2_dedup_keep_last",
    """
    SELECT o_orderkey, o_custkey, o_orderdate, round(o_totalprice, 2) AS totalprice
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def o2_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: keep-last dedup as a ranking window (src/extract.py:389).
    Deterministic under parallelism via explicit (date, key) order."""
    o = _t(spark, sf_dir, "orders")
    d = dedup_keep_last(o, "o_custkey", [F.col("o_orderdate"), F.col("o_orderkey")])
    return d.select(
        "o_orderkey", "o_custkey", "o_orderdate", F.round("o_totalprice", 2).alias("totalprice")
    )


@register(
    "o3_dedup_keep_first",
    """
    SELECT o_orderkey, o_custkey, o_orderdate
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) = 1
    """,
)
def o3_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: keep-first dedup (src/transform.py:244)."""
    o = _t(spark, sf_dir, "orders")
    d = dedup_keep_first(o, "o_custkey", [F.col("o_orderdate"), F.col("o_orderkey")])
    return d.select("o_orderkey", "o_custkey", "o_orderdate")


@register(
    "w1_display_id",
    """
    SELECT o_orderkey, cast(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS display_id
    FROM orders
    """,
)
def w1_display_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: AUTO_INCREMENT display_id (src/transform.py:85) via
    zipWithIndex-style partition-offset composition
    (:func:`operators.sequence.with_global_sequence`): range-partition on
    the key, rank locally per partition, add driver-computed cumulative
    offsets (O(num_partitions) rows).  Exact dense-sequence semantics,
    zero single-partition stages — the plan-guard test pins the absence
    of ``Exchange SinglePartition``."""
    o = _t(spark, sf_dir, "orders")
    return with_global_sequence(
        o.select("o_orderkey"), ["o_orderkey"], name="display_id"
    ).select("o_orderkey", "display_id")


@register(
    "w2_running_sum",
    """
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window extension: per-customer running total (engine surface beyond
    the reference, natural on the banking schema)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "w3_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
           cast(rnk AS BIGINT) AS rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def w3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — windowed rank + filter (guide's OLAP pattern)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


# ===========================================================================
# Scalar cleansing functions (F1–F16)
# ===========================================================================

@register(
    "f1_safe_val",
    """
    WITH messy AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN '  ' || c_mktsegment || '  '
                  WHEN c_custkey % 5 = 1 THEN 'NaN'
                  WHEN c_custkey % 5 = 2 THEN ''
                  WHEN c_custkey % 5 = 3 THEN NULL
                  ELSE c_mktsegment END AS raw
      FROM customer
    )
    SELECT c_custkey,
           CASE WHEN raw IS NULL OR trim(raw) IN
                  ('nan','None','NaT','<NA>','','NaN','NULL','null','N/A')
                THEN 'Na'
                ELSE upper(substr(trim(raw), 1, 1)) || lower(substr(trim(raw), 2)) END AS cleaned
    FROM messy
    """,
)
def f1_safe_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: safe_val with title-casing — null-ish -> 'NA' (title-cased to
    'Na' here since the default passes through the case normalizer, exactly
    as the reference's safe_val(default)+str.title() composition behaves)."""
    c = _t(spark, sf_dir, "customer")
    raw = (
        F.when(F.col("c_custkey") % 5 == 0, F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  ")))
        .when(F.col("c_custkey") % 5 == 1, F.lit("NaN"))
        .when(F.col("c_custkey") % 5 == 2, F.lit(""))
        .when(F.col("c_custkey") % 5 == 3, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
    )
    return c.select("c_custkey", safe_val(raw, title=True).alias("cleaned"))


@register(
    "f3_safe_num",
    """
    WITH cents AS (
      SELECT o_orderkey, cast(floor(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ), messy AS (
      SELECT o_orderkey,
             '₹ ' || format('{:,}', c // 100) || '.' || lpad(cast(c % 100 AS VARCHAR), 2, '0') AS raw,
             c
      FROM cents
    )
    SELECT o_orderkey, raw,
           cast(cast(c // 100 AS VARCHAR) || '.' || lpad(cast(c % 100 AS VARCHAR), 2, '0') AS DOUBLE) AS amount
    FROM messy
    """,
)
def f3_safe_num(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: currency-stripping numeric parse. Builds '₹ 123,456.78'-style
    strings deterministically from o_totalprice, then parses them back with
    safe_num (strip ₹/$/,/space -> decimal(15,2) -> double)."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    intpart = F.floor(cents / 100).cast("bigint")
    frac = F.lpad((cents % 100).cast("string"), 2, "0")
    raw = F.concat(F.lit("₹ "), F.format_number(intpart, 0), F.lit("."), frac)
    return o.select(
        "o_orderkey",
        raw.alias("raw"),
        safe_num(raw).cast("double").alias("amount"),
    )


@register(
    "f2_safe_date",
    """
    WITH formatted AS (
      SELECT o_orderkey, o_orderdate AS d,
             CASE cast(o_orderkey % 4 AS INT)
               WHEN 0 THEN strftime(o_orderdate, '%d-%m-%Y')
               WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
               WHEN 2 THEN strftime(o_orderdate, '%d/%m/%Y')
               ELSE strftime(o_orderdate, '%d-%m-%y')
             END AS raw
      FROM orders
    )
    SELECT o_orderkey, raw, cast(cast(d AS DATE) AS TIMESTAMP) AS parsed
    FROM formatted
    """,
)
def f2_safe_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: multi-format date parse round-trip. Four surface formats
    (dd-mm-yyyy, iso, dd/mm/yyyy, dd-mm-yy with the 2-digit pivot) are
    generated from o_orderdate and must all parse back to the original
    date. The oracle emits the original date directly — parity proves the
    parser inverts every format, pivot included."""
    from .llm.dedup import _spread

    # regex-chain parse is CPU-bound: fan a narrow single-split source
    # out to cluster width (no-op when the source already has >= cores
    # splits — see dedup._spread)
    o = _spread(_t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"))
    d = F.col("o_orderdate")
    raw = (
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format(d, "dd-MM-yyyy"))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format(d, "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 4 == 2, F.date_format(d, "dd/MM/yyyy"))
        .otherwise(F.date_format(d, "dd-MM-yy"))
    )
    return o.select(
        "o_orderkey", raw.alias("raw"), safe_date(raw).cast("timestamp").alias("parsed")
    )


@register(
    "f4_calc_age",
    f"""
    SELECT o_orderkey,
           cast(greatest(
             year(DATE '{AS_OF}') - year(o_orderdate)
             - CASE WHEN (month(DATE '{AS_OF}'), day(DATE '{AS_OF}'))
                       < (month(o_orderdate), day(o_orderdate))
                    THEN 1 ELSE 0 END,
             0) AS BIGINT) AS age
    FROM orders
    """,
)
def f4_calc_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: birthday-aware age (o_orderdate standing in for dob; fixed
    as-of date for determinism)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        calc_age(F.col("o_orderdate"), as_of=F.lit(AS_OF).cast("date")).cast("bigint").alias("age"),
    )


@register(
    "f5_tenure_days",
    f"""
    SELECT o_orderkey,
           cast(greatest(coalesce(date_diff('day', cast(o_orderdate AS DATE), DATE '{AS_OF}'), 0), 0) AS BIGINT)
             AS tenure_days
    FROM orders
    """,
)
def f5_tenure_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: tenure in days, clamped at 0 (src/transform.py:310-314)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        tenure_days(F.col("o_orderdate"), as_of=F.lit(AS_OF).cast("date"))
        .cast("bigint")
        .alias("tenure_days"),
    )


@register(
    "f6_customer_segment",
    f"""
    WITH t AS (
      SELECT o_orderkey,
             greatest(coalesce(date_diff('day', cast(o_orderdate AS DATE), DATE '{AS_OF}'), 0), 0) AS tenure
      FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN tenure >= 730 THEN 'VIP'
                WHEN tenure >= 180 THEN 'Regular'
                WHEN tenure > 0 THEN 'New'
                ELSE 'NA' END AS segment
    FROM t
    """,
)
def f6_customer_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: tenure banding (src/transform.py:316-317)."""
    o = _t(spark, sf_dir, "orders")
    tenure = tenure_days(F.col("o_orderdate"), as_of=F.lit(AS_OF).cast("date"))
    return o.select("o_orderkey", customer_segment(tenure).alias("segment"))


@register(
    "f7_region_map",
    """
    SELECT c_custkey,
           CASE WHEN upper(c_mktsegment) LIKE '%FURN%' OR upper(c_mktsegment) LIKE '%AUTO%' THEN 'North'
                WHEN upper(c_mktsegment) LIKE '%MACH%' THEN 'West'
                WHEN upper(c_mktsegment) LIKE '%HOUSE%' THEN 'South'
                ELSE 'NA' END AS region
    FROM customer
    """,
)
def f7_region_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: substring-containment region mapping (src/transform.py:251-258)
    — 'HOUSE' matching HOUSEHOLD reproduces the reference's 'UP' ⊂
    'UTTAR PRADESH' quirk."""
    c = _t(spark, sf_dir, "customer")
    words = [
        ("North", ["FURN", "AUTO"]),
        ("West", ["MACH"]),
        ("South", ["HOUSE"]),
    ]
    return c.select("c_custkey", region_map(F.col("c_mktsegment"), words).alias("region"))


@register(
    "f8_gender_norm",
    """
    WITH messy AS (
      SELECT c_custkey,
             (['M','f','male','Female','  FEMALE  ','x'])[cast(c_custkey % 6 + 1 AS INT)] AS raw
      FROM customer
    )
    SELECT c_custkey,
           CASE WHEN lower(trim(raw)) IN ('m','male') THEN 'M'
                WHEN lower(trim(raw)) IN ('f','female') THEN 'F'
                ELSE 'N' END AS gender
    FROM messy
    """,
)
def f8_gender_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: gender normalization (src/transform.py:323-327)."""
    c = _t(spark, sf_dir, "customer")
    choices = F.array(*[F.lit(s) for s in ["M", "f", "male", "Female", "  FEMALE  ", "x"]])
    raw = F.element_at(choices, (F.col("c_custkey") % 6 + 1).cast("int"))
    return c.select("c_custkey", gender_norm(raw).alias("gender"))


@register(
    "f9_duration_months",
    """
    SELECT o_orderkey,
           cast(greatest((2025 - year(o_orderdate)) * 12 + (6 - month(o_orderdate)), 0) AS BIGINT)
             AS duration_months
    FROM orders
    """,
)
def f9_duration_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: calendar-month period difference, day-insensitive, clamped
    (src/transform.py:392-395) — deliberately NOT months_between."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        duration_months(F.col("o_orderdate"), F.lit("2025-06-15").cast("date"))
        .cast("bigint")
        .alias("duration_months"),
    )


@register(
    "f10_risk_category",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 500000 THEN 'High'
                WHEN o_totalprice > 100000 THEN 'Medium'
                ELSE 'Low' END AS risk_category
    FROM orders
    """,
)
def f10_risk_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: loan-amount banding (src/transform.py:397-398)."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderkey", risk_category(F.col("o_totalprice")).alias("risk_category"))


@register(
    "f11_transaction_category",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_extendedprice > 10000 THEN 'Large'
                WHEN l_extendedprice > 1000 THEN 'Medium'
                ELSE 'Small' END AS txn_category
    FROM lineitem
    """,
)
def f11_transaction_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: transaction amount banding (src/transform.py:462-463)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        transaction_category(F.col("l_extendedprice")).alias("txn_category"),
    )


@register(
    "f12_fraud_flag",
    """
    WITH messy AS (
      SELECT event_id,
             (['true','1','yes','y','no','0','TRUE','zzz'])[cast(event_id % 8 + 1 AS INT)] AS raw
      FROM events
    )
    SELECT event_id, lower(trim(raw)) IN ('true','1','yes','y') AS fraud
    FROM messy
    """,
)
def f12_fraud_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: tolerant boolean parse (src/transform.py:457-460)."""
    e = _t(spark, sf_dir, "events")
    choices = F.array(*[F.lit(s) for s in ["true", "1", "yes", "y", "no", "0", "TRUE", "zzz"]])
    raw = F.element_at(choices, (F.col("event_id") % 8 + 1).cast("int"))
    return e.select("event_id", fraud_flag(raw).alias("fraud"))


@register(
    "f15_md5_hash",
    "SELECT doc_id, md5(text) AS text_md5 FROM documents",
)
def f15_md5_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: content hashing (file-level in the reference; row-level here —
    same primitive both engines compute identically)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5(F.col("text")).alias("text_md5"))


@register(
    "f16_case_norms",
    """
    SELECT doc_id,
           upper(source) AS source_upper,
           lower(lang) AS lang_lower,
           upper(substr(source, 1, 1)) || lower(substr(source, 2)) AS source_title
    FROM documents
    """,
)
def f16_case_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: case normalizations (initcap/upper/lower call sites in
    src/transform.py:246-321)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("source").alias("source_upper"),
        F.lower("lang").alias("lang_lower"),
        F.initcap("source").alias("source_title"),
    )


# ===========================================================================
# Incremental / merge (I2, I3, I4)
# ===========================================================================

@register(
    "i2_upsert_last_writer_wins",
    """
    WITH base AS (
      SELECT o_orderkey, o_totalprice, 1 AS batch FROM orders
    ), incoming AS (
      SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice, 2 AS batch
      FROM orders WHERE o_orderkey % 7 = 0
    ), unioned AS (
      SELECT * FROM base UNION ALL SELECT * FROM incoming
    )
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice, cast(batch AS BIGINT) AS batch
    FROM unioned
    QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY batch DESC) = 1
    """,
)
def i2_upsert_last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2/K1: ON-DUPLICATE-KEY-UPDATE as union + ranked dedup with an
    explicit version column (src/extract.py:328-357)."""
    o = _t(spark, sf_dir, "orders")
    base = o.select("o_orderkey", "o_totalprice", F.lit(1).alias("batch"))
    incoming = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", (F.col("o_totalprice") + 1000).alias("o_totalprice"), F.lit(2).alias("batch"))
    )
    merged = upsert_last_writer_wins(base, incoming, "o_orderkey", "batch")
    return merged.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.col("batch").cast("bigint").alias("batch"),
    )


@register(
    "i3_watermark_append",
    """
    SELECT o_orderkey, o_orderdate FROM orders
    WHERE o_orderdate > TIMESTAMP '1999-12-31 00:00:00'
    """,
)
def i3_watermark_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3: high-watermark incremental append — the predicate pushes into
    the scan (replaces the reference's LIMIT/OFFSET heuristic,
    src/load.py:124-205)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return incremental_append_watermark(
        o, "o_orderdate", F.lit("1999-12-31 00:00:00").cast("timestamp")
    )


@register(
    "i3_antijoin_append",
    """
    SELECT o_orderkey FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0)
    """,
)
def i3_antijoin_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 (exact form): anti-join append of rows absent from the target
    (target simulated as the even-key half)."""
    from .plans import incremental_append_antijoin

    o = _t(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 2 == 0)
    return incremental_append_antijoin(o, target, "o_orderkey").select("o_orderkey")


@register(
    "i4_reconcile_counts",
    """
    SELECT (SELECT count(*) FROM orders) AS source_count,
           (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0) AS target_count,
           (SELECT count(*) FROM orders) = (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0) AS synced
    """,
)
def i4_reconcile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4: row-count reconciliation as a single-row report
    (src/load.py:317-360)."""
    o = _t(spark, sf_dir, "orders")
    src = o.agg(F.count("*").alias("source_count"))
    dst = o.filter(F.col("o_orderkey") % 2 == 0).agg(F.count("*").alias("target_count"))
    return src.crossJoin(dst).select(
        "source_count",
        "target_count",
        (F.col("source_count") == F.col("target_count")).alias("synced"),
    )


# ===========================================================================
# Streaming-shaped (event-time windows over the events table)
# ===========================================================================

@register(
    "st1_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def st1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 extension: tumbling event-time window aggregation — same
    F.window operator Structured Streaming uses, run in batch."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ===========================================================================
# Remaining §2 surface: scans/sinks/pruning/metrics/slices
# ===========================================================================

@register(
    "s1_allstring_scan",
    """
    SELECT cast(o_orderkey AS VARCHAR) AS o_orderkey,
           cast(o_custkey AS VARCHAR) AS o_custkey,
           o_orderstatus, o_orderpriority
    FROM orders
    """,
)
def s1_allstring_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: the tier-1 all-string read contract — every business column a
    string, no inference (src/extract.py:430)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.col("o_custkey").cast("string").alias("o_custkey"),
        "o_orderstatus",
        "o_orderpriority",
    )


@register(
    "s2_partitioned_scan",
    """
    SELECT count(*) AS n_rows, round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem
    """,
)
def s2_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: the reference's chunked big-file read (src/extract.py:359-425)
    is Spark's native partitioned scan — `spark.sql.files.maxPartitionBytes`
    governs split size (set in session.py); the aggregate is
    split-count-invariant."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return l.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@register(
    "s3_multifile_glob",
    """
    WITH u AS (SELECT * FROM orders UNION ALL SELECT * FROM orders)
    SELECT count(*) AS n_rows, count(DISTINCT o_orderkey) AS n_keys FROM u
    """,
)
def s3_multifile_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: multi-file source — one read over a path list (the engine form
    of the reference's `{table}*.csv` glob, src/extract.py:527-538); the
    same file twice makes the multiplicity observable."""
    p = f"{sf_dir}/orders.parquet"
    o = spark.read.parquet(p, p)
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
    )


@register(
    "s5_jdbc_partitioned",
    """
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer
    """,
)
def s5_jdbc_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: the reference's paginated database extract
    (src/transform.py:150-168, LIMIT/OFFSET batches of 5000) as a real
    partitioned JDBC read. customer is staged into an embedded Derby
    database (whose driver ships inside Spark's own jars), then read
    back through the range-partitioned JDBC source: each of the 4 tasks
    pushes its own `WHERE c_custkey >= lo AND < hi` predicate to the
    database — the parallel restatement of LIMIT/OFFSET pagination.
    The oracle reads the same rows straight from parquet, proving the
    round-trip is lossless."""
    import tempfile

    from .sources.jdbc import (
        DERBY_DRIVER,
        derby_url,
        jdbc_reader_partitioned,
        jdbc_write,
    )

    props = {"driver": DERBY_DRIVER}
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    bounds = c.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    db = tempfile.mkdtemp(prefix="s5_derby_") + "/db"
    url = derby_url(db)
    jdbc_write(c, url, "CUSTOMER_STAGE", properties=props)
    back = jdbc_reader_partitioned(
        spark, url, "CUSTOMER_STAGE", "c_custkey",
        bounds[0], bounds[1] + 1, num_partitions=4, properties=props,
    ).load()
    return back.select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )


@register(
    "s4_file_identity",
    "SELECT 'orders.parquet' AS file_name, count(*) AS n_rows FROM orders",
)
def s4_file_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/I1: per-input-file row accounting via input_file_name() — the
    query-side face of the idempotent ingest log."""
    o = _t(spark, sf_dir, "orders")
    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return o.groupBy(fname.alias("file_name")).agg(F.count("*").alias("n_rows"))


@register(
    "k4_export_nafill",
    """
    SELECT c_custkey,
           coalesce(CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_mktsegment END, 'NA')
             AS segment_export
    FROM customer
    """,
)
def k4_export_nafill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: CSV-export NULL->'NA' convention (src/transform.py:493-515)."""
    c = _t(spark, sf_dir, "customer")
    raw = F.when(F.col("c_custkey") % 4 == 0, F.lit(None)).otherwise(F.col("c_mktsegment"))
    return c.select("c_custkey", raw.alias("segment_export")).na.fill(
        {"segment_export": "NA"}
    )


@register(
    "p4_prune_valid_columns",
    "SELECT l_linenumber, l_quantity, l_tax FROM lineitem",
)
def p4_prune_valid_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: declared ∩ existing minus excluded (src/load.py:161-171) — a
    declared column that does not exist ('l_bogus') and an excluded key
    both drop; the scan's ReadSchema narrows to the survivors."""
    from .operators.project import prune_valid_columns

    l = _t(spark, sf_dir, "lineitem")
    return prune_valid_columns(
        l,
        declared=["l_orderkey", "l_linenumber", "l_quantity", "l_tax", "l_bogus"],
        exclude=["l_orderkey"],
    )


@register(
    "f13_boolean_recast",
    """
    WITH messy AS (
      SELECT event_id,
             (['true','1','yes','y','no','0','TRUE','zzz'])[cast(event_id % 8 + 1 AS INT)] AS raw
      FROM events
    )
    SELECT event_id,
           cast(lower(trim(raw)) IN ('true','1','yes','y') AS BIGINT) AS flag_int,
           lower(trim(raw)) IN ('true','1','yes','y') AS flag_bool
    FROM messy
    """,
)
def f13_boolean_recast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: boolean <-> int recast at the tier boundary (src/load.py:222-232)
    — a no-op in Spark's type system, pinned here as a round-trip."""
    e = _t(spark, sf_dir, "events")
    choices = F.array(*[F.lit(s) for s in ["true", "1", "yes", "y", "no", "0", "TRUE", "zzz"]])
    raw = F.element_at(choices, (F.col("event_id") % 8 + 1).cast("int"))
    flag = fraud_flag(raw)
    return e.select(
        "event_id",
        flag.cast("bigint").alias("flag_int"),
        flag.cast("int").cast("boolean").alias("flag_bool"),
    )


@register(
    "o5_offset_slice",
    """
    SELECT o_orderkey, rn FROM (
      SELECT o_orderkey, cast(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn > 1000 AND rn <= 1100
    """,
)
def o5_offset_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5/I3: the reference's LIMIT/OFFSET positional slice pinned as a
    ranked-window filter (src/load.py:188-193). The engine's incremental
    path prefers watermarks/anti-joins; this query preserves the exact
    positional semantics for parity.

    The positional rank comes from the partition-offset composition
    (:func:`operators.sequence.with_global_sequence`) — no
    single-partition window; the slice predicate then prunes to the one
    or two range partitions that overlap [offset, offset+limit)."""
    o = _t(spark, sf_dir, "orders")
    return with_global_sequence(
        o.select("o_orderkey"), ["o_orderkey"], name="rn"
    ).filter((F.col("rn") > 1000) & (F.col("rn") <= 1100)).select("o_orderkey", "rn")


@register(
    "a5_metrics_fold",
    """
    SELECT 'customer' AS table_name, count(*) AS n_rows,
           count(DISTINCT c_custkey) AS n_keys,
           round(count(DISTINCT c_custkey) * 100.0 / count(*), 2) AS key_uniqueness_pct
    FROM customer
    UNION ALL
    SELECT 'orders', count(*), count(DISTINCT o_orderkey),
           round(count(DISTINCT o_orderkey) * 100.0 / count(*), 2)
    FROM orders
    """,
)
def a5_metrics_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/M2: DataQualityMetrics-style accounting as a metrics DataFrame
    (main.py:55-113)."""
    parts = []
    for name, key in [("customer", "c_custkey"), ("orders", "o_orderkey")]:
        df = _t(spark, sf_dir, name)
        parts.append(
            df.agg(
                F.count("*").alias("n_rows"),
                F.countDistinct(key).alias("n_keys"),
            ).select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_keys",
                F.round(F.col("n_keys") * 100.0 / F.col("n_rows"), 2).alias(
                    "key_uniqueness_pct"
                ),
            )
        )
    return parts[0].unionByName(parts[1])


# ===========================================================================
# Engine extensions: pivot / rollup / cube / session windows
# ===========================================================================

_EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]


@register(
    "x1_pivot",
    f"""
    SELECT user_id,
           {', '.join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)
def x1_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: pivot event types to per-user count columns."""
    e = _t(spark, sf_dir, "events")
    out = e.groupBy("user_id").pivot("event_type", _EVENT_TYPES).agg(F.count(F.lit(1)))
    return out.na.fill(0).select(
        "user_id", *[F.col(t).cast("bigint").alias(t) for t in _EVENT_TYPES]
    )


@register(
    "x2_rollup",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def x2_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: hierarchical subtotals (ROLLUP)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "x3_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def x3_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: full cross-dimensional subtotals (CUBE)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "st2_session_window",
    """
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ),
    m AS (
      SELECT user_id, ts,
             CASE WHEN prev IS NULL
                       OR date_diff('microsecond', prev, ts) >= 300000000
                  THEN 1 ELSE 0 END AS brk
      FROM o
    ),
    s AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 5 MINUTE AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def st2_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension (§2.10): gap-based session windows — the same
    F.session_window operator Structured Streaming uses, batch-run.
    Oracle reproduces the merge rule (new session at gap >= 5 min) via
    lag + cumulative break-count sessionization."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ===========================================================================
# LLM-training-data operators: text analysis / dedup / similarity search
# ===========================================================================

_DUCK_TOKS = "string_split_regex(trim(text), '\\s+')"
_EN = "['the','a','of','and','to','in','is','it']"
_DE = "['der','die','das','und','ist','ein','nicht']"
_ES = "['el','la','los','y','que','un','por']"

# The tx2 composite-quality expression, re-stated once for the curation
# selection oracles below (DuckDB dialect; byte-identical to tx2's).
_DUCK_QUALITY = f"""round(0.4 * least(length(text) / 500.0, 1.0)
           + 0.3 * (1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text))
           + 0.3 * least(len(list_filter({_DUCK_TOKS}, x -> list_contains({_EN}, x))) * 1.0
                         / len({_DUCK_TOKS}) * 5.0, 1.0), 10)"""


@register(
    "tx1_token_stats",
    f"""
    SELECT doc_id,
           cast(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
           cast(length(text) AS BIGINT) AS n_chars_actual,
           round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text), 4)
             AS punct_ratio
    FROM documents
    """,
)
def tx1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token/char counting + punctuation ratio — one
    projection, no shuffle, pipelined with the scan."""
    from .llm import token_count, punct_ratio

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.round(punct_ratio(F.col("text")), 4).alias("punct_ratio"),
    )


@register(
    "tx2_quality_score",
    f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents
    )
    SELECT doc_id,
           round(0.4 * least(length(text) / 500.0, 1.0)
               + 0.3 * (1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text))
               + 0.3 * least(len(list_filter(toks, x -> list_contains({_EN}, x))) * 1.0
                             / len(toks) * 5.0, 1.0), 10) AS quality
    FROM t
    """,
)
def tx2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: composite quality score (length saturation, low
    punctuation noise, stopword naturalness)."""
    from .llm import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


@register(
    "tx3_lang_id",
    f"""
    WITH t AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> list_contains({_EN}, x))) AS en,
             len(list_filter(toks, x -> list_contains({_DE}, x))) AS de,
             len(list_filter(toks, x -> list_contains({_ES}, x))) AS es
      FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN en >= de AND en >= es THEN 'en'
                WHEN de >= es THEN 'de'
                ELSE 'es' END AS pred_lang
    FROM s
    """,
)
def tx3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: stopword-overlap language-ID heuristic with
    deterministic tie-break."""
    from .llm import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("pred_lang"),
    )


@register(
    "tx16_langid_confusion",
    f"""
    WITH t AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> list_contains({_EN}, x))) AS en,
             len(list_filter(toks, x -> list_contains({_DE}, x))) AS de,
             len(list_filter(toks, x -> list_contains({_ES}, x))) AS es
      FROM t
    ),
    p AS (
      SELECT lang AS labeled_lang,
             CASE WHEN en >= de AND en >= es THEN 'en'
                  WHEN de >= es THEN 'de'
                  ELSE 'es' END AS pred_lang
      FROM s
    ),
    m AS (SELECT labeled_lang, pred_lang, count(*) AS n_docs
          FROM p GROUP BY 1, 2)
    SELECT labeled_lang, pred_lang, n_docs,
           round(n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY labeled_lang), 4)
             AS frac_of_label
    FROM m
    """,
)
def tx16_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-metadata consistency check — the confusion matrix
    between the SOURCE-ASSIGNED language tag and the text-derived
    classifier prediction (tx3's heuristic). CCNet-style curation runs
    exactly this QA step: a source whose metadata disagrees with the
    classifier on most documents has broken tagging and its lang-based
    routing (corpus mix x27, per-lang budgets tx12) is garbage-in.
    Per (labeled, predicted) cell: document count and the row-relative
    fraction. One projection + one tiny (lang x lang) agg; the fraction
    window runs over the ~25-row matrix, never the corpus."""
    from .llm import lang_id

    d = _t(spark, sf_dir, "documents")
    m = (
        d.select(
            F.col("lang").alias("labeled_lang"),
            lang_id(F.col("text")).alias("pred_lang"),
        )
        .groupBy("labeled_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )
    w = Window.partitionBy("labeled_lang")
    return m.select(
        "labeled_lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 4).alias(
            "frac_of_label"
        ),
    )


@register(
    "tx4_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def tx4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace/case-insensitive content fingerprint."""
    from .llm import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "tx6_pii_redact",
    """
    WITH withpii AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or 9876543210 ssn 123-45-6789' AS t
      FROM documents
    )
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b\\d{10}\\b', '<PHONE>', 'g'),
                 '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g')) AS redacted_md5
    FROM withpii
    """,
)
def tx6_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: PII redaction pass (emails/phones/SSN-shaped ids ->
    typed placeholders). PII is planted deterministically so the scrub is
    observable; output is the md5 of the redacted text (keeps the compare
    payload small)."""
    from .llm.text import redact_pii

    d = _t(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 9876543210 ssn 123-45-6789"),
    )
    return d.select("doc_id", F.md5(redact_pii(t)).alias("redacted_md5"))


@register(
    "tx7_repetition_ratio",
    f"""
    WITH sh AS (
      SELECT doc_id, {{SH}} AS s FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(s) > 0
                THEN round(1.0 - len(list_distinct(s)) * 1.0 / len(s), 10)
                ELSE 0.0 END AS rep_ratio
    FROM sh
    """,
)
def tx7_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: duplicated-n-gram fraction (Gopher-style repetition
    filter signal) — flags degenerate/looping text before training."""
    from .llm.text import repetition_ratio

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", repetition_ratio(F.col("text")).alias("rep_ratio"))


def _finalize_tx7():
    from .llm.dedup import shingles_sql

    REGISTRY["tx7_repetition_ratio"].sql = REGISTRY["tx7_repetition_ratio"].sql.replace(
        "{SH}", shingles_sql("text")
    )


_finalize_tx7()


@register(
    "dd1_exact_dedup",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dd1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (exact): hash-groupBy keep-min-id. One shuffle on the
    16-byte hash — document size never crosses the exchange."""
    from .llm import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"), "text", "doc_id")


def _minhash_ctes(
    n_hashes: int = 16,
    bands: int = 4,
    rows: int = 4,
    max_bucket_size: int | str | None = None,
    cap_floor: int = 100,
) -> str:
    """The MinHash+LSH candidate-pair pipeline as a reusable CTE body
    (ends with ``mh_pairs(a, b)``) — shared by dd2 and the curation
    composite so their oracles stay in lock-step.
    ``max_bucket_size="auto"`` emits the derived-cap CTE chain
    (llm.caps.tukey_cap_sql_ctes) instead of a literal QUALIFY."""
    from .llm.caps import tukey_cap_sql_ctes
    from .llm.dedup import MINHASH_AB, MINHASH_P, _h32_sql, shingles_sql

    sig_exprs = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS s{j}"
        for j, (a, b) in enumerate(MINHASH_AB[:n_hashes])
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS bh FROM sig".format(
            b=b,
            concat=" || '|' || ".join(
                f"cast(s{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    if max_bucket_size == "auto":
        cap = tukey_cap_sql_ctes("bands", "band, bh", floor=cap_floor).lstrip()
    elif max_bucket_size is not None:
        cap = (
            f"capped AS (SELECT doc_id, band, bh FROM bands "
            f"QUALIFY count(*) OVER (PARTITION BY band, bh) <= {max_bucket_size})"
        )
    else:
        cap = "capped AS (SELECT * FROM bands)"
    return f"""
    sh AS (
      SELECT doc_id, unnest(list_distinct({shingles_sql('text')})) AS s FROM documents
    ),
    hv AS (SELECT doc_id, {_h32_sql('md5(s)')} AS h FROM sh),
    sig AS (SELECT doc_id, {sig_exprs} FROM hv GROUP BY doc_id),
    bands AS ({band_selects}),
    {cap},
    mh_pairs AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM capped a JOIN capped b ON a.band = b.band AND a.bh = b.bh
                                  AND a.doc_id < b.doc_id
    )"""


def _minhash_sql(
    n_hashes: int = 16,
    bands: int = 4,
    rows: int = 4,
    max_bucket_size: int | str | None = None,
) -> str:
    return f"""
    WITH {_minhash_ctes(n_hashes, bands, rows, max_bucket_size)}
    SELECT a, b FROM mh_pairs
    """


@register("dd2_minhash_lsh", _minhash_sql(max_bucket_size="auto"))
def dd2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (MinHash+LSH): shingle → 16 md5-min-hashes → 4 bands × 4 rows
    → bucket self-join, degenerate buckets dropped before the join. The
    scalable near-dup path: no all-pairs compare, shuffle keyed on
    (band, bucket), pair fan-out bounded by the bucket cap — DERIVED
    from the bucket-size distribution (Tukey fence q3+3*IQR, floor 100;
    llm/caps.py) rather than a literal, so the same query text stays
    safe at any corpus size. The oracle reproduces the derived cap with
    integer-exact discrete quantiles."""
    from .llm.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        max_bucket_size="auto", materialize=True,
    )


def _dd14_sql() -> str:
    return f"""
    WITH {_minhash_ctes(max_bucket_size="auto")},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.a, p.b, count(*) AS i
      FROM mh_pairs p
      JOIN sh x ON x.doc_id = p.a
      JOIN sh y ON y.doc_id = p.b AND y.s = x.s
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT count(*) AS n_verified
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.a
      JOIN sizes sb ON sb.doc_id = inter.b
      WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.3
    ),
    cand AS (SELECT count(*) AS n_candidates FROM mh_pairs)
    SELECT cast(n_candidates AS BIGINT) AS n_candidates,
           cast(n_verified AS BIGINT) AS n_verified,
           CASE WHEN n_candidates > 0
                THEN round(n_verified * 1.0 / n_candidates, 4) END AS precision_at_t
    FROM cand, verified
    """


@register("dd14_lsh_precision", None)  # finalized below (needs minhash CTEs)
def dd14_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH quality contract from the PRECISION side — ann6's twin:
    of the candidate pairs MinHash banding surfaces (dd2), what fraction
    survives exact Jaccard verification at t=0.3? Candidate-then-verify
    is the standard two-stage near-dup pipeline (band collisions prune
    the pair space, exact set similarity confirms); this query emits
    (n_candidates, n_verified, precision) as one row so the pruning
    quality is hash-checked at every scale, not assumed. Low precision
    means wasted verification work (bands too coarse); the recall side
    is ann6's and the band-layout solver (lsh_params_for) trades the
    two explicitly."""
    from .llm.dedup import _spread, minhash_lsh_pairs, shingles

    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size="auto", materialize=True
    ).localCheckpoint(eager=True)
    sh = _spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sha = sh.select(F.col("doc_id").alias("a"), "s")
    shb = sh.select(F.col("doc_id").alias("b"), "s")
    inter = (
        cand.join(sha, "a")
        .join(shb, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    verified = (
        inter.join(sa, "a").join(sb, "b").filter(jac >= 0.3)
        .agg(F.count("*").cast("bigint").alias("n_verified"))
    )
    ncand = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    return ncand.crossJoin(verified).select(
        "n_candidates",
        "n_verified",
        F.when(
            F.col("n_candidates") > 0,
            F.round(F.col("n_verified") / F.col("n_candidates"), 4),
        ).alias("precision_at_t"),
    )


REGISTRY["dd14_lsh_precision"].sql = _dd14_sql()


def _ngram_jaccard_sql(max_doc_freq: int | str | None = None) -> str:
    from .llm.caps import tukey_cap_sql_ctes
    from .llm.dedup import shingles_sql

    if max_doc_freq == "auto":
        cap = tukey_cap_sql_ctes("sh", "s", floor=100).lstrip() + ","
    elif max_doc_freq is not None:
        cap = (
            f"capped AS (SELECT doc_id, s FROM sh "
            f"QUALIFY count(*) OVER (PARTITION BY s) <= {max_doc_freq}),"
        )
    else:
        cap = "capped AS (SELECT * FROM sh),"
    return f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({shingles_sql('text')})) AS s FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    {cap}
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.3
    """


@register("dd3_ngram_jaccard", _ngram_jaccard_sql(max_doc_freq="auto"))
def dd3_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (n-gram Jaccard): exact set similarity over the
    inverted-index join — only pairs sharing a shingle are scored, and
    ultra-common shingles are excluded from the join (posting-list cap:
    bounds per-shingle pair fan-out; capped Jaccard is a lower bound, so
    boilerplate-only overlaps drop out). The cap is DERIVED from the
    doc-frequency distribution (Tukey fence, floor 100; llm/caps.py):
    the sf0.1 fence is already 5x the sf0.01 one, so a literal tuned at
    one scale mis-caps at the next — the derived cap tracks the corpus."""
    from .llm.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", 0.3,
        max_doc_freq="auto", materialize=True,
    )


def _ngram_containment_sql(min_containment: float, max_doc_freq: int) -> str:
    from .llm.dedup import shingles_sql

    return f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({shingles_sql('text')})) AS s FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    capped AS (SELECT doc_id, s FROM sh
               QUALIFY count(*) OVER (PARTITION BY s) <= {max_doc_freq}),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(i * 1.0 / sa.n, 4) AS c_ab, round(i * 1.0 / sb.n, 4) AS c_ba
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE greatest(i * 1.0 / sa.n, i * 1.0 / sb.n) >= {min_containment}
    """


@register("dd12_ngram_containment", _ngram_containment_sql(0.3, 100))
def dd12_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (asymmetric containment): C(A→B) = |S_A ∩ S_B| / |S_A| —
    catches the quote/superset case symmetric Jaccard (dd3) misses: a
    short doc fully embedded in a long one has near-zero Jaccard but
    containment 1. One row per pair with both directions; the same
    inverted-index join and df-100 posting-list cap as dd3."""
    from .llm.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", 0.3,
        max_doc_freq=100, materialize=True,
    )


@register("dd4_simhash", None)  # placeholder replaced below
def dd4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (SimHash): 16-bit majority-vote signature — near-dups land on
    equal/adjacent signatures; grouping on the signature is one shuffle."""
    from .llm.dedup import simhash16

    return simhash16(_t(spark, sf_dir, "documents"), "text", "doc_id")


def _finalize_dd4():
    from .llm.dedup import simhash16_sql

    REGISTRY["dd4_simhash"].sql = simhash16_sql("documents", "text", "doc_id")


_finalize_dd4()

_DUCK_COMP = """
  SELECT vec_id, generate_subscripts(embedding, 1) AS i, cast(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
"""


def _hyperplane_lsh_sql(
    min_sim: float,
    n_planes: int = 16,
    bands: int = 4,
    max_bucket_size: int | str | None = None,
) -> str:
    """DuckDB twin of cosine_pairs' default bucketed path: identical
    md5-derived hyperplane coefficients -> identical sign-bit band
    buckets -> identical candidate set (including the degenerate-bucket
    cap when ``max_bucket_size`` is set — "auto" emits the derived-cap
    CTE chain with cosine_pairs' floor/ceiling); exact cosine on
    candidates."""
    from .llm.caps import tukey_cap_sql_ctes
    from .llm.dedup import _hexint_sql

    rows_per_band = n_planes // bands
    md5_exprs = ", ".join(
        f"md5('rp{p}|' || cast(i AS VARCHAR)) AS m{p}" for p in range(n_planes)
    )
    coef_exprs = ", ".join(
        f"({_hexint_sql(f'm{p}', 8)} / 2147483648.0 - 1.0) AS r{p}"
        for p in range(n_planes)
    )
    proj_exprs = ", ".join(f"sum(v * r{p}) AS pr{p}" for p in range(n_planes))
    bit_exprs = ", ".join(
        f"CASE WHEN pr{p} >= 0 THEN 1 ELSE 0 END AS b{p}" for p in range(n_planes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT vec_id, {b} AS band, md5({concat}) AS bh FROM bits".format(
            b=b,
            concat=" || '|' || ".join(
                f"cast(b{b * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    idx AS (SELECT DISTINCT i FROM comp),
    md5s AS (SELECT i, {md5_exprs} FROM idx),
    coefs AS (SELECT i, {coef_exprs} FROM md5s),
    coef AS (SELECT comp.vec_id, comp.v, {', '.join(f'coefs.r{p}' for p in range(n_planes))}
             FROM comp JOIN coefs ON comp.i = coefs.i),
    proj AS (SELECT vec_id, {proj_exprs} FROM coef GROUP BY vec_id),
    bits AS (SELECT vec_id, {bit_exprs} FROM proj),
    bands AS ({band_selects}),
    {
        tukey_cap_sql_ctes("bands", "band, bh", floor=200, hard_max=5000).lstrip()
        if max_bucket_size == "auto"
        else (
            "kept AS (SELECT band, bh FROM bands GROUP BY 1, 2"
            + (
                f" HAVING count(*) <= {max_bucket_size}"
                if max_bucket_size is not None
                else ""
            )
            + "), capped AS (SELECT bands.* FROM bands "
            "JOIN kept USING (band, bh))"
        )
    },
    cand AS (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM capped x
      JOIN capped y ON x.band = y.band AND x.bh = y.bh
                    AND x.vec_id < y.vec_id
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    dots AS (
      SELECT c.a, c.b, sum(ca.v * cb.v) AS dot
      FROM cand c
      JOIN comp ca ON ca.vec_id = c.a
      JOIN comp cb ON cb.vec_id = c.b AND cb.i = ca.i
      GROUP BY 1, 2
    )
    SELECT dots.a, dots.b, round(dot / (na.norm * nb.norm), 4) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = dots.a
    JOIN norms nb ON nb.vec_id = dots.b
    WHERE na.norm > 0 AND nb.norm > 0
      AND dot / (na.norm * nb.norm) >= {min_sim}
    """


@register("dd5_embedding_neardup", _hyperplane_lsh_sql(0.25, max_bucket_size="auto"))
def dd5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (embedding cosine): near-dup pairs above a cosine threshold
    via the default BUCKETED path — hyperplane-LSH candidates, exact
    cosine on survivors, zero driver-side state (the oracle reproduces
    the same md5-derived buckets AND the bucket-size cap, so the
    candidate set is checked too).

    Threshold-recall contract: with 4 bands of 4 sign bits a pair at
    cosine c collides in at least one band with probability
    1 - (1 - (1 - arccos(c)/pi)^4)^4 — >99.9% at c=0.9, ~39% at this
    query's deliberately-low c=0.25. Low thresholds are inherently
    hostile to hyperplane LSH: use ``preset="high_recall"`` (derives the
    band layout from ``min_sim`` via lsh_params_for — 0.25 -> 11 bands
    of 3 bits, ~91% recall) or ``allow_all_pairs`` for exact recall on
    bounded inputs. ``max_bucket_size="auto"`` derives the
    degenerate-bucket cap from the bucket-size distribution (Tukey
    fence, floor 200, hard ceiling 5000 = the gram kernel's task-memory
    bound; llm/caps.py) — the OOM guard a 100 TB run needs, now
    scale-adaptive; the oracle reproduces the identical derived cap so
    the pruning is verified, not just claimed."""
    from .llm import cosine_pairs

    return cosine_pairs(
        _t(spark, sf_dir, "embeddings"), min_sim=0.25,
        max_bucket_size="auto", materialize=True,
    )


@register(
    "ann1_bruteforce_topk",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    dots AS (
      SELECT c.vec_id, sum(c.v * q.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN q ON c.i = q.i GROUP BY c.vec_id
    ),
    qn AS (SELECT sqrt(sum(v*v)) AS qnorm FROM comp WHERE vec_id = 0)
    SELECT vec_id, round(dot / (norm * qnorm), 4) AS cosine
    FROM dots, qn
    WHERE vec_id <> 0
    ORDER BY round(dot / (norm * qnorm), 4) DESC, vec_id
    LIMIT 10
    """,
)
def ann1_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search (exact): brute-force cosine top-10 for a stored
    query vector."""
    from .llm import brute_force_topk

    return brute_force_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10)


@register(
    "ann2_ivf_topk",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    cent AS (SELECT vec_id AS c, i, v AS cv FROM comp WHERE vec_id < 8),
    cross_dots AS (
      SELECT comp.vec_id, cent.c, sum(comp.v * cent.cv) AS dot
      FROM comp JOIN cent ON comp.i = cent.i GROUP BY 1, 2
    ),
    scored AS (
      SELECT cross_dots.vec_id, c, dot / (nv.norm * nc.norm) AS cos
      FROM cross_dots
      JOIN norms nv ON nv.vec_id = cross_dots.vec_id
      JOIN norms nc ON nc.vec_id = c
    ),
    assign AS (
      SELECT vec_id, c AS centroid FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) = 1
    ),
    qc AS (SELECT centroid FROM assign WHERE vec_id = 0),
    cluster AS (
      SELECT assign.vec_id FROM assign, qc
      WHERE assign.centroid = qc.centroid AND assign.vec_id <> 0
    ),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    dots AS (
      SELECT c.vec_id, sum(c.v * q.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN q ON c.i = q.i
      WHERE c.vec_id IN (SELECT vec_id FROM cluster)
      GROUP BY c.vec_id
    ),
    qn AS (SELECT sqrt(sum(v*v)) AS qnorm FROM comp WHERE vec_id = 0)
    SELECT vec_id, round(dot / (norm * qnorm), 4) AS cosine
    FROM dots, qn
    ORDER BY round(dot / (norm * qnorm), 4) DESC, vec_id
    LIMIT 5
    """,
)
def ann2_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search (IVF): nearest-centroid assignment, then exact
    search inside the query's cell only."""
    from .llm.similarity import ivf_topk

    return ivf_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=5, n_centroids=8)


@register(
    "ann6_recall_at_k",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
    alldots AS (
      SELECT c.vec_id, sum(c.v * q.qv) AS dot
      FROM comp c JOIN q ON c.i = q.i GROUP BY c.vec_id
    ),
    scoredall AS (
      SELECT d.vec_id, d.dot / (n.norm * qn.qnorm) AS cos
      FROM alldots d JOIN norms n ON n.vec_id = d.vec_id, qn
      WHERE d.vec_id <> 0
    ),
    bf AS (SELECT vec_id FROM scoredall
           ORDER BY round(cos, 4) DESC, vec_id LIMIT 10),
    cent AS (SELECT vec_id AS c, i, v AS cv FROM comp WHERE vec_id < 8),
    cross_dots AS (
      SELECT comp.vec_id, cent.c, sum(comp.v * cent.cv) AS dot
      FROM comp JOIN cent ON comp.i = cent.i GROUP BY 1, 2
    ),
    scored AS (
      SELECT cross_dots.vec_id, c, dot / (nv.norm * nc.norm) AS cos
      FROM cross_dots
      JOIN norms nv ON nv.vec_id = cross_dots.vec_id
      JOIN norms nc ON nc.vec_id = c
    ),
    assign AS (
      SELECT vec_id, c AS centroid FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) = 1
    ),
    qc AS (SELECT centroid FROM assign WHERE vec_id = 0),
    cluster AS (
      SELECT assign.vec_id FROM assign, qc
      WHERE assign.centroid = qc.centroid AND assign.vec_id <> 0
    ),
    ivf AS (SELECT vec_id FROM scoredall
            WHERE vec_id IN (SELECT vec_id FROM cluster)
            ORDER BY round(cos, 4) DESC, vec_id LIMIT 10),
    inter AS (SELECT vec_id FROM bf INTERSECT SELECT vec_id FROM ivf)
    SELECT cast(10 AS BIGINT) AS k, count(*) AS n_hits,
           round(count(*) / 10.0, 4) AS recall_at_k
    FROM inter
    """,
)
def ann6_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN quality CONTRACT as a query: recall@10 of the IVF search
    (ann2's single-probe path, nprobe=1 reads ~1/n_cells of the corpus)
    against the exact brute-force top-10 (ann1) for the same stored
    query vector. IVF's speed comes from searching one coarse cell —
    this measures exactly what that pruning costs in recall, the same
    way CORRECTNESS measures value parity: the oracle recomputes both
    top-10 sets and the identical intersection. Deterministic on both
    engines (4-dp rounded cosine, ties by vec_id).
    tests/test_similarity.py pins recall_at_k >= 0.5 at gate scale."""
    from .llm.similarity import brute_force_topk, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    bf = brute_force_topk(emb, query_id=0, k=10)
    ivf = ivf_topk(emb, query_id=0, k=10, n_centroids=8)
    inter = bf.select("vec_id").intersect(ivf.select("vec_id"))
    return inter.agg(F.count("*").cast("bigint").alias("n_hits")).select(
        F.lit(10).cast("bigint").alias("k"),
        "n_hits",
        F.round(F.col("n_hits") / 10.0, 4).alias("recall_at_k"),
    )


def _pq_iter_sql(prev: str, it: int, comp: str, sfx: str) -> str:
    """One Lloyd iteration scoped to a PQ subspace: same math as
    _kmeans_iter_sql but parameterized on the component CTE and a
    name suffix so two subspaces can train in one WITH chain."""
    return f"""
    assign{it}{sfx} AS (
      SELECT {comp}.vec_id, {prev}.cell,
             row_number() OVER (
               PARTITION BY {comp}.vec_id
               ORDER BY sum(({comp}.v - {prev}.v) * ({comp}.v - {prev}.v)), {prev}.cell
             ) AS rn
      FROM {comp} JOIN {prev} ON {comp}.i = {prev}.i
      GROUP BY {comp}.vec_id, {prev}.cell
    ),
    cent{it}{sfx} AS (
      SELECT a.cell, {comp}.i, avg({comp}.v) AS v
      FROM assign{it}{sfx} a JOIN {comp} ON {comp}.vec_id = a.vec_id
      WHERE a.rn = 1
      GROUP BY 1, 2
    )"""


def _ann9_sql() -> str:
    # split conditions are 1-based (generate_subscripts): i <= d2 with
    # d2 = floor(max_i/2) matches Spark's 0-based i < floor((max_i+1)/2)
    sub = []
    for sfx, cond in (("a", "i <= d2"), ("b", "i > d2")):
        sub.append(f"""
    comp{sfx} AS (SELECT comp.vec_id, comp.i, comp.v FROM comp, dhalf WHERE {cond}),
    cent0{sfx} AS (SELECT vec_id AS cell, i, v FROM comp{sfx} WHERE vec_id < 16),
    {_pq_iter_sql(f'cent0{sfx}', 1, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent1{sfx}', 2, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent2{sfx}', 3, f'comp{sfx}', sfx)},
    code{sfx} AS (SELECT vec_id, cell FROM assign3{sfx} WHERE rn = 1),
    q{sfx} AS (SELECT i, v AS qv FROM comp{sfx} WHERE vec_id = 0),
    tab{sfx} AS (
      SELECT c.cell, sum(c.v * q{sfx}.qv) AS t{sfx}
      FROM cent2{sfx} c JOIN q{sfx} ON c.i = q{sfx}.i
      GROUP BY 1
    )""")
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    dhalf AS (SELECT cast(floor(max(i) / 2.0) AS INT) AS d2 FROM comp),
    {','.join(sub)},
    adot AS (
      SELECT codea.vec_id, taba.ta + tabb.tb AS adot
      FROM codea
      JOIN taba ON taba.cell = codea.cell
      JOIN codeb ON codeb.vec_id = codea.vec_id
      JOIN tabb ON tabb.cell = codeb.cell
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
    shortlist AS (
      SELECT adot.vec_id,
             round(adot / (n.norm * qn.qnorm), 4) AS ac
      FROM adot JOIN norms n ON n.vec_id = adot.vec_id, qn
      WHERE adot.vec_id <> 0
      ORDER BY ac DESC, adot.vec_id
      LIMIT 100
    ),
    qfull AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    exact AS (
      SELECT c.vec_id, sum(c.v * qfull.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qfull ON c.i = qfull.i
      WHERE c.vec_id IN (SELECT vec_id FROM shortlist)
      GROUP BY 1
    )
    SELECT exact.vec_id, round(dot / (norm * qn.qnorm), 4) AS cosine
    FROM exact, qn
    ORDER BY round(dot / (norm * qn.qnorm), 4) DESC, exact.vec_id
    LIMIT 10
    """


@register("ann9_pq_topk", None)  # finalized below (composed CTE chain)
def ann9_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011 — the IVF-PQ code
    path) in its production shape: vectors compress to a 2-code tuple
    (one k-means code per half-space, 16 codes each), the query scans
    CODES via a broadcast lookup table of query-to-centroid dots
    (approx_dot = t0[code0] + t1[code1] — no vector arithmetic per
    candidate), the top-100 shortlist is then rescored with EXACT
    cosine and the true top-10 emitted. The memory/IO win at 100 TB:
    the code scan touches 1 byte/subspace per vector instead of 256
    float bytes; exact work is confined to the shortlist. Quantization
    error only moves the shortlist boundary (recall ~0.8 here vs ~0.2
    for raw PQ ranking on these near-random vectors — PQ's worst
    case). Oracle replays both subspace trainings, code assignment,
    lookup tables, the 4-dp-rounded shortlist cut, and the exact
    rerank."""
    from .llm.similarity import pq_rerank_topk

    return pq_rerank_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=10, shortlist=100,
        n_codes=16,
    )


REGISTRY["ann9_pq_topk"].sql = _ann9_sql()


def _ann10_sql() -> str:
    # ann9's PQ chain (full-corpus codes + lookup tables) composed with
    # ann2's coarse-cell chain; the shortlist is cut INSIDE the query's
    # cell. Sub-CTE names are disjoint by construction (PQ uses
    # {comp,cent,assign}N{a,b}; IVF uses centc/cross_dots/scoredc/...).
    sub = []
    for sfx, cond in (("a", "i <= d2"), ("b", "i > d2")):
        sub.append(f"""
    comp{sfx} AS (SELECT comp.vec_id, comp.i, comp.v FROM comp, dhalf WHERE {cond}),
    cent0{sfx} AS (SELECT vec_id AS cell, i, v FROM comp{sfx} WHERE vec_id < 16),
    {_pq_iter_sql(f'cent0{sfx}', 1, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent1{sfx}', 2, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent2{sfx}', 3, f'comp{sfx}', sfx)},
    code{sfx} AS (SELECT vec_id, cell FROM assign3{sfx} WHERE rn = 1),
    q{sfx} AS (SELECT i, v AS qv FROM comp{sfx} WHERE vec_id = 0),
    tab{sfx} AS (
      SELECT c.cell, sum(c.v * q{sfx}.qv) AS t{sfx}
      FROM cent2{sfx} c JOIN q{sfx} ON c.i = q{sfx}.i
      GROUP BY 1
    )""")
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    dhalf AS (SELECT cast(floor(max(i) / 2.0) AS INT) AS d2 FROM comp),
    {','.join(sub)},
    adot AS (
      SELECT codea.vec_id, taba.ta + tabb.tb AS adot
      FROM codea
      JOIN taba ON taba.cell = codea.cell
      JOIN codeb ON codeb.vec_id = codea.vec_id
      JOIN tabb ON tabb.cell = codeb.cell
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
    centc AS (SELECT vec_id AS c, i, v AS cv FROM comp WHERE vec_id < 8),
    cross_dots AS (
      SELECT comp.vec_id, centc.c, sum(comp.v * centc.cv) AS dot
      FROM comp JOIN centc ON comp.i = centc.i GROUP BY 1, 2
    ),
    scoredc AS (
      SELECT cross_dots.vec_id, c, dot / (nv.norm * nc.norm) AS cos
      FROM cross_dots
      JOIN norms nv ON nv.vec_id = cross_dots.vec_id
      JOIN norms nc ON nc.vec_id = c
    ),
    assignc AS (
      SELECT vec_id, c AS centroid FROM scoredc
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) = 1
    ),
    qc AS (SELECT centroid FROM assignc WHERE vec_id = 0),
    cluster AS (
      SELECT assignc.vec_id FROM assignc, qc
      WHERE assignc.centroid = qc.centroid AND assignc.vec_id <> 0
    ),
    shortlist AS (
      SELECT adot.vec_id,
             round(adot / (n.norm * qn.qnorm), 4) AS ac
      FROM adot JOIN norms n ON n.vec_id = adot.vec_id, qn
      WHERE adot.vec_id <> 0
        AND adot.vec_id IN (SELECT vec_id FROM cluster)
      ORDER BY ac DESC, adot.vec_id
      LIMIT 50
    ),
    qfull AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    exact AS (
      SELECT c.vec_id, sum(c.v * qfull.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qfull ON c.i = qfull.i
      WHERE c.vec_id IN (SELECT vec_id FROM shortlist)
      GROUP BY 1
    )
    SELECT exact.vec_id, round(dot / (norm * qn.qnorm), 4) AS cosine
    FROM exact, qn
    ORDER BY round(dot / (norm * qn.qnorm), 4) DESC, exact.vec_id
    LIMIT 10
    """


@register("ann10_ivfpq_topk", None)  # finalized below (composed CTE chain)
def ann10_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF-PQ ANN (Jégou et al. 2011 — the FAISS IVFPQ layout,
    composing ann2's coarse quantizer with ann9's product quantizer):
    the query probes its coarse cell, PQ asymmetric distance ranks ONLY
    that cell's members from compressed codes, the in-cell top-50
    shortlist is rescored with exact cosine, and the true top-10 is
    emitted. Per-query IO at 100 TB: one broadcast centroid table, the
    probed cell's CODE rows (bytes/vector), 50 full vectors. The PQ
    codes are trained on the full corpus — cell membership only filters
    the code scan, exactly how a persisted IVFPQ index serves every
    query from one code table. The oracle replays coarse assignment,
    both subspace trainings, the lookup tables, the 4-dp-rounded
    in-cell shortlist cut, and the exact rerank."""
    from .llm.similarity import ivfpq_topk

    return ivfpq_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=10, shortlist=50,
        n_codes=16, n_centroids=8,
    )


REGISTRY["ann10_ivfpq_topk"].sql = _ann10_sql()


def _ivfpq_index_dir(sf_dir: str) -> str:
    """Cache location for the persisted IVF-PQ index over this
    sf_dir's embeddings — keyed by resolved path + file stats so a
    regenerated dataset invalidates the cache, and parameter-versioned
    so an index-layout change can never serve stale results."""
    import hashlib
    import os
    import tempfile

    p = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(p)
    key = hashlib.md5(
        f"{os.path.realpath(p)}|{st.st_mtime_ns}|{st.st_size}"
        f"|coarse4x2_pq16x2_v1".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_ivfpq_{key}")


def _ann11_sql() -> str:
    # ann9's PQ chains + ann4's coarse-kmeans chain (the EXACT trainers
    # build_ivfpq_index persists) + the stored-index serve path: L2
    # probe of the trained centroids, member semi-join, in-member PQ
    # shortlist, exact rerank. Because the index build is fully
    # deterministic, replaying it from scratch here equals reading the
    # persisted tables on the Spark side.
    sub = []
    for sfx, cond in (("a", "i <= d2"), ("b", "i > d2")):
        sub.append(f"""
    comp{sfx} AS (SELECT comp.vec_id, comp.i, comp.v FROM comp, dhalf WHERE {cond}),
    cent0{sfx} AS (SELECT vec_id AS cell, i, v FROM comp{sfx} WHERE vec_id < 16),
    {_pq_iter_sql(f'cent0{sfx}', 1, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent1{sfx}', 2, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent2{sfx}', 3, f'comp{sfx}', sfx)},
    code{sfx} AS (SELECT vec_id, cell FROM assign3{sfx} WHERE rn = 1),
    q{sfx} AS (SELECT i, v AS qv FROM comp{sfx} WHERE vec_id = 0),
    tab{sfx} AS (
      SELECT c.cell, sum(c.v * q{sfx}.qv) AS t{sfx}
      FROM cent2{sfx} c JOIN q{sfx} ON c.i = q{sfx}.i
      GROUP BY 1
    )""")
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    dhalf AS (SELECT cast(floor(max(i) / 2.0) AS INT) AS d2 FROM comp),
    {','.join(sub)},
    adot AS (
      SELECT codea.vec_id, taba.ta + tabb.tb AS adot
      FROM codea
      JOIN taba ON taba.cell = codea.cell
      JOIN codeb ON codeb.vec_id = codea.vec_id
      JOIN tabb ON tabb.cell = codeb.cell
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4),
    {_kmeans_iter_sql('cent0', 1)},
    {_kmeans_iter_sql('cent1', 2)},
    {_kmeans_iter_sql('cent2', 3)},
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    qfull AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    qd AS (
      SELECT cent2.cell,
             sum((cent2.v - qfull.qv) * (cent2.v - qfull.qv)) AS dist
      FROM cent2 JOIN qfull ON cent2.i = qfull.i GROUP BY 1
    ),
    probe AS (SELECT cell FROM qd ORDER BY dist, cell LIMIT 2),
    members AS (
      SELECT asg.vec_id FROM asg JOIN probe USING (cell)
      WHERE asg.vec_id <> 0
    ),
    shortlist AS (
      SELECT adot.vec_id,
             round(adot / (n.norm * qn.qnorm), 4) AS ac
      FROM adot JOIN norms n ON n.vec_id = adot.vec_id, qn
      WHERE adot.vec_id IN (SELECT vec_id FROM members)
      ORDER BY ac DESC, adot.vec_id
      LIMIT 50
    ),
    exact AS (
      SELECT c.vec_id, sum(c.v * qfull.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qfull ON c.i = qfull.i
      WHERE c.vec_id IN (SELECT vec_id FROM shortlist)
      GROUP BY 1
    )
    SELECT exact.vec_id, round(dot / (norm * qn.qnorm), 4) AS cosine
    FROM exact, qn
    ORDER BY round(dot / (norm * qn.qnorm), 4) DESC, exact.vec_id
    LIMIT 10
    """


@register("ann11_ivfpq_from_index", None)  # finalized below (composed CTEs)
def ann11_ivfpq_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN served from a PERSISTED IVF-PQ index — the query-latency
    half of ann10's build+query conflation, separated so the bench
    quotes what a 100 TB vector store actually serves: ann10's headline
    is dominated by the two in-plan PQ subspace trainings; this query
    trains NOTHING in-plan. The index (coarse k-means centroids + full
    assignment + PQ codes + two subspace centroid tables,
    llm.similarity.build_ivfpq_index) is built once per dataset and
    cached on disk keyed by the embeddings file's identity; the serve
    path (ivfpq_query_from_index) reads only index state plus the
    query's own row: L2 probe of the k-row centroid table, member
    semi-join against the stored assignment, PQ-code shortlist via two
    broadcast lookup tables, exact rerank of 50 vectors. The oracle
    replays the deterministic index BUILD from scratch and the same
    serve path — stored == retrained, which is exactly the persisted-
    index contract (the ANN analog of x21's stored-signature index;
    reference-analog: the stored-state idempotency of
    src/extract.py:222-270 applied to vectors)."""
    from .llm.similarity import ivfpq_query_from_index

    emb = _t(spark, sf_dir, "embeddings")
    idx = _cached_ivfpq_index(spark, sf_dir, emb)
    return ivfpq_query_from_index(
        emb, *idx, query_id=0, k=10, shortlist=50, nprobe=2
    )


def _cached_ivfpq_index(spark: SparkSession, sf_dir: str, emb: DataFrame):
    """Build-once/serve-many for the registered persisted-index
    queries: the five IVF-PQ index tables for this sf_dir's embeddings,
    built on first use and cached on disk (:func:`_ivfpq_index_dir` —
    keyed by file identity + params, promoted atomically). The build is
    fully deterministic, so stored == retrained and a DuckDB oracle
    replaying the training from scratch verifies a query served from
    this cache. Shared by ann11 (single IVF-PQ query) and ann14
    (batched coarse-IVF serve — it reads the coarse centroid +
    assignment tables and ignores the PQ ones)."""
    import os
    import shutil

    from .llm.similarity import build_ivfpq_index, read_ivfpq_index

    idx_dir = _ivfpq_index_dir(sf_dir)
    if not os.path.isdir(idx_dir):
        staging = f"{idx_dir}.build_{os.getpid()}"
        build_ivfpq_index(
            emb, staging, coarse_k=4, coarse_iters=2, n_codes=16, pq_iters=2
        )
        try:
            os.rename(staging, idx_dir)  # atomic promote
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)  # concurrent build won
    return read_ivfpq_index(spark, idx_dir)


_ANN12_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
base AS (SELECT * FROM comp WHERE vec_id % 5 <> 4),
cent0 AS (SELECT vec_id AS cell, i, v FROM base WHERE vec_id < 4),
{_pq_iter_sql('cent0', 1, 'base', '')},
{_pq_iter_sql('cent1', 2, 'base', '')},
full_assign AS (
  SELECT comp.vec_id, cent2.cell,
         row_number() OVER (
           PARTITION BY comp.vec_id
           ORDER BY sum((comp.v - cent2.v) * (comp.v - cent2.v)), cent2.cell
         ) AS rn
  FROM comp JOIN cent2 ON comp.i = cent2.i
  GROUP BY comp.vec_id, cent2.cell
)
SELECT vec_id, cell FROM full_assign
WHERE rn = 1 AND vec_id % 5 = 4
"""


_ANN13_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
base AS (SELECT * FROM comp WHERE vec_id % 5 <> 4),
cent0 AS (SELECT vec_id AS cell, i, v FROM base WHERE vec_id < 4),
{_pq_iter_sql('cent0', 1, 'base', '')},
{_pq_iter_sql('cent1', 2, 'base', '')},
full_assign AS (
  SELECT comp.vec_id, cent2.cell,
         row_number() OVER (
           PARTITION BY comp.vec_id
           ORDER BY sum((comp.v - cent2.v) * (comp.v - cent2.v)), cent2.cell
         ) AS rn
  FROM comp JOIN cent2 ON comp.i = cent2.i
  GROUP BY comp.vec_id, cent2.cell
),
asg AS (SELECT vec_id, cell FROM full_assign WHERE rn = 1),
before AS (
  SELECT cell, count(*) AS n_before FROM asg WHERE vec_id % 5 <> 4 GROUP BY 1
),
after AS (SELECT cell, count(*) AS n_after FROM asg GROUP BY 1),
tot AS (
  SELECT (SELECT sum(n_before) FROM before) AS tb,
         (SELECT sum(n_after) FROM after) AS ta
)
SELECT a.cell,
       coalesce(b.n_before, 0) AS n_before,
       a.n_after,
       round(coalesce(b.n_before, 0) * 1.0 / tot.tb, 6) AS share_before,
       round(a.n_after * 1.0 / tot.ta, 6) AS share_after,
       (coalesce(b.n_before, 0) = 0
        OR a.n_after * 1.0 / tot.ta
           > 2.0 * (coalesce(b.n_before, 0) * 1.0 / tot.tb)) AS retrain
FROM after a LEFT JOIN before b USING (cell), tot
"""


@register("ann13_index_drift", _ANN13_SQL)
def ann13_index_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift report that closes ann12's maintenance loop, as a
    hash-verified query rather than a pytest-only claim: after folding
    the delta batch (vec_id % 5 == 4) into the stored IVF assignment
    against frozen centroids, report per cell how the corpus share
    moved and whether re-training is warranted (share more than
    doubled, or the cell was empty at build time —
    llm.similarity.ivf_cell_drift, the exact threshold a maintenance
    scheduler acts on). The oracle replays the base training, the
    frozen-centroid re-assignment, and the same count/share/flag
    algebra. Cell-count-sized output; the only corpus-sized work is
    the assignment ann12 already does."""
    from .llm.similarity import (
        ivf_cell_drift,
        ivf_incremental_assign,
        kmeans_fit,
    )

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    cent, assign_before = kmeans_fit(
        base, "vec_id", "embedding", k=4, iters=2, materialize=True
    )
    assign_after = assign_before.unionByName(
        ivf_incremental_assign(delta, cent)
    )
    return ivf_cell_drift(assign_before, assign_after)


def _ann14_sql() -> str:
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4),
    {{KMEANS_CHAINS}}
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    qcomp AS (SELECT vec_id AS qid, i, v AS qv FROM comp WHERE vec_id < 5),
    qd AS (
      SELECT qcomp.qid, cent2.cell,
             sum((cent2.v - qcomp.qv) * (cent2.v - qcomp.qv)) AS dist
      FROM cent2 JOIN qcomp ON cent2.i = qcomp.i
      GROUP BY 1, 2
    ),
    probe AS (
      SELECT qid, cell FROM qd
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dist, cell) <= 2
    ),
    members AS (
      SELECT p.qid, a.vec_id
      FROM asg a JOIN probe p ON a.cell = p.cell
      WHERE a.vec_id <> p.qid
    ),
    dots AS (
      SELECT m.qid, m.vec_id, sum(c.v * qc.qv) AS dot
      FROM members m
      JOIN comp c ON c.vec_id = m.vec_id
      JOIN qcomp qc ON qc.qid = m.qid AND qc.i = c.i
      GROUP BY 1, 2
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    scored AS (
      SELECT d.qid AS query_id, d.vec_id,
             round(d.dot / (n.norm * qn.norm), 4) AS cosine
      FROM dots d
      JOIN norms n ON n.vec_id = d.vec_id
      JOIN norms qn ON qn.vec_id = d.qid
    )
    SELECT query_id, vec_id, cosine FROM scored
    QUALIFY row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) <= 5
    """


@register("ann14_batch_ivf_serve", None)  # sql attached after _kmeans_iter_sql
def ann14_batch_ivf_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN serving from ONE shared IVF index — the read path a
    near-dup pass or retrieval dataloader actually runs: many queries
    per micro-batch against the same stored index, answered in a
    single plan (per-query job submission would dominate at thousands
    of lookups). Five stored vectors (vec_id < 5) are answered top-5
    each; every stage is batched — one (qid, cell) probe agg over the
    broadcast centroid table, one assignment join for all members, one
    (qid, candidate)-keyed exact rerank with the queries' components
    broadcast, one qid-partitioned cut window (parallel across
    queries, no global sort). Serves from the SAME cached persisted
    index as ann11 (coarse centroid + assignment tables; the PQ tables
    go unused) — zero in-plan training, so the bench number is batch
    serve latency. The oracle replays the deterministic k-means
    training (ann4's chain), the batched L2 probe, member join, and
    rerank — stored == retrained, ann11's contract. Per-query equality
    with the single-query serve path is pinned in
    test_similarity.py."""
    from .llm.similarity import ivf_batch_query_from_index

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign, _codes, _ca, _cb = _cached_ivfpq_index(spark, sf_dir, emb)
    return ivf_batch_query_from_index(
        emb, cent, assign, [0, 1, 2, 3, 4], k=5, nprobe=2
    )


@register("ann15_filtered_topk", None)  # sql attached after _kmeans_iter_sql
def ann15_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED ANN from the persisted IVF index: top-10
    cosine neighbors of vector 0 among only the vectors with
    ``label = 3`` (~12% of the corpus) — the filtered-search mode every
    production vector store serves ("nearest passages with license X /
    language Y / date > Z"). The filter lands at CANDIDATE GENERATION:
    the probed cells' member set is semi-joined to the predicate ids
    BEFORE any distance work (llm.similarity.
    ivf_filtered_query_from_index), so the rerank still yields a full
    k. The naive alternative — post-filtering an unfiltered top-k —
    silently returns fewer than k under any selective predicate
    (pinned in test_similarity.py). Serves from the SAME cached
    persisted index as ann11/ann14 (coarse tables only); the predicate
    side is a pushed-down parquet scan of (vec_id, label) — at 100 TB
    the filter only ever SHRINKS the reranked member set, and the
    vectors of excluded ids are never read past the scan. The oracle
    replays the deterministic index build and the same filtered serve
    chain — stored == retrained, ann11's contract."""
    from .llm.similarity import ivf_filtered_query_from_index

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign, _codes, _ca, _cb = _cached_ivfpq_index(spark, sf_dir, emb)
    allowed = emb.filter(F.col("label") == 3).select("vec_id")
    return ivf_filtered_query_from_index(
        emb, cent, assign, allowed, query_id=0, k=10, nprobe=2
    )


@register("ann17_filtered_recall", None)  # sql attached after _kmeans_iter_sql
def ann17_filtered_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FILTERED-search quality contract: recall@10 of ann15's
    pre-filtered IVF serve against the exact brute-force top-10 over
    the same predicate subset (label = 3). Filtered ANN has a known
    failure mode the unfiltered contract (ann6) cannot see — a
    selective predicate thins every probed cell, so the same nprobe
    covers less of the *eligible* neighborhood and recall can collapse
    even while unfiltered recall looks healthy (the problem
    ACORN-style filter-aware indexes exist to fix). This query makes
    that trade a verified number, the same discipline as ann6/dd14:
    both the approximate and exact sides replayed by the oracle,
    deterministic on both engines (4-dp rounded cosine, vec_id
    tie-break). The recall floor is pinned in test_similarity.py."""
    from .llm.similarity import brute_force_topk, ivf_filtered_query_from_index

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign, _codes, _ca, _cb = _cached_ivfpq_index(spark, sf_dir, emb)
    allowed = emb.filter(F.col("label") == 3).select("vec_id")
    approx = ivf_filtered_query_from_index(
        emb, cent, assign, allowed, query_id=0, k=10, nprobe=2
    )
    exact = brute_force_topk(
        emb.filter((F.col("label") == 3) | (F.col("vec_id") == 0)),
        query_id=0,
        k=10,
    )
    inter = exact.select("vec_id").intersect(approx.select("vec_id"))
    return inter.agg(F.count("*").cast("bigint").alias("n_hits")).select(
        F.lit(10).cast("bigint").alias("k"),
        "n_hits",
        F.round(F.col("n_hits") / 10.0, 4).alias("recall_at_k"),
    )


def _ann17_sql() -> str:
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4),
    {{KMEANS_CHAINS}}
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    qcomp AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    qd AS (
      SELECT cent2.cell,
             sum((cent2.v - qcomp.qv) * (cent2.v - qcomp.qv)) AS dist
      FROM cent2 JOIN qcomp ON cent2.i = qcomp.i
      GROUP BY 1
    ),
    probe AS (SELECT cell FROM qd ORDER BY dist, cell LIMIT 2),
    members AS (
      SELECT a.vec_id FROM asg a JOIN probe USING (cell)
      WHERE a.vec_id <> 0
        AND a.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 3)
    ),
    exactf AS (
      SELECT c.vec_id, sum(c.v * qcomp.qv) AS dot,
             sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qcomp ON c.i = qcomp.i
      WHERE c.vec_id <> 0
        AND c.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 3)
      GROUP BY 1
    ),
    qn AS (SELECT sqrt(sum(qv * qv)) AS qnorm FROM qcomp),
    bf AS (
      SELECT e.vec_id FROM exactf e, qn
      ORDER BY round(e.dot / (e.norm * qn.qnorm), 4) DESC, e.vec_id
      LIMIT 10
    ),
    ivf AS (
      SELECT e.vec_id FROM exactf e, qn
      WHERE e.vec_id IN (SELECT vec_id FROM members)
      ORDER BY round(e.dot / (e.norm * qn.qnorm), 4) DESC, e.vec_id
      LIMIT 10
    ),
    inter AS (SELECT vec_id FROM bf INTERSECT SELECT vec_id FROM ivf)
    SELECT cast(10 AS BIGINT) AS k, count(*) AS n_hits,
           round(count(*) / 10.0, 4) AS recall_at_k
    FROM inter
    """


def _ann15_sql() -> str:
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4),
    {{KMEANS_CHAINS}}
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    qcomp AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    qd AS (
      SELECT cent2.cell,
             sum((cent2.v - qcomp.qv) * (cent2.v - qcomp.qv)) AS dist
      FROM cent2 JOIN qcomp ON cent2.i = qcomp.i
      GROUP BY 1
    ),
    probe AS (SELECT cell FROM qd ORDER BY dist, cell LIMIT 2),
    members AS (
      SELECT a.vec_id FROM asg a JOIN probe USING (cell)
      WHERE a.vec_id <> 0
        AND a.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 3)
    ),
    dots AS (
      SELECT c.vec_id, sum(c.v * qcomp.qv) AS dot,
             sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qcomp ON c.i = qcomp.i
      WHERE c.vec_id IN (SELECT vec_id FROM members)
      GROUP BY 1
    ),
    qn AS (SELECT sqrt(sum(qv * qv)) AS qnorm FROM qcomp)
    SELECT d.vec_id, round(d.dot / (d.norm * qn.qnorm), 4) AS cosine
    FROM dots d, qn
    ORDER BY round(d.dot / (d.norm * qn.qnorm), 4) DESC, d.vec_id
    LIMIT 10
    """


@register("ann12_incremental_assign", _ANN12_SQL)
def ann12_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance: fold a new vector batch
    (vec_id % 5 == 4 stands in for today's arrivals) into a persisted
    IVF index WITHOUT re-clustering — assign only the delta to the
    existing centroids in one broadcast pass and append to the stored
    assignment table. The oracle proves the folding is exact: it trains
    the same centroids on the base corpus, re-assigns EVERYTHING to
    those fixed centroids from scratch, and restricts to the delta —
    incremental-assign == full-assign on fixed centroids, so the grown
    index is byte-identical to a rebuild (until centroid DRIFT says
    retrain: llm.similarity.ivf_cell_drift reports per-cell share growth
    and flags when re-training is warranted — pinned in
    test_similarity.py). x21/x41's incremental pattern applied to the
    last index in the engine that previously required a full rebuild.
    In production `cent` is a parquet read of the stored index; here it
    is retrained in-plan so the DuckDB oracle can replay it."""
    from .llm.similarity import ivf_incremental_assign, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    cent, _ = kmeans_fit(base, "vec_id", "embedding", k=4, iters=2,
                         materialize=True)
    return ivf_incremental_assign(delta, cent)


_ANN16_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
base AS (SELECT * FROM comp WHERE vec_id % 5 <> 4),
cent0 AS (SELECT vec_id AS cell, i, v FROM base WHERE vec_id < 4),
{_pq_iter_sql('cent0', 1, 'base', '')},
{_pq_iter_sql('cent1', 2, 'base', '')},
{_pq_iter_sql('cent2', 3, 'comp', '')},
final_assign AS (
  SELECT comp.vec_id, cent3.cell,
         row_number() OVER (
           PARTITION BY comp.vec_id
           ORDER BY sum((comp.v - cent3.v) * (comp.v - cent3.v)), cent3.cell
         ) AS rn
  FROM comp JOIN cent3 ON comp.i = cent3.i
  GROUP BY comp.vec_id, cent3.cell
),
members AS (
  SELECT cell, count(*) AS n_members FROM final_assign WHERE rn = 1 GROUP BY 1
),
norms AS (
  SELECT cell, round(sqrt(sum(v * v)), 4) AS centroid_norm
  FROM cent3 GROUP BY 1
)
SELECT m.cell, m.n_members, n.centroid_norm
FROM members m JOIN norms n USING (cell)
"""


@register("ann16_centroid_refresh", _ANN16_SQL)
def ann16_centroid_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm-start centroid REFRESH — the step ann13's drift report
    triggers, completing the index lifecycle (build ann11 → serve
    ann11/ann14/ann15 → grow ann12 → drift ann13 → REFRESH): one Lloyd
    iteration over the GROWN corpus (base + the ann12 delta)
    initialized from the stored base-trained centroids
    (kmeans_fit(init=...)), instead of a from-scratch re-train. Warm
    start converges in 1-2 iterations because the stored centroids
    already describe most of the mass — at 100 TB that's the
    difference between one corpus pass and the full Lloyd schedule,
    and it never re-seeds, so cell identities are STABLE across
    refreshes (the stored assignment/code tables stay joinable on
    cell). Output is ann4's shape on the refreshed index: per-cell
    member count + centroid norm. Descent property (refresh never
    increases within-cell SSE on the grown corpus) is pinned in
    test_similarity.py; the oracle replays base training then the
    warm-start iteration and final re-assignment as CTE chains."""
    from .llm.similarity import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    stored, _ = kmeans_fit(base, "vec_id", "embedding", k=4, iters=2,
                           materialize=True)
    refreshed, assign = kmeans_fit(emb, "vec_id", "embedding", iters=1,
                                   materialize=True, init=stored)
    norms = refreshed.groupBy("cell").agg(
        F.round(F.sqrt(F.sum(F.col("v") * F.col("v"))), 4).alias("centroid_norm")
    )
    return (
        assign.groupBy("cell")
        .agg(F.count("*").alias("n_members"))
        .join(norms, "cell")
        .select("cell", "n_members", "centroid_norm")
    )


@register(
    "ann7_multiprobe_topk",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    cent AS (SELECT vec_id AS c, i, v AS cv FROM comp WHERE vec_id < 8),
    cross_dots AS (
      SELECT comp.vec_id, cent.c, sum(comp.v * cent.cv) AS dot
      FROM comp JOIN cent ON comp.i = cent.i GROUP BY 1, 2
    ),
    scored AS (
      SELECT cross_dots.vec_id, c, dot / (nv.norm * nc.norm) AS cos
      FROM cross_dots
      JOIN norms nv ON nv.vec_id = cross_dots.vec_id
      JOIN norms nc ON nc.vec_id = c
    ),
    assign AS (
      SELECT vec_id, c AS centroid FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) = 1
    ),
    qc AS (
      SELECT c AS centroid FROM scored WHERE vec_id = 0
      QUALIFY row_number() OVER (ORDER BY cos DESC, c) <= 2
    ),
    cluster AS (
      SELECT assign.vec_id FROM assign JOIN qc USING (centroid)
      WHERE assign.vec_id <> 0
    ),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    dots AS (
      SELECT c.vec_id, sum(c.v * q.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN q ON c.i = q.i
      WHERE c.vec_id IN (SELECT vec_id FROM cluster)
      GROUP BY c.vec_id
    ),
    qn AS (SELECT sqrt(sum(v*v)) AS qnorm FROM comp WHERE vec_id = 0)
    SELECT vec_id, round(dot / (norm * qnorm), 4) AS cosine
    FROM dots, qn
    ORDER BY round(dot / (norm * qnorm), 4) DESC, vec_id
    LIMIT 10
    """,
)
def ann7_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search (multi-probe IVF): the recall/cost dial that
    ann6 measures, turned one notch — search the TWO cells nearest the
    query (nprobe=2) instead of one. Coarse-quantizer misses (a true
    neighbor assigned to the runner-up cell) are exactly what the extra
    probe recovers; cost grows to ~2/n_cells of the corpus, still a
    fraction of the exact scan. tests pin recall(nprobe=2) >=
    recall(nprobe=1) on the same ground truth."""
    from .llm.similarity import ivf_topk

    return ivf_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=10, n_centroids=8,
        nprobe=2,
    )


@register(
    "x4_outlier_flag",
    """
    WITH stats AS (
      SELECT o_custkey, avg(o_totalprice) AS mean_price
      FROM orders GROUP BY o_custkey
    )
    SELECT o_orderkey, o_custkey,
           abs(o_totalprice - mean_price) > 0.8 * mean_price AS outlier_flag
    FROM orders JOIN stats USING (o_custkey)
    """,
)
def x4_outlier_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: per-group outlier flagging — the `outlier_flag` column
    the reference declares then removes (config/config.py:92 'Removed
    outlier_flag', load.py:226 still casts it). Deviation-vs-group-mean
    via a window, one shuffle on the group key."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    mean_price = F.avg("o_totalprice").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.abs(F.col("o_totalprice") - mean_price) > 0.8 * mean_price).alias(
            "outlier_flag"
        ),
    )


@register(
    "x5_asof_join",
    """
    WITH purchases AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           round(c.value, 2) AS click_value_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def x5_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: backward as-of join (operator Spark lacks natively) —
    each purchase gets the most recent prior-or-simultaneous click's
    value per user, via the single-shuffle union+window form
    (operators/asof.py). Oracle: DuckDB's native ASOF JOIN."""
    from .operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, key="user_id", left_time="ts", right_time="ts",
        value_cols=["value"],
    )
    return joined.select(
        "event_id", "user_id", F.round("value_asof", 2).alias("click_value_asof")
    )


@register(
    "tx5_top_tokens",
    f"""
    WITH toks AS (
      SELECT unnest({_DUCK_TOKS}) AS tok FROM documents
    )
    SELECT tok, count(*) AS n
    FROM toks GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def tx5_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: corpus token frequency top-k (vocabulary head) —
    explode + count + ordered limit with deterministic tie-break."""
    from .llm import tokens

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@register(
    "x7_group_zscore",
    """
    WITH stats AS (
      SELECT o_orderpriority,
             avg(o_totalprice) AS mu,
             stddev_samp(o_totalprice) AS sigma
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderkey, o_orderpriority,
           round((o_totalprice - mu) / sigma, 4) AS zscore
    FROM orders JOIN stats USING (o_orderpriority)
    """,
)
def x7_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: per-group z-score normalization, pure expressions —
    a tiny per-group stats aggregate (map-side partial combine, so the
    shuffle carries one row per group per mapper) broadcast-joined back
    to the rows. With only a handful of groups this shape keeps every
    stage wide: a grouped-map UDF — or a plain window partitioned on
    the group key — would funnel all rows through num-groups reducer
    tasks, a 100x-data straggler. The applyInPandas twin survives as
    the §2.11 grouped-map surface demonstration under a pytest
    equivalence test (tests/test_operators.py)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    stats = o.groupBy("o_orderpriority").agg(
        F.avg("o_totalprice").alias("__mu"),
        F.stddev_samp("o_totalprice").alias("__sigma"),
    )
    return o.join(F.broadcast(stats), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(
            (F.col("o_totalprice") - F.col("__mu")) / F.col("__sigma"), 4
        ).alias("zscore"),
    )


def x7_group_zscore_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 grouped-map UDF surface: the applyInPandas twin of
    :func:`x7_group_zscore` — whole-group context in one pandas frame.
    Not the registered default (num-groups reducer tasks = straggler at
    scale); kept under a pytest equivalence test as the demonstration
    that the Arrow grouped-map machinery matches the expression form
    bit-for-bit."""
    import pandas as pd

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sigma = pdf["o_totalprice"].std(ddof=1)
        return pd.DataFrame({
            "o_orderkey": pdf["o_orderkey"],
            "o_orderpriority": pdf["o_orderpriority"],
            "zscore": ((pdf["o_totalprice"] - mu) / sigma).round(4),
        })

    return o.groupBy("o_orderpriority").applyInPandas(
        zscore, schema="o_orderkey bigint, o_orderpriority string, zscore double"
    )


@register(
    "x8_unpivot",
    # UNION ALL, not UNPIVOT: DuckDB's UNPIVOT over a parquet view is
    # ~100x slower than three projections (measured 6 s vs 0.05 s at
    # sf0.01) and the gate pays oracle time too
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           round(l_quantity, 2) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice',
           round(l_extendedprice, 2) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', round(l_tax, 2) FROM lineitem
    """,
)
def x8_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: unpivot (wide -> long) via the native melt operator."""
    l = _t(spark, sf_dir, "lineitem")
    out = l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_tax"],
        variableColumnName="measure",
        valueColumnName="raw_val",
    )
    return out.select(
        "l_orderkey", "l_linenumber", "measure", F.round("raw_val", 2).alias("val")
    )


@register(
    "x9_resample_ffill",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    j AS (
      SELECT g.user_id, g.h, hourly.v
      FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.h = g.h
    )
    SELECT user_id, h,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h ROWS UNBOUNDED PRECEDING) AS filled
    FROM j
    """,
)
def x9_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: time-series resampling — per-user hourly grid from first
    to last event (sequence + explode: the dense-grid generator), left
    join of actual hourly sums, gaps forward-filled with
    last(ignorenulls). One shuffle on user_id; the grid never leaves the
    executors."""
    e = _t(spark, sf_dir, "events")
    h = F.date_trunc("hour", F.col("ts"))
    hourly = e.groupBy("user_id", h.alias("h")).agg(
        F.round(F.sum("value"), 2).alias("v")
    )
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    j = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id", "h", F.last("v", ignorenulls=True).over(w).alias("filled")
    )


@register(
    "x30_histogram",
    """
    SELECT cast(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           cast(floor(o_totalprice / 50000) * 50000 AS DOUBLE) AS bin_lo,
           count(*) AS n,
           round(avg(o_totalprice), 2) AS bin_avg
    FROM orders GROUP BY 1, 2
    """,
)
def x30_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiling: equi-width value histogram — the data-distribution
    summary every warehouse profiler ships (and the input to choosing
    salting/bucketing strategies). One map-side-combinable aggregate
    keyed on the bin: the shuffle carries one row per (mapper, bin), so
    cost is bin-count-bounded at any data scale."""
    o = _t(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / 50000)
    return o.groupBy(
        b.cast("bigint").alias("bin"),
        (b * 50000).cast("double").alias("bin_lo"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.avg("o_totalprice"), 2).alias("bin_avg"),
    )


_PROFILE_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


@register(
    "x31_column_profile",
    " UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               count(*) - count({c}) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct
        FROM customer"""
        for c in _PROFILE_COLS
    ),
)
def x31_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiling: per-column null and exact distinct counts in long form
    (M2/M4 generalized — the column-health report). The table is melted
    ONCE into (column_name, value) via ``stack`` — a narrow x5 row
    fan-out, no per-column scan — then a single two-phase distinct agg:
    Spark rewrites countDistinct as partial dedup keyed on
    (column_name, value) followed by the final count keyed on
    column_name, so parallelism follows value cardinality, not the
    5-row output. Values are stringified for the melt; IEEE
    shortest-roundtrip formatting is injective, so distinct counts are
    unchanged. At 100 TB swap countDistinct for approx_count_distinct
    (x6) — exact is kept here for the cross-engine oracle."""
    c = _t(spark, sf_dir, "customer")
    n = len(_PROFILE_COLS)
    stack_expr = "stack({}, {}) as (column_name, value)".format(
        n, ", ".join(f"'{col}', cast({col} AS string)" for col in _PROFILE_COLS)
    )
    long = c.select(F.expr(stack_expr))
    return long.groupBy("column_name").agg(
        (F.count(F.lit(1)) - F.count("value")).alias("n_nulls"),
        F.countDistinct("value").alias("n_distinct"),
    )


def _x32_sql() -> str:
    from .llm.dedup import _h32_sql

    h = _h32_sql("md5(cast(doc_id AS VARCHAR) || '|seed42')")
    return f"""
    SELECT doc_id,
           cast(row_number() OVER (ORDER BY {h}, doc_id) AS BIGINT) AS shuffle_pos
    FROM documents
    """


@register("x32_corpus_shuffle", None)  # finalized below (needs _h32_sql)
def x32_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle — the training-order
    primitive: every document gets a dense position 1..N in an order
    that is a pure function of (doc_id, seed), so the shuffle is
    reproducible across runs, engines, partitionings, and restarts
    (``orderBy(rand())`` is none of those). Order key = md5 of the
    seeded id (the same keyed-hash trick as the x11 split); the dense
    numbering rides the partition-offset sequence engine
    (operators/sequence.py — w1's zipWithIndex decomposition), so no
    ``Exchange SinglePartition`` appears at any corpus size and the
    only driver state is O(num_buckets) offsets."""
    from .llm.dedup import _h32

    d = _t(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        _h32(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|seed42"))))
        .alias("__h"),
    )
    from .operators.sequence import with_global_sequence

    return with_global_sequence(
        keyed, ["__h", "doc_id"], name="shuffle_pos"
    ).select("doc_id", "shuffle_pos")


REGISTRY["x32_corpus_shuffle"].sql = _x32_sql()


def _x42_sql() -> str:
    from .llm.dedup import _h32_sql

    h = _h32_sql("md5(cast(doc_id AS VARCHAR) || '|seed7')")
    return f"""
    WITH scored AS (SELECT doc_id, {_DUCK_QUALITY} AS q FROM documents),
    qr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY q DESC, doc_id) AS qrn,
             count(*) OVER () AS n
      FROM scored
    ),
    phased AS (
      SELECT doc_id,
             CASE WHEN qrn <= ceil(n / 3.0) THEN 1
                  WHEN qrn <= ceil(2 * n / 3.0) THEN 2
                  ELSE 3 END AS phase
      FROM qr
    ),
    keyed AS (
      SELECT doc_id, phase,
             cast(phase AS BIGINT) * 4294967296 + {h} AS k
      FROM phased
    )
    SELECT doc_id, cast(phase AS BIGINT) AS phase,
           cast(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS position
    FROM keyed
    """


@register("x42_curriculum_order", None)  # sql attached below
def x42_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering — the training-order composite: rank
    the corpus by quality into three phases (phase 1 = highest-quality
    tercile, trained first — the curriculum-learning schedule of
    Bengio et al. 2009 applied to corpus curation), then
    deterministically shuffle WITHIN each phase (seeded hash, same
    keyed-md5 trick as x32 — reproducible across runs, engines,
    partitionings) and emit each document's dense global training
    position. A loader streams position order and gets
    easy-to-hard with no intra-phase ordering bias.

    Scale shape: two passes of the partition-offset sequence engine
    (quality rank, then final position — no single-partition window in
    either), with the final order key packed as phase * 2^32 +
    hash32 so the leading key stays fully spread for the engine's
    equi-depth buckets (a bare 3-value phase key would collapse
    parallelism to 3 tasks). The corpus count joins back as a 1-row
    broadcast."""
    from .llm.dedup import _h32
    from .llm.text import quality_score
    from .operators.sequence import with_global_sequence

    d = _t(spark, sf_dir, "documents")
    # Pin the quality projection once: each sequence pass consumes its
    # input three times (quantile sketch, bucket counts, ranking
    # window), so two chained passes would otherwise re-run the text
    # scoring ~6x and the first ranking window ~3x (median 2.65 s ->
    # 1.77 s at sf0.1). The pinned frames are 2-3 narrow columns per doc.
    scored = (
        d.select("doc_id", quality_score(F.col("text")).alias("q"))
        .withColumn("neg_q", -F.col("q"))
        .localCheckpoint(eager=True)
    )
    # quality rank -> tercile phase (q is round(10)-stable: identical
    # doubles on both engines, ties broken by doc_id)
    qr = with_global_sequence(scored, ["neg_q", "doc_id"], name="qrn")
    n = scored.agg(F.count("*").alias("__n"))
    phased = qr.crossJoin(F.broadcast(n)).select(
        "doc_id",
        F.when(F.col("qrn") <= F.ceil(F.col("__n") / 3.0), 1)
        .when(F.col("qrn") <= F.ceil(2 * F.col("__n") / 3.0), 2)
        .otherwise(3)
        .alias("phase"),
    )
    keyed = phased.select(
        "doc_id",
        "phase",
        (
            F.col("phase").cast("bigint") * F.lit(4294967296).cast("bigint")
            + _h32(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|seed7"))))
        ).alias("k"),
    ).localCheckpoint(eager=True)
    return with_global_sequence(keyed, ["k", "doc_id"], name="position").select(
        "doc_id", F.col("phase").cast("bigint").alias("phase"), "position"
    )


REGISTRY["x42_curriculum_order"].sql = _x42_sql()


@register(
    "ann8_embedding_moments",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    stats AS (
      SELECT a.i AS i, b.i AS j, count(*) AS n,
             sum(a.v * b.v) AS sxy, sum(a.v) AS sx, sum(b.v) AS sy
      FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    )
    SELECT cast(i - 1 AS BIGINT) AS i, cast(j - 1 AS BIGINT) AS j,
           round(sxy / n - (sx / n) * (sy / n), 6) + 0.0 AS cov
    FROM stats
    """,
)  # i/j re-based (generate_subscripts is 1-based, posexplode 0-based);
# "+ 0.0" canonicalizes IEEE negative zero, which the engines produce
# on different sides of values that round to 0.000000
def ann8_embedding_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space moments: per-dimension means and the full
    covariance matrix (upper triangle, population form E[xy]-E[x]E[y]) —
    the statistics whitening, PCA initialization, and drift monitoring
    consume. Distributed shape: the component self-join co-partitions on
    vec_id (one keyed shuffle of N*d rows); the d^2 fan-out happens
    AFTER the join and collapses immediately via map-side partial aggs
    into d(d+1)/2 output groups — no d^2-sized shuffle ever
    materializes, and nothing scales with N past the join. cov rounded
    at 6 dp: double accumulation across partitionings agrees far below
    1e-6 at any N where covariance is meaningful."""
    from .llm.similarity import _components

    comp = _components(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    a = comp.select("vec_id", F.col("i").alias("ia"), F.col("v").alias("va"))
    b = comp.select("vec_id", F.col("i").alias("jb"), F.col("v").alias("vb"))
    stats = (
        a.join(b, "vec_id")
        .filter(F.col("ia") <= F.col("jb"))
        .groupBy("ia", "jb")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("va") * F.col("vb")).alias("sxy"),
            F.sum("va").alias("sx"),
            F.sum("vb").alias("sy"),
        )
    )
    return stats.select(
        F.col("ia").cast("bigint").alias("i"),
        F.col("jb").cast("bigint").alias("j"),
        (
            F.round(
                F.col("sxy") / F.col("n")
                - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")),
                6,
            )
            + F.lit(0.0)  # canonicalize IEEE -0.0 (see oracle note)
        ).alias("cov"),
    )


def _x33_sql() -> str:
    # bin = clamp(floor((x - min) * 256 / (max - min + 1e-9)), 255); the
    # z-key interleaves the two 8-bit bins, custkey bits in the odd
    # positions. Pure arithmetic — identical doubles, identical floors.
    def bin_expr(col, mn, mx):
        return f"least(cast(floor(({col} - {mn}) * 256.0 / ({mx} - {mn} + 1e-9)) AS BIGINT), 255)"

    z = " + ".join(
        f"((zx // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        f" + ((zy // {1 << b}) % 2) * {1 << (2 * b)}"
        for b in range(8)
    )
    return f"""
    WITH stats AS (
      SELECT min(o_custkey) AS mn0, max(o_custkey) AS mx0,
             min(o_totalprice) AS mn1, max(o_totalprice) AS mx1
      FROM orders
    ),
    binned AS (
      SELECT o_orderkey,
             {bin_expr('o_custkey', 'mn0', 'mx0')} AS zx,
             {bin_expr('o_totalprice', 'mn1', 'mx1')} AS zy
      FROM orders, stats
    )
    SELECT o_orderkey, cast(zx AS BIGINT) AS zx, cast(zy AS BIGINT) AS zy,
           cast({z} AS BIGINT) AS zkey
    FROM binned
    """


@register("x33_zorder_key", None)  # finalized below
def x33_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional clustering key — the Z-order (Morton) curve
    that table formats' OPTIMIZE ZORDER BY implements, as a pure
    DataFrame expression: 8-bit equi-width bins per dimension
    (min/max from one tiny agg, broadcast back as a 1-row scalar),
    bits interleaved arithmetically into a 16-bit key. Writing the
    table with ``repartitionByRange("zkey").sortWithinPartitions``
    gives every parquet file a tight min/max envelope in BOTH
    dimensions, so predicates on either column prune files — single-
    column range sort only skips on its leading column. The key is a
    pure function of the row + two global constants: deterministic
    across engines (integer bit arithmetic; the only doubles are the
    identical bin divisions), partitionings, and appends."""
    o = _t(spark, sf_dir, "orders")
    stats = o.agg(
        F.min("o_custkey").alias("mn0"), F.max("o_custkey").alias("mx0"),
        F.min("o_totalprice").alias("mn1"), F.max("o_totalprice").alias("mx1"),
    )

    def bin_expr(col, mn, mx):
        return F.least(
            F.floor(
                (F.col(col) - F.col(mn)) * 256.0 / (F.col(mx) - F.col(mn) + 1e-9)
            ).cast("bigint"),
            F.lit(255).cast("bigint"),
        )

    binned = o.crossJoin(F.broadcast(stats)).select(
        "o_orderkey",
        bin_expr("o_custkey", "mn0", "mx0").alias("zx"),
        bin_expr("o_totalprice", "mn1", "mx1").alias("zy"),
    )
    z = None
    for b in range(8):
        term = (F.floor(F.col("zx") / (1 << b)).cast("bigint") % 2) * (
            1 << (2 * b + 1)
        ) + (F.floor(F.col("zy") / (1 << b)).cast("bigint") % 2) * (1 << (2 * b))
        z = term if z is None else z + term
    return binned.select(
        "o_orderkey", "zx", "zy", z.cast("bigint").alias("zkey")
    )


REGISTRY["x33_zorder_key"].sql = _x33_sql()


@register(
    "x6_approx_stats",
    """
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS distinct_within_5pct,
           TRUE AS median_within_1pct,
           TRUE AS p99_within_2pct
    FROM lineitem GROUP BY 1
    """,
)
def x6_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: sketch aggregates for 100 TB interactive profiling —
    HyperLogLog++ distinct counts and quantile sketches (mergeable, one
    pass, bounded memory — the only affordable profile at 100 TB).

    Sketch outputs are engine-specific, so raw values have no
    cross-engine oracle. Instead the registered form emits the sketch's
    ACCURACY CONTRACT in-plan: per group, booleans asserting the
    HLL++ distinct count is within 5% of the exact count (rsd=0.01 →
    5 sigma, tail ~3e-7 per group at any scale factor) and the quantile
    sketch — run at accuracy=50000, i.e. rank error <= n/50000 — is
    within 1% (median) / 2% (p99) of the exact percentile VALUE (rank
    error only bounds value error through the local data density, so
    the sketch gets enough accuracy headroom that the value bound holds
    on any non-pathological distribution), plus the exact distinct count
    itself. DuckDB computes the exact side and literal TRUEs, so the
    hash match fails iff any bound is violated or the exact counts
    drift — a real driver-gate check instead of the old rows-only row
    (VERDICT r5 next-round #4). Sketch internals stay pinned in
    tests/test_approx.py."""
    l = _t(spark, sf_dir, "lineitem")
    g = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 50000).alias("med_a"),
        F.percentile("l_extendedprice", 0.5).alias("med_e"),
        F.percentile_approx("l_extendedprice", 0.99, 50000).alias("p99_a"),
        F.percentile("l_extendedprice", 0.99).alias("p99_e"),
    )
    within = lambda a, e, tol: (
        F.abs(F.col(a).cast("double") - F.col(e)) <= F.lit(tol) * F.abs(F.col(e))
    )
    return g.select(
        "l_returnflag",
        "exact_orders",
        within("approx_orders", "exact_orders", 0.05).alias(
            "distinct_within_5pct"
        ),
        within("med_a", "med_e", 0.01).alias("median_within_1pct"),
        within("p99_a", "p99_e", 0.02).alias("p99_within_2pct"),
    )


_DD6_SQL = f"""
WITH RECURSIVE {_minhash_ctes(max_bucket_size=100)},
edges AS (SELECT a, b FROM mh_pairs UNION SELECT b, a FROM mh_pairs),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r FROM edges e JOIN reach ON reach.node = e.b
),
labels AS (SELECT node, min(r) AS label FROM reach GROUP BY node)
SELECT label AS cluster_id, count(*) AS cluster_size, min(node) AS keep_id
FROM labels GROUP BY label
"""


@register("dd6_lsh_dup_clusters", _DD6_SQL)
def dd6_lsh_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (clusters): connected components over the MinHash-LSH
    candidate-pair graph via iterative min-label propagation — the
    canonical "pick one survivor per duplicate cluster" step.

    Each round is one join + one groupBy, iterated to a FIXED POINT
    (llm.dedup.connected_components) — a fixed round budget would
    split any duplicate chain longer than the budget. At scale this is
    the standard large-graph CC recipe (alternate small-star /
    large-star); here plain propagation suffices. The DuckDB oracle
    reaches the same fixed point by a different route — recursive-CTE
    transitive closure + min-reach per node — so the hash match is an
    independent check of the iterative Spark plan, not a replay of it.
    """
    from .llm.dedup import connected_components, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size=100, materialize=True
    ).localCheckpoint(eager=True)
    labels = connected_components(pairs)
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
            F.min("node").alias("keep_id"),
        )
        .select(F.col("label").alias("cluster_id"), "cluster_size", "keep_id")
    )


from .operators.sampling import hash_bucket_sql as _hb_sql  # noqa: E402

_X39_SQL = f"""
WITH RECURSIVE {_minhash_ctes(max_bucket_size=100)},
edges AS (SELECT a, b FROM mh_pairs UNION SELECT b, a FROM mh_pairs),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r FROM edges e JOIN reach ON reach.node = e.b
),
labels AS (SELECT node, min(r) AS label FROM reach GROUP BY node),
rep AS (
  SELECT d.doc_id, coalesce(l.label, d.doc_id) AS rep
  FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
),
b AS (SELECT doc_id, rep, {_hb_sql('rep', 100)} AS bucket FROM rep)
SELECT doc_id, cast(rep AS BIGINT) AS rep,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


@register("x39_leakage_safe_split", _X39_SQL)
def x39_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents must
    land on the SAME side of the split, or evaluation scores are
    contaminated by memorized training text — the failure mode a plain
    per-document hash split (x11) cannot prevent when the corpus holds
    near-dups. Split unit = the near-dup CLUSTER: connected components
    over the MinHash-LSH candidate graph (dd6's machinery), each
    document keyed by its cluster representative (min doc_id; singleton
    docs represent themselves), and the 80/10/10 hash rule applied to
    the REPRESENTATIVE — one cluster, one side, deterministically.
    Scale shape: the CC fixed-point is the only iterative part (same
    plan as dd6); everything after is a left join against the
    cluster-label table plus a pure projection."""
    from .llm.dedup import connected_components, minhash_lsh_pairs
    from .operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "text", "doc_id", max_bucket_size=100, materialize=True
    ).localCheckpoint(eager=True)
    labels = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "label"
    )
    rep = d.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("label", F.col("doc_id")).alias("rep")
    )
    bucket = hash_bucket(F.col("rep"), 100)
    return rep.select(
        "doc_id",
        F.col("rep").cast("bigint").alias("rep"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


_DD13_SQL = f"""
WITH RECURSIVE {_minhash_ctes(max_bucket_size=100)},
edges AS (SELECT a, b FROM mh_pairs UNION SELECT b, a FROM mh_pairs),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r FROM edges e JOIN reach ON reach.node = e.b
),
labels AS (SELECT node, min(r) AS label FROM reach GROUP BY node),
q AS (
  SELECT doc_id,
         round(0.4 * least(length(text) / 500.0, 1.0)
             + 0.3 * (1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text))
             + 0.3 * least(len(list_filter({{TOKS}}, x -> list_contains({{EN}}, x))) * 1.0
                           / len({{TOKS}}) * 5.0, 1.0), 10) AS quality
  FROM documents
),
lab AS (
  SELECT d.doc_id, coalesce(labels.label, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels ON labels.node = d.doc_id
)
SELECT lab.doc_id, lab.cluster_id, q.quality,
       (row_number() OVER (PARTITION BY lab.cluster_id
                           ORDER BY q.quality DESC, lab.doc_id) = 1) AS is_canonical
FROM lab JOIN q ON q.doc_id = lab.doc_id
"""


@register("dd13_cluster_canonical", None)  # finalized below (needs _EN/_DUCK_TOKS)
def dd13_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection — the curation keep-rule composed
    end-to-end: MinHash-LSH candidate pairs -> connected components
    (duplicate clusters) -> keep the HIGHEST-QUALITY member of each
    cluster (tie -> min doc_id), not merely the min id. dd6 answers
    "which docs are together"; this answers the question a training-set
    builder actually asks: "which copy do we train on". Singleton docs
    (no near-dup) are their own cluster and always canonical.

    Plan shape: the pair graph + CC is dd6's (per-round join + min-agg
    to a fixed point, graph-sized partitioning), quality is a pure
    projection fused into the scan, the final pick is one window over
    cluster_id. The oracle reaches the same fixed point by recursive-CTE
    transitive closure and replays the quality formula exactly, so
    cluster membership AND the argmax-quality pick are hash-checked."""
    from .llm import quality_score
    from .llm.dedup import connected_components, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size=100, materialize=True
    ).localCheckpoint(eager=True)
    labels = connected_components(pairs).withColumnRenamed("node", "doc_id")
    lab = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("label", F.col("doc_id")).alias("cluster_id")
        )
    )
    q = docs.select("doc_id", quality_score(F.col("text")).alias("quality"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        lab.join(q, "doc_id")
        .select(
            "doc_id",
            "cluster_id",
            "quality",
            (F.row_number().over(w) == 1).alias("is_canonical"),
        )
    )


REGISTRY["dd13_cluster_canonical"].sql = _DD13_SQL.replace(
    "{TOKS}", _DUCK_TOKS
).replace("{EN}", _EN)


@register(
    "llm_curation_pipeline",
    f"""
    WITH RECURSIVE {_minhash_ctes(max_bucket_size=100)},
    scored AS (
      SELECT doc_id, text, lang,
             round(0.4 * least(length(text) / 500.0, 1.0)
                 + 0.3 * (1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text))
                 + 0.3 * least(len(list_filter({_DUCK_TOKS}, x -> list_contains({_EN}, x))) * 1.0
                               / len({_DUCK_TOKS}) * 5.0, 1.0), 10) AS quality
      FROM documents
    ),
    deduped AS (
      SELECT md5(text) AS content_hash, min(doc_id) AS keep_id
      FROM documents GROUP BY 1
    ),
    edges AS (SELECT a, b FROM mh_pairs UNION SELECT b, a FROM mh_pairs),
    reach AS (
      SELECT a AS node, a AS r FROM edges
      UNION
      SELECT e.a AS node, reach.r FROM edges e JOIN reach ON reach.node = e.b
    ),
    labels AS (SELECT node, min(r) AS label FROM reach GROUP BY node),
    neardup_drop AS (SELECT node FROM labels WHERE node <> label)
    SELECT s.doc_id, s.lang, s.quality,
           cast(length(s.text) AS BIGINT) AS n_chars
    FROM scored s
    JOIN deduped d ON d.keep_id = s.doc_id
    LEFT JOIN neardup_drop nd ON nd.node = s.doc_id
    WHERE nd.node IS NULL AND s.quality >= 0.5
    """,
)
def llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data curation — the full corpus spine:
    scan -> quality-score -> exact dedup (keep lowest id) -> NEAR-dup
    removal (MinHash-LSH pairs -> connected components -> keep each
    cluster's minimum) -> quality filter.

    Plan shape: the score is a pure projection; exact dedup is one
    shuffle on the 16-byte content hash; near-dup pairs shuffle on
    (band, bucket) with the degenerate-bucket cap; cluster labels are
    the fixed-point propagation (diameter-bounded rounds); both drop
    sets apply as semi/anti joins that broadcast at dimension size. The
    oracle reproduces the clusters with a recursive CTE — so the whole
    composite, including the iterative step's result, is hash-checked."""
    from .llm import exact_dedup_groups, quality_score
    from .llm.dedup import connected_components, minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "text", "lang", quality_score(F.col("text")).alias("quality")
    )
    keep = exact_dedup_groups(d, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    pairs = minhash_lsh_pairs(
        d, "text", "doc_id", max_bucket_size=100, materialize=True
    ).localCheckpoint(eager=True)
    neardup_drop = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("label"))
        .select(F.col("node").alias("doc_id"))
    )
    return (
        scored.join(keep, "doc_id", "left_semi")
        .join(neardup_drop, "doc_id", "left_anti")
        .filter(F.col("quality") >= 0.5)
        .select(
            "doc_id", "lang", "quality", F.length("text").cast("bigint").alias("n_chars")
        )
    )


PRICE_BANDS = [
    ("micro", 0.0, 50_000.0),
    ("small", 50_000.0, 100_000.0),
    ("medium", 100_000.0, 200_000.0),
    ("large", 200_000.0, 600_000.0),
]


@register(
    "x10_range_join",
    """
    SELECT b.band,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders o
    JOIN (VALUES ('micro', 0.0, 50000.0),
                 ('small', 50000.0, 100000.0),
                 ('medium', 100000.0, 200000.0),
                 ('large', 200000.0, 600000.0)) AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY 1
    """,
)
def x10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join engine extension: interval predicate decomposed
    into a binned equi-join (operators.range_join) instead of the
    nested-loop Catalyst would otherwise run — the scale path when the
    interval table outgrows broadcast."""
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    joined = range_join(o, bands, "o_totalprice", bin_width=50_000.0, broadcast_bands=True)
    return joined.groupBy("band").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "mm1_media_features",
    """
    SELECT doc_id AS media_id,
           cast(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS digest
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def mm1_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing as a first-class query: wrap each document's
    content as an opaque binary payload + typed metadata struct, then run
    the Arrow-batched mapInPandas feature extractor (llm/multimodal.py) —
    the exact pipeline shape image/audio decode takes at scale, with the
    codec step a deterministic hash-derived stand-in."""
    from .llm.multimodal import attach_binary_payload, extract_features

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    media = attach_binary_payload(d, "text", "doc_id")
    return extract_features(media).select("media_id", "byte_len", "digest")


@register(
    "mm2_frame_sample",
    """
    WITH f AS (
      SELECT doc_id AS media_id,
             cast(octet_length(encode(text)) AS BIGINT) AS blen, text
      FROM documents WHERE text IS NOT NULL
    ),
    idx AS (
      SELECT media_id, blen, text,
             unnest(generate_series(0, cast(floor((blen - 1) / 64) AS BIGINT))) AS frame_idx
      FROM f
    )
    SELECT media_id,
           cast(frame_idx AS BIGINT) AS frame_idx,
           cast(least(16, blen - frame_idx * 64) AS BIGINT) AS frame_len,
           md5(substr(text, cast(frame_idx * 64 + 1 AS BIGINT), 16)) AS frame_digest
    FROM idx
    """,
)
def mm2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling as a first-class query: every payload
    fans out to one row per sampled frame (stride 64, 16-byte window),
    fingerprinted inside the Arrow batch — payload bytes never shuffle.
    The oracle replays the byte slicing with substr/md5 (the fixture
    text is pure ASCII, so char offsets == byte offsets — asserted by
    octet_length in the oracle itself feeding the same windows)."""
    from .llm.multimodal import attach_binary_payload, sample_frames

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return sample_frames(attach_binary_payload(d, "text", "doc_id"))


@register(
    "mm3_frame_dedup",
    """
    WITH f AS (
      SELECT doc_id AS media_id,
             cast(octet_length(encode(text)) AS BIGINT) AS blen, text
      FROM documents WHERE text IS NOT NULL
    ),
    idx AS (
      SELECT media_id, blen, text,
             unnest(generate_series(0, cast(floor((blen - 1) / 64) AS BIGINT))) AS frame_idx
      FROM f
    ),
    frames AS (
      SELECT media_id,
             md5(substr(text, cast(frame_idx * 64 + 1 AS BIGINT), 16)) AS frame_digest
      FROM idx
    ),
    owner AS (
      SELECT frame_digest, min(media_id) AS first_owner
      FROM frames GROUP BY 1
    ),
    per AS (
      SELECT media_id, count(*) AS n_frames,
             sum(CASE WHEN first_owner < media_id THEN 1 ELSE 0 END) AS n_dup_frames
      FROM frames JOIN owner USING (frame_digest)
      GROUP BY 1
    )
    SELECT media_id, cast(n_frames AS BIGINT) AS n_frames,
           cast(n_dup_frames AS BIGINT) AS n_dup_frames,
           (2 * n_dup_frames < n_frames) AS is_kept
    FROM per
    """,
)
def mm3_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal curation path composed END-TO-END — the
    video-dedup shape: mm2's per-payload frame sampler (1-to-N Arrow
    fan-out, payload bytes never shuffle) -> dd1's exact-dedup rule on
    the frame digests (hash-groupBy keep-min-id: the frame's first
    owner) -> per-media retention (drop media whose sampled frames are
    mostly duplicates of EARLIER media). Proves the fan-out output is
    join-ready: the only data crossing the exchanges after sampling is
    (media_id, 16-byte digest) rows — one digest-keyed shuffle for the
    ownership agg and one media-keyed agg for retention, both
    100 TB-safe. is_kept uses the integer form 2*n_dup < n_frames (no
    float ratio to race across engines)."""
    from .llm.multimodal import attach_binary_payload, sample_frames

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    frames = sample_frames(attach_binary_payload(d, "text", "doc_id")).select(
        "media_id", "frame_digest"
    )
    owner = frames.groupBy("frame_digest").agg(
        F.min("media_id").alias("first_owner")
    )
    per = (
        frames.join(owner, "frame_digest")
        .groupBy("media_id")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.sum(
                F.when(F.col("first_owner") < F.col("media_id"), 1).otherwise(0)
            ).cast("bigint").alias("n_dup_frames"),
        )
    )
    return per.select(
        "media_id",
        "n_frames",
        "n_dup_frames",
        (2 * F.col("n_dup_frames") < F.col("n_frames")).alias("is_kept"),
    )


from .operators.sampling import (  # noqa: E402  (needs hash helpers above)
    hash_bucket_sql,
    stratified_hash_sample,
    train_val_test_split,
)

SAMPLE_RATES = {"en": 30, "zh": 100, "es": 80, "de": 80, "fr": 80}


@register(
    "x11_train_val_test_split",
    f"""
    WITH b AS (
      SELECT doc_id, {hash_bucket_sql('doc_id', 100)} AS bucket FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           cast(min(doc_id) AS BIGINT) AS min_id,
           cast(max(doc_id) AS BIGINT) AS max_id
    FROM b GROUP BY 1
    """,
)
def x11_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-percentile train/val/test split (80/10/10):
    membership depends only on md5(doc_id), so it is stable across runs,
    engines, partitionings, and appends — the split hygiene a 100 TB
    corpus needs (df.sample() reshuffles with partitioning). Pure
    projection; the aggregate below is only verification."""
    d = _t(spark, sf_dir, "documents")
    return (
        train_val_test_split(d, "doc_id", val_pct=10, test_pct=10)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_id"),
            F.max("doc_id").cast("bigint").alias("max_id"),
        )
    )


@register(
    "x12_stratified_sample",
    f"""
    WITH b AS (
      SELECT lang, {hash_bucket_sql('doc_id', 100)} AS bucket FROM documents
    )
    SELECT lang, count(*) AS n_sampled
    FROM b
    WHERE bucket < (CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 100
                              WHEN 'es' THEN 80 WHEN 'de' THEN 80
                              WHEN 'fr' THEN 80 ELSE 0 END)
    GROUP BY 1
    """,
)
def x12_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum (per-language) downsampling — the class
    rebalance step of corpus curation (keep all rare languages, thin the
    dominant one). Rate lookup compiles to a CASE chain: map-only scan,
    no join, no shuffle beyond the verification aggregate."""
    d = _t(spark, sf_dir, "documents")
    return (
        stratified_hash_sample(d, "doc_id", SAMPLE_RATES, strata_col="lang")
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )


@register(
    "x13_json_extract",
    """
    SELECT event_type,
           count(*) AS n_events,
           cast(sum(cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           cast(min(cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
           cast(max(cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY 1
    """,
)
def x13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extension: pull a typed field out of a JSON props
    column and aggregate — get_json_object is JVM-side (Jackson), so the
    parse rides inside whole-stage codegen; no Python, no UDF. try_cast
    keeps malformed payloads NULL under ANSI instead of failing tasks."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


@register(
    "x14_exact_percentile",
    """
    SELECT o_orderpriority,
           quantile_cont(cast(o_totalprice AS DOUBLE), 0.25) AS p25,
           quantile_cont(cast(o_totalprice AS DOUBLE), 0.50) AS p50,
           quantile_cont(cast(o_totalprice AS DOUBLE), 0.90) AS p90
    FROM orders
    GROUP BY 1
    """,
)
def x14_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (not sketch) per-group quantiles — complements the
    approx_percentile sketch in x6_approx_stats. Exact quantiles need a
    per-group sort; at 100 TB prefer x6's mergeable KLL-style sketch and
    reserve this for grouped slices that fit a task's spill budget. Both
    engines use the (n-1)*p linear-interpolation definition, so values
    agree bit-for-bit with no rounding."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.25).alias("p25"),
        F.percentile("o_totalprice", 0.50).alias("p50"),
        F.percentile("o_totalprice", 0.90).alias("p90"),
    )


@register(
    "x15_sessionize",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, cast(session_no AS BIGINT) AS session_no,
           count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY 1, 2
    """,
)
def x15_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: a session breaks after 30 idle
    minutes. lag marks boundaries, a running sum numbers sessions — both
    windows share one partitioning (user_id), so the whole query is a
    single shuffle + per-partition sort. The streaming twin is
    st2_session_window (session_window handles this natively)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Direct interval comparison (not unix_timestamp / cast-to-long):
    # works for both TIMESTAMP and TIMESTAMP_NTZ (Spark 4 reads tz-less
    # parquet as NTZ and forbids NTZ->BIGINT casts), keeps microsecond
    # precision (unix_timestamp truncates to whole seconds), and is
    # session-timezone-free — no DST edge even on non-UTC sessions.
    gap = F.col("ts") - F.lag("ts").over(w)
    marked = e.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > F.expr("INTERVAL '30' MINUTE")), 1).otherwise(0),
    )
    # event_id tiebreaks the running sum too: with ts-only ordering, equal
    # timestamps would make session numbering depend on an arbitrary tie
    # order (and Spark/DuckDB could legitimately disagree).
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("session_no", F.sum("new_sess").over(wsum))
    return sess.groupBy("user_id", F.col("session_no").cast("bigint").alias("session_no")).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "x16_table_diff",
    """
    WITH a AS (SELECT o_orderkey, md5(concat_ws('|', o_orderstatus,
                     cast(o_totalprice AS VARCHAR))) AS rh
               FROM orders),
         b AS (SELECT o_orderkey,
                      md5(concat_ws('|', CASE WHEN o_orderkey % 97 = 0
                                               THEN 'X' ELSE o_orderstatus END,
                     cast(o_totalprice AS VARCHAR))) AS rh
               FROM orders WHERE o_orderkey % 13 <> 0)
    SELECT CASE WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN a.rh <> b.rh THEN 'changed'
                ELSE 'unchanged' END AS diff_kind,
           count(*) AS n_rows
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    GROUP BY 1
    """,
)
def x16_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (I4 generalized from row counts to row
    values): full-outer join two table versions on the PK and compare a
    row-content hash — added / removed / changed / unchanged in one
    shuffle pair. The 'new' version here is a deterministic perturbation
    of orders (every 13th key dropped, every 97th status mutated) so the
    diff is reproducible and oracle-checkable."""
    o = _t(spark, sf_dir, "orders")

    def row_hash(status_col):
        return F.md5(
            F.concat_ws("|", status_col, F.col("o_totalprice").cast("string"))
        )

    a = o.select("o_orderkey", row_hash(F.col("o_orderstatus")).alias("rh"))
    b = o.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        row_hash(
            F.when(F.col("o_orderkey") % 97 == 0, "X").otherwise(F.col("o_orderstatus"))
        ).alias("rh"),
    )
    aa, bb = a.alias("a"), b.alias("b")
    kind = (
        F.when(F.col("b.o_orderkey").isNull(), "removed")
        .when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("a.rh") != F.col("b.rh"), "changed")
        .otherwise("unchanged")
    )
    return (
        aa.join(bb, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
        .select(kind.alias("diff_kind"))
        .groupBy("diff_kind")
        .agg(F.count("*").alias("n_rows"))
    )


@register(
    "i5_incremental_agg_merge",
    """
    SELECT o_orderpriority,
           count(*) AS n_rows,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def i5_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate (materialized-view) maintenance: per-key
    count/sum state built from the history partition, then a delta
    batch's partials folded in with plans.merge_agg_state. The oracle is
    a FULL recompute over all of orders — passing proves merged
    increments equal the from-scratch aggregate, the property that lets
    a 100 TB rollup update per batch instead of per full scan."""
    from .plans import merge_agg_state

    o = _t(spark, sf_dir, "orders")

    def partials(df):
        return df.groupBy("o_orderpriority").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("o_totalprice").alias("sum_price"),
        )

    history = partials(o.filter(F.col("o_orderkey") % 5 != 0))
    delta = partials(o.filter(F.col("o_orderkey") % 5 == 0))
    merged = merge_agg_state(
        history, delta, ["o_orderpriority"], count_col="n_rows", sum_cols=["sum_price"]
    )
    return merged.select(
        "o_orderpriority", "n_rows", F.round("sum_price", 2).alias("sum_price")
    )


@register(
    "a7_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def a7_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + grouped revenue + top-10.
    Catalyst pushes both date filters and the segment filter to the
    scans, joins smallest-first, and compiles the sort+limit to
    TakeOrderedAndProject (per-partition heap, no global sort) — the plan
    a 100 TB top-k needs."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "a8_local_supplier_volume",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def a8_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (two facts, four dims) with a
    same-nation theta condition. The dims broadcast; the only shuffles
    are the two fact-fact key exchanges and the final (25-key) agg —
    exactly the shuffle floor this query has at any scale."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
    )


# ===========================================================================
# Round-2 widening: hamming near-dup, batch ANN, skew-salted agg, BPE-ish
# tokens, sliding windows, SCD2 history, trailing range frames
# ===========================================================================


@register("dd7_simhash_hamming", None)  # filled by _finalize_dd7
def dd7_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (SimHash hamming ball): pairs whose 16-bit signatures differ
    by <= 1 bit. The scalable shape is neighborhood-explode: each doc
    probes its signature plus all 16 one-bit flips (17 rows) and joins
    probe == signature — an equi-join keyed on the signature, never an
    all-pairs XOR scan (the oracle does the dumb O(N^2) XOR, which is
    exactly what makes it a good independent check)."""
    from .llm.dedup import simhash16

    sig = simhash16(_t(spark, sf_dir, "documents"), "text", "doc_id")
    left = sig.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    probe_arr = F.array(
        F.col("sa"), *[F.col("sa").bitwiseXOR(F.lit(1 << b)) for b in range(16)]
    )
    probes = left.select("a", "sa", F.explode(probe_arr).alias("probe"))
    right = sig.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"))
    return (
        probes.join(right, probes.probe == right.sb)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
        .select(
            "a", "b", F.expr("cast(bit_count(sa ^ sb) AS INT)").alias("hamming")
        )
    )


def _finalize_dd7():
    from .llm.dedup import simhash16_sql

    REGISTRY["dd7_simhash_hamming"].sql = f"""
    WITH sims AS ({simhash16_sql('documents', 'text', 'doc_id')})
    SELECT a.doc_id AS a, b.doc_id AS b,
           cast(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
    """


_finalize_dd7()


@register(
    "ann3_batch_topk",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    q AS (SELECT vec_id AS q, i, v AS qv FROM comp WHERE vec_id < 3),
    dots AS (
      SELECT c.vec_id, q.q, sum(c.v * q.qv) AS dot
      FROM comp c JOIN q ON c.i = q.i GROUP BY 1, 2
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY 1),
    scored AS (
      SELECT d.q, d.vec_id, d.dot / (nv.norm * nq.norm) AS cos_raw
      FROM dots d
      JOIN norms nv ON nv.vec_id = d.vec_id
      JOIN norms nq ON nq.vec_id = d.q
      WHERE d.vec_id <> d.q
    )
    SELECT q, vec_id, round(cos_raw, 4) AS cosine,
           cast(row_number() OVER (PARTITION BY q ORDER BY cos_raw DESC, vec_id)
                AS BIGINT) AS rnk
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY q ORDER BY cos_raw DESC, vec_id) <= 3
    """,
)
def ann3_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search (batched): top-3 neighbors for EVERY query in a
    query set, in one plan — the production ANN shape (queries arrive in
    batches, not one at a time). The query-side components broadcast;
    scoring is one groupBy; ranking is a per-query window."""
    from .llm.similarity import _components

    emb = _t(spark, sf_dir, "embeddings")
    comp = _components(emb, "vec_id", "embedding")
    q = comp.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q"), "i", F.col("v").alias("qv")
    )
    dots = (
        comp.join(F.broadcast(q), "i")
        .groupBy("vec_id", "q")
        .agg(F.sum(F.col("v") * F.col("qv")).alias("dot"))
    )
    norms = comp.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm"))
    qnorms = norms.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q"), F.col("norm").alias("qnorm")
    )
    scored = (
        dots.join(norms, "vec_id")
        .join(F.broadcast(qnorms), "q")
        .filter(F.col("vec_id") != F.col("q"))
        .select("q", "vec_id", (F.col("dot") / (F.col("norm") * F.col("qnorm"))).alias("cos_raw"))
    )
    w = Window.partitionBy("q").orderBy(F.col("cos_raw").desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "q",
            "vec_id",
            F.round("cos_raw", 4).alias("cosine"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@register(
    "x17_salted_agg",
    """
    SELECT l_suppkey,
           round(sum(l_quantity), 2) AS sum_qty,
           count(l_orderkey) AS n_items
    FROM lineitem GROUP BY 1
    """,
)
def x17_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant aggregation: two-phase salted groupBy
    (operators.aggregate.salted_agg) — phase 1 on (key, salt) bounds any
    single reducer to ~1/16 of the hottest key, phase 2 re-combines.
    The oracle is the plain single-phase aggregate: passing proves the
    decomposition is exact for sum/count."""
    from .operators.aggregate import salted_agg

    l = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        l, ["l_suppkey"], {"l_quantity": "sum", "l_orderkey": "count"}
    )
    return out.select(
        "l_suppkey",
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        F.col("count_l_orderkey").alias("n_items"),
    )


_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "tx8_bpe_tokens",
    f"""
    SELECT doc_id,
           cast(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_tokens,
           cast(len(list_distinct(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT)
             AS n_unique
    FROM documents
    """,
)
def tx8_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counting: letter runs, digit runs, and
    single punctuation marks (the GPT-2 pre-tokenizer's coarse shape) via
    one regexp_extract_all — a pure projection, zero shuffles over a
    100 TB document scan."""
    d = _t(spark, sf_dir, "documents")
    toks = F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
    )


@register(
    "st3_sliding_window",
    """
    WITH expanded AS (
      SELECT make_timestamp(cast((floor((epoch(ts) - k * 900) / 3600) * 3600
                                  + k * 900) * 1000000 AS BIGINT)) AS window_start,
             value
      FROM events, (VALUES (0), (1), (2), (3)) AS o(k)
    )
    SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM expanded GROUP BY 1
    """,
)
def st3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 extension: SLIDING event-time windows (1 h window, 15 min
    slide) — each event lands in 4 overlapping windows; same F.window
    operator Structured Streaming uses. The oracle enumerates the 4
    containing windows per event explicitly."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "i6_scd2_history",
    """
    WITH v1 AS (SELECT o_orderkey, o_orderstatus AS status FROM orders),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END AS status
      FROM orders WHERE o_orderkey % 13 <> 0
    ),
    j AS (
      SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
             v1.status AS s1, v2.status AS s2
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT o_orderkey, s1 AS status, cast(1 AS BIGINT) AS valid_from,
           cast(2 AS BIGINT) AS valid_to, false AS is_current
    FROM j WHERE s1 IS NOT NULL AND (s2 IS NULL OR s1 <> s2)
    UNION ALL
    SELECT o_orderkey, s1, cast(1 AS BIGINT), cast(NULL AS BIGINT), true
    FROM j WHERE s1 IS NOT NULL AND s2 = s1
    UNION ALL
    SELECT o_orderkey, s2, cast(2 AS BIGINT), cast(NULL AS BIGINT), true
    FROM j WHERE s2 IS NOT NULL AND (s1 IS NULL OR s1 <> s2)
    """,
)
def i6_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: diff two snapshot
    versions (same deterministic perturbation as x16) into
    valid_from/valid_to/is_current rows — close changed/deleted rows,
    open changed/new ones. One full-outer join on the PK + three
    projection branches unioned; the union folds into one exchange
    because all branches share the join output."""
    o = _t(spark, sf_dir, "orders")
    v1 = o.select("o_orderkey", F.col("o_orderstatus").alias("s1"))
    v2 = (
        o.filter(F.col("o_orderkey") % 13 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 97 == 0, "X")
            .otherwise(F.col("o_orderstatus"))
            .alias("s2"),
        )
    )
    j = v1.join(v2, "o_orderkey", "full_outer")
    lit_from = lambda v: F.lit(v).cast("bigint")  # noqa: E731
    closed = j.filter(
        F.col("s1").isNotNull() & (F.col("s2").isNull() | (F.col("s1") != F.col("s2")))
    ).select(
        "o_orderkey",
        F.col("s1").alias("status"),
        lit_from(1).alias("valid_from"),
        lit_from(2).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    unchanged = j.filter(F.col("s2") == F.col("s1")).select(
        "o_orderkey",
        F.col("s1").alias("status"),
        lit_from(1).alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    opened = j.filter(
        F.col("s2").isNotNull() & (F.col("s1").isNull() | (F.col("s1") != F.col("s2")))
    ).select(
        "o_orderkey",
        F.col("s2").alias("status"),
        lit_from(2).alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(unchanged).unionByName(opened)


@register(
    "x20_trailing_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ), 2) AS trailing_30d
    FROM orders
    """,
)
def x20_trailing_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame moving aggregate: 30-day trailing spend per customer.
    A range frame (value-based bounds) is deterministic under timestamp
    ties — all peers join the frame — unlike a ROWS frame. Partitioned
    by customer: one keyed shuffle, per-partition sort, no global order."""
    o = _t(spark, sf_dir, "orders")
    # ANSI mode forbids timestamp->long casts; order on epoch DAYS
    # (o_orderdate is date-aligned, so day frames == the oracle's
    # INTERVAL 30 DAY timestamp frame)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.expr("unix_date(cast(o_orderdate AS DATE))"))
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d"),
    )


# ===========================================================================
# Training-data curation round 2: decontamination, TF-IDF, bigram-LM
# scoring, k-means IVF centroid training
# ===========================================================================


_SHINGLE4_SQL = None  # filled lazily by _decon_sql


def _decon_sql() -> str:
    from .llm.dedup import shingles_sql

    sh = shingles_sql("text", 4)
    return f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({sh})) AS s FROM documents
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 29 = 0),
    train AS (SELECT * FROM sh WHERE doc_id % 29 <> 0)
    SELECT t.doc_id, count(*) AS n_shared
    FROM train t JOIN bench USING (s)
    GROUP BY 1
    """


@register("dd8_decontaminate", None)  # sql attached below (needs import)
def dd8_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word 4-gram with a held-out benchmark set (here the deterministic
    doc_id % 29 == 0 slice standing in for an eval suite). The scale
    shape is the only one that works at 100 TB: the benchmark's distinct
    shingle set is small and BROADCAST, the corpus side is a map-side
    explode + broadcast-hash semi-match + one groupBy on doc_id — the
    100 TB corpus is never shuffled on shingle text. Mirrors the n-gram
    overlap decontamination procedure of GPT-3/PaLM appendix C."""
    from .llm.dedup import _spread, shingles

    d = _t(spark, sf_dir, "documents")
    sh = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("text"), 4))).alias("s")
    )
    bench = sh.filter(F.col("doc_id") % 29 == 0).select("s").distinct()
    train = sh.filter(F.col("doc_id") % 29 != 0)
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )


REGISTRY["dd8_decontaminate"].sql = _decon_sql()


_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT cast(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(n.n / dfq.df) AS raw
  FROM tf JOIN dfq USING (term) CROSS JOIN n
)
SELECT doc_id, term, round(raw, 4) AS tfidf,
       cast(row_number() OVER (PARTITION BY doc_id ORDER BY raw DESC, term)
            AS BIGINT) AS rnk
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY raw DESC, term) <= 3
"""


@register("tx9_tfidf_keywords", _TFIDF_SQL)
def tx9_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    tf x ln(N/df). Two aggregations (term frequency per doc, document
    frequency per term — both map-side-combinable) + a broadcast of the
    tiny corpus-size scalar + one per-doc window. The df table is
    vocabulary-sized, not corpus-sized, so the join back to tf
    broadcast-hashes at any corpus scale once AQE sees its stats."""
    from .llm.dedup import _spread
    from .llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    tok = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("n"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("raw"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("raw").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            F.round("raw", 4).alias("tfidf"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def _bigram_lm_sql() -> str:
    from .llm.dedup import shingles_sql

    bg = shingles_sql("text", 2)
    return f"""
    WITH inst AS (
      SELECT doc_id, unnest({bg}) AS bg FROM documents
    ),
    c12 AS (SELECT bg, count(*) AS c12 FROM inst GROUP BY 1),
    c1 AS (
      SELECT string_split(bg, ' ')[1] AS w1, sum(c12) AS c1
      FROM c12 GROUP BY 1
    )
    SELECT i.doc_id,
           round(avg(-ln(cast(c12.c12 AS DOUBLE) / c1.c1)), 4) AS avg_nll,
           count(*) AS n_bigrams
    FROM inst i
    JOIN c12 USING (bg)
    JOIN c1 ON string_split(i.bg, ' ')[1] = c1.w1
    GROUP BY 1
    """


@register("tx10_bigram_lm_score", None)  # sql attached below
def tx10_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring with a corpus bigram LM: each
    document's average negative log-likelihood -avg ln c(w1 w2)/c(w1 ·)
    under counts from the corpus itself (the cheap proxy for a
    perplexity filter a la CCNet/Gopher). Two count aggregations build
    the LM (bigram-vocabulary-sized, far smaller than the corpus); the
    instance table joins them back on the bigram string — a hash join
    keyed on vocabulary entries, then one groupBy(doc). Every bigram
    exists in its own LM so no smoothing term is needed; scores are
    deterministic and the DuckDB oracle replays the identical counts."""
    from .llm.dedup import _spread, shingles

    d = _t(spark, sf_dir, "documents")
    inst = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(shingles(F.col("text"), 2)).alias("bg")
    )
    c12 = inst.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = (
        c12.select(F.split(F.col("bg"), " ")[0].alias("w1"), "c12")
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    scored = (
        inst.join(c12, "bg")
        .withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(c1, "w1")
        .select(
            "doc_id",
            (-F.log(F.col("c12").cast("double") / F.col("c1"))).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("nll"), 4).alias("avg_nll"),
        F.count("*").alias("n_bigrams"),
    )


REGISTRY["tx10_bigram_lm_score"].sql = _bigram_lm_sql()


def _tx17_sql() -> str:
    from .llm.dedup import shingles_sql

    bg = shingles_sql("text", 2)
    return f"""
    WITH inst AS (
      SELECT doc_id, unnest({bg}) AS bg FROM documents
    ),
    c12 AS (SELECT bg, count(*) AS c12 FROM inst GROUP BY 1),
    c1 AS (
      SELECT string_split(bg, ' ')[1] AS w1, sum(c12) AS c1
      FROM c12 GROUP BY 1
    ),
    scored AS (
      SELECT i.doc_id,
             round(avg(-ln(cast(c12.c12 AS DOUBLE) / c1.c1)), 4) AS avg_nll
      FROM inst i
      JOIN c12 USING (bg)
      JOIN c1 ON string_split(i.bg, ' ')[1] = c1.w1
      GROUP BY 1
    ),
    ranked AS (
      SELECT doc_id, avg_nll,
             row_number() OVER (ORDER BY avg_nll, doc_id) AS rn,
             count(*) OVER () AS n
      FROM scored
    )
    SELECT doc_id, avg_nll,
           CASE WHEN rn <= ceil(n / 3.0) THEN 'head'
                WHEN rn <= ceil(2 * n / 3.0) THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """


@register("tx17_perplexity_buckets", None)  # sql attached below
def tx17_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): rank every document by its LM score (tx10's
    corpus bigram LM as the stand-in for the KenLM wiki model) and
    split the corpus into equal head/middle/tail terciles — head =
    lowest perplexity. CCNet trains on head+middle and drops or
    down-weights tail; the bucket column is the knob.

    Distributed shape: the LM scoring is tx10's plan (two
    vocabulary-sized count aggs + a hash join back); the doc-level
    score table is corpus-ROW-sized but tiny in bytes, checkpointed
    once, then the global tercile rank rides the partition-offset
    sequence engine — NOT a bare row_number()/ntile() over () — and the
    corpus count joins back as a 1-row broadcast. Scores are rounded to
    4 decimals BEFORE ranking on both sides so the rank (and thus every
    bucket boundary) is engine-stable: distinct rounded values differ
    by >= 1e-4, far above float noise, and exact ties break by doc_id."""
    from .llm.dedup import _spread, shingles
    from .operators.sequence import with_global_sequence

    d = _t(spark, sf_dir, "documents")
    inst = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(shingles(F.col("text"), 2)).alias("bg")
    )
    c12 = inst.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = (
        c12.select(F.split(F.col("bg"), " ")[0].alias("w1"), "c12")
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    scored = (
        inst.join(c12, "bg")
        .withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(-F.log(F.col("c12").cast("double") / F.col("c1"))), 4
            ).alias("avg_nll")
        )
        # the LM join is the expensive stage and its doc-level output
        # feeds BOTH the rank and the corpus count — pin it once
        .localCheckpoint(eager=True)
    )
    ranked = with_global_sequence(scored, ["avg_nll", "doc_id"], name="rn")
    n = scored.agg(F.count("*").alias("__n"))
    return ranked.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "avg_nll",
        F.when(F.col("rn") <= F.ceil(F.col("__n") / 3.0), "head")
        .when(F.col("rn") <= F.ceil(2 * F.col("__n") / 3.0), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


REGISTRY["tx17_perplexity_buckets"].sql = _tx17_sql()


@register("tx19_incremental_lm_score", None)  # sql attached below
def tx19_incremental_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental bigram-LM maintenance: the LM behind the perplexity
    filter is two count tables, and counts are sum-monoids — so the
    state a growing corpus persists is the per-batch c12 partials
    (llm.lm, the same merge algebra as llm.datacard / i5), folded on
    arrival instead of rescanning history. Here the corpus arrives as
    three batches (doc_id % 3 stands in for arrival order), each
    batch's count state is built independently, the states are folded
    pairwise with plans.merge_agg_state, and every document is scored
    against the FOLDED counts. The oracle recomputes tx10 from scratch
    over the whole corpus — folded LM counts == full recompute, so the
    incremental path is exact, not approximate. Streaming twin:
    streaming.file_stream.stream_lm_state_available_now persists the
    same per-batch partials under batch_id=N with crash-redelivery
    idempotency. The bigram-instance table feeds all three batch
    states AND the scoring join, yet it is deliberately LAZY: the
    measured checkpoint trade (SCALE.md round-8 addendum) shows
    pinning this corpus-sized frame LOSES 26% at sf0.1 (3.33 vs
    2.64 s) and is a wash at 10x — re-running the explode is a cheap
    columnar scan, materializing N-bigram rows is not (the same
    inversion as the PQ-training checkpoint)."""
    from .llm.lm import (
        bigram_instances,
        lm_count_state,
        lm_score_docs,
        merge_lm_states,
    )

    d = _t(spark, sf_dir, "documents")
    inst = bigram_instances(d)
    # Three per-batch aggs over the same instance table look like 3x
    # the shuffle, but AQE's exchange reuse amortizes them; a hand-
    # fused (batch, bg)-keyed single pass measured SLOWER (3.42 vs
    # 2.64 s at sf0.1 — it forces a second re-key shuffle into the
    # merge and loses the reuse), the same lesson as x43's ranking
    # (SCALE.md ledger). A real stream never faces the choice: each
    # batch is counted alone on arrival.
    states = [
        lm_count_state(inst.filter(F.col("doc_id") % 3 == k)) for k in range(3)
    ]
    c12 = merge_lm_states(merge_lm_states(states[0], states[1]), states[2])
    return lm_score_docs(inst, c12)


REGISTRY["tx19_incremental_lm_score"].sql = _bigram_lm_sql()


@register("tx20_incremental_tfidf", None)  # sql attached below (= tx9's)
def tx20_incremental_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental TF-IDF vocabulary state: tx9's IDF side needs only
    the per-term document frequency and the corpus size — both
    sum-monoids over a partition of the corpus into arrival batches
    (each document lives in exactly one batch, so per-batch df partials
    sum to the global df). The corpus arrives as three batches
    (doc_id % 3); each batch contributes its (term, df) partial and its
    doc count, the states fold via plans.merge_agg_state, and every
    document's top-3 keywords are scored against the FOLDED df table
    and count. The oracle recomputes tx9 from scratch — folded
    vocabulary state == full recompute, the third instance of the
    state-algebra pattern (datacard x41, LM counts tx19) and the one a
    keyword/search pipeline over a growing corpus actually persists:
    vocabulary-sized state, batch-sized arrival work, no history
    rescan. The tf side is batch-local by definition (a document's
    term counts never depend on other documents), so nothing else
    needs folding.

    Deliberately LAZY despite 4 consumers of the token explode — the
    checkpoint trade was measured three ways (SCALE.md round-8
    addendum): pinning the token-instance table is a wash at both
    scales; pinning the post-agg tf table wins 40% at sf0.1 but LOSES
    17% at 10x (1.27 vs 2.11 s, then 3.55 vs 3.03 s) — corpus-sized
    materializations grow linearly while the explode they save stays
    a near-free columnar scan, the same inversion as the PQ-training
    checkpoint. Lazy is the scale-safe default."""
    from .plans import merge_agg_state
    from .llm.dedup import _spread
    from .llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    tok = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # three filtered per-batch aggs, NOT a hand-fused (batch, term)
    # pass: exchange reuse amortizes the repeats and the fused form
    # measured a wash (2.05 vs 2.11 s) while tx19's equivalent lost
    # 30% — see the ReusedExchange ledger entry in SCALE.md
    batch_dfs = [
        tf.filter(F.col("doc_id") % 3 == k)
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
        for k in range(3)
    ]
    dfq = merge_agg_state(
        merge_agg_state(batch_dfs[0], batch_dfs[1], ["term"], count_col="df"),
        batch_dfs[2],
        ["term"],
        count_col="df",
    )
    # corpus size folds the same way: one count per batch, summed
    n = d.groupBy((F.col("doc_id") % 3).alias("__b")).agg(
        F.count("*").alias("__c")
    ).agg(F.sum("__c").cast("double").alias("n"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("raw"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("raw").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            F.round("raw", 4).alias("tfidf"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


REGISTRY["tx20_incremental_tfidf"].sql = _TFIDF_SQL


_TX18_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, cast(ceil(len(t) / 16.0) AS INT)),
           i -> array_to_string(list_slice(t, i * 16 + 1, i * 16 + 16), ' ')
         )) AS chunk
  FROM toks
),
s AS (
  SELECT doc_id, string_split_regex(trim(chunk), '\\s+') AS ct FROM chunks
),
pred AS (
  SELECT doc_id,
         CASE WHEN len(list_filter(ct, x -> list_contains({_EN}, x)))
                   >= len(list_filter(ct, x -> list_contains({_DE}, x)))
               AND len(list_filter(ct, x -> list_contains({_EN}, x)))
                   >= len(list_filter(ct, x -> list_contains({_ES}, x)))
              THEN 'en'
              WHEN len(list_filter(ct, x -> list_contains({_DE}, x)))
                   >= len(list_filter(ct, x -> list_contains({_ES}, x)))
              THEN 'de'
              ELSE 'es' END AS cl
  FROM s
),
counts AS (SELECT doc_id, cl, count(*) AS c FROM pred GROUP BY 1, 2),
maj AS (
  SELECT doc_id, cl AS major_lang, c FROM counts
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, cl) = 1
),
tot AS (SELECT doc_id, sum(c) AS n_chunks FROM counts GROUP BY 1)
SELECT t.doc_id, m.major_lang, cast(t.n_chunks AS BIGINT) AS n_chunks,
       round(m.c * 1.0 / t.n_chunks, 4) AS major_frac,
       (m.c * 1.0 / t.n_chunks < 0.8) AS is_mixed
FROM tot t JOIN maj m USING (doc_id)
"""


@register("tx18_lang_consistency", _TX18_SQL)
def tx18_lang_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language document detection — the curation gate that
    catches concatenation artifacts (a crawler glues an English page to
    a German footer; a doc-level language ID happily labels the blend):
    language-ID every 16-token chunk (tx3's stopword heuristic, dd10's
    chunking), take the majority language per document, and flag docs
    whose majority covers <80% of chunks as mixed. Downstream either
    drops mixed docs or re-segments them.

    Distributed shape: chunking + per-chunk lang-ID is one explode +
    projection (no Python), then a (doc, lang) count agg — at most 3
    rows per doc — a doc-keyed majority window over those ≤3 rows, and
    a doc-keyed total join. All shuffles are doc-keyed; nothing scales
    with corpus size beyond the explode the chunker already pays."""
    from .llm.text import lang_id

    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nchunks = F.ceil(F.size(toks) / F.lit(16.0)).cast("int")
    chunked = d.select(
        "doc_id",
        F.explode(
            # let-bind the token array: referencing the split from the
            # lambda body would re-run the regex once per CHUNK
            let_(
                toks,
                lambda t: F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size(t) / F.lit(16.0)).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(t, i * 16 + 1, 16), " "
                    ),
                ),
            )
        ).alias("chunk"),
    )
    pred = chunked.select("doc_id", lang_id(F.col("chunk")).alias("cl"))
    counts = pred.groupBy("doc_id", "cl").agg(F.count("*").alias("c"))
    w = Window.partitionBy("doc_id").orderBy(F.col("c").desc(), "cl")
    maj = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cl").alias("major_lang"), "c")
    )
    tot = counts.groupBy("doc_id").agg(F.sum("c").alias("n_chunks"))
    return tot.join(maj, "doc_id").select(
        "doc_id",
        "major_lang",
        F.col("n_chunks").cast("bigint").alias("n_chunks"),
        F.round(F.col("c") / F.col("n_chunks"), 4).alias("major_frac"),
        (F.col("c") / F.col("n_chunks") < 0.8).alias("is_mixed"),
    )


def _kmeans_iter_sql(prev: str, it: int) -> str:
    """One Lloyd iteration as a CTE pair: assign each vector to the
    nearest centroid of ``prev``, then average members per (cell, i)."""
    return f"""
    assign{it} AS (
      SELECT comp.vec_id, {prev}.cell,
             sum((comp.v - {prev}.v) * (comp.v - {prev}.v)) AS dist,
             row_number() OVER (
               PARTITION BY comp.vec_id
               ORDER BY sum((comp.v - {prev}.v) * (comp.v - {prev}.v)), {prev}.cell
             ) AS rn
      FROM comp JOIN {prev} ON comp.i = {prev}.i
      GROUP BY comp.vec_id, {prev}.cell
    ),
    cent{it} AS (
      SELECT a.cell, comp.i, avg(comp.v) AS v
      FROM assign{it} a JOIN comp ON comp.vec_id = a.vec_id
      WHERE a.rn = 1
      GROUP BY 1, 2
    )"""


_KMEANS_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
cent0 AS (
  SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4
),
{_kmeans_iter_sql('cent0', 1)},
{_kmeans_iter_sql('cent1', 2)},
{_kmeans_iter_sql('cent2', 3)},
members AS (
  SELECT cell, count(*) AS n_members FROM assign3 WHERE rn = 1 GROUP BY 1
),
norms AS (
  SELECT cell, round(sqrt(sum(v * v)), 4) AS centroid_norm
  FROM cent2 GROUP BY 1
)
SELECT members.cell, members.n_members, norms.centroid_norm
FROM members JOIN norms USING (cell)
"""


# ann11/ann14's oracles compose _kmeans_iter_sql (defined just above)
# with their serve chains — attached here because the helper does not
# exist yet at their registration sites
REGISTRY["ann11_ivfpq_from_index"].sql = _ann11_sql()
_KMEANS_CHAINS = (
    f"{_kmeans_iter_sql('cent0', 1)},\n"
    f"{_kmeans_iter_sql('cent1', 2)},\n"
    f"{_kmeans_iter_sql('cent2', 3)},"
)
REGISTRY["ann14_batch_ivf_serve"].sql = _ann14_sql().replace(
    "{KMEANS_CHAINS}", _KMEANS_CHAINS
)
REGISTRY["ann15_filtered_topk"].sql = _ann15_sql().replace(
    "{KMEANS_CHAINS}", _KMEANS_CHAINS
)
REGISTRY["ann17_filtered_recall"].sql = _ann17_sql().replace(
    "{KMEANS_CHAINS}", _KMEANS_CHAINS
)


@register("ann4_kmeans_train", _KMEANS_SQL)
def ann4_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF centroid TRAINING: two Lloyd's k-means iterations (k=4,
    deterministic init = vectors 0..3) expressed entirely as DataFrame
    ops — assignment is a component-join + argmin window, the update is
    a per-(cell, dim) average. No vector ever reaches the driver; each
    iteration is two keyed shuffles (vector-sized and k x d-sized).
    Output: per-cell member count and centroid L2 norm. Completes the
    IVF story: ann4 trains the cells ann2_ivf_topk probes. The DuckDB
    oracle replays both iterations as CTE chains — the argmin tie-break
    (distance, then cell) and the count/avg algebra are engine-exact.
    The Lloyd loop itself is :func:`llm.similarity.kmeans_fit` — the
    same trainer dd11_semantic_dedup clusters with."""
    from .llm.similarity import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign = kmeans_fit(
        emb, "vec_id", "embedding", k=4, iters=2, materialize=True
    )
    norms = cent.groupBy("cell").agg(
        F.round(F.sqrt(F.sum(F.col("v") * F.col("v"))), 4).alias("centroid_norm")
    )
    return (
        assign.groupBy("cell")
        .agg(F.count("*").alias("n_members"))
        .join(norms, "cell")
        .select("cell", "n_members", "centroid_norm")
    )


_SEMDEDUP_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
cent0 AS (
  SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4
),
{_kmeans_iter_sql('cent0', 1)},
{_kmeans_iter_sql('cent1', 2)},
{_kmeans_iter_sql('cent2', 3)},
asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
{{CELL_CAP}},
norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
cand AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM capped x JOIN capped y ON x.cell = y.cell AND x.vec_id < y.vec_id
),
dots AS (
  SELECT c.a, c.b, sum(ca.v * cb.v) AS dot
  FROM cand c
  JOIN comp ca ON ca.vec_id = c.a
  JOIN comp cb ON cb.vec_id = c.b AND cb.i = ca.i
  GROUP BY 1, 2
),
dup AS (
  SELECT DISTINCT dots.b
  FROM dots
  JOIN norms na ON na.vec_id = dots.a
  JOIN norms nb ON nb.vec_id = dots.b
  WHERE na.norm > 0 AND nb.norm > 0
    AND dot / (na.norm * nb.norm) >= 0.3
)
SELECT asg.vec_id, asg.cell, (dup.b IS NULL) AS is_kept
FROM asg LEFT JOIN dup ON asg.vec_id = dup.b
"""


def _semdedup_sql() -> str:
    from .llm.caps import tukey_cap_sql_ctes

    return _SEMDEDUP_SQL.replace(
        "{CELL_CAP}",
        tukey_cap_sql_ctes("asg", "cell", floor=200, hard_max=5000).strip(),
    )


@register("dd11_semantic_dedup", None)  # finalized below (needs cap CTEs)
def dd11_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (semantic, SemDeDup-style): k-means cells + one BLAS gram
    matrix per cell; vectors with an in-cell neighbor above 0.3 cosine
    and a lower id are dropped (is_kept = false). Composes the two
    halves that already exist — :func:`llm.similarity.kmeans_assign`
    (= ann4's trainer, broadcast centroids) and the per-group gram
    kernel shared with dd5. ``max_cell_size="auto"`` turns the OOM
    guard on with a cap derived from the cell-size distribution (Tukey
    fence, floor 200, ceiling 5000; llm/caps.py): balanced cells always
    pass, a skew blow-out is excluded from the gram pass (its members
    stay in the output, un-scored). The oracle replays both Lloyd
    iterations as CTE chains, the derived cap, and the in-cell pair
    scoring exactly — assignment, candidate set, and keep/drop
    decisions are all hash-checked."""
    from .llm.similarity import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), k=4, iters=2, min_sim=0.3,
        max_cell_size="auto", materialize=True,
    )


REGISTRY["dd11_semantic_dedup"].sql = _semdedup_sql()


_KNN_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
cent0 AS (
  SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4
),
{_kmeans_iter_sql('cent0', 1)},
{_kmeans_iter_sql('cent1', 2)},
{_kmeans_iter_sql('cent2', 3)},
asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
cand AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id <> y.vec_id
),
dots AS (
  SELECT c.a, c.b, sum(ca.v * cb.v) AS dot
  FROM cand c
  JOIN comp ca ON ca.vec_id = c.a
  JOIN comp cb ON cb.vec_id = c.b AND cb.i = ca.i
  GROUP BY 1, 2
),
scored AS (
  SELECT dots.a, dots.b, round(dot / (na.norm * nb.norm), 4) AS cosine
  FROM dots
  JOIN norms na ON na.vec_id = dots.a
  JOIN norms nb ON nb.vec_id = dots.b
  WHERE na.norm > 0 AND nb.norm > 0
)
SELECT a AS vec_id, b AS neighbor, cosine,
       cast(row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) AS BIGINT) AS rnk
FROM scored
QUALIFY row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) <= 3
"""


@register("ann5_knn_graph", _KNN_SQL)
def ann5_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: the k-NN GRAPH — top-3 cosine neighbors for
    EVERY vector, restricted to its IVF cell (ann1/ann3 answer one
    query or a query set; this materializes the all-nodes graph that
    clustering, graph-based dedup, and diversity sampling consume).

    IVF-cell restriction is the scale contract: cells bound the
    per-task pairwise work exactly as in dd11, so the graph build is
    k-means assignment + one per-cell gram + a per-vector top-k window
    keyed on the vector id. Recall is cell-local (the IVF
    approximation); raise k-means k to shrink cells, or probe multiple
    cells for higher recall. Both directions of each in-cell pair are
    ranked, ties broken by neighbor id on the 4-dp rounded cosine in
    BOTH engines (ordering by the raw value would let sub-rounding
    noise pick different top-3 sets)."""
    from .llm.similarity import _gram_pair_fn, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    _, assign = kmeans_fit(
        emb, "vec_id", "embedding", k=4, iters=2, materialize=True
    )
    vecs = assign.join(emb.select("vec_id", "embedding"), "vec_id").select(
        F.col("vec_id").alias("__id"), "cell", F.col("embedding").alias("__v")
    )
    # min_sim below any cosine: keep every in-cell pair (a < b), then
    # mirror to both directions for the per-vector ranking
    pairs = vecs.groupBy("cell").applyInPandas(
        _gram_pair_fn(-1.01), schema="a bigint, b bigint, cosine double"
    )
    both = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"), "cosine")
    )
    w = Window.partitionBy("a").orderBy(F.col("cosine").desc(), "b")
    return (
        both.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("a").alias("vec_id"),
            F.col("b").alias("neighbor"),
            "cosine",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_PACK_SQL = """
WITH counted AS (
  SELECT doc_id, source,
         cast(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, source, n_tokens,
         cast(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS BIGINT) AS "offset"
  FROM counted
)
SELECT doc_id, source, n_tokens, "offset",
       cast(floor("offset" / 256) AS BIGINT) AS pack_id
FROM packed
"""


@register("x18_sequence_packing", _PACK_SQL)
def x18_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (concat-and-chunk): documents are
    concatenated in deterministic (source, doc_id) order and cut every
    256 tokens; each doc's pack_id is the chunk its first token lands
    in. The running token offset is ONE window per source shard — at
    100 TB the corpus packs shard-parallel (source, or any hash bucket,
    as the partition key), never through a global order. This is the
    sequence-packing step every LLM pretraining pipeline runs between
    curation and tokenization."""
    from .llm.text import token_count

    d = _t(spark, sf_dir, "documents")
    counted = d.select("doc_id", "source", token_count("text").alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = counted.withColumn("offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        "offset",
        F.floor(F.col("offset") / 256).cast("bigint").alias("pack_id"),
    )


@register(
    "x34_length_buckets",
    """
    WITH counted AS (
      SELECT doc_id,
             cast(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    hist AS (SELECT n_tokens AS v, count(*) AS c FROM counted
             WHERE n_tokens IS NOT NULL GROUP BY 1),
    cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n FROM hist),
    qs AS (
      SELECT min(CASE WHEN cum >= ceil(n * 0.125) THEN v END) AS q0,
             min(CASE WHEN cum >= ceil(n * 0.25)  THEN v END) AS q1,
             min(CASE WHEN cum >= ceil(n * 0.375) THEN v END) AS q2,
             min(CASE WHEN cum >= ceil(n * 0.5)   THEN v END) AS q3,
             min(CASE WHEN cum >= ceil(n * 0.625) THEN v END) AS q4,
             min(CASE WHEN cum >= ceil(n * 0.75)  THEN v END) AS q5,
             min(CASE WHEN cum >= ceil(n * 0.875) THEN v END) AS q6
      FROM cum
    )
    SELECT doc_id, n_tokens,
           cast(1 + (n_tokens > q0)::int + (n_tokens > q1)::int
                  + (n_tokens > q2)::int + (n_tokens > q3)::int
                  + (n_tokens > q4)::int + (n_tokens > q5)::int
                  + (n_tokens > q6)::int AS BIGINT) AS bucket
    FROM counted, qs
    """,
)
def x34_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length bucketing — the batching-prep op that groups documents of
    similar token length so fixed-size training batches waste minimal
    padding (the dynamic-batching counterpart of x18's concat-packing).

    NOT ntile: a global ntile window is Exchange SinglePartition — the
    anti-pattern the sequence engine exists to avoid. Buckets come from
    the 7 discrete octile boundaries of the token-count distribution
    (llm/caps.discrete_quantiles — integer-exact from the histogram, so
    the oracle reproduces them bit-for-bit), broadcast as a 1-row
    scalar; assignment is then a pure map-side comparison. Equi-depth
    up to ties, every equal length lands in the same bucket (better for
    padding homogeneity than ntile's tie-splitting), and the plan stays
    fully parallel at any corpus size."""
    from .llm.caps import discrete_quantiles
    from .llm.text import token_count

    d = _t(spark, sf_dir, "documents")
    counted = d.select("doc_id", token_count("text").alias("n_tokens"))
    qs = discrete_quantiles(
        counted.select("n_tokens"), "n_tokens", [i / 8 for i in range(1, 8)]
    )
    bucket = F.lit(1)
    for i in range(7):
        bucket = bucket + (F.col("n_tokens") > F.col(f"__q{i}")).cast("int")
    return (
        counted.crossJoin(F.broadcast(qs))
        .select("doc_id", "n_tokens", bucket.cast("bigint").alias("bucket"))
    )


@register("x19_weighted_sample", None)  # sql attached below (hex helper)
def x19_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling: keep each doc with probability
    proportional to a quality weight (here length-based, capped at 1) by
    comparing an md5-derived uniform u in [0,1) against the weight.
    Pure projection — zero shuffles, membership independent of
    partitioning/append order (df.sample()'s per-partition seeding is
    not), reproducible across runs and engines. The weighted analogue of
    x11_train_val_test_split."""
    from .llm.dedup import _hexint

    d = _t(spark, sf_dir, "documents")
    u = _hexint(F.md5(F.concat_ws("|", F.lit("ws"), F.col("doc_id"))), 8) / F.lit(
        4294967296.0
    )
    w = F.least(F.col("n_chars") / 400.0, F.lit(1.0))
    return (
        d.select("doc_id", "lang", "n_chars", u.alias("u"), w.alias("w"))
        .filter(F.col("u") < F.col("w"))
        .select("doc_id", "lang", "n_chars", F.round("u", 6).alias("u"))
    )


def _finalize_x19():
    from .llm.dedup import _hexint_sql

    REGISTRY["x19_weighted_sample"].sql = f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             ({_hexint_sql("md5('ws' || '|' || cast(doc_id AS VARCHAR))", 8)}) / 4294967296.0 AS u,
             least(n_chars / 400.0, 1.0) AS w
      FROM documents
    )
    SELECT doc_id, lang, n_chars, round(u, 6) AS u
    FROM scored WHERE u < w
    """


_finalize_x19()


def _dd9_sql() -> str:
    n = 8
    toks = "string_split_regex(trim(text), '\\s+')"
    # positional shingles: (pos 1-based, 8-token window)
    return f"""
    WITH pos_sh AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len({toks}) - {n - 1}, 0) + 1),
               i -> {{'i': i, 'g': array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')}}
             )) AS u
      FROM documents
    ),
    flat AS (SELECT doc_id, u.i AS pos, u.g AS g FROM pos_sh),
    capped AS (
      SELECT * FROM flat
      QUALIFY count(DISTINCT doc_id) OVER (PARTITION BY g) <= 10
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           cast(a.pos AS BIGINT) AS pos_a, cast(b.pos AS BIGINT) AS pos_b
    FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
    """


@register("dd9_repeated_spans", None)  # sql attached below
def dd9_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-span detection (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better", the ExactSubstr
    operator's distributed restatement): every position pair where two
    documents share a verbatim 8-token window — the input a surgical
    span-REMOVAL pass needs (unlike dd3, which only scores whole-doc
    overlap). Inverted-index join on the window text with a
    doc-frequency cap (>10 docs = boilerplate, excluded — same guard as
    dd3's posting lists). Suffix-array construction is the single-node
    recipe; the window-hash inverted index is the shuffle-native one."""
    from .llm.dedup import _spread, shingles

    d = _t(spark, sf_dir, "documents")
    sh = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.posexplode(shingles(F.col("text"), 8)).alias("pos0", "g")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    wdf = Window.partitionBy("g")
    capped = (
        sh.withColumn("__df", F.size(F.collect_set("doc_id").over(wdf)))
        .filter(F.col("__df") <= 10)
        .drop("__df")
    )
    a = capped.select(F.col("doc_id").alias("a"), F.col("pos").alias("pos_a"), "g")
    b = capped.select(F.col("doc_id").alias("b"), F.col("pos").alias("pos_b"), "g")
    return (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.col("pos_a").cast("bigint").alias("pos_a"),
            F.col("pos_b").cast("bigint").alias("pos_b"),
        )
    )


REGISTRY["dd9_repeated_spans"].sql = _dd9_sql()


_X21_SQL = f"""
WITH {_minhash_ctes()}
SELECT a AS new_id, b AS dup_of FROM mh_pairs WHERE a % 5 = 0 AND b % 5 <> 0
UNION ALL
SELECT b AS new_id, a AS dup_of FROM mh_pairs WHERE b % 5 = 0 AND a % 5 <> 0
"""


@register("x21_incremental_neardup", _X21_SQL)
def x21_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: dedupe a NEW batch (doc_id % 5 == 0 stands
    in for today's arrivals) against the EXISTING corpus without
    re-processing it. The existing side's band buckets are the persisted
    signature index (minhash_band_buckets — in production read back from
    the signature table, here recomputed); only the delta is shingled,
    and the join is new-buckets x stored-buckets keyed on (band, bh) —
    cost scales with the batch, not the corpus. The oracle derives the
    same pairs from the full self-join filtered to mixed membership,
    which is exactly the set a from-scratch run would find."""
    from .llm.dedup import minhash_band_buckets, neardup_against_index

    d = _t(spark, sf_dir, "documents")
    # One signature pass, sliced by membership: in production bb_old is
    # a parquet READ of the stored index (zero recompute) and only
    # new_docs is signatured; here both sides come from one corpus scan
    # rather than two independent shingle+minhash pipelines.
    bb_all = minhash_band_buckets(d, "text", "doc_id").localCheckpoint(
        eager=True
    )
    bb_new = bb_all.filter(F.col("doc_id") % 5 == 0)
    bb_old = bb_all.filter(F.col("doc_id") % 5 != 0)
    return neardup_against_index(bb_new, bb_old)


_X35_SQL = f"""
WITH {_minhash_ctes()}
SELECT CASE WHEN a % 3 > b % 3 THEN a ELSE b END AS new_id,
       CASE WHEN a % 3 > b % 3 THEN b ELSE a END AS dup_of
FROM mh_pairs WHERE a % 3 <> b % 3
"""


@register("x35_stream_neardup", _X35_SQL)
def x35_stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CORRECTNESS twin of the streaming incremental near-dup
    sink (streaming.file_stream.stream_neardup_available_now): the
    documents table arrives as three batches (doc_id % 3 stands in for
    arrival order); each batch's band buckets join against the index
    accumulated from every EARLIER batch via the same
    llm.dedup.neardup_against_index step the foreachBatch sink runs,
    then append to the index. Emits every (new_id, dup_of) pair the
    fold detects. The oracle derives the identical set from the full
    corpus-wide candidate pairs: a cross-batch pair (a, b) is detected
    exactly when its LATER member arrives — so mh_pairs restricted to
    mixed batches, oriented later-as-new_id, is the fold's output.
    Same-batch pairs are intentionally absent both sides (within-batch
    dedup is the batch dd2 pass's job)."""
    from .llm.dedup import minhash_band_buckets, neardup_against_index

    d = _t(spark, sf_dir, "documents")
    # One signature pass over the whole corpus, checkpointed, then
    # per-batch slices are cheap filters of it — the shingle+minhash
    # pipeline (the dominant cost) runs once, not once per batch. The
    # real stream gets the same economy for free: each batch is
    # signatured exactly once and persisted (neardup_batch_writer).
    bb_all = minhash_band_buckets(d, "text", "doc_id").localCheckpoint(
        eager=True
    )
    bb = [bb_all.filter(F.col("doc_id") % 3 == k) for k in range(3)]
    index = bb[0]
    outs = []
    for k in (1, 2):
        outs.append(neardup_against_index(bb[k], index))
        index = index.unionByName(bb[k])
    return outs[0].unionByName(outs[1])


_DD10_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, cast(ceil(len(t) / 16.0) AS INT)),
           i -> {'pos': i,
                 'chunk': array_to_string(list_slice(t, i * 16 + 1, i * 16 + 16), ' ')}
         )) AS u
  FROM toks
),
flat AS (SELECT doc_id, u.pos AS pos, u.chunk AS chunk FROM chunks),
ranked AS (
  SELECT doc_id,
         CASE WHEN row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) = 1
              THEN 1 ELSE 0 END AS kept
  FROM flat
)
SELECT doc_id, count(*) AS n_chunks,
       cast(sum(kept) AS BIGINT) AS n_kept,
       round(sum(kept) * 1.0 / count(*), 4) AS retained_frac
FROM ranked GROUP BY doc_id
"""


@register("dd10_chunk_dedup", _DD10_SQL)
def dd10_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup (paragraph dedup with synthetic 16-token
    chunks as the paragraph stand-in, since the corpus has no newlines):
    every verbatim-repeated chunk keeps only its first occurrence
    (min (doc_id, pos) wins — row_number over the chunk text), and each
    document reports how much of it survives. This is the removal-side
    complement of dd9's span *detection*: a pipeline drops rows with low
    retained_frac or reassembles kept chunks. One shuffle keyed on chunk
    text (16-token strings, so the key space is huge and well-spread);
    at 100 TB hash the chunk to a 128-bit key first so the exchange
    carries 16 bytes, not the text."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nchunks = F.ceil(F.size(toks) / F.lit(16.0)).cast("int")
    chunked = d.select(
        "doc_id",
        F.posexplode(
            # let-bind the token array: referencing the split from the
            # lambda body would re-run the regex once per CHUNK
            let_(
                toks,
                lambda t: F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size(t) / F.lit(16.0)).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(t, i * 16 + 1, 16), " "
                    ),
                ),
            )
        ).alias("pos", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    ranked = chunked.withColumn(
        "kept", F.when(F.row_number().over(w) == 1, 1).otherwise(0)
    )
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.round(F.sum("kept") / F.count("*"), 4).alias("retained_frac"),
    )


_X38_SQL = f"""
WITH counted AS (
  SELECT doc_id, cast(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
  WHERE len({_DUCK_TOKS}) IS NOT NULL
),
ranked AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
  FROM counted
)
SELECT cast((rn - 1) % 8 AS BIGINT) AS shard,
       count(*) AS n_docs,
       cast(sum(n_tokens) AS BIGINT) AS total_tokens
FROM ranked GROUP BY 1
"""


def lpt_shard_assignment(
    spark: SparkSession, sf_dir: str, n_shards: int = 8
) -> DataFrame:
    """(doc_id, n_tokens, shard): longest-processing-time round-robin
    shard assignment — rank documents by token count descending (global
    rank via the partition-offset sequence engine, no single-partition
    window) and deal rank k to shard (k-1) mod n_shards. Round-robin
    over a descending sequence telescopes: any two shard totals differ
    by at most ONE maximum document's tokens (the invariant pinned in
    tests). Shared spine of x38 (the balance report) and x40 (the
    per-doc assignment a training job consumes).

    NULL texts (token_count = NULL) are excluded SYMMETRICALLY with the
    oracles (same convention as x18/x34/x37): without the filter the
    sequence engine's null-leading-key assert fails the Spark side
    while a SQL twin silently ranks NULLs."""
    from .operators.sequence import with_global_sequence

    from .llm.text import token_count

    d = _t(spark, sf_dir, "documents")
    # pinned once: the sequence engine consumes its input three times
    # (quantile sketch, bucket counts, ranking window), and re-running
    # this projection means re-reading the TEXT bytes each time; the
    # pinned frame is three integer columns per doc
    counted = (
        d.select("doc_id", token_count("text").alias("n_tokens"))
        .filter(F.col("n_tokens").isNotNull())
        .withColumn("neg_nt", -F.col("n_tokens"))
        .localCheckpoint(eager=True)
    )
    ranked = with_global_sequence(counted, ["neg_nt", "doc_id"], name="rn")
    return ranked.select(
        "doc_id",
        "n_tokens",
        F.pmod(F.col("rn") - 1, F.lit(n_shards)).cast("bigint").alias("shard"),
    )


@register("x38_token_sharding", _X38_SQL)
def x38_token_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced corpus sharding for data-parallel training: assign every
    document to one of 8 shards so per-shard token totals are nearly
    equal. Greedy bin-packing is inherently sequential; the scalable
    restatement is longest-processing-time round-robin (see
    :func:`lpt_shard_assignment`, the shared spine with x40), which
    bounds shard imbalance by one document's tokens. Output is 8 rows —
    the balance report."""
    return (
        lpt_shard_assignment(spark, sf_dir, 8)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


_X40_SQL = f"""
WITH counted AS (
  SELECT doc_id, cast(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
  WHERE len({_DUCK_TOKS}) IS NOT NULL
),
ranked AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
  FROM counted
)
SELECT doc_id, n_tokens, cast((rn - 1) % 8 AS BIGINT) AS shard
FROM ranked
"""


@register("x40_shard_assignment", _X40_SQL)
def x40_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shard assignment — the form a training job actually
    consumes (x38 is the balance REPORT over this frame): one row per
    document with its LPT round-robin shard. Downstream, the frame is
    written shard-bucketed (Warehouse.write_bucketed on ``shard``, see
    test_sampling.py::test_shard_assignment_materialized_balance) so
    each data-parallel reader opens only its own files — the layout is
    part of the operator, not an afterthought. Same distributed shape
    as x38: the global rank rides the sequence engine, so no
    single-partition window at any corpus size."""
    return lpt_shard_assignment(spark, sf_dir, 8)


def _x43_sql() -> str:
    from .llm.dedup import _h32_sql

    h = _h32_sql("md5(cast(doc_id AS VARCHAR) || '|seed9')")
    return f"""
    WITH counted AS (
      SELECT doc_id, cast(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
             {_DUCK_QUALITY} AS q
      FROM documents
      WHERE len({_DUCK_TOKS}) IS NOT NULL
    ),
    sharded AS (
      SELECT doc_id, q,
             cast((row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1) % 8
                  AS BIGINT) AS shard,
             count(*) OVER () AS n
      FROM counted
    ),
    qr AS (
      SELECT doc_id, shard, n,
             row_number() OVER (ORDER BY q DESC, doc_id) AS qrn
      FROM sharded
    ),
    phased AS (
      SELECT doc_id, shard,
             CASE WHEN qrn <= ceil(n / 3.0) THEN 1
                  WHEN qrn <= ceil(2 * n / 3.0) THEN 2
                  ELSE 3 END AS phase
      FROM qr
    ),
    keyed AS (
      SELECT doc_id, shard, phase,
             cast(phase AS BIGINT) * 4294967296 + {h} AS k
      FROM phased
    )
    SELECT doc_id, shard, cast(phase AS BIGINT) AS phase,
           cast(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS BIGINT) AS position
    FROM keyed
    """


@register("x43_sharded_curriculum", None)  # sql attached below
def x43_sharded_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharding x curriculum COMPOSED — what a data-parallel loader
    actually consumes: every document gets its LPT token-balanced shard
    (x40's rule) AND a dense curriculum position WITHIN that shard
    (x42's rule: quality-tercile phase, then seeded-hash shuffle inside
    each phase), so each of the 8 readers streams its own file in
    position order and sees easy-to-hard locally while the shard totals
    stay token-balanced globally. Invariants pinned in
    test_sampling.py: positions are dense 1..n_s within each shard, and
    phases are non-decreasing along every shard's position order.

    Scale shape: one pinned base projection (text bytes read ONCE for
    both token count and quality score), three passes of the
    partition-offset sequence engine (token rank -> shard, quality rank
    -> phase, packed-key rank -> position) — no single-partition window
    anywhere. The final order key packs shard * 2^36 + phase * 2^32 +
    hash32 so the leading key stays spread (same trick as x42; a bare
    8-value shard key would collapse the engine's buckets to 8 tasks);
    per-shard positions then subtract the shard's global-rank base — an
    8-row broadcast join, which is also how the output lands
    shard-bucketed (write_bucketed on shard, x40's layout)."""
    from .llm.dedup import _h32
    from .llm.text import quality_score, token_count
    from .operators.sequence import with_global_sequence

    d = _t(spark, sf_dir, "documents")
    base = (
        d.select(
            "doc_id",
            token_count("text").alias("n_tokens"),
            quality_score(F.col("text")).alias("q"),
        )
        .filter(F.col("n_tokens").isNotNull())
        .withColumn("neg_nt", -F.col("n_tokens"))
        .withColumn("neg_q", -F.col("q"))
        .localCheckpoint(eager=True)
    )
    shards = with_global_sequence(base, ["neg_nt", "doc_id"], name="rn").select(
        "doc_id", F.pmod(F.col("rn") - 1, F.lit(8)).cast("bigint").alias("shard")
    )
    qr = with_global_sequence(base, ["neg_q", "doc_id"], name="qrn")
    n = base.agg(F.count("*").alias("__n"))
    phased = qr.crossJoin(F.broadcast(n)).select(
        "doc_id",
        F.when(F.col("qrn") <= F.ceil(F.col("__n") / 3.0), 1)
        .when(F.col("qrn") <= F.ceil(2 * F.col("__n") / 3.0), 2)
        .otherwise(3)
        .cast("bigint")
        .alias("phase"),
    )
    keyed = (
        shards.join(phased, "doc_id")
        .select(
            "doc_id",
            "shard",
            "phase",
            (
                F.col("shard") * F.lit(68719476736).cast("bigint")
                + F.col("phase") * F.lit(4294967296).cast("bigint")
                + _h32(
                    F.md5(
                        F.concat(F.col("doc_id").cast("string"), F.lit("|seed9"))
                    )
                )
            ).alias("k"),
        )
        .localCheckpoint(eager=True)
    )
    # The ranking feeds two consumers (8-row shard-base agg + output
    # join). Measured round 8: this is NOT double work — AQE reuses the
    # ranking's exchange across consumers (1.76 s at sf0.1), and both
    # "de-duplication" rewrites lost: localCheckpoint on the ranked
    # frame 2.15 s (materialization costs more than the reused window),
    # literal offset-map from 8-row counts 2.53 s (construction-time
    # collect barrier + broken exchange reuse). Kept the plain form;
    # see SCALE.md's checkpoint ledger.
    ranked = with_global_sequence(keyed, ["k", "doc_id"], name="grn")
    shard_base = ranked.groupBy("shard").agg(F.min("grn").alias("__base"))
    return ranked.join(F.broadcast(shard_base), "shard").select(
        "doc_id",
        "shard",
        "phase",
        (F.col("grn") - F.col("__base") + 1).cast("bigint").alias("position"),
    )


REGISTRY["x43_sharded_curriculum"].sql = _x43_sql()


_X37_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         cast(len({_DUCK_TOKS}) AS BIGINT) AS nt,
         {_DUCK_QUALITY} AS q,
         CASE WHEN row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1
              THEN 1 ELSE 0 END AS is_dup
  FROM documents
),
agg AS (
  SELECT lang, count(*) AS n_docs, cast(sum(nt) AS BIGINT) AS total_tokens,
         round(sum(is_dup) / count(*), 4) AS dup_rate,
         round(avg(q), 4) AS mean_quality
  FROM base GROUP BY lang
),
hist AS (SELECT lang, nt, count(*) AS c FROM base
         WHERE nt IS NOT NULL GROUP BY lang, nt),
cum AS (SELECT lang, nt, sum(c) OVER (PARTITION BY lang ORDER BY nt) AS cum,
               sum(c) OVER (PARTITION BY lang) AS n FROM hist),
med AS (SELECT lang, min(CASE WHEN cum >= ceil(0.5 * n) THEN nt END) AS median_tokens
        FROM cum GROUP BY lang)
SELECT lang, n_docs, total_tokens, median_tokens, dup_rate, mean_quality
FROM agg LEFT JOIN med USING (lang)
"""


@register("x37_corpus_datacard", _X37_SQL)
def x37_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus datacard — the per-language summary a dataset datasheet
    (Gebru et al., Datasheets for Datasets) reports and a curation run
    re-emits after every pipeline change: volume (docs, tokens), central
    length (discrete median — same type-1 definition as llm/caps, so
    the oracle matches bit-exactly), exact-duplicate rate, and mean
    quality score. Composes tx1/tx2/dd1/x34 primitives in ONE pass over
    the corpus: a projection computes tokens/quality/content-hash, one
    16-byte-hash shuffle ranks duplicates, then a lang-keyed agg plus a
    lang-keyed histogram window (distinct (lang, n_tokens) rows — tiny)
    produce the card. Nothing here scales super-linearly, and the
    output is num_languages rows."""
    from .llm import quality_score, token_count

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("__h").orderBy("doc_id")
    base = (
        d.select(
            "doc_id",
            "lang",
            F.md5("text").alias("__h"),
            token_count(F.col("text")).alias("nt"),
            quality_score(F.col("text")).alias("q"),
        )
        .withColumn("is_dup", (F.row_number().over(w) > 1).cast("int"))
    )
    agg = base.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
        F.round(F.sum("is_dup") / F.count("*"), 4).alias("dup_rate"),
        F.round(F.avg("q"), 4).alias("mean_quality"),
    )
    # NULL token counts excluded from the median histogram on BOTH
    # sides (engines disagree on null sort order in cumulative windows
    # — same guard as llm/caps.discrete_quantiles)
    hist = (
        base.filter(F.col("nt").isNotNull())
        .groupBy("lang", "nt")
        .agg(F.count("*").alias("c"))
    )
    w_cum = Window.partitionBy("lang").orderBy("nt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "lang",
        "nt",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(Window.partitionBy("lang")).alias("n"),
    )
    med = cum.groupBy("lang").agg(
        F.min(
            F.when(F.col("cum") >= F.ceil(F.col("n") * 0.5), F.col("nt"))
        ).alias("median_tokens")
    )
    # LEFT join: a language whose every document has NULL text still
    # appears in the datacard (median_tokens NULL) instead of silently
    # vanishing — the datacard's job is to report the corpus, including
    # its broken slices.
    return agg.join(med, "lang", "left").select(
        "lang", "n_docs", "total_tokens", "median_tokens", "dup_rate",
        "mean_quality",
    )


# x41's oracle IS x37's full-recompute SQL: the query must prove that
# folding a delta batch into persisted partial aggregates reproduces
# the from-scratch datacard bit-for-bit.
@register("x41_datacard_incremental", _X37_SQL)
def x41_datacard_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental datacard maintenance — x37 recomputes the corpus
    datacard from scratch; at 100 TB a curation pipeline instead FOLDS
    each ingest batch into persisted per-language partial aggregates.
    This query proves the fold algebra: the corpus is split into a
    "history" partition (doc_id % 5 != 0) and a "new batch" (% 5 == 0),
    partial states are built independently per side, merged with the
    same commutative-monoid algebra as i5 (plans.merge_agg_state for
    counts/sums), and the final card is derived ONLY from merged state
    — the oracle is the full recompute, so every number (including the
    histogram-derived median and the cross-batch duplicate rate) is
    hash-checked equal.

    The state algebra lives in :mod:`llm.datacard` (lang-level
    counts/sums, the (lang, token-count) histogram the type-1 median
    reads off — medians don't merge, histograms do — and the
    (lang, content-hash) dedup state whose (sum, min) merge keeps
    duplicate rates exact ACROSS batches); the streaming sink
    (streaming.file_stream.stream_datacard_available_now) folds the
    SAME functions per micro-batch, so this query is its batch
    CORRECTNESS twin exactly as x35 is for the near-dup sink.

    Scale shape: each state is aggregate-sized (languages, distinct
    lengths, distinct hashes), the merge touches |state| + |delta|
    rows, and the null-safe hash join that resolves global firsts is
    keyed on the 16-byte hash. Nothing rescans history."""
    from .llm.datacard import (
        datacard_base,
        datacard_from_states,
        dup_state,
        hist_state,
        lang_state,
        merge_dup_states,
        merge_hist_states,
        merge_lang_states,
    )

    # pinned once: six state builders (three per side) consume base,
    # and each would otherwise re-scan the TEXT bytes for the hash /
    # token-count / quality projections; the pinned frame is five
    # narrow columns per doc (the streaming sink pins its per-batch
    # base for the same reason)
    base = datacard_base(_t(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )
    history = base.filter(F.col("doc_id") % 5 != 0)
    delta = base.filter(F.col("doc_id") % 5 == 0)
    return datacard_from_states(
        merge_lang_states(lang_state(history), lang_state(delta)),
        merge_hist_states(hist_state(history), hist_state(delta)),
        merge_dup_states(dup_state(history), dup_state(delta)),
    )


_DD15_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, cast(ceil(len(t) / 16.0) AS INT)),
           i -> {'pos': i,
                 'chunk': array_to_string(list_slice(t, i * 16 + 1, i * 16 + 16), ' ')}
         )) AS u
  FROM toks
),
flat AS (SELECT doc_id, u.pos AS pos, u.chunk AS chunk FROM chunks),
ranked AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
  FROM flat
),
reasm AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM ranked WHERE rn = 1 GROUP BY doc_id
),
counts AS (SELECT doc_id, count(*) AS n_chunks FROM flat GROUP BY doc_id)
SELECT c.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       cast(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       cast(c.n_chunks - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
FROM counts c LEFT JOIN reasm r USING (doc_id)
"""


@register("dd15_line_dedup", _DD15_SQL)
def dd15_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup with REASSEMBLY — the CCNet/RefinedWeb corpus
    stage that strips boilerplate repeated across pages (nav bars,
    cookie banners, license headers) by deleting every non-first
    occurrence of a repeated line and stitching the survivors back into
    the document. Restated on 16-token windows ("lines"), since the
    synthetic corpus has no newlines — the same chunking as dd10, whose
    output is the retention REPORT where this emits the cleaned TEXT.

    Distributed shape: one shuffle keyed on chunk text for the global
    first-occurrence ranking (at 100 TB hash the chunk to 128 bits
    first so the exchange carries 16 bytes/row), one doc_id shuffle for
    reassembly; order restored by sorting each doc's surviving (pos,
    chunk) pairs inside the aggregate — no global sort, no window
    without partitioning. Docs whose every chunk was seen earlier
    collapse to an empty clean_text (kept, so the corpus row count is
    stable; a curation pipeline then drops empties by filter)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nchunks = F.ceil(F.size(toks) / F.lit(16.0)).cast("int")
    chunked = d.select(
        "doc_id",
        F.posexplode(
            # let-bind the token array: referencing the split from the
            # lambda body would re-run the regex once per CHUNK
            let_(
                toks,
                lambda t: F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size(t) / F.lit(16.0)).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(t, i * 16 + 1, 16), " "
                    ),
                ),
            )
        ).alias("pos", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    ranked = chunked.withColumn("rn", F.row_number().over(w))
    reasm = (
        ranked.filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "chunk"))
                    ),
                    lambda x: x["chunk"],
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").cast("bigint").alias("n_kept"),
        )
    )
    # n_chunks is a pure projection of the token count — no second
    # explode, no aggregation shuffle for the left side of the join
    counts = d.select("doc_id", nchunks.cast("bigint").alias("n_chunks"))
    return counts.join(reasm, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_dropped"),
    )


@register(
    "x36_dedup_rate_by_source",
    """
    WITH ranked AS (
      SELECT source,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT source, count(*) AS n_docs,
           cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
           round(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) / count(*), 4)
             AS dup_rate
    FROM ranked GROUP BY source
    """,
)
def x36_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation diagnostic: per-source duplicate rate — which ingest
    sources are redundant (mirror sites, scraped re-posts) and how much
    of each source's volume exact-dedup would remove. The decision
    input for per-source caps (x28) and crawl re-prioritization. One
    shuffle on the 16-byte content hash (bodies never shuffle), one on
    the small source key."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("__h").orderBy("doc_id")
    ranked = d.select(
        "source", "doc_id", F.md5("text").alias("__h")
    ).withColumn("is_dup", (F.row_number().over(w) > 1).cast("int"))
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("is_dup").cast("bigint").alias("n_dups"),
        F.round(F.sum("is_dup") / F.count("*"), 4).alias("dup_rate"),
    )


@register(
    "x24_salted_join",
    """
    SELECT o_orderpriority, count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def x24_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact-fact join: lineitem⨝orders through
    salted_join (8 salts) — the oracle is the PLAIN join, proving the
    salt decomposition is invisible to results. x17 covers salted
    aggregation; this covers the join case, where one giant key is the
    classic 100 TB straggler and even AQE's skew split can't divide a
    single key's build-side bucket."""
    from .operators.joins import salted_join

    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = salted_join(
        l, o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", salts=8
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


_X25_SQL = """
WITH snap AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         'I' AS op, cast(NULL AS INT) AS seq
  FROM orders WHERE o_orderkey % 13 <> 0
),
ch AS (
  SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice, 'U' AS op, 1 AS seq
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice, 'I', 2
  FROM orders WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice, 'D', 3
  FROM orders WHERE o_orderkey % 11 = 0
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY seq DESC NULLS LAST) AS rn
  FROM (SELECT * FROM snap UNION ALL SELECT * FROM ch)
)
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


@register("x25_cdc_apply", _X25_SQL)
def x25_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: an insert/update/delete change feed (op, seq) folded
    into a snapshot via plans.apply_cdc — the full MERGE semantics the
    reference's I/U-only upsert lacks, at identical cost (one PK-keyed
    shuffle; tombstones ride the same ranking window). Feed derivation
    is deterministic: %7 keys get an update (status→'X'), %13 keys are
    fresh inserts, %11 keys are deleted, commit order U < I < D."""
    from .plans import apply_cdc

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snapshot = o.filter(F.col("o_orderkey") % 13 != 0)
    upd = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        "o_totalprice",
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    ins = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit("I").alias("op"), F.lit(2).alias("seq"),
    )
    dels = o.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit("D").alias("op"), F.lit(3).alias("seq"),
    )
    changes = upd.unionByName(ins).unionByName(dels)
    return apply_cdc(snapshot, changes, "o_orderkey", "seq")


_X26_SQL = """
WITH blocked AS (
  SELECT c_custkey, c_name, substring(c_name, 1, 16) AS blk FROM customer
)
SELECT a.c_custkey, count(*) AS n_fuzzy_matches
FROM blocked a JOIN blocked b
  ON a.blk = b.blk AND a.c_custkey <> b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
GROUP BY a.c_custkey
"""


@register("x26_fuzzy_match", _X26_SQL)
def x26_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching (edit-distance join): customers whose names
    are within Levenshtein distance 1, found via the standard blocked
    self-join — block on a name prefix, compare only within blocks.
    All-pairs edit distance is O(N²·len²) and unshippable at 100 TB; the
    prefix block makes the join a hash equi-join whose cost is
    Σ(block²), controlled by block granularity (recall trades off at
    block boundaries — production stacks use multiple blocking passes,
    e.g. prefix + phonetic key, and union the candidates). The
    distance filter itself is JVM codegen (F.levenshtein), no UDF."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    blocked = c.withColumn("blk", F.substring("c_name", 1, 16))
    # spread the probe side across blocks: the dim-sized scan arrives in
    # one split, and with the build side broadcast the whole O(Σblock²)
    # levenshtein work would otherwise run as ONE task. The partition
    # count is explicit because AQE would coalesce the tiny-by-bytes
    # shuffle back to one partition — the bytes are small, the CPU isn't
    # (4.8s -> 0.9s at sf0.1).
    par = spark.sparkContext.defaultParallelism
    a = blocked.repartition(par, "blk").select(
        F.col("c_custkey"), F.col("c_name").alias("_na"), "blk"
    )
    b = blocked.select(
        F.col("c_custkey").alias("_kb"), F.col("c_name").alias("_nb"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(
            (F.col("c_custkey") != F.col("_kb"))
            & (F.levenshtein(F.col("_na"), F.col("_nb")) <= 1)
        )
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_fuzzy_matches"))
    )


_MIX_TARGETS = [("en", 0.4), ("de", 0.15), ("es", 0.15), ("fr", 0.15), ("zh", 0.15)]

_X27_SQL = f"""
WITH targets (lang, share) AS (
  VALUES {', '.join(f"('{l}', {s})" for l, s in _MIX_TARGETS)}
),
budget AS (SELECT cast(round(count(*) * 0.5) AS BIGINT) AS total FROM documents),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT r.doc_id, r.lang
FROM ranked r JOIN targets t ON r.lang = t.lang CROSS JOIN budget b
WHERE r.rk <= cast(round(t.share * b.total) AS BIGINT)
"""


@register("x27_corpus_mix", _X27_SQL)
def x27_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: downsample each language to a TARGET share of a
    fixed token/doc budget (half the corpus here) — the mixture step
    every pretraining pipeline runs between curation and packing.
    Selection is deterministic (per-language rank over md5(doc_id), keep
    the first share×budget): re-runs and appends pick the same winners,
    unlike df.sample's partition-seeded draw. The per-group rank is one
    shuffle on lang; at 100 TB swap the exact rank for the pure-
    projection hash-threshold form (keep where md5-fraction < rate,
    rate = target/actual from a first-pass count) — no rank, no sort,
    approximate counts within binomial noise."""
    d = _t(spark, sf_dir, "documents")
    total = d.count()
    budget = round(total * 0.5)
    targets = spark.createDataFrame(_MIX_TARGETS, "lang string, share double")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("doc_id", "lang").withColumn("rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(targets), "lang")
        .filter(F.col("rk") <= F.round(F.col("share") * budget).cast("bigint"))
        .select("doc_id", "lang")
    )


_TX11_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F]', ' ', 'g'),
                               '\s+', ' ', 'g'))) AS norm_hash,
       length(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F]', ' ', 'g'),
                                  '\s+', ' ', 'g'))) AS norm_len
FROM documents
"""


@register("tx11_normalize_text", _TX11_SQL)
def tx11_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization pass (the cleanup every corpus gets before
    hashing/shingling so dedup keys aren't split by whitespace noise):
    control chars → space, whitespace runs collapsed, ends trimmed.
    Pure projection — fused into the scan, zero shuffles at any scale;
    output is the normalized md5 + length, i.e. exactly the dedup key
    dd1 would consume downstream."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "[\\x00-\\x1F]", " "), "\\s+", " "
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


@register(
    "x28_source_cap",
    f"""
    WITH q AS (
      SELECT doc_id, source, {_DUCK_QUALITY} AS quality FROM documents
    ),
    r AS (
      SELECT doc_id, source, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rk
      FROM q
    )
    SELECT doc_id, source, quality, cast(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 15
    """,
)
def x28_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contribution capping: keep the best K documents from
    each source (quality desc, doc_id tiebreak) so no single crawl/dump
    dominates the training mix — the standard guard against one domain
    flooding the corpus.

    One shuffle, keyed on source. At 100 TB the win is that only rank
    state crosses the wire per group — but a mega-source still lands on
    one reducer; the scale mitigation is a cheap pre-filter (per input
    partition, keep the local top-K before the shuffle — K per map task
    bounds the exchange at tasks*K rows per source), which AQE's skew
    splitting cannot do for rank. K=15 caps every 25-doc source in the
    test fixture so the pruning path is actually exercised."""
    from .llm import quality_score

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id")
    return (
        d.select("doc_id", "source", quality_score(F.col("text")).alias("quality"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 15)
    )


_X44_SQL = """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
tot AS (SELECT sum(pow(n, 0.5)) AS sw, sum(n) AS total FROM c),
tgt AS (
  SELECT lang,
         least(n, cast(floor(0.5 * total * pow(n, 0.5) / sw) AS BIGINT)) AS take
  FROM c CROSS JOIN tot
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT r.doc_id, r.lang
FROM ranked r JOIN tgt USING (lang)
WHERE r.rk <= tgt.take
"""


@register("x44_temperature_mix", _X44_SQL)
def x44_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multinomial source weighting — the standard
    multilingual-pretraining rebalance (XLM-R's alpha-sampling, also
    used for domain mixing in LLaMA-class runs): sample language i with
    probability proportional to n_i^alpha. With alpha = 0.5 the size
    distribution is flattened — the dominant language is downsampled
    hardest while low-resource ones keep (or approach) full
    representation — which is exactly the knob x27's FIXED share table
    cannot express: there the shares are hand-set constants; here they
    are DERIVED from the observed sizes, so the mix adapts as the
    corpus grows. Take_i = min(n_i, floor(budget * n_i^alpha / sum_j
    n_j^alpha)) against a 50%-of-corpus budget; selection is the same
    deterministic md5-rank-within-language as x27, so re-runs and
    engines agree row-for-row. Plan: one lang-keyed count agg
    (5 rows), the 1-row weight total broadcast back, one lang-keyed
    rank window — the data-sized stage is a single shuffle on lang. At
    100 TB, swap the exact rank for the hash-threshold projection
    (keep where md5-fraction < take_i/n_i) and the rank shuffle
    disappears entirely; the rates come from the same 5-row agg."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    c = d.groupBy("lang").agg(F.count("*").alias("n"))
    tot = c.agg(
        F.sum(F.pow("n", F.lit(0.5))).alias("sw"),
        F.sum("n").alias("total"),
    )
    tgt = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.col("n"),
            F.floor(0.5 * F.col("total") * F.pow("n", F.lit(0.5)) / F.col("sw")),
        ).cast("bigint").alias("take"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.withColumn("rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(tgt), "lang")
        .filter(F.col("rk") <= F.col("take"))
        .select("doc_id", "lang")
    )


_X45_BUCKETS = 1_000_000

_X45_SQL = f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
tot AS (SELECT sum(pow(n, 0.5)) AS sw, sum(n) AS total FROM c),
tgt AS (
  SELECT lang, n,
         least(n, cast(floor(0.5 * total * pow(n, 0.5) / sw) AS BIGINT)) AS take
  FROM c CROSS JOIN tot
),
thr AS (
  SELECT lang,
         cast(floor({_X45_BUCKETS} * take * 1.0 / n) AS BIGINT) AS threshold
  FROM tgt
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr USING (lang)
WHERE {hash_bucket_sql('d.doc_id', _X45_BUCKETS)} < thr.threshold
"""


@register("x45_temperature_mix_threshold", _X45_SQL)
def x45_temperature_mix_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of x44: IDENTICAL alpha=0.5 temperature rates,
    but selection by hash PERCENTILE (keep where md5-bucket(doc_id) <
    rate) instead of exact per-language rank — the swap x27 and x44's
    docstrings promise, delivered as its own verified query. The rank
    window's corpus-sized shuffle on lang disappears entirely: the
    data-sized stage is scan -> broadcast-join the 5-row threshold
    table -> filter -> project, a map-only pipeline whose only
    exchanges carry the 5-row count/threshold frames. The cost is
    exactness: kept counts land within binomial noise of the target
    (|kept - rate*n| is O(sqrt(n)) — pinned in test_sampling.py)
    instead of hitting it exactly, the right trade when n_i is
    billions and the target itself derives from the data. Still fully
    deterministic: membership depends only on md5(doc_id), so re-runs,
    engines, and appends agree row-for-row (appends never reshuffle
    old members — unlike the rank form, where new docs shift
    everyone's rank), and the DuckDB oracle hash-matches exactly."""
    from .operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    c = d.groupBy("lang").agg(F.count("*").alias("n"))
    tot = c.agg(
        F.sum(F.pow("n", F.lit(0.5))).alias("sw"),
        F.sum("n").alias("total"),
    )
    thr = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.floor(
            _X45_BUCKETS
            * F.least(
                F.col("n"),
                F.floor(
                    0.5 * F.col("total") * F.pow("n", F.lit(0.5)) / F.col("sw")
                ),
            )
            / F.col("n")
        ).cast("bigint").alias("threshold"),
    )
    return (
        d.join(F.broadcast(thr), "lang")
        .filter(hash_bucket("doc_id", _X45_BUCKETS) < F.col("threshold"))
        .select("doc_id", "lang")
    )


@register(
    "tx12_token_budget",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             cast(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
             {_DUCK_QUALITY} AS quality
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang
                                 ORDER BY quality DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, n_tokens, cast(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= 8000
    """,
)
def tx12_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget corpus selection: within each language take
    documents best-first (quality desc, doc_id tiebreak) until the
    running token count exceeds the per-language budget — how a corpus
    is actually assembled against a token target rather than a doc
    count. Running sum over a (quality, doc_id) total order is
    deterministic on both engines; ROWS UNBOUNDED PRECEDING on each
    side. One shuffle keyed on lang; the sort is the same one the rank
    already needs, so the budget scan adds no extra exchange."""
    from .llm import quality_score, token_count

    d = _t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select(
            "doc_id",
            "lang",
            token_count(F.col("text")).alias("n_tokens"),
            quality_score(F.col("text")).alias("quality"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= 8000)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


@register(
    "tx13_quality_topfrac",
    f"""
    WITH q AS (
      SELECT doc_id, lang, {_DUCK_QUALITY} AS quality FROM documents
    ),
    r AS (
      SELECT doc_id, lang, quality,
             row_number() OVER (PARTITION BY lang
                                ORDER BY quality DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM q
    )
    SELECT doc_id, lang, quality FROM r WHERE rk * 2 <= n + 1
    """,
)
def tx13_quality_topfrac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-fraction quality filter: keep the best
    ceil(n/2) documents of each language. Rank-based rather than
    threshold-based on purpose — a quantile *value* cutoff compares
    floats at the boundary where two engines' interpolation can differ
    by 1 ulp, while rank over a (quality, doc_id) total order is exact
    on both. Same single lang-keyed shuffle as tx12; rank and group
    count come out of one window sort."""
    from .llm import quality_score

    d = _t(spark, sf_dir, "documents")
    wr = Window.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    wn = Window.partitionBy("lang")
    return (
        d.select("doc_id", "lang", quality_score(F.col("text")).alias("quality"))
        .withColumn("rk", F.row_number().over(wr))
        .withColumn("n", F.count("*").over(wn))
        .filter(F.col("rk") * 2 <= F.col("n") + 1)
        .select("doc_id", "lang", "quality")
    )


@register(
    "x29_doc_chunks",
    """
    WITH s AS (
      SELECT doc_id, text, unnest(generate_series(0, greatest(length(text) - 1, 0), 150)) AS start
      FROM documents
    )
    SELECT doc_id,
           cast(start AS BIGINT) AS start,
           substring(text, start + 1, 200) AS chunk,
           cast(length(substring(text, start + 1, 200)) AS BIGINT) AS chunk_len
    FROM s
    """,
)
def x29_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunking (200-char windows, stride 150)
    — the pre-embedding split every retrieval/embedding pipeline runs
    over long documents, keeping the (doc_id, start) lineage so chunks
    map back to source spans.

    sequence+explode is a narrow map-side fan-out: zero shuffles at any
    scale. The fan-out multiplies bytes ~len/stride×, so at 100 TB the
    input split size is the knob — shrink
    spark.sql.files.maxPartitionBytes so post-explode partitions still
    fit in memory (same note as the shingle fan-out in dd2/dd3)."""
    d = _t(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0), F.greatest(F.length("text") - 1, F.lit(0)), F.lit(150)
    )
    return (
        d.select("doc_id", "text", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            F.col("start").cast("bigint").alias("start"),
            F.expr("substring(text, start + 1, 200)").alias("chunk"),
            F.length(F.expr("substring(text, start + 1, 200)"))
            .cast("bigint")
            .alias("chunk_len"),
        )
    )


@register(
    "tx14_token_entropy",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ),
    cnt AS (
      SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
    )
    SELECT doc_id,
           cast(sum(c) AS BIGINT) AS n_tokens,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS token_entropy
    FROM cnt GROUP BY doc_id
    """,
)
def tx14_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the per-document token distribution — the
    gibberish/boilerplate signal: near-zero entropy is one token
    repeated (degenerate text), high entropy at low n is random noise.
    H = log2(n) - (Σ c·log2 c)/n, so one pass over (doc_id, tok) counts
    suffices — no per-token probability column, no second scan.

    Both groupBys key on doc_id (the second collapses the first's
    grouping), so Spark plans ONE exchange: partial map-side counts,
    then both final aggs colocated. Scales as a plain keyed agg."""
    d = _t(spark, sf_dir, "documents")
    from .llm import tokens

    cnt = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 6
        ).alias("token_entropy"),
    )


@register(
    "tx15_gopher_rules",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CASE WHEN len(toks) > 0
                  THEN round(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                             * 1.0 / len(toks), 10) END AS mean_word_len,
             CASE WHEN len(toks) > 0
                  THEN round(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                             * 1.0 / len(toks), 10) END AS alpha_word_frac,
             len(list_distinct(list_filter(toks, x -> list_contains({_EN}, x))))
               AS stop_types
      FROM t
    )
    SELECT doc_id, cast(n_words AS BIGINT) AS n_words, mean_word_len,
           alpha_word_frac, cast(stop_types AS BIGINT) AS stop_types,
           (n_words BETWEEN 10 AND 100000
            AND mean_word_len BETWEEN 2.0 AND 12.0
            AND alpha_word_frac >= 0.8
            AND stop_types >= 2) AS keep
    FROM m
    """,
)
def tx15_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: the Gopher-style rule-based quality filter (Rae et
    al. 2021, arXiv:2112.11446 §A1.1 — the public rule set MassiveText
    filters with): word-count bounds, mean-word-length bounds, fraction
    of words containing an alphabetic character, and a minimum count of
    distinct stopword types. Emits every rule input plus the composite
    ``keep`` so downstream corpus builders can re-threshold without
    recomputing. One pure projection fused into the scan — zero
    shuffles, codegen'd end-to-end; ratios rounded at 10 dp (past every
    terminating decimal the int/int divisions produce, so no half-even
    vs half-up tie can split the engines)."""
    from .llm import tokens
    from .llm.text import EN_STOPWORDS

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    mean_word_len = F.when(n > 0, F.round(total_len / n, 10))
    alpha_frac = F.when(
        n > 0,
        F.round(F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n, 10),
    )
    stop_types = F.size(F.array_intersect(F.array_distinct(toks), stoplist))
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        stop_types.cast("bigint").alias("stop_types"),
        (
            n.between(10, 100000)
            & mean_word_len.between(2.0, 12.0)
            & (alpha_frac >= 0.8)
            & (stop_types >= 2)
        ).alias("keep"),
    )


# ===========================================================================
# Round 9 — temporal correctness, retractable MV maintenance, mixture
# planning, importance resampling, payload block dedup, index deletes
# ===========================================================================


@register(
    "i7_pointintime_join",
    """
    WITH v1 AS (SELECT o_orderkey, o_orderstatus AS status FROM orders),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END AS status
      FROM orders WHERE o_orderkey % 13 <> 0
    ),
    j AS (
      SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
             v1.status AS s1, v2.status AS s2
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    ),
    hist AS (
      SELECT o_orderkey, s1 AS status, 1 AS valid_from, 2 AS valid_to
      FROM j WHERE s1 IS NOT NULL AND (s2 IS NULL OR s1 <> s2)
      UNION ALL
      SELECT o_orderkey, s1, 1, NULL FROM j WHERE s1 IS NOT NULL AND s2 = s1
      UNION ALL
      SELECT o_orderkey, s2, 2, NULL
      FROM j WHERE s2 IS NOT NULL AND (s1 IS NULL OR s1 <> s2)
    ),
    f AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_linenumber % 2 = 1 THEN 1 ELSE 2 END AS as_of_version
      FROM lineitem WHERE l_orderkey % 10 = 0
    )
    SELECT f.l_orderkey, f.l_linenumber,
           cast(f.as_of_version AS BIGINT) AS as_of_version, h.status
    FROM f JOIN hist h
      ON h.o_orderkey = f.l_orderkey
     AND h.valid_from <= f.as_of_version
     AND (h.valid_to IS NULL OR f.as_of_version < h.valid_to)
    """,
)
def i7_pointintime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS-OF) join of a fact feed against the SCD2
    history i6 builds — the temporal-correctness join a feature store
    runs so a fact dated at version 1 sees the dimension AS IT WAS at
    version 1, never the current row (joining today's dimension onto
    yesterday's fact is training-serving leakage, the silent killer of
    offline/online parity). Facts: every 10th order's lineitems,
    stamped with version 1 or 2 by line parity; dimension: i6's exact
    closed/unchanged/opened interval rows. Facts stamped v=2 on keys
    deleted in v2 correctly drop out (no dimension version was valid).
    Plan: Catalyst keys the join on the PK equality alone and runs the
    interval predicate as a join residual — one keyed shuffle, history
    depth irrelevant (plans.point_in_time_join). Reference analog: the
    staged-upsert snapshot that src/load.py:210-286 overwrites — this
    is the query shape that recovers what it was at any past point."""
    from .plans import point_in_time_join

    o = _t(spark, sf_dir, "orders")
    v1 = o.select("o_orderkey", F.col("o_orderstatus").alias("s1"))
    v2 = o.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, "X")
        .otherwise(F.col("o_orderstatus"))
        .alias("s2"),
    )
    j = v1.join(v2, "o_orderkey", "full_outer")
    changed = F.col("s1") != F.col("s2")
    hist = (
        j.filter(F.col("s1").isNotNull() & (F.col("s2").isNull() | changed))
        .select(
            "o_orderkey",
            F.col("s1").alias("status"),
            F.lit(1).alias("valid_from"),
            F.lit(2).alias("valid_to"),
        )
        .unionByName(
            j.filter(F.col("s2") == F.col("s1")).select(
                "o_orderkey",
                F.col("s1").alias("status"),
                F.lit(1).alias("valid_from"),
                F.lit(None).cast("int").alias("valid_to"),
            )
        )
        .unionByName(
            j.filter(
                F.col("s2").isNotNull() & (F.col("s1").isNull() | changed)
            ).select(
                "o_orderkey",
                F.col("s2").alias("status"),
                F.lit(2).alias("valid_from"),
                F.lit(None).cast("int").alias("valid_to"),
            )
        )
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    facts = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.when(F.col("l_linenumber") % 2 == 1, 1)
            .otherwise(2)
            .cast("bigint")
            .alias("as_of_version"),
        )
    )
    return point_in_time_join(
        facts, hist, "l_orderkey", "as_of_version"
    ).select("l_orderkey", "l_linenumber", "as_of_version", "status")


@register(
    "x46_retractable_mv",
    """
    WITH survivors AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 11 <> 0
    ),
    inserted AS (
      SELECT o_orderpriority, o_totalprice AS price
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    post AS (SELECT * FROM survivors UNION ALL SELECT * FROM inserted)
    SELECT o_orderpriority, count(*) AS n_rows,
           round(sum(price), 2) AS sum_val
    FROM post GROUP BY 1
    """,
)
def x46_retractable_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance under a FULL CDC feed — deletes
    and updates, not just i5's inserts: the stored per-priority
    count/sum state is folded with SIGNED partials from a
    before/after-image change feed (plans.cdc_signed_partials — the
    retraction algebra of Flink retract streams / DBSP Z-sets: I=+1/+new,
    D=-1/-old, U=0/new-old). The oracle recomputes the aggregate from
    scratch over the post-CDC table, so a green row proves fold ==
    full recompute under retraction — at 100 TB the difference between
    an O(|batch| + |state|) maintenance step and re-aggregating the
    whole fact history every batch. Feed (deterministic, x25's key
    algebra): %11 keys deleted, %7 (surviving) keys repriced +100,
    %13 keys re-inserted under fresh ids. Zero-count keys are dropped
    (the MV row no longer exists); the empty-to-zero path is pinned in
    tests/test_incremental.py."""
    from .plans import cdc_signed_partials, merge_agg_state

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    state = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("o_totalprice").alias("sum_val"),
    )
    dels = o.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderpriority",
        F.lit("D").alias("op"),
        F.col("o_totalprice").alias("old_val"),
        F.lit(None).cast("double").alias("new_val"),
    )
    upds = o.filter(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 11 != 0)
    ).select(
        "o_orderpriority",
        F.lit("U").alias("op"),
        F.col("o_totalprice").alias("old_val"),
        (F.col("o_totalprice") + 100.0).alias("new_val"),
    )
    ins = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderpriority",
        F.lit("I").alias("op"),
        F.lit(None).cast("double").alias("old_val"),
        F.col("o_totalprice").alias("new_val"),
    )
    feed = dels.unionByName(upds).unionByName(ins)
    delta = cdc_signed_partials(
        feed, ["o_orderpriority"], sum_col="sum_val"
    )
    merged = merge_agg_state(
        state, delta, ["o_orderpriority"], count_col="n_rows", sum_cols=["sum_val"]
    )
    return merged.filter(F.col("n_rows") > 0).select(
        "o_orderpriority", "n_rows", F.round("sum_val", 2).alias("sum_val")
    )


_X47_BUCKETS = 1_000_000


def _x47_sql() -> str:
    from .operators.sampling import hash_bucket_sql

    return f"""
    WITH c AS (
      SELECT lang, count(*) AS n_docs, sum(n_chars) AS chars
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT sum(sqrt(chars)) AS sw, sum(chars) AS total FROM c),
    plan AS (
      SELECT lang, n_docs, chars,
             least(4.0, 2.0 * total / (sw * sqrt(chars))) AS rpt
      FROM c CROSS JOIN tot
    ),
    p2 AS (
      SELECT lang, n_docs, chars, cast(floor(rpt) AS BIGINT) AS n_full,
             cast(floor((rpt - floor(rpt)) * {_X47_BUCKETS}) AS BIGINT) AS thr
      FROM plan
    ),
    fulls AS (
      SELECT lang, unnest(range(1, n_full + 1)) AS epoch,
             n_docs AS sel_docs, chars AS sel_chars
      FROM p2 WHERE n_full >= 1
    ),
    partial AS (
      SELECT d.lang, p2.n_full + 1 AS epoch, count(*) AS sel_docs,
             sum(d.n_chars) AS sel_chars
      FROM documents d JOIN p2 USING (lang)
      WHERE {hash_bucket_sql('d.doc_id', _X47_BUCKETS)} < p2.thr
      GROUP BY 1, 2
    )
    SELECT lang, cast(epoch AS BIGINT) AS epoch,
           cast(sel_docs AS BIGINT) AS n_docs,
           cast(sel_chars AS BIGINT) AS n_chars
    FROM (SELECT * FROM fulls UNION ALL SELECT * FROM partial)
    """


@register("x47_epoch_mixture", None)  # sql attached below
def x47_epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aware data-constrained mixture plan (Muennighoff et al.
    2023, arXiv:2305.16264: repeating data up to ~4 epochs is nearly as
    good as fresh data; x44's temperature weights say WHAT share each
    domain deserves, this says HOW to hit it when a domain is smaller
    than its share): per-language char-budget targets from alpha=0.5
    temperature weights against a 2x-corpus token budget, converted to
    a repeat factor capped at 4 epochs — emitted as the materialization
    plan a dataloader consumes: one row per (lang, epoch) with the doc
    and char counts that epoch contributes. Full epochs replay the
    whole domain; the final fractional epoch selects docs by the
    deterministic md5-bucket threshold (x45's zero-shuffle membership
    test), so re-runs and engines agree row-for-row. Plan shape: one
    lang-keyed agg (5 rows) + a 1-row total broadcast back + a
    5-row-table broadcast join onto the corpus for the partial epoch —
    the only corpus-sized stage is one scan; at 100 TB the epoch
    EXPANSION stays virtual (a loader reads the plan, not an exploded
    copy of the corpus)."""
    from .operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    c = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    tot = c.agg(
        F.sum(F.sqrt("chars")).alias("sw"), F.sum("chars").alias("total")
    )
    rpt = F.least(
        F.lit(4.0), 2.0 * F.col("total") / (F.col("sw") * F.sqrt("chars"))
    )
    plan = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "chars",
        F.floor(rpt).cast("bigint").alias("n_full"),
        F.floor((rpt - F.floor(rpt)) * _X47_BUCKETS).cast("bigint").alias("thr"),
    )
    fulls = (
        plan.filter(F.col("n_full") >= 1)
        .select(
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("n_full"))).alias("ep"),
            F.col("n_docs").alias("sel_docs"),
            F.col("chars").alias("sel_chars"),
        )
        .select(
            "lang",
            F.col("ep").cast("bigint").alias("epoch"),
            "sel_docs",
            "sel_chars",
        )
    )
    partial = (
        d.join(F.broadcast(plan), "lang")
        .filter(hash_bucket(F.col("doc_id"), _X47_BUCKETS) < F.col("thr"))
        .groupBy("lang", (F.col("n_full") + 1).cast("bigint").alias("epoch"))
        .agg(
            F.count("*").cast("bigint").alias("sel_docs"),
            F.sum("n_chars").alias("sel_chars"),
        )
    )
    return fulls.unionByName(partial).select(
        "lang",
        "epoch",
        F.col("sel_docs").alias("n_docs"),
        F.col("sel_chars").cast("bigint").alias("n_chars"),
    )


REGISTRY["x47_epoch_mixture"].sql = _x47_sql()


_TX21_BUCKETS = 4096


def _tx21_sql() -> str:
    from .llm.dedup import shingles_sql
    from .operators.sampling import hash_bucket_sql

    bg = shingles_sql("text", 2)
    bk = hash_bucket_sql("bg", _TX21_BUCKETS)
    return f"""
    WITH inst AS (
      SELECT doc_id, lang, unnest({bg}) AS bg FROM documents
    ),
    b AS (SELECT doc_id, lang, {bk} AS bk FROM inst),
    ct AS (SELECT bk, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY 1),
    nt AS (SELECT count(*) AS nt FROM b WHERE lang = 'en'),
    cr AS (SELECT bk, count(*) AS cr FROM b GROUP BY 1),
    nr AS (SELECT count(*) AS nr FROM b),
    lam AS (
      SELECT cr.bk, cr.cr,
             ln((coalesce(ct.ct, 0) + 1.0) / (nt.nt + {_TX21_BUCKETS}))
             - ln((cr.cr + 1.0) / (nr.nr + {_TX21_BUCKETS})) AS lam
      FROM cr LEFT JOIN ct USING (bk), nt, nr
    ),
    g AS (SELECT sum(cr * lam) / sum(cr) AS g FROM lam),
    doc AS (
      SELECT b.doc_id, count(*) AS n_bigrams, sum(lam.lam) AS s
      FROM b JOIN lam USING (bk)
      GROUP BY 1
    )
    SELECT doc_id, n_bigrams, round(s, 4) AS log_weight,
           round(s / n_bigrams, 4) > round(g.g, 4) AS keep
    FROM doc, g
    """


@register("tx21_dsir_importance", None)  # sql attached below
def tx21_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023, arXiv:2302.03169 —
    Data Selection via Importance Resampling): score every raw document
    by how target-like its HASHED n-gram distribution is. Features are
    word bigrams hashed into a FIXED 4096-bucket table (the trick that
    makes the method 100 TB-feasible: model state is 2 x 4096 counts no
    matter the corpus size); the target here is the English slice, the
    raw distribution is the whole corpus; each doc's log importance
    weight is sum over its bigrams of ln p_target(bucket) -
    ln p_raw(bucket) with add-1 smoothing, and ``keep`` marks docs
    whose PER-BIGRAM average beats the corpus per-instance average
    (both sides 4-dp rounded, so the boolean is engine-deterministic;
    an absolute >0 cutoff would select nothing when heavy smoothing
    shifts all weights negative, while this relative form keeps its
    discriminative power at any corpus size). Plan: ONE fused
    bucket-keyed count agg (4096-row output, raw + target counts in the
    same pass, totals derived as sums over it), the lambda table
    BROADCAST back onto the instance stream, one doc-keyed agg — the
    corpus explode has exactly two consumers and never shuffles on
    anything wider than doc_id. The oracle replays the same hashed
    counts exactly."""
    from .llm.dedup import _spread, shingles
    from .operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents")
    b = _spread(d.select("doc_id", "lang", "text")).select(
        "doc_id",
        "lang",
        F.explode(shingles(F.col("text"), 2)).alias("bg"),
    ).select(
        "doc_id", "lang", hash_bucket(F.col("bg"), _TX21_BUCKETS).alias("bk")
    )
    # ONE fused per-bucket pass: target (en) and raw counts come out of
    # the same 4096-row aggregate (count of a conditional vs count(*)),
    # and the totals nt/nr are SUMS over that table — so the bigram
    # explode has exactly two consumers (this agg + the doc join)
    # instead of five separate corpus-sized aggregations. Measured
    # 2.71 -> 2.40 s at sf0.1 and 9.36 -> 6.55 s at 10x (ratio 3.5x ->
    # 2.7x) with identical output (same algebra) — the residual cost
    # is the explode itself, which is the operator's data-sized floor.
    percell = b.groupBy("bk").agg(
        F.count("*").alias("cr"),
        F.count(F.when(F.col("lang") == "en", F.lit(1))).alias("ct"),
    )
    tot = percell.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    lam = (
        percell.crossJoin(F.broadcast(tot))
        .select(
            "bk",
            "cr",
            (
                F.log((F.col("ct") + 1.0) / (F.col("nt") + _TX21_BUCKETS))
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + _TX21_BUCKETS))
            ).alias("lam"),
        )
    )
    # corpus per-instance mean weight — the selection threshold ("more
    # target-like than the average raw bigram"); instance-weighted, so
    # it comes straight off the 4096-row lambda table, no second scan
    g = lam.agg((F.sum(F.col("cr") * F.col("lam")) / F.sum("cr")).alias("g"))
    doc = (
        b.join(F.broadcast(lam.select("bk", "lam")), "bk")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("lam").alias("s"))
    )
    return doc.crossJoin(F.broadcast(g)).select(
        "doc_id",
        "n_bigrams",
        F.round("s", 4).alias("log_weight"),
        (
            F.round(F.col("s") / F.col("n_bigrams"), 4) > F.round("g", 4)
        ).alias("keep"),
    )


REGISTRY["tx21_dsir_importance"].sql = _tx21_sql()


_MM4_BLOCK = 32

_MM4_SQL = f"""
WITH blocks AS (
  SELECT source, md5(substring(text, p, {_MM4_BLOCK})) AS h,
         length(substring(text, p, {_MM4_BLOCK})) AS blen
  FROM documents,
       LATERAL unnest(range(1, length(text) + 1, {_MM4_BLOCK})) AS t(p)
),
tot AS (
  SELECT source, count(*) AS n_blocks, sum(blen) AS total_bytes
  FROM blocks GROUP BY 1
),
u1 AS (SELECT source, h, max(blen) AS blen FROM blocks GROUP BY 1, 2),
uq AS (
  SELECT source, count(*) AS n_uniq, sum(blen) AS uniq_bytes
  FROM u1 GROUP BY 1
)
SELECT t.source, cast(n_blocks AS BIGINT) AS n_blocks,
       cast(n_uniq AS BIGINT) AS n_uniq,
       cast(total_bytes AS BIGINT) AS total_bytes,
       cast(uniq_bytes AS BIGINT) AS uniq_bytes,
       round(1.0 - uniq_bytes * 1.0 / total_bytes, 6) AS dedup_frac
FROM tot t JOIN uq USING (source)
"""


@register("mm4_block_dedup", _MM4_SQL)
def mm4_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed BLOCK dedup over opaque media payloads — the
    storage-layer question (what does a dedup store save us per
    source?) asked of the same binary column mm1-mm3 process: each
    payload is cut into fixed 32-byte blocks, every block is hashed,
    and per source the report compares total block bytes against the
    bytes one copy of each distinct block would occupy. Everything is
    JVM-side codegen — binary substring + md5 are native expressions,
    no Python worker touches the bytes (contrast mm1's Arrow path:
    feature extraction needs Python, block hashing does not). Plan:
    ONE scan -> generate (explode of the offset sequence) -> one
    (source, hash) agg whose partials carry count/sum/max, then a
    source-sized fold — totals are sums over the per-hash partials,
    uniques are the group rows, so no join and no second scan; blocks
    never carry the payload with them, only the 16-byte hash. The
    oracle hashes the identical byte slices (the corpus is ASCII, so
    DuckDB's text substring sees the same bytes the binary payload
    holds). At 100 TB: block size becomes 4-64 KiB, same plan, and the
    (source, hash) agg is the only data-sized shuffle — hash-sized
    rows, not payload-sized."""
    from .llm.multimodal import attach_binary_payload, payload_blocks

    d = _t(spark, sf_dir, "documents")
    m = attach_binary_payload(d, "text", "doc_id", extra_cols=("source",))
    blocks = payload_blocks(m, block=_MM4_BLOCK, extra_cols=("source",))
    # both reports fold out of ONE (source, hash) aggregation: totals
    # are sums over the per-hash partials, uniques are the group rows
    # themselves — single scan, single data-sized shuffle, no join
    per_hash = blocks.groupBy("source", "h").agg(
        F.count("*").alias("cnt"),
        F.sum("blen").alias("sum_blen"),
        F.max("blen").alias("max_blen"),
    )
    return per_hash.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_blocks"),
        F.count("*").cast("bigint").alias("n_uniq"),
        F.sum("sum_blen").alias("total_bytes"),
        F.sum("max_blen").alias("uniq_bytes"),
    ).select(
        "source",
        "n_blocks",
        "n_uniq",
        "total_bytes",
        "uniq_bytes",
        F.round(1.0 - F.col("uniq_bytes") / F.col("total_bytes"), 6).alias(
            "dedup_frac"
        ),
    )


@register("ann18_index_delete", None)  # sql attached below (ann11's + tombstones)
def ann18_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETES from the persisted IVF-PQ index — the shrink half of the
    maintenance pair ann12 opened (grow): tombstone every ``vec_id % 9
    == 1`` (three of ann11's current top-10 neighbors die, so the
    deletion is OBSERVABLE in the answer, not a no-op filter), anti-join
    the stored assignment + PQ-code tables against the tombstones
    (llm.similarity.ivfpq_delete_tombstones), and serve the same top-10
    query ann11 serves. Deleted vectors must vanish from every stage —
    coarse members, PQ shortlist, exact rerank — which filtering the
    membership tables guarantees by construction; centroids stay (a
    delete doesn't move a trained centroid; ann13's drift report says
    when to retrain). The oracle replays ann11's full deterministic
    build + serve with the tombstone predicate on the member set.
    Physical compaction (rewrite-minus-tombstones, atomic swap) and
    tombstone==compacted serve equivalence are pinned in
    tests/test_similarity.py. Reference analog: the delete-aware half
    of the stored-state idempotency of src/extract.py:222-270."""
    from .llm.similarity import ivfpq_delete_tombstones, ivfpq_query_from_index

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign, codes, ca, cb = _cached_ivfpq_index(spark, sf_dir, emb)
    tomb = emb.filter(F.col("vec_id") % 9 == 1).select("vec_id")
    assign_r, codes_r = ivfpq_delete_tombstones(assign, codes, tomb)
    emb_r = emb.join(tomb, "vec_id", "left_anti")
    return ivfpq_query_from_index(
        emb_r, cent, assign_r, codes_r, ca, cb, query_id=0, k=10,
        shortlist=50, nprobe=2,
    )


REGISTRY["ann18_index_delete"].sql = _ann11_sql().replace(
    "WHERE asg.vec_id <> 0",
    "WHERE asg.vec_id <> 0 AND asg.vec_id % 9 <> 1",
)


_TX22_K = 3  # k-gram length (tokens)
_TX22_W = 4  # winnowing window (k-gram hashes)


def _tx22_sql() -> str:
    from .llm.dedup import _h32_sql, shingles_sql

    sh = shingles_sql("text", _TX22_K)
    return f"""
    WITH g0 AS (
      SELECT doc_id, generate_subscripts({sh}, 1) AS pos, unnest({sh}) AS gram
      FROM documents
    ),
    g AS (SELECT doc_id, pos, {_h32_sql("md5(gram)")} AS h FROM g0),
    cnt AS (SELECT doc_id, count(*) AS m FROM g GROUP BY 1),
    w AS (
      SELECT g.doc_id, g.pos, g.h, g.pos - off.o AS j
      FROM g JOIN cnt USING (doc_id),
           LATERAL unnest(range(0, {_TX22_W})) AS off(o)
      WHERE g.pos - off.o >= 1 AND g.pos - off.o <= cnt.m - {_TX22_W} + 1
    ),
    sel AS (
      SELECT doc_id, pos, h,
             row_number() OVER (
               PARTITION BY doc_id, j ORDER BY h, pos DESC
             ) AS rn
      FROM w
    ),
    fp AS (SELECT DISTINCT doc_id, pos, h FROM sel WHERE rn = 1),
    fph AS (SELECT DISTINCT doc_id, h FROM fp),
    shared AS (SELECT h FROM fph GROUP BY h HAVING count(*) >= 2),
    perdoc AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY 1),
    pershared AS (
      SELECT fph.doc_id, count(*) AS n_sh
      FROM fph JOIN shared USING (h) GROUP BY 1
    )
    SELECT d.doc_id,
           cast(coalesce(cnt.m, 0) AS BIGINT) AS n_grams,
           cast(coalesce(perdoc.n_fp, 0) AS BIGINT) AS n_fingerprints,
           cast(coalesce(pershared.n_sh, 0) AS BIGINT) AS n_shared
    FROM documents d
    LEFT JOIN cnt USING (doc_id)
    LEFT JOIN perdoc USING (doc_id)
    LEFT JOIN pershared USING (doc_id)
    """


@register("tx22_winnow_fingerprint", None)  # sql attached below
def tx22_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003, SIGMOD — the MOSS algorithm): hash every 3-token k-gram,
    slide a window of 4 hashes, select each window's minimum (ties to
    the RIGHTMOST position — the tie rule that gives winnowing its
    guarantee), and a position selected by ANY window is a
    fingerprint. The guarantee: any shared token run long enough to
    cover a window yields at least one IDENTICAL fingerprint in both
    docs — so `n_shared` (a doc's fingerprints that also occur in
    another doc) is a plagiarism/overlap signal with bounded density
    (~2/(w+1) of positions), the sampling-based middle ground between
    tx4's single whole-doc hash and dd3's full inverted index.
    Implementation: the window argmin is computed by exploding each
    hash into the <= 4 windows containing it and ranking (hash ASC,
    pos DESC) within (doc, window) — a 4x map-side fan-out plus one
    fine-grained window sort, no variable-length lookback, identical
    in both engines. At 100 TB the fan-out factor stays w (constant)
    and fingerprints are ~2/(w+1) of grams, so the cross-doc stage
    (the only corpus-wide shuffle) runs on a 40%-sampled hash table,
    not the corpus."""
    from .llm.dedup import _h32, _spread, shingles

    d = _t(spark, sf_dir, "documents")
    inst = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.posexplode(shingles(F.col("text"), _TX22_K)).alias("p0", "gram")
    )
    g = inst.select(
        "doc_id",
        (F.col("p0") + 1).alias("pos"),
        _h32(F.md5("gram")).alias("h"),
    )
    cnt = g.groupBy("doc_id").agg(F.count("*").alias("m"))
    w = (
        g.join(cnt, "doc_id")
        .select(
            "doc_id",
            "pos",
            "h",
            "m",
            F.explode(F.sequence(F.lit(0), F.lit(_TX22_W - 1))).alias("o"),
        )
        .withColumn("j", F.col("pos") - F.col("o"))
        .filter((F.col("j") >= 1) & (F.col("j") <= F.col("m") - _TX22_W + 1))
    )
    win = Window.partitionBy("doc_id", "j").orderBy(
        F.col("h").asc(), F.col("pos").desc()
    )
    fp = (
        w.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("doc_id", "pos", "h")
        .distinct()
    )
    fph = fp.select("doc_id", "h").distinct()
    shared = (
        fph.groupBy("h").agg(F.count("*").alias("nd")).filter(F.col("nd") >= 2)
    )
    perdoc = fp.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    pershared = (
        fph.join(shared.select("h"), "h").groupBy("doc_id").agg(
            F.count("*").alias("n_sh")
        )
    )
    z = F.lit(0).cast("bigint")
    return (
        d.select("doc_id")
        .join(cnt, "doc_id", "left")
        .join(perdoc, "doc_id", "left")
        .join(pershared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("m"), z).alias("n_grams"),
            F.coalesce(F.col("n_fp"), z).alias("n_fingerprints"),
            F.coalesce(F.col("n_sh"), z).alias("n_shared"),
        )
    )


REGISTRY["tx22_winnow_fingerprint"].sql = _tx22_sql()


_HH1_W = 1024  # count-min width (buckets per hash row)
_HH1_D = 4     # count-min depth (independent hash rows)


def _hh1_sql() -> str:
    from .operators.sampling import hash_bucket_sql

    b_sk = hash_bucket_sql("concat(cast(js.j AS VARCHAR), ':', c.tok)", _HH1_W)
    b_est = hash_bucket_sql("concat(cast(js.j AS VARCHAR), ':', t.tok)", _HH1_W)
    return f"""
    WITH toks AS (SELECT unnest({_DUCK_TOKS}) AS tok FROM documents),
    counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
    js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    sk AS (
      SELECT js.j, {b_sk} AS b, sum(c.n) AS cnt
      FROM counts c CROSS JOIN js
      GROUP BY 1, 2
    ),
    top20 AS (SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT 20),
    est AS (
      SELECT t.tok, t.n, min(sk.cnt) AS est
      FROM top20 t CROSS JOIN js
      JOIN sk ON sk.j = js.j AND sk.b = {b_est}
      GROUP BY 1, 2
    )
    SELECT tok, cast(n AS BIGINT) AS n_true, cast(est AS BIGINT) AS n_est,
           est >= n AS overestimate_ok,
           cast(est - n AS BIGINT) AS err
    FROM est
    """


@register("hh1_countmin_topk", None)  # sql attached below (needs helper)
def hh1_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a Count-Min sketch (Cormode & Muthukrishnan
    2005) — the fixed-size mergeable summary a 100 TB stream keeps when
    the exact vocabulary won't fit: d=4 independent hash rows x
    w=1024 buckets of SUM counters (a commutative monoid, so
    per-shard sketches union by cell-wise +, same algebra as the
    datacard states). Estimate = min over rows; CM guarantees
    est >= true always and est <= true + eps*N w.h.p. This is the
    CONTRACT form (dd14/ann6's pattern): it reports, for the exact
    top-20 tokens, the true count, the sketch estimate, the
    overestimate invariant, and the absolute error — both the sketch
    and the truth are computed in-plan so the approximation quality is
    a verified number, not a claim.

    Plan shape: the only corpus-sized stage is the token count (tx5's
    explode + groupBy); the sketch itself is built from the
    vocabulary-sized count table (inserting per-token subtotals is
    arithmetically identical to per-occurrence inserts), so the d x w
    fold shuffles vocabulary-sized rows into a 4x1024-cell
    table that then BROADCASTS to the 20-row estimate join. The oracle
    replays the identical md5-derived buckets (hash_bucket_sql)."""
    from .llm import tokens
    from .llm.sketch import countmin_build, countmin_estimate

    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sk = countmin_build(counts, _HH1_D, _HH1_W)
    top20 = counts.orderBy(F.col("n").desc(), "tok").limit(20)
    est = countmin_estimate(sk, top20, _HH1_D, _HH1_W)
    return est.select(
        "tok",
        F.col("n").cast("bigint").alias("n_true"),
        F.col("est").alias("n_est"),
        (F.col("est") >= F.col("n")).alias("overestimate_ok"),
        (F.col("est") - F.col("n")).cast("bigint").alias("err"),
    )


REGISTRY["hh1_countmin_topk"].sql = _hh1_sql()


@register("hh2_countmin_fold", None)  # oracle attached below (= hh1's)
def hh2_countmin_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental Count-Min maintenance: the corpus arrives as three
    batches (doc_id % 3), each contributes its own d x w sketch, and
    the states fold via plans.merge_agg_state on the (j, b) cell key —
    cell-wise sum, the CM monoid. The folded sketch answers hh1's
    exact-top-20 contract with IDENTICAL estimates to the one-pass
    sketch (per-cell sums over a partition of the corpus sum to the
    global cells), which is why the oracle is literally hh1's SQL: the
    fourth instance of the state-algebra pattern (datacard x41, LM
    tx19, TF-IDF tx20) and the one a streaming heavy-hitter monitor
    persists — fixed d*w-cell state, batch-sized arrival work, no
    history rescan. Streaming twin:
    streaming.file_stream.stream_countmin_available_now (same
    batch_id-keyed state log + compaction as the LM/datacard sinks)."""
    from .llm import tokens
    from .llm.sketch import countmin_build, countmin_estimate
    from .plans import merge_agg_state

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    parts = [
        countmin_build(
            toks.filter(F.col("doc_id") % 3 == k)
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n")),
            _HH1_D,
            _HH1_W,
        )
        for k in range(3)
    ]
    sk = merge_agg_state(
        merge_agg_state(parts[0], parts[1], ["j", "b"], count_col="cnt"),
        parts[2],
        ["j", "b"],
        count_col="cnt",
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    top20 = counts.orderBy(F.col("n").desc(), "tok").limit(20)
    est = countmin_estimate(sk, top20, _HH1_D, _HH1_W)
    return est.select(
        "tok",
        F.col("n").cast("bigint").alias("n_true"),
        F.col("est").alias("n_est"),
        (F.col("est") >= F.col("n")).alias("overestimate_ok"),
        (F.col("est") - F.col("n")).cast("bigint").alias("err"),
    )


REGISTRY["hh2_countmin_fold"].sql = _hh1_sql()


_X48_TARGET = 100  # per-cell keep budget


def _x48_sql() -> str:
    from .operators.sampling import hash_bucket_sql

    hb = hash_bucket_sql("a.vec_id", 1000000)
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4),
    {_KMEANS_CHAINS}
    assign AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    sizes AS (SELECT cell, count(*) AS n_members FROM assign GROUP BY 1),
    kept AS (
      SELECT a.cell, s.n_members,
             CASE WHEN {hb} < floor({_X48_TARGET} * 1000000.0 / s.n_members)
                  THEN 1 ELSE 0 END AS keep
      FROM assign a JOIN sizes s USING (cell)
    )
    SELECT cell, cast(n_members AS BIGINT) AS n_members,
           cast(sum(keep) AS BIGINT) AS n_kept,
           round(sum(keep) * 1.0 / n_members, 4) AS keep_rate
    FROM kept GROUP BY cell, n_members
    """


@register("x48_density_downsample", None)  # sql attached below
def x48_density_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-proportional downsampling — the diversity-preserving
    counterpart of SemDeDup (dd11): instead of deleting near-identical
    pairs, keep each k-means cell down to a fixed per-cell budget, so
    dense regions of embedding space (boilerplate, templates) are
    thinned hard while sparse regions (rare content) survive intact —
    the cluster-based data-pruning recipe of Sorscher et al. 2022
    (arXiv:2206.14486). Membership is decided by a content hash of the
    vector id against floor(budget * 1e6 / cell_size), so the sample is
    deterministic across runs, engines, partitionings, and appends
    (operators/sampling's split discipline — never df.sample()).

    Plan shape: kmeans_assign's broadcast-centroid Lloyd loop (the
    assignment is the only vector-sized shuffle), a cell-sized count,
    and the keep decision is a MAP-SIDE expression on the broadcast
    4-row size table — the corpus never shuffles for the sampling
    itself. The oracle replays the Lloyd chains (ann4's CTEs) and the
    identical md5 keep-hash."""
    from .llm.similarity import kmeans_assign
    from .operators.sampling import hash_bucket

    e = _t(spark, sf_dir, "embeddings")
    assign = kmeans_assign(e, k=4, iters=2, materialize=True)
    sizes = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
    thresh = F.floor(F.lit(_X48_TARGET * 1000000.0) / F.col("n_members"))
    kept = assign.join(F.broadcast(sizes), "cell").select(
        "cell",
        "n_members",
        (hash_bucket(F.col("vec_id"), 1000000) < thresh).cast("int").alias("keep"),
    )
    return kept.groupBy("cell", "n_members").agg(
        F.sum("keep").cast("bigint").alias("n_kept"),
        F.round(F.sum("keep") * 1.0 / F.col("n_members"), 4).alias("keep_rate"),
    ).select(
        "cell",
        F.col("n_members").cast("bigint").alias("n_members"),
        "n_kept",
        "keep_rate",
    )


REGISTRY["x48_density_downsample"].sql = _x48_sql()


_X49_CHUNK = 50       # docs per pseudo-file
_X49_TARGET = 16384   # compaction bin target bytes


@register(
    "x49_compaction_bins",
    f"""
    WITH chunks AS (
      SELECT source, cast(floor(doc_id / {_X49_CHUNK}) AS BIGINT) AS chunk_id,
             sum(n_chars) AS bytes
      FROM documents GROUP BY 1, 2
    ),
    ordered AS (
      SELECT source, chunk_id, bytes,
             sum(bytes) OVER (
               PARTITION BY source ORDER BY bytes DESC, chunk_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM chunks
    )
    SELECT source, cast(floor((cum - bytes) / {_X49_TARGET}.0) AS BIGINT) AS bin,
           cast(count(*) AS BIGINT) AS n_chunks,
           cast(sum(bytes) AS BIGINT) AS bin_bytes
    FROM ordered GROUP BY 1, 2
    """,
)
def x49_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLANNER — the maintenance query behind
    OPTIMIZE/rewriteDataFiles: given a file inventory (here each run of
    50 doc ids per source stands in for a data file, sized by
    its text bytes), assign files to merge bins of ~16 KiB
    by walking the size-descending order and cutting on the running
    total (next-fit-decreasing — within 2x of optimal bin count, and
    unlike first-fit it is pure window algebra, so both engines replay
    it exactly). Output: the merge manifest a compactor would execute,
    one row per (source, bin).

    Plan shape: everything after the (source, chunk) byte agg is
    file-METADATA-sized — the window partitions by source (keyed
    shuffle of inventory rows, never data bytes), exactly how a table
    service plans compaction over a 100 TB table: the planner reads
    the manifest, only the executor touches data."""
    d = _t(spark, sf_dir, "documents")
    chunks = (
        d.groupBy(
            "source",
            F.floor(F.col("doc_id") / _X49_CHUNK).cast("bigint").alias("chunk_id"),
        )
        .agg(F.sum("n_chars").alias("bytes"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("bytes").desc(), "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = chunks.withColumn("cum", F.sum("bytes").over(w))
    return (
        ordered.groupBy(
            "source",
            F.floor((F.col("cum") - F.col("bytes")) / float(_X49_TARGET))
            .cast("bigint")
            .alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("bytes").cast("bigint").alias("bin_bytes"),
        )
    )


@register(
    "ann19_sq8_topk",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    stats AS (SELECT i, min(v) AS mn, max(v) AS mx FROM comp GROUP BY i),
    codes AS (
      SELECT vec_id, comp.i,
             CASE WHEN mx > mn
                  THEN least(255, floor((v - mn) / (mx - mn) * 256))
                  ELSE 0 END AS code
      FROM comp JOIN stats ON comp.i = stats.i
    ),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    approx AS (
      SELECT c.vec_id,
             round(sum((mn + (code + 0.5) * (mx - mn) / 256) * qv), 4)
               AS sq8_score
      FROM codes c
      JOIN stats ON c.i = stats.i
      JOIN q ON c.i = q.i
      WHERE c.vec_id <> 0
      GROUP BY 1
      ORDER BY sq8_score DESC, c.vec_id
      LIMIT 50
    ),
    exact AS (
      SELECT comp.vec_id, a.sq8_score, sum(comp.v * q.qv) AS dot,
             sqrt(sum(comp.v * comp.v)) AS norm
      FROM comp JOIN approx a ON comp.vec_id = a.vec_id
      JOIN q ON comp.i = q.i
      GROUP BY 1, 2
    ),
    qn AS (SELECT sqrt(sum(v * v)) AS qnorm FROM comp WHERE vec_id = 0)
    SELECT vec_id, round(dot / (norm * qnorm), 4) AS cosine, sq8_score
    FROM exact, qn
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def ann19_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, scalar-quantized (SQ8) serve mode: 8-bit
    per-dimension quantization against corpus [min, max] — 1 byte/dim
    storage with NO training step (one mergeable d-sized min/max agg),
    the cheap default real vector stores offer before IVF/PQ tuning.
    Approximate scan over dequantized codes cuts a 50-candidate
    shortlist (4-dp rounded score, pq_topk's engine-stable convention),
    exact rerank returns top-10. See llm/similarity.sq8_topk for the
    plan-shape notes."""
    from .llm.similarity import sq8_topk

    return sq8_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10, shortlist=50)


_HH3_M = 16384  # linear-counting bitmap width


def _hh3_sql() -> str:
    from .operators.sampling import hash_bucket_sql

    hb = hash_bucket_sql("tok", _HH3_M)
    est = f"{_HH3_M} * ln({_HH3_M} * 1.0 / ({_HH3_M} - hit))"
    return f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents
    ),
    hits AS (SELECT DISTINCT source, {hb} AS b FROM toks),
    filled AS (SELECT source, count(*) AS hit FROM hits GROUP BY 1),
    exact AS (
      SELECT source, count(DISTINCT tok) AS n_exact FROM toks GROUP BY 1
    )
    SELECT source, cast(n_exact AS BIGINT) AS n_exact,
           cast(hit AS BIGINT) AS n_buckets,
           round({est}, 2) AS n_est,
           round(abs({est} - n_exact) / n_exact, 4) AS rel_err
    FROM filled JOIN exact USING (source)
    """


@register("hh3_linear_counting", None)  # sql attached below
def hh3_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality estimation by linear probabilistic counting (Whang
    et al. 1990) — per-source distinct-token estimates from a fixed
    m-bit bucket bitmap: hash every token into m=16384 buckets, count
    buckets hit, estimate n = m * ln(m / zeros). Like the CM sketch
    (hh1/hh2) this is the CONTRACT form: the exact distinct count runs
    in the same plan, so the estimator's relative error is a verified
    number per source. The bitmap is a union monoid (bucket sets OR
    together), so per-shard bitmaps merge into the corpus bitmap —
    the cardinality summary that sizes shuffles/dedup budgets at
    100 TB without a second scan. Unlike HLL (whose register layout is
    engine-private, so approx_count_distinct can never hash-match an
    oracle) the md5 bucket map replays bit-for-bit in DuckDB.

    Plan shape: one token explode feeding (a) the (source, bucket)
    distinct — bounded by m per source — and (b) the exact distinct
    (the contract's truth side); both are keyed aggs, the final join
    is source-sized."""
    from .llm import tokens
    from .operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    hits = toks.select(
        "source", hash_bucket(F.col("tok"), _HH3_M).alias("b")
    ).distinct()
    filled = hits.groupBy("source").agg(F.count(F.lit(1)).alias("hit"))
    exact = toks.groupBy("source").agg(
        F.countDistinct("tok").alias("n_exact")
    )
    est = F.lit(_HH3_M) * F.log(
        F.lit(_HH3_M * 1.0) / (F.lit(_HH3_M) - F.col("hit"))
    )
    return filled.join(exact, "source").select(
        "source",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.col("hit").cast("bigint").alias("n_buckets"),
        F.round(est, 2).alias("n_est"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )


REGISTRY["hh3_linear_counting"].sql = _hh3_sql()


_X50_K = 20


def _x50_sql() -> str:
    from .llm.dedup import _hexint_sql

    hexed = _hexint_sql("md5('ps' || '|' || cast(doc_id AS VARCHAR))", 8)
    u = f"(({hexed}) + 0.5) / 4294967296.0"
    return f"""
    WITH scored AS (
      SELECT doc_id, n_chars, round(ln({u}) / n_chars, 8) AS priority
      FROM documents
    )
    SELECT doc_id, cast(n_chars AS BIGINT) AS n_chars, priority
    FROM scored ORDER BY priority DESC, doc_id LIMIT {_X50_K}
    """


@register("x50_priority_sample", None)  # sql attached below
def x50_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-Res): each row draws priority
    ln(u) / weight from a content-hash uniform u and the global top-k
    by priority is an exact weighted reservoir sample — the fixed-k
    counterpart of x19's Bernoulli sampler, and the one a summarizer
    keeps when the OUTPUT size must be bounded no matter how the
    corpus grows. Hash-derived u makes the sample a pure function of
    row identity: stable across runs, engines, partitionings, and
    executor counts (df.sample() is none of these), and mergeable —
    top-k of per-shard top-k's equals the global top-k, so a 100 TB
    run keeps k rows per shard and one k-row final heap.

    Plan shape: zero shuffles — a map-side priority projection and one
    TakeOrderedAndProject heap cut (never a global sort). Priorities
    are rounded to 8 dp IN the ordering key so the cut is engine-stable
    (pq_topk's convention)."""
    from .llm.dedup import _hexint

    d = _t(spark, sf_dir, "documents")
    u = (
        _hexint(F.md5(F.concat_ws("|", F.lit("ps"), F.col("doc_id"))), 8)
        + 0.5
    ) / F.lit(4294967296.0)
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.round(F.log(u) / F.col("n_chars"), 8).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(_X50_K)
    )


REGISTRY["x50_priority_sample"].sql = _x50_sql()


def _x51_pr_iter_sql(prev: str, it: int) -> str:
    """One unweighted PageRank power iteration as a CTE."""
    return f"""
    pr{it} AS (
      SELECT n.vec_id,
             0.15 / nn.n + 0.85 * coalesce(c.s, 0) AS pr
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst, sum(p.pr / d.deg) AS s
        FROM edges e
        JOIN {prev} p ON p.vec_id = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY 1
      ) c ON c.dst = n.vec_id
    )"""


def _x51_sql() -> str:
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    kk AS (
      SELECT greatest(4, ceil(count(DISTINCT vec_id) / 500.0)) AS k FROM comp
    ),
    cent0 AS (
      SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k
    ),
    {_kmeans_iter_sql('cent0', 1)},
    {_kmeans_iter_sql('cent1', 2)},
    {_kmeans_iter_sql('cent2', 3)},
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    cand AS (
      SELECT x.vec_id AS a, y.vec_id AS b
      FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id <> y.vec_id
    ),
    dots AS (
      SELECT c.a, c.b, sum(ca.v * cb.v) AS dot
      FROM cand c
      JOIN comp ca ON ca.vec_id = c.a
      JOIN comp cb ON cb.vec_id = c.b AND cb.i = ca.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT dots.a, dots.b, round(dot / (na.norm * nb.norm), 4) AS cosine
      FROM dots
      JOIN norms na ON na.vec_id = dots.a
      JOIN norms nb ON nb.vec_id = dots.b
      WHERE na.norm > 0 AND nb.norm > 0
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM (
        SELECT a, b,
               row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) AS rnk
        FROM scored
      ) WHERE rnk <= 3
    ),
    nodes AS (SELECT DISTINCT vec_id FROM comp),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    pr0 AS (SELECT vec_id, 1.0 / nn.n AS pr FROM nodes, nn),
    {_x51_pr_iter_sql('pr0', 1)},
    {_x51_pr_iter_sql('pr1', 2)},
    {_x51_pr_iter_sql('pr2', 3)}
    SELECT vec_id, round(pr * nn.n, 4) AS pagerank
    FROM pr3, nn
    ORDER BY round(pr * nn.n, 4) DESC, vec_id
    LIMIT 20
    """


@register("x51_graph_pagerank", None)  # sql attached below
def x51_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance propagation over the k-NN similarity graph: three
    unweighted PageRank power iterations (d=0.85) over ann5's edges —
    the graph-centrality signal curation stacks use to find "hub"
    documents (highly connected = template/boilerplate-like mass,
    inverse of x48's density signal but link-based rather than
    cell-count-based) and the engine's demonstration of ITERATIVE
    graph algebra as pure DataFrame ops: each iteration is one
    edge-keyed join + dst-keyed agg + node-sized left join, exactly
    the shape GraphX/Pregel compiles to, with no driver loop state.

    Determinism across engines: the edge set is integer-exact (ann5
    ranks on the 4-dp ROUNDED cosine), the iteration arithmetic
    mirrors the oracle expression-for-expression, and the final
    N-normalized score is 4-dp rounded in the ordering key. Dangling
    cells (singletons with no out-edges) leak their mass — documented,
    identical in both engines, irrelevant to the ranking contract.

    Scale shape: the graph build derives its cell count from corpus
    size (k = N/500), so the per-cell gram is constant-bounded and the
    build scales linearly (fixed k=4 measured 16.7x wall at 10x data;
    derived k, 2.9x — SCALE.md round-9 addendum); the edge table is
    3N rows regardless of dimension, checkpointed ONCE, and each
    iteration shuffles edge-sized rows keyed on dst. At 100 TB you
    persist the edges (like the IVF index) and iterate to convergence
    with the same three-operator loop."""
    from .llm.similarity import _components, _gram_pair_fn, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    # cell count DERIVES from corpus size (k = N / 500, the SemDeDup
    # recipe): the per-cell gram stays ~500x500 at ANY corpus size, so
    # the edge build scales linearly instead of quadratically (fixed
    # k=4 measured 60.4 s at 10x; derived k, 6.3 s). At the gate SFs
    # (N <= 2000) the derived k is 4 — identical to ann5's contract.
    comp = _components(emb, "vec_id", "embedding")
    kk = emb.agg(
        F.greatest(F.lit(4).cast("bigint"), F.ceil(F.count("*") / 500.0)).alias(
            "k"
        )
    )
    init = (
        comp.crossJoin(F.broadcast(kk))
        .filter(F.col("vec_id") < F.col("k"))
        .select(F.col("vec_id").alias("cell"), "i", "v")
    )
    _, assign = kmeans_fit(
        emb, "vec_id", "embedding", iters=2, materialize=True, init=init
    )
    vecs = assign.join(emb.select("vec_id", "embedding"), "vec_id").select(
        F.col("vec_id").alias("__id"), "cell", F.col("embedding").alias("__v")
    )
    pairs = vecs.groupBy("cell").applyInPandas(
        _gram_pair_fn(-1.01), schema="a bigint, b bigint, cosine double"
    )
    both = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"), "cosine")
    )
    wk = Window.partitionBy("a").orderBy(F.col("cosine").desc(), "b")
    edges = (
        both.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= 3)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    nodes = emb.select("vec_id")
    nn = nodes.agg(F.count("*").cast("double").alias("n"))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src")
    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "vec_id", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(3):
        contrib = (
            ed.join(pr, ed.src == pr.vec_id)
            .select("dst", (F.col("pr") / F.col("deg")).alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("s"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, nodes.vec_id == contrib.dst, "left")
            .select(
                "vec_id",
                (
                    F.lit(0.15) / F.col("n")
                    + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    out = pr.crossJoin(F.broadcast(nn)).select(
        "vec_id", F.round(F.col("pr") * F.col("n"), 4).alias("pagerank")
    )
    return out.orderBy(F.col("pagerank").desc(), "vec_id").limit(20)


REGISTRY["x51_graph_pagerank"].sql = _x51_sql()


def _ann20_sql() -> str:
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    cent0 AS (
      SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4
    ),
    {_KMEANS_CHAINS}
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    qc AS (SELECT cell FROM asg WHERE vec_id = 0),
    members AS (
      SELECT a.vec_id FROM asg a, qc
      WHERE a.cell = qc.cell AND a.vec_id <> 0
    ),
    stats AS (SELECT i, min(v) AS mn, max(v) AS mx FROM comp GROUP BY i),
    codes AS (
      SELECT comp.vec_id, comp.i,
             CASE WHEN mx > mn
                  THEN least(255, floor((v - mn) / (mx - mn) * 256))
                  ELSE 0 END AS code
      FROM comp JOIN stats ON comp.i = stats.i
      WHERE comp.vec_id IN (SELECT vec_id FROM members)
    ),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    approx AS (
      SELECT c.vec_id,
             round(sum((mn + (code + 0.5) * (mx - mn) / 256) * qv), 4)
               AS sq8_score
      FROM codes c
      JOIN stats ON c.i = stats.i
      JOIN q ON c.i = q.i
      GROUP BY 1
      ORDER BY sq8_score DESC, c.vec_id
      LIMIT 50
    ),
    exact AS (
      SELECT comp.vec_id, a.sq8_score, sum(comp.v * q.qv) AS dot,
             sqrt(sum(comp.v * comp.v)) AS norm
      FROM comp JOIN approx a ON comp.vec_id = a.vec_id
      JOIN q ON comp.i = q.i
      GROUP BY 1, 2
    ),
    qn AS (SELECT sqrt(sum(v * v)) AS qnorm FROM comp WHERE vec_id = 0)
    SELECT vec_id, round(dot / (norm * qnorm), 4) AS cosine, sq8_score
    FROM exact, qn
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """


@register("ann20_ivf_sq8_topk", None)  # sql attached below
def ann20_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, IVF x SQ8 composition (FAISS's ``IVF<n>,SQ8``
    index type): the coarse cells prune the CANDIDATE SET to the
    query's cell, scalar quantization shrinks the SCANNED BYTES to 1
    per dimension, and the savings multiply — closing the loop ann19's
    scale note promised ("at production scale SQ8 composes with IVF").
    Like ann10/ann16, the REGISTERED form trains the cells in-plan so
    the oracle can replay them — its bench wall is dominated by the
    two Lloyd iterations, a build-time number; the serve-path story is
    the quantized scan itself, which is cell-scoped (1/k of ann19's
    code rows) and would ride a persisted index exactly as ann11
    serves ann10's. See llm/similarity.ivf_sq8_topk."""
    from .llm.similarity import ivf_sq8_topk

    return ivf_sq8_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=10, shortlist=50
    )


REGISTRY["ann20_ivf_sq8_topk"].sql = _ann20_sql()


# HyperLogLog geometry (Flajolet et al. 2007) — single source of truth
# in llm/sketch.py, shared by the hh4 oracle builder, the Spark-side
# helpers, and the streaming register sink.
from .llm.sketch import HLL_M as _HH4_M  # noqa: E402
from .llm.sketch import HLL_NUM as _HH4_NUM  # noqa: E402
from .llm.sketch import HLL_W as _HH4_W  # noqa: E402


def _hh4_sql() -> str:
    from .llm.dedup import _hexint_sql

    h = _hexint_sql("md5(tok)", 8)
    # rho = (leading zeros of the 24-bit suffix) + 1, via bin() string
    # length — no float log2, so the rank is exact in both engines.
    rho = (
        f"CASE WHEN v = 0 THEN {_HH4_W + 1} "
        f"ELSE {_HH4_W} + 1 - length(bin(v)) END"
    )
    est_raw = f"{_HH4_NUM!r} / s_int"
    lc = f"{_HH4_M} * ln({_HH4_M} * 1.0 / zeros)"
    return f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents
    ),
    hashed AS (
      SELECT DISTINCT source, ({h}) % {_HH4_M} AS j,
             ({h}) // {_HH4_M} AS v
      FROM toks
    ),
    regs AS (
      SELECT source, j, max({rho}) AS m_j FROM hashed GROUP BY 1, 2
    ),
    sums AS (
      SELECT source,
             sum(cast(power(2, {_HH4_W + 1} - m_j) AS BIGINT))
               + ({_HH4_M} - count(*)) * cast(power(2, {_HH4_W + 1}) AS BIGINT)
               AS s_int,
             {_HH4_M} - count(*) AS zeros
      FROM regs GROUP BY 1
    ),
    est AS (
      SELECT source, zeros,
             CASE WHEN ({est_raw}) <= {2.5 * _HH4_M!r} AND zeros > 0
                  THEN {lc} ELSE ({est_raw}) END AS e
      FROM sums
    ),
    exact AS (
      SELECT source, count(DISTINCT tok) AS n_exact FROM toks GROUP BY 1
    )
    SELECT source, cast(n_exact AS BIGINT) AS n_exact,
           cast({_HH4_M} - zeros AS BIGINT) AS n_registers,
           round(e, 2) AS n_est,
           round(abs(round(e, 2) - n_exact) / n_exact, 4) AS rel_err
    FROM est JOIN exact USING (source)
    """


@register("hh4_hll_cardinality", None)  # sql attached below
def hh4_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality estimation by HyperLogLog (Flajolet et al. 2007) —
    per-source distinct-token estimates from m=256 max-rank registers,
    completing the sketch family: count-min for frequencies (hh1/hh2),
    linear counting for low cardinalities (hh3), HLL for the high end
    where hh3's bitmap saturates (at 100 TB a source's token space
    overflows any linear bitmap you'd broadcast, while 256 registers
    stay 256 rows forever). Like hh1-hh3 this is the CONTRACT form:
    the exact distinct runs in the same plan so the estimator's
    relative error is a verified number per source.

    Spark's ``approx_count_distinct`` is HLL++ with an engine-private
    register layout, so it can never hash-match a DuckDB oracle (the
    hh3 docstring's point). This implementation derives registers from
    the md5 hash both engines share: 8 bits of register index, 24-bit
    suffix, rank from ``bin()`` string length (exact — no float log).
    The harmonic mean is computed as ONE double division by an exact
    bigint sum of 2^(25-M_j) terms, so it is immune to FP summation
    order across engines, partitionings, and executor counts. The
    register table is a max-monoid: per-shard register maxes merge
    into the corpus registers (pinned in tests), the same mergeability
    that lets hh2's CM states fold incrementally.

    Plan shape: one token explode feeding (a) the (source, j) register
    max — bounded by m=256 rows per source — and (b) the exact
    distinct (the contract's truth side); both keyed aggs, the final
    join is source-sized. Reference analog: the row-count
    reconciliation of src/load.py (counts as quality contract),
    lifted to distinct-cardinality at sketch cost."""
    from .llm.sketch import hll_estimate, hll_registers
    from .llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    est = hll_estimate(hll_registers(d, "source", "text"), "source")
    exact = d.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    ).groupBy("source").agg(F.countDistinct("tok").alias("n_exact"))
    return est.join(exact, "source").select(
        "source",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        "n_registers",
        "n_est",
        F.round(
            F.abs(F.col("n_est") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )


REGISTRY["hh4_hll_cardinality"].sql = _hh4_sql()


def _tx23_sql() -> str:
    from .llm.text import EN_STOPWORDS

    stop = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id, toks, len(toks) AS n_words,
             CASE WHEN len(toks) > 0
                  THEN round(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                             * 1.0 / len(toks), 10) END AS mwl,
             CASE WHEN len(toks) > 0
                  THEN round(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                             * 1.0 / len(toks), 10) END AS af,
             len(list_distinct(list_filter(toks, x -> list_contains({stop}, x))))
               AS st
      FROM t
    ),
    lab AS (
      SELECT doc_id, toks,
             (n_words BETWEEN 10 AND 100000 AND mwl BETWEEN 2.0 AND 12.0
              AND af >= 0.8 AND st >= 2) AS keep
      FROM m
    ),
    inst AS (SELECT doc_id, keep, unnest(toks) AS tok FROM lab),
    ct AS (
      SELECT tok,
             sum(CASE WHEN keep THEN 1 ELSE 0 END) AS cg,
             sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS cb
      FROM inst GROUP BY 1
    ),
    tots AS (
      SELECT sum(cg) AS ng, sum(cb) AS nb, count(*) AS v FROM ct
    ),
    pri AS (
      SELECT ln(sum(CASE WHEN keep THEN 1.0 ELSE 0.0 END)
                / sum(CASE WHEN NOT keep THEN 1.0 ELSE 0.0 END)) AS prior
      FROM lab
    ),
    llr AS (
      SELECT tok,
             ln((cg + 1.0) / (ng + v)) - ln((cb + 1.0) / (nb + v)) AS llr
      FROM ct, tots
    ),
    dt AS (SELECT doc_id, tok, count(*) AS c FROM inst GROUP BY 1, 2),
    sc AS (
      SELECT dt.doc_id, sum(dt.c * llr.llr) AS s
      FROM dt JOIN llr USING (tok) GROUP BY 1
    )
    SELECT lab.doc_id, lab.keep AS heur_keep,
           round(pri.prior + sc.s, 4) AS nb_score,
           (pri.prior + sc.s > 0) AS nb_keep
    FROM sc JOIN lab USING (doc_id), pri
    """


@register("tx23_nb_quality_score", None)  # sql attached below
def tx23_nb_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering, the CCNet / fastText /
    FineWeb-Edu pattern: train a cheap linear classifier on heuristic
    labels, then score EVERY document with it — the smooth score
    generalizes past the hard rule edges and gives curators a
    re-thresholdable dial where tx15's boolean can only keep/drop.
    Here the heuristic teacher is tx15's Gopher rule composite and the
    student is multinomial naive Bayes with Laplace smoothing, trained
    IN-PLAN: per-class token counts -> per-token log-likelihood ratio
    llr(t) = ln((c_good+1)/(N_good+V)) - ln((c_bad+1)/(N_bad+V)), and
    score(d) = ln(P_good/P_bad) + sum_t c(d,t)*llr(t). Emits both the
    teacher label and the student's score/decision per doc, so the
    disagreement set (the docs worth human review) falls out of a
    filter.

    Plan shape, same economics as tx9/tx10: the model tables are
    VOCABULARY-sized (per-token class counts) plus three scalar
    broadcasts (class totals, vocab size, prior); the corpus-sized
    stages are the (doc, tok) count and one doc-keyed sum — no
    corpus-sized shuffle beyond what the token explode already pays,
    so at 100 TB the model is a dim-table join, not a second scan.
    Reference analog: the rule-based cleanse of src/transform.py
    lifted to a learned score."""
    from .llm.text import EN_STOPWORDS, tokens

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    mwl = F.when(n > 0, F.round(total_len / n, 10))
    af = F.when(
        n > 0,
        F.round(F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n, 10),
    )
    st = F.size(F.array_intersect(F.array_distinct(toks), stoplist))
    lab = d.select(
        "doc_id",
        toks.alias("toks"),
        (
            n.between(10, 100000)
            & mwl.between(2.0, 12.0)
            & (af >= 0.8)
            & (st >= 2)
        ).alias("keep"),
    )
    inst = lab.select("doc_id", "keep", F.explode("toks").alias("tok"))
    ct = inst.groupBy("tok").agg(
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("cg"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("cb"),
    )
    tots = ct.agg(
        F.sum("cg").alias("ng"), F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    pri = lab.agg(
        F.log(
            F.sum(F.when(F.col("keep"), 1.0).otherwise(0.0))
            / F.sum(F.when(~F.col("keep"), 1.0).otherwise(0.0))
        ).alias("prior")
    )
    llr = ct.crossJoin(F.broadcast(tots)).select(
        "tok",
        (
            F.log((F.col("cg") + 1.0) / (F.col("ng") + F.col("v")))
            - F.log((F.col("cb") + 1.0) / (F.col("nb") + F.col("v")))
        ).alias("llr"),
    )
    dt = inst.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    sc = (
        dt.join(llr, "tok")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("llr")).alias("s"))
    )
    return (
        sc.join(lab.select("doc_id", "keep"), "doc_id")
        .crossJoin(F.broadcast(pri))
        .select(
            "doc_id",
            F.col("keep").alias("heur_keep"),
            F.round(F.col("prior") + F.col("s"), 4).alias("nb_score"),
            ((F.col("prior") + F.col("s")) > 0).alias("nb_keep"),
        )
    )


REGISTRY["tx23_nb_quality_score"].sql = _tx23_sql()


def _x52_sql() -> str:
    from .llm.dedup import shingles_sql

    sh = shingles_sql("text", 3)
    return f"""
    WITH ss AS (
      SELECT DISTINCT source, unnest(list_distinct({sh})) AS s
      FROM documents
    ),
    sizes AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_common
      FROM ss a JOIN ss b USING (s)
      WHERE a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, cast(n_common AS BIGINT) AS n_common,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 4) AS jaccard,
           round(n_common * 1.0 / least(sa.n, sb.n), 4) AS containment
    FROM pairs
    JOIN sizes sa ON sa.source = pairs.source_a
    JOIN sizes sb ON sb.source = pairs.source_b
    """


@register("x52_source_overlap", None)  # sql attached below
def x52_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: 3-gram shingle overlap
    between every pair of SOURCES — Jaccard and containment per pair.
    dd8 answers "is this document contaminated by the benchmark"; this
    answers the catalog-level question a corpus curator asks first:
    WHICH feeds overlap, and is the overlap mutual (high Jaccard,
    mirrored feeds) or one-way (high containment, one feed embedded in
    a bigger one) — the evidence for dropping a redundant source
    before paying per-document dedup on it, and the source-granularity
    leakage check when eval and train sets arrive as separate feeds.

    Plan shape: the (source, shingle)-type table feeds a shingle-keyed
    self-join — the inverted-index pattern of dd3, but the fan-out per
    shingle is bounded by the SOURCE count (a catalog-sized dimension,
    max S(S-1)/2 pairs per shingle), not by document frequency, so no
    posting cap is needed at any corpus scale. The keyed self-join is
    the correct 100 TB shape (both sides corpus-sized by design, like
    x51's edges); the size tables that close Jaccard are source-sized
    broadcasts. Reference analog: src/load.py's cross-table count
    reconciliation, lifted from row counts to content overlap."""
    from .llm.dedup import _spread, shingles

    d = _t(spark, sf_dir, "documents")
    ss = _spread(d.select("source", "text")).select(
        "source",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
    ).distinct()
    sizes = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = ss.alias("a"), ss.alias("b")
    pairs = (
        a.join(b, "s")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n").alias("nb")
    )
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                4,
            ).alias("jaccard"),
            F.round(
                F.col("n_common") / F.least(F.col("na"), F.col("nb")), 4
            ).alias("containment"),
        )
    )


REGISTRY["x52_source_overlap"].sql = _x52_sql()


_X54_SQL = """
WITH toks AS (
  SELECT source, doc_id % 2 = 0 AS is_old,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
cnt AS (
  SELECT source, tok,
         sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS c2
  FROM toks GROUP BY 1, 2
),
n AS (
  SELECT source, sum(c1) AS n1, sum(c2) AS n2,
         sum(CASE WHEN c1 > 0 THEN 1 ELSE 0 END) AS v1,
         sum(CASE WHEN c2 > 0 THEN 1 ELSE 0 END) AS v2
  FROM cnt GROUP BY 1
),
terms AS (
  SELECT cnt.source,
         (CASE WHEN c1 > 0
               THEN (c1 * 1.0 / n1)
                    * ln((c1 * 1.0 / n1)
                         / ((c1 * 1.0 / n1
                             + CASE WHEN n2 > 0 THEN c2 * 1.0 / n2
                                    ELSE 0 END) / 2))
               ELSE 0 END)
         + (CASE WHEN c2 > 0
                 THEN (c2 * 1.0 / n2)
                      * ln((c2 * 1.0 / n2)
                           / ((CASE WHEN n1 > 0 THEN c1 * 1.0 / n1
                                    ELSE 0 END
                               + c2 * 1.0 / n2) / 2))
                 ELSE 0 END) AS term
  FROM cnt JOIN n USING (source)
)
SELECT n.source, cast(n1 AS BIGINT) AS n_old_tokens,
       cast(n2 AS BIGINT) AS n_new_tokens,
       cast(v1 AS BIGINT) AS vocab_old, cast(v2 AS BIGINT) AS vocab_new,
       round(0.5 * s, 4) AS js_div
FROM (SELECT source, sum(term) AS s FROM terms GROUP BY 1) t
JOIN n USING (source)
"""


@register("x54_source_drift", _X54_SQL)
def x54_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring per source: Jensen-Shannon
    divergence between the unigram token distributions of two corpus
    snapshots — the text twin of ann13's vector-index drift report,
    and the number a feed-health monitor alerts on (a source whose
    token distribution jumps has changed crawler, language mix, or
    upstream corruption; x41's datacard says what a source IS, this
    says how fast it's MOVING). Snapshots here are the doc_id-parity
    halves (the i7 convention for synthetic versions); in production
    the flag is an ingest-batch or date column. JS rather than KL
    because it is symmetric, bounded by ln 2, and defined when either
    side has vocabulary the other lacks (the common case for drift).

    Plan shape: one (source, tok) count agg over the token explode —
    the same vocabulary-sized table tx23's model rides — then
    source-sized joins and a vocabulary-sized term sum; nothing
    corpus-sized shuffles twice. The per-batch (source, tok) counts
    are the fold x41 already persists, so an incremental deployment
    reuses the datacard state log. Reference analog: src/load.py's
    count reconciliation, lifted from row counts to distributions."""
    from .llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        (F.col("doc_id") % 2 == 0).alias("is_old"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    cnt = toks.groupBy("source", "tok").agg(
        F.sum(F.when(F.col("is_old"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0)).alias("c2"),
    )
    n = cnt.groupBy("source").agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.when(F.col("c1") > 0, 1).otherwise(0)).alias("v1"),
        F.sum(F.when(F.col("c2") > 0, 1).otherwise(0)).alias("v2"),
    )
    # try-guarded ratios: a snapshot half can be EMPTY for a source
    # (n1 or n2 = 0) — its distribution is all-zero and the other
    # side's terms reduce to ln 2 (max drift), which is the right
    # answer; unguarded division trips ANSI DIVIDE_BY_ZERO.
    p = F.when(F.col("n1") > 0, F.col("c1") / F.col("n1")).otherwise(
        F.lit(0.0)
    )
    q = F.when(F.col("n2") > 0, F.col("c2") / F.col("n2")).otherwise(
        F.lit(0.0)
    )
    m = (p + q) / 2
    term = F.when(F.col("c1") > 0, p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("c2") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    s = (
        cnt.join(n.select("source", "n1", "n2"), "source")
        .select("source", term.alias("term"))
        .groupBy("source")
        .agg(F.sum("term").alias("s"))
    )
    return s.join(n, "source").select(
        "source",
        F.col("n1").cast("bigint").alias("n_old_tokens"),
        F.col("n2").cast("bigint").alias("n_new_tokens"),
        F.col("v1").cast("bigint").alias("vocab_old"),
        F.col("v2").cast("bigint").alias("vocab_new"),
        F.round(0.5 * F.col("s"), 4).alias("js_div"),
    )


_ANN21_PROBES = (1, 2, 4)

_ANN21_SQL = f"""
WITH comp AS ({{comp}}),
norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
alldots AS (
  SELECT c.vec_id, sum(c.v * q.qv) AS dot
  FROM comp c JOIN q ON c.i = q.i GROUP BY c.vec_id
),
scoredall AS (
  SELECT d.vec_id, d.dot / (n.norm * qn.qnorm) AS cos
  FROM alldots d JOIN norms n ON n.vec_id = d.vec_id, qn
  WHERE d.vec_id <> 0
),
bf AS (SELECT vec_id FROM scoredall
       ORDER BY round(cos, 4) DESC, vec_id LIMIT 10),
cent AS (SELECT vec_id AS c, i, v AS cv FROM comp WHERE vec_id < 8),
cross_dots AS (
  SELECT comp.vec_id, cent.c, sum(comp.v * cent.cv) AS dot
  FROM comp JOIN cent ON comp.i = cent.i GROUP BY 1, 2
),
scored AS (
  SELECT cross_dots.vec_id, c, dot / (nv.norm * nc.norm) AS cos
  FROM cross_dots
  JOIN norms nv ON nv.vec_id = cross_dots.vec_id
  JOIN norms nc ON nc.vec_id = c
),
assign AS (
  SELECT vec_id, c AS centroid FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) = 1
),
qcells AS (
  SELECT c, row_number() OVER (ORDER BY cos DESC, c) AS pr
  FROM scored WHERE vec_id = 0
),
nps AS (SELECT unnest([{", ".join(str(p) for p in _ANN21_PROBES)}]) AS np),
cand AS (
  SELECT nps.np, a.vec_id
  FROM assign a
  JOIN qcells qc ON a.centroid = qc.c
  JOIN nps ON qc.pr <= nps.np
  WHERE a.vec_id <> 0
),
ivfk AS (
  SELECT np, vec_id FROM (
    SELECT cand.np, s.vec_id,
           row_number() OVER (PARTITION BY cand.np
                              ORDER BY round(s.cos, 4) DESC, s.vec_id) AS rn
    FROM cand JOIN scoredall s ON s.vec_id = cand.vec_id
  ) WHERE rn <= 10
),
hits AS (
  SELECT np, count(*) AS n_hits FROM ivfk
  WHERE vec_id IN (SELECT vec_id FROM bf) GROUP BY 1
),
scan AS (SELECT np, count(*) AS n_scanned FROM cand GROUP BY 1)
SELECT nps.np AS nprobe, cast(10 AS BIGINT) AS k,
       cast(coalesce(scan.n_scanned, 0) AS BIGINT) AS n_scanned,
       cast(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(hits.n_hits, 0) / 10.0, 4) AS recall_at_k
FROM nps
LEFT JOIN scan ON scan.np = nps.np
LEFT JOIN hits ON hits.np = nps.np
"""


@register("ann21_probe_recall_curve", None)  # sql attached below
def ann21_probe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-vs-cost TUNING CURVE in one plan: recall@10 and
    candidate-scan size for nprobe in {1, 2, 4} against the same
    brute-force ground truth — the table an ANN operator actually
    reads before picking a probe count. ann6 measures one point and
    ann7 one notch up; this emits the curve, so "how many probes buy
    recall 0.9, and what do they cost in scanned rows" is a SELECT,
    not three reruns. n_scanned is the cost axis: it grows ~linearly
    in nprobe while recall saturates — the knee is the operating
    point. Monotonicity in both axes is pinned (more probes never
    scan less or recall less; candidates nest by construction).

    Plan shape: one coarse-assignment (the broadcast-centroid pass
    ann2 ships) shared by all three curve points via the probe-rank
    join — the probes table is 3 rows, so the fan-out is the
    candidate union, not three corpus scans; the exact rerank per
    probe level cuts via per-partition heaps."""
    from .llm.similarity import _ivf_cluster_members, _rerank_members, brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    bf = brute_force_topk(emb, query_id=0, k=10).select("vec_id")
    parts = []
    for np_ in _ANN21_PROBES:
        members = _ivf_cluster_members(
            emb, query_id=0, n_centroids=8, nprobe=np_
        )
        topk = _rerank_members(emb, members, 0, 10, "vec_id", "embedding")
        hits = topk.select("vec_id").intersect(bf)
        parts.append(
            members.agg(F.count(F.lit(1)).alias("n_scanned"))
            .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
            .select(
                F.lit(np_).cast("bigint").alias("nprobe"),
                F.lit(10).cast("bigint").alias("k"),
                F.col("n_scanned").cast("bigint").alias("n_scanned"),
                F.col("n_hits").cast("bigint").alias("n_hits"),
                F.round(F.col("n_hits") / 10.0, 4).alias("recall_at_k"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _ann21_sql() -> str:
    return _ANN21_SQL.format(comp=_DUCK_COMP)


REGISTRY["ann21_probe_recall_curve"].sql = _ann21_sql()


def _tx24_sql() -> str:
    from .llm.dedup import shingles_sql

    sh = shingles_sql("text", 3)
    return f"""
    WITH ds AS (
      SELECT doc_id, unnest(list_distinct({sh})) AS s FROM documents
    ),
    dfq AS (SELECT s, count(*) AS df FROM ds GROUP BY 1)
    SELECT ds.doc_id,
           cast(count(*) AS BIGINT) AS n_shingles,
           cast(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS novelty
    FROM ds JOIN dfq USING (s)
    GROUP BY 1
    """


@register("tx24_novelty_score", None)  # sql attached below
def tx24_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-novelty scoring: the fraction of a document's distinct
    3-gram shingles that appear NOWHERE else in the corpus — dd3's
    inverted index read in the opposite direction. Near-dup detection
    asks "who shares my shingles"; a curation mixer asks the dual:
    "which documents bring shingles nobody else has" — the
    upweight-the-tail signal (high novelty = unique content worth
    keeping at full budget; near-zero novelty = template mass that
    x44/x55's caps should squeeze), and the cheap proxy for the
    memorization-risk audits that count how much of a document is
    corpus-unique before training.

    Plan shape: the (doc, shingle)-type explode feeds (a) the
    document-frequency table — VOCABULARY-sized, the same economics as
    tx9's df — and (b) a hash join back keyed on the shingle, then one
    doc-keyed agg. df=1 shingles dominate real corpora, so unlike
    dd3's candidate join (which caps posting lists to bound pair
    fan-out) this consumes the df table whole: a count, not a pair
    enumeration — no cap needed at any scale. Reference analog: the
    duplicate counters of src/transform.py (A6) inverted from "how
    many copies" to "how much is mine alone"."""
    from .llm.dedup import _spread, shingles

    d = _t(spark, sf_dir, "documents")
    ds = _spread(d.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
    )
    dfq = ds.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        ds.join(dfq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias("novelty"),
        )
    )


REGISTRY["tx24_novelty_score"].sql = _tx24_sql()


_X59_SQL = """
WITH t AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1,
         ts, event_type
  FROM events
),
t2s AS (
  SELECT user_id, t1,
         min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
           OVER (PARTITION BY user_id) AS t2,
         ts, event_type
  FROM t
),
t3s AS (
  SELECT user_id, t1, t2,
         min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
           OVER (PARTITION BY user_id) AS t3
  FROM t2s
),
u AS (
  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
  FROM t3s GROUP BY 1
),
agg AS (
  SELECT count(*) AS n_users,
         sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS s1,
         sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS s2,
         sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS s3
  FROM u
)
SELECT steps.step, steps.step_name,
       cast(CASE steps.step WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END
            AS BIGINT) AS n_reached,
       cast(n_users AS BIGINT) AS n_users,
       round((CASE steps.step WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END)
             * 1.0 / n_users, 4) AS reach_frac
FROM agg CROSS JOIN (
  SELECT 1 AS step, 'view' AS step_name
  UNION ALL SELECT 2, 'view>click'
  UNION ALL SELECT 3, 'view>click>purchase'
) steps
"""


@register("x59_funnel_steps", _X59_SQL)
def x59_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: how many users complete
    view -> click -> purchase IN THAT ORDER — each step's timestamp
    must strictly follow the previous step's first completion, so a
    purchase before the first post-view click does not count (the
    semantics product analytics tools call a strict-order funnel).
    Computed without self-joins: three stacked conditional-min window
    passes over the SAME user partitioning — t1 = first view, t2 =
    first click after t1, t3 = first purchase after t2 — so Catalyst
    plans ONE user-keyed exchange for all three steps plus the
    user-level collapse; at any event volume the funnel costs one
    shuffle of (user, ts, type) triples. The step table is a 3-row
    constant joined as a broadcast. Complements x15 (sessionize) and
    st2 (session windows) in the event-analytics family.
    Reference analog: the phase-gated run_full of src/main.py — the
    same 'step k only counts after step k-1' dependency, applied to
    user behavior instead of pipeline phases."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    step1 = e.select("user_id", "ts", "event_type", t1.alias("t1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    step2 = step1.select("user_id", "ts", "event_type", "t1", t2.alias("t2"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    step3 = step2.select("user_id", "t1", "t2", t3.alias("t3"))
    u = step3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    agg = u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("t1").isNotNull().cast("int")).alias("s1"),
        F.sum(F.col("t2").isNotNull().cast("int")).alias("s2"),
        F.sum(F.col("t3").isNotNull().cast("int")).alias("s3"),
    )
    steps = spark.createDataFrame(
        [(1, "view"), (2, "view>click"), (3, "view>click>purchase")],
        "step int, step_name string",
    )
    reached = (
        F.when(F.col("step") == 1, F.col("s1"))
        .when(F.col("step") == 2, F.col("s2"))
        .otherwise(F.col("s3"))
    )
    return agg.crossJoin(F.broadcast(steps)).select(
        "step",
        "step_name",
        reached.cast("bigint").alias("n_reached"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(reached / F.col("n_users"), 4).alias("reach_frac"),
    )


_I10_SQL = """
WITH checks AS (
  SELECT 'orders.o_custkey -> customer' AS relationship,
         (SELECT count(*) FROM orders) AS n_child,
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)) AS n_orphans
  UNION ALL
  SELECT 'lineitem.l_orderkey -> orders',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem.l_partkey -> part',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'customer.c_nationkey -> nation',
         (SELECT count(*) FROM customer),
         (SELECT count(*) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = c.c_nationkey))
)
SELECT relationship, cast(n_child AS BIGINT) AS n_child,
       cast(n_orphans AS BIGINT) AS n_orphans,
       n_orphans = 0 AS intact
FROM checks
"""


@register("i10_fk_integrity_audit", _I10_SQL)
def i10_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the warehouse's FK graph:
    per declared relationship, how many child rows point at a parent
    that does not exist — the data-level counterpart of the engine's
    M4 health check (which verifies tables EXIST; this verifies they
    AGREE), and the report a load gate reads before publishing (the
    write-audit-publish pattern the warehouse ships). The reference
    declares these FKs as MySQL indexes (K6) and trusts the database
    to enforce them; a lake has no enforcing engine, so integrity is
    a QUERY you run — this one.

    Plan shape: each check is a left-anti join (child minus parents);
    dimension parents (nation) broadcast, fact-fact checks shuffle on
    the key — the same shapes j1 pins. Orphan counts are exactly zero
    on this corpus (pinned): a nonzero count is the alert."""
    checks = [
        ("orders.o_custkey -> customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
    ]
    out = None
    for rel, child, ck, parent, pk in checks:
        c = _t(spark, sf_dir, child)
        p = _t(spark, sf_dir, parent).select(pk)
        orphans = c.join(p, c[ck] == p[pk], "left_anti")
        row = c.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        ).select(
            F.lit(rel).alias("relationship"),
            F.col("n_child").cast("bigint").alias("n_child"),
            F.col("n_orphans").cast("bigint").alias("n_orphans"),
            (F.col("n_orphans") == 0).alias("intact"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_TX26_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
         greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g')))
           AS n_sentences
  FROM documents
),
m AS (
  SELECT doc_id, len(toks) AS n_words, n_sentences,
         list_aggregate(list_transform(toks, x ->
           greatest(1,
             length(regexp_replace(lower(x), '[aeiouy]+', 'V', 'g'))
             - length(replace(regexp_replace(lower(x), '[aeiouy]+', 'V', 'g'),
                              'V', '')))), 'sum') AS n_syllables
  FROM t WHERE len(toks) > 0
)
SELECT doc_id, cast(n_words AS BIGINT) AS n_words,
       cast(n_sentences AS BIGINT) AS n_sentences,
       cast(n_syllables AS BIGINT) AS n_syllables,
       -- flesch to 2 dp via EXACT integer half-up rounding of the
       -- rational (N/D)*? -- see the Spark twin for the tie story
       (((200 * (206835 * n_sentences * n_words
                 - 1015 * n_words * n_words
                 - 84600 * n_syllables * n_sentences
                 + 1000000 * n_sentences * n_words)
          + 1000 * n_sentences * n_words)
         // (2000 * n_sentences * n_words)) - 100000) / 100.0 AS flesch
FROM m
"""


@register("tx26_readability", _TX26_SQL)
def tx26_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    score (206.835 - 1.015*words/sentences - 84.6*syllables/word)
    with the standard cheap proxies: sentences = terminal-punctuation
    count (floored at 1), syllables = vowel GROUPS per word (floored
    at 1 — 'strength' has one group, 'audio' three). Readability is a
    curation axis orthogonal to tx15's structural rules and tx23's
    learned score: a kids-corpus mix target, a legal-text detector,
    or a curriculum key (x42 ordered by perplexity; reading ease is
    the human-facing analog). Both engines count groups by the same
    collapse-to-sentinel trick (regexp_replace group -> 'V', count
    the V's), so the score is engine-exact.

    Plan shape: the zero-shuffle ideal — every column is a map-side
    expression over the token array (F.aggregate/F.transform; no
    explode, no exchange of any kind), x53's economics applied to
    scoring. Reference analog: the per-row banding functions of
    src/transform.py (F6/F10), upgraded to a composite linguistic
    score."""
    from .llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_words = F.size(toks)
    n_sentences = F.greatest(
        F.lit(1),
        F.length(F.regexp_replace(F.col("text"), r"[^.!?]", "")),
    )
    groups = lambda t: F.regexp_replace(F.lower(t), "[aeiouy]+", "V")  # noqa: E731
    syl = lambda t: F.greatest(  # noqa: E731
        F.lit(1),
        F.length(groups(t))
        - F.length(F.regexp_replace(groups(t), "V", "")),
    )
    n_syllables = F.aggregate(
        F.transform(toks, syl), F.lit(0), lambda a, x: a + x
    )
    out = d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sentences.cast("bigint").alias("n_sentences"),
        n_syllables.cast("bigint").alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    # flesch = N/D with N = 206835*s*w - 1015*w^2 - 84600*y*s and
    # D = 1000*s*w — an exact rational. Rounding THAT to 2 dp in
    # doubles hits engine-split ties (Spark rounds the shortest
    # decimal repr half-up, DuckDB rounds the double — 85.165 split
    # them in testing), so the half-up round happens in EXACT bigint
    # arithmetic: floor((200N + D) / (2D)) / 100 — computed on a
    # +1000-shifted value so the dividend is always positive
    # (truncating and flooring division agree, sidestepping the
    # engines' negative-division split observed in testing).
    w_, s_, y_ = F.col("n_words"), F.col("n_sentences"), F.col("n_syllables")
    n_num = (
        F.lit(206835) * s_ * w_ - F.lit(1015) * w_ * w_
        - F.lit(84600) * y_ * s_
        + F.lit(1000000) * s_ * w_  # +1000 flesch points, removed below
    )
    d_den = F.lit(1000) * s_ * w_
    # decimal (not double) division keeps the quotient exact past
    # 2^53 — a 10^6-token document would otherwise overflow double
    # integer precision and split the engines by one ulp at the cut
    flesch_c = (
        F.floor(
            (200 * n_num + d_den).cast("decimal(38,0)")
            / (2 * d_den).cast("decimal(38,0)")
        ).cast("bigint")
        - F.lit(100000)
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (flesch_c / 100.0).alias("flesch"),
    )


def _dd17_sql() -> str:
    agree = " + ".join(
        f"CASE WHEN sa.s{j} = sb.s{j} THEN 1 ELSE 0 END" for j in range(16)
    )
    return f"""
    WITH {_minhash_ctes(max_bucket_size="auto")},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.a, p.b, count(*) AS i
      FROM mh_pairs p
      JOIN sh x ON x.doc_id = p.a
      JOIN sh y ON y.doc_id = p.b AND y.s = x.s
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.a, p.b,
             ({agree}) / 16.0 AS est,
             coalesce(i, 0) * 1.0
               / (za.n + zb.n - coalesce(i, 0)) AS truth
      FROM mh_pairs p
      LEFT JOIN inter ON inter.a = p.a AND inter.b = p.b
      JOIN sizes za ON za.doc_id = p.a
      JOIN sizes zb ON zb.doc_id = p.b
      JOIN sig sa ON sa.doc_id = p.a
      JOIN sig sb ON sb.doc_id = p.b
    )
    SELECT cast(count(*) AS BIGINT) AS n_pairs,
           round(avg(abs(est - truth)), 4) AS mae,
           round(max(abs(est - truth)), 4) AS max_abs_err,
           round(avg(est - truth), 4) AS bias
    FROM scored
    """


@register("dd17_minhash_estimator_error", None)  # sql attached below
def dd17_minhash_estimator_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The MinHash ESTIMATOR's numeric contract — the third leg of the
    near-dup verification stool: ann6 measures what bucketing costs in
    recall, dd14 what it costs in precision, and this measures the
    estimator itself: over dd2's candidate pairs, how far does the
    16-component signature-agreement fraction sit from the exact
    Jaccard it estimates (E[s_j(a)=s_j(b)] = J)? Emits MAE, worst
    case, and signed bias in one row. With k=16 the theoretical
    standard error at J=0.5 is sqrt(J(1-J)/k) ~ 0.125 — the measured
    MAE is the verified counterpart, and a corpus whose MAE breaks
    away from that band has correlated shingles (boilerplate) that
    the banding parameters should be retuned for.

    Plan shape: the candidate pairs and signature table share one
    shingle pipeline (both sides of dd2's index); the error join is
    pair-keyed; the report is one row. The exact-Jaccard side is the
    contract's truth and exists only here — production serves the
    estimate."""
    from .llm.dedup import (
        _spread,
        minhash_lsh_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size="auto", materialize=True
    ).localCheckpoint(eager=True)
    sigs = minhash_signatures(docs, "text", "doc_id")
    sh = _spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # exact intersection via the shingle co-occurrence join (dd14's form)
    sha = sh.select(F.col("doc_id").alias("a"), "s")
    shb = sh.select(F.col("doc_id").alias("b"), "s")
    inter = (
        pairs.join(sha, "a").join(shb, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sigs.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"s{j}").alias(f"sa{j}") for j in range(16)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"s{j}").alias(f"sb{j}") for j in range(16)],
    )
    agree = sum(
        F.when(F.col(f"sa{j}") == F.col(f"sb{j}"), 1).otherwise(0)
        for j in range(16)
    )
    za = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    scored = (
        pairs.join(inter, ["a", "b"], "left")
        .join(za, "a")
        .join(zb, "b")
        .join(sa, "a")
        .join(sb, "b")
        .select(
            (agree / F.lit(16.0)).alias("est"),
            (
                F.coalesce(F.col("i"), F.lit(0))
                / (
                    F.col("na")
                    + F.col("nb")
                    - F.coalesce(F.col("i"), F.lit(0))
                )
            ).alias("truth"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg(F.abs(F.col("est") - F.col("truth"))), 4).alias("mae"),
        F.round(F.max(F.abs(F.col("est") - F.col("truth"))), 4).alias(
            "max_abs_err"
        ),
        F.round(F.avg(F.col("est") - F.col("truth")), 4).alias("bias"),
    )


REGISTRY["dd17_minhash_estimator_error"].sql = _dd17_sql()


def _dd18_sql() -> str:
    toks = "string_split_regex(trim(text), '\\s+')"
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, len(t) AS n_tokens, t,
             unnest(range(1, greatest(len(t) - 7, 0) + 1)) AS start
      FROM toks
    ),
    grams AS (
      SELECT doc_id, n_tokens, start,
             array_to_string(list_slice(t, start, start + 7), ' ') AS s
      FROM pos
    ),
    bench AS (SELECT DISTINCT s FROM grams WHERE doc_id % 29 = 0),
    hits AS (
      SELECT g.doc_id, g.n_tokens, g.start, g.start + 7 AS fin
      FROM grams g JOIN bench USING (s)
      WHERE g.doc_id % 29 <> 0
    ),
    isl AS (
      SELECT doc_id, n_tokens, start, fin,
             CASE WHEN start > coalesce(max(fin) OVER (
                    PARTITION BY doc_id ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) + 1
                  THEN 1 ELSE 0 END AS newspan
      FROM hits
    ),
    spans AS (
      SELECT doc_id, n_tokens, start, fin,
             sum(newspan) OVER (PARTITION BY doc_id ORDER BY start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS span_id
      FROM isl
    ),
    merged AS (
      SELECT doc_id, n_tokens, span_id,
             min(start) AS s0, max(fin) AS s1, count(*) AS n_grams
      FROM spans GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           cast(n_tokens AS BIGINT) AS n_tokens,
           cast(sum(n_grams) AS BIGINT) AS n_matched_grams,
           cast(count(*) AS BIGINT) AS n_spans,
           cast(sum(s1 - s0 + 1) AS BIGINT) AS covered_tokens,
           round(sum(s1 - s0 + 1) * 1.0 / n_tokens, 4)
             AS contamination_frac
    FROM merged GROUP BY doc_id, n_tokens
    """


@register("dd18_exact_span_decontaminate", None, first_round=9)
def dd18_exact_span_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-match span decontamination (the GPT-3/PaLM recipe): every
    corpus document is scanned for token 8-grams that appear VERBATIM
    in the benchmark split (doc_id % 29 = 0, dd8's convention), the
    matched [start, start+7] token intervals are merged into maximal
    contaminated spans (overlapping OR adjacent intervals coalesce),
    and each contaminated document reports its span count and the
    fraction of its tokens covered. dd8 answers "does this doc share
    shingles with the benchmark" (a set-overlap signal that tolerates
    paraphrase); this is the stricter positional contract — exact
    contiguous reproductions and HOW MUCH of the document they cover —
    which is what the published decontamination procedures actually
    threshold on before dropping or splitting documents.

    Plan shape: benchmark 8-grams are benchmark-sized and BROADCAST to
    the corpus gram stream — the corpus never shuffles on gram content
    (dd8's scale rule). After the match, everything is keyed on doc_id:
    one window pair (running max-end -> island ids, the gaps-and-
    islands merge) and two doc-keyed aggs, all hash-partitioned on
    doc_id with sizes bounded by matched grams, not corpus grams. At
    100 TB the only corpus-sized stages are the gram projection (map-
    side) and the broadcast-hash match. Reference analog: the
    staging-vs-final reconciliation of src/load.py lifted from row
    counts to span content."""
    from .llm.dedup import shingles, tokens

    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.posexplode(shingles(F.col("text"), 8)).alias("p", "s"),
    ).select(
        "doc_id", "n_tokens", (F.col("p") + 1).alias("start"), "s"
    )
    bench = (
        grams.filter(F.col("doc_id") % 29 == 0).select("s").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % 29 != 0)
        .join(F.broadcast(bench), "s")
        .select(
            "doc_id", "n_tokens", "start",
            (F.col("start") + 7).alias("fin"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("start")
    prev_fin = F.max("fin").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = hits.withColumn(
        "newspan",
        (F.col("start") > F.coalesce(prev_fin, F.lit(-1)) + 1).cast("int"),
    )
    spans = isl.withColumn(
        "span_id",
        F.sum("newspan").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = (
        spans.withColumn("n_tokens", F.col("n_tokens").cast("bigint"))
        .groupBy("doc_id", "n_tokens", "span_id")
        .agg(
            F.min("start").alias("s0"),
            F.max("fin").alias("s1"),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )
    return merged.groupBy("doc_id", "n_tokens").agg(
        F.sum("n_grams").cast("bigint").alias("n_matched_grams"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("s1") - F.col("s0") + 1)
        .cast("bigint")
        .alias("covered_tokens"),
        F.round(
            F.sum(F.col("s1") - F.col("s0") + 1) / F.col("n_tokens"), 4
        ).alias("contamination_frac"),
    )


REGISTRY["dd18_exact_span_decontaminate"].sql = _dd18_sql()


_X63_SQL = """
WITH base AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN event_type <> 'error' AND value IS NOT NULL
              THEN value END AS vv,
         CASE WHEN event_type <> 'error' AND value IS NOT NULL
              THEN epoch(ts) END AS vt
  FROM events
),
nbr AS (
  SELECT event_id, user_id, ts, event_type, epoch(ts) AS t,
         last_value(vv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         last_value(vt IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
         first_value(vv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
         first_value(vt IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
  FROM base
)
SELECT event_id, user_id, ts,
       round(coalesce(
         CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           CASE WHEN nt > pt
                THEN pv + (nv - pv) * (t - pt) / (nt - pt)
                ELSE (pv + nv) / 2 END
         END, pv, nv), 4) AS value_filled
FROM nbr WHERE event_type = 'error'
"""


@register("x63_gap_fill_interpolate", _X63_SQL, first_round=9)
def x63_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation of missing telemetry: 'error'
    events carry no usable reading, so each one is repaired from its
    user's nearest valid readings on either side, weighted by how far
    (in event time) the gap sits between them — the standard sensor/
    metrics gap-repair that x9's step-wise forward-fill cannot express
    (ffill holds the LAST value flat; interpolation follows the trend
    line between neighbors). Edge gaps degrade gracefully: only a
    previous neighbor -> carry it forward; only a next -> carry it
    back; same-timestamp neighbors -> midpoint (no zero division).

    Plan shape: ONE user-keyed sort carries all four IGNORE-NULLS
    neighbor windows (same partition + order -> one exchange, one
    sort); everything else is map-side arithmetic. No joins, no
    self-join on time ranges — the classic interpolate-by-join
    formulation shuffles the table twice and breaks at skewed users,
    while the window form scales with the user-key partitioning at any
    event volume."""
    e = _t(spark, sf_dir, "events")
    # TZ-independent epoch seconds on the NTZ column (unix_micros
    # rejects NTZ; a cast would bind the driver session's timezone)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " ts)"
    ) / F.lit(1_000_000.0)
    # Anchor BOTH the value and its timestamp at value-BEARING valid
    # events: a valid event whose reading is NULL must contribute
    # neither (else pv and pt come from different events and the
    # interpolation weight is wrong) — r9 advice fix.
    valid = (F.col("event_type") != "error") & F.col("value").isNotNull()
    base = e.select(
        "event_id", "user_id", "ts", "event_type",
        us.alias("t"),
        F.when(valid, F.col("value")).alias("vv"),
        F.when(valid, us).alias("vt"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    wn = w.rowsBetween(1, Window.unboundedFollowing)
    nbr = base.select(
        "event_id", "user_id", "ts", "event_type", "t",
        F.last("vv", ignorenulls=True).over(wp).alias("pv"),
        F.last("vt", ignorenulls=True).over(wp).alias("pt"),
        F.first("vv", ignorenulls=True).over(wn).alias("nv"),
        F.first("vt", ignorenulls=True).over(wn).alias("nt"),
    )
    both = F.when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.when(
            F.col("nt") > F.col("pt"),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("t") - F.col("pt"))
            / (F.col("nt") - F.col("pt")),
        ).otherwise((F.col("pv") + F.col("nv")) / 2),
    )
    return nbr.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts",
        F.round(F.coalesce(both, F.col("pv"), F.col("nv")), 4).alias(
            "value_filled"
        ),
    )


_X64_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, day, n,
         avg(n) OVER (PARTITION BY event_type) AS mu,
         stddev_pop(n) OVER (PARTITION BY event_type) AS sd
  FROM daily
),
ps AS (
  SELECT event_type, day, n, sd,
         sum(n - (mu + 0.5 * sd)) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM st
),
cu AS (
  SELECT event_type, day, n, sd,
         s - least(0, min(s) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum
  FROM ps
)
SELECT event_type, cast(day AS TIMESTAMP) AS day, cast(n AS BIGINT) AS n,
       round(cusum, 4) AS cusum,
       cast(CASE WHEN cusum > 4 * sd THEN 1 ELSE 0 END AS BIGINT)
         AS changepoint
FROM cu
"""


@register("x64_cusum_changepoint", _X64_SQL, first_round=9)
def x64_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection over each event type's
    daily volume — the drift monitor that catches a sustained upward
    shift long before any single day trips a static threshold. The
    textbook recursion S_t = max(0, S_{t-1} + (x_t - k)) (allowance
    k = mu + 0.5*sd, alarm at 4*sd) is NOT window-expressible as
    written; it is rewritten exactly as S_t = ps_t - min(0,
    running_min(ps)) over the plain prefix sum ps — two ordered
    windows replace the sequential recursion, which is what makes a
    recursive detector runnable as a distributed plan at all.

    Plan shape: the only data-sized stage is the (type, day) count
    agg (map-side partials, then a matrix-sized result); the stats
    window and both ordered windows run over the daily matrix
    (|types| x |days| rows), partitioned by event_type — never a
    global sort, never a single-partition exchange. The mean is exact
    (integer sums in doubles); sd enters only scaled by 0.5 into the
    prefix drift, so cross-engine ulp differences stay orders below
    the 4-dp rounding."""
    from .operators.aggregate import cusum_over_daily, daily_counts

    e = _t(spark, sf_dir, "events")
    out = cusum_over_daily(daily_counts(e, "event_type", "ts"))
    return out.select(
        F.col("k").alias("event_type"), "day", "n", "cusum", "changepoint"
    )


_X66_SQL = """
WITH fv AS (
  SELECT user_id, min(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY 1
),
fp AS (
  SELECT e.user_id, min(e.ts) AS first_purchase
  FROM events e JOIN fv ON fv.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
  GROUP BY 1
)
SELECT fv.user_id, fv.first_view, fp.first_purchase,
       round(epoch(fp.first_purchase) - epoch(fv.first_view), 2)
         AS lag_sec
FROM fv JOIN fp ON fp.user_id = fv.user_id
"""


@register("x66_conversion_lag", _X66_SQL, first_round=9)
def x66_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: for every user, the wall-clock gap between
    their FIRST view and their first purchase at-or-after it — the
    latency dimension x59's funnel (which counts WHO converts) does
    not report, and the input to conversion-SLA percentiles and
    marketing-window tuning.

    Plan shape: one scan feeds both user-keyed min-aggs (view firsts,
    then qualifying-purchase firsts); the qualifying filter is an
    equi-join on user_id with the ts predicate evaluated as a join
    residual — never an interval/range join, so no row explosion at
    any event volume. All three stages share the user_id key, so AQE
    can reuse one partitioning end-to-end; output is bounded by the
    converting-user count."""
    e = _t(spark, sf_dir, "events")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lag = F.expr(
        "timestampdiff(MICROSECOND, first_view, first_purchase)"
    ) / F.lit(1_000_000.0)
    return fv.join(fp, "user_id").select(
        "user_id", "first_view", "first_purchase",
        F.round(lag, 2).alias("lag_sec"),
    )


_I11_SQL = """
WITH old_snap AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 11 <> 0
),
new_snap AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0
              THEN round(c_acctbal + 100, 2) ELSE c_acctbal END
           AS c_acctbal
  FROM customer WHERE c_custkey % 13 <> 0
)
SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'insert'
            WHEN n.c_custkey IS NULL THEN 'delete'
            ELSE 'update' END AS op,
       round(o.c_acctbal, 2) AS old_acctbal,
       round(n.c_acctbal, 2) AS new_acctbal
FROM old_snap o FULL OUTER JOIN new_snap n ON n.c_custkey = o.c_custkey
WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
   OR o.c_acctbal <> n.c_acctbal
"""


@register("i11_snapshot_cdc_extract", _I11_SQL, first_round=9)
def i11_snapshot_cdc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC stream EXTRACTION from two table snapshots — the inverse of
    x25 (which APPLIES a change stream): a full-outer diff on the
    primary key classifies every divergent row as insert / delete /
    update and emits old/new values, turning periodic snapshot dumps
    into the change feed an incremental consumer (x25, the streaming
    MERGE sink, a downstream warehouse) expects. This is how CDC gets
    backfilled when the source system offers no binlog — the
    complement the reference's ON-DUPLICATE-KEY loader
    (src/extract.py:328-357) assumes exists upstream. Snapshots are
    derived deterministically from `customer` (old: keys % 11 != 0;
    new: keys % 13 != 0 with acctbal +100 on keys % 5 == 0) so the
    oracle replays them exactly.

    Plan shape: ONE scan feeds both snapshot projections (map-side
    filters); the full-outer join is keyed on the PK, so at any table
    size the work is one co-partitioned shuffle — and unchanged rows
    are dropped by a join residual, never materialized. Output is
    bounded by the churn, not the table."""
    c = _t(spark, sf_dir, "customer")
    old = c.filter(F.col("c_custkey") % 11 != 0).select(
        F.col("c_custkey").alias("o_key"),
        F.round("c_acctbal", 2).alias("old_acctbal"),
    )
    new = c.filter(F.col("c_custkey") % 13 != 0).select(
        F.col("c_custkey").alias("n_key"),
        F.when(
            F.col("c_custkey") % 5 == 0,
            F.round(F.col("c_acctbal") + 100, 2),
        )
        .otherwise(F.round("c_acctbal", 2))
        .alias("new_acctbal"),
    )
    diff = old.join(
        new, old["o_key"] == new["n_key"], "full_outer"
    ).filter(
        F.col("o_key").isNull()
        | F.col("n_key").isNull()
        | (F.col("old_acctbal") != F.col("new_acctbal"))
    )
    return diff.select(
        F.coalesce("o_key", "n_key").alias("c_custkey"),
        F.when(F.col("o_key").isNull(), "insert")
        .when(F.col("n_key").isNull(), "delete")
        .otherwise("update")
        .alias("op"),
        "old_acctbal",
        "new_acctbal",
    )


_X67_SQL = """
WITH buy AS (
  SELECT DISTINCT l_partkey AS pk, o_custkey AS ck
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
pairs AS (
  SELECT a.ck AS a, b.ck AS b
  FROM buy a JOIN buy b ON b.pk = a.pk AND a.ck < b.ck
  GROUP BY 1, 2 HAVING count(*) >= 3
),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM pairs UNION ALL SELECT b AS v FROM pairs
  ) GROUP BY 1
),
dstat AS (
  SELECT cast(count(*) AS BIGINT) AS n_nodes,
         sum(d * (d - 1) / 2.0) AS wedges
  FROM deg
),
estat AS (SELECT cast(count(*) AS BIGINT) AS n_edges FROM pairs),
tri AS (
  SELECT cast(count(*) AS BIGINT) AS n_triangles
  FROM pairs e1
  JOIN pairs e2 ON e2.a = e1.b
  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT n_nodes, n_edges, n_triangles,
       round(3.0 * n_triangles / wedges, 6) AS global_clustering
FROM dstat, estat, tri
"""


@register("x67_copurchase_triangles", _X67_SQL, first_round=9)
def x67_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient over the
    co-purchase graph — customers become neighbors when they bought
    >= 3 common parts (the support threshold that turns the bipartite
    projection into a meaningful similarity graph instead of a hairball),
    and the triangle census over that graph is the standard cohesion
    measure behind community detection and recommendation neighborhoods.
    Complements x51 (PageRank = centrality on a directed similarity
    graph) with the undirected local-structure statistic.

    Plan shape: the bipartite projection is a part-keyed self-join
    (fan-out bounded by buyers-per-part, the same inverted-index
    economics as dd3); the thresholded edge list is eagerly
    checkpointed ONCE and reused by the degree pass and all three legs
    of the triangle join — without the pin Spark would rebuild the
    projection five times. Triangle enumeration is two hash joins on
    edge endpoints with the a<b orientation guaranteeing each triangle
    counted exactly once — never an all-pairs stage; work scales with
    the edge list, which the support threshold keeps sparse as the
    customer count grows (co-purchase collisions thin out at fixed
    basket size)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    buy = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_partkey").alias("pk"), F.col("o_custkey").alias("ck")
        )
        .distinct()
    )
    a, b = buy.alias("ea"), buy.alias("eb")
    pairs = (
        a.join(
            b,
            (F.col("ea.pk") == F.col("eb.pk"))
            & (F.col("ea.ck") < F.col("eb.ck")),
        )
        .groupBy(
            F.col("ea.ck").alias("a"), F.col("eb.ck").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 3)
        .select("a", "b")
        .localCheckpoint(eager=True)  # reused 5x: degrees + 3 join legs
    )
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dstat = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2.0).alias("wedges"),
    )
    estat = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        dstat.crossJoin(estat)
        .crossJoin(tri)
        .select(
            "n_nodes", "n_edges", "n_triangles",
            F.round(3.0 * F.col("n_triangles") / F.col("wedges"), 6).alias(
                "global_clustering"
            ),
        )
    )


def _hh6_sql() -> str:
    from .llm.dedup import _hexint_sql

    hv = _hexint_sql("md5(cast(user_id AS VARCHAR))", 15)
    return f"""
    WITH uh AS (
      SELECT DISTINCT event_type AS t, user_id FROM events
    ),
    h AS (SELECT DISTINCT t, {hv} AS hv FROM uh),
    ranked AS (
      SELECT t, hv, row_number() OVER (PARTITION BY t ORDER BY hv) AS rn
      FROM h
    ),
    sk AS (
      SELECT t, max(CASE WHEN rn = 64 THEN hv END) AS hk,
             count(*) AS nh
      FROM ranked GROUP BY 1
    ),
    est1 AS (
      SELECT t, CASE WHEN nh < 64 THEN cast(nh AS DOUBLE)
                ELSE 63.0 * cast(1152921504606846976 AS DOUBLE) / hk END
               AS est
      FROM sk
    ),
    exact1 AS (SELECT t, count(*) AS n FROM uh GROUP BY 1),
    prs AS (
      SELECT a.t AS ta, b.t AS tb
      FROM (SELECT DISTINCT t FROM uh) a
      JOIN (SELECT DISTINCT t FROM uh) b ON a.t < b.t
    ),
    members AS (
      SELECT ta, tb, ta AS m FROM prs
      UNION ALL SELECT ta, tb, tb AS m FROM prs
    ),
    uhash AS (
      SELECT DISTINCT ms.ta, ms.tb, h.hv
      FROM members ms JOIN h ON h.t = ms.m
    ),
    uranked AS (
      SELECT ta, tb, hv,
             row_number() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn
      FROM uhash
    ),
    usk AS (
      SELECT ta, tb, max(CASE WHEN rn = 64 THEN hv END) AS hk,
             count(*) AS nh
      FROM uranked GROUP BY 1, 2
    ),
    estu AS (
      SELECT ta, tb,
             CASE WHEN nh < 64 THEN cast(nh AS DOUBLE)
             ELSE 63.0 * cast(1152921504606846976 AS DOUBLE) / hk END
               AS est_union
      FROM usk
    ),
    einter AS (
      SELECT x.t AS ta, y.t AS tb, count(*) AS n_inter
      FROM uh x JOIN uh y ON y.user_id = x.user_id AND x.t < y.t
      GROUP BY 1, 2
    )
    SELECT e.ta, e.tb,
           round(e.est_union, 2) AS est_union,
           cast(xa.n + xb.n - coalesce(ei.n_inter, 0) AS BIGINT)
             AS exact_union,
           round(ea.est + eb.est - e.est_union, 2) AS est_inter,
           cast(coalesce(ei.n_inter, 0) AS BIGINT) AS exact_inter,
           round(abs(e.est_union - (xa.n + xb.n - coalesce(ei.n_inter, 0)))
                 / (xa.n + xb.n - coalesce(ei.n_inter, 0)), 4)
             AS rel_err_union
    FROM estu e
    JOIN est1 ea ON ea.t = e.ta
    JOIN est1 eb ON eb.t = e.tb
    JOIN exact1 xa ON xa.t = e.ta
    JOIN exact1 xb ON xb.t = e.tb
    LEFT JOIN einter ei ON ei.ta = e.ta AND ei.tb = e.tb
    """


@register("hh6_kmv_overlap", None, first_round=9)
def hh6_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k theta) sketch set operations:
    per-event-type audiences sketched as their 64 smallest md5-derived
    user hashes, then UNION cardinality estimated from the merged
    sketch's 64th value and INTERSECTION by inclusion-exclusion — the
    mergeable-sketch algebra behind audience-overlap dashboards, where
    exact pairwise distinct-intersections over raw IDs are the
    quadratic cost you refuse to pay at 100 TB. Sketches are unioned
    by taking the bottom-k of concatenated sketches — the same
    commutative-monoid shape as hh2/hh4/x41, so the per-type sketches
    persist and merge incrementally. Every estimate row carries its
    exact contract (hh4's discipline): exact_union / exact_inter and
    the union relative error are computed alongside, so the
    approximation is a verified number, not a hope.

    Plan shape: one distinct over (type, user) is the only data-sized
    stage; everything downstream operates on k-sized sketches (<= 64
    rows per type / per pair) and a |types|^2 pair frame. The exact
    contract side is a user-keyed self-join — contract-only, exactly
    like hh4's truth leg; production serves the sketch."""
    from .llm.sketch import kmv_bottomk, kmv_estimate, kmv_hash

    e = _t(spark, sf_dir, "events")
    uh = e.select(
        F.col("event_type").alias("t"), F.col("user_id").alias("u")
    ).distinct()
    h = uh.select("t", kmv_hash(F.col("u")).alias("hv"))
    sk_t = kmv_bottomk(h, ["t"])
    est1 = kmv_estimate(sk_t, ["t"]).select("t", "est")
    exact1 = uh.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    types = uh.select("t").distinct()
    ta, tb = types.alias("pa"), types.alias("pb")
    prs = ta.join(tb, F.col("pa.t") < F.col("pb.t")).select(
        F.col("pa.t").alias("ta"), F.col("pb.t").alias("tb")
    )
    members = prs.select("ta", "tb", F.col("ta").alias("m")).unionAll(
        prs.select("ta", "tb", F.col("tb").alias("m"))
    )
    # pair-union sketches are merged from the per-type SKETCHES, not
    # the raw hash sets — the union monoid guarantees bottom-k(A ∪ B)
    # = bottom-k(bottom-k(A) ∪ bottom-k(B)), which is exactly how
    # persisted sketches merge at serving time
    uhash = (
        members.join(sk_t, sk_t["t"] == F.col("m"))
        .select("ta", "tb", "hv")
        .distinct()
    )
    usk = kmv_bottomk(uhash, ["ta", "tb"])
    estu = kmv_estimate(usk, ["ta", "tb"]).select(
        "ta", "tb", F.col("est").alias("est_union")
    )
    x, y = uh.alias("ia"), uh.alias("ib")
    einter = (
        x.join(
            y,
            (F.col("ib.u") == F.col("ia.u"))
            & (F.col("ia.t") < F.col("ib.t")),
        )
        .groupBy(F.col("ia.t").alias("ta"), F.col("ib.t").alias("tb"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ea = est1.select(F.col("t").alias("ta"), F.col("est").alias("ea"))
    eb = est1.select(F.col("t").alias("tb"), F.col("est").alias("eb"))
    xa = exact1.select(F.col("t").alias("ta"), F.col("n").alias("na"))
    xb = exact1.select(F.col("t").alias("tb"), F.col("n").alias("nb"))
    out = (
        estu.join(ea, "ta")
        .join(eb, "tb")
        .join(xa, "ta")
        .join(xb, "tb")
        .join(einter, ["ta", "tb"], "left")
    )
    exact_union = (
        F.col("na") + F.col("nb") - F.coalesce(F.col("n_inter"), F.lit(0))
    )
    return out.select(
        "ta", "tb",
        F.round("est_union", 2).alias("est_union"),
        exact_union.cast("bigint").alias("exact_union"),
        F.round(F.col("ea") + F.col("eb") - F.col("est_union"), 2).alias(
            "est_inter"
        ),
        F.coalesce(F.col("n_inter"), F.lit(0))
        .cast("bigint")
        .alias("exact_inter"),
        F.round(
            F.abs(F.col("est_union") - exact_union) / exact_union, 4
        ).alias("rel_err_union"),
    )


REGISTRY["hh6_kmv_overlap"].sql = _hh6_sql()


_X68_SQL = """
WITH buy AS (
  SELECT DISTINCT l_partkey AS pk, o_custkey AS ck
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
sizes AS (SELECT pk, count(*) AS n FROM buy GROUP BY 1),
inter AS (
  SELECT a.pk AS pa, b.pk AS pb, count(*) AS i
  FROM buy a JOIN buy b ON b.ck = a.ck AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= 2
),
sym AS (
  SELECT pa AS p, pb AS q, i FROM inter
  UNION ALL SELECT pb AS p, pa AS q, i FROM inter
),
jac AS (
  SELECT s.p, s.q, s.i,
         s.i * 1.0 / (sa.n + sb.n - s.i) AS j
  FROM sym s JOIN sizes sa ON sa.pk = s.p JOIN sizes sb ON sb.pk = s.q
),
ranked AS (
  SELECT p, q, i, j,
         row_number() OVER (PARTITION BY p ORDER BY j DESC, q) AS rnk
  FROM jac
)
SELECT p AS partkey, q AS neighbor,
       cast(i AS BIGINT) AS n_common_buyers,
       round(j, 4) AS jaccard,
       cast(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 5
"""


@register("x68_item_similarity_topk", _X68_SQL, first_round=9)
def x68_item_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for every part, its top-5
    most similar parts by Jaccard similarity of buyer sets (support
    >= 2 common buyers) — the classic neighborhood model behind
    "customers who bought this also bought", and the item-side
    complement of x67's customer-graph census. Ties rank
    deterministically (similarity desc, then neighbor id).

    Plan shape: the co-occurrence build is a buyer-keyed self-join
    (inverted-index economics — fan-out bounded by parts-per-buyer,
    the basket size, which does NOT grow with catalog or customer
    count); sizes join back as a part-keyed table. The top-5 cut is a
    row_number + filter that compiles to WindowGroupLimit, so each
    partition keeps a 5-element heap per part instead of sorting the
    full similarity list — the shape that keeps the cut constant-
    memory at any catalog size. No all-pairs stage anywhere: parts
    never meet unless a real basket joins them."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    buy = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_partkey").alias("pk"), F.col("o_custkey").alias("ck")
        )
        .distinct()
    )
    sizes = buy.groupBy("pk").agg(F.count(F.lit(1)).alias("n"))
    a, b = buy.alias("ba"), buy.alias("bb")
    inter = (
        a.join(
            b,
            (F.col("bb.ck") == F.col("ba.ck"))
            & (F.col("ba.pk") < F.col("bb.pk")),
        )
        .groupBy(F.col("ba.pk").alias("pa"), F.col("bb.pk").alias("pb"))
        .agg(F.count(F.lit(1)).alias("i"))
        .filter(F.col("i") >= 2)
    )
    sym = inter.select(
        F.col("pa").alias("p"), F.col("pb").alias("q"), "i"
    ).unionAll(
        inter.select(F.col("pb").alias("p"), F.col("pa").alias("q"), "i")
    )
    sa = sizes.select(F.col("pk").alias("p"), F.col("n").alias("na"))
    sb = sizes.select(F.col("pk").alias("q"), F.col("n").alias("nb"))
    jac = (
        sym.join(sa, "p")
        .join(sb, "q")
        .select(
            "p", "q", "i",
            (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).alias(
                "j"
            ),
        )
    )
    w = Window.partitionBy("p").orderBy(F.col("j").desc(), "q")
    return (
        jac.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            F.col("p").alias("partkey"),
            F.col("q").alias("neighbor"),
            F.col("i").cast("bigint").alias("n_common_buyers"),
            F.round("j", 4).alias("jaccard"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_X77_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
dw AS (
  SELECT event_type, isodow(day) AS isodow, n FROM daily
),
prof AS (
  SELECT event_type, isodow,
         count(*) AS n_days,
         avg(n) AS dow_mean
  FROM dw GROUP BY 1, 2
),
overall AS (
  SELECT event_type, avg(n) AS o_mean FROM dw GROUP BY 1
)
SELECT p.event_type, cast(p.isodow AS BIGINT) AS isodow,
       cast(p.n_days AS BIGINT) AS n_days,
       round(p.dow_mean, 4) AS dow_mean,
       round(p.dow_mean / o.o_mean, 4) AS seasonal_index
FROM prof p JOIN overall o ON o.event_type = p.event_type
"""


@register("x77_seasonal_profile", _X77_SQL, first_round=9)
def x77_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile per event type: the mean daily
    volume for each ISO weekday and its seasonal index (ratio to the
    type's overall daily mean) — the baseline a monitor divides out
    before alerting, so Saturday's dip stops looking like an incident
    (x64's CUSUM detects level SHIFTS; this captures the periodic
    component those shifts are judged against).

    Plan shape: identical economics to x64 — one (type, day) count
    agg is the only event-sized stage, then every frame is the
    |types| x 7 profile matrix; means are exact-integer sums divided
    by counts, so the cross-engine float story is trivial."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    dw = daily.select(
        "event_type", (F.weekday("day") + 1).alias("isodow"), "n"
    )
    prof = dw.groupBy("event_type", "isodow").agg(
        F.count(F.lit(1)).alias("n_days"), F.avg("n").alias("dow_mean")
    )
    overall = dw.groupBy("event_type").agg(F.avg("n").alias("o_mean"))
    return prof.join(F.broadcast(overall), "event_type").select(
        "event_type",
        F.col("isodow").cast("bigint").alias("isodow"),
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round("dow_mean", 4).alias("dow_mean"),
        F.round(F.col("dow_mean") / F.col("o_mean"), 4).alias(
            "seasonal_index"
        ),
    )


_X78_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         date_diff('day',
                   min(day) OVER (PARTITION BY event_type), day) AS t
  FROM daily
),
s AS (
  SELECT event_type,
         count(*) AS n, sum(t) AS st, sum(y) AS sy,
         sum(t * y) AS sty, sum(t * t) AS stt, max(t) AS tmax
  FROM idx GROUP BY 1
),
fit AS (
  SELECT event_type, n, tmax,
         (n * sty - st * sy) * 1e0 / (n * stt - st * st) AS slope,
         (sy - (n * sty - st * sy) * 1e0 / (n * stt - st * st) * st)
           / n AS intercept
  FROM s
)
SELECT event_type, cast(n AS BIGINT) AS n_days,
       round(slope, 6) AS slope,
       round(intercept, 4) AS intercept,
       round(intercept + slope * (tmax + 7), 2) AS forecast_next_week
FROM fit
"""


@register("x78_trend_forecast", _X78_SQL, first_round=9)
def x78_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear trend fit + one-week-ahead forecast per event type:
    closed-form OLS over the daily volume series (slope in
    events/day, intercept, and the projected volume 7 days past the
    last observation) — the capacity-planning readout that tells you
    WHEN a queue outgrows its workers, complementing x64 (is the
    level shifting NOW) and x77 (what is periodic). Every OLS moment
    (sum t, sum y, sum ty, sum t^2) is an exact integer sum — day
    indexes and counts are small ints, so the normal equations carry
    ZERO float accumulation and both engines divide identical
    integers.

    Plan shape: the (type, day) count agg is the only event-sized
    stage; the index window and moment agg run over the daily matrix
    keyed on type; the fit is a |types|-row projection."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wt = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type", "y",
        F.datediff(F.col("day"), F.min("day").over(wt)).alias("t"),
    )
    s = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.max("t").alias("tmax"),
    )
    slope = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    intercept = (F.col("sy") - slope * F.col("st")) / F.col("n")
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
        F.round(intercept + slope * (F.col("tmax") + 7), 2).alias(
            "forecast_next_week"
        ),
    )


_X76_SQL = """
WITH rev AS (
  SELECT l_partkey AS partkey,
         sum(cast(round(l_extendedprice * 100) AS BIGINT)
             * cast(round(100 - l_discount * 100) AS BIGINT)) AS rc
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(rc) AS total FROM rev),
ranked AS (
  SELECT partkey, rc,
         sum(rc) OVER (ORDER BY rc DESC, partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
  FROM rev
)
SELECT partkey,
       cast((rc + 50) // 100 AS BIGINT) / 1e2 AS revenue,
       round(cum * 1e0 / tot.total, 6) AS cum_share,
       CASE WHEN cum * 1e0 / tot.total <= 0.8 THEN 'A'
            WHEN cum * 1e0 / tot.total <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked, tot
"""


@register("x76_abc_analysis", _X76_SQL, first_round=9)
def x76_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification of the part catalog by revenue:
    parts are ranked by net revenue, the running share of total
    revenue is computed along that ranking, and each part lands in
    class A (first 80% of revenue), B (to 95%) or C (tail) — the
    inventory-management classic, and the curation analog of "which
    sources carry 80% of the tokens".

    Plan shape: the fact scan collapses to a part-keyed revenue agg
    FIRST (map-side partials; the only event-sized stage). The
    cumulative revenue then rides the sequence engine's bucketed
    prefix-sum (``with_global_prefix_sum``): equi-depth buckets on the
    revenue key, O(buckets) driver-folded offsets, per-bucket windows
    — NO single-partition exchange anywhere, because unlike x55's
    ~100-row source catalog the part catalog grows with the corpus
    (tens of millions of parts at 100x) and the r9 unpartitioned
    window would funnel all of it through one task (r9 verdict fix;
    plan guard in test_plans.py). The aggregated frame is lazily
    localCheckpointed so the three passes the prefix-sum needs
    (quantile sketch, subtotal fold, final window) reuse one
    materialization of the fact scan instead of re-running it. The
    grand total is a single-row broadcast."""
    from .operators.sequence import with_global_prefix_sum

    li = _t(spark, sf_dir, "lineitem")
    # cent x percent integer arithmetic: prices carry 2 decimals and
    # discounts 2, so the per-line revenue is EXACT in 64-bit ints —
    # the ranking, cumulative sum and class boundaries involve no
    # float summation order at all (a .005-boundary ulp difference
    # between engines flipped the display rounding in the double form)
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * F.round(100 - F.col("l_discount") * 100).cast("bigint")
        ).alias("rc")
    )
    rev = rev.localCheckpoint(eager=False)
    tot = rev.agg(F.sum("rc").alias("total"))
    share = F.col("cum") / F.col("total")
    return (
        with_global_prefix_sum(
            rev, "rc", ["rc", "partkey"], ascending=[False, True],
            name="cum",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "partkey",
            # half-up to cents in INTEGER space — a float round at the
            # .005 boundary goes opposite ways in the two engines
            (F.expr("(rc + 50) div 100") / F.lit(1e2)).alias("revenue"),
            F.round(share, 6).alias("cum_share"),
            F.when(share <= 0.8, "A")
            .when(share <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


_X74_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
),
rev AS (
  SELECT e.user_id, f.cohort_week,
         cast(date_diff('day', f.cohort_week,
                        date_trunc('week', e.ts)) / 7 AS BIGINT)
           AS week_offset,
         e.value
  FROM events e JOIN firsts f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
),
cells AS (
  SELECT cohort_week, week_offset, sum(value) AS wk_rev
  FROM rev GROUP BY 1, 2
),
sizes AS (SELECT cohort_week, count(*) AS n_cohort FROM firsts GROUP BY 1)
SELECT cast(c.cohort_week AS TIMESTAMP) AS cohort_week,
       c.week_offset,
       cast(s.n_cohort AS BIGINT) AS n_cohort,
       round(sum(c.wk_rev) OVER (PARTITION BY c.cohort_week
                                 ORDER BY c.week_offset
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW)
             / s.n_cohort, 4) AS cum_ltv_per_user
FROM cells c JOIN sizes s ON s.cohort_week = c.cohort_week
"""


@register("x74_cohort_ltv", _X74_SQL, first_round=9)
def x74_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: cumulative purchase revenue per
    signup-week cohort, per user, as a function of weeks since the
    cohort formed — x61 answers "are they still here", this answers
    "what are they worth by week k", the curve payback-period and
    LTV/CAC decisions read off. Week arithmetic matches x61's
    (date_trunc week, offset in whole weeks).

    Plan shape: the same two user-keyed stages as x61 (first-event
    agg, then a fact join keyed on user) followed by a cohort-matrix-
    sized running sum — the cumulative window runs over (cohorts x
    weeks) rows, never over events. Cohort sizes join as a
    cohort-sized broadcast."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    rev = (
        e.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")), F.col("cohort_week")
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
            "value",
        )
    )
    cells = rev.groupBy("cohort_week", "week_offset").agg(
        F.sum("value").alias("wk_rev")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_cohort").cast("bigint").alias("n_cohort"),
            F.round(
                F.sum("wk_rev").over(w) / F.col("n_cohort"), 4
            ).alias("cum_ltv_per_user"),
        )
    )


_X75_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
-- each (user, day) activity contributes to the 7-day windows ending
-- on day .. day+6; distinct again because a user active twice in a
-- window must count once
spans AS (
  SELECT DISTINCT user_id, day + to_days(cast(k AS INT)) AS wday
  FROM ud, unnest(range(0, 7)) r(k)
),
wau AS (SELECT wday AS day, count(*) AS wau FROM spans GROUP BY 1)
SELECT cast(d.day AS TIMESTAMP) AS day,
       cast(d.dau AS BIGINT) AS dau,
       cast(w.wau AS BIGINT) AS wau,
       round(d.dau * 1e0 / w.wau, 4) AS stickiness
FROM dau d JOIN wau w ON w.day = d.day
"""


@register("x75_rolling_active_users", _X75_SQL, first_round=9)
def x75_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: DAU, trailing-7-day WAU and the DAU/WAU
    stickiness ratio per day. DISTINCT users over a SLIDING window is
    not window-function-expressible (count-distinct does not compose
    over frames), so the scale-correct rewrite is the span explode:
    each (user, day) activity row contributes membership to the 7
    window-ending days, and a distinct + count per day recovers the
    exact rolling distinct — work scales with active-user-days x 7,
    never with the all-pairs of users x windows. WAU days trailing
    off the calendar edge (the first 6 days have partial windows) are
    reported as-is, exactly as a dashboard shows them.

    Plan shape: one distinct over (user, day) (the only event-sized
    stage), a 7-way span explode of that user-day table (map-side),
    and two day-keyed counts joined day-on-day. No window functions
    at all — the rolling distinct is pure explode + agg."""
    from .operators.aggregate import rolling_active_users, user_days

    e = _t(spark, sf_dir, "events")
    return rolling_active_users(user_days(e))


_I12_SQL = """
WITH ops AS (
  SELECT user_id, ts, event_id, value,
         CASE event_type WHEN 'signup' THEN 'I'
                         WHEN 'purchase' THEN 'D'
                         ELSE 'U' END AS op
  FROM events WHERE event_type <> 'error'
),
folded AS (
  SELECT user_id,
         first_value(op) OVER w AS first_op,
         last_value(op) OVER w AS last_op,
         last_value(CASE WHEN op <> 'D' THEN value END IGNORE NULLS)
           OVER w AS last_val,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM ops
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       CASE WHEN last_op = 'D' THEN 'D'
            WHEN first_op = 'I' THEN 'I'
            ELSE 'U' END AS op,
       round(CASE WHEN last_op <> 'D' THEN last_val END, 4) AS value
FROM folded
WHERE rn = 1 AND NOT (first_op = 'I' AND last_op = 'D')
"""


@register("i12_cdc_compaction", _I12_SQL, first_round=9)
def i12_cdc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC NET-EFFECT compaction: a change stream with many operations
    per key collapses to at most one operation — the batch-side
    optimization every CDC consumer runs before MERGE, because
    applying N ops per key costs N upserts while the net effect costs
    one (and insert-then-delete within the batch cancels to nothing).
    The standard fold needs only each key's FIRST op, LAST op and
    last surviving value: I..D -> drop, I..x -> INSERT(last value),
    x..D -> DELETE, else UPDATE(last value). The stream here is
    derived from events (signup=I, purchase=D, click/view=U, errors
    skipped) so the oracle replays it; x25 APPLIES a change stream,
    i11 EXTRACTS one from snapshots — this completes the CDC triangle
    with the compactor between them. Reference analog: the staged
    upsert batches of src/load.py:210-240, which this would shrink.

    Plan shape: ONE user-keyed sort carries all three full-frame
    windows plus the keep-last rank (same partition + order -> one
    exchange, one sort) — the entire compactor is a single window
    stage, no joins, no second shuffle."""
    e = _t(spark, sf_dir, "events")
    ops = e.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "event_id", "value",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "purchase", "D")
        .otherwise("U")
        .alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    folded = ops.select(
        "user_id",
        F.first("op").over(wf).alias("first_op"),
        F.last("op").over(wf).alias("last_op"),
        F.last(
            F.when(F.col("op") != "D", F.col("value")), ignorenulls=True
        )
        .over(wf)
        .alias("last_val"),
        F.row_number().over(wd).alias("rn"),
    )
    return folded.filter(
        (F.col("rn") == 1)
        & ~((F.col("first_op") == "I") & (F.col("last_op") == "D"))
    ).select(
        "user_id",
        F.when(F.col("last_op") == "D", "D")
        .when(F.col("first_op") == "I", "I")
        .otherwise("U")
        .alias("op"),
        F.round(
            F.when(F.col("last_op") != "D", F.col("last_val")), 4
        ).alias("value"),
    )


_X73_SQL = """
WITH v AS (
  SELECT user_id, ts AS view_ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts AS purchase_ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, cast(v.rn AS BIGINT) AS rn, v.view_ts, p.purchase_ts,
       round(epoch(p.purchase_ts) - epoch(v.view_ts), 2) AS lag_sec
FROM v JOIN p ON p.user_id = v.user_id AND p.rn = v.rn
"""


@register("x73_fifo_match", _X73_SQL, first_round=9)
def x73_fifo_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO ordinal matching: each user's k-th purchase is matched to
    their k-th view — the first-in-first-out allocation used for
    inventory lot accounting, payment-to-invoice application, and
    demand-to-supply attribution, where the join key is POSITION in
    arrival order rather than any stored id. Unmatched tail positions
    (views with no k-th purchase or vice versa) drop out, exactly as
    FIFO leaves open lots.

    Plan shape: two user-keyed rank windows (one per stream, both
    riding the same user partitioning) and one equi-join on
    (user, position) — the ordinal join is hash-joinable because the
    rank turned ORDER into a KEY; the naive formulation (nth_value
    over a cross of the two streams) would be quadratic per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = (
        e.filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"),
                F.row_number().over(w).alias("rn"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"),
                F.row_number().over(w).alias("rn"))
    )
    lag = F.expr(
        "timestampdiff(MICROSECOND, view_ts, purchase_ts)"
    ) / F.lit(1_000_000.0)
    return v.join(p, ["user_id", "rn"]).select(
        "user_id",
        F.col("rn").cast("bigint").alias("rn"),
        "view_ts",
        "purchase_ts",
        F.round(lag, 2).alias("lag_sec"),
    )


_ANN24_SQL = """
WITH comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         cast(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
norms AS (
  SELECT vec_id, sum(v * v) AS sq FROM comp GROUP BY 1
),
mx AS (SELECT max(sq) AS msq FROM norms),
-- derive the augmented index from the data's own dimensionality so a
-- dimension change fails loudly instead of truncating dots (r9 advice)
dims AS (SELECT max(i) AS d FROM comp),
-- the augmented component: every vector gets one extra coordinate
-- sqrt(M^2 - |x|^2); the query's extra coordinate is 0
acomp AS (
  SELECT vec_id, i, v FROM comp
  UNION ALL
  SELECT n.vec_id, dims.d + 1 AS i, sqrt(mx.msq - n.sq) AS v
  FROM norms n, mx, dims
),
q AS (SELECT i, qv FROM (
  SELECT i, v AS qv FROM comp WHERE vec_id = 0
  UNION ALL SELECT dims.d + 1 AS i, 0e0 AS qv FROM dims
)),
qn AS (SELECT sqrt(sum(qv * qv)) AS qnorm FROM q),
dots AS (
  SELECT c.vec_id, sum(c.v * q.qv) AS dot
  FROM comp c
  JOIN (SELECT i, qv FROM q, dims WHERE i <= dims.d) q ON q.i = c.i
  WHERE c.vec_id <> 0 GROUP BY 1
),
augsc AS (
  SELECT a.vec_id,
         sum(a.v * q.qv) / (sqrt(sum(a.v * a.v)) * any_value(qn.qnorm))
           AS aug_cos
  FROM acomp a JOIN q ON q.i = a.i, qn
  WHERE a.vec_id <> 0 GROUP BY 1
),
ranked AS (
  SELECT d.vec_id, d.dot, g.aug_cos,
         row_number() OVER (ORDER BY d.dot DESC, d.vec_id) AS rnk,
         row_number() OVER (ORDER BY g.aug_cos DESC, g.vec_id)
           AS aug_rnk
  FROM dots d JOIN augsc g ON g.vec_id = d.vec_id
)
SELECT vec_id, round(dot, 4) AS dot,
       cast(rnk AS BIGINT) AS rnk,
       cast(aug_rnk AS BIGINT) AS aug_rnk,
       cast(CASE WHEN rnk = aug_rnk THEN 1 ELSE 0 END AS BIGINT)
         AS ranks_agree
FROM ranked WHERE rnk <= 10
"""


@register("ann24_mips_topk", _ANN24_SQL, first_round=9)
def ann24_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search (MIPS) with the norm-augmentation
    contract: top-10 vectors by RAW dot product with the stored query
    (recommendation scoring, where popular items legitimately have
    bigger norms and cosine would erase that), plus the
    Shrivastava-Li reduction verified as data: augmenting each vector
    with sqrt(M^2-|x|^2) (M = max norm) and the query with 0 makes
    augmented-norms constant, so augmented-COSINE rank must equal raw
    dot rank — both rankings are computed and the per-row agreement
    flag is part of the output (the property that lets every cosine
    index in this engine — IVF/PQ/SQ8/LSH — serve MIPS unchanged).

    Plan shape: ann1's one-fold-per-vector scan economics; the max-
    norm and query-norm are single-row broadcasts; both top cuts ride
    one TakeOrderedAndProject each. Nothing here is more than one
    corpus scan."""
    from .llm.similarity import cosine_expr

    emb = _t(spark, sf_dir, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq = F.aggregate(
        F.transform(vd, lambda x: x * x),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    qrow = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    mx = emb.agg(F.max(sq).alias("msq"))
    # augmented vectors materialized as data (double precision, the
    # same arithmetic the oracle's UNION ALL component row carries):
    # x' = [x, sqrt(M^2-|x|^2)], q' = [q, 0]
    aug = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(mx))
        .select(
            "vec_id", "embedding",
            F.concat(
                vd, F.array(F.sqrt(F.col("msq") - sq))
            ).alias("aug_emb"),
        )
    )
    qaug = qrow.select(
        "qe",
        F.concat(
            F.transform(F.col("qe"), lambda x: x.cast("double")),
            F.array(F.lit(0.0)),
        ).alias("q_aug"),
    )
    scored = aug.crossJoin(F.broadcast(qaug)).select(
        "vec_id",
        F.aggregate(
            F.zip_with(
                F.transform(F.col("embedding"), lambda x: x.cast("double")),
                F.transform(F.col("qe"), lambda x: x.cast("double")),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("dot"),
        cosine_expr(F.col("aug_emb"), F.col("q_aug")).alias("aug_cos"),
    )
    wd_ = Window.orderBy(F.col("dot").desc(), "vec_id")
    wa = Window.orderBy(F.col("aug_cos").desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wd_))
        .withColumn("aug_rnk", F.row_number().over(wa))
        .filter(F.col("rnk") <= 10)
        .select(
            "vec_id",
            F.round("dot", 4).alias("dot"),
            F.col("rnk").cast("bigint").alias("rnk"),
            F.col("aug_rnk").cast("bigint").alias("aug_rnk"),
            F.when(F.col("rnk") == F.col("aug_rnk"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("ranks_agree"),
        )
    )


_TX27_SQL = """
WITH dtok AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(
           string_split_regex(trim(text), '\\s+'))) AS tok
  FROM documents
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM dtok),
df AS (SELECT tok, count(*) AS df FROM dtok GROUP BY 1),
pairs AS (
  SELECT a.tok AS ta, b.tok AS tb, count(*) AS c
  FROM dtok a JOIN dtok b
    ON b.doc_id = a.doc_id AND a.tok < b.tok
  GROUP BY 1, 2 HAVING count(*) >= 5
),
scored AS (
  SELECT ta, tb, c,
         ln(c * cast(n.n_docs AS DOUBLE) / (fa.df * fb.df)) AS pmi
  FROM pairs
  JOIN df fa ON fa.tok = pairs.ta
  JOIN df fb ON fb.tok = pairs.tb
  CROSS JOIN n
)
SELECT ta, tb, cast(c AS BIGINT) AS n_docs_together,
       round(pmi, 4) AS pmi,
       cast(row_number() OVER (ORDER BY pmi DESC, ta, tb) AS BIGINT)
         AS rnk
FROM scored
QUALIFY rnk <= 20
"""


@register("tx27_pmi_collocations", _TX27_SQL, first_round=9)
def tx27_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level PMI collocation mining: for every token pair
    co-occurring in >= 5 documents, the pointwise mutual information
    ln(P(a,b) / (P(a)P(b))) of their document co-occurrence — the
    classic collocation/phrase-mining signal (and the association
    matrix topic models start from). tx5 ranks tokens by frequency and
    tx9 ranks terms within a doc; this ranks PAIRS by how much more
    often they travel together than independence predicts.

    Plan shape: the pair build is a doc-keyed self-join over the
    DISTINCT (doc, token) table — fan-out per doc is the distinct-
    token count (bounded by document length, not corpus size, the
    same basket-bound argument as x68); df and the doc count are
    vocabulary-/single-row-sized broadcasts; the top-20 cut compiles
    to TakeOrderedAndProject."""
    from .llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    dtok = d.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
    ).distinct()
    n = dtok.agg(F.countDistinct("doc_id").alias("n_docs"))
    df = dtok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    a, b = dtok.alias("pa"), dtok.alias("pb")
    pairs = (
        a.join(
            b,
            (F.col("pb.doc_id") == F.col("pa.doc_id"))
            & (F.col("pa.tok") < F.col("pb.tok")),
        )
        .groupBy(F.col("pa.tok").alias("ta"), F.col("pb.tok").alias("tb"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 5)
    )
    fa = df.select(F.col("tok").alias("ta"), F.col("df").alias("dfa"))
    fb = df.select(F.col("tok").alias("tb"), F.col("df").alias("dfb"))
    scored = (
        pairs.join(F.broadcast(fa), "ta")
        .join(F.broadcast(fb), "tb")
        .crossJoin(F.broadcast(n))
        .select(
            "ta", "tb", "c",
            F.log(
                F.col("c")
                * F.col("n_docs").cast("double")
                / (F.col("dfa") * F.col("dfb"))
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), "ta", "tb")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select(
            "ta", "tb",
            F.col("c").cast("bigint").alias("n_docs_together"),
            F.round("pmi", 4).alias("pmi"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_X72_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
trans AS (
  SELECT user_id, cur, nxt, count(*) AS c FROM seq
  WHERE nxt IS NOT NULL GROUP BY 1, 2, 3
),
rowsum AS (
  SELECT user_id, cur, sum(c) AS rc FROM trans GROUP BY 1, 2
),
tot AS (SELECT user_id, sum(c) AS n FROM trans GROUP BY 1),
cond AS (
  SELECT t.user_id, t.cur, t.c, r.rc,
         -(t.c * 1e0 / r.rc) * ln(t.c * 1e0 / r.rc) AS h_term
  FROM trans t JOIN rowsum r
    ON r.user_id = t.user_id AND r.cur = t.cur
),
hrow AS (
  SELECT user_id, cur, sum(h_term) AS h_cur, max(rc) AS rc
  FROM cond GROUP BY 1, 2
)
SELECT h.user_id,
       cast(tot.n AS BIGINT) AS n_transitions,
       round(sum(h.rc * 1e0 / tot.n * h.h_cur), 4) AS entropy_rate
FROM hrow h JOIN tot ON tot.user_id = h.user_id
GROUP BY h.user_id, tot.n
"""


@register("x72_behavior_entropy", _X72_SQL, first_round=9)
def x72_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy rate: the Shannon entropy of each
    user's first-order Markov transition matrix (x62's per-user form),
    weighted by observed state occupancy — H = sum_cur p(cur) *
    H(next | cur) in nats. Near-zero entropy marks deterministic,
    scripted clients (the bot signal x62's docstring promises);
    high entropy is organic browsing. This is the per-entity
    generalization of x62's corpus-level matrix.

    Plan shape: one user-keyed lead window (the same single exchange
    as x15/x62), then every aggregate is keyed on (user) or
    (user, cur) — the transition table per user is at most
    |types|^2 = 25 rows, so all post-window frames are user-bounded.
    No joins cross users; no global stage of any kind."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("user_id", "cur", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wr = Window.partitionBy("user_id", "cur")
    wu = Window.partitionBy("user_id")
    p = F.col("c") / F.col("rc")
    cond = trans.withColumn("rc", F.sum("c").over(wr)).withColumn(
        "n", F.sum("c").over(wu)
    )
    h_cur = cond.groupBy("user_id", "cur", "rc", "n").agg(
        F.sum(-p * F.log(p)).alias("h_cur")
    )
    out = h_cur.groupBy("user_id", "n").agg(
        F.round(
            F.sum(F.col("rc") / F.col("n") * F.col("h_cur")), 4
        ).alias("entropy_rate"),
    )
    return out.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_transitions"),
        "entropy_rate",
    )


def _mm5_sig_sql() -> str:
    nib = ", ".join(
        f"substring(md5(substring(text, 1 + {i} * w, w)), 1, 1)"
        for i in range(16)
    )
    return f"""
    sized AS (
      SELECT doc_id, text,
             cast(ceil(length(text) / 16.0e0) AS INT) AS w
      FROM documents
    ),
    sig AS (
      SELECT doc_id, concat({nib}) AS sig FROM sized
    )"""


def _mm5_sql() -> str:
    ham = " + ".join(
        f"(CASE WHEN substring(a.sig, {i + 1}, 1)"
        f" <> substring(b.sig, {i + 1}, 1) THEN 1 ELSE 0 END)"
        for i in range(16)
    )
    return f"""
    WITH {_mm5_sig_sql()},
    bands AS (
      SELECT doc_id, i AS band, substring(sig, 1 + i * 2, 2) AS bv
      FROM sig, unnest(range(0, 8)) r(i)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y
        ON y.band = x.band AND y.bv = x.bv AND x.doc_id < y.doc_id
    ),
    scored AS (
      SELECT cand.a, cand.b, {ham} AS hamming
      FROM cand
      JOIN sig a ON a.doc_id = cand.a
      JOIN sig b ON b.doc_id = cand.b
    )
    SELECT a, b, cast(hamming AS BIGINT) AS hamming
    FROM scored WHERE hamming <= 4
    """


@register("mm5_perceptual_neardup", None, first_round=9)
def mm5_perceptual_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-signature near-dup over opaque media payloads — the
    pHash recipe transplanted to the binary column mm1-mm4 process:
    each payload is cut into a FIXED GRID of 16 tiles (variable tile
    width, like pHash's grid over variable-size images), each tile
    contributes one md5-derived nibble, and two payloads are near-dups
    when their 16-nibble signatures differ in at most 4 positions — a
    small local edit changes 1-2 tiles, so re-encoded/lightly-edited
    copies land inside the Hamming ball while distinct content falls
    far outside. Real codecs would replace the tile hash with DCT
    coefficients (llm/multimodal.py:73 documents the environment
    gate); every distribution property is identical.

    Plan shape: dd2's LSH economics on the signature — 8 bands of 2
    nibbles, candidates only on exact band match (bucket join, never
    all-pairs), then the 16-comparison exact Hamming verify on the
    candidate set. 8 bands make the hamming<=4 contract EXACT by
    pigeonhole: any pair differing in at most 7 of 16 positions leaves
    at least one of the 8 bands clean, so every qualifying pair is a
    candidate (the r9 4x4 banding only guaranteed recall for <=3
    mismatches — r9 advice fix). Coarser 2-nibble buckets cost more
    candidates, all killed by the exact verify. Signature construction is one map-side projection
    (16 tile md5s ~= one full-payload md5). Reference analog: the
    file-level md5 guard of src/extract.py:222-270, relaxed from
    exact identity to perceptual identity."""
    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "text",
        F.ceil(F.length("text") / F.lit(16.0)).cast("int").alias("w"),
    )
    sig = sized.select(
        "doc_id",
        F.concat(
            *[
                F.substring(
                    F.md5(F.expr(f"substring(text, 1 + {i} * w, w)")), 1, 1
                )
                for i in range(16)
            ]
        ).alias("sig"),
    )
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(8)])).alias("band"),
        "sig",
    ).select(
        "doc_id", "band",
        F.expr("substring(sig, 1 + band * 2, 2)").alias("bv"),
    )
    x, y = bands.alias("bx"), bands.alias("by")
    cand = (
        x.join(
            y,
            (F.col("by.band") == F.col("bx.band"))
            & (F.col("by.bv") == F.col("bx.bv"))
            & (F.col("bx.doc_id") < F.col("by.doc_id")),
        )
        .select(
            F.col("bx.doc_id").alias("a"), F.col("by.doc_id").alias("b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("a"), F.col("sig").alias("siga"))
    sb = sig.select(F.col("doc_id").alias("b"), F.col("sig").alias("sigb"))
    ham = sum(
        F.when(
            F.substring("siga", i + 1, 1) != F.substring("sigb", i + 1, 1),
            1,
        ).otherwise(0)
        for i in range(16)
    )
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", ham.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= 4)
    )


REGISTRY["mm5_perceptual_neardup"].sql = _mm5_sql()


_X70_FRACS = ", ".join(f"{i / 256:.8f}e0" for i in range(257))
_X70_SQL = f"""
WITH scored AS (
  SELECT doc_id, source, cast(n_chars AS DOUBLE) AS score FROM documents
),
pr AS (
  SELECT doc_id, source, score,
         percent_rank() OVER (PARTITION BY source
                              ORDER BY score, doc_id) AS pr
  FROM scored
),
qarr AS (
  SELECT quantile_cont(score, [{_X70_FRACS}]) AS qs FROM scored
),
grid AS (
  SELECT generate_subscripts(qs, 1) - 1 AS i, unnest(qs) AS qv FROM qarr
)
SELECT pr.doc_id, pr.source, pr.score,
       round(pr.pr, 6) AS pr,
       round(grid.qv, 4) AS norm_score
FROM pr JOIN grid
  ON grid.i = cast(floor(pr.pr * 256) AS BIGINT)
"""


@register("x70_quantile_normalize", _X70_SQL, first_round=9)
def x70_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of a per-document score —
    the calibration step a mixed-corpus curation pipeline runs before
    thresholding: each document's WITHIN-SOURCE percent rank is mapped
    onto the GLOBAL score distribution, so "top 10% of arxiv" and
    "top 10% of webcrawl" land on the same scale even when the raw
    score distributions differ wildly (quantile normalization, the
    microarray-analysis classic applied to quality scores; score here
    is the stored n_chars signal, standing in for any per-doc score).

    Plan shape: the within-source rank is a source-keyed window (the
    only data-sized exchange). The global distribution is NOT a global
    sort: it is compressed to a 257-point interpolated quantile GRID
    (one single-row exact-percentile agg -> exploded -> broadcast),
    and each doc joins its grid cell map-side. Exact-rank quantile
    normalization would need a full-corpus range sort; the grid form
    is the shape that survives 100 TB, with resolution 1/256 of the
    distribution (documented, tunable)."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("score")
    )
    wp = Window.partitionBy("source").orderBy("score", "doc_id")
    pr = scored.select(
        "doc_id", "source", "score",
        F.percent_rank().over(wp).alias("pr"),
    )
    fracs = F.array(*[F.lit(i / 256.0) for i in range(257)])
    grid = (
        scored.agg(
            F.percentile("score", fracs).alias("qs")
        )
        .select(F.posexplode("qs").alias("i", "qv"))
    )
    return (
        pr.join(
            F.broadcast(grid),
            F.col("i") == F.floor(F.col("pr") * 256).cast("bigint"),
        )
        .select(
            "doc_id", "source", "score",
            F.round("pr", 6).alias("pr"),
            F.round("qv", 4).alias("norm_score"),
        )
    )


_X71_SQL = """
WITH assign AS (
  SELECT DISTINCT user_id,
         CASE WHEN md5(cast(user_id AS VARCHAR)) < '8' THEN 'A'
              ELSE 'B' END AS variant
  FROM events
),
firsts AS (
  SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1
),
conv AS (
  SELECT DISTINCT e.user_id
  FROM events e JOIN firsts f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts <= f.t0 + INTERVAL 1 DAY
),
arms AS (
  SELECT variant,
         count(*) AS n_users,
         sum(CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END)
           AS n_conv
  FROM assign LEFT JOIN conv ON conv.user_id = assign.user_id
  GROUP BY 1
),
wide AS (
  SELECT
    max(CASE WHEN variant = 'A' THEN n_users END) AS na,
    max(CASE WHEN variant = 'A' THEN n_conv END) AS ca,
    max(CASE WHEN variant = 'B' THEN n_users END) AS nb,
    max(CASE WHEN variant = 'B' THEN n_conv END) AS cb
  FROM arms
),
stat AS (
  SELECT na, ca, nb, cb,
         ca * 1e0 / na AS pa, cb * 1e0 / nb AS pb,
         (ca + cb) * 1e0 / (na + nb) AS pp
  FROM wide
)
SELECT cast(na AS BIGINT) AS n_a, cast(ca AS BIGINT) AS conv_a,
       round(pa, 6) AS rate_a,
       cast(nb AS BIGINT) AS n_b, cast(cb AS BIGINT) AS conv_b,
       round(pb, 6) AS rate_b,
       round((pa - pb)
             / sqrt(pp * (1 - pp) * (1e0 / na + 1e0 / nb)), 4) AS z,
       cast(CASE WHEN abs((pa - pb)
             / sqrt(pp * (1 - pp) * (1e0 / na + 1e0 / nb))) > 1.96
             THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM stat
"""


@register("x71_ab_test_ztest", _X71_SQL, first_round=9)
def x71_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with a two-proportion z-test: users are
    assigned to arms by a deterministic md5 split (first hex digit
    < '8' -> A, the hash-based bucketing every experimentation system
    uses so assignment is stable and joins-free), conversion = a
    purchase within ONE DAY of the user's first event (the activation
    metric — chosen over raw "ever purchased", which is ~100% in this
    data and would put the pooled variance at the degenerate 0), and
    the pooled-variance z statistic decides
    significance at |z| > 1.96 — the closed-form readout an
    experimentation dashboard serves, computed in one pass.

    Plan shape: two user-keyed distincts and a user-keyed left join,
    then everything is arm-sized (2 rows) — the z arithmetic is a
    1-row projection. At any event volume the only data-sized stages
    are the distincts; assignment is a map-side hash expression, so
    no assignment table ever materializes or shuffles."""
    e = _t(spark, sf_dir, "events")
    assign = e.select(
        "user_id",
        F.when(
            F.md5(F.col("user_id").cast("string")) < "8", "A"
        )
        .otherwise("B")
        .alias("variant"),
    ).distinct()
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("t0"))
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("ts") <= F.col("t0") + F.expr("INTERVAL 1 DAY"))
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    arms = (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce("converted", F.lit(0))).alias("n_conv"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("n_conv"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("n_conv"))).alias("cb"),
    )
    pa = F.col("ca") / F.col("na")
    pb = F.col("cb") / F.col("nb")
    pp = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    z = (pa - pb) / F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return wide.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("ca").cast("bigint").alias("conv_a"),
        F.round(pa, 6).alias("rate_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("cb").cast("bigint").alias("conv_b"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 4).alias("z"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).cast("bigint").alias(
            "significant"
        ),
    )


_BM25_TERMS = ["hash", "join", "stream"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_scores_sql() -> str:
    """Shared CTE block: (doc_id, score) BM25 scores for the fixed
    query over every matching document."""
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks
      WHERE tok IN ({terms}) GROUP BY 1, 2
    ),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    bm25 AS (
      SELECT tf.doc_id,
             sum(ln((cast(stats.n AS DOUBLE) - df.df + 0.5e0)
                    / (df.df + 0.5e0) + 1)
                 * tf.tf * ({_BM25_K1}e0 + 1)
                 / (tf.tf + {_BM25_K1}e0
                    * (1 - {_BM25_B}e0
                       + {_BM25_B}e0 * dl.dl / stats.avgdl)))
               AS score
      FROM tf
      JOIN df ON df.tok = tf.tok
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY 1
    )"""


_X69_SQL = f"""
WITH {_bm25_scores_sql()}
SELECT doc_id, round(score, 4) AS score,
       cast(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rnk
FROM bm25
QUALIFY rnk <= 10
"""


def _bm25_scores_spark(d: DataFrame) -> DataFrame:
    """(doc_id, score) BM25 scores for the fixed query — the Spark
    twin of _bm25_scores_sql, shared by x69 and ann23."""
    from .llm.text import tokens

    tok = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("tok").isin(_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1
                )
                * F.col("tf")
                * (_BM25_K1 + 1)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1
                        - _BM25_B
                        + _BM25_B * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("c"),
        )
    )
    return contrib.groupBy("doc_id").agg(F.sum("c").alias("score"))


@register("x69_bm25_topk", _X69_SQL, first_round=9)
def x69_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (Robertson k1=1.2, b=0.75, the Lucene
    idf variant ln((N-df+0.5)/(df+0.5)+1)): top-10 documents for the
    fixed query "hash join stream" — the exact keyword-search scoring
    a corpus-curation stack uses for benchmark mining, targeted
    filtering, and as the lexical leg of hybrid retrieval (ann23).
    tx9's TF-IDF ranks terms WITHIN a document; BM25 ranks DOCUMENTS
    for a query, with document-length normalization TF-IDF lacks.

    Plan shape: one token explode feeds both the per-doc length agg
    and the query-term tf counts (the term filter prunes the explode
    to query-vocabulary size immediately); df and the (N, avgdl) stats
    frame are term-/single-row-sized broadcasts onto the tf stream —
    the corpus never shuffles on token content. The top-10 cut
    compiles to TakeOrderedAndProject (LimitPushDownThroughWindow
    converts the empty-partition row_number filter into per-partition
    heaps), never a full sort of the scored set."""
    d = _t(spark, sf_dir, "documents")
    scored = _bm25_scores_spark(d)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "doc_id",
            F.round("score", 4).alias("score"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_ANN23_SQL = f"""
WITH {_bm25_scores_sql()},
bm_ranked AS (
  SELECT id, rb FROM (
    SELECT doc_id AS id,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rb
    FROM bm25
  ) WHERE rb <= 1000
),
comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         cast(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
cos AS (
  SELECT c.vec_id,
         sum(c.v * q.qv)
           / (sqrt(sum(c.v * c.v)) * sqrt((SELECT sum(qv * qv) FROM q)))
           AS cosim
  FROM comp c JOIN q ON q.i = c.i
  WHERE c.vec_id <> 0
  GROUP BY 1
),
cos_ranked AS (
  SELECT id, rc FROM (
    SELECT vec_id AS id,
           row_number() OVER (ORDER BY cosim DESC, vec_id) AS rc
    FROM cos
  ) WHERE rc <= 1000
),
fused AS (
  SELECT coalesce(b.id, c.id) AS doc_id,
         coalesce(1e0 / (60 + b.rb), 0)
           + coalesce(1e0 / (60 + c.rc), 0)
           AS rrf,
         b.rb AS bm25_rank, c.rc AS cos_rank
  FROM bm_ranked b FULL OUTER JOIN cos_ranked c ON c.id = b.id
)
SELECT doc_id, round(rrf, 6) AS rrf,
       cast(bm25_rank AS BIGINT) AS bm25_rank,
       cast(cos_rank AS BIGINT) AS cos_rank,
       cast(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
         AS rnk
FROM fused
QUALIFY rnk <= 10
"""


@register("ann23_hybrid_rrf", _ANN23_SQL, first_round=9)
def ann23_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (RRF, the industry-
    standard score-free fusion: sum of 1/(60+rank) over legs): the
    lexical leg is x69's BM25 ranking for "hash join stream", the
    dense leg is exact cosine against the stored query vector
    (vec_id 0, ann1's convention), each leg CUT to its top-1000
    candidates before fusion (the production hybrid shape — fusion
    work is candidate-list-sized, never corpus-sized), and documents
    missing from a leg contribute nothing for it — lexical-only and
    dense-only matches both stay retrievable, which is the whole
    point of hybrid search. Top-10 by fused score with per-leg ranks
    reported for explainability.

    Plan shape: each leg is its own keyed pipeline (BM25: broadcast
    stats onto the term-filtered token stream; cosine: one array fold
    per vector against a broadcast query); the fusion is an id-keyed
    full-outer join of two rank tables, and the final cut is
    TakeOrderedAndProject. Nothing in the fusion grows faster than
    the leg outputs."""
    from .llm.similarity import cosine_expr

    d = _t(spark, sf_dir, "documents")
    wb = Window.orderBy(F.col("score").desc(), "doc_id")
    bm = (
        _bm25_scores_spark(d)
        .withColumn("rb", F.row_number().over(wb))
        .filter(F.col("rb") <= 1000)  # candidate cut -> TakeOrdered
        .select(F.col("doc_id").alias("id"), "rb")
    )
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    cos = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            cosine_expr(F.col("embedding"), F.col("qe")).alias("cosim"),
        )
    )
    wc = Window.orderBy(F.col("cosim").desc(), "vec_id")
    cr = (
        cos.withColumn("rc", F.row_number().over(wc))
        .filter(F.col("rc") <= 1000)  # candidate cut -> TakeOrdered
        .select(F.col("vec_id").alias("id"), "rc")
    )
    fused = bm.join(cr, "id", "full_outer").select(
        F.col("id").alias("doc_id"),
        (
            F.coalesce(1.0 / (60 + F.col("rb")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rc")), F.lit(0.0))
        ).alias("rrf"),
        F.col("rb").alias("bm25_rank"),
        F.col("rc").alias("cos_rank"),
    )
    wf = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= 10)
        .select(
            "doc_id",
            F.round("rrf", 6).alias("rrf"),
            F.col("bm25_rank").cast("bigint").alias("bm25_rank"),
            F.col("cos_rank").cast("bigint").alias("cos_rank"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_X62_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS cur, ts, event_id,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
trans AS (
  SELECT cur, nxt, count(*) AS c FROM seq WHERE nxt IS NOT NULL
  GROUP BY 1, 2
)
SELECT cur, nxt, cast(c AS BIGINT) AS n_transitions,
       round(c * 1.0 / sum(c) OVER (PARTITION BY cur), 4) AS p
FROM trans
"""


@register("x62_markov_transitions", _X62_SQL)
def x62_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), estimated from every
    adjacent pair in each user's (ts, event_id)-ordered stream — the
    behavioral fingerprint that feeds next-event prediction, bot
    detection (near-deterministic rows are scripted clients), and
    simulation; for text the identical algebra is tx10's bigram LM,
    so this is that operator generalized from tokens to event
    streams. Each row of the matrix sums to 1 by construction
    (verified in tests), making it directly usable as a stochastic
    matrix.

    Plan shape: one user-keyed window (the lead) — the same single
    exchange x15's sessionizer pays — then a transition-type agg
    whose group space is |event types|^2 (a constant-size matrix, 25
    cells here); normalization is a window over that matrix, so the
    transition subtree is computed exactly once (a normalize JOIN
    would re-derive it for the build side). At any event volume the
    only data-sized stage is the lead window."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # normalize via a window over the |types|^2 matrix — no join, and
    # the transition subtree is computed exactly once
    total = F.sum("c").over(Window.partitionBy("cur"))
    return trans.select(
        "cur",
        "nxt",
        F.col("c").cast("bigint").alias("n_transitions"),
        F.round(F.col("c") / total, 4).alias("p"),
    )


_X61_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
  FROM events
),
cells AS (
  SELECT f.cohort_week,
         cast(date_diff('day', f.cohort_week, a.active_week) / 7
              AS BIGINT) AS week_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN firsts f ON a.user_id = f.user_id
  GROUP BY 1, 2
),
sizes AS (SELECT cohort_week, count(*) AS n_cohort FROM firsts GROUP BY 1)
SELECT cast(cells.cohort_week AS TIMESTAMP) AS cohort_week,
       week_offset,
       cast(n_active AS BIGINT) AS n_active,
       cast(n_cohort AS BIGINT) AS n_cohort,
       round(n_active * 1.0 / n_cohort, 4) AS retention
FROM cells JOIN sizes ON sizes.cohort_week = cells.cohort_week
"""


@register("x61_retention_cohorts", _X61_SQL)
def x61_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the third member of the
    event-analytics trio (x15/st2 sessions, x59 funnel, x60
    attribution): users cohort by the ISO week of their FIRST event,
    and each (cohort, week-offset) cell reports what fraction of the
    cohort was active that many weeks later. Week arithmetic is
    integer throughout (date_trunc to Monday in both engines, day
    difference / 7), so the matrix is engine-exact.

    Plan shape: two user-keyed aggs (first-event week; distinct
    active weeks — both map-side combinable) join on user_id, then a
    cohort-keyed count-distinct; every frame after the raw scan is
    user-sized or smaller, and the matrix itself is (weeks x offsets)
    — a constant-size report no matter the event volume. Cohort sizes
    broadcast. Reference analog: src/load.py's per-batch summary
    counts, pivoted from batches to user lifecycles."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    cells = (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        F.col("cohort_week").cast("timestamp").alias("cohort_week"),
        "week_offset",
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("n_cohort").cast("bigint").alias("n_cohort"),
        F.round(F.col("n_active") / F.col("n_cohort"), 4).alias(
            "retention"
        ),
    )


_X60_SQL = """
WITH conv AS (
  SELECT user_id, event_id AS conv_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type AS channel, ts AS touch_ts
  FROM events WHERE event_type IN ('view', 'click')
),
pairs AS (
  SELECT conv.user_id, conv.conv_id, conv.conv_ts,
         touch.channel, touch.touch_ts
  FROM conv JOIN touch
    ON touch.user_id = conv.user_id
   AND touch.touch_ts <= conv.conv_ts
   AND touch.touch_ts > conv.conv_ts - INTERVAL 7 DAY
),
attributed AS (
  SELECT conv_id, channel FROM (
    SELECT conv_id, channel,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY touch_ts DESC, channel) AS rn
    FROM pairs
  ) WHERE rn = 1
),
tot AS (SELECT count(*) AS n_conv FROM conv)
SELECT attributed.channel,
       cast(count(*) AS BIGINT) AS n_attributed,
       cast(tot.n_conv AS BIGINT) AS n_conversions,
       round(count(*) * 1.0 / tot.n_conv, 4) AS share
FROM attributed, tot
GROUP BY 1, tot.n_conv
"""


@register("x60_last_touch_attribution", _X60_SQL)
def x60_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the most
    recent view/click by the same user within a 7-day lookback —
    x59's funnel says HOW MANY convert, this says WHICH channel gets
    the credit, the other half of the event-analytics pair. The
    touch-to-conversion join is an interval join keyed on user_id
    (the same bounded-interval shape the streaming side handles with
    stream_stream_interval_join), then one conversion-keyed
    row_number picks the latest touch — deterministic tie-break on
    (touch_ts desc, channel) so simultaneous touches attribute
    identically in both engines.

    Plan shape: the join is a user-keyed equi-join with the interval
    as a residual predicate — per-user fan-out is bounded by that
    user's touches in the lookback window, never a cartesian stage;
    the attribution window is keyed on conv_id (conversion-sized);
    the total is a broadcast scalar. At 100 TB the lookback bound is
    what keeps state finite — the same reason the streaming twin's
    watermark works."""
    e = _t(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("touch_ts")
            > F.col("conv_ts") - F.expr("INTERVAL 7 DAY")
        )
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), "channel"
    )
    attributed = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("conv_id", "channel")
    )
    tot = conv.agg(F.count(F.lit(1)).alias("n_conv"))
    return (
        attributed.groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n_attributed"))
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.col("n_attributed").cast("bigint").alias("n_attributed"),
            F.col("n_conv").cast("bigint").alias("n_conversions"),
            F.round(F.col("n_attributed") / F.col("n_conv"), 4).alias(
                "share"
            ),
        )
    )


_ANN22_PLANES = 48
_ANN22_SHORTLIST = 50


def _ann22_sql() -> str:
    from .llm.dedup import _hexint_sql

    n = _ANN22_PLANES
    md5_exprs = ", ".join(
        f"md5('rp{p}|' || cast(i AS VARCHAR)) AS m{p}" for p in range(n)
    )
    coef_exprs = ", ".join(
        f"({_hexint_sql(f'm{p}', 8)} / 2147483648.0 - 1.0) AS r{p}"
        for p in range(n)
    )
    proj_exprs = ", ".join(f"sum(v * r{p}) AS pr{p}" for p in range(n))
    code_expr = " + ".join(
        f"CASE WHEN pr{p} >= 0 THEN cast({1 << p} AS BIGINT) "
        f"ELSE 0 END"
        for p in range(n)
    )
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    idx AS (SELECT DISTINCT i FROM comp),
    md5s AS (SELECT i, {md5_exprs} FROM idx),
    coefs AS (SELECT i, {coef_exprs} FROM md5s),
    joined AS (
      SELECT comp.vec_id, comp.v,
             {', '.join(f'coefs.r{p}' for p in range(n))}
      FROM comp JOIN coefs ON comp.i = coefs.i
    ),
    proj AS (SELECT vec_id, {proj_exprs} FROM joined GROUP BY vec_id),
    codes AS (SELECT vec_id, ({code_expr}) AS code FROM proj),
    qc AS (SELECT code AS qcode FROM codes WHERE vec_id = 0),
    ham AS (
      SELECT vec_id, bit_count(xor(code, qcode)) AS hamming
      FROM codes, qc WHERE vec_id <> 0
    ),
    short AS (
      SELECT vec_id, hamming FROM ham
      ORDER BY hamming, vec_id LIMIT {_ANN22_SHORTLIST}
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY 1),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
    exact AS (
      SELECT comp.vec_id, sum(comp.v * q.qv) AS dot
      FROM comp JOIN q ON comp.i = q.i
      WHERE comp.vec_id IN (SELECT vec_id FROM short)
      GROUP BY 1
    ),
    topk AS (
      SELECT e.vec_id,
             round(e.dot / (n2.norm * qn.qnorm), 4) AS cosine
      FROM exact e JOIN norms n2 ON n2.vec_id = e.vec_id, qn
      ORDER BY cosine DESC, e.vec_id LIMIT 10
    )
    SELECT topk.vec_id, topk.cosine,
           cast(short.hamming AS BIGINT) AS hamming
    FROM topk JOIN short ON short.vec_id = topk.vec_id
    """


@register("ann22_binary_hamming_topk", None)  # sql attached below
def ann22_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search from BINARY codes — the most compressed member
    of the quantization family (ann19 SQ8 = 1 byte/dim, ann9/ann10 PQ
    = codebook ids, this = 48 BITS per vector regardless of dimension,
    a 21x shrink vs SQ8 at d=128): pack 48 random-hyperplane sign bits
    into one bigint, shortlist by Hamming distance — one
    ``bit_count(code XOR qcode)`` instruction per candidate — and
    exact-rerank the survivors. dd5 uses the same hyperplanes to BUCKET
    for dedup; this SERVES top-k from them, completing the
    dedup/search symmetry. At 100 TB the code table is 8 bytes/vector
    (a 10^10-vector corpus fits in 80 GB — broadcastable per
    executor), so the full-precision scan shrinks to the shortlist.
    Plane coefficients are the md5-derived constants
    hyperplane_lsh_buckets ships, so the oracle packs bit-identical
    codes; the Hamming cut is integer-exact (no rounding anywhere
    before the final cosine).

    Plan shape: one broadcast coefficient join + id-keyed projection
    agg builds codes; the Hamming cut compiles to
    TakeOrderedAndProject; only shortlist vectors are read at full
    precision (ann19's serve pattern, smaller state)."""
    from .llm.similarity import binary_hamming_topk

    return binary_hamming_topk(
        _t(spark, sf_dir, "embeddings"),
        query_id=0,
        k=10,
        shortlist=_ANN22_SHORTLIST,
        n_planes=_ANN22_PLANES,
    )


REGISTRY["ann22_binary_hamming_topk"].sql = _ann22_sql()


_TX25_TOP = 50  # Zipf fit over the top-k token frequencies

_TX25_SQL = f"""
WITH toks AS (
  SELECT source, unnest({{toks}}) AS tok FROM documents
),
freq AS (SELECT tok, count(*) AS f FROM toks GROUP BY 1),
top AS (
  SELECT tok, f,
         row_number() OVER (ORDER BY f DESC, tok) AS r
  FROM freq ORDER BY f DESC, tok LIMIT {_TX25_TOP}
),
zipf AS (
  SELECT (sum(ln(r) * ln(f)) - sum(ln(r)) * sum(ln(f)) / count(*))
         / (sum(ln(r) * ln(r)) - sum(ln(r)) * sum(ln(r)) / count(*))
           AS slope
  FROM top
),
per_src AS (
  SELECT source, count(*) AS n, count(DISTINCT tok) AS v
  FROM toks GROUP BY 1
),
heaps AS (
  SELECT (sum(ln(n) * ln(v)) - sum(ln(n)) * sum(ln(v)) / count(*))
         / (sum(ln(n) * ln(n)) - sum(ln(n)) * sum(ln(n)) / count(*))
           AS beta
  FROM per_src
),
tot AS (
  SELECT sum(n) AS n_tokens,
         (SELECT count(*) FROM freq) AS vocab
  FROM per_src
)
SELECT cast(n_tokens AS BIGINT) AS n_tokens,
       cast(vocab AS BIGINT) AS vocab,
       round(zipf.slope, 4) AS zipf_slope,
       round(heaps.beta, 4) AS heaps_beta
FROM tot, zipf, heaps
"""


@register("tx25_zipf_heaps", None)  # sql attached below
def tx25_zipf_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics sanity panel: the Zipf slope (log-log
    regression of the top-50 token frequencies against rank — healthy
    natural text sits near -1) and the Heaps exponent (log-log
    regression of per-source vocabulary against token count — natural
    text grows vocabulary sub-linearly, beta in ~[0.4, 0.9]). These
    two numbers are the cheapest corpus-health fingerprints there
    are: machine-generated spam flattens the Zipf slope, boilerplate
    mass collapses Heaps growth, and a feed whose fingerprint MOVES
    between snapshots has changed generator — the corpus-level
    companion to x54's per-source drift. Both slopes are closed-form
    least squares computed as plain aggregates (no iteration, no ML
    library).

    Plan shape: one token explode feeds the frequency table
    (vocabulary-sized) and the per-source (N, V) table (catalog-
    sized); the Zipf fit runs on 50 rows cut by a heap
    (TakeOrderedAndProject), the Heaps fit on the source catalog —
    everything after the two keyed aggs is metadata-sized.
    Reference analog: src/load.py's summary statistics, upgraded
    from row counts to distribution-shape diagnostics."""
    from .llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    top = (
        freq.orderBy(F.col("f").desc(), "tok")
        .limit(_TX25_TOP)
        .select(
            "f",
            F.row_number()
            .over(Window.orderBy(F.col("f").desc(), "tok"))
            .alias("r"),
        )
    )

    def _slope(df, xc, yc):
        x, y = F.log(F.col(xc)), F.log(F.col(yc))
        n = F.count(F.lit(1))
        return df.agg(
            (
                (F.sum(x * y) - F.sum(x) * F.sum(y) / n)
                / (F.sum(x * x) - F.sum(x) * F.sum(x) / n)
            ).alias("slope")
        )

    zipf = _slope(top, "r", "f").withColumnRenamed("slope", "zslope")
    per_src = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("tok").alias("v")
    )
    heaps = _slope(per_src, "n", "v").withColumnRenamed("slope", "beta")
    tot = per_src.agg(F.sum("n").alias("n_tokens")).crossJoin(
        freq.agg(F.count(F.lit(1)).alias("vocab"))
    )
    return (
        tot.crossJoin(F.broadcast(zipf))
        .crossJoin(F.broadcast(heaps))
        .select(
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("vocab").cast("bigint").alias("vocab"),
            F.round("zslope", 4).alias("zipf_slope"),
            F.round("beta", 4).alias("heaps_beta"),
        )
    )


def _tx25_sql() -> str:
    return _TX25_SQL.format(toks=_DUCK_TOKS)


REGISTRY["tx25_zipf_heaps"].sql = _tx25_sql()


_X58_B = 32  # bootstrap replicates
# Poisson(1) CDF thresholds for the inverse-CDF draw (k = 0..5; the
# tail mass past 6 is 6e-5 and maps to 6). Exact double literals so
# both engines binary-match the CASE ladder.
_X58_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
)


def _x58_sql() -> str:
    from .llm.dedup import _hexint_sql

    hexed = _hexint_sql(
        "md5('bs' || '|' || cast(doc_id AS VARCHAR) || '|' "
        "|| cast(b AS VARCHAR))",
        8,
    )
    u = f"(({hexed}) + 0.5) / 4294967296.0"
    ladder = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_X58_CDF)
    )
    return f"""
    WITH reps AS (
      SELECT source, doc_id, cast(n_chars AS DOUBLE) AS x, b,
             CASE {ladder} ELSE 6 END AS w
      FROM documents CROSS JOIN (
        SELECT unnest(range(0, {_X58_B})) AS b
      )
    ),
    rmeans AS (
      SELECT source, b, sum(w * x) / sum(w) AS m
      FROM reps GROUP BY 1, 2 HAVING sum(w) > 0
    ),
    boot AS (SELECT source, stddev_samp(m) AS se_boot FROM rmeans GROUP BY 1),
    plain AS (
      SELECT source, count(*) AS n, avg(cast(n_chars AS DOUBLE)) AS mean_x,
             stddev_samp(cast(n_chars AS DOUBLE)) / sqrt(count(*))
               AS se_analytic
      FROM documents GROUP BY 1
    )
    SELECT plain.source, cast(n AS BIGINT) AS n, round(mean_x, 4) AS mean_x,
           round(se_boot, 4) AS se_boot,
           round(se_analytic, 4) AS se_analytic,
           round(se_boot / se_analytic, 2) AS se_ratio
    FROM plain JOIN boot ON boot.source = plain.source
    """


@register("x58_bootstrap_se", None)  # sql attached below
def x58_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error bars in ONE pass: Poisson-bootstrap standard errors for
    the per-source mean document length. The classical bootstrap
    resamples the data B times — B full scans, impossible at 100 TB.
    The Poisson bootstrap (Chamandy et al. 2012, "Estimating
    uncertainty for massive data streams") replaces resampling with
    per-row replicate weights w ~ Poisson(1): every row contributes
    to all B replicate sums in the same scan, the weighted replicate
    means' spread estimates the sampling error, and the replicate
    sums are plain map-side-combinable aggregates. Weights here are
    DERIVED from the row's identity hash through the exact Poisson(1)
    inverse CDF, so the "randomness" is reproducible across runs,
    engines, and partitionings — which is what lets a DuckDB oracle
    hash-match a bootstrap, normally the least replayable of methods.
    CONTRACT form: the analytic SE (sigma/sqrt(n)) runs in the same
    plan, and the ratio is pinned near 1 — the bootstrap is verified
    against closed-form truth where the closed form exists, so it can
    be trusted where it doesn't (ratio metrics, quantiles, dedup
    rates).

    Plan shape: one B-way explode (constant fan-out, map-side) into a
    (source, b)-keyed agg — replicate count, not corpus size, bounds
    the group space; the analytic side is one keyed agg over the raw
    rows. Reference analog: src/load.py's count reconciliation,
    upgraded from "is the count right" to "how sure are we about the
    statistic"."""
    from .llm.dedup import _hexint

    d = _t(spark, sf_dir, "documents")
    reps = d.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("double").alias("x"),
        F.explode(
            F.sequence(F.lit(0), F.lit(_X58_B - 1))
        ).alias("b"),
    )
    u = (
        _hexint(
            F.md5(
                F.concat_ws(
                    "|", F.lit("bs"), F.col("doc_id"), F.col("b")
                )
            ),
            8,
        )
        + 0.5
    ) / F.lit(4294967296.0)
    w = F.lit(6)
    for k in range(len(_X58_CDF) - 1, -1, -1):
        w = F.when(u < float(_X58_CDF[k]), F.lit(k)).otherwise(w)
    reps = reps.withColumn("w", w)
    rmeans = (
        reps.groupBy("source", "b")
        .agg(F.sum(F.col("w") * F.col("x")).alias("sx"), F.sum("w").alias("sw"))
        .filter(F.col("sw") > 0)
        .select("source", "b", (F.col("sx") / F.col("sw")).alias("m"))
    )
    boot = rmeans.groupBy("source").agg(F.stddev_samp("m").alias("se_boot"))
    plain = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("n_chars").cast("double")).alias("mean_x"),
        (
            F.stddev_samp(F.col("n_chars").cast("double"))
            / F.sqrt(F.count(F.lit(1)))
        ).alias("se_analytic"),
    )
    return plain.join(boot, "source").select(
        "source",
        F.col("n").cast("bigint").alias("n"),
        F.round("mean_x", 4).alias("mean_x"),
        F.round("se_boot", 4).alias("se_boot"),
        F.round("se_analytic", 4).alias("se_analytic"),
        F.round(F.col("se_boot") / F.col("se_analytic"), 2).alias(
            "se_ratio"
        ),
    )


REGISTRY["x58_bootstrap_se"].sql = _x58_sql()


_X57_K = 5


def _x57_sql() -> str:
    from .llm.dedup import _hexint_sql

    hexed = _hexint_sql("md5('ps' || '|' || cast(doc_id AS VARCHAR))", 8)
    u = f"(({hexed}) + 0.5) / 4294967296.0"
    return f"""
    WITH scored AS (
      SELECT source, doc_id, n_chars,
             round(ln({u}) / n_chars, 8) AS priority
      FROM documents
    )
    SELECT source, doc_id, cast(n_chars AS BIGINT) AS n_chars, priority,
           cast(row_number() OVER (PARTITION BY source
                                   ORDER BY priority DESC, doc_id)
                AS BIGINT) AS rk
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY source
                               ORDER BY priority DESC, doc_id) <= {_X57_K}
    """


@register("x57_per_source_reservoir", None)  # sql attached below
def x57_per_source_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced fixed-k sampling: an exact weighted reservoir
    (Efraimidis-Spirakis, x50's priority) of k={_k} documents from
    EVERY source — the op that builds a balanced eval/inspection set
    where x50 guarantees only a global size (a dominant source can
    claim every slot) and x12 guarantees only per-stratum rates (a
    tiny source can round to zero rows). Per-group fixed-k is the
    output contract a human-review queue or per-source quality probe
    actually needs: every feed represented, none over-represented,
    and the same hash-derived priorities make the per-source sample a
    pure function of row identity — stable across runs, engines, and
    partitionings, and mergeable (per-shard top-k per source folds to
    the global per-source top-k).

    Plan shape: a map-side priority projection and ONE source-keyed
    window (rank within source) — the per-group analog of x50's heap;
    the group-limit pushes below the exchange (WindowGroupLimit), so
    only ~k rows per source per input partition ever shuffle."""
    from .llm.dedup import _hexint

    d = _t(spark, sf_dir, "documents")
    u = (
        _hexint(F.md5(F.concat_ws("|", F.lit("ps"), F.col("doc_id"))), 8)
        + 0.5
    ) / F.lit(4294967296.0)
    scored = d.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.round(F.log(u) / F.col("n_chars"), 8).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("priority").desc(), "doc_id"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _X57_K)
        .select(
            "source", "doc_id", "n_chars", "priority",
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


x57_per_source_reservoir.__doc__ = x57_per_source_reservoir.__doc__.replace(
    "{_k}", str(_X57_K)
)
REGISTRY["x57_per_source_reservoir"].sql = _x57_sql()


_I8_SQL = """
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
),
v2 AS (
  SELECT o_orderkey, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 1
),
u AS (
  SELECT *, 'v1' AS batch_version FROM v1
  UNION ALL BY NAME
  SELECT *, 'v2' AS batch_version FROM v2
)
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority, batch_version
FROM u
"""


@register("i8_schema_evolution", _I8_SQL)
def i8_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant ingestion: two batch versions of the same
    feed whose schemas DIVERGED — v1 predates the o_orderdate /
    o_orderpriority columns, v2 dropped o_orderstatus — union into one
    evolved table where every batch's missing columns are typed NULLs
    and the final schema is the name-union. This is the incremental
    family's (§2.9) missing operator: feeds drift, and a pipeline that
    hard-fails on the first added column loses data while one that
    positionally unions silently CORRUPTS it (the reference's pandas
    concat aligns by name implicitly; Spark's positional union is the
    trap). ``unionByName(allowMissingColumns=True)`` is the engine
    form; DuckDB's ``UNION ALL BY NAME`` replays it, so the alignment
    itself is oracle-verified — column order, null backfill, and the
    per-row batch_version provenance tag the warehouse keeps so late
    backfills know which rows can carry the new columns.

    Plan shape: union is exchange-free in Spark — two pushed scans
    concatenate partition-wise with zero shuffles at any scale; the
    projections fuse into each scan (PushedFilters on both sides).
    Reference analog: src/extract.py's column-list discovery (S6)
    turned from a read-time check into a write-time policy."""
    o = _t(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).withColumn("batch_version", F.lit("v1"))
    v2 = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority"
    ).withColumn("batch_version", F.lit("v2"))
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        "batch_version",
    )


_X55_BUDGET_FRAC = 0.5

_X55_SQL = f"""
WITH sizes AS (
  SELECT source,
         sum(len(string_split_regex(trim(text), '\\s+'))) AS c
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT source, c,
         row_number() OVER (ORDER BY c, source) AS rk,
         sum(c) OVER (ORDER BY c, source ROWS UNBOUNDED PRECEDING) - c
           AS pre,
         count(*) OVER () AS s,
         sum(c) OVER () AS tot
  FROM sizes
),
b AS (SELECT floor({_X55_BUDGET_FRAC} * tot) AS budget FROM ranked LIMIT 1),
seg AS (
  SELECT min(rk) AS rk FROM ranked, b
  WHERE pre + (s - rk + 1) * c >= budget
),
lvl AS (
  SELECT (budget - pre) * 1.0 / (s - ranked.rk + 1) AS level
  FROM ranked JOIN seg ON ranked.rk = seg.rk CROSS JOIN b
)
SELECT sizes.source, cast(c AS BIGINT) AS n_tokens,
       round(least(c * 1.0, level), 2) AS alloc_tokens,
       round(least(c * 1.0, level) / c, 4) AS alloc_frac,
       c * 1.0 <= level AS kept_whole
FROM sizes CROSS JOIN lvl
"""


@register("x55_unimax_alloc", _X55_SQL)
def x55_unimax_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained mixture allocation by WATER-FILLING — the
    UniMax sampling rule (Chung et al. 2023): given a global token
    budget (here 50% of the corpus), every source receives
    min(its size, L) where the water level L is chosen so allocations
    sum exactly to the budget. Small sources are kept whole, large
    sources are capped at one common level — the fairness dual of
    x44's temperature mixing (which reweights by c^T and still lets
    the head dominate) and the allocation that minimizes the maximum
    repetition rate of any source under the budget. The level has a
    closed form: sort sources by size, find the segment where the
    budget line crosses the water profile (prefix + remaining*c spans
    the budget), then L = (budget - prefix_below) / n_at_or_above —
    pure window algebra, no iteration.

    Plan shape: ONE corpus-sized stage (the per-source token count,
    map-side combinable); everything after — ranking, prefix sums,
    segment pick, level — runs on the SOURCE CATALOG (a few hundred
    rows at any corpus scale), where the global-order window's single
    partition is the honest shape, same as x49's planner and the
    sequence engine's O(buckets) driver fold. Reference analog: the
    banding rules of src/transform.py, lifted from per-row category
    assignment to corpus-level capacity planning."""
    from .llm.text import token_count

    d = _t(spark, sf_dir, "documents")
    sizes = d.groupBy("source").agg(
        F.sum(token_count("text")).alias("c")
    )
    w_ord = Window.orderBy("c", "source")
    w_all = Window.partitionBy()
    ranked = sizes.select(
        "source",
        "c",
        F.row_number().over(w_ord).alias("rk"),
        (
            F.sum("c").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.col("c")
        ).alias("pre"),
        F.count(F.lit(1)).over(w_all).alias("s"),
        F.sum("c").over(w_all).alias("tot"),
    )
    withb = ranked.withColumn(
        "budget", F.floor(F.lit(_X55_BUDGET_FRAC) * F.col("tot"))
    )
    seg = (
        withb.filter(
            F.col("pre") + (F.col("s") - F.col("rk") + 1) * F.col("c")
            >= F.col("budget")
        )
        .agg(F.min("rk").alias("rk"))
    )
    lvl = (
        withb.join(seg, "rk")
        .select(
            (
                (F.col("budget") - F.col("pre"))
                / (F.col("s") - F.col("rk") + 1)
            ).alias("level")
        )
    )
    return sizes.crossJoin(F.broadcast(lvl)).select(
        "source",
        F.col("c").cast("bigint").alias("n_tokens"),
        F.round(F.least(F.col("c").cast("double"), F.col("level")), 2).alias(
            "alloc_tokens"
        ),
        F.round(
            F.least(F.col("c").cast("double"), F.col("level")) / F.col("c"),
            4,
        ).alias("alloc_frac"),
        (F.col("c").cast("double") <= F.col("level")).alias("kept_whole"),
    )


_HH5_QS = (0.5, 0.95, 0.99)

_HH5_SQL = f"""
WITH v AS (
  SELECT o_orderpriority AS grp,
         cast(round(o_totalprice * 100, 0) AS BIGINT) AS v,
         cast(o_totalprice AS DOUBLE) AS price
  FROM orders
),
b AS (
  SELECT grp, length(bin(v)) AS blen,
         CASE WHEN v < 8 THEN v
              ELSE cast(floor(v / power(2, length(bin(v)) - 4)) AS BIGINT) - 8
         END AS sub,
         count(*) AS c
  FROM v GROUP BY 1, 2, 3
),
r AS (
  SELECT grp, blen, sub, c,
         CASE WHEN blen <= 3 THEN cast(sub AS DOUBLE)
              ELSE (sub + 8.5) * power(2, blen - 4) END AS rep,
         sum(c) OVER (PARTITION BY grp ORDER BY blen, sub
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM b
),
n AS (SELECT grp, sum(c) AS n FROM b GROUP BY 1),
qs AS (SELECT unnest([{", ".join(str(q) for q in _HH5_QS)}]) AS q),
est AS (
  SELECT r.grp, qs.q, arg_min(r.rep, r.blen * 8 + r.sub) AS est_cents
  FROM r JOIN n USING (grp) CROSS JOIN qs
  WHERE r.cum >= ceil(qs.q * n.n)
  GROUP BY 1, 2
),
ex AS (
  SELECT grp,
         quantile_cont(price, 0.5) AS p50,
         quantile_cont(price, 0.95) AS p95,
         quantile_cont(price, 0.99) AS p99
  FROM v GROUP BY 1
)
SELECT est.grp AS o_orderpriority, est.q,
       cast(n.n AS BIGINT) AS n_rows,
       round(est.est_cents / 100, 2) AS q_est,
       round(CASE est.q WHEN 0.5 THEN ex.p50 WHEN 0.95 THEN ex.p95
                        ELSE ex.p99 END, 2) AS q_exact,
       round(abs(est.est_cents / 100
                 - CASE est.q WHEN 0.5 THEN ex.p50 WHEN 0.95 THEN ex.p95
                              ELSE ex.p99 END)
             / (CASE est.q WHEN 0.5 THEN ex.p50 WHEN 0.95 THEN ex.p95
                           ELSE ex.p99 END), 4) AS rel_err
FROM est JOIN n USING (grp) JOIN ex ON ex.grp = est.grp
"""


_X56_SQL = """
WITH v AS (
  SELECT event_type AS grp,
         cast(round(value * 100, 0) AS BIGINT) AS v,
         cast(value AS DOUBLE) AS price
  FROM events
),
b AS (
  SELECT grp, length(bin(v)) AS blen,
         CASE WHEN v < 8 THEN v
              ELSE cast(floor(v / power(2, length(bin(v)) - 4)) AS BIGINT) - 8
         END AS sub,
         count(*) AS c
  FROM v GROUP BY 1, 2, 3
),
r AS (
  SELECT grp, blen, sub, c,
         CASE WHEN blen <= 3 THEN cast(sub AS DOUBLE)
              ELSE (sub + 8.5) * power(2, blen - 4) END AS rep,
         sum(c) OVER (PARTITION BY grp ORDER BY blen, sub
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM b
),
n AS (SELECT grp, sum(c) AS n FROM b GROUP BY 1),
qs AS (SELECT unnest([0.25, 0.75]) AS q),
est AS (
  SELECT r.grp, qs.q, arg_min(r.rep, r.blen * 8 + r.sub) / 100 AS qv
  FROM r JOIN n USING (grp) CROSS JOIN qs
  WHERE r.cum >= ceil(qs.q * n.n)
  GROUP BY 1, 2
),
fences AS (
  SELECT a.grp,
         a.qv - 1.5 * (b.qv - a.qv) AS lo,
         b.qv + 1.5 * (b.qv - a.qv) AS hi
  FROM est a JOIN est b ON a.grp = b.grp AND a.q = 0.25 AND b.q = 0.75
),
exact AS (
  SELECT grp,
         quantile_cont(price, 0.25) AS q1x,
         quantile_cont(price, 0.75) AS q3x
  FROM v GROUP BY 1
),
xfences AS (
  SELECT grp, q1x - 1.5 * (q3x - q1x) AS xlo, q3x + 1.5 * (q3x - q1x) AS xhi
  FROM exact
),
flags AS (
  SELECT v.grp,
         sum(CASE WHEN price < f.lo OR price > f.hi THEN 1 ELSE 0 END)
           AS n_out_sketch,
         sum(CASE WHEN price < xf.xlo OR price > xf.xhi THEN 1 ELSE 0 END)
           AS n_out_exact,
         sum(CASE WHEN (price < f.lo OR price > f.hi)
                   <> (price < xf.xlo OR price > xf.xhi)
                  THEN 1 ELSE 0 END) AS n_disagree,
         count(*) AS n
  FROM v JOIN fences f USING (grp) JOIN xfences xf USING (grp)
  GROUP BY 1
)
SELECT flags.grp AS event_type,
       round(f.lo, 2) AS fence_lo, round(f.hi, 2) AS fence_hi,
       cast(n_out_sketch AS BIGINT) AS n_out_sketch,
       cast(n_out_exact AS BIGINT) AS n_out_exact,
       cast(n_disagree AS BIGINT) AS n_disagree,
       round(n_disagree * 1.0 / n, 4) AS disagree_frac
FROM flags JOIN fences f ON f.grp = flags.grp
"""


@register("x56_sketch_fence_outliers", _X56_SQL)
def x56_sketch_fence_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flagging from SKETCH quantiles: Tukey fences
    (q1 - 1.5 IQR, q3 + 1.5 IQR) computed from hh5's mergeable
    log-bin histogram instead of an exact per-group sort — the
    composition a 100 TB quality monitor actually runs, because the
    histogram folds incrementally (x41's discipline) while exact
    quantiles re-sort history every batch. x4 flags outliers against
    a mean (skew-fragile); these fences are median-family robust.
    CONTRACT form: the exact-quantile fences run in the same plan and
    the query emits the per-group flag disagreement — the number that
    says what the sketch's 1/16 bin error costs in decisions (rows
    whose price sits between the sketch fence and the exact fence),
    pinned small in tests.

    Plan shape: hh5's histogram agg (the one corpus-sized keyed
    stage, map-side combinable) + a second pass that joins two
    source-catalog-sized fence tables back to flag rows — the flag
    pass is a broadcast join, never a sort. The exact side exists
    only for the contract."""
    from .llm.sketch import logbin_histogram, logbin_quantiles

    e = _t(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100, 0).cast("bigint")
    vals = e.select(
        F.col("event_type").alias("grp"),
        v.alias("v"),
        F.col("value").cast("double").alias("price"),
    )
    b = logbin_histogram(vals, "grp", "v")
    est = logbin_quantiles(b, (0.25, 0.75), "grp").select(
        "grp", "q", (F.col("est") / 100).alias("qv")
    )
    q1 = est.filter(F.col("q") == 0.25).select("grp", F.col("qv").alias("q1"))
    q3 = est.filter(F.col("q") == 0.75).select("grp", F.col("qv").alias("q3"))
    fences = q1.join(q3, "grp").select(
        "grp",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    exact = vals.groupBy("grp").agg(
        F.percentile("price", 0.25).alias("q1x"),
        F.percentile("price", 0.75).alias("q3x"),
    )
    xfences = exact.select(
        "grp",
        (F.col("q1x") - 1.5 * (F.col("q3x") - F.col("q1x"))).alias("xlo"),
        (F.col("q3x") + 1.5 * (F.col("q3x") - F.col("q1x"))).alias("xhi"),
    )
    sk_out = (F.col("price") < F.col("lo")) | (F.col("price") > F.col("hi"))
    ex_out = (F.col("price") < F.col("xlo")) | (F.col("price") > F.col("xhi"))
    flags = (
        vals.join(F.broadcast(fences), "grp")
        .join(F.broadcast(xfences), "grp")
        .groupBy("grp")
        .agg(
            F.sum(sk_out.cast("int")).alias("n_out_sketch"),
            F.sum(ex_out.cast("int")).alias("n_out_exact"),
            F.sum((sk_out != ex_out).cast("int")).alias("n_disagree"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return flags.join(fences, "grp").select(
        F.col("grp").alias("event_type"),
        F.round(F.col("lo"), 2).alias("fence_lo"),
        F.round(F.col("hi"), 2).alias("fence_hi"),
        F.col("n_out_sketch").cast("bigint").alias("n_out_sketch"),
        F.col("n_out_exact").cast("bigint").alias("n_out_exact"),
        F.col("n_disagree").cast("bigint").alias("n_disagree"),
        F.round(F.col("n_disagree") / F.col("n"), 4).alias("disagree_frac"),
    )


@register("hh5_logbin_quantiles", _HH5_SQL)
def hh5_logbin_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a MERGEABLE log-binned histogram — the
    quantile member of the sketch family (hh1/hh2 frequencies, hh3/hh4
    cardinality): per group, bucket each value by (floor(log2), 3-bit
    mantissa prefix) — at most 8 sub-bins per octave, so the sketch is
    ~key-range-log-sized regardless of row count, the bin counts are a
    SUM monoid (per-shard/per-batch histograms fold by addition, same
    algebra as hh2's CM fold), and any quantile reads off the
    cumulative with relative error <= 1/16 by construction. Engine-
    portable by the hh4 trick: the octave is bin()-string length and
    the mantissa prefix integer division by an exact power of two — no
    float log anywhere, so the DuckDB oracle replays the histogram
    bit-for-bit. This is the CONTRACT form: exact per-group
    percentiles (x14's bit-identical percentile/quantile_cont pair)
    run in the same plan, making the sketch's error a verified number
    per (group, q).

    Plan shape: one corpus-sized keyed agg builds the histogram
    (map-side combinable); everything after — cumulative window, rank
    cut, estimate — runs on the histogram (hundreds of rows per
    group). The exact side pays the per-group percentile sort and
    exists only for the contract; at 100 TB you keep the histogram,
    fold it per batch (x41's discipline), and never re-sort history.
    Spark's own approx_percentile cannot be oracle-checked (private
    KLL layout) — same motivation as hh4 vs approx_count_distinct."""
    from .llm.sketch import logbin_histogram, logbin_quantiles

    o = _t(spark, sf_dir, "orders")
    v = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    vals = o.select(
        F.col("o_orderpriority").alias("grp"),
        v.alias("v"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    b = logbin_histogram(vals, "grp", "v")
    n = b.groupBy("grp").agg(F.sum("c").alias("n"))
    est = logbin_quantiles(b, _HH5_QS, "grp").withColumnRenamed(
        "est", "est_cents"
    )
    ex = vals.groupBy("grp").agg(
        F.percentile("price", 0.5).alias("p50"),
        F.percentile("price", 0.95).alias("p95"),
        F.percentile("price", 0.99).alias("p99"),
    )
    exact = (
        F.when(F.col("q") == 0.5, F.col("p50"))
        .when(F.col("q") == 0.95, F.col("p95"))
        .otherwise(F.col("p99"))
    )
    return (
        est.join(n, "grp")
        .join(ex, "grp")
        .select(
            F.col("grp").alias("o_orderpriority"),
            "q",
            F.col("n").cast("bigint").alias("n_rows"),
            F.round(F.col("est_cents") / 100, 2).alias("q_est"),
            F.round(exact, 2).alias("q_exact"),
            F.round(
                F.abs(F.col("est_cents") / 100 - exact) / exact, 4
            ).alias("rel_err"),
        )
    )


_X53_W = 64  # chunk window, tokens
_X53_S = 48  # stride (16-token overlap between consecutive chunks)

_X53_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) <= {_X53_W} THEN 1
              ELSE cast(ceil((len(toks) - {_X53_W}) / {_X53_S}.0) AS BIGINT) + 1
         END AS nc
  FROM t
),
c AS (SELECT doc_id, toks, unnest(range(0, nc)) AS ci FROM m)
SELECT doc_id, cast(ci AS BIGINT) AS chunk_idx,
       cast(ci * {_X53_S} + 1 AS BIGINT) AS start_tok,
       cast(len(list_slice(toks, ci * {_X53_S} + 1,
                           ci * {_X53_S} + {_X53_W})) AS BIGINT) AS n_tokens,
       md5(array_to_string(list_slice(toks, ci * {_X53_S} + 1,
                                      ci * {_X53_S} + {_X53_W}), ' '))
         AS chunk_hash
FROM c
"""


@register("x53_rag_chunks", _X53_SQL)
def x53_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-ready chunking: split every document into overlapping
    64-token windows at stride 48 (16-token overlap so no
    sentence straddling a boundary is lost to BOTH chunks), with a
    STABLE identity per chunk — (doc_id, chunk_idx, start_tok) is a
    pure function of the text, and chunk_hash is the md5 of the chunk
    content, so re-running the pipeline, re-partitioning, or growing
    the corpus never re-keys existing chunks. This is the prep stage
    every RAG / embedding pipeline runs before ann1-ann20 can index at
    sub-document granularity, and the chunk_hash column is exactly
    what dd10's chunk-dedup and x21's incremental index consume —
    chunking, dedup, and ANN share one identity scheme.

    Plan shape: the zero-shuffle ideal — one projection computes the
    chunk count per doc, one explode emits the windows, every column
    is a map-side expression over the token array; no exchange of any
    kind, so it scales embarrassingly (each 100 TB file partition
    chunks independently). Window coverage is exact: the last window
    starts at (nc-1)*48+1 <= n, so every token lands in at
    least one chunk. Reference analog: the chunked big-file read of
    src/extract.py:359-425, applied to text rather than rows."""
    from .llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    nc = (
        F.when(n <= _X53_W, F.lit(1).cast("bigint"))
        .otherwise(F.ceil((n - _X53_W) / F.lit(float(_X53_S))) + 1)
    )
    m = d.select(
        "doc_id", toks.alias("toks"), nc.alias("nc")
    )
    c = m.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("nc") - 1)).alias(
            "ci"
        ),
    )
    start = (F.col("ci") * _X53_S + 1).cast("int")
    chunk = F.slice(F.col("toks"), start, _X53_W)
    return c.select(
        "doc_id",
        F.col("ci").cast("bigint").alias("chunk_idx"),
        (F.col("ci") * _X53_S + 1).cast("bigint").alias("start_tok"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


# The external driver's correctness gate verifies exactly the FIRST 50
# ``queries()`` entries against their DuckDB oracles.
#
# STANDING GATE-ROTATION POLICY (adopted round 6, per the r5 verdict;
# staleness anchored to _GATE_ROUND and horizon raised to 4 in round 7
# — arithmetic in tests/test_gate_policy.py's module docstring):
# every round, _GATE_PREFIX =
#   (1) every query ADDED or whose code/oracle CHANGED that round —
#       a prior green row stops vouching the moment the code moves;
#   (2) the ~12 semantically subtle §2 sentinels under permanent watch
#       (f2 date-pivot, o2/o3 keep-last/first, i2 upsert, i3 watermark
#       + anti-join, j1 anti/semi split, s4 file identity, w1/o5
#       sequence engine, flagship) — the queries whose semantics are
#       easiest to silently regress;
#   (3) rotating fill, oldest last-driver-row first, so no query's
#       last hard verification ages out.
# The staleness contract is ENFORCED in tests/test_gate_policy.py,
# which recomputes each query's last-verified round from the
# CORRECTNESS_r*.json files of rounds BEFORE _GATE_ROUND and fails CI
# if a query past the horizon (including brand-new queries, never
# verified) is missing from this prefix.
_GATE_ROUND = 9  # the round this prefix was built for

# GATE ARITHMETIC, round-9 state — TWO escalations this round, both
# per the standing decide-in-the-crossing-round discipline:
# (1) the third wave pushed the registry past the round-8 bound
# 4*42+8 = 176, executing the pre-authorized shrink of the
# permanent-sentinel set from 8 to the irreplaceable 4 (flagship, f2,
# i2, s4; bound 4*46+4 = 188). The demoted sentinels (o2, i3_antijoin,
# j1_anti, w1) carry round-8 rows (due round 12) and rotate normally;
# each keeps same-module coverage via the keepers or r8-verified
# twins.
# (2) the continued build wave then crossed 188 too (registry 191),
# with no sentinel left to shed, so the horizon rises 4 -> 5 (bound
# 5*46+4 = 234) — full arithmetic and the freshness trade recorded in
# tests/test_gate_policy.py. This round-9 gate was built under
# horizon 4 and is a strict superset of what horizon 5 requires.
_GATE_PREFIX = [
    # (1) added this round (9): the point-in-time SCD2 join, the
    # retractable (delete/update-capable) MV fold, the epoch-aware
    # mixture plan, DSIR importance weights, winnowing fingerprints,
    # payload block dedup, and IVF-PQ index deletes. No existing
    # query's code or oracle changed this round (the new plan helpers
    # and similarity delete/compact functions are additive), so prior
    # rows keep vouching. Second wave: count-min heavy hitters,
    # density downsampling, the compaction planner, and the SQ8 serve.
    "i7_pointintime_join",
    "x46_retractable_mv",
    "x47_epoch_mixture",
    "tx21_dsir_importance",
    "tx22_winnow_fingerprint",
    "mm4_block_dedup",
    "ann18_index_delete",
    "hh1_countmin_topk",
    "hh2_countmin_fold",
    "hh3_linear_counting",
    "x48_density_downsample",
    "x49_compaction_bins",
    "x50_priority_sample",
    "x51_graph_pagerank",
    "ann19_sq8_topk",
    "ann20_ivf_sq8_topk",
    # Third wave: the HLL cardinality contract, the naive-Bayes
    # quality classifier, the cross-source overlap matrix, the RAG
    # chunker, the log-bin quantile sketch, the JS-drift monitor, and
    # the UniMax water-filling allocator, the schema-evolution union,
    # the n-gram novelty score, the probe-recall tuning curve, the
    # sketch-fence robust outlier monitor, the per-source fixed-k
    # reservoir, the one-pass Poisson-bootstrap SE, the Zipf/Heaps
    # corpus fingerprint, the binary-code Hamming serve, the
    # strict-order funnel, last-touch attribution, the retention
    # cohort matrix, the Markov transition matrix, the MinHash
    # estimator-error contract, the Flesch readability score, and
    # the FK-integrity audit.
    "hh4_hll_cardinality",
    "tx23_nb_quality_score",
    "x52_source_overlap",
    "x53_rag_chunks",
    "hh5_logbin_quantiles",
    "x54_source_drift",
    "x55_unimax_alloc",
    "i8_schema_evolution",
    "tx24_novelty_score",
    "ann21_probe_recall_curve",
    "x56_sketch_fence_outliers",
    "x57_per_source_reservoir",
    "x58_bootstrap_se",
    "tx25_zipf_heaps",
    "ann22_binary_hamming_topk",
    "x59_funnel_steps",
    "x60_last_touch_attribution",
    "x61_retention_cohorts",
    "x62_markov_transitions",
    "dd17_minhash_estimator_error",
    "tx26_readability",
    "i10_fk_integrity_audit",
    # (2) permanent sentinels (4, per the escalation executed above)
    "flagship_customer_segments",
    "f2_safe_date",
    "i2_upsert_last_writer_wins",
    "s4_file_identity",
    # (3) rotation (8), oldest last-driver-row first: the r5 cohort
    # MINUS s5/st2/st3/tx15 and
    # x2/x3/x4/x5/x7/x8/x9/x12/x13/x14/x15/x16/x17/x19/x20/x30/x31/
    # x33 (8 of its 30 — under the round-9 horizon-5 escalation the
    # displaced members are due round 11, not 10). The five oldest
    # r6 queries (a0-a4) are due round 11 as well.
    "a7_shipping_priority",
    "a8_local_supplier_volume",
    "ann8_embedding_moments",
    "dd1_exact_dedup",
    "i5_incremental_agg_merge",
    "i6_scd2_history",
    "mm2_frame_sample",
    "mm3_frame_dedup",
]

# Beyond the gate prefix: queries with non-trivial wall time (multi-job
# iterative plans, Python-worker stages, or large compare row counts)
# go last so a time-budgeted run maximizes checked queries; registry
# definition order is kept for everything else.
_EXPENSIVE_LAST = [
    "dd6_lsh_dup_clusters",
    "ann4_kmeans_train",
    "tx10_bigram_lm_score",
    "dd7_simhash_hamming",
    # round-7 heavies (in the r7 gate, so tail-ordered only once they
    # rotate out): ann10 runs two subspace trainings + coarse assign;
    # tx17 re-runs tx10's LM join before the tercile rank
    "ann10_ivfpq_topk",
    "tx17_perplexity_buckets",
    # round-8 heavies: ann11's FIRST invocation per dataset builds the
    # whole IVF-PQ index (later ones serve from the cache); tx19 folds
    # three batch count states before scoring; ann16 runs three Lloyd
    # passes (two base + one warm full) in-plan for oracle replay
    "ann11_ivfpq_from_index",
    "tx19_incremental_lm_score",
    "ann16_centroid_refresh",
    # round-9 heavies: tx22 runs the w-fold window explode + the
    # fine-grained (doc, window) rank; ann18 pays the cached-index
    # build on first invocation like ann11; tx21 explodes every bigram
    # (even fused, the explode is the dominant stage); x48 trains
    # k-means in-plan for the oracle twin
    "tx22_winnow_fingerprint",
    "ann18_index_delete",
    "tx21_dsir_importance",
    "x48_density_downsample",
    # x51 pays ann5's full graph build (Lloyd + per-cell gram) plus an
    # eager edge checkpoint before the three PR iterations
    "x51_graph_pagerank",
    # round-9 third-wave heavies: ann21 runs four searches (brute
    # truth + three probe levels) in one plan by design; dd17 pays
    # dd2's candidate build PLUS the exact-Jaccard truth join; ann22's
    # 48-projection agg is its fixed build cost
    "ann21_probe_recall_curve",
    "dd17_minhash_estimator_error",
    "ann22_binary_hamming_topk",
    # round-9 fourth-wave heavies: x67 pays the bipartite projection +
    # triangle joins; x68 pays the full buyer-keyed co-occurrence
    # build (support-1 pairs dominate before the HAVING)
    "x67_copurchase_triangles",
    "x68_item_similarity_topk",
]

# Fail fast on typos: a name that silently fell out of the prefix would
# skip its driver verification without any signal.
_unknown = [n for n in _GATE_PREFIX + _EXPENSIVE_LAST if n not in REGISTRY]
assert not _unknown, f"gate/tail entries not in REGISTRY: {_unknown}"
assert len(_GATE_PREFIX) == len(set(_GATE_PREFIX)) == 50, (
    f"_GATE_PREFIX must hold exactly the driver's 50 slots, "
    f"got {len(_GATE_PREFIX)}"
)
# _GATE_PREFIX may temporarily absorb an expensive-tail query (the
# round it is re-gated); _ordered_names drops it from the tail then.


def _ordered_names() -> list[str]:
    tail = [n for n in _EXPENSIVE_LAST if n not in _GATE_PREFIX]
    mid = [n for n in REGISTRY if n not in _GATE_PREFIX and n not in tail]
    return _GATE_PREFIX + mid + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].sql
        for name in _ordered_names()
        if REGISTRY[name].sql is not None
    }
