"""Reference-series queries: flagship, aggregations (a), projections (p), joins (j), sources (s), sinks (k), scalar functions (f), sort/dedup/slice (o), windows (w), incremental/temporal (i), streaming batch forms (st), set ops.

Mechanically split from the former flat queries.py (r10);
docstrings and within-family registration order unchanged.
"""

from ._shared import *  # noqa: F401,F403 — F, Window, scalar/op helpers, register
from ._shared import _t, AS_OF, REGISTRY, register  # noqa: F401
from ._helpers import (  # noqa: F401
    _DUCK_TOKS,
    _EN,
    _minhash_ctes,
)

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
    from ..operators import table_counts

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
    from ..operators import validate_and_project

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
    from ..operators.sequence import with_global_sequence

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
    from ..llm.dedup import _spread

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
    from ..plans import incremental_append_antijoin

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

    from ..sources.jdbc import (
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
    from ..operators.project import prune_valid_columns

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
    from ..llm import exact_dedup_groups, quality_score
    from ..llm.dedup import connected_components, minhash_lsh_pairs

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
    from ..plans import merge_agg_state

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
    from ..plans import point_in_time_join

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


_I13_SQL = """
WITH dim AS (
  SELECT c_custkey, c_name, c_nationkey
  FROM customer WHERE c_custkey % 97 <> 0
)
SELECT o.o_orderkey, o.o_custkey,
       coalesce(d.c_name, 'INFERRED') AS cust_name,
       cast(coalesce(d.c_nationkey, -1) AS BIGINT) AS nationkey,
       cast(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS inferred
FROM orders o LEFT JOIN dim d ON d.c_custkey = o.o_custkey
"""


@register("i13_late_arriving_dim", _I13_SQL, first_round=10)
def i13_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving-dimension handling: facts whose dimension member
    has not landed yet (simulated as every 97th customer key missing
    from the dim) join against an INFERRED placeholder member instead
    of being dropped or stalling the load — the standard warehouse
    pattern (Kimball's "inferred member") that keeps fact loads
    flowing and lets a later dim upsert (i2) heal the placeholder
    rows, which the ``inferred`` flag makes findable. The reference
    pipeline inner-joins and silently loses such facts
    (src/transform.py:220-260); this keeps them, flagged.

    Plan shape: one LEFT broadcast-hash join (dim side is
    catalog-sized and filtered before the broadcast); placeholder
    values are map-side coalesces — no second pass, no fact-sized
    shuffle."""
    o = _t(spark, sf_dir, "orders")
    dim = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 97 != 0)
        .select("c_custkey", "c_name", "c_nationkey")
    )
    j = o.join(
        F.broadcast(dim), o.o_custkey == dim.c_custkey, "left"
    )
    return j.select(
        "o_orderkey", "o_custkey",
        F.coalesce("c_name", F.lit("INFERRED")).alias("cust_name"),
        F.coalesce(F.col("c_nationkey"), F.lit(-1))
        .cast("bigint")
        .alias("nationkey"),
        F.when(F.col("c_custkey").isNull(), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("inferred"),
    )


_I14_SQL = """
WITH dim AS (
  -- recorded at tx 1: every customer, original segment, open-ended in
  -- both business time and transaction time; corrected keys close at tx 2
  SELECT c_custkey, c_mktsegment AS attr,
         1 AS valid_from, CAST(NULL AS INT) AS valid_to,
         1 AS tx_from,
         CASE WHEN c_custkey % 7 = 0 THEN 2 END AS tx_to
  FROM customer
  UNION ALL
  -- the tx-2 correction: same business validity, new attribute
  SELECT c_custkey, 'CORRECTED', 1, CAST(NULL AS INT), 2, CAST(NULL AS INT)
  FROM customer WHERE c_custkey % 7 = 0
),
f AS (
  SELECT o_orderkey, o_custkey,
         1 + (o_orderkey // 10) % 2 AS as_of_tx, 1 AS as_of_valid
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT f.o_orderkey, f.o_custkey,
       cast(f.as_of_tx AS BIGINT) AS as_of_tx, d.attr
FROM f JOIN dim d
  ON d.c_custkey = f.o_custkey
 AND d.tx_from <= f.as_of_tx AND (d.tx_to IS NULL OR f.as_of_tx < d.tx_to)
 AND d.valid_from <= f.as_of_valid
 AND (d.valid_to IS NULL OR f.as_of_valid < d.valid_to)
"""


@register("i14_bitemporal_asof", _I14_SQL, first_round=10)
def i14_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal AS-OF join — the two-clock extension of i7: each
    dimension row carries BUSINESS validity (valid_from/valid_to) AND
    TRANSACTION (record) time (tx_from/tx_to), so the query answers
    "what did we BELIEVE at tx time T about business time B". Facts
    stamped as_of_tx=1 see the ORIGINAL attribute even for keys later
    corrected (time travel ignores corrections recorded after T — the
    audit/reproducibility property a plain SCD2 history cannot give,
    because a correction OVERWRITES the belief history); facts at
    as_of_tx=2 see the correction. Corrections here: every 7th
    customer's segment re-recorded at tx 2 with unchanged business
    validity.

    Plan shape: i7's economics exactly — the join keys on the PK
    equality alone and both interval predicates ride as join
    residuals, so history depth and correction count never change the
    shuffle (one PK-keyed exchange); the dimension build is two
    map-side projections unioned. Reference analog: src/load.py's
    staged upsert destroys this distinction — the engine keeps it as a
    first-class query."""
    c = _t(spark, sf_dir, "customer")
    orig = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("attr"),
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(1).alias("tx_from"),
        F.when(F.col("c_custkey") % 7 == 0, 2).alias("tx_to"),
    )
    corr = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("CORRECTED").alias("attr"),
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(2).alias("tx_from"),
        F.lit(None).cast("int").alias("tx_to"),
    )
    dim = orig.unionByName(corr)
    f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey", "o_custkey",
            # ok % 10 == 0 keys are all even, so parity of ok itself
            # would pin every fact at tx 1 — stamp by decade parity
            (1 + (F.col("o_orderkey") / 10).cast("bigint") % 2)
            .cast("bigint").alias("as_of_tx"),
            F.lit(1).alias("as_of_valid"),
        )
    )
    j = f.join(
        dim,
        (dim.c_custkey == f.o_custkey)
        & (dim.tx_from <= f.as_of_tx)
        & (dim.tx_to.isNull() | (f.as_of_tx < dim.tx_to))
        & (dim.valid_from <= f.as_of_valid)
        & (dim.valid_to.isNull() | (f.as_of_valid < dim.valid_to)),
    )
    return j.select("o_orderkey", "o_custkey", "as_of_tx", "attr")


_I15_SQL = """
WITH arr AS (
  -- the delayed channel: every 7th event reaches the pipeline ~10
  -- sequence slots late (the fixture's event_id order is exactly
  -- time order, so lateness must be injected to be measurable —
  -- deterministic, like i7/i14's synthetic versions)
  SELECT event_id, user_id, event_type, ts,
         event_id + CASE WHEN event_id % 7 = 0 THEN 10 ELSE 0 END
           AS arrival_seq
  FROM events
),
seq AS (
  SELECT event_type, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY arrival_seq, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS hwm
  FROM arr
),
late AS (
  -- floor-divided MICROSECONDS: date_diff('second') counts boundary
  -- crossings in DuckDB while Spark's timestampdiff counts elapsed
  -- whole seconds — the sub-second phase flips them by 1
  SELECT event_type,
         (epoch_us(hwm) - epoch_us(ts)) // 1000000 AS late_s
  FROM seq
)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_events,
       cast(count(*) FILTER (WHERE late_s > 0) AS BIGINT) AS n_late,
       cast(max(late_s) AS BIGINT) AS max_late_s,
       round(quantile_cont(late_s, 0.95), 2) AS p95_late_s
FROM late GROUP BY 1
"""


@register("i15_late_data_profile", _I15_SQL, first_round=10)
def i15_late_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data (watermark lateness) profile: how far behind each
    user's event-time high-water-mark do events actually arrive,
    summarized per event type — THE empirical input to setting a
    streaming watermark (st1-st3's ``withWatermark`` delay) and the
    audit that explains dropped-row counts after the fact. Arrival
    order is the event_id sequence with a DETERMINISTIC delayed
    channel injected (every 7th event arrives ~10 slots late — the
    fixture's id order is exactly time order, so without a modeled
    delay the profile would be vacuously zero; same synthetic-version
    discipline as i7/i14); lateness of an event is how far the user's
    running max event-time had already advanced past it when it
    arrived (0 = in-order).

    Plan shape: ONE user-keyed ordered window computes the running
    high-water-mark (same exchange shape as x63's repair windows),
    then a |types|-row agg with exact integer seconds; the p95 is
    percentile interpolation over exact ints (bit-identical across
    engines). No joins, no global stage."""
    e = _t(spark, sf_dir, "events")
    arr = e.select(
        "event_id", "user_id", "event_type", "ts",
        (
            F.col("event_id")
            + F.when(F.col("event_id") % 7 == 0, 10).otherwise(0)
        ).alias("arrival_seq"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_seq", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = arr.select(
        "event_type", "ts", F.max("ts").over(w).alias("hwm")
    )
    late = seq.select(
        "event_type",
        (
            F.expr("timestampdiff(MICROSECOND, ts, hwm)")
            / F.lit(1_000_000)
        ).cast("bigint").alias("late_s"),
    )
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count(F.when(F.col("late_s") > 0, 1))
        .cast("bigint")
        .alias("n_late"),
        F.max("late_s").cast("bigint").alias("max_late_s"),
        F.round(F.percentile(F.col("late_s"), F.lit(0.95)), 2).alias(
            "p95_late_s"
        ),
    )


_I16_SQL = """
WITH snaps AS (
  SELECT DISTINCT date_trunc('day', o_orderdate) AS snap FROM orders
),
ref AS (SELECT max(snap) + INTERVAL 1 DAY AS r FROM snaps),
j AS (
  SELECT snap,
         date_diff('day', snap, ref.r) AS age_d,
         snap = date_trunc('day', last_day(snap) + INTERVAL 0 DAY)
           AS is_month_end,
         month(snap) = 12 AND day(snap) = 31 AS is_year_end
  FROM snaps, ref
)
SELECT cast(snap AS TIMESTAMP) AS snap,
       CASE WHEN age_d <= 30 THEN 'daily'
            WHEN is_year_end THEN 'yearly'
            WHEN is_month_end AND age_d <= 365 THEN 'monthly'
            ELSE 'expire' END AS reason,
       cast(CASE WHEN age_d <= 30
                 OR is_year_end
                 OR (is_month_end AND age_d <= 365)
            THEN 1 ELSE 0 END AS BIGINT) AS retained
FROM j
"""


@register("i16_retention_planner", _I16_SQL, first_round=10)
def i16_retention_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-retention (GFS) planner: given the set of daily table
    snapshots (one per distinct order day here), classify each under
    the grandfather-father-son policy — keep every daily snapshot for
    30 days, month-end snapshots for a year, year-end snapshots
    forever, expire the rest — the table-format maintenance decision
    (Delta VACUUM / Iceberg expire_snapshots) expressed as a pure,
    auditable query over snapshot metadata instead of a side-effecting
    default. Each snapshot gets the FIRST tier that claims it plus the
    retained bit, so the expiration job is a trivial anti-join against
    this plan's retained rows.

    Plan shape: one distinct over the snapshot column (the only
    data-sized stage — snapshot METADATA is tiny in practice; here it
    is derived from the fact table to have real dates), then pure
    map-side date arithmetic against the newest-snapshot anchor (a
    single-row broadcast; anchoring "now" to the data keeps the plan
    deterministic AND meaningful whatever the fixture's date range).
    No windows."""
    o = _t(spark, sf_dir, "orders")
    snaps = o.select(
        F.date_trunc("day", "o_orderdate").alias("snap")
    ).distinct()
    snaps = snaps.localCheckpoint(eager=False)
    ref = snaps.agg(
        F.date_add(F.max("snap"), 1).cast("timestamp").alias("r")
    )
    snaps = snaps.crossJoin(F.broadcast(ref))
    age = F.datediff(F.col("r"), "snap")
    is_me = F.col("snap") == F.date_trunc("day", F.last_day("snap"))
    is_ye = (F.month("snap") == 12) & (F.dayofmonth("snap") == 31)
    keep = (age <= 30) | is_ye | (is_me & (age <= 365))
    return snaps.select(
        "snap",
        F.when(age <= 30, "daily")
        .when(is_ye, "yearly")
        .when(is_me & (age <= 365), "monthly")
        .otherwise("expire")
        .alias("reason"),
        F.when(keep, 1).otherwise(0).cast("bigint").alias("retained"),
    )


_I17_SQL = """
WITH sk AS (
  SELECT o_custkey,
         o_orderpriority, o_orderstatus, o_orderdate, o_totalprice,
         epoch(o_orderdate) * 100000000 + o_orderkey AS recency_key
  FROM orders
),
mode AS (
  SELECT o_custkey, o_orderstatus AS modal_status FROM (
    SELECT o_custkey, o_orderstatus,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY count(*) DESC, o_orderstatus DESC)
             AS rn
    FROM sk GROUP BY 1, 2
  ) WHERE rn = 1
),
agg AS (
  SELECT o_custkey,
         arg_max(o_orderpriority, recency_key) AS latest_priority,
         min(o_orderdate) AS first_order_ts,
         max(cast(round(o_totalprice * 100) AS BIGINT)) AS max_price_cents,
         count(*) AS n_orders
  FROM sk GROUP BY 1
)
SELECT a.o_custkey AS custkey, a.latest_priority, m.modal_status,
       a.first_order_ts, a.max_price_cents, a.n_orders
FROM agg a JOIN mode m ON m.o_custkey = a.o_custkey
"""


@register("i17_survivorship_golden_record", _I17_SQL, first_round=11)
def i17_survivorship_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record) merge — the MDM operation that
    collapses an entity's conflicting records into one canonical row
    with a DIFFERENT rule per field (reference analog: the staged
    upsert keeps whole-row last-writer-wins, src/load.py; survivorship
    is its field-level generalization). Per customer, over their order
    history: most-RECENT priority (recency rule, ties broken by order
    key), most-FREQUENT status (frequency rule, modal ties broken by
    value), FIRST order date (min rule), LARGEST price in exact cents
    (max rule), plus the record count.

    Plan shape: recency/min/max/count ride ONE customer-keyed agg with
    map-side partials (max_by's partial state is one (value, key)
    pair); the mode needs its own (customer, status)-keyed count first
    — grouping-key change, so a second exchange — then a
    customer-keyed group-limit window (WindowGroupLimit prunes
    map-side) and a customer-keyed join that AQE plans shuffle-free on
    the shared partitioning. The recency key is exact integer
    (epoch-seconds * 1e8 + orderkey); prices compare in integer
    cents."""
    o = _t(spark, sf_dir, "orders")
    sk = (
        F.unix_timestamp("o_orderdate") * F.lit(100000000)
        + F.col("o_orderkey")
    ).alias("recency_key")
    agg = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max_by("o_orderpriority", sk).alias("latest_priority"),
        F.min("o_orderdate").alias("first_order_ts"),
        F.max(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "max_price_cents"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
    wm = Window.partitionBy("o_custkey").orderBy(
        F.col("cnt").desc(), F.col("o_orderstatus").desc()
    )
    mode = (
        o.groupBy("o_custkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("modal_status"),
        )
    )
    return agg.join(mode, "custkey").select(
        "custkey", "latest_priority", "modal_status",
        "first_order_ts", "max_price_cents", "n_orders",
    )


_I18_TARGET_PER_KEY = 4  # salt so no salted key exceeds 4x the mean


def _i18_salt_expr():
    """Exact ceil-div salt factor over the agg columns (max_key_rows,
    n_keys, n_rows) — r11 advice fix: the old bigint '/' went through
    DOUBLE division then cast-truncate, which is off-by-one once
    max_key_rows*n_keys passes 2^53 (witness values pinned in
    tests/test_round12_ops.py). `div` on decimal(38,0) operands is
    exact integral division, matching the oracle's integer '//'."""
    t = _I18_TARGET_PER_KEY
    return F.expr(
        "cast((cast(max_key_rows AS decimal(38,0)) * n_keys"
        f" + {t} * cast(n_rows AS decimal(38,0)) - 1) div"
        f" ({t} * cast(n_rows AS decimal(38,0))) AS bigint)"
    )


def _i18_leg_sql(table: str, key: str, rel: str) -> str:
    return f"""
  SELECT '{rel}' AS relationship,
         count(*) AS n_keys,
         cast(sum(cnt) AS BIGINT) AS n_rows,
         max(cnt) AS max_key_rows,
         round(quantile_cont(cnt, 0.99), 2) AS p99_key_rows,
         round(max(cnt) * count(*) * 1.0 / sum(cnt), 2) AS skew_ratio,
         cast((max(cnt) * count(*) + {_I18_TARGET_PER_KEY} * sum(cnt) - 1)
              // ({_I18_TARGET_PER_KEY} * sum(cnt)) AS BIGINT)
           AS salt_factor
  FROM (SELECT {key} AS k, count(*) AS cnt FROM {table} GROUP BY 1)
"""


_I18_SQL = " UNION ALL ".join(
    _i18_leg_sql(t, k, r)
    for t, k, r in [
        ("lineitem", "l_orderkey", "lineitem->orders"),
        ("lineitem", "l_partkey", "lineitem->part"),
        ("orders", "o_custkey", "orders->customer"),
    ]
)


@register("i18_join_skew_audit", _I18_SQL, first_round=11)
def i18_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-skew audit over the FK graph — the shuffle-planning
    companion to i10's integrity audit: per relationship, the key
    count, max and p99 rows-per-key, the skew ratio (max/mean), and a
    recommended SALT factor (ceil(max / (4 * mean)), exact integer
    arithmetic) — 1 means no salting needed. This is the measurement
    a 100 TB join plans against: AQE's skew-join handles moderate
    cases at runtime, but a persistent hot key (celebrity user, null
    surrogate, default SKU) wants deliberate salting, and this audit
    is how the pipeline decides BEFORE burning a 1000-executor
    shuffle.

    Plan shape: per relationship one (key)-keyed count with map-side
    partials, folded to a single row by an exact-percentile agg over
    the per-key count distribution (key-cardinality-sized, not
    row-sized); three legs union to 3 rows. No windows, no joins."""
    legs = []
    for tbl, key, rel in [
        ("lineitem", "l_orderkey", "lineitem->orders"),
        ("lineitem", "l_partkey", "lineitem->part"),
        ("orders", "o_custkey", "orders->customer"),
    ]:
        cnts = (
            _t(spark, sf_dir, tbl)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        legs.append(
            cnts.agg(
                F.lit(rel).alias("relationship"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("cnt").alias("n_rows"),
                F.max("cnt").alias("max_key_rows"),
                F.round(F.percentile("cnt", F.lit(0.99)), 2).alias(
                    "p99_key_rows"
                ),
                F.round(
                    F.max("cnt") * F.count(F.lit(1)) / F.sum("cnt"), 2
                ).alias("skew_ratio"),
            ).select("*", _i18_salt_expr().alias("salt_factor"))
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def _i19_suites():
    from ..operators.expectations import Expectation as E

    return {
        "customer": [
            E("c_custkey", "not_null"),
            E("c_custkey", "unique"),
            E("c_acctbal", "in_range", lo=-1000.0, hi=10000.0),
            E(
                "c_mktsegment", "in_set",
                allowed=(
                    "AUTOMOBILE", "BUILDING", "FURNITURE",
                    "HOUSEHOLD", "MACHINERY",
                ),
            ),
        ],
        "orders": [
            E("o_orderkey", "unique"),
            E("o_totalprice", "in_range", lo=0.0, hi=1000000.0),
            E("o_orderpriority", "matches", pattern="^[1-5]-"),
            E("o_orderstatus", "in_set", allowed=("F", "O", "P")),
        ],
        "lineitem": [
            E("l_quantity", "in_range", lo=1.0, hi=50.0),
            E("l_discount", "in_range", lo=0.0, hi=0.1),
            E("l_shipdate", "not_null"),
        ],
        "documents": [
            E("text", "non_empty"),
            E("lang", "in_set", allowed=("de", "en", "es", "fr", "zh")),
            E("doc_id", "unique"),
        ],
    }


def _i19_sql() -> str:
    from ..operators.expectations import evaluate_sql

    suites = _i19_suites()
    ctes = ", ".join(
        evaluate_sql(t, suite) for t, suite in suites.items()
    )
    union = " UNION ALL ".join(f"SELECT * FROM rep_{t}" for t in suites)
    return f"WITH {ctes} {union}"


@register("i19_dq_expectations", None, first_round=11)
def i19_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite (the Deequ /
    Great-Expectations shape): per-column contracts — completeness,
    uniqueness, value ranges, domain membership, regex shape,
    non-emptiness — declared as data and compiled into ONE aggregation
    pass per table, reported as (table, check, metric, threshold,
    passed) rows. The reference's health check probes connections and
    row counts (test.py:134-160); this is that idea extended to the
    column contracts a warehouse actually breaks silently.

    Plan shape: N expectations on a table cost one scan with map-side
    partial aggregation (count_distinct is the one partial-heavy
    member), folded to a single row and unpivoted to report rows via
    explode(map) — report size is suite-sized, never data-sized. Four
    tables = four independent scans union'd; Catalyst prunes each scan
    to exactly the checked columns."""
    from ..operators.expectations import evaluate

    suites = _i19_suites()
    out = None
    for t, suite in suites.items():
        rep = evaluate(_t(spark, sf_dir, t), t, suite)
        out = rep if out is None else out.unionByName(rep)
    return out


REGISTRY["i19_dq_expectations"].sql = _i19_sql()


_I20_SQL = """
WITH hours AS (
  SELECT DISTINCT event_type,
         epoch_us(date_trunc('hour', ts)) // 3600000000 AS h
  FROM events
),
span AS (SELECT min(h) AS h0, max(h) AS h1 FROM hours),
per AS (
  SELECT event_type,
         count(*) AS present,
         max(gap) AS max_inner_gap,
         min(h) AS first_h,
         max(h) AS last_h
  FROM (
    SELECT event_type, h,
           coalesce(h - lag(h) OVER (PARTITION BY event_type ORDER BY h)
                    - 1, 0) AS gap
    FROM hours
  ) GROUP BY 1
)
SELECT p.event_type,
       cast(s.h1 - s.h0 + 1 AS BIGINT) AS expected_hours,
       cast(p.present AS BIGINT) AS present_hours,
       cast(s.h1 - s.h0 + 1 - p.present AS BIGINT) AS missing_hours,
       cast(greatest(p.max_inner_gap,
                     p.first_h - s.h0,
                     s.h1 - p.last_h) AS BIGINT) AS max_gap_hours
FROM per p, span s
"""


@register("i20_missing_partition_audit", _I20_SQL, first_round=11)
def i20_missing_partition_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-partition (data-gap) audit: per event type, how many
    hourly slots of the corpus's global [first, last] hour carry data,
    how many are missing, and the LONGEST contiguous gap — including
    leading/trailing gaps against the global span. This is the
    freshness/completeness check a partition-aware scheduler runs
    before declaring a backfill range: i15 profiles lateness of what
    ARRIVED, this audits what NEVER arrived.

    Plan shape: one distinct over (type, hour) — the only event-sized
    stage — then a type-keyed lag window over the hour-level rows
    (slot-count-sized: 24*days per type) and a broadcast global-span
    join. Gap arithmetic is exact integers on epoch-hour indices."""
    e = _t(spark, sf_dir, "events")
    h = (
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " date_trunc('hour', ts))"
        )
        / 3600000000
    ).cast("bigint")
    hours = e.select("event_type", h.alias("h")).distinct()
    span = hours.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    wl = Window.partitionBy("event_type").orderBy("h")
    gaps = hours.withColumn(
        "gap",
        F.coalesce(F.col("h") - F.lag("h").over(wl) - 1, F.lit(0)),
    )
    per = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("present"),
        F.max("gap").alias("max_inner_gap"),
        F.min("h").alias("first_h"),
        F.max("h").alias("last_h"),
    )
    return per.crossJoin(F.broadcast(span)).select(
        "event_type",
        (F.col("h1") - F.col("h0") + 1).cast("bigint").alias(
            "expected_hours"
        ),
        F.col("present").cast("bigint").alias("present_hours"),
        (F.col("h1") - F.col("h0") + 1 - F.col("present"))
        .cast("bigint")
        .alias("missing_hours"),
        F.greatest(
            F.col("max_inner_gap"),
            F.col("first_h") - F.col("h0"),
            F.col("h1") - F.col("last_h"),
        )
        .cast("bigint")
        .alias("max_gap_hours"),
    )


@register(
    "a9_promotion_effect",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    GROUP BY 1 = 1
    """,
)
def a9_promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of one month's
    revenue from PROMO-class parts — a selective date filter PUSHED to
    the fact scan, the part dimension BROADCAST, and a single
    conditional-aggregation row. At 100 TB the month filter is the
    whole story: with date-partitioned layout it prunes ~99% of files
    before any join runs."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "a10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(cast(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) / 100.0, 2) AS revenue,
           cast(count(*) AS BIGINT) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY 1, 2
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def a10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): the top-20 customers
    by revenue lost to returns in one quarter — the churn-risk list a
    support org works through. Quarter filter pushed to the orders
    scan, return-flag filter pushed to lineitem, customer dim
    broadcast, top-20 via TakeOrderedAndProject (per-partition heap,
    no global sort). Revenue accumulates in exact per-item CENTS —
    raw double sums differ across engines in the last ulp and flipped
    a round(2) boundary here (.595) at sf0.01."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(rev_cents) / 100.0, 2).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "a11_forecast_revenue_change",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS potential_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    GROUP BY 1 = 1
    """,
)
def a11_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the revenue that
    would have been kept had small-quantity mid-discount orders not
    been discounted — a pure filter-and-fold with ZERO joins and zero
    windows: every predicate reaches the scan (PushedFilters carries
    all four), the agg is one map-side-combined row. The sanity
    benchmark of scan efficiency: if this query is slow, the problem
    is layout, never the plan."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("potential_revenue")
    )


@register(
    "a12_late_order_priorities",
    """
    SELECT o_orderpriority, cast(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY 1
    """,
)
def a12_late_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in one quarter
    with AT LEAST ONE line item shipped after the order date, counted
    by priority — the canonical EXISTS subquery, which must compile to
    a LEFT SEMI join (each order tested once, no fan-out from
    multi-line matches — an inner join + distinct would shuffle every
    matching line item). Quarter filter pushed to the orders scan; the
    semi-join's probe side carries only (orderkey, shipdate)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )


@register(
    "a13_customer_order_distribution",
    """
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY 1
    )
    SELECT cast(n_orders AS BIGINT) AS n_orders,
           cast(count(*) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY 1
    """,
)
def a13_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): the histogram of
    order counts per customer INCLUDING zero-order customers — the
    LEFT OUTER join + double aggregation that separates "how many
    customers never ordered" from every inner-join formulation (which
    silently drops them). count(o_orderkey) over the left join counts
    matches only (NULL-skipping COUNT), so no-order customers land in
    the 0 bucket; the second agg is bucket-sized."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per.groupBy(F.col("n_orders").cast("bigint").alias("n_orders")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


@register(
    "a14_large_volume_orders",
    """
    WITH big AS (
      SELECT l_orderkey, cast(sum(l_quantity) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY 1
      HAVING sum(l_quantity) > 300
    )
    SELECT c_name, o_orderkey, o_orderdate,
           cast(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def a14_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose line
    items sum to more than 300 units, with their customers — the
    group-HAVING-then-join pattern: the quantity aggregation runs
    FIRST and its tiny surviving set (sub-0.1% of orders here) drives
    broadcast joins back to orders and customers, so the fact tables
    are never joined row-to-row before the filter. Quantities are
    integral, so the HAVING threshold is exact; top-20 rides
    TakeOrderedAndProject."""
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qd"))
        .filter(F.col("qd") > 300)
        .select(
            "l_orderkey", F.col("qd").cast("bigint").alias("total_qty")
        )
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("totalprice_cents"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@register(
    "a15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.rev_cents
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_cents = (SELECT max(rev_cents) FROM rev)
    """,
)
def a15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with the
    maximum quarterly revenue — the scalar-MAX-subquery pattern that a
    LIMIT 1 gets WRONG under ties: the max folds to a single-row
    broadcast and an equality filter keeps every tied supplier.
    Revenue accumulates in exact per-item cents (float sums order
    differently across engines, and an equality test on a float max
    is exactly where that bites). One quarter-pruned fact scan, one
    supplier-keyed agg, two broadcasts."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(cents).cast("bigint").alias("rev_cents")
    )
    mx = rev.agg(F.max("rev_cents").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "rev_cents")
    )


@register(
    "a16_waiting_blame",
    """
    WITH j AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ),
    per AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS ns,
             count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS nl,
             max(CASE WHEN is_late THEN l_suppkey END) AS blame
      FROM j GROUP BY 1
    )
    SELECT s_suppkey, s_name, cast(count(*) AS BIGINT) AS numwait
    FROM per JOIN supplier ON s_suppkey = blame
    WHERE ns >= 2 AND nl = 1
    GROUP BY 1, 2
    ORDER BY numwait DESC, s_suppkey
    LIMIT 10
    """,
)
def a16_waiting_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): per
    supplier, the multi-supplier orders where THEY were the only late
    one (late = shipped more than 60 days after the order date — the
    fixture's proxy for receipt-past-commit). The textbook form is the
    hardest TPC-H join shape — an EXISTS (another supplier) plus a
    NOT EXISTS (another LATE supplier), i.e. a semi-join AND an
    anti-join both probing lineitem again. This implementation uses
    the GROUPED rewrite instead: one order-keyed pass computes the
    distinct-supplier count, the distinct-LATE-supplier count, and the
    blamed supplier (max over a CASE — exact, since qualifying orders
    have exactly one late supplier), so the fact join is scanned ONCE
    and shuffled once, where the textbook plan probes it three times.
    Same semantics, one third the fact traffic — the rewrite you want
    at 100 TB. Top-10 rides TakeOrderedAndProject; supplier dim
    broadcasts."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ).alias("is_late"),
    )
    # two-stage rewrite of the double-countDistinct (r15, guide §2.3
    # "aggregate before you shuffle"): the multi-distinct plan Expands
    # every joined row x3 before its first exchange; collapsing to the
    # (order, supplier) grain first shuffles each joined row ONCE and
    # the second, order-keyed agg runs on supplier-grain rows.
    # Identical semantics: ns = countDistinct(supp) = count over the
    # collapsed grain; nl = countDistinct(supp | late) = count of
    # suppliers with ANY late line; blame = max(supp | late) unchanged
    # by the per-supplier max-first fold.
    per_supp = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("late")
    )
    per = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("ns"),
        F.count(F.when(F.col("late"), 1)).alias("nl"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("blame"),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.filter((F.col("ns") >= 2) & (F.col("nl") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("blame"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(10)
    )


# ===========================================================================
# Round-12: the last four distinct TPC-H shapes — Q2 (correlated min),
# Q11 (group HAVING vs a global scalar), Q20 (nested semi-join chain),
# Q22 (anti-join + substring bucketing). The fixture has no partsupp
# table, so lineitem serves as the part-supplier offer relation; the
# SHAPES (and the plans that make them scale) are the point.
# ===========================================================================


@register(
    "a17_min_cost_supplier",
    """
    WITH eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON n_nationkey = s_nationkey
                    JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    pp AS (SELECT p_partkey, p_name FROM part WHERE p_type = 'PROMO'),
    offers AS (
      SELECT l_partkey, l_suppkey,
             min(cast(round(l_extendedprice * 100) AS BIGINT) * 1000
                 // cast(l_quantity AS BIGINT)) AS unit_millicents
      FROM lineitem
      JOIN pp ON p_partkey = l_partkey
      JOIN eu ON s_suppkey = l_suppkey
      GROUP BY 1, 2
    ),
    best AS (
      SELECT l_partkey AS bp, min(unit_millicents) AS best_mc
      FROM offers GROUP BY 1
    )
    SELECT cast(round(eu.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
           eu.s_name, eu.n_name, pp.p_partkey, pp.p_name,
           o.unit_millicents
    FROM offers o
    JOIN best ON bp = o.l_partkey AND o.unit_millicents = best_mc
    JOIN eu ON eu.s_suppkey = o.l_suppkey
    JOIN pp ON pp.p_partkey = o.l_partkey
    ORDER BY acctbal_cents DESC, eu.s_name, pp.p_partkey
    LIMIT 100
    """,
    first_round=12,
)
def a17_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every PROMO part,
    the EUROPE supplier offering the lowest unit price, ties kept —
    the correlated-min-subquery pattern DECORRELATED into a per-part
    min aggregate plus an equality join back to the offer table
    (reference analog: the price-lookup joins of src/transform.py,
    generalized). The unit price is exact integer millicents
    (cents * 1000 div quantity) — a float division here would make
    the min-equality test engine-dependent, the same trap a15's
    revenue max dodges with cents.

    Plan shape: the dim chain region -> nation -> supplier broadcasts
    into the fact scan (pushed p_type filter prunes parts first), ONE
    (part, supplier)-keyed agg builds the offer table, and the
    per-part min is a WINDOW over the offer table (partition = part,
    supplier-bounded fan-in) rather than an agg-plus-self-join — the
    join form references the offer subplan twice, which only stays
    single-scan if AQE's exchange reuse fires; the window makes the
    single fact scan STRUCTURAL (plan guard pins it). The textbook
    correlated form re-evaluates the min per outer row. Top-100 rides
    TakeOrderedAndProject on the (acctbal, name, part) total order."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pp = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey", "p_name")
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    offers = (
        l.join(F.broadcast(pp), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.expr(
                    "cast(round(l_extendedprice * 100) AS BIGINT) * 1000"
                    " div cast(l_quantity AS BIGINT)"
                )
            ).alias("unit_millicents")
        )
    )
    wbest = Window.partitionBy("l_partkey")
    return (
        offers.withColumn(
            "best_mc", F.min("unit_millicents").over(wbest)
        )
        .filter(F.col("unit_millicents") == F.col("best_mc"))
        .join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(pp), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            F.round(F.col("s_acctbal") * 100)
            .cast("bigint")
            .alias("acctbal_cents"),
            "s_name", "n_name", "p_partkey", "p_name", "unit_millicents",
        )
        .orderBy(F.desc("acctbal_cents"), "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "a18_important_stock",
    """
    WITH val AS (
      SELECT l_partkey,
             cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_18'
      GROUP BY 1
    ),
    tot AS (
      SELECT cast(sum(value_cents) AS HUGEINT) AS total_cents,
             count(*) AS n_parts
      FROM val
    )
    SELECT l_partkey AS p_partkey, value_cents
    FROM val, tot
    WHERE cast(value_cents AS HUGEINT) * n_parts * 2 > total_cents * 3
    ORDER BY value_cents DESC, p_partkey
    """,
    first_round=12,
)
def a18_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part traded value from
    ONE nation's suppliers, keeping parts whose value exceeds a
    threshold derived from the GLOBAL total — the group-HAVING-vs-
    global-scalar pattern. TPC-H's fixed fraction (0.0001/SF) empties
    as the corpus grows, so the threshold here is scale-free: parts
    holding more than 1.5x the MEAN share (value * n_parts * 2 >
    total * 3, compared in exact decimal/HUGEINT — at 100 TB
    value * n_parts overflows int64, the r11-advice class of bug).

    Plan shape: the nation-filtered supplier dim broadcasts into one
    fact scan, ONE part-keyed agg builds the value table, the global
    scalar folds from it as a 1-row broadcast cross join (the audited
    pattern), and the HAVING is a map-side filter — no second fact
    scan, no window. The value table is eagerly materialized
    (parts-sized, the engine's standard diamond-dependency trade —
    same as minhash materialize=True): without it Catalyst re-derives
    the agg for the scalar branch and the plan pays TWO fact scans
    (measured: the un-materialized form showed 2 lineitem scans and a
    5.1× wall at 10× data; exchange reuse does not unify the branches
    because the scalar side re-aggregates above the shuffle)."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_18")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .select("s_suppkey")
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    val = (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(cents).cast("bigint").alias("value_cents"))
        .localCheckpoint(eager=True)
    )
    tot = val.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.expr(
                "cast(value_cents AS decimal(38,0)) * n_parts * 2"
                " > cast(total_cents AS decimal(38,0)) * 3"
            )
        )
        .select("p_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


@register(
    "a19_excess_inventory_suppliers",
    """
    WITH sp AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small %'
    ),
    g AS (
      SELECT l_partkey, l_suppkey,
             sum(cast(l_quantity AS BIGINT)) AS supp_qty,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01'
                       AND l_shipdate < TIMESTAMP '1996-01-01'
                      THEN cast(l_quantity AS BIGINT) ELSE 0 END)
               AS supp_qty95
      FROM lineitem JOIN sp ON p_partkey = l_partkey
      GROUP BY 1, 2
    ),
    y AS (
      SELECT l_partkey, sum(supp_qty95) AS year_qty
      FROM g GROUP BY 1
    ),
    qual AS (
      SELECT DISTINCT l_suppkey
      FROM g JOIN y USING (l_partkey)
      WHERE year_qty > 0 AND 2 * supp_qty > year_qty
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (SELECT l_suppkey FROM qual)
    ORDER BY s_name
    """,
    first_round=12,
)
def a19_excess_inventory_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape (excess inventory): ASIA suppliers who, for
    some 'small *' part, hold more lifetime shipped quantity than
    half that part's 1995 demand — the nested semi-join chain
    (supplier IN (... part IN (...) AND correlated-sum ...)) that Q20
    builds over partsupp, re-expressed on the lineitem offer relation.

    Plan shape: the name-filtered part set broadcasts into ONE fact
    scan that computes BOTH aggregates as conditional sums of a
    single (part, supplier)-keyed pass (the textbook form scans the
    fact once for availqty and AGAIN for the correlated 1995 sum);
    the per-part demand is a WINDOW sum over that agg's output
    (supplier-bounded fan-in per part — the agg-plus-rejoin form only
    stays single-scan if AQE exchange reuse fires; the window pins
    it structurally); the qualifying supplier set compiles to a
    LeftSemi into the
    supplier dim, with the region chain broadcast. Quantities
    accumulate as exact bigints."""
    sp = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small %"))
        .select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in95 = (F.col("l_shipdate") >= "1995-01-01") & (
        F.col("l_shipdate") < "1996-01-01"
    )
    qty = F.col("l_quantity").cast("bigint")
    g = (
        l.join(F.broadcast(sp), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(qty).alias("supp_qty"),
            F.sum(F.when(in95, qty).otherwise(F.lit(0))).alias(
                "supp_qty95"
            ),
        )
    )
    wy = Window.partitionBy("l_partkey")
    qual = (
        g.withColumn("year_qty", F.sum("supp_qty95").over(wy))
        .filter(
            (F.col("year_qty") > 0)
            & (2 * F.col("supp_qty") > F.col("year_qty"))
        )
        .select("l_suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")
        )
        .join(
            qual, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "a20_lost_customers",
    """
    WITH pos AS (
      SELECT cast(sum(cast(round(c_acctbal * 100) AS BIGINT))
                  AS HUGEINT) AS pos_cents,
             count(*) AS n_pos
      FROM customer WHERE c_acctbal > 0
    ),
    rich AS (
      SELECT c_custkey, substr(c_name, 18, 1) AS code,
             cast(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer, pos
      WHERE substr(c_name, 18, 1) IN ('1', '3', '5', '7', '9')
        AND cast(cast(round(c_acctbal * 100) AS BIGINT) AS HUGEINT)
            * n_pos > pos_cents
    ),
    lost AS (
      SELECT r.code, r.bal_cents FROM rich r
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = r.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-07-01'
      )
    )
    SELECT code, cast(count(*) AS BIGINT) AS n_custs,
           cast(sum(bal_cents) AS BIGINT) AS total_bal_cents
    FROM lost GROUP BY 1 ORDER BY 1
    """,
    first_round=12,
)
def a20_lost_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-
    balance customers in selected name-code buckets with NO recent
    order, grouped by bucket — the anti-join + substring-bucketing +
    global-scalar-filter triple. The fixture's customers all ordered
    at least once (and have no phone column), so 'lost' means no
    order since 2000-07-01 and the bucket is the last digit of
    c_name — same shape, live selectivity at every test SF.

    Plan shape: the positive-balance average folds to a 1-row
    broadcast (exact cents x count comparison in decimal — no float
    average, no off-by-ulp boundary); the recent-orders side prunes
    to one pushed date filter before the LeftAnti (anti-join input is
    recent-orders-sized, not orders-sized); the report agg is
    bucket-sized. One customer scan, one pruned orders scan."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "pos_cents"
        ),
        F.count(F.lit(1)).alias("n_pos"),
    )
    rich = (
        c.withColumn("code", F.substring("c_name", 18, 1))
        .filter(F.col("code").isin("1", "3", "5", "7", "9"))
        .withColumn(
            "bal_cents", F.round(F.col("c_acctbal") * 100).cast("bigint")
        )
        .crossJoin(F.broadcast(pos))
        .filter(
            F.expr(
                "cast(bal_cents AS decimal(38,0)) * n_pos"
                " > cast(pos_cents AS decimal(38,0))"
            )
        )
        .select("c_custkey", "code", "bal_cents")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-07-01"
    )
    return (
        rich.join(
            recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
        )
        .groupBy("code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_custs"),
            F.sum("bal_cents").cast("bigint").alias("total_bal_cents"),
        )
        .orderBy("code")
    )
