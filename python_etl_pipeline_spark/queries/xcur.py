"""Curation / engine-extension x-series (first half by registration order): rollup/cube, sampling, sessionization, as-of/range joins, CDC apply, mixtures.

Mechanically split from the former flat queries.py (r10);
docstrings and within-family registration order unchanged.
"""

from ._shared import *  # noqa: F401,F403 — F, Window, scalar/op helpers, register
from ._shared import _t, AS_OF, REGISTRY, register  # noqa: F401
from ._shared import (  # noqa: F401
    _hb_sql,
)
from ._helpers import (  # noqa: F401
    _DUCK_QUALITY,
    _DUCK_TOKS,
    _minhash_ctes,
)

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
    from ..operators.asof import asof_join

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
    from ..llm.dedup import _h32_sql

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
    from ..llm.dedup import _h32

    d = _t(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        _h32(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|seed42"))))
        .alias("__h"),
    )
    from ..operators.sequence import with_global_sequence

    return with_global_sequence(
        keyed, ["__h", "doc_id"], name="shuffle_pos"
    ).select("doc_id", "shuffle_pos")


REGISTRY["x32_corpus_shuffle"].sql = _x32_sql()


def _x42_sql() -> str:
    from ..llm.dedup import _h32_sql

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
    from ..llm.dedup import _h32
    from ..llm.text import quality_score
    from ..operators.sequence import with_global_sequence

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
    from ..llm.dedup import connected_components, minhash_lsh_pairs
    from ..operators.sampling import hash_bucket

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
    from ..operators.aggregate import salted_agg

    l = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        l, ["l_suppkey"], {"l_quantity": "sum", "l_orderkey": "count"}
    )
    return out.select(
        "l_suppkey",
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        F.col("count_l_orderkey").alias("n_items"),
    )


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
    from ..llm.text import token_count

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
    from ..llm.caps import discrete_quantiles
    from ..llm.text import token_count

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
    from ..llm.dedup import _hexint

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
    from ..llm.dedup import _hexint_sql

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
    from ..llm.dedup import minhash_band_buckets, neardup_against_index

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
    from ..llm.dedup import minhash_band_buckets, neardup_against_index

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
    from ..operators.sequence import with_global_sequence

    from ..llm.text import token_count

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
    from ..llm.dedup import _h32_sql

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
    from ..llm.dedup import _h32
    from ..llm.text import quality_score, token_count
    from ..operators.sequence import with_global_sequence

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
    from ..llm import quality_score, token_count

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
    from ..llm.datacard import (
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
    from ..operators.joins import salted_join

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
    from ..plans import apply_cdc

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
