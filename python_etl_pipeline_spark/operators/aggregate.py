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


def daily_counts(
    df: DataFrame, key_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """(key, day, n) daily volume matrix — map-side-combinable count,
    the sum-monoid state the streaming CUSUM twin persists per batch."""
    return df.groupBy(
        F.col(key_col).alias("k"),
        F.date_trunc("day", F.col(ts_col)).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))


def cusum_over_daily(
    daily: DataFrame,
    allowance: float = 0.5,
    alarm: float = 4.0,
) -> DataFrame:
    """One-sided CUSUM over a (k, day, n) daily matrix — the shared
    algebra behind x64 and its streaming twin. The sequential
    recursion S_t = max(0, S_{t-1} + (x_t - (mu + allowance*sd))) is
    rewritten as S_t = ps_t - min(0, running_min(ps)) over the plain
    prefix sum: two ordered key-partitioned windows instead of a
    sequential loop. Emits (k, day, n, cusum, changepoint) with the
    alarm at ``alarm``*sd."""
    from pyspark.sql import Window

    wt = Window.partitionBy("k")
    st = daily.select(
        "k", "day", "n",
        F.avg("n").over(wt).alias("mu"),
        F.stddev_pop("n").over(wt).alias("sd"),
    )
    wo = Window.partitionBy("k").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ps = st.select(
        "k", "day", "n", "sd",
        F.sum(F.col("n") - (F.col("mu") + allowance * F.col("sd")))
        .over(wo)
        .alias("s"),
    )
    cu = ps.select(
        "k", "day", "n", "sd",
        (F.col("s") - F.least(F.lit(0.0), F.min("s").over(wo))).alias(
            "cusum"
        ),
    )
    return cu.select(
        "k", "day",
        F.col("n").cast("bigint").alias("n"),
        F.round("cusum", 4).alias("cusum"),
        F.when(F.col("cusum") > alarm * F.col("sd"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("changepoint"),
    )


def user_days(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """DISTINCT (user_id, day) activity table — the union-monoid state
    behind rolling active-user metrics (x75 and its streaming twin)."""
    return df.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("day", F.col(ts_col)).alias("day"),
    ).distinct()


def rolling_active_users(ud: DataFrame, window_days: int = 7) -> DataFrame:
    """(day, dau, wau, stickiness) from a distinct (user_id, day)
    table. Sliding COUNT DISTINCT does not compose over window frames,
    so the scale-correct rewrite is the span explode: each user-day
    contributes membership to the ``window_days`` window-ending days,
    then distinct + count per day recovers the exact rolling distinct.
    Shared by x75 and the streaming DAU/WAU state reader."""
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spans = (
        ud.select(
            "user_id",
            F.explode(
                F.array(*[F.lit(k) for k in range(window_days)])
            ).alias("k"),
            "day",
        )
        .select(
            "user_id",
            F.col("day") + F.make_dt_interval(days=F.col("k")),
        )
        .toDF("user_id", "wday")
        .distinct()
    )
    wau = spans.groupBy(F.col("wday").alias("day")).agg(
        F.count(F.lit(1)).alias("wau")
    )
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        F.round(F.col("dau") / F.col("wau"), 4).alias("stickiness"),
    )


RFM_QS = (0.2, 0.4, 0.6, 0.8)


def rfm_partials(df: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts") -> DataFrame:
    """Per-user RFM state: (user, last_ts, freq, mon_cents) — a
    (max, sum, sum) monoid, so per-batch partials fold exactly into
    the full-history values (the streaming twin's state rows)."""
    pur = F.col("event_type") == "purchase"
    # cents are rounded PER EVENT, then summed as exact integers — a
    # true monoid (round-of-batch-sums is NOT: sum-of-rounds drifts
    # when a batch boundary splits sub-cent residue), and immune to
    # float summation order across engines and batchings.
    cents = F.round(F.col("value") * 100).cast("bigint")
    return df.groupBy(user_col).agg(
        F.max(ts_col).alias("last_ts"),
        F.count(F.when(pur, 1)).alias("freq"),
        F.coalesce(F.sum(F.when(pur, cents)), F.lit(0))
        .cast("bigint").alias("mon_cents"),
    )


def rfm_fold(partials: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Merge RFM partials (max, sum, sum) — batch-state fold."""
    return partials.groupBy(user_col).agg(
        F.max("last_ts").alias("last_ts"),
        F.sum("freq").alias("freq"),
        F.sum("mon_cents").alias("mon_cents"),
    )


def rfm_scores(state: DataFrame, ref: str,
               user_col: str = "user_id") -> DataFrame:
    """Quintile-score folded RFM state against the population's
    20/40/60/80th percentiles — boundary broadcast, never ntile()
    (single-partition funnel at scale). Shared verbatim between the
    x80 batch query and the streaming serve path."""
    m = state.select(
        user_col,
        F.datediff(F.lit(ref).cast("timestamp"), F.col("last_ts"))
        .cast("bigint").alias("r_days"),
        F.col("freq").cast("bigint").alias("freq"),
        F.col("mon_cents").cast("bigint").alias("mon_cents"),
    )
    b = m.agg(
        *[
            F.percentile(F.col(c), F.lit(q)).alias(f"{c[0]}q{i}")
            for c in ("r_days", "freq", "mon_cents")
            for i, q in enumerate(RFM_QS)
        ]
    )

    def score(col: str, pfx: str, invert: bool):
        n = sum(
            F.when(F.col(col) > F.col(f"{pfx}q{i}"), 1).otherwise(0)
            for i in range(len(RFM_QS))
        )
        return (5 - n if invert else 1 + n).cast("bigint")

    return m.crossJoin(F.broadcast(b)).select(
        user_col, "r_days", "freq", "mon_cents",
        score("r_days", "r", True).alias("r_score"),
        score("freq", "f", False).alias("f_score"),
        score("mon_cents", "m", False).alias("m_score"),
    )


def ewma_horizon(alpha: float) -> int:
    """Day-index block length for the block-rebased EWMA: the
    smoother's own <1-ulp memory horizon, ceil(54*ln2 / -ln(1-alpha)),
    floored at 64. A term L or more days older than the current row
    carries weight (1-alpha)^L <= 2^-54 relative to the row's own unit
    weight — below one ulp of the running ratio.

    alpha must lie strictly in (0, 1): at alpha=1 the horizon formula
    divides by -log(0) and the block weights (1-alpha)^k collapse to
    0^k, so the rebase algebra itself is undefined there (r11 advice —
    the old per-key rebase happened to tolerate alpha=1 via pow(0, n);
    the block form does not, so the domain is validated loudly)."""
    import math

    if not 0.0 < alpha < 1.0:
        raise ValueError(
            f"ewma alpha must be strictly between 0 and 1, got {alpha!r}"
            " (alpha=1 means 'last observation wins' — use a plain"
            " last-value window, not an EWMA)"
        )
    return max(64, math.ceil(54 * math.log(2) / -math.log(1.0 - alpha)))


def ewma_over_daily(
    daily: DataFrame,
    key_col: str = "event_type",
    alpha: float = 0.3,
) -> DataFrame:
    """Bias-corrected EWMA over a (key, day, n) daily matrix — x81's
    algebra, shared with the streaming serve path (the daily matrix is
    a SUM monoid, so the smoother recomputes exactly from folded
    per-batch count states, same pattern as cusum_over_daily).

    Numeric design (round-10 advice fix): weights are rebased per
    BLOCK of L = ewma_horizon(alpha) day-indices, not per key. The
    old per-key rebase (1-alpha)^(imax-i) underflowed to exactly 0
    once imax-i passed ~2085 days at alpha=0.3, so the EARLY rows of
    a >5.7-year series got 0/0 = NaN. Block rebasing bounds every
    exponent by 2L-1: within a block the weight is
    (1-alpha)^(L-1 - i%L) (in [2^-54, 1] — never 0), and history
    enters as the previous block's rebased totals scaled by
    (1-alpha)^(i%L + 1). Blocks two or more back carry weight
    <= (1-alpha)^L <= 2^-54 relative to the row's own unit weight —
    dropping them is below one ulp of the output ratio — so a single
    exact one-block-back carry makes the smoother NaN-free and
    overflow-free for series of ANY length. The batch oracle mirrors
    this formula term-for-term, so cross-engine parity is exact."""
    from pyspark.sql import Window

    r = 1.0 - alpha
    L = ewma_horizon(alpha)

    wp = Window.partitionBy(key_col)
    idx = daily.select(
        key_col, "day", "n",
        F.datediff("day", F.min("day").over(wp)).alias("i"),
    )
    w = idx.select(
        key_col, "day", "n",
        F.floor(F.col("i") / L).cast("bigint").alias("b"),
        (F.col("i") % L).alias("l"),
        F.pow(F.lit(r), F.lit(L - 1) - F.col("i") % L).alias("wt"),
    )
    wc = (
        Window.partitionBy(key_col, "b")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = w.select(
        key_col, "day", "n", "b", "l", "wt",
        F.sum(F.col("n") * F.col("wt")).over(wc).alias("qx"),
        F.sum("wt").over(wc).alias("qn"),
    )
    # Previous block's rebased totals — block-granularity (tiny), so
    # the join broadcasts; an empty predecessor block means every
    # surviving carry term is already < 2^-54 relative and drops.
    bt = (
        w.groupBy(key_col, "b")
        .agg(
            F.sum(F.col("n") * F.col("wt")).alias("sx"),
            F.sum("wt").alias("sn"),
        )
        .select(key_col, (F.col("b") + 1).alias("b"), "sx", "sn")
    )
    j = c.join(F.broadcast(bt), [key_col, "b"], "left")
    carry = F.pow(F.lit(r), F.col("l") + 1)
    xw = F.col("qx") / F.col("wt") + F.coalesce(
        F.col("sx"), F.lit(0.0)
    ) * carry
    nw = F.col("qn") / F.col("wt") + F.coalesce(
        F.col("sn"), F.lit(0.0)
    ) * carry
    return j.select(
        key_col, "day",
        F.col("n").cast("bigint").alias("n"),
        F.round(xw / nw, 4).alias("ewma"),
    )


WILSON_Z = 1.96  # 95% interval


def wilson_error_rate_over_daily(
    daily: DataFrame,
    error_key: str = "error",
    z: float = WILSON_Z,
) -> DataFrame:
    """x93's algebra over a (k, day, n) daily matrix — shared with the
    streaming serve path: the matrix is the SAME sum-monoid state the
    CUSUM/EWMA twins persist (one state log, three monitors), so the
    Wilson-fenced error-rate report recomputes exactly from folded
    per-batch counts. A day's rate is anomalous when the corpus-wide
    rate falls outside that day's Wilson score interval."""
    by_day = daily.groupBy("day").agg(
        F.sum("n").alias("n"),
        F.sum(
            F.when(F.col("k") == error_key, F.col("n")).otherwise(0)
        ).alias("errs"),
    )
    g = by_day.agg(
        (F.sum("errs") * F.lit(1.0) / F.sum("n")).alias("p0")
    )
    p = F.col("errs") * F.lit(1.0) / F.col("n")
    center = (p + F.lit(z * z) / (F.lit(2.0) * F.col("n"))) / (
        F.lit(1.0) + F.lit(z * z) / F.col("n")
    )
    hw = (
        F.lit(z) / (F.lit(1.0) + F.lit(z * z) / F.col("n"))
    ) * F.sqrt(
        p * (F.lit(1.0) - p) / F.col("n")
        + F.lit(z * z) / (F.lit(4.0) * F.col("n") * F.col("n"))
    )
    return by_day.crossJoin(F.broadcast(g)).select(
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.col("errs").cast("bigint").alias("n_errors"),
        F.round(p, 6).alias("rate"),
        F.round(center - hw, 6).alias("wilson_lo"),
        F.round(center + hw, 6).alias("wilson_hi"),
        F.when(
            (F.col("p0") < center - hw) | (F.col("p0") > center + hw), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("is_anomalous"),
    )
