"""Business/experimentation x-series, round 11: association rules,
CUPED variance reduction, sweep-line concurrency.

New module (xana.py sits at its 3,700-line cap); same registration
contract as every family module.
"""

from ._shared import *  # noqa: F401,F403 — F, Window, helpers, register
from ._shared import _t, REGISTRY, register  # noqa: F401


_X87_MIN_SUPPORT = 5  # baskets a pair must co-occur in
_X87_TOPK = 10

_X87_SQL = f"""
WITH items AS (
  SELECT DISTINCT o_custkey AS buyer, l_partkey AS item
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
nb AS (SELECT count(DISTINCT buyer) AS n_baskets FROM items),
freq AS (SELECT item, count(*) AS n_item FROM items GROUP BY 1),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
  FROM items a JOIN items b
    ON a.buyer = b.buyer AND a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= {_X87_MIN_SUPPORT}
),
scored AS (
  SELECT p.item_a, p.item_b, p.n_ab,
         fa.n_item AS n_a, fb.n_item AS n_b,
         p.n_ab * nb.n_baskets * 1e0 / (fa.n_item * fb.n_item) AS lift,
         p.n_ab * 1e0 / fa.n_item AS confidence
  FROM pairs p
  JOIN freq fa ON fa.item = p.item_a
  JOIN freq fb ON fb.item = p.item_b, nb
)
SELECT item_a, item_b,
       cast(n_ab AS BIGINT) AS n_ab,
       cast(n_a AS BIGINT) AS n_a,
       cast(n_b AS BIGINT) AS n_b,
       round(lift, 4) AS lift,
       round(confidence, 4) AS confidence
FROM scored
ORDER BY lift DESC, item_a, item_b
LIMIT {_X87_TOPK}
"""


@register("x87_basket_lift", _X87_SQL, first_round=11)
def x87_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over buyer baskets: the top-10 part
    pairs by LIFT (P(AB)/(P(A)P(B))) with support >= 5 baskets, plus
    confidence — the classic market-basket readout behind "customers
    who bought X also bought Y". x68 ranks per-item neighbors by
    Jaccard; this is the corpus-level rule list with the support floor
    that separates signal from the support-1 noise pairs (112k of the
    ~116k raw pairs here).

    Plan shape: the pair build is buyer-keyed (fan-out bounded by
    basket size, corpus-independent per key — x68's economics), the
    HAVING prunes support-1 pairs inside the same aggregation, item
    frequencies and the basket count broadcast onto the surviving
    pairs, and the final top-10 is one TakeOrderedAndProject (lift
    is a single exact-integer ratio evaluated identically in both
    engines; ties broken by the pair key). No windows, no global
    sort."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    items = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("buyer"),
            F.col("l_partkey").alias("item"),
        )
        .distinct()
        # reused 4x (basket count + item frequencies + both pair
        # legs): un-pinned, the fact join ran FIVE times — the x67/x68
        # lesson, caught by the r12 scan audit
        .localCheckpoint(eager=True)
    )
    nb = items.agg(F.countDistinct("buyer").alias("n_baskets"))
    freq = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    # r16 negative A/B (do not re-try): building pairs by
    # collect_list(sorted basket) + array-comprehension explode —
    # "one exchange instead of join machinery" — measured 3.70 ->
    # 8.82 s isolated median-of-5 at sf0.1 (parity green, reverted).
    # The basket agg is an ObjectHashAggregate (no codegen) and the
    # per-row array materialization costs more than the SMJ probe the
    # join form pays; the self-join's both arms read ONE reused
    # exchange of the pinned items table. Same conclusion assumed for
    # x67/x68's identical pair shape.
    a = items.select("buyer", F.col("item").alias("item_a"))
    b = items.select("buyer", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "buyer")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _X87_MIN_SUPPORT)
    )
    fa = freq.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    fb = freq.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    scored = (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a", "item_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("n_ab") * F.col("n_baskets")
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
            F.round(F.col("n_ab") / F.col("n_a"), 4).alias("confidence"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "item_a", "item_b"
    ).limit(_X87_TOPK)


_X88_SPLIT_TS = "2024-01-16"  # pre-period: Jan 1-15; post: Jan 16+

_X88_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         md5(cast(user_id AS VARCHAR)) < '8' AS is_a,
         cast(sum(CASE WHEN ts < TIMESTAMP '{_X88_SPLIT_TS}'
                  THEN cast(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x_pre,
         cast(sum(CASE WHEN ts >= TIMESTAMP '{_X88_SPLIT_TS}'
                  THEN cast(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y_post
  FROM events GROUP BY 1
),
pooled AS (
  SELECT covar_samp(x_pre, y_post) / var_samp(x_pre) AS theta,
         avg(x_pre) AS mx
  FROM per_user
)
SELECT CASE WHEN is_a THEN 'A' ELSE 'B' END AS variant,
       cast(count(*) AS BIGINT) AS n_users,
       round(avg(y_post), 2) AS mean_y_cents,
       round(avg(y_post - theta * (x_pre - mx)), 2) AS adj_mean_cents,
       round(any_value(theta), 6) + 0e0 AS theta,
       round(1e0 - var_samp(y_post - theta * x_pre) / var_samp(y_post), 4)
         + 0e0 AS var_reduction
FROM per_user, pooled
GROUP BY 1
"""


@register("x88_cuped_adjustment", _X88_SQL, first_round=11)
def x88_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B readout (Deng et al. 2013,
    the standard experimentation trick): per user, the PRE-period
    spend (Jan 1-15, exact cents) is the covariate X and the
    post-period spend is the metric Y; theta = cov(X,Y)/var(X) pooled,
    and each arm reports both the raw mean and the CUPED-adjusted mean
    avg(Y - theta*(X - mean(X))) plus the achieved variance reduction
    1 - var(Y-thetaX)/var(Y). Same md5 hash-split arms as x71 — this
    is the readout that makes small effects detectable without more
    traffic.

    Plan shape: ONE user-keyed agg builds exact-integer (X, Y) pairs
    map-side (period membership is a map-side CASE); the pooled
    moments are a single-row broadcast; the arm readout is a 2-row
    agg. Only the final moments are floating point, computed over the
    user-level matrix in both engines and display-rounded."""
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    split = F.lit(_X88_SPLIT_TS).cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0))
        .cast("bigint")
        .alias("x_pre"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(0))
        .cast("bigint")
        .alias("y_post"),
    ).withColumn(
        "variant",
        F.when(F.md5(F.col("user_id").cast("string")) < "8", "A").otherwise(
            "B"
        ),
    )
    pooled = per_user.agg(
        (F.covar_samp("x_pre", "y_post") / F.var_samp("x_pre")).alias(
            "theta"
        ),
        F.avg("x_pre").alias("mx"),
    )
    j = per_user.crossJoin(F.broadcast(pooled))
    return (
        j.groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.avg("y_post"), 2).alias("mean_y_cents"),
            F.round(
                F.avg(
                    F.col("y_post")
                    - F.col("theta") * (F.col("x_pre") - F.col("mx"))
                ),
                2,
            ).alias("adj_mean_cents"),
            # + 0.0 canonicalizes IEEE -0.0 (a near-zero reduction can
            # round to -0 in one engine and +0 in the other)
            (F.round(F.any_value("theta"), 6) + F.lit(0.0)).alias("theta"),
            (
                F.round(
                    F.lit(1.0)
                    - F.var_samp(
                        F.col("y_post") - F.col("theta") * F.col("x_pre")
                    )
                    / F.var_samp("y_post"),
                    4,
                )
                + F.lit(0.0)
            ).alias("var_reduction"),
        )
    )


_X89_GAP_MIN = 30  # session break after 30 idle minutes (x15's gap)

_X89_SQL = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts)
                   - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts))
                   > {_X89_GAP_MIN} * 60 * 1000000
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id, min(ts) AS s_start, max(ts) AS s_end
  FROM (
    SELECT user_id, ts,
           sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
  ) GROUP BY user_id, sid
),
deltas AS (
  SELECT epoch_us(s_start) AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT epoch_us(s_end) + 1000000 AS t, -1 AS delta FROM sess
),
swept AS (
  SELECT t, delta,
         sum(delta) OVER (ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS concurrent
  FROM deltas
)
SELECT cast(make_timestamp(t // 86400000000 * 86400000000) AS TIMESTAMP)
         AS day,
       cast(max(concurrent) AS BIGINT) AS peak_concurrent
FROM swept GROUP BY 1
"""


@register("x89_peak_concurrency", _X89_SQL, first_round=11)
def x89_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning sweep
    line: sessionize (x15's 30-minute gap), emit +1 at each session
    start and -1 one second after its end, and the daily MAX of the
    running total is the peak concurrency. The running total is a
    GLOBAL cumulative sum — exactly the operator the bucketed
    prefix-sum engine (operators/sequence.py, x76/x82's engine) exists
    for: equi-depth buckets on the timestamp, O(buckets) driver-folded
    offsets, per-bucket windows — so the sweep is fully parallel where
    a naive ORDER BY window would funnel every session edge through
    one partition.

    Plan shape: user-keyed lag + cumulative windows for
    sessionization, a session-level union of +/-1 edges (2 rows per
    session), the bucketed global prefix sum over (t, delta), then a
    day-keyed max. Integer deltas make the prefix sum exact; the
    (t, delta) ordering processes session ends before starts at the
    same microsecond in both engines."""
    from ..operators.sequence import with_global_prefix_sum

    e = _t(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts")
    # TZ-independent epoch micros: unix_micros rejects TIMESTAMP_NTZ
    em = lambda c: F.expr(  # noqa: E731
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {c})"
    )
    marked = e.select(
        "user_id", "ts",
        F.when(
            F.lag("ts").over(wl).isNull()
            | (
                em("ts") - F.lag(em("ts")).over(wl)
                > _X89_GAP_MIN * 60 * 1000000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = (
        marked.withColumn(
            "sid",
            F.sum("is_start").over(
                wl.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    deltas = (
        sess.select(em("s_start").alias("t"), F.lit(1).alias("delta"))
        .unionAll(
            sess.select(
                (em("s_end") + 1000000).alias("t"),
                F.lit(-1).alias("delta"),
            )
        )
        # The prefix-sum engine consumes its input THREE times
        # (quantile sketch, per-bucket subtotals, the final windowed
        # pass); every other expensive-upstream engine caller pins its
        # input first (tx10's scored, x43's base/keyed, x76's rev) and
        # x89 was the one that didn't: the un-pinned form re-ran the
        # 2-window sessionization per pass and measured 286 s cold on
        # the 100x corpus vs ~30 s pinned (SCALE.md "x89 at 100x").
        # The frame is 2 small columns per session edge.
        .localCheckpoint(eager=True)
    )
    swept = with_global_prefix_sum(
        deltas, "delta", ["t", "delta"], name="concurrent"
    )
    day_us = 86400 * 1000000
    return (
        swept.groupBy(
            F.timestamp_micros(
                (F.col("t") / day_us).cast("bigint") * day_us
            ).alias("day")
        )
        .agg(F.max("concurrent").cast("bigint").alias("peak_concurrent"))
    )


_X90_SIGMA = 2.0  # anomaly fence in residual standard deviations

_X90_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
resid AS (
  SELECT event_type, day, n,
         avg(n) OVER (PARTITION BY event_type, dayofweek(day)) AS expected,
         n - avg(n) OVER (PARTITION BY event_type, dayofweek(day))
           AS resid
  FROM daily
),
fenced AS (
  SELECT event_type, day, n, expected, resid,
         stddev_samp(resid) OVER (PARTITION BY event_type) AS sigma
  FROM resid
)
SELECT event_type, cast(day AS TIMESTAMP) AS day,
       cast(n AS BIGINT) AS n,
       round(expected, 2) AS expected,
       round(resid, 2) AS resid,
       cast(CASE WHEN abs(resid) > {_X90_SIGMA} * sigma
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM fenced
"""


@register("x90_seasonal_anomaly", _X90_SQL, first_round=11)
def x90_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly flags on the daily event matrix —
    the monitor that composes x77's day-of-week profile with a
    residual z-fence: expected = the type's mean count for that
    weekday, residual = actual - expected, anomaly = |residual| >
    2 * sigma(residuals) per type. Deseasonalizing first is what keeps
    a quiet Sunday from alarming and a quiet Tuesday from hiding (raw
    z-scores against the overall mean do both).

    Plan shape: the corpus-sized stage is the daily count agg; the
    profile and fence are two keyed windows over the (types x days)
    matrix — (type, dow)-keyed then type-keyed, matrix-sized forever.
    Counts are exact integers; only the display columns round."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("event_type", F.dayofweek("day"))
    resid = daily.select(
        "event_type", "day", "n",
        F.avg("n").over(wp).alias("expected"),
        (F.col("n") - F.avg("n").over(wp)).alias("resid"),
    )
    wt = Window.partitionBy("event_type")
    return resid.select(
        "event_type", "day",
        F.col("n").cast("bigint").alias("n"),
        F.round("expected", 2).alias("expected"),
        F.round("resid", 2).alias("resid"),
        F.when(
            F.abs("resid") > _X90_SIGMA * F.stddev_samp("resid").over(wt),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("is_anomaly"),
    )


_X91_SQL = """
WITH pts AS (
  SELECT DISTINCT cast(round(p_retailprice * 100) AS BIGINT)
           AS price_cents,
         cast(p_size AS BIGINT) AS size
  FROM part
),
ranked AS (
  SELECT price_cents, size,
         min(-size) OVER (ORDER BY price_cents, -size
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prefix_min
  FROM pts
),
frontier AS (
  SELECT price_cents, size FROM ranked
  WHERE prefix_min IS NULL OR prefix_min > -size
)
SELECT p.p_partkey, f.size AS p_size, f.price_cents
FROM frontier f
JOIN (SELECT p_partkey,
             cast(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             cast(p_size AS BIGINT) AS size
      FROM part) p
  ON p.price_cents = f.price_cents AND p.size = f.size
"""


@register("x91_pareto_frontier", _X91_SQL, first_round=11)
def x91_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier / skyline query (Börzsönyi et al. 2001): the
    parts not dominated on (minimize price, maximize size) — "no
    cheaper part is at least as large". The classic multi-objective
    shortlist operator, done WITHOUT the O(n²) dominance self-join:
    for two objectives the skyline is a running-min test — order
    distinct (price, -size) pairs by (price asc, -size asc); a point
    is dominated iff the exclusive prefix min of -size is <= its own
    (some predecessor is no worse on both axes and, being a distinct
    pair, strictly better on one).

    Plan shape: the exclusive prefix min rides the bucketed
    prefix-MIN engine (operators/sequence.py::with_global_prefix_min
    — min is an idempotent monoid, so the same equi-depth-bucket
    decomposition as the sequence/prefix-sum engines, no
    single-partition window); the frontier pairs then join back to
    the catalog broadcast. Prices compare in exact integer cents."""
    from ..operators.sequence import with_global_prefix_min

    p = _t(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("bigint")
    pts = p.select(
        cents.alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    ).distinct().withColumn("negsize", -F.col("size"))
    ranked = with_global_prefix_min(
        pts,
        "negsize",
        ["price_cents", "negsize"],
        name="prefix_min",
        inclusive=False,
    )
    frontier = ranked.filter(
        F.col("prefix_min").isNull()
        | (F.col("prefix_min") > F.col("negsize"))
    ).select("price_cents", "size")
    parts = p.select(
        "p_partkey",
        cents.alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    return parts.join(
        F.broadcast(frontier), ["price_cents", "size"]
    ).select("p_partkey", F.col("size").alias("p_size"), "price_cents")


_X92_TOPK = 10

_X92_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts)
                   - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))
                   > 30 * 60 * 1000000
                OR lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY 1, 2
)
SELECT path, cast(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {_X92_TOPK}
"""


@register("x92_top_paths", _X92_SQL, first_round=11)
def x92_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the 10 most frequent complete within-session
    event-type paths (x15's 30-minute sessionization, events ordered
    by (ts, event_id)) — the product-analytics view x62's Markov
    matrix marginalizes away: pairs tell you the step probabilities,
    paths tell you which WHOLE journeys actually recur.

    Plan shape: user-keyed lag + cumulative windows sessionize, one
    (user, session)-keyed agg collects each session's ordered type
    array (array_sort on a (ts, event_id, type) struct — session-
    bounded, never corpus-sized), a path-keyed count, and a
    TakeOrderedAndProject top-10. No global sorts; path strings are
    exact, so ordering ties break identically in both engines."""
    e = _t(spark, sf_dir, "events")
    em = lambda c: F.expr(  # noqa: E731
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {c})"
    )
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            F.lag("ts").over(wl).isNull()
            | (
                em("ts") - F.lag(em("ts")).over(wl)
                > 30 * 60 * 1000000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("is_start").over(
            wl.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    paths = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_X92_TOPK)
    )


_X93_Z = 1.96  # 95% Wilson interval

_X93_SQL = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         count(*) AS n,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
  FROM events GROUP BY 1
),
g AS (
  SELECT sum(errs) * 1e0 / sum(n) AS p0 FROM daily
),
wilson AS (
  SELECT day, n, errs,
         errs * 1e0 / n AS p,
         (errs * 1e0 / n + {_X93_Z} * {_X93_Z} / (2e0 * n))
           / (1e0 + {_X93_Z} * {_X93_Z} / n) AS center,
         ({_X93_Z} / (1e0 + {_X93_Z} * {_X93_Z} / n))
           * sqrt((errs * 1e0 / n) * (1e0 - errs * 1e0 / n) / n
                  + {_X93_Z} * {_X93_Z} / (4e0 * n * n)) AS hw
  FROM daily
)
SELECT cast(day AS TIMESTAMP) AS day,
       cast(n AS BIGINT) AS n,
       cast(errs AS BIGINT) AS n_errors,
       round(p, 6) AS rate,
       round(center - hw, 6) AS wilson_lo,
       round(center + hw, 6) AS wilson_hi,
       cast(CASE WHEN g.p0 < center - hw OR g.p0 > center + hw
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomalous
FROM wilson, g
"""


@register("x93_error_rate_monitor", _X93_SQL, first_round=11)
def x93_error_rate_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error-rate monitor with Wilson 95% intervals — the
    ratio-metric alarm done right: a day is anomalous when the
    CORPUS-WIDE error rate falls outside that day's Wilson score
    interval, so low-traffic days get wide intervals (no false alarms
    on 3-of-40 blips) and high-traffic days get tight ones (a 0.3%
    drift on a million events still fires). Plain threshold-on-rate
    monitors get exactly this wrong; x90 fences COUNTS, this fences a
    RATIO with its binomial uncertainty.

    Plan shape: one corpus-sized (type, day) agg folded to per-day
    totals (exact integer numerators), a single-row global-rate
    broadcast, map-side Wilson arithmetic — identical expression trees
    in both engines, so even the unrounded interval comparison agrees.
    The algebra (operators/aggregate.py::wilson_error_rate_over_daily)
    is shared verbatim with the streaming serve
    (error_rate_from_state_dir), which re-derives this exact report
    from the SAME persisted daily-count matrix the CUSUM and EWMA
    twins maintain — one state log, three monitors."""
    from ..operators.aggregate import (
        daily_counts,
        wilson_error_rate_over_daily,
    )

    e = _t(spark, sf_dir, "events")
    return wilson_error_rate_over_daily(daily_counts(e), "error", _X93_Z)


from ._helpers import _DUCK_QUALITY, _DUCK_TOKS  # noqa: E402


_X94_SQL = f"""
WITH per AS (
  SELECT source,
         len({_DUCK_TOKS}) AS toks,
         {_DUCK_QUALITY} AS q
  FROM documents
),
s AS (
  SELECT source, count(*) AS n_docs, sum(toks) AS toks, sum(q) AS qsum
  FROM per GROUP BY 1
),
g AS (SELECT sum(n_docs) AS gn, sum(toks) AS gtoks, sum(qsum) AS gq FROM s)
SELECT s.source,
       cast(s.n_docs AS BIGINT) AS n_docs,
       cast(s.toks AS BIGINT) AS tokens,
       round(s.toks * 1.0 / g.gtoks, 6) AS token_share,
       round((g.gq - s.qsum) / (g.gn - s.n_docs), 6) AS loo_mean_quality,
       round((g.gq - s.qsum) / (g.gn - s.n_docs) - g.gq / g.gn, 6)
         AS quality_delta
FROM s CROSS JOIN g
"""


@register("x94_loo_source_ablation", _X94_SQL, first_round=13)
def x94_loo_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out corpus ablation — the first question a
    data-mixing experiment asks ("what does the corpus look like
    WITHOUT this source?") answered for every source at once, without
    N corpus passes: per source, its token share and the corpus mean
    quality with that source REMOVED, plus the delta vs the global
    mean (negative = the source was pulling quality up). The LOO
    aggregate is complement arithmetic — (global sum - source sum) /
    (global n - source n) — which is the scale lesson: the naive form
    is N self-joins each excluding one source (N corpus passes); the
    complement form is ONE corpus pass, one |sources|-row aggregate,
    and a 1-row broadcast join.

    Plan shape: one scan-fused projection (token count + tx2 quality,
    no explode), one groupBy(source), a 1-row global agg crossJoined
    back by broadcast. Everything after the first agg is
    |sources|-sized."""
    from ..llm import quality_score
    from ..llm.text import token_count

    per = _t(spark, sf_dir, "documents").select(
        "source",
        token_count("text").alias("toks"),
        quality_score(F.col("text")).alias("q"),
    )
    # pin the |sources|-row aggregate: the global agg and the final
    # join both consume it, and without the pin each branch re-derives
    # the corpus pass (4 parquet scans in the unpinned plan, 1 with —
    # test_x94_single_corpus_scan pins the shape)
    s = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("toks"),
        F.sum("q").alias("qsum"),
    ).localCheckpoint(eager=True)
    g = s.agg(
        F.sum("n_docs").alias("gn"),
        F.sum("toks").alias("gtoks"),
        F.sum("qsum").alias("gq"),
    )
    loo = (F.col("gq") - F.col("qsum")) / (F.col("gn") - F.col("n_docs"))
    return s.crossJoin(F.broadcast(g)).select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("toks").cast("bigint").alias("tokens"),
        F.round(F.col("toks") / F.col("gtoks"), 6).alias("token_share"),
        F.round(loo, 6).alias("loo_mean_quality"),
        F.round(loo - F.col("gq") / F.col("gn"), 6).alias("quality_delta"),
    )
