"""Sketch family (hh1-hh6): Count-Min, HLL, linear counting, log-bin quantiles, KMV.

Mechanically split from the former flat queries.py (r10);
docstrings and within-family registration order unchanged.
"""

from ._shared import *  # noqa: F401,F403 — F, Window, scalar/op helpers, register
from ._shared import _t, AS_OF, REGISTRY, register  # noqa: F401
from ._shared import (  # noqa: F401
    _HH4_M,
    _HH4_NUM,
    _HH4_W,
)
from ._helpers import (  # noqa: F401
    _DUCK_TOKS,
)

_HH1_W = 1024  # count-min width (buckets per hash row)


_HH1_D = 4     # count-min depth (independent hash rows)


def _hh1_sql() -> str:
    from ..operators.sampling import hash_bucket_sql

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
    from ..llm import tokens
    from ..llm.sketch import countmin_build, countmin_estimate

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
    from ..llm import tokens
    from ..llm.sketch import countmin_build, countmin_estimate
    from ..plans import merge_agg_state

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


_HH3_M = 16384  # linear-counting bitmap width


def _hh3_sql() -> str:
    from ..operators.sampling import hash_bucket_sql

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
    from ..llm import tokens
    from ..operators.sampling import hash_bucket

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


def _hh4_sql() -> str:
    from ..llm.dedup import _hexint_sql

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
    from ..llm.sketch import hll_estimate, hll_registers
    from ..llm.text import tokens

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


def _hh6_sql() -> str:
    from ..llm.dedup import _hexint_sql

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
    from ..llm.sketch import kmv_bottomk, kmv_estimate, kmv_hash

    e = _t(spark, sf_dir, "events")
    uh = (
        e.select(
            F.col("event_type").alias("t"), F.col("user_id").alias("u")
        )
        .distinct()
        # five consumers (sketch build, exact counts, the type list,
        # both exact-intersection self-join legs) each re-ran the
        # event scan + distinct — the only data-sized stage in the
        # query (r15, guide §2.4)
        .localCheckpoint(eager=True)
    )
    h = uh.select("t", kmv_hash(F.col("u")).alias("hv"))
    # 64 rows per type, two consumers (per-type estimate + the
    # pair-union sketch merge) — persisted-sketch state class
    sk_t = kmv_bottomk(h, ["t"]).localCheckpoint(eager=True)
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
    from ..llm.sketch import logbin_histogram, logbin_quantiles

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


_HH7_M = 256  # bloom bits
_HH7_K = 4  # hash functions
_HH7_PROBES = ["hash", "join", "stream", "quantum", "zebra", "flink"]


def _hh7_sql() -> str:
    from ..llm.dedup import _hexint_sql

    # positions: first 4 md5 hex chars of 'bf<j>|' || token, mod 256
    def p(tok_expr: str, j: int) -> str:
        md5 = f"md5('bf{j}|' || {tok_expr})"
        return f"(({_hexint_sql(md5, 4)}) % {_HH7_M})"

    probes = ", ".join(f"('{t}')" for t in _HH7_PROBES)
    pos_cols = ", ".join(p("tok", j) + f" AS p{j}" for j in range(_HH7_K))
    probe_pos = ", ".join(p("probe", j) + f" AS q{j}" for j in range(_HH7_K))
    hit = " AND ".join(f"list_contains(bits, q{j})" for j in range(_HH7_K))
    return f"""
WITH toks AS (
  SELECT source, tok FROM (
    SELECT DISTINCT source,
           unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents
  ) WHERE tok != ''
),
pos AS (SELECT source, tok, {pos_cols} FROM toks),
occupied AS (
  SELECT DISTINCT source, pos FROM (
    {" UNION ALL ".join(f"SELECT source, p{j} AS pos FROM pos" for j in range(_HH7_K))}
  )
),
bits AS (SELECT source, list(DISTINCT pos) AS bits FROM occupied GROUP BY 1),
probes(probe) AS (VALUES {probes}),
grid AS (
  SELECT b.source, pr.probe, b.bits, {probe_pos}
  FROM bits b CROSS JOIN probes pr
)
SELECT g.source, g.probe,
       cast(CASE WHEN t.tok IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS member,
       cast(CASE WHEN {hit} THEN 1 ELSE 0 END AS BIGINT) AS bloom_hit
FROM grid g
LEFT JOIN (SELECT DISTINCT source, tok FROM toks) t
       ON t.source = g.source AND t.tok = g.probe
"""


@register("hh7_bloom_membership", None, first_round=10)
def hh7_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership as data: a 256-bit / 4-hash Bloom
    filter per source over its distinct token vocabulary, probed with
    a fixed token list — the approximate-membership sketch that lets a
    100 TB pipeline ask "might this shard contain token X" from a few
    hundred bytes of state instead of a vocabulary scan (the same
    build-small/probe-cheap economics Spark's own DataFrameStatFunctions
    bloom uses, here as a first-class mergeable dataset with the
    no-false-negative contract verifiable row by row: bloom_hit is
    always >= member; hits on absent tokens are the measured
    false-positive rate).

    Plan shape: distinct (source, token) -> 4 map-side hash positions
    -> per-source occupied-position set (<= 256 ints each, the sketch
    itself); probes evaluate against the collected bit set via
    array_contains on the broadcast-sized (sources x probes) grid.
    The only data-sized stage is the vocabulary distinct; the sketch
    union is a set-union monoid (mergeable across shards/batches like
    hh1-hh6 — llm/sketch.py's bloom_* algebra is shared verbatim with
    the streaming twin stream_bloom_available_now)."""
    from ..llm.sketch import bloom_positions, bloom_probe

    d = _t(spark, sf_dir, "documents")
    occupied = bloom_positions(d, "text", "source", k=_HH7_K)
    answered = bloom_probe(occupied, _HH7_PROBES, "source", k=_HH7_K)
    member = (
        d.select(
            "source",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("probe"),
        )
        .distinct()
        .withColumn("member", F.lit(1).cast("bigint"))
    )
    return (
        answered.join(member, ["source", "probe"], "left")
        .select(
            "source", "probe",
            F.coalesce(F.col("member"), F.lit(0)).cast("bigint").alias(
                "member"
            ),
            "bloom_hit",
        )
    )


REGISTRY["hh7_bloom_membership"].sql = _hh7_sql()


_HH8_S = 8  # AMS sign functions


def _hh8_sql() -> str:
    from ..llm.dedup import _hexint_sql

    # sign_j(tok) = +1 if the low bit of md5('ams<j>|' || tok) is 0
    def sgn(j: int) -> str:
        h = _hexint_sql(f"md5('ams{j}|' || tok)", 1)
        return f"(CASE WHEN ({h}) % 2 = 0 THEN 1 ELSE -1 END)"

    sketches = ", ".join(
        f"sum(c * {sgn(j)}) AS sk{j}" for j in range(_HH8_S)
    )
    squares = " + ".join(f"(sk{j} * sk{j})" for j in range(_HH8_S))
    return f"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
tf AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
sk AS (SELECT source, {sketches} FROM tf GROUP BY 1),
exact AS (SELECT source, sum(c * c) AS f2 FROM tf GROUP BY 1)
SELECT sk.source,
       cast(exact.f2 AS BIGINT) AS f2_exact,
       -- integer floor-division: cast(double AS BIGINT) ROUNDS in
       -- DuckDB but TRUNCATES in Spark — `//` on exact ints matches
       -- Spark's (sum / 8).cast('bigint') for the positive F2 sums
       cast(({squares}) // {_HH8_S} AS BIGINT) AS f2_est,
       round(abs(({squares}) / {_HH8_S}e0 - exact.f2) / exact.f2, 4)
         AS rel_error
FROM sk JOIN exact ON exact.source = sk.source
"""


@register("hh8_ams_f2", None, first_round=10)
def hh8_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-frequency-moment sketch with
    its exact contract: F2 = sum of squared token frequencies per
    source — the "repeat skew" statistic behind self-join size
    estimation and heavy-hitter variance — estimated from 8 signed
    counters (sign_j from md5 parity, sketch_j = sum c*sign_j, est =
    mean of sketch^2) next to the exact value and the relative error,
    completing the sketch family: CM (point counts), HLL/LC/KMV
    (distinct), log-bins (quantiles), Bloom (membership), AMS (F2).

    Plan shape: one token explode -> (source, token) count agg -> the
    8 signed sums fold in ONE source-keyed agg (the sketch is 8 ints
    per source — a SUM monoid, mergeable across shards like every
    hh sketch); the exact side shares the same count agg. All
    arithmetic is exact 64-bit (counts x +-1, squares of token-count
    sums) — zero float divergence surface except the displayed
    error ratio."""
    from ..llm.dedup import _hexint, _spread

    d = _t(spark, sf_dir, "documents")
    tf = (
        _spread(d.select("source", "text"))
        .select(
            "source",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def sgn(j: int):
        par = _hexint(F.md5(F.concat(F.lit(f"ams{j}|"), F.col("tok"))), 1) % 2
        return F.when(par == 0, 1).otherwise(-1)

    agg = tf.groupBy("source").agg(
        *[F.sum(F.col("c") * sgn(j)).alias(f"sk{j}") for j in range(_HH8_S)],
        F.sum(F.col("c") * F.col("c")).alias("f2"),
    )
    sq = sum(F.col(f"sk{j}") * F.col(f"sk{j}") for j in range(_HH8_S))
    return agg.select(
        "source",
        F.col("f2").cast("bigint").alias("f2_exact"),
        (sq / _HH8_S).cast("bigint").alias("f2_est"),
        F.round(
            F.abs(sq / F.lit(float(_HH8_S)) - F.col("f2")) / F.col("f2"), 4
        ).alias("rel_error"),
    )


REGISTRY["hh8_ams_f2"].sql = _hh8_sql()


_HH9_WINDOW = 7  # rolling window, days


def _hh9_sql() -> str:
    from ..llm.dedup import _hexint_sql
    from ..llm.sketch import HLL_M, HLL_NUM, HLL_W

    h = _hexint_sql("md5(cast(user_id AS VARCHAR))", 8)
    rho = (
        f"CASE WHEN v = 0 THEN {HLL_W + 1} "
        f"ELSE {HLL_W} + 1 - length(bin(v)) END"
    )
    est_raw = f"{HLL_NUM!r} / s_int"
    lc = f"{HLL_M} * ln({HLL_M} * 1.0 / zeros)"
    return f"""
WITH uh AS (
  SELECT DISTINCT event_type, date_trunc('day', ts) AS day, user_id
  FROM events
),
mx AS (SELECT max(day) AS maxday FROM uh),
hashed AS (
  SELECT DISTINCT event_type, day,
         ({h}) % {HLL_M} AS j, ({h}) // {HLL_M} AS v
  FROM uh
),
daily_regs AS (
  SELECT event_type, day, j, max({rho}) AS m_j
  FROM hashed GROUP BY 1, 2, 3
),
spread AS (
  SELECT event_type,
         day + unnest(generate_series(0, {_HH9_WINDOW - 1}))
               * INTERVAL 1 DAY AS out_day,
         j, m_j
  FROM daily_regs
),
regs7 AS (
  SELECT event_type, out_day, j, max(m_j) AS m_j
  FROM spread, mx WHERE out_day <= mx.maxday
  GROUP BY 1, 2, 3
),
sums AS (
  SELECT event_type, out_day,
         sum(cast(power(2, {HLL_W + 1} - m_j) AS BIGINT))
           + ({HLL_M} - count(*)) * cast(power(2, {HLL_W + 1}) AS BIGINT)
           AS s_int,
         {HLL_M} - count(*) AS zeros
  FROM regs7 GROUP BY 1, 2
),
est AS (
  SELECT event_type, out_day,
         CASE WHEN ({est_raw}) <= {2.5 * HLL_M!r} AND zeros > 0
              THEN {lc} ELSE ({est_raw}) END AS e
  FROM sums
),
exact AS (
  SELECT event_type,
         day + unnest(generate_series(0, {_HH9_WINDOW - 1}))
               * INTERVAL 1 DAY AS out_day,
         user_id
  FROM uh
),
exact7 AS (
  SELECT event_type, out_day, count(DISTINCT user_id) AS n_exact
  FROM exact, mx WHERE out_day <= mx.maxday
  GROUP BY 1, 2
)
SELECT est.event_type, cast(est.out_day AS TIMESTAMP) AS day,
       cast(n_exact AS BIGINT) AS n_exact,
       round(e, 2) AS n_est,
       round(abs(round(e, 2) - n_exact) / n_exact, 4) AS rel_err
FROM est JOIN exact7
  ON exact7.event_type = est.event_type AND exact7.out_day = est.out_day
"""


@register("hh9_rolling_hll", None, first_round=11)
def hh9_rolling_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct-user estimate per event type — hh4's HLL
    register algebra composed with x75's span-explode: each day's
    (type, day) register table spreads to the 7 output days it
    contributes to and merges by groupBy-MAX (registers are a max
    monoid, so the rolling merge is EXACTLY the registers a direct
    pass over each window would build — no approximation added by the
    composition). The exact rolling distinct runs in the same plan, so
    the estimator's per-window relative error is a verified contract
    column, like every sketch in the hh family.

    Why this matters at 100 TB: the exact side re-counts each user up
    to 7x per window; the sketch side's state is <= 256 rows per
    (type, day) FOREVER — the monitor keeps registers, folds new days
    in, retires old ones by rebuilding from the daily state (kept
    small and mergeable, the same economics as hh2's CM fold).

    Plan shape: one (type, day, user) distinct feeds both legs; the
    register leg is bounded at 256 x days x types rows before and
    after the span explode; the only data-sized stage is the distinct
    and the exact leg's countDistinct (the contract's truth side).
    All aggs keyed, max-day anchor broadcast."""
    from ..llm.sketch import (
        hll_value_registers,
        rolling_register_estimate,
    )

    e = _t(spark, sf_dir, "events")
    uh = e.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    ).distinct()
    # NOT pinned (r15 A/B): a localCheckpoint on uh measured 2.03 ->
    # 2.96 s isolated — the three consumers' distinct exchanges are
    # covered by AQE reuse, and materializing the event-sized distinct
    # costs more than it saves
    mx = uh.agg(F.max("day").alias("maxday"))
    daily_regs = hll_value_registers(
        uh, ["event_type", "day"], "user_id"
    )
    est = rolling_register_estimate(
        daily_regs, "event_type", "day", _HH9_WINDOW
    )
    k = F.explode(F.sequence(F.lit(0), F.lit(_HH9_WINDOW - 1))).alias("k")
    exact = (
        uh.select("event_type", "day", "user_id", k)
        .select(
            "event_type",
            (
                F.col("day")
                + F.make_interval(days=F.col("k"))
            ).alias("out_day"),
            "user_id",
        )
        .crossJoin(F.broadcast(mx))
        .filter(F.col("out_day") <= F.col("maxday"))
        .groupBy("event_type", "out_day")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return est.join(exact, ["event_type", "out_day"]).select(
        "event_type",
        F.col("out_day").alias("day"),
        F.col("n_exact").cast("bigint").alias("n_exact"),
        "n_est",
        F.round(
            F.abs(F.col("n_est") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )


REGISTRY["hh9_rolling_hll"].sql = _hh9_sql()
