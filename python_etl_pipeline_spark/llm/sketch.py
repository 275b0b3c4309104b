"""Count-Min sketch over token streams (Cormode & Muthukrishnan 2005).

The sketch is a d x w grid of SUM counters — a commutative monoid, so
per-shard / per-batch sketches fold by cell-wise addition into exactly
the sketch a single pass over the union would build. That algebra is
what makes it the heavy-hitter summary a 100 TB pipeline actually
keeps: fixed size regardless of corpus (d*w cells), mergeable across
executors, batches, and streaming micro-batches (the same state-log
discipline as the datacard / LM / TF-IDF folds), and queryable without
touching the corpus again.

Both the bucket hash (md5-derived, operators/sampling.hash_bucket) and
the fold are engine-exact, so the DuckDB oracle replays the sketch
bit-for-bit — approximation error is a *verified number* in the hh1 /
hh2 contract queries, never a claim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import hash_bucket

CM_DEPTH = 4    # d: independent hash rows
CM_WIDTH = 1024  # w: buckets per row


def _hash_rows(spark: SparkSession, d: int) -> DataFrame:
    return spark.range(d).select(F.col("id").cast("int").alias("j"))


def _bucket(d: int = CM_DEPTH, w: int = CM_WIDTH):
    """Bucket column for a (j, tok) pair — row-salted md5 bucket."""
    return hash_bucket(
        F.concat(F.col("j").cast("string"), F.lit(":"), F.col("tok")), w
    )


def countmin_build(
    counts: DataFrame, d: int = CM_DEPTH, w: int = CM_WIDTH
) -> DataFrame:
    """(j, b, cnt) sketch from a (tok, n) count table.

    Inserting per-token subtotals is arithmetically identical to
    per-occurrence inserts (each occurrence adds 1 to the same cell),
    so the only corpus-sized stage a caller pays is its own token
    count — the sketch fold shuffles vocabulary-sized rows into d*w
    cells. Sketches over disjoint corpus parts union+sum into the
    whole-corpus sketch (sum monoid)."""
    spark = counts.sparkSession
    return (
        counts.crossJoin(F.broadcast(_hash_rows(spark, d)))
        .select("j", _bucket(d, w).alias("b"), "n")
        .groupBy("j", "b")
        .agg(F.sum("n").cast("bigint").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame, toks: DataFrame, d: int = CM_DEPTH, w: int = CM_WIDTH
) -> DataFrame:
    """Point estimates for a (tok, ...) table: est = min over the d
    rows of the token's cell — CM guarantees est >= true count always,
    and est <= true + (2N/w) with probability 1 - (1/2)^d. The sketch
    (d*w cells) BROADCASTS; the query table never shuffles."""
    spark = toks.sparkSession
    passthrough = [c for c in toks.columns if c != "tok"]
    return (
        toks.crossJoin(F.broadcast(_hash_rows(spark, d)))
        .select("tok", *passthrough, "j", _bucket(d, w).alias("b"))
        .join(F.broadcast(sketch), ["j", "b"])
        .groupBy("tok", *passthrough)
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )


LC_WIDTH = 16384  # linear-counting bitmap width (buckets)


def lc_hits(
    df: DataFrame,
    key_col: str = "source",
    text_col: str = "text",
    w: int = LC_WIDTH,
) -> DataFrame:
    """(key, b): the DISTINCT buckets each key's tokens hit — the
    linear-counting bitmap (Whang et al. 1990) in row form. A union
    monoid: per-batch/per-shard hit sets union (distinct) into the
    corpus bitmap, so cardinality over a growing stream needs only
    this w-bounded state per key, never a token-history rescan."""
    from .text import tokens

    return (
        df.select(key_col, F.explode(tokens(text_col)).alias("tok"))
        .select(key_col, hash_bucket(F.col("tok"), w).alias("b"))
        .distinct()
    )


def lc_estimate(hits: DataFrame, key_col: str = "source", w: int = LC_WIDTH) -> DataFrame:
    """(key, n_buckets, n_est): cardinality estimate per key from the
    bitmap — n = w * ln(w / zeros)."""
    filled = hits.groupBy(key_col).agg(F.count(F.lit(1)).alias("hit"))
    est = F.lit(w) * F.log(F.lit(w * 1.0) / (F.lit(w) - F.col("hit")))
    return filled.select(
        key_col,
        F.col("hit").cast("bigint").alias("n_buckets"),
        F.round(est, 2).alias("n_est"),
    )


# --- HyperLogLog (Flajolet et al. 2007) -----------------------------------
# m = 2^HLL_P max-rank registers per key; the shared 32-bit md5 hash
# splits into a register index and a rank suffix whose leading-zero
# count feeds the register MAX — a commutative monoid like the CM sum
# and LC union, so per-batch register tables fold into the corpus
# registers exactly (queries.hh4_hll_cardinality is the driver-verified
# contract form built on these helpers).

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_W = 32 - HLL_P  # 24-bit rank suffix; rho in [1, 25]
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha_m * m^2 * 2^(W+1): the estimate is ONE double division of this
# constant by an exact bigint register sum — immune to FP summation
# order across engines/partitionings (see hh4's docstring).
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W + 1))


def hll_registers(
    df: DataFrame,
    key_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(key, j, m_j): the HLL max-rank register table per key. A MAX
    monoid: per-batch/per-shard registers merge by groupBy-max into
    exactly the registers one pass over the union would build, in at
    most m rows per key no matter the corpus size."""
    from .text import tokens

    toks = df.select(key_col, F.explode(tokens(text_col)).alias("tok"))
    return hll_value_registers(toks, [key_col], "tok")


def hll_value_registers(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """(keys..., j, m_j): HLL max-rank registers over an arbitrary
    value column (cast to string before hashing) with a composite key
    — the tokenization-free core ``hll_registers`` wraps. Same max
    monoid: shard/batch registers merge by groupBy-max."""
    from .dedup import _hexint

    h = _hexint(F.md5(F.col(value_col).cast("string")), 8)
    hashed = df.select(
        *key_cols,
        (h % HLL_M).alias("j"),
        (h / F.lit(HLL_M)).cast("bigint").alias("v"),
    ).distinct()
    rho = F.when(F.col("v") == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W + 1) - F.length(F.bin(F.col("v")))
    )
    return hashed.groupBy(*key_cols, "j").agg(F.max(rho).alias("m_j"))


def hll_estimate(
    regs: DataFrame, key_col: str | list[str] = "source"
) -> DataFrame:
    """(keys..., n_registers, zeros, n_est): cardinality estimate per
    key from a register table, with the small-range linear-counting
    correction of the HLL paper (E <= 2.5m and zero registers exist).
    The harmonic sum is an exact bigint (sum of 2^(W+1-m_j)), so the
    estimate is engine- and order-deterministic."""
    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
    sums = regs.groupBy(*key_cols).agg(
        (
            F.sum(
                F.pow(F.lit(2.0), F.lit(HLL_W + 1) - F.col("m_j")).cast(
                    "bigint"
                )
            )
            + (F.lit(HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << (HLL_W + 1)).cast("bigint")
        ).alias("s_int"),
        (F.lit(HLL_M) - F.count(F.lit(1))).alias("zeros"),
    )
    est_raw = F.lit(HLL_NUM) / F.col("s_int")
    e = F.when(
        (est_raw <= F.lit(2.5 * HLL_M)) & (F.col("zeros") > 0),
        F.lit(HLL_M) * F.log(F.lit(HLL_M * 1.0) / F.col("zeros")),
    ).otherwise(est_raw)
    return sums.select(
        *key_cols,
        (F.lit(HLL_M) - F.col("zeros")).cast("bigint").alias("n_registers"),
        F.col("zeros").cast("bigint").alias("zeros"),
        F.round(e, 2).alias("n_est"),
    )


def rolling_register_estimate(
    daily_regs: DataFrame,
    key_col: str | list[str] = "event_type",
    day_col: str = "day",
    window: int = 7,
) -> DataFrame:
    """(keys..., out_day, n_registers, zeros, n_est): rolling-window
    cardinality estimates from per-day register tables — each day's
    registers span-spread to the ``window`` output days they
    contribute to and fold by groupBy-MAX (the register max monoid, so
    the rolled registers are EXACTLY what a direct pass over each
    window would build), then the standard estimate. Shared verbatim
    between hh9's batch form and the streaming serve
    (rolling_hll_from_state_dir)."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    mx = daily_regs.agg(F.max(day_col).alias("maxday"))
    # reserved alias: a caller's key column may itself be named "k"
    k = F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("__rk")
    spread = (
        daily_regs.select(*keys, day_col, "j", "m_j", k)
        .select(
            *keys,
            (
                F.col(day_col) + F.make_interval(days=F.col("__rk"))
            ).alias("out_day"),
            "j",
            "m_j",
        )
        .crossJoin(F.broadcast(mx))
        .filter(F.col("out_day") <= F.col("maxday"))
    )
    regs = spread.groupBy(*keys, "out_day", "j").agg(
        F.max("m_j").alias("m_j")
    )
    return hll_estimate(regs, keys + ["out_day"])


# --- Log-bin quantile histogram (hh5/x56's geometry) ----------------------
# (octave = bin()-string length, 3-bit mantissa prefix) bins over a
# non-negative bigint value column. Bin counts are a SUM monoid like
# the CM grid, so per-batch histograms fold by addition — the quantile
# summary a 100 TB monitor keeps instead of re-sorting history.


def logbin_histogram(
    df: DataFrame, key_col: str = "grp", v_col: str = "v"
) -> DataFrame:
    """(key, blen, sub, c): the log-bin histogram per key. ``v_col``
    must be a non-negative BIGINT (scale floats to cents first)."""
    blen = F.length(F.bin(F.col(v_col)))
    sub = F.when(F.col(v_col) < 8, F.col(v_col)).otherwise(
        F.floor(F.col(v_col) / F.pow(F.lit(2.0), blen - 4)).cast("bigint")
        - 8
    )
    return df.groupBy(
        key_col, blen.alias("blen"), sub.alias("sub")
    ).agg(F.count(F.lit(1)).alias("c"))


def logbin_quantiles(
    hist: DataFrame, qs: tuple, key_col: str = "grp"
) -> DataFrame:
    """(key, q, est): quantile estimates read off a (possibly folded)
    log-bin histogram — cumulative over (blen, sub), first bin at or
    past ceil(q*n), midpoint representative. Estimates are in the
    histogram's own (scaled) units."""
    from pyspark.sql import Window

    rep = F.when(
        F.col("blen") <= 3, F.col("sub").cast("double")
    ).otherwise((F.col("sub") + 8.5) * F.pow(F.lit(2.0), F.col("blen") - 4))
    wcum = (
        Window.partitionBy(key_col)
        .orderBy("blen", "sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = hist.select(
        key_col, "blen", "sub", "c", rep.alias("rep"),
        F.sum("c").over(wcum).alias("cum"),
    )
    n = hist.groupBy(key_col).agg(F.sum("c").alias("n"))
    spark = hist.sparkSession
    qf = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    return (
        r.join(n, key_col)
        .crossJoin(F.broadcast(qf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy(key_col, "q")
        .agg(
            F.min_by("rep", F.col("blen") * 8 + F.col("sub")).alias("est")
        )
    )


KMV_K = 64
KMV_SCALE = float(16**15)  # kmv_hash values are uniform on [0, 2^60)


def kmv_hash(id_col: Column) -> Column:
    """Portable 60-bit md5-derived hash (identical in DuckDB via
    _hexint_sql) — the KMV sketch's hash space."""
    from .dedup import _hexint

    return _hexint(F.md5(id_col.cast("string")), 15)


def kmv_bottomk(df: DataFrame, keys: list[str], hv: str = "hv", k: int = KMV_K) -> DataFrame:
    """Bottom-k distinct hashes per key group — the KMV / bottom-k
    theta sketch. A UNION monoid: merging two sketches = union the
    rows, distinct, bottom-k again; so per-batch sketches persist and
    fold without rescanning history (hh6's streaming twin)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(hv)
    return (
        df.select(*keys, hv)
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(sk: DataFrame, keys: list[str], hv: str = "hv", k: int = KMV_K) -> DataFrame:
    """(keys..., est, nh) distinct-count estimate from a bottom-k
    sketch: exact below k (the sketch IS the value set), else the
    classic (k-1)/h_k estimator on the k-th smallest normalized hash."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(hv)
    r = sk.withColumn("__rn", F.row_number().over(w))
    return (
        r.groupBy(*keys)
        .agg(
            F.max(F.when(F.col("__rn") == k, F.col(hv))).alias("hk"),
            F.count(F.lit(1)).alias("nh"),
        )
        .select(
            *keys,
            F.when(F.col("nh") < k, F.col("nh").cast("double"))
            .otherwise(F.lit(float(k - 1)) * F.lit(KMV_SCALE) / F.col("hk"))
            .alias("est"),
            "nh",
        )
    )


# ------------------------------------------------------------------ Bloom
# 256-bit / 4-hash Bloom filter over a keyed vocabulary, represented as
# the SET of occupied bit positions (<= 256 ints per key) — a union
# monoid like the LC bitmap, so shard/batch sketches merge by DISTINCT.
BLOOM_M = 256
BLOOM_K = 4


def bloom_pos(col: Column, j: int, m: int = BLOOM_M) -> Column:
    """Hash j's bit position for a token column: first 4 md5 hex chars
    of 'bf<j>|' || token, mod m — the arithmetic both engines replay."""
    from .dedup import _hexint

    return (_hexint(F.md5(F.concat(F.lit(f"bf{j}|"), col)), 4) % m).cast(
        "int"
    )


def bloom_positions(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "source",
    k: int = BLOOM_K,
) -> DataFrame:
    """(key, pos) — the occupied-position set for each key's token
    vocabulary. One explode + k map-side hashes + a distinct; the only
    data-sized stage is the vocabulary distinct."""
    from .dedup import _spread

    # filter the '' token a whitespace-only/empty text produces from
    # split(trim(...)) — it would set k bits per key and inflate the
    # false-positive rate, yet no probe can legitimately be '' (r10
    # ADVICE); the oracle SQL carries the same guard
    toks = (
        _spread(df.select(key_col, text_col))
        .select(
            key_col,
            F.explode(F.split(F.trim(text_col), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    return (
        toks.select(
            key_col,
            F.explode(
                F.array(*[bloom_pos(F.col("tok"), j) for j in range(k)])
            ).alias("pos"),
        )
        .distinct()
    )


def bloom_probe(
    occupied: DataFrame,
    probes: list[str],
    key_col: str = "source",
    k: int = BLOOM_K,
) -> DataFrame:
    """(key, probe, bloom_hit) — membership answers served from the
    occupied-position state (folded or single-batch). The per-key bit
    set collects to <= BLOOM_M ints; the probe grid is keys x probes."""
    bits = occupied.groupBy(key_col).agg(F.collect_set("pos").alias("bits"))
    grid = bits.select(
        key_col, "bits",
        F.explode(F.array(*[F.lit(t) for t in probes])).alias("probe"),
    )
    hit = None
    for j in range(k):
        c = F.array_contains("bits", bloom_pos(F.col("probe"), j))
        hit = c if hit is None else (hit & c)
    return grid.select(
        key_col, "probe",
        F.when(hit, 1).otherwise(0).cast("bigint").alias("bloom_hit"),
    )
