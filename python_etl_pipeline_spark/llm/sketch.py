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

from pyspark.sql import DataFrame, SparkSession
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
