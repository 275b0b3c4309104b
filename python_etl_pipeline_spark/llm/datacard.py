"""Corpus-datacard state algebra — the mergeable form of x37's
per-language datacard, shared by the batch fold (queries.x41) and the
streaming sink (streaming.file_stream.stream_datacard_available_now).

A datacard over a growing corpus cannot be stored as its FINAL numbers:
medians don't merge, rates don't merge. What merges is the state each
number is derived from, and every state here is a commutative monoid —
so folding arrival batches in any grouping/order equals the full
recompute (the property queries.x41 proves against a from-scratch
DuckDB oracle):

* ``lang_state``   (lang)        -> n_docs, sum_nt, sum_q, n_q —
  merge = sum; yields doc/token volume and mean quality.
* ``hist_state``   (lang, nt)    -> c — merge = sum; the token-count
  histogram the type-1 median reads off exactly (this is WHY the card
  stores a histogram: the median itself is not mergeable).
* ``dup_state``    (lang, __h)   -> cnt, min_doc — merge = (sum, min);
  a document is an exact duplicate iff its content hash's GLOBAL
  min_doc belongs to an earlier document, so duplicate rates stay
  exact ACROSS batches. This is the exact-dedup index a production
  corpus persists anyway — hash-cardinality sized, no text.

Scale shape: every state is aggregate-sized (languages, distinct
lengths, distinct hashes); merging touches |state| + |batch| rows; the
final derivation shuffles state-sized frames only. Nothing rescans
ingested history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "datacard_base",
    "lang_state",
    "hist_state",
    "dup_state",
    "merge_lang_states",
    "merge_hist_states",
    "merge_dup_states",
    "datacard_from_states",
]


def datacard_base(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(doc_id, lang, __h, nt, q): the one-pass projection every state
    aggregates from — content hash, token count, quality score. Pure
    projection, no shuffle."""
    from .text import quality_score, token_count

    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.md5(text_col).alias("__h"),
        token_count(F.col(text_col)).alias("nt"),
        quality_score(F.col(text_col)).alias("q"),
    )


def lang_state(base: DataFrame) -> DataFrame:
    return base.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("nt").alias("sum_nt"),
        F.sum("q").alias("sum_q"),
        F.count("q").cast("bigint").alias("n_q"),
    )


def hist_state(base: DataFrame) -> DataFrame:
    # NULL token counts excluded from the histogram (engines disagree
    # on null sort order in cumulative walks — same guard as llm.caps);
    # such docs still count in lang_state, so the card reports them.
    return (
        base.filter(F.col("nt").isNotNull())
        .groupBy("lang", "nt")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def dup_state(base: DataFrame) -> DataFrame:
    return base.groupBy("lang", "__h").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.min("doc_id").alias("min_doc"),
    )


def merge_lang_states(a: DataFrame, b: DataFrame) -> DataFrame:
    from ..plans import merge_agg_state

    return merge_agg_state(
        a, b, ["lang"], count_col="n_docs", sum_cols=["sum_nt", "sum_q", "n_q"]
    )


def merge_hist_states(a: DataFrame, b: DataFrame) -> DataFrame:
    from ..plans import merge_agg_state

    return merge_agg_state(a, b, ["lang", "nt"], count_col="c")


def merge_dup_states(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("lang", "__h")
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.min("min_doc").alias("min_doc"),
        )
    )


def datacard_from_states(
    lang: DataFrame, hist: DataFrame, dup: DataFrame
) -> DataFrame:
    """Derive the final x37-shaped card (lang, n_docs, total_tokens,
    median_tokens, dup_rate, mean_quality) from merged states. Accepts
    UN-merged unions too (e.g. every batch's partials read back from a
    batch_id-partitioned state log): each derivation starts with the
    state's own groupBy, which IS the merge."""
    lang = merge_lang_states(lang, lang.limit(0))
    hist = merge_hist_states(hist, hist.limit(0))
    dup = merge_dup_states(dup, dup.limit(0))
    # global first occurrence per content hash; eqNullSafe keeps the
    # NULL-text hash group (md5(NULL) = NULL) — its 2nd+ members count
    # as duplicates too, and a plain equi-join would drop them
    firsts = dup.groupBy("__h").agg(F.min("min_doc").alias("gmin"))
    ndups = (
        dup.alias("s")
        .join(firsts.alias("g"), F.col("s.__h").eqNullSafe(F.col("g.__h")))
        .select(
            F.col("s.lang").alias("lang"),
            (
                F.col("s.cnt")
                - F.when(F.col("s.min_doc") == F.col("g.gmin"), 1).otherwise(0)
            ).alias("dup_c"),
        )
        .groupBy("lang")
        .agg(F.sum("dup_c").cast("bigint").alias("n_dups"))
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
    agg = lang.join(ndups, "lang").select(
        "lang",
        "n_docs",
        F.col("sum_nt").cast("bigint").alias("total_tokens"),
        F.round(F.col("n_dups") / F.col("n_docs"), 4).alias("dup_rate"),
        F.round(F.col("sum_q") / F.col("n_q"), 4).alias("mean_quality"),
    )
    # LEFT join: a language whose every document has NULL text still
    # appears (median_tokens NULL) instead of silently vanishing
    return agg.join(med, "lang", "left").select(
        "lang", "n_docs", "total_tokens", "median_tokens", "dup_rate",
        "mean_quality",
    )
