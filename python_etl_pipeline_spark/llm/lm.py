"""Corpus bigram-LM state algebra — the mergeable form of tx10's
language-model counts, shared by the batch fold (queries.tx19) and the
streaming sink (streaming.file_stream.stream_lm_state_available_now).

The LM behind the perplexity filter (tx10 scoring, tx17 CCNet-style
bucketing) is nothing but count tables: ``c12(bg)`` — occurrences of
each bigram — and ``c1(w1)`` — occurrences of each leading unigram.
Counts are commutative monoids (the same algebra as
:mod:`.datacard`), so the persisted state is the per-batch ``c12``
partials: folding arrival batches in ANY grouping/order equals the
full recompute — the property ``queries.tx19`` proves against a
from-scratch DuckDB oracle — and perplexity-scoring a growing corpus
never rescans ingested history to rebuild its LM. ``c1`` is DERIVED
from the merged ``c12`` (one groupBy over the vocabulary-sized
table); persisting it separately would save nothing and add a second
state to keep consistent.

Scale shape: states are bigram-VOCABULARY-sized, not corpus-sized;
merging touches |state| + |batch| rows; scoring is tx10's plan — a
hash join of the instance table against the vocabulary tables, then
one groupBy(doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bigram_instances",
    "lm_count_state",
    "merge_lm_states",
    "lm_score_docs",
]


def bigram_instances(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, bg): one row per bigram occurrence — the long form both
    the count state and the scoring join consume. Pure projection +
    explode, no shuffle; spread first so the explode parallelizes."""
    from .dedup import _spread, shingles

    return _spread(df.select(F.col(id_col).alias("doc_id"), text_col)).select(
        "doc_id", F.explode(shingles(F.col(text_col), 2)).alias("bg")
    )


def lm_count_state(inst: DataFrame) -> DataFrame:
    """(bg, c12): one batch's bigram-count partial — the unit the
    state log persists per arrival batch."""
    return inst.groupBy("bg").agg(F.count("*").cast("bigint").alias("c12"))


def merge_lm_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two count states; sum-monoid merge via the same
    plans.merge_agg_state the datacard and i5 states use. Accepts
    un-merged unions too (a whole batch_id-partitioned state log read
    back at once): the groupBy IS the merge."""
    from ..plans import merge_agg_state

    return merge_agg_state(a, b, ["bg"], count_col="c12")


def lm_score_docs(inst: DataFrame, c12: DataFrame) -> DataFrame:
    """(doc_id, avg_nll, n_bigrams): tx10's scoring plan against an
    EXTERNAL count state — avg of -ln(c12(bg)/c1(w1)) per document,
    with c1 derived from ``c12`` in one vocabulary-sized groupBy.

    The per-bigram NLL is a function of ``bg`` ALONE (w1 is a prefix
    of bg), so it is folded into one VOCABULARY-sized table before the
    corpus ever joins (r16, guide §1.2/§2.3): the instance stream pays
    one broadcast-hash probe per row instead of two, and the
    per-instance `split(bg)` + cast + divide + ln all collapse to one
    lookup computed once per vocabulary entry. Same inner-join
    population (every scored instance must carry a c12 entry, exactly
    as before) and the identical float expression per instance —
    -ln(cast(c12 as double)/c1) — so results are bit-equal up to the
    aggregation's already-nondeterministic summation order. The join
    back is hash-keyed on vocabulary entries; at scale AQE broadcasts
    the folded table once its post-agg size is known."""
    c1 = (
        c12.select(F.split(F.col("bg"), " ")[0].alias("w1"), "c12")
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    nll = (
        c12.withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(c1, "w1")
        .select(
            "bg",
            (-F.log(F.col("c12").cast("double") / F.col("c1"))).alias(
                "__nll"
            ),
        )
    )
    return (
        inst.join(nll, "bg")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("__nll"), 4).alias("avg_nll"),
            F.count("*").alias("n_bigrams"),
        )
    )
