"""Frequency caps bound dedup pair fan-out on boilerplate-heavy corpora.

A bucket/shingle shared by B documents emits B(B-1)/2 join rows — the
thing that kills LSH/inverted-index joins at 100 TB. The caps drop
degenerate buckets (dd2) and ultra-common shingles (dd3) BEFORE the
self-join; these tests prove the bound with a corpus built to blow up.
"""

from __future__ import annotations

from python_etl_pipeline_spark.llm.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

N_DOCS = 30
ALL_PAIRS = N_DOCS * (N_DOCS - 1) // 2


def _boilerplate_corpus(spark):
    """30 docs sharing one 8-token boilerplate sentence + unique tails:
    every shared shingle has document frequency 30."""
    rows = [
        (
            i,
            "terms of service apply to every single page "
            f"unique{i} trailing{i} words{i} here{i}",
        )
        for i in range(N_DOCS)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _identical_corpus(spark):
    """30 byte-identical docs: every LSH band bucket holds all 30."""
    rows = [(i, "exactly the same document text in every row of this set")
            for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_jaccard_doc_freq_cap_bounds_pairs(spark):
    docs = _boilerplate_corpus(spark)
    uncapped = ngram_jaccard_pairs(docs, "text", "doc_id", min_jaccard=0.0)
    assert uncapped.count() == ALL_PAIRS  # every pair co-occurs via boilerplate
    capped = ngram_jaccard_pairs(
        docs, "text", "doc_id", min_jaccard=0.0, max_doc_freq=5
    )
    # shared shingles have df=30 > 5 -> excluded from the join; unique
    # tails never co-occur -> zero pairs ever reach the scorer
    assert capped.count() == 0


def test_jaccard_cap_is_noop_below_threshold(spark):
    docs = _boilerplate_corpus(spark)
    loose = ngram_jaccard_pairs(
        docs, "text", "doc_id", min_jaccard=0.0, max_doc_freq=N_DOCS
    )
    assert loose.count() == ALL_PAIRS


def test_lsh_bucket_cap_bounds_pairs(spark):
    docs = _identical_corpus(spark)
    uncapped = minhash_lsh_pairs(docs, "text", "doc_id")
    assert uncapped.count() == ALL_PAIRS  # one 30-doc bucket per band
    capped = minhash_lsh_pairs(docs, "text", "doc_id", max_bucket_size=10)
    assert capped.count() == 0  # every bucket oversized -> dropped pre-join
    noop = minhash_lsh_pairs(docs, "text", "doc_id", max_bucket_size=N_DOCS)
    assert noop.count() == ALL_PAIRS


def test_minhash_estimator_error_within_theory(spark, sf_dir):
    """dd17: with k=16 components the estimator's standard error is at
    most sqrt(J(1-J)/16) <= 0.125; the measured MAE over the candidate
    pairs must sit inside it (measured ~0.03 — candidates are high-J
    pairs where the bound tightens), the worst case under 2.5x the
    bound, and the signed bias a fraction of the MAE."""
    from python_etl_pipeline_spark.queries import REGISTRY

    row = REGISTRY["dd17_minhash_estimator_error"].spark(spark, sf_dir).collect()[0]
    assert row["n_pairs"] > 0
    assert 0 <= row["mae"] <= 0.125, row
    assert row["max_abs_err"] <= 0.3, row
    assert abs(row["bias"]) <= max(row["mae"], 0.02), row
