"""Round-16 optimization nets.

* ann28's mixed-width guard (r15 ADVICE): the Arrow kernel's ragged
  check only sees widths within one task's batch stream, so a corpus
  whose embedding widths differ ACROSS partitions but are uniform
  within each task used to pass the kernel and corrupt the summed
  partial moments silently. The driver-side min/max width check (one
  extra column on the existing single stats action) must catch it.
* ann28's raw-moment identity on a MEAN-DOMINATED corpus (r15 ADVICE):
  cov = (Sxx - Sx Sx^T/cnt)/(n-1) loses ~log10(mean^2/var) digits to
  cancellation. The test pins the regime the contract promises
  (mean^2/var up to ~1e4 keeps all four rounded outputs exact against
  an explicitly-centered numpy replay) so a future corpus change that
  violates the docstring's "near-zero-mean" assumption re-checks here.
* the r16 LM-scoring fold (per-bigram NLL computed once per vocabulary
  entry instead of once per instance) must be result-identical to the
  two-join form it replaced, on a corpus with repeated bigrams across
  and within documents.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _write_embeddings(spark, tmp_path, rows, n_files=4):
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    df.repartition(n_files).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_ann28_mixed_width_across_partitions_raises(spark, tmp_path):
    """Widths uniform WITHIN each written file but different ACROSS
    files: each task sees an internally-consistent batch stream, so
    only the driver-side min/max guard can catch it — and it must,
    before the kernel sums 2-dim and 3-dim partial moments together."""
    two = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(30)],
        "vec_id bigint, embedding array<double>",
    ).coalesce(1)
    three = spark.createDataFrame(
        [(100 + i, [1.0, 2.0, 3.0]) for i in range(30)],
        "vec_id bigint, embedding array<double>",
    ).coalesce(1)
    out = str(tmp_path / "embeddings.parquet")
    two.write.mode("overwrite").parquet(out)
    three.write.mode("append").parquet(out)

    from python_etl_pipeline_spark.queries import REGISTRY

    with pytest.raises(ValueError, match="mixed embedding widths"):
        REGISTRY["ann28_top_eigen"].spark(spark, str(tmp_path))


def test_ann28_mean_dominated_corpus_still_exact_at_contract_scale(
    spark, tmp_path
):
    """mean ~ 100, var ~ 1 (mean^2/var ~ 1e4): the raw-moment identity
    loses ~4 of float64's 15-16 digits — still 11+ significant digits
    on every covariance cell, far inside the round(4) outputs. All
    four reported numbers must equal an explicitly-centered numpy
    replay. (At mean^2/var ~ 1e12+ the identity genuinely degrades;
    that regime is excluded by the query's documented near-zero-mean
    contract, which this test exists to re-check on corpus changes.)"""
    rng = np.random.RandomState(16)
    X = rng.rand(60, 4) + 100.0  # heavy common offset, unit-ish spread
    sf_dir = _write_embeddings(
        spark, tmp_path, [(i, [float(v) for v in X[i]]) for i in range(60)]
    )
    from python_etl_pipeline_spark.queries import REGISTRY

    row = REGISTRY["ann28_top_eigen"].spark(spark, sf_dir).first()

    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / (len(X) - 1)
    u = np.full(4, 0.5)
    us = []
    for _ in range(3):
        w = cov @ u
        u = w / np.sqrt((w * w).sum())
        us.append(u)
    lam = us[-1] @ cov @ us[-1]
    assert row["n_dims"] == 4
    assert row["top_eigenvalue"] == round(float(lam), 4)
    assert row["explained_share"] == round(float(lam / np.trace(cov)), 4)
    assert row["convergence_cos"] == round(abs(float(us[1] @ us[2])), 4)


def test_lm_score_fold_matches_two_join_form(spark):
    """The folded per-vocab NLL table == the per-instance two-join
    form, row for row, on a corpus with shared leading unigrams and
    repeated bigrams (the case where c1 aggregates across bigrams and
    instances repeat vocabulary entries)."""
    from python_etl_pipeline_spark.llm.lm import (
        bigram_instances,
        lm_count_state,
        lm_score_docs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "a dog sat on a log on a hill"),
            (4, "the mat sat"),
        ],
        "doc_id bigint, text string",
    )
    inst = bigram_instances(docs)
    c12 = lm_count_state(inst)
    got = {
        r["doc_id"]: (r["avg_nll"], r["n_bigrams"])
        for r in lm_score_docs(inst, c12).collect()
    }

    # reference: the pre-r16 two-join per-instance form
    c1 = (
        c12.select(F.split(F.col("bg"), " ")[0].alias("w1"), "c12")
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    want = {
        r["doc_id"]: (r["avg_nll"], r["n_bigrams"])
        for r in (
            inst.join(c12, "bg")
            .withColumn("w1", F.split(F.col("bg"), " ")[0])
            .join(c1, "w1")
            .groupBy("doc_id")
            .agg(
                F.round(
                    F.avg(
                        -F.log(F.col("c12").cast("double") / F.col("c1"))
                    ),
                    4,
                ).alias("avg_nll"),
                F.count("*").alias("n_bigrams"),
            )
        ).collect()
    }
    assert got == want
    assert set(got) == {1, 2, 3, 4}
