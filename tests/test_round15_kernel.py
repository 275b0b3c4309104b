"""Round-15 kernel hardening (the r14 ADVICE items):

* ``derived_k_init`` derives N as the DISTINCT count of ids holding a
  non-null vector — the exact population every oracle kk CTE measures
  over the exploded components (explode drops null embeddings,
  DISTINCT drops duplicate ids). Before this round a raw ``count(*)``
  could disagree with the oracle near a per_cell boundary.
* the near-tie re-score tolerance folds the BATCH VECTOR scale into
  the margin test: the gemm identity's error is ~eps*(||c||^2+|v.c|),
  and |v.c| can dominate when vector norms exceed centroid norms, so
  a centroid-only tolerance under-flags skewed inputs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from python_etl_pipeline_spark.llm.similarity import (
    _components,
    _near_tie_tol,
    _nearest_cell,
    _nearest_cell_blas,
    derived_k_init,
)


def test_derived_k_counts_distinct_nonnull_ids(spark):
    """2600 distinct non-null ids derive k=6 (ceil(2600/500)) even
    when the raw table also carries 600 duplicate-id rows and 300
    null-embedding rows — a raw count(*) would see 3500 rows and
    derive k=7, diverging from the oracle kk CTE's
    count(DISTINCT id) over exploded (null-dropping) components."""
    base = spark.range(2600).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 17).cast("double"),
            (F.col("id") % 5).cast("double"),
        ).alias("embedding"),
    )
    dups = base.filter(F.col("vec_id") < 600)
    nulls = spark.range(2600, 2900).select(
        F.col("id").alias("vec_id"),
        F.lit(None).cast("array<double>").alias("embedding"),
    )
    noisy = base.unionAll(dups).unionAll(nulls)
    init = derived_k_init(noisy, "vec_id", "embedding")
    assert init.select("cell").distinct().count() == 6


def test_near_tie_tol_scales_with_batch_vector_norms():
    """The r14 ADVICE case: vector norms ~1e6x the centroid norms.
    With ||v||^2 = 2e16 the identity error is ~eps*|v.c| ~ 1e-8 —
    above the old centroid-only tolerance (1e-9*||c||^2 = 2e-9, which
    under-flagged) and far below the new joint-scale margin
    (1e-9*2e16 = 2e7, which re-scores everything the identity could
    misorder)."""
    cn2_max = 2.0  # unit-ish centroids
    M = np.array([[1e8, 1e8], [1.0, 1.0]])
    tol = _near_tie_tol(cn2_max, M)
    assert tol == 1e-9 * 2e16
    # identity's true error scale for this batch
    identity_err = np.finfo(np.float64).eps * 1e8 * np.sqrt(cn2_max)
    assert identity_err > 1e-9 * cn2_max  # old margin under-flagged
    assert tol > identity_err * 1e3  # new margin dominates it
    # centroid-dominated batches keep the old scale exactly
    assert _near_tie_tol(1e16, np.array([[1.0, 0.0]])) == 1e-9 * 1e16
    # and the floor holds for tiny everything
    assert _near_tie_tol(0.0, np.zeros((1, 2))) == 1e-9


def test_norm_skewed_near_ties_match_join_form(spark):
    """Semantic net for the skew regime: vectors with ||v|| ~ 1e8
    against unit centroids, swept through margins from an exact tie
    (the float64 grid swallows small deltas at 2e8 scale) up through
    clearly-resolved — kernel == explicit join form everywhere, and
    the exact-tie row breaks to the smallest cell id."""
    cent_rows = [(0, 0, 1.0), (0, 1, 0.0), (1, 0, 0.0), (1, 1, 1.0)]
    cent = spark.createDataFrame(cent_rows, "cell bigint, i int, v double")
    B = 1e8
    vecs = [
        (vid, [B + delta, B])
        for vid, delta in enumerate(
            [0.0, 1e-8, -1e-8, 1e-6, -1e-6, 0.5, -0.5, 1e4, -1e4]
        )
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    blas = {
        r["vec_id"]: r["cell"]
        for r in _nearest_cell_blas(df, "vec_id", "embedding", cent).collect()
    }
    join = {
        r["vec_id"]: r["cell"]
        for r in _nearest_cell(
            _components(df, "vec_id", "embedding"), cent, "vec_id"
        ).collect()
    }
    assert blas == join
    assert blas[0] == 0  # exact tie -> smallest cell
    assert blas[7] == 0 and blas[8] == 1  # resolved margins keep sign
