"""Round-14 hardening of the broadcast BLAS assignment kernel
(`_nearest_cell_blas`) and its propagation to every corpus-sized
assignment site (r13 verdict #2 + the r13 advice items):

* near-tie safety — the gemm identity ||c||^2 - 2 v.c carries
  ~eps*||c||^2 absolute error, so NEAR-equidistant centroids (not just
  exact ties) could assign differently than the oracle's explicit
  (v-c)^2 sum; the kernel now re-scores any vector whose best/second
  margin is inside a conservative tolerance with the explicit form,
  and these tests drive margins straight through that regime;
* loud failure on NaN components (an all-NaN distance row used to
  silently argmin to the first cell);
* id dtype follows the input column (a non-bigint caller used to get
  a silent Arrow cast; a string caller now fails at plan time);
* subspace codebooks — the kernel slices each vector to the centroid
  table's own component range, the contract pq_train/pq_encode lean
  on since their join-form assignments were replaced;
* the derived-k seed helper shared by ann5/ann30/x51 and (new) the
  IVF-PQ index build.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_etl_pipeline_spark.llm.similarity import (
    _components,
    _nearest_cell,
    _nearest_cell_blas,
    derived_k_init,
    ivf_incremental_assign,
)


def _cent_df(spark, rows):
    """Long-form (cell, i, v) centroid frame."""
    return spark.createDataFrame(rows, "cell bigint, i int, v double")


def _vec_df(spark, rows, id_type="bigint"):
    return spark.createDataFrame(
        rows, f"vec_id {id_type}, embedding array<double>"
    )


def _assign_both_ways(spark, vec_rows, cent_rows):
    df = _vec_df(spark, vec_rows)
    cent = _cent_df(spark, cent_rows)
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
    return blas, join


def test_near_tie_margins_match_join_form(spark):
    """Vectors whose two nearest centroids differ by margins from an
    EXACT tie up through ~1e9x the gemm identity's float64 error all
    assign identically in the kernel and the explicit join form. The
    centroid norms (1e8 per axis -> ||c||^2 = 1e16) put the identity's
    absolute error at ~2 units, so the small deltas here sit squarely
    in the regime the r13 advice flagged — only the exact re-score
    pass keeps the kernel honest."""
    cent = [(0, 0, 1e8), (0, 1, 0.0), (1, 0, 0.0), (1, 1, 1e8)]
    a = 5e7
    vecs = []
    # margin between the two cells is 4*a*delta: 0 (exact tie), ~10,
    # ~2e3, ~2e7 (inside the 1e-9*1e16 tolerance), ~2e11 (outside it)
    for vid, delta in enumerate([0.0, 5e-8, -5e-8, 1e-5, -1e-5, 0.1,
                                 -0.1, 1e3, -1e3]):
        vecs.append((vid, [a + delta, a]))
    blas, join = _assign_both_ways(spark, vecs, cent)
    assert blas == join
    # the exact-tie vector must break to the SMALLEST cell id
    assert blas[0] == 0
    # sanity on the sign convention: +delta moves toward axis 0's
    # centroid (cell 0), -delta toward cell 1
    assert blas[7] == 0 and blas[8] == 1


def test_nan_component_fails_loudly(spark):
    df = _vec_df(spark, [(0, [1.0, 2.0]), (1, [1.0, None])])
    cent = _cent_df(spark, [(0, 0, 0.0), (0, 1, 0.0), (1, 0, 1.0), (1, 1, 1.0)])
    out = _nearest_cell_blas(df, "vec_id", "embedding", cent)
    with pytest.raises(Exception, match="non-finite"):
        out.collect()


def test_fully_null_vector_dropped_like_join_form(spark):
    df = _vec_df(spark, [(0, [1.0, 2.0]), (1, None)])
    cent = _cent_df(spark, [(0, 0, 0.0), (0, 1, 0.0)])
    rows = _nearest_cell_blas(df, "vec_id", "embedding", cent).collect()
    assert [r["vec_id"] for r in rows] == [0]


def test_id_dtype_follows_input_column(spark):
    df = _vec_df(spark, [(7, [1.0, 0.0]), (8, [0.0, 1.0])], id_type="int")
    cent = _cent_df(spark, [(0, 0, 1.0), (0, 1, 0.0), (3, 0, 0.0), (3, 1, 1.0)])
    out = _nearest_cell_blas(df, "vec_id", "embedding", cent)
    assert dict(out.dtypes)["vec_id"] == "int"
    assert {r["vec_id"]: r["cell"] for r in out.collect()} == {7: 0, 8: 3}


def test_string_id_fails_at_plan_time(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<double>"
    )
    cent = _cent_df(spark, [(0, 0, 1.0), (0, 1, 0.0)])
    with pytest.raises(TypeError, match="integral"):
        _nearest_cell_blas(df, "vec_id", "embedding", cent)


def test_subspace_codebook_slices_vector(spark):
    """A centroid table spanning components [2, 3] scores each vector
    on exactly that slice — blas(full vectors) == join(subspace
    components), the contract pq_train/pq_encode now rely on."""
    vecs = [
        (0, [9.0, 9.0, 1.0, 0.0]),
        (1, [-9.0, 0.0, 0.0, 1.0]),
        (2, [0.0, 5.0, 0.8, 0.7]),
    ]
    cent = [(0, 2, 1.0), (0, 3, 0.0), (1, 2, 0.0), (1, 3, 1.0)]
    df = _vec_df(spark, vecs)
    cent_df = _cent_df(spark, cent)
    blas = {
        r["vec_id"]: r["cell"]
        for r in _nearest_cell_blas(df, "vec_id", "embedding", cent_df).collect()
    }
    comp_sub = _components(df, "vec_id", "embedding").filter(F.col("i") >= 2)
    join = {
        r["vec_id"]: r["cell"]
        for r in _nearest_cell(comp_sub, cent_df, "vec_id").collect()
    }
    assert blas == join
    # components 0/1 (where vector 0 and 1 scream) must not leak in
    assert blas == {0: 0, 1: 1, 2: 0}


def test_short_vector_fails_loudly(spark):
    df = _vec_df(spark, [(0, [1.0, 2.0])])
    cent = _cent_df(spark, [(0, 2, 1.0), (0, 3, 0.0)])
    out = _nearest_cell_blas(df, "vec_id", "embedding", cent)
    with pytest.raises(Exception, match="dimensionality|component range"):
        out.collect()


def test_incremental_assign_matches_join_form_at_gate_scale(spark, sf_dir):
    """ann12's primitive through the kernel == the explicit join form
    on the real fixture."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = (
        _components(emb, "vec_id", "embedding")
        .filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("cell"), "i", "v")
    )
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    got = {
        r["vec_id"]: r["cell"]
        for r in ivf_incremental_assign(delta, cent).collect()
    }
    want = {
        r["vec_id"]: r["cell"]
        for r in _nearest_cell(
            _components(delta, "vec_id", "embedding"), cent, "vec_id"
        ).collect()
    }
    assert got == want and len(got) == delta.count()


def test_derived_k_init_cell_count(spark):
    """k = greatest(4, ceil(N/500)): 500 vectors seed 4 cells, a 2600-
    vector corpus seeds 6 — the SemDeDup sizing the oracles replay as
    their kk CTE."""
    big = spark.range(2600).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 17).cast("double"), (F.col("id") % 5).cast("double")
        ).alias("embedding"),
    )
    init = derived_k_init(big, "vec_id", "embedding")
    assert init.select("cell").distinct().count() == 6
    small = big.filter(F.col("vec_id") < 500)
    assert (
        derived_k_init(small, "vec_id", "embedding")
        .select("cell").distinct().count()
        == 4
    )


def _cos_join_form(df, cent):
    """The replaced join + window coarse-assign, kept inline as the
    cosine kernel's executable A/B twin (cos DESC, c ASC winner)."""
    from pyspark.sql import Window

    comp = _components(df, "vec_id", "embedding")
    norms = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm")
    )
    cnorms = cent.groupBy("c").agg(
        F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cnorm")
    )
    scored = (
        comp.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "c")
        .agg(F.sum(F.col("v") * F.col("cv")).alias("dot"))
        .join(norms, "vec_id")
        .join(F.broadcast(cnorms), "c")
        .select(
            "vec_id",
            "c",
            (F.col("dot") / (F.col("norm") * F.col("cnorm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("c"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("c").alias("centroid"))
    )


def test_cosine_kernel_matches_join_form_at_gate_scale(spark, sf_dir):
    """The round-14 cosine kernel == the replaced join + window form on
    the real fixture (every vector, first-8-stored-vectors centroids —
    exactly _ivf_cluster_members' corpus assignment)."""
    from python_etl_pipeline_spark.llm.similarity import (
        _nearest_centroid_cos_blas,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comp = _components(emb, "vec_id", "embedding")
    cent = comp.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c"), "i", F.col("v").alias("cv")
    )
    got = {
        r["vec_id"]: r["centroid"]
        for r in _nearest_centroid_cos_blas(
            emb, "vec_id", "embedding", cent
        ).collect()
    }
    want = {
        r["vec_id"]: r["centroid"] for r in _cos_join_form(emb, cent).collect()
    }
    assert got == want and len(got) == emb.count()


def test_cosine_kernel_tie_breaks_to_smallest_centroid(spark):
    """Exact cosine tie -> smallest centroid id, matching the window
    form's (cos DESC, c ASC) order."""
    from python_etl_pipeline_spark.llm.similarity import (
        _nearest_centroid_cos_blas,
    )

    # centroids along +x (c=3) and +y (c=5); v0 on the diagonal is an
    # exact cosine tie, v2/v3 are clear winners
    vecs = [
        (0, [1.0, 1.0]),
        (2, [5.0, 1.0]),
        (3, [1.0, 5.0]),
    ]
    df = _vec_df(spark, vecs)
    cent = spark.createDataFrame(
        [(3, 0, 2.0), (3, 1, 0.0), (5, 0, 0.0), (5, 1, 2.0)],
        "c bigint, i int, cv double",
    )
    got = {
        r["vec_id"]: r["centroid"]
        for r in _nearest_centroid_cos_blas(
            df, "vec_id", "embedding", cent
        ).collect()
    }
    want = {
        r["vec_id"]: r["centroid"] for r in _cos_join_form(df, cent).collect()
    }
    assert got == want
    assert got == {0: 3, 2: 3, 3: 5}


def test_cosine_kernel_zero_norms_fail_loudly(spark):
    """Cosine is undefined at zero norm, and the declarative form this
    kernel replaced raises Spark's ANSI divide-by-zero there — the
    kernel must fail the same way, not invent an assignment."""
    import pytest as _pytest

    from python_etl_pipeline_spark.llm.similarity import (
        _nearest_centroid_cos_blas,
    )

    cent_ok = spark.createDataFrame(
        [(3, 0, 2.0), (3, 1, 0.0)], "c bigint, i int, cv double"
    )
    # the REPLACED declarative form errors under ANSI for a zero-norm
    # vector (pinned: this is the semantics the kernel must preserve)
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO|divide"):
        _cos_join_form(_vec_df(spark, [(1, [0.0, 0.0])]), cent_ok.select(
            "c", "i", F.col("cv")
        )).collect()
    with _pytest.raises(Exception, match="zero-norm vector"):
        _nearest_centroid_cos_blas(
            _vec_df(spark, [(1, [0.0, 0.0])]), "vec_id", "embedding", cent_ok
        ).collect()
    cent_zero = spark.createDataFrame(
        [(3, 0, 2.0), (3, 1, 0.0), (5, 0, 0.0), (5, 1, 0.0)],
        "c bigint, i int, cv double",
    )
    with _pytest.raises(ValueError, match="zero-norm centroid"):
        _nearest_centroid_cos_blas(
            _vec_df(spark, [(0, [1.0, 1.0])]), "vec_id", "embedding", cent_zero
        )
