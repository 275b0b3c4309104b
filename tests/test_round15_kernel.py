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
import pytest
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


def test_broadcast_centroid_envelope_guard(spark, monkeypatch):
    """Past the envelope the kernel fails LOUDLY at the collect site
    (naming the two-level alternative) instead of OOMing an executor
    mid-broadcast. The ceiling is monkeypatched down so a 4x2 table
    trips it — the production constant (256 MB ~ 2e8 vectors at d=64
    under derived k = N/500) is pinned separately below."""
    from python_etl_pipeline_spark.llm import similarity as sim

    df = _mk_vecs(spark, 6)
    cent = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 0.0), (1, 0, 0.0), (1, 1, 1.0)],
        "cell bigint, i int, v double",
    )
    monkeypatch.setattr(sim, "_BROADCAST_CENTROID_MAX_BYTES", 16)
    with pytest.raises(ValueError, match="broadcast envelope"):
        sim._nearest_cell_blas(df, "vec_id", "embedding", cent).collect()
    monkeypatch.undo()
    # within the envelope the same plan runs
    out = sim._nearest_cell_blas(df, "vec_id", "embedding", cent)
    assert out.count() == 6
    assert sim._BROADCAST_CENTROID_MAX_BYTES == 256 * 2**20


def _mk_vecs(spark, n, dim=4, seed_mod=37):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.col("id") * (j + 3) + j) % seed_mod).cast("double")
                for j in range(dim)
            ]
        ).alias("embedding"),
    )


def test_two_level_kmeans_structure(spark):
    """The hierarchical contract on a 300-vector corpus with
    per_super_vec=75 / per_cell=10: (1) every vector gets exactly one
    (super, cell); (2) each super's cell count obeys
    least(n_s, greatest(2, ceil(n_s/10))); (3) cell ids are member
    ids of their own super (the seed convention), so they are
    globally unique without coordination; (4) the run is
    deterministic."""
    from python_etl_pipeline_spark.llm.similarity import two_level_kmeans

    df = _mk_vecs(spark, 300)
    sup_cent, assign = two_level_kmeans(
        df, per_super_vec=75, per_cell=10, super_floor=4, cell_floor=2
    )
    rows = assign.collect()
    assert len(rows) == 300
    assert len({r["vec_id"] for r in rows}) == 300
    by_super = {}
    for r in rows:
        by_super.setdefault(r["super_cell"], []).append(r)
    assert len(by_super) >= 4
    import math

    for sc, members in by_super.items():
        n_s = len(members)
        cells = {m["cell"] for m in members}
        assert len(cells) <= min(n_s, max(2, math.ceil(n_s / 10)))
        # seed convention: every cell id is one of the super's members
        ids = {m["vec_id"] for m in members}
        assert cells <= ids
    # stage-1 broadcast table is k1 x d, not k x d
    k1 = sup_cent.select("cell").distinct().count()
    assert k1 < 300 // 10  # far fewer supers than cells
    again = {
        (r["vec_id"], r["super_cell"], r["cell"])
        for r in two_level_kmeans(
            df, per_super_vec=75, per_cell=10, super_floor=4, cell_floor=2
        )[1].collect()
    }
    assert again == {(r["vec_id"], r["super_cell"], r["cell"]) for r in rows}


def test_two_level_cells_distributed_table(spark):
    """two_level_cells returns the per-(super, cell) member-mean table
    keyed for a cogroup serve path — one row per (super_cell, cell,
    i), components covering the full dim range, and values equal to
    the members' componentwise mean under the final assignment."""
    from python_etl_pipeline_spark.llm.similarity import (
        two_level_cells,
        two_level_kmeans,
    )

    df = _mk_vecs(spark, 120, dim=3)
    _, assign = two_level_kmeans(
        df, per_super_vec=30, per_cell=10, super_floor=2, cell_floor=2
    )
    cells = two_level_cells(assign, df).collect()
    keys = {(r["super_cell"], r["cell"]) for r in cells}
    assert {r["i"] for r in cells} == {0, 1, 2}
    # spot-check one (cell, i) mean against a manual recompute
    a_rows = assign.collect()
    vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
    sc, c = next(iter(keys))
    members = [r["vec_id"] for r in a_rows if r["cell"] == c]
    want = sum(vecs[m][0] for m in members) / len(members)
    got = next(
        r["v"] for r in cells if r["cell"] == c and r["i"] == 0
    )
    assert abs(got - want) < 1e-9


def test_kmeans_default_k_is_derived(spark):
    """r14 verdict #6: a production caller who just says
    kmeans_fit(corpus) must get corpus-derived cells, never a fixed 4
    over an arbitrarily large corpus. 2600 vectors derive 6 cells
    under the default; at <= 2000 vectors the derived default IS 4,
    so small-corpus callers (and every fixed-seed gate oracle, which
    passes k explicitly) are unchanged."""
    from python_etl_pipeline_spark.llm.similarity import (
        kmeans_assign,
        kmeans_fit,
    )

    big = _mk_vecs(spark, 2600, dim=3)
    cent, assign = kmeans_fit(big)
    assert cent.select("cell").distinct().count() == 6
    assert assign.select("cell").distinct().count() <= 6
    small = _mk_vecs(spark, 400, dim=3)
    assert kmeans_assign(small).select("cell").distinct().count() <= 4
    fixed, _ = kmeans_fit(small, k=4)
    derived, _ = kmeans_fit(small)
    assert sorted(
        (r["cell"], r["i"], r["v"]) for r in fixed.collect()
    ) == sorted((r["cell"], r["i"], r["v"]) for r in derived.collect())


def test_two_level_index_roundtrip(spark, tmp_path):
    """build_two_level_index persists exactly the state the serve path
    needs: reading the three tables back and serving a delta equals
    the in-plan serve ann34 runs (train on base, two_level_cells under
    the final assignment, stage-1 super probe + stage-2 per-super
    cogroup). Also pins the drop semantics: every delta vector whose
    super holds cells is assigned; ids/supers/cells are int64."""
    from python_etl_pipeline_spark.llm.similarity import (
        build_two_level_index,
        read_two_level_index,
        two_level_cells,
        two_level_kmeans,
        two_level_serve_assign,
    )

    df = _mk_vecs(spark, 250, dim=3)
    base = df.filter(F.col("vec_id") % 5 != 4)
    delta = df.filter(F.col("vec_id") % 5 == 4)
    kw = dict(per_super_vec=50, per_cell=10, super_floor=2, cell_floor=2)
    out = str(tmp_path / "tl_index")
    build_two_level_index(base, out, **kw)
    sup_r, cells_r, assign_r = read_two_level_index(spark, out)
    served_stored = {
        (r["vec_id"], r["super_cell"], r["cell"])
        for r in two_level_serve_assign(delta, sup_r, cells_r).collect()
    }
    sup_c, assign_c = two_level_kmeans(base, **kw)
    cells_c = two_level_cells(assign_c, base)
    served_inplan = {
        (r["vec_id"], r["super_cell"], r["cell"])
        for r in two_level_serve_assign(delta, sup_c, cells_c).collect()
    }
    assert served_stored == served_inplan
    assert len(served_stored) == delta.count()  # no super lost its cells
    # the stored assignment covers the base corpus exactly
    assert assign_r.count() == base.count()
    # cells served must exist in the stored cell table
    stored_cells = {
        (r["super_cell"], r["cell"])
        for r in cells_r.select("super_cell", "cell").distinct().collect()
    }
    assert {(s, c) for _, s, c in served_stored} <= stored_cells


def test_partial_refresh_touches_only_flagged_supers(spark):
    """The partial-refresh contract that justifies the two-level tree
    at scale: after growing the index with a delta, supers NOT flagged
    by the drift report keep their stored (vec_id -> cell) assignment
    byte-for-byte, while flagged supers' grown members are re-trained
    locally (cells re-seeded from the grown set's smallest ids). Built
    on a corpus engineered so exactly one super drifts: the delta
    lands near one super's centroid."""
    import math

    from python_etl_pipeline_spark.llm.similarity import (
        _local_lloyd_assign,
        _nearest_cell_blas,
        ivf_cell_drift,
        two_level_cells,
        two_level_kmeans,
        two_level_serve_assign,
    )

    # base: two well-separated blobs (ids 0-99 near 0, 100-199 near 50)
    base = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.when(F.col("id") < 100, 0.0).otherwise(50.0)
             + (F.col("id") % 7).cast("double") / 10.0),
            ((F.col("id") % 5).cast("double") / 10.0),
        ).alias("embedding"),
    )
    # delta: 40 vectors all near the SECOND blob -> its super drifts
    delta = spark.range(1000, 1040).select(
        F.col("id").alias("vec_id"),
        F.array(
            F.lit(50.0) + (F.col("id") % 3).cast("double") / 10.0,
            (F.col("id") % 4).cast("double") / 10.0,
        ).alias("embedding"),
    )
    kw = dict(per_super_vec=100, per_cell=20, super_floor=2, cell_floor=2)
    sup_cent, assign = two_level_kmeans(base, **kw)
    assign = assign.localCheckpoint(eager=True)
    sup_cent = sup_cent.localCheckpoint(eager=True)
    cells = two_level_cells(assign, base).localCheckpoint(eager=True)
    d1 = _nearest_cell_blas(
        delta, "vec_id", "embedding", sup_cent
    ).withColumnRenamed("cell", "super_cell").localCheckpoint(eager=True)
    before = assign.select(F.col("super_cell").alias("cell"))
    after = before.unionAll(d1.select(F.col("super_cell").alias("cell")))
    drift = {
        r["cell"]: r["retrain"]
        for r in ivf_cell_drift(before, after, warn_ratio=1.02).collect()
    }
    flagged = {sc for sc, f in drift.items() if f}
    assert flagged and len(flagged) < len(drift)  # one arm each
    # the delta-heavy super is the flagged one
    d1_supers = {r["super_cell"] for r in d1.collect()}
    assert flagged <= d1_supers
    # re-run the refresh composition by hand and check both arms
    grown = assign.select("vec_id", "super_cell").unionAll(d1)
    all_vecs = base.unionAll(delta)
    gmembers = (
        grown.filter(F.col("super_cell").isin(*flagged))
        .join(all_vecs, "vec_id")
        .select("vec_id", "embedding", "super_cell")
    )
    retrained = _local_lloyd_assign(
        gmembers, "vec_id", "embedding",
        per_cell=20, cell_floor=2, iters=2,
    ).collect()
    base_map = {
        r["vec_id"]: (r["super_cell"], r["cell"]) for r in assign.collect()
    }
    # flagged-super members re-seed from the GROWN set: new cell ids
    # are grown-member ids of that super
    for r in retrained:
        assert r["super_cell"] in flagged
        gset = {
            g["vec_id"]
            for g in grown.filter(
                F.col("super_cell") == r["super_cell"]
            ).collect()
        }
        assert r["cell"] in gset
    # unflagged supers: the kept arm is literally the stored rows, so
    # there is nothing to re-derive — assert the split is a partition
    retr_ids = {r["vec_id"] for r in retrained}
    kept_ids = {
        v for v, (sc, _) in base_map.items() if sc not in flagged
    }
    assert retr_ids.isdisjoint(kept_ids)
    assert retr_ids | kept_ids >= set(base_map)  # every base vector


def test_derived_k_excludes_empty_arrays(spark):
    """r15 review: explode drops EMPTY arrays too, so the oracle's kk
    CTE never counts them — 2500 non-empty + 300 empty-array ids must
    derive k=5 (ceil(2500/500)), not 6."""
    nonempty = spark.range(2500).select(
        F.col("id").alias("vec_id"),
        F.array((F.col("id") % 9).cast("double")).alias("embedding"),
    )
    empty = spark.range(2500, 2800).select(
        F.col("id").alias("vec_id"),
        F.array().cast("array<double>").alias("embedding"),
    )
    init = derived_k_init(nonempty.unionAll(empty), "vec_id", "embedding")
    assert init.select("cell").distinct().count() == 5


def test_blocked_exact_argmin_matches_naive_cube():
    """_np_exact_argmin_blocked == the full-cube argmin it replaced,
    including cross-block tie-breaks to the smallest index, on shapes
    that straddle the 256-row/256-centroid block edges."""
    from python_etl_pipeline_spark.llm.similarity import (
        _np_argmin_sq_l2,
        _np_exact_argmin_blocked,
    )

    rng = np.random.RandomState(11)
    C = rng.rand(600, 5)
    C[300] = C[10]  # exact duplicate centroid across block boundary
    R = rng.rand(700, 5)
    R[5] = C[10]  # exact member of the duplicated pair
    naive = ((R[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    assert (_np_exact_argmin_blocked(R, C) == naive).all()
    # the identity+re-score scan agrees too (ties resolved exactly)
    assert (_np_argmin_sq_l2(R, C) == naive).all()
    assert _np_exact_argmin_blocked(R, C)[5] == 10  # smallest of the pair


def _write_embeddings(spark, tmp_path, rows):
    """rows: [(vec_id, [floats...])] -> <tmp>/embeddings.parquet."""
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    df.coalesce(2).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_ann28_gemm_covariance_matches_numpy(spark, tmp_path):
    """The ann28 raw-moment gemm kernel must reproduce the centered
    covariance power iteration exactly: run the full query over a
    synthetic corpus and replay the spec in numpy (center, cov =
    Xc.T@Xc/(n-1), three normalized matvecs from the uniform start,
    Rayleigh quotient, trace, |cos(u2,u3)|), comparing every rounded
    output. Covers the identity cov = (Sxx - Sx Sx^T/cnt)/(n-1) and
    the sentinel-row decode."""
    from python_etl_pipeline_spark.queries import REGISTRY

    rng = np.random.RandomState(7)
    X = rng.rand(50, 4) * 2.0 - 0.5
    sf_dir = _write_embeddings(
        spark, tmp_path, [(i, [float(v) for v in X[i]]) for i in range(50)]
    )
    row = REGISTRY["ann28_top_eigen"].spark(spark, sf_dir).first()

    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / (len(X) - 1)
    u = np.full(4, 1.0 / 2.0)  # 1/sqrt(dims)
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


def test_ann28_kernel_contracts_are_loud(spark, tmp_path):
    """Kernel driven DIRECTLY on hand-built Arrow batches (no Spark
    job, so no multi-task error-propagation races): ragged embedding
    widths and null elements must raise (the old exploded join would
    silently compute over co-present components / skip nulls), the
    sentinel decode must carry exact raw moments across batches, and
    duplicate vec_id rows must raise on the driver (the old self-join
    would silently cross-pair them)."""
    import pyarrow as pa

    from python_etl_pipeline_spark.queries import REGISTRY
    from python_etl_pipeline_spark.queries.ann import _ann28_cov_partials

    def batch(rows):
        return pa.RecordBatch.from_arrays(
            [pa.array(rows, type=pa.list_(pa.float64()))], names=["e"]
        )

    with pytest.raises(ValueError, match="ragged embedding widths"):
        list(_ann28_cov_partials([batch([[1.0, 2.0], [1.0, 2.0, 3.0]])]))
    with pytest.raises(ValueError, match="null embedding element"):
        list(_ann28_cov_partials([batch([[1.0, 2.0], None])]))
    with pytest.raises(ValueError, match="null embedding element"):
        list(_ann28_cov_partials([batch([[1.0, None]])]))

    # happy path: sentinel rows decode to exact raw moments, summed
    # across batches, with empty batches skipped
    X = np.array([[1.0, 2.0], [3.0, 5.0], [4.0, -1.0]])
    (out,) = _ann28_cov_partials(
        [batch([list(X[0])]), batch([]), batch([list(r) for r in X[1:]])]
    )
    got = {
        (i, j): s
        for i, j, s in zip(*(out.column(c).to_pylist() for c in range(3)))
    }
    assert got[(0, 0)] == 3.0  # count
    assert got[(1, 0)] == X[:, 0].sum() and got[(2, 0)] == X[:, 1].sum()
    for i in range(2):
        for j in range(2):
            assert got[(i + 1, j + 1)] == pytest.approx(
                float(X[:, i] @ X[:, j]), rel=1e-12
            )

    dup = _write_embeddings(
        spark,
        tmp_path / "dup",
        [(i % 20, [float(i), 1.0]) for i in range(40)],
    )
    with pytest.raises(ValueError, match="duplicate vec_id"):
        REGISTRY["ann28_top_eigen"].spark(spark, dup)
