"""Round-15 operator semantics beyond the oracle hash: the sampled
estimator-error certificate (dd26)."""

from __future__ import annotations

import math

import pytest

from python_etl_pipeline_spark.queries import REGISTRY


def test_dd26_sample_is_exhaustive_at_gate_scale(spark, sf_dir):
    """The derived sampling rate m = ceil(n_pairs/200) targets ~200
    sampled pairs at ANY corpus size. At gate scale that pins two
    contracts at once: (1) the bound algebra — mae_bound95 is exactly
    the Hoeffding 95% half-width sqrt(ln 40 / 2n) of the sampled
    count; (2) the degenerate-safe sample — when n_pairs <= 200 the
    hash filter with m=1 keeps EVERY pair, so dd26's error statistics
    equal dd17's exhaustive ones identically (the production twin
    collapses to the contract it replaces when sampling is free)."""
    d26 = REGISTRY["dd26_sampled_estimator_error"].spark(spark, sf_dir)
    row = d26.collect()[0]
    assert 1 <= row["n_sampled"] <= row["n_pairs"]
    assert row["mae_bound95"] == pytest.approx(
        round(math.sqrt(math.log(40.0) / (2 * row["n_sampled"])), 4),
        abs=1e-9,
    )
    assert row["bias"] <= row["mae"] <= row["max_abs_err"] <= 1.0
    if row["n_pairs"] <= 200:
        assert row["n_sampled"] == row["n_pairs"]
        full = REGISTRY["dd17_minhash_estimator_error"].spark(
            spark, sf_dir
        ).collect()[0]
        assert row["n_pairs"] == full["n_pairs"]
        assert row["mae"] == full["mae"]
        assert row["max_abs_err"] == full["max_abs_err"]
        assert row["bias"] == full["bias"]
    else:
        # derived-rate arithmetic: m = ceil(n_pairs/200); the hash is
        # uniform-ish, so the kept count sits within a wide binomial
        # band of n_pairs/m (the exact set is pinned by the oracle)
        m = math.ceil(row["n_pairs"] / 200.0)
        expect = row["n_pairs"] / m
        assert row["n_sampled"] <= 6 * expect


def test_ann35_members_come_from_probed_cells(spark, sf_dir):
    """Tree-search contract: the top-k rows are (1) exactly 10, sorted
    by (4-dp cosine desc, id), never containing the query itself;
    (2) every hit belongs to one of the probed cells of the CACHED
    index (search never touches an unprobed cell's members); (3) the
    probed supers include the query's own super (the probe uses the
    training metric, so probe #1 is the query's assigned super)."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.queries.ann import (
        _cached_two_level_index,
    )
    from python_etl_pipeline_spark.queries import _t

    rows = REGISTRY["ann35_two_level_topk"].spark(spark, sf_dir).collect()
    assert len(rows) == 10
    assert 0 not in {r["vec_id"] for r in rows}
    coss = [r["cosine"] for r in rows]
    assert coss == sorted(coss, reverse=True)
    emb = _t(spark, sf_dir, "embeddings")
    _, _, assign = _cached_two_level_index(spark, sf_dir, emb)
    amap = {
        r["vec_id"]: (r["super_cell"], r["cell"]) for r in assign.collect()
    }
    q_super = amap[0][0]
    hit_supers = {amap[r["vec_id"]][0] for r in rows}
    assert q_super in hit_supers or len(hit_supers) <= 2
    # at most 3 distinct cells can supply hits (the cell probe width)
    assert len({amap[r["vec_id"]][1] for r in rows}) <= 3
