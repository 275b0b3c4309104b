"""Semantics tests (beyond the driver hash) for the round-14 ops:

* ann31_index_build_stats — the per-cell report must agree row-for-row
  with ann4's independently-trained k-means summary at gate scale
  (same derived k, same deterministic init => same cells), members
  must cover the whole corpus exactly once, and the quantization
  error must be a real mean of squared distances (non-negative,
  finite).
* tx33_zipf_slope — the OLS fit is verified against an independent
  numpy reimplementation on the gate fixture (same tokenization, same
  rank tie-break), and natural-ish corpora must fit a negative slope.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from python_etl_pipeline_spark.queries import REGISTRY


def test_ann31_agrees_with_ann4_at_gate_scale(spark, sf_dir):
    """At gate SFs the derived k is 4 — ann31's persisted-index build
    and ann4's in-plan trainer run the identical deterministic Lloyd
    recipe, so cells, member counts, and centroid norms must match
    row-for-row (stored == retrained, ann11's contract, checked
    across two independent code paths)."""
    stats = {
        r["cell"]: r
        for r in REGISTRY["ann31_index_build_stats"].spark(spark, sf_dir).collect()
    }
    ann4 = {
        r["cell"]: r
        for r in REGISTRY["ann4_kmeans_train"].spark(spark, sf_dir).collect()
    }
    assert set(stats) == set(ann4)
    for cell, r in stats.items():
        assert r["n_members"] == ann4[cell]["n_members"]
        assert r["centroid_norm"] == pytest.approx(
            ann4[cell]["centroid_norm"], abs=1e-4
        )


def test_ann31_members_partition_the_corpus(spark, sf_dir):
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = REGISTRY["ann31_index_build_stats"].spark(spark, sf_dir).collect()
    assert sum(r["n_members"] for r in rows) == emb_n
    assert all(
        r["avg_sq_dist"] >= 0 and math.isfinite(r["avg_sq_dist"]) for r in rows
    )
    assert all(r["n_members"] > 0 for r in rows)


def test_tx33_matches_numpy_ols_on_fixture(spark, sf_dir):
    """Independent reimplementation: tokenize (whitespace split of
    trimmed text), count per (source, token), rank by (freq desc,
    token asc), OLS of ln(freq) on ln(rank) over the top-100 ranks —
    numpy's polyfit must agree with the engine's covar_pop/var_pop
    form to the emitted 4 dp."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    freqs: dict[str, dict[str, int]] = {}
    for r in docs:
        toks = r["text"].strip().split()
        f = freqs.setdefault(r["source"], {})
        for t in toks:
            f[t] = f.get(t, 0) + 1
    got = {
        r["source"]: r
        for r in REGISTRY["tx33_zipf_slope"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(freqs)
    for source, f in freqs.items():
        head = sorted(f.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        lx = np.log(np.arange(1, len(head) + 1))
        ly = np.log(np.array([c for _, c in head], dtype=np.float64))
        slope = np.polyfit(lx, ly, 1)[0]
        assert got[source]["zipf_slope"] == pytest.approx(slope, abs=2e-4)
        assert got[source]["n_types"] == len(f)
        assert got[source]["n_tokens"] == sum(f.values())
        # a token corpus has a decaying frequency head
        assert got[source]["zipf_slope"] < 0
