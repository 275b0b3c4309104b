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


def test_ann32_matches_numpy_distortion_from_stored_index(spark, sf_dir):
    """Independent reimplementation: read the SAME cached index tables
    the query serves from, reconstruct each vector's codewords in
    numpy, and recompute per-(subspace, code) counts and mean squared
    residuals — the engine's join/agg form must agree to the emitted
    4 dp."""
    import numpy as np

    from python_etl_pipeline_spark.queries.ann import _cached_ivfpq_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _cent, _assign, codes, ca, cb = _cached_ivfpq_index(spark, sf_dir, emb)
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    got = {
        (r["subspace"], r["code"]): (r["n_vectors"], r["mse"])
        for r in REGISTRY["ann32_pq_distortion"].spark(spark, sf_dir).collect()
    }
    code_rows = codes.collect()
    for label, code_col, cent_df in (("a", "code0", ca), ("b", "code1", cb)):
        cw: dict[int, dict[int, float]] = {}
        for r in cent_df.collect():
            cw.setdefault(r["cell"], {})[r["i"]] = r["v"]
        agg: dict[int, list[float]] = {}
        for r in code_rows:
            c = r[code_col]
            v = vecs[r["vec_id"]]
            sqe = sum(
                (v[i] - cv) ** 2 for i, cv in cw[c].items()
            )
            agg.setdefault(c, []).append(sqe)
        for c, errs in agg.items():
            n, mse = got[(label, c)]
            assert n == len(errs)
            assert mse == pytest.approx(sum(errs) / len(errs), abs=2e-4)
    # every corpus vector is coded exactly once per subspace
    for label in ("a", "b"):
        assert sum(n for (s, _), (n, _) in got.items() if s == label) == len(
            vecs
        )


def test_dd25_counts_and_rate_algebra(spark, sf_dir):
    """Per-source doc counts partition the corpus; the dup set equals
    the distinct endpoints of the shared LSH pair graph; the rate is
    exactly n_dup/n to 6 dp."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = REGISTRY["dd25_source_dup_rate"].spark(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", max_bucket_size=100)
    dup_ids = {
        r["doc_id"]
        for r in pairs.select(F.col("a").alias("doc_id"))
        .union(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
        .collect()
    }
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    from collections import Counter

    want_dup = Counter(src[d] for d in dup_ids)
    for r in rows:
        assert r["n_dup_docs"] == want_dup.get(r["source"], 0)
        assert r["n_dup_docs"] <= r["n_docs"]
        assert r["dup_rate"] == pytest.approx(
            round(r["n_dup_docs"] / r["n_docs"], 6), abs=1e-9
        )
