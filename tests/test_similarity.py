"""cosine_pairs: bucketed LSH path recalls planted near-dups, excludes
zero-norm vectors, and the all-pairs escape hatch matches brute force."""

from __future__ import annotations

import random

import numpy as np

from python_etl_pipeline_spark.llm.similarity import cosine_pairs

DIM = 32


def _corpus(spark, with_zero=False):
    """20 deterministic random vectors + 5 planted near-dups of the
    first 5 (tiny perturbation -> cosine ~0.999)."""
    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(20)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for j in range(5):
        noisy = [x + rng.gauss(0, 0.01) for x in base[j]]
        rows.append((100 + j, [float(x) for x in noisy]))
    if with_zero:
        rows.append((999, [0.0] * DIM))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_bucketed_path_recalls_planted_neardups(spark):
    out = {
        (r["a"], r["b"]): r["cosine"]
        for r in cosine_pairs(_corpus(spark), min_sim=0.9).collect()
    }
    for j in range(5):
        assert (j, 100 + j) in out, f"planted near-dup {j} missed"
        assert out[(j, 100 + j)] > 0.99


def test_zero_norm_vectors_excluded(spark):
    rows = cosine_pairs(_corpus(spark, with_zero=True), min_sim=-1.0,
                        allow_all_pairs=True).collect()
    assert all(r["a"] != 999 and r["b"] != 999 for r in rows)
    assert all(not np.isnan(r["cosine"]) for r in rows)


def test_allpairs_matches_bruteforce(spark):
    df = _corpus(spark)
    out = cosine_pairs(df, min_sim=0.5, allow_all_pairs=True).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in df.collect()}
    ids = sorted(vecs)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            va, vb = vecs[a], vecs[b]
            c = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
            if c >= 0.5:
                expected.add((a, b))
    assert {(r["a"], r["b"]) for r in out} == expected
    # the bucketed path returns a subset of the exact pair set
    bucketed = {(r["a"], r["b"]) for r in cosine_pairs(df, min_sim=0.5).collect()}
    assert bucketed <= expected


def test_semantic_dedup_drops_planted_dups_and_caps_cells(spark):
    """semantic_dedup keeps the min id of each planted near-dup pair and
    marks the copy dropped; with max_cell_size below any cell's
    population every vector passes through unscored (all kept)."""
    from python_etl_pipeline_spark.llm.similarity import semantic_dedup

    df = _corpus(spark)
    out = {r["vec_id"]: r["is_kept"] for r in semantic_dedup(
        df, k=4, iters=1, min_sim=0.99
    ).collect()}
    assert len(out) == 25
    for j in range(5):
        assert out[j] is True, "original (lower id) kept"
        assert out[100 + j] is False, "planted near-dup dropped"
    capped = semantic_dedup(df, k=4, iters=1, min_sim=0.99, max_cell_size=1)
    assert all(r["is_kept"] for r in capped.collect()), \
        "oversized cells pass through unscored"


def test_ngram_containment_asymmetry(spark):
    """A short doc fully embedded in a long one: containment 1.0 in the
    short->long direction, low Jaccard — the case dd3 misses."""
    from python_etl_pipeline_spark.llm.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"word{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id bigint, text string"
    )
    rows = ngram_containment_pairs(df, "text", "doc_id", 0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"]) == (1, 2)
    assert r["c_ab"] == 1.0        # every shingle of the short doc is in the long
    assert r["c_ba"] < 0.15        # the long doc is mostly its own content
    assert ngram_jaccard_pairs(df, "text", "doc_id", 0.5).count() == 0


def test_lsh_params_for_solves_the_collision_formula():
    """(n_planes, bands) from min_sim: recall >= target at the
    threshold, planes within budget, n_planes divisible by bands."""
    import math

    from python_etl_pipeline_spark.llm.similarity import lsh_params_for

    for min_sim in (0.25, 0.5, 0.9):
        n_planes, bands = lsh_params_for(min_sim, target_recall=0.9)
        r = n_planes // bands
        assert n_planes % bands == 0 and n_planes <= 64
        p = 1.0 - math.acos(min_sim) / math.pi
        recall = 1.0 - (1.0 - p**r) ** bands
        assert recall >= 0.9
    # the dd5 docstring case: default 4x4 is ~39% at 0.25; the preset
    # must solve it with 3-bit bands
    assert lsh_params_for(0.25) == (33, 11)


def test_high_recall_preset_reaches_90pct_at_low_threshold(spark):
    """Empirical recall of preset='high_recall' vs the exact all-pairs
    ground truth at min_sim=0.25 — the regime where the default 4x4
    layout sits at ~39% by the collision formula. Deterministic: the
    hyperplanes are md5-derived constants and the fixture is seeded."""
    rng = random.Random(11)
    rows = [
        (i, [float(rng.gauss(0, 1)) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    truth = {
        (r["a"], r["b"])
        for r in cosine_pairs(df, min_sim=0.25, allow_all_pairs=True).collect()
    }
    got = {
        (r["a"], r["b"])
        for r in cosine_pairs(df, min_sim=0.25, preset="high_recall").collect()
    }
    assert len(truth) > 50  # the fixture actually exercises the regime
    assert got <= truth  # exact rescoring: no false positives ever
    assert len(got & truth) / len(truth) >= 0.9


def test_ivf_recall_contract_at_gate_scale(spark):
    """ann6's stated bound: single-probe IVF (nprobe=1, 8 cells) keeps
    recall@10 >= 0.5 vs exact brute force at gate scale. Measured 0.9 at
    sf0.001 and sf0.01 — the bound leaves margin for fixture drift."""
    from python_etl_pipeline_spark.queries import REGISTRY

    row = REGISTRY["ann6_recall_at_k"].spark(spark, "/root/testdata/sf0.001").first()
    assert row["recall_at_k"] >= 0.5


def test_multiprobe_recall_dominates_single_probe(spark):
    """ann7's contract: searching the query's 2 nearest cells recovers
    at least every true neighbor the 1-probe search finds (the extra
    probe only ADDS candidates; exact rescoring then can only improve
    the intersection with ground truth)."""
    from python_etl_pipeline_spark.llm.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    truth = {r["vec_id"] for r in brute_force_topk(emb, 0, k=10).collect()}
    one = {r["vec_id"] for r in ivf_topk(emb, 0, k=10, nprobe=1).collect()}
    two = {r["vec_id"] for r in ivf_topk(emb, 0, k=10, nprobe=2).collect()}
    assert len(two & truth) >= len(one & truth)


def test_embedding_moments_match_numpy(spark):
    """ann8's distributed covariance equals numpy's population
    covariance on a small fixture (upper triangle, 0-based dims)."""
    import numpy as np
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.similarity import _components

    rng = random.Random(3)
    vecs = [[rng.gauss(0, 1) for _ in range(4)] for _ in range(50)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    comp = _components(df, "vec_id", "embedding")
    a = comp.select("vec_id", F.col("i").alias("ia"), F.col("v").alias("va"))
    b = comp.select("vec_id", F.col("i").alias("jb"), F.col("v").alias("vb"))
    stats = (
        a.join(b, "vec_id").filter(F.col("ia") <= F.col("jb"))
        .groupBy("ia", "jb")
        .agg(F.count("*").alias("n"), F.sum(F.col("va") * F.col("vb")).alias("sxy"),
             F.sum("va").alias("sx"), F.sum("vb").alias("sy"))
        .select("ia", "jb",
                (F.col("sxy") / F.col("n")
                 - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))).alias("cov"))
    )
    got = {(r["ia"], r["jb"]): r["cov"] for r in stats.collect()}
    m = np.array([np.asarray(v, dtype=np.float32) for v in vecs], dtype=np.float64)
    want = np.cov(m, rowvar=False, bias=True)
    for (i, j), c in got.items():
        assert abs(c - want[i][j]) < 1e-9


def test_pq_rerank_recall_beats_raw_pq(spark):
    """ann9's contract: the PQ-shortlist + exact-rerank pipeline
    recovers most of the exact top-10 (>= 0.5 here; measured 0.8),
    and strictly dominates ranking by raw quantized scores on the
    same code budget."""
    from python_etl_pipeline_spark.llm.similarity import (
        brute_force_topk, pq_rerank_topk, pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    truth = {r["vec_id"] for r in brute_force_topk(emb, 0, k=10).collect()}
    raw = {r["vec_id"] for r in pq_topk(emb, 0, k=10, n_codes=16).collect()}
    rr = {r["vec_id"] for r in pq_rerank_topk(emb, 0, k=10, n_codes=16).collect()}
    assert len(rr & truth) >= 5
    assert len(rr & truth) >= len(raw & truth)


def test_pq_index_persist_and_query_roundtrip(spark, sf_dir, tmp_path):
    """PQ build-once / query-many: pq_train's (codes, cent_a, cent_b)
    written to parquet and read back must score queries identically to
    the inline-training path (pq_approx_scores), for MULTIPLE query ids
    against the SAME stored index — the Lloyd iterations never re-run
    per query."""
    from python_etl_pipeline_spark.llm.similarity import (
        pq_approx_scores,
        pq_scores_from_index,
        pq_train,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes, ca, cb = pq_train(emb, n_codes=16)
    codes.write.parquet(str(tmp_path / "codes"))
    ca.write.parquet(str(tmp_path / "ca"))
    cb.write.parquet(str(tmp_path / "cb"))
    codes2 = spark.read.parquet(str(tmp_path / "codes"))
    ca2 = spark.read.parquet(str(tmp_path / "ca"))
    cb2 = spark.read.parquet(str(tmp_path / "cb"))

    for qid in (0, 7):
        inline = {
            r["vec_id"]: r["approx_cosine"]
            for r in pq_approx_scores(emb, qid, n_codes=16).collect()
        }
        stored = {
            r["vec_id"]: r["approx_cosine"]
            for r in pq_scores_from_index(emb, codes2, ca2, cb2, qid).collect()
        }
        assert stored == inline and qid not in stored
        assert len(stored) == emb.count() - 1


def test_ivf_index_persist_and_query_roundtrip(spark, sf_dir, tmp_path):
    """Build-once / query-many: kmeans_fit's (centroids, assignment)
    written to parquet and read back must answer queries identically to
    the in-memory index, and the candidate set must come only from the
    probed cells."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.similarity import (
        ivf_query_from_index,
        kmeans_fit,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent, assign = kmeans_fit(emb, k=4, iters=2)
    cent.write.parquet(str(tmp_path / "cent"))
    assign.write.parquet(str(tmp_path / "assign"))

    cent2 = spark.read.parquet(str(tmp_path / "cent"))
    assign2 = spark.read.parquet(str(tmp_path / "assign"))

    qid = 7
    mem = ivf_query_from_index(emb, cent, assign, qid, k=5, nprobe=2)
    stored = ivf_query_from_index(emb, cent2, assign2, qid, k=5, nprobe=2)
    m = [(r["vec_id"], round(r["cosine"], 9)) for r in mem.collect()]
    s = [(r["vec_id"], round(r["cosine"], 9)) for r in stored.collect()]
    assert m == s and len(s) == 5
    # results are ordered by cosine desc and come from the probed cells
    cos = [c for _, c in s]
    assert cos == sorted(cos, reverse=True)
    probed = {
        r["cell"]
        for r in assign2.filter(F.col("vec_id").isin([i for i, _ in s]))
        .select("cell")
        .distinct()
        .collect()
    }
    assert len(probed) <= 2

    # ground truth, not self-comparison: probing EVERY cell must equal
    # exact brute-force top-k over the whole corpus — any systematic
    # defect in the probe/rerank path (e.g. a probe metric that skips
    # the query's own cell) breaks this, where the stored-vs-in-memory
    # equality above cannot
    from python_etl_pipeline_spark.llm.similarity import brute_force_topk

    full = ivf_query_from_index(emb, cent2, assign2, qid, k=5, nprobe=4)
    exact = brute_force_topk(emb, qid, k=5)
    f = [(r["vec_id"], round(r["cosine"], 9)) for r in full.collect()]
    e = [(r["vec_id"], round(r["cosine"], 9)) for r in exact.collect()]
    assert f == e

    # and with nprobe=1 the query's own cell must be the probed one
    own = ivf_query_from_index(emb, cent2, assign2, qid, k=5, nprobe=1)
    own_ids = [r["vec_id"] for r in own.collect()]
    q_cell = assign2.filter(F.col("vec_id") == qid).first()["cell"]
    member_cells = {
        r["cell"]
        for r in assign2.filter(F.col("vec_id").isin(own_ids)).collect()
    }
    assert member_cells == {q_cell}


def test_ivfpq_index_build_query_matches_inplan(spark, sf_dir, tmp_path):
    """The persisted IVF-PQ index (build_ivfpq_index -> parquet ->
    read_ivfpq_index) must serve queries; with nprobe = every cell the
    serve path must equal exact brute force over the whole corpus up to
    the PQ shortlist boundary — here shortlist = corpus size, so the
    rerank sees every candidate and the result IS the exact top-k.
    Multiple query ids against the SAME stored index: no retraining."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.similarity import (
        brute_force_topk,
        build_ivfpq_index,
        ivfpq_query_from_index,
        read_ivfpq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    build_ivfpq_index(emb, str(tmp_path / "idx"), coarse_k=4, n_codes=16)
    idx = read_ivfpq_index(spark, str(tmp_path / "idx"))
    for qid in (0, 7):
        got = ivfpq_query_from_index(
            emb, *idx, query_id=qid, k=5, shortlist=n, nprobe=4
        )
        exact = brute_force_topk(emb, qid, k=5)
        g = [(r["vec_id"], r["cosine"]) for r in got.collect()]
        e = [(r["vec_id"], r["cosine"]) for r in exact.collect()]
        assert g == e and len(g) == 5
    # restricted probe: candidates come only from the probed cells
    got1 = ivfpq_query_from_index(
        emb, *idx, query_id=0, k=5, shortlist=n, nprobe=1
    )
    ids = [r["vec_id"] for r in got1.collect()]
    assign = idx[1]
    q_cell = assign.filter(F.col("vec_id") == 0).first()["cell"]
    cells = {
        r["cell"] for r in assign.filter(F.col("vec_id").isin(ids)).collect()
    }
    assert cells == {q_cell}


def test_ivf_incremental_assign_equals_full_reassign(spark):
    """ann12's contract on controlled data: assigning only the delta to
    frozen centroids equals re-assigning the whole corpus and
    restricting to the delta."""
    import random

    from python_etl_pipeline_spark.llm.similarity import (
        ivf_incremental_assign,
        kmeans_fit,
    )

    rng = random.Random(11)
    rows = [
        (i, [float(rng.gauss(0, 1)) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    base = df.filter("vec_id % 5 <> 4")
    delta = df.filter("vec_id % 5 = 4")
    cent, _ = kmeans_fit(base, k=4, iters=2)
    inc = {
        (r["vec_id"], r["cell"])
        for r in ivf_incremental_assign(delta, cent).collect()
    }
    full = {
        (r["vec_id"], r["cell"])
        for r in ivf_incremental_assign(df, cent).collect()
        if r["vec_id"] % 5 == 4
    }
    assert inc == full and len(inc) == 12


def test_ivf_cell_drift_flags_skewed_growth(spark):
    """The drift report: a cell whose corpus share more than doubles
    (or that was empty at build time) flags retrain=True; balanced
    growth flags nothing."""
    from python_etl_pipeline_spark.llm.similarity import ivf_cell_drift

    before = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "vec_id bigint, cell bigint"
    )
    # balanced growth: every cell gains 5 -> shares unchanged
    balanced = before.unionByName(
        spark.createDataFrame(
            [(100 + i, i % 4) for i in range(20)], "vec_id bigint, cell bigint"
        )
    )
    rep = {r["cell"]: r for r in ivf_cell_drift(before, balanced).collect()}
    assert not any(r["retrain"] for r in rep.values())
    assert rep[0]["n_before"] == 10 and rep[0]["n_after"] == 15
    # skewed growth: 60 new vectors all land in cell 0 -> share 0.25 -> 0.7
    skewed = before.unionByName(
        spark.createDataFrame(
            [(200 + i, 0) for i in range(60)], "vec_id bigint, cell bigint"
        )
    )
    rep = {r["cell"]: r for r in ivf_cell_drift(before, skewed).collect()}
    assert rep[0]["retrain"] and not rep[1]["retrain"]


def test_query_from_incrementally_grown_index_matches_rebuild(spark, tmp_path):
    """The full incremental-maintenance loop: build an IVF index on the
    base corpus, fold a delta in with ivf_incremental_assign (append to
    the stored assignment, centroids frozen), and serve a query from
    the grown index — the result must equal serving from an assignment
    re-computed over the full corpus against the same centroids."""
    import random

    from python_etl_pipeline_spark.llm.similarity import (
        ivf_incremental_assign,
        ivf_query_from_index,
        kmeans_fit,
    )

    rng = random.Random(23)
    rows = [
        (i, [float(rng.gauss(0, 1)) for _ in range(8)]) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    base = df.filter("vec_id % 4 <> 3")
    delta = df.filter("vec_id % 4 = 3")

    cent, assign_base = kmeans_fit(base, k=4, iters=2)
    cent.write.parquet(str(tmp_path / "cent"))
    assign_base.write.parquet(str(tmp_path / "assign"))
    cent2 = spark.read.parquet(str(tmp_path / "cent"))

    # incremental growth: delta assigned to the FROZEN stored centroids,
    # appended to the stored assignment table
    ivf_incremental_assign(delta, cent2).write.mode("append").parquet(
        str(tmp_path / "assign")
    )
    grown = spark.read.parquet(str(tmp_path / "assign"))
    assert grown.count() == 80

    rebuilt = ivf_incremental_assign(df, cent2)  # full re-assign, same centroids
    for qid in (0, 3):
        g = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in ivf_query_from_index(
                df, cent2, grown, qid, k=5, nprobe=2
            ).collect()
        ]
        rb = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in ivf_query_from_index(
                df, cent2, rebuilt, qid, k=5, nprobe=2
            ).collect()
        ]
        assert g == rb and len(g) == 5


def test_batch_ivf_serve_matches_single_query_path(spark, sf_dir):
    """ann14's contract: the batched serve's per-query slices must
    equal the single-query serve path (same index, same nprobe) for
    every query in the batch."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.similarity import (
        ivf_batch_query_from_index,
        ivf_query_from_index,
        kmeans_fit,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent, assign = kmeans_fit(emb, k=4, iters=2)
    qids = [0, 1, 2]
    batch = ivf_batch_query_from_index(
        emb, cent, assign, qids, k=5, nprobe=2
    ).collect()
    for qid in qids:
        got = sorted(
            (r["vec_id"], r["cosine"]) for r in batch if r["query_id"] == qid
        )
        want = sorted(
            (r["vec_id"], r["cosine"])
            for r in ivf_query_from_index(
                emb, cent, assign, qid, k=5, nprobe=2
            ).collect()
        )
        assert got == want and len(got) == 5, qid


def test_filtered_serve_prefilters_at_candidate_generation(spark, sf_dir):
    """ann15's contract: the metadata filter lands BEFORE the rerank
    (member-set semi-join), so a selective predicate still yields a
    full k — while post-filtering the unfiltered top-k (the naive
    composition) returns fewer. Every result must satisfy the
    predicate and keep the (cosine desc, id) order."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.similarity import (
        ivf_filtered_query_from_index,
        ivf_query_from_index,
        kmeans_fit,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent, assign = kmeans_fit(emb, k=4, iters=2)
    allowed = emb.filter(F.col("label") == 3).select("vec_id")
    allowed_ids = {r["vec_id"] for r in allowed.collect()}
    k = 10

    rows = ivf_filtered_query_from_index(
        emb, cent, assign, allowed, query_id=0, k=k, nprobe=2
    ).collect()
    assert len(rows) == k
    assert all(r["vec_id"] in allowed_ids for r in rows)
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)

    post = [
        r
        for r in ivf_query_from_index(
            emb, cent, assign, query_id=0, k=k, nprobe=2
        ).collect()
        if r["vec_id"] in allowed_ids
    ]
    assert len(post) < k  # the naive post-filter under-fills


def test_centroid_refresh_descends_and_keeps_cell_identity(spark, sf_dir):
    """ann16's contract: a warm-start Lloyd iteration over the grown
    corpus (init = the base-trained centroids) never increases the
    corpus's within-cell squared error versus serving the frozen
    centroids, and it never re-seeds — refreshed cell ids are a subset
    of the stored ones, so stored assignment/code tables stay joinable
    on cell across refreshes."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.similarity import (
        _components,
        _nearest_cell,
        kmeans_fit,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    stored, _ = kmeans_fit(base, k=4, iters=2)
    refreshed, _ = kmeans_fit(emb, iters=1, init=stored)

    comp = _components(emb, "vec_id", "embedding")

    def sse(cent):
        asg = _nearest_cell(comp, cent, "vec_id")
        c = cent.select("cell", "i", F.col("v").alias("cv"))
        return (
            comp.join(asg, "vec_id")
            .join(c, ["cell", "i"])
            .agg(F.sum((F.col("v") - F.col("cv")) ** 2).alias("s"))
            .collect()[0]["s"]
        )

    frozen_sse = sse(stored)
    refreshed_sse = sse(refreshed)
    assert refreshed_sse <= frozen_sse * (1 + 1e-9)

    stored_cells = {r["cell"] for r in stored.select("cell").distinct().collect()}
    refreshed_cells = {
        r["cell"] for r in refreshed.select("cell").distinct().collect()
    }
    assert refreshed_cells <= stored_cells


def test_filtered_recall_contract_at_gate_scale(spark, sf_dir):
    """ann17's floor: pre-filtered IVF serve (nprobe=2 of 4 cells)
    keeps recall@10 >= 0.5 against the exact filtered ground truth at
    gate scale (it rises with corpus size: 0.7 at sf0.01, 0.9 at
    sf0.1 — denser cells cover more of the eligible neighborhood)."""
    from python_etl_pipeline_spark.queries import REGISTRY

    row = REGISTRY["ann17_filtered_recall"].spark(spark, sf_dir).collect()[0]
    assert row["k"] == 10
    assert row["recall_at_k"] >= 0.5


def test_ivfpq_delete_then_compact_equivalence(spark, sf_dir, tmp_path):
    """The delete-maintenance contract behind ann18: (1) tombstoned
    vectors vanish from the served top-k; (2) PHYSICAL compaction
    (rewrite-minus-tombstones + atomic swap) serves the identical
    answer the logical tombstone view served; (3) the compacted tables
    really shrank by exactly the tombstone count."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.similarity import (
        build_ivfpq_index,
        compact_ivfpq_index,
        ivfpq_delete_tombstones,
        ivfpq_query_from_index,
        read_ivfpq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx_dir = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, idx_dir, coarse_k=4, coarse_iters=2, n_codes=16)
    cent, assign, codes, ca, cb = read_ivfpq_index(spark, idx_dir)
    n_assign = assign.count()
    n_codes_rows = codes.count()

    tomb = emb.filter(F.col("vec_id") % 9 == 1).select("vec_id")
    n_tomb = tomb.count()
    assert n_tomb > 0

    assign_r, codes_r = ivfpq_delete_tombstones(assign, codes, tomb)
    emb_r = emb.join(tomb, "vec_id", "left_anti")
    served_tomb = ivfpq_query_from_index(
        emb_r, cent, assign_r, codes_r, ca, cb, query_id=0, k=10, nprobe=2
    ).collect()
    got = {r["vec_id"] for r in served_tomb}
    assert got and all(v % 9 != 1 for v in got)

    compact_ivfpq_index(spark, idx_dir, tomb)
    cent2, assign2, codes2, ca2, cb2 = read_ivfpq_index(spark, idx_dir)
    assert assign2.count() == n_assign - n_tomb
    assert codes2.count() == n_codes_rows - n_tomb
    served_compact = ivfpq_query_from_index(
        emb_r, cent2, assign2, codes2, ca2, cb2, query_id=0, k=10, nprobe=2
    ).collect()
    assert sorted((r["vec_id"], r["cosine"]) for r in served_compact) == sorted(
        (r["vec_id"], r["cosine"]) for r in served_tomb
    )


def test_sq8_topk_recall_vs_brute_force(spark):
    """SQ8 serve contract: with a shortlist covering half the corpus,
    the quantized path must recover >=80% of the exact top-5, every
    returned cosine must be exact (rerank uses true components), and
    the output is (cosine desc, id) ordered."""
    from python_etl_pipeline_spark.llm.similarity import (
        brute_force_topk,
        sq8_topk,
    )

    corpus = _corpus(spark)
    exact = [r["vec_id"] for r in brute_force_topk(corpus, query_id=0, k=5).collect()]
    got = sq8_topk(corpus, query_id=0, k=5, shortlist=12).collect()
    ids = [r["vec_id"] for r in got]
    assert len(set(ids) & set(exact)) >= 4, (ids, exact)
    cosines = [r["cosine"] for r in got]
    assert cosines == sorted(cosines, reverse=True)
    exact_cos = {
        r["vec_id"]: r["cosine"]
        for r in brute_force_topk(corpus, query_id=0, k=25).collect()
    }
    for r in got:
        assert abs(r["cosine"] - exact_cos[r["vec_id"]]) < 1e-9


def test_pagerank_from_persisted_edges_matches_inplan(spark, sf_dir, tmp_path):
    """The 100 TB serving story x51's docstring claims: persist the
    kNN edge table once (like the IVF index), then iterate PageRank
    from the STORED edges — identical ranking to the in-plan form,
    because the iterations are a pure function of the edge set."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.queries import (
        REGISTRY,
        _t,
        ann5_knn_graph,
    )

    edges_dir = str(tmp_path / "edges")
    ann5_knn_graph(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor").alias("dst")
    ).write.parquet(edges_dir)

    ed_raw = spark.read.parquet(edges_dir)
    emb = _t(spark, sf_dir, "embeddings")
    nodes = emb.select("vec_id")
    nn = nodes.agg(F.count("*").cast("double").alias("n"))
    deg = ed_raw.groupBy("src").agg(F.count("*").alias("deg"))
    ed = ed_raw.join(deg, "src")
    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "vec_id", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(3):
        contrib = (
            ed.join(pr, ed.src == pr.vec_id)
            .select("dst", (F.col("pr") / F.col("deg")).alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("s"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, nodes.vec_id == contrib.dst, "left")
            .select(
                "vec_id",
                (
                    F.lit(0.15) / F.col("n")
                    + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    served = (
        pr.crossJoin(F.broadcast(nn))
        .select("vec_id", F.round(F.col("pr") * F.col("n"), 4).alias("pagerank"))
        .orderBy(F.col("pagerank").desc(), "vec_id")
        .limit(20)
        .collect()
    )
    inplan = REGISTRY["x51_graph_pagerank"].spark(spark, sf_dir).collect()
    # at gate SFs the derived k equals ann5's fixed 4, so the edge sets
    # (and therefore the rankings) must agree exactly
    assert [(r["vec_id"], r["pagerank"]) for r in served] == [
        (r["vec_id"], r["pagerank"]) for r in inplan
    ]


def test_ivf_sq8_cosines_exact_and_cell_scoped(spark):
    """IVF x SQ8 contract: every returned cosine is EXACT (rerank uses
    true components), results never leave the query's cell, and with a
    generous shortlist the composition recovers the cell-local exact
    top-k (what IVF alone would return)."""
    from python_etl_pipeline_spark.llm.similarity import (
        brute_force_topk,
        ivf_sq8_topk,
        kmeans_assign,
    )

    corpus = _corpus(spark)
    got = ivf_sq8_topk(corpus, query_id=0, k=5, shortlist=25).collect()
    assert got
    exact_cos = {
        r["vec_id"]: r["cosine"]
        for r in brute_force_topk(corpus, query_id=0, k=30).collect()
    }
    for r in got:
        assert abs(r["cosine"] - exact_cos[r["vec_id"]]) < 1e-9
    assign = {r["vec_id"]: r["cell"] for r in kmeans_assign(corpus).collect()}
    qc = assign[0]
    for r in got:
        assert assign[r["vec_id"]] == qc


def test_probe_recall_curve_monotone(spark, sf_dir):
    """ann21's curve: candidate sets nest by construction, so both
    axes are monotone non-decreasing in nprobe; recall is bounded in
    [0, 1]; and the nprobe=1 point must equal ann6's single-probe
    recall on the same ground truth."""
    from python_etl_pipeline_spark.queries import REGISTRY

    rows = sorted(
        REGISTRY["ann21_probe_recall_curve"].spark(spark, sf_dir).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4]
    for a, b in zip(rows, rows[1:]):
        assert b["n_scanned"] >= a["n_scanned"]
        assert b["n_hits"] >= a["n_hits"]
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["n_hits"] <= min(10, r["n_scanned"])
    ann6 = REGISTRY["ann6_recall_at_k"].spark(spark, sf_dir).collect()[0]
    assert rows[0]["recall_at_k"] == ann6["recall_at_k"]


def test_binary_hamming_serve_recall_and_bounds(spark, sf_dir):
    """ann22: hamming in [0, 48] (48 packed sign bits), 10 rows, and
    the 48-bit shortlist recovers a usable fraction of the exact
    top-10 (measured 0.6 at sf0.01 with shortlist 50; pinned >= 0.4 —
    binary codes trade recall for a 21x shrink vs SQ8, and the
    recall knob is shortlist/planes, both verified numbers here)."""
    from python_etl_pipeline_spark.queries import _ANN22_PLANES, REGISTRY

    rows = REGISTRY["ann22_binary_hamming_topk"].spark(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["hamming"] <= _ANN22_PLANES
        assert -1.0 <= r["cosine"] <= 1.0
    got = {r["vec_id"] for r in rows}
    truth = {
        r["vec_id"]
        for r in REGISTRY["ann1_bruteforce_topk"].spark(spark, sf_dir).collect()
    }
    assert len(got & truth) / len(truth) >= 0.4
