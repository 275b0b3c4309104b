"""Round-2 curation operators: decontamination, TF-IDF, bigram-LM
scoring, k-means centroid training — semantics + the plan shapes that
matter at 100 TB."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Window
from pyspark.sql import functions as F

from python_etl_pipeline_spark.queries import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_decontaminate_broadcasts_benchmark_set(spark, sf_dir):
    # The corpus side must NEVER shuffle on shingle text: the benchmark
    # shingle set is the broadcast side of a BroadcastHashJoin, and the
    # only hashpartitioning exchange is the final groupBy(doc_id).
    plan = _plan(spark, sf_dir, "dd8_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_never_flags_benchmark_docs(spark, sf_dir):
    out = REGISTRY["dd8_decontaminate"].spark(spark, sf_dir)
    assert out.filter(F.col("doc_id") % 29 == 0).count() == 0


def test_tfidf_rank_bounds_and_idf_sign(spark, sf_dir):
    out = REGISTRY["tx9_tfidf_keywords"].spark(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rows in by_doc.items():
        ranks = sorted(r["rnk"] for r in rows)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
        # idf >= 0 always (df <= N) so scores are non-negative
        assert all(r["tfidf"] >= 0 for r in rows)


def test_bigram_lm_scores_nonnegative_and_cover_docs(spark, sf_dir):
    out = REGISTRY["tx10_bigram_lm_score"].spark(spark, sf_dir)
    rows = out.collect()
    # every doc with >= 2 tokens gets a score; -ln(p) >= 0 since p <= 1
    assert all(r["avg_nll"] >= 0 for r in rows)
    assert all(r["n_bigrams"] >= 1 for r in rows)
    docs = REGISTRY["tx9_tfidf_keywords"].spark(spark, sf_dir).select("doc_id").distinct().count()
    assert len(rows) == docs  # same token threshold (>= 2 tokens -> >= 1 bigram)


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    import pyspark.sql.functions as F  # noqa: F811

    out = REGISTRY["ann4_kmeans_train"].spark(spark, sf_dir)
    rows = out.collect()
    assert 1 <= len(rows) <= 4  # k=4 cells, empty cells may vanish
    total = sum(r["n_members"] for r in rows)
    n_vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    assert total == n_vecs  # assignment is a partition of the vectors
    assert all(r["centroid_norm"] > 0 for r in rows)


def test_kmeans_no_driver_collect_in_plan(spark, sf_dir):
    # the trainer is pure DataFrame composition end-to-end: vectors that
    # had been collected to the driver and re-parallelized would surface
    # as ExistingRDD / LocalTableScan leaves in the plan. This checks
    # the DEFAULT (lazy, materialize=False) path directly; the opt-in
    # materialize=True fast path used by ann4/dd11 localCheckpoints the
    # component table (an EXECUTOR-local cache, not driver data), which
    # legitimately truncates the plan to a Scan ExistingRDD leaf and is
    # equivalent by construction to this verified pure plan.
    import contextlib
    import io

    from python_etl_pipeline_spark.llm.similarity import kmeans_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent, assign = kmeans_fit(emb)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assign.explain("formatted")
    plan = buf.getvalue()
    assert "ExistingRDD" not in plan
    assert "LocalTableScan" not in plan


def test_countmin_overestimate_invariant(spark, sf_dir):
    """CM sketch guarantee: estimate >= true count for EVERY queried
    token (min over d rows of sums that each include the token's own
    count), and the reported err equals est - true."""
    from python_etl_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["hh1_countmin_topk"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["overestimate_ok"], r
        assert r["n_est"] >= r["n_true"]
        assert r["err"] == r["n_est"] - r["n_true"]


def test_density_downsample_budget(spark, sf_dir):
    """Cells at or under the 100-vector budget are kept whole
    (threshold >= the hash modulus); oversized cells are thinned to
    within sampling noise of the budget; kept never exceeds members."""
    from python_etl_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["x48_density_downsample"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_members"]
        if r["n_members"] <= 100:
            assert r["n_kept"] == r["n_members"], r
        else:
            # E[kept] = members * floor(1e8/members)/1e6 ~= 100
            assert r["n_kept"] < r["n_members"]
            assert abs(r["n_kept"] - 100) <= 40, r


def test_compaction_bins_conserve_bytes(spark, sf_dir):
    """The merge manifest neither loses nor invents bytes: per source,
    sum(bin_bytes) equals the total chunk bytes, every bin is
    non-empty, and bin ids are non-negative."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.queries import REGISTRY, _t

    out = REGISTRY["x49_compaction_bins"].spark(spark, sf_dir)
    per_src = {
        r["source"]: (r["total"], r["nb"])
        for r in out.groupBy("source")
        .agg(F.sum("bin_bytes").alias("total"), F.count("*").alias("nb"))
        .collect()
    }
    truth = {
        r["source"]: r["total"]
        for r in _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").alias("total"))
        .collect()
    }
    assert set(per_src) == set(truth)
    for s in truth:
        assert per_src[s][0] == truth[s], s
    for r in out.collect():
        assert r["bin"] >= 0 and r["bin_bytes"] > 0 and r["n_chunks"] > 0


def test_linear_counting_error_bounds(spark, sf_dir):
    """LC contract sanity at test load factors (n/m ~ 0.2): the bucket
    count never exceeds the true cardinality (collisions only lose),
    never exceeds the bitmap, and the estimate lands within 5%."""
    from python_etl_pipeline_spark.queries import REGISTRY, _HH3_M

    rows = REGISTRY["hh3_linear_counting"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_buckets"] <= r["n_exact"]
        assert r["n_buckets"] < _HH3_M
        assert r["rel_err"] < 0.05, r


def test_hll_contract_and_register_merge(spark, sf_dir):
    """HLL contract sanity: estimates land within the ~3x standard
    error for m=256 (1.04/16 ~ 6.5%; allow 20%), registers never
    exceed m, and — the property that makes it a 100 TB sketch — the
    register table is a max-monoid: merging per-shard register maxes
    (shards = doc_id parity) reproduces the full corpus registers
    exactly."""
    from python_etl_pipeline_spark.llm.dedup import _hexint
    from python_etl_pipeline_spark.llm.text import tokens
    from python_etl_pipeline_spark.queries import _HH4_M, _HH4_W, REGISTRY, _t

    rows = REGISTRY["hh4_hll_cardinality"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_registers"] <= _HH4_M
        assert r["rel_err"] < 0.20, r

    d = _t(spark, sf_dir, "documents")

    def registers(df):
        toks = df.select(
            "source", F.explode(tokens(F.col("text"))).alias("tok")
        )
        h = _hexint(F.md5(F.col("tok")), 8)
        rho = F.when(
            (h / F.lit(_HH4_M)).cast("bigint") == 0, F.lit(_HH4_W + 1)
        ).otherwise(
            F.lit(_HH4_W + 1)
            - F.length(F.bin((h / F.lit(_HH4_M)).cast("bigint")))
        )
        return toks.groupBy(
            "source", (h % _HH4_M).alias("j")
        ).agg(F.max(rho).alias("m_j"))

    full = {
        (r["source"], r["j"]): r["m_j"]
        for r in registers(d).collect()
    }
    shard_a = registers(d.filter(F.col("doc_id") % 2 == 0)).collect()
    shard_b = registers(d.filter(F.col("doc_id") % 2 == 1)).collect()
    merged: dict[tuple, int] = {}
    for r in [*shard_a, *shard_b]:
        k = (r["source"], r["j"])
        merged[k] = max(merged.get(k, 0), r["m_j"])
    assert merged == full


def test_nb_classifier_learns_label_direction(spark, sf_dir):
    """The in-plan naive-Bayes student must actually learn the
    heuristic teacher's signal: docs the teacher keeps score strictly
    higher on average than docs it rejects, and teacher-student
    agreement clears a loose floor (unigram features cannot perfectly
    express the length-based rules, so the ceiling is well below 1.0 —
    the disagreement set is the query's point)."""
    rows = REGISTRY["tx23_nb_quality_score"].spark(spark, sf_dir).collect()
    assert rows
    kept = [r["nb_score"] for r in rows if r["heur_keep"]]
    dropped = [r["nb_score"] for r in rows if not r["heur_keep"]]
    assert kept and dropped
    assert sum(kept) / len(kept) > sum(dropped) / len(dropped)
    agree = sum(1 for r in rows if r["heur_keep"] == r["nb_keep"])
    assert agree / len(rows) > 0.6


def test_priority_sample_merge_property(spark, sf_dir):
    """The weighted reservoir is mergeable: the top-k of the union of
    per-shard top-k's equals the global top-k — the property that lets
    a 100 TB run keep k rows per shard. Shards = doc_id parity."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.queries import REGISTRY, _t
    from python_etl_pipeline_spark.llm.dedup import _hexint

    d = _t(spark, sf_dir, "documents")
    u = (
        _hexint(F.md5(F.concat_ws("|", F.lit("ps"), F.col("doc_id"))), 8) + 0.5
    ) / F.lit(4294967296.0)
    scored = d.select(
        "doc_id", F.round(F.log(u) / F.col("n_chars"), 8).alias("priority")
    )
    per_shard = [
        scored.filter(F.col("doc_id") % 2 == p)
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(20)
        for p in (0, 1)
    ]
    merged = (
        per_shard[0]
        .unionByName(per_shard[1])
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(20)
    )
    global_ids = [
        r["doc_id"]
        for r in REGISTRY["x50_priority_sample"].spark(spark, sf_dir).collect()
    ]
    assert [r["doc_id"] for r in merged.collect()] == global_ids


def test_pagerank_floor_and_order(spark, sf_dir):
    """PageRank invariants: every node's N-normalized score is at
    least the teleport floor 0.15 (damping 0.85), the top-20 cut is
    descending, and the top node beats the uniform baseline 1.0 (some
    hub exists in a kNN graph — in-degree is never uniform)."""
    from python_etl_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["x51_graph_pagerank"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    scores = [r["pagerank"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0.15 for s in scores)
    assert scores[0] > 1.0


def test_source_overlap_matrix_invariants(spark, sf_dir):
    """The contamination matrix is a complete upper triangle over the
    source catalog (every pair shares at least one shingle in this
    corpus), and per pair: n_common respects both set sizes, jaccard
    <= containment <= 1, and jaccard matches its closed form from
    n_common and the per-source type counts."""
    from python_etl_pipeline_spark.llm.dedup import shingles
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    rows = REGISTRY["x52_source_overlap"].spark(spark, sf_dir).collect()
    d = _t(spark, sf_dir, "documents")
    sizes = {
        r["source"]: r["n"]
        for r in d.select(
            "source",
            F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
        )
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_src = len(sizes)
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        lo = min(sizes[r["source_a"]], sizes[r["source_b"]])
        assert 0 < r["n_common"] <= lo
        assert 0 < r["jaccard"] <= r["containment"] <= 1.0


def test_rag_chunks_cover_every_token(spark, sf_dir):
    """Chunk identity and coverage invariants: chunk_idx is dense from
    0 per doc; every non-final window holds exactly W tokens; the final
    window ends exactly at the doc's last token (so the windows cover
    every token); and start positions advance by the stride."""
    from python_etl_pipeline_spark.llm.text import token_count
    from python_etl_pipeline_spark.queries import (
        _X53_S,
        _X53_W,
        REGISTRY,
        _t,
    )

    rows = REGISTRY["x53_rag_chunks"].spark(spark, sf_dir).collect()
    n_toks = {
        r["doc_id"]: r["n"]
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", token_count("text").alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_toks)
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["start_tok"] == c["chunk_idx"] * _X53_S + 1
        for c in chunks[:-1]:
            assert c["n_tokens"] == _X53_W
        last = chunks[-1]
        assert last["start_tok"] + last["n_tokens"] - 1 == n_toks[doc]


def test_logbin_quantile_error_bound_and_fold(spark, sf_dir):
    """hh5 contract: every (group, q) estimate lands within the 1/16
    relative-error bound the 8-sub-bin octave geometry guarantees; and
    the histogram is a SUM monoid — per-shard bin counts (shards =
    o_orderkey parity) fold by addition into exactly the full
    histogram."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    rows = REGISTRY["hh5_logbin_quantiles"].spark(spark, sf_dir).collect()
    assert len(rows) == 15  # 5 priorities x 3 quantiles
    for r in rows:
        assert r["rel_err"] <= 0.0625, r
        assert r["q_est"] > 0 and r["q_exact"] > 0

    o = _t(spark, sf_dir, "orders")

    def histo(df):
        v = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        vals = df.select(F.col("o_orderpriority").alias("grp"), v.alias("v"))
        blen = F.length(F.bin(F.col("v")))
        sub = F.when(F.col("v") < 8, F.col("v")).otherwise(
            F.floor(F.col("v") / F.pow(F.lit(2.0), blen - 4)).cast("bigint")
            - 8
        )
        return {
            (r["grp"], r["blen"], r["sub"]): r["c"]
            for r in vals.groupBy(blen.alias("blen"), sub.alias("sub"), "grp")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    full = histo(o)
    ha = histo(o.filter(F.col("o_orderkey") % 2 == 0))
    hb = histo(o.filter(F.col("o_orderkey") % 2 == 1))
    merged: dict[tuple, int] = dict(ha)
    for k, c in hb.items():
        merged[k] = merged.get(k, 0) + c
    assert merged == full


def test_source_drift_bounds_and_identity(spark, sf_dir):
    """JS divergence per source lies in [0, ln 2]; token/vocab counts
    are consistent; and the identity property holds: computing the
    same JS pipeline with BOTH snapshots set to the full per-source
    corpus (old == new) yields exactly 0 for every source."""
    import math

    from python_etl_pipeline_spark.llm.text import tokens
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    rows = REGISTRY["x54_source_drift"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r["js_div"] <= math.log(2) + 1e-9, r
        assert r["vocab_old"] <= r["n_old_tokens"]
        assert r["vocab_new"] <= r["n_new_tokens"]

    # identity: old == new == the full corpus -> JS = 0 per source
    d = _t(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c1"))
        .withColumn("c2", F.col("c1"))
    )
    n = cnt.groupBy("source").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    p = F.col("c1") / F.col("n1")
    q = F.col("c2") / F.col("n2")
    m = (p + q) / 2
    term = F.when(F.col("c1") > 0, p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("c2") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    js = {
        r["source"]: r["js"]
        for r in cnt.join(n, "source")
        .groupBy("source")
        .agg(F.round(0.5 * F.sum(term), 4).alias("js"))
        .collect()
    }
    assert all(v == 0.0 for v in js.values()), js


def test_unimax_allocation_properties(spark, sf_dir):
    """Water-filling invariants: allocations sum to the budget (floor
    of half the corpus tokens, within rounding of the per-source 2 dp);
    small sources are kept whole (alloc == size exactly); capped
    sources all sit at one common level no larger than any capped
    source's size; and allocation is monotone in source size."""
    from python_etl_pipeline_spark.queries import (
        _X55_BUDGET_FRAC,
        REGISTRY,
    )

    rows = REGISTRY["x55_unimax_alloc"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    total = sum(r["n_tokens"] for r in rows)
    budget = int(_X55_BUDGET_FRAC * total)
    got = sum(r["alloc_tokens"] for r in rows)
    assert abs(got - budget) <= 0.01 * len(rows) + 1
    whole = [r for r in rows if r["kept_whole"]]
    capped = [r for r in rows if not r["kept_whole"]]
    for r in whole:
        assert r["alloc_tokens"] == float(r["n_tokens"])
        assert r["alloc_frac"] == 1.0
    assert capped, "budget < total must cap someone"
    levels = {r["alloc_tokens"] for r in capped}
    assert len(levels) == 1  # one water level
    level = levels.pop()
    for r in capped:
        assert r["n_tokens"] >= level
    for r in whole:
        assert r["n_tokens"] <= level + 0.01 or not capped
    by_size = sorted(rows, key=lambda r: r["n_tokens"])
    allocs = [r["alloc_tokens"] for r in by_size]
    assert allocs == sorted(allocs)


def test_schema_evolution_null_backfill_and_provenance(spark, sf_dir):
    """i8's evolved table: the schema is the name-union in first-seen
    order; every v1 row has typed NULLs exactly in the columns v1
    lacked (and real values elsewhere), symmetrically for v2; no row
    lost either side; provenance tag partitions the rows."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    out = REGISTRY["i8_schema_evolution"].spark(spark, sf_dir)
    assert out.columns == [
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority", "batch_version",
    ]
    rows = out.collect()
    o = _t(spark, sf_dir, "orders")
    n1 = o.filter(F.col("o_orderkey") % 3 == 0).count()
    n2 = o.filter(F.col("o_orderkey") % 3 == 1).count()
    v1 = [r for r in rows if r["batch_version"] == "v1"]
    v2 = [r for r in rows if r["batch_version"] == "v2"]
    assert len(v1) == n1 and len(v2) == n2
    for r in v1:
        assert r["o_orderdate"] is None and r["o_orderpriority"] is None
        assert r["o_orderstatus"] is not None
    for r in v2:
        assert r["o_orderstatus"] is None
        assert r["o_orderdate"] is not None


def test_novelty_inverse_of_duplication(spark, sf_dir):
    """Novelty semantics: bounds hold per doc (0 <= n_novel <=
    n_shingles); exact-duplicate documents (same text appearing under
    two doc_ids) must score EXACTLY zero novelty — every one of their
    shingles has df >= 2; and the corpus-wide sum of n_novel equals
    the count of df=1 shingle types."""
    from python_etl_pipeline_spark.llm.dedup import shingles
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    rows = REGISTRY["tx24_novelty_score"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert 0.0 <= r["novelty"] <= 1.0

    d = _t(spark, sf_dir, "documents")
    dup_texts = {
        r["text"]
        for r in d.groupBy("text")
        .agg(F.count(F.lit(1)).alias("c"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("c") > 1)
        .join(d.select("text"), "text")
        .select("text")
        .collect()
    }
    if dup_texts:
        dup_ids = {
            r["doc_id"]
            for r in d.filter(F.col("text").isin(list(dup_texts)))
            .select("doc_id")
            .collect()
        }
        for r in rows:
            if r["doc_id"] in dup_ids:
                assert r["novelty"] == 0.0, r

    df1 = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
        )
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") == 1)
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == df1


def test_sketch_fence_outliers_contract(spark, sf_dir):
    """x56: the sketch fences actually flag (real tail in events.value),
    the sketch and exact decisions agree on all but a sliver of rows
    (the cost of the 1/16 bin error, < 2% here), and fences are
    ordered with the exact-side count within 25% of the sketch count."""
    from python_etl_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["x56_sketch_fence_outliers"].spark(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["fence_lo"] < r["fence_hi"]
        assert r["n_out_sketch"] > 0 and r["n_out_exact"] > 0
        assert r["disagree_frac"] < 0.02, r
        assert abs(r["n_out_sketch"] - r["n_out_exact"]) <= max(
            4, 0.25 * r["n_out_exact"]
        ), r


def test_per_source_reservoir_balance_and_merge(spark, sf_dir):
    """x57: exactly k rows per source with dense ranks; the selection
    agrees with x50's priority function (a doc in both samples carries
    the same priority); and the per-group reservoir is mergeable —
    per-shard (doc_id parity) per-source top-k folds to the global
    per-source top-k."""
    from python_etl_pipeline_spark.llm.dedup import _hexint
    from python_etl_pipeline_spark.queries import _X57_K, REGISTRY, _t

    rows = REGISTRY["x57_per_source_reservoir"].spark(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src) == 20
    for src, rs in by_src.items():
        assert sorted(r["rk"] for r in rs) == list(range(1, _X57_K + 1))

    d = _t(spark, sf_dir, "documents")
    u = (
        _hexint(F.md5(F.concat_ws("|", F.lit("ps"), F.col("doc_id"))), 8)
        + 0.5
    ) / F.lit(4294967296.0)
    scored = d.select(
        "source", "doc_id",
        F.round(F.log(u) / F.col("n_chars"), 8).alias("priority"),
    )

    def topk(df):
        out: dict[str, list] = {}
        for r in df.collect():
            out.setdefault(r["source"], []).append(
                (r["priority"], -r["doc_id"])
            )
        return {
            s: sorted(v, reverse=True)[: _X57_K] for s, v in out.items()
        }

    full = topk(scored)
    sh_a = topk(scored.filter(F.col("doc_id") % 2 == 0))
    sh_b = topk(scored.filter(F.col("doc_id") % 2 == 1))
    merged = {
        s: sorted(sh_a.get(s, []) + sh_b.get(s, []), reverse=True)[: _X57_K]
        for s in set(sh_a) | set(sh_b)
    }
    assert merged == full


def test_bootstrap_se_tracks_analytic(spark, sf_dir):
    """x58 contract: the one-pass Poisson-bootstrap SE tracks the
    closed-form sigma/sqrt(n) within bootstrap noise (B=32, n=25 per
    source -> ratio in [0.5, 2]); and the hash-derived weights really
    are Poisson(1): the global mean weight sits within 5% of 1."""
    from python_etl_pipeline_spark.llm.dedup import _hexint
    from python_etl_pipeline_spark.queries import _X58_B, _X58_CDF, REGISTRY, _t

    rows = REGISTRY["x58_bootstrap_se"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["se_boot"] > 0 and r["se_analytic"] > 0
        assert 0.5 <= r["se_ratio"] <= 2.0, r

    d = _t(spark, sf_dir, "documents")
    reps = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_X58_B - 1))).alias("b"),
    )
    u = (
        _hexint(
            F.md5(F.concat_ws("|", F.lit("bs"), F.col("doc_id"), F.col("b"))),
            8,
        )
        + 0.5
    ) / F.lit(4294967296.0)
    w = F.lit(6)
    for k in range(len(_X58_CDF) - 1, -1, -1):
        w = F.when(u < float(_X58_CDF[k]), F.lit(k)).otherwise(w)
    mean_w = reps.select(w.alias("w")).agg(F.avg("w")).collect()[0][0]
    assert 0.95 <= mean_w <= 1.05


def test_zipf_heaps_fingerprint_reads_synthetic(spark, sf_dir):
    """tx25 on the synthetic corpus must DETECT that it is synthetic:
    the 31-token fixed vocabulary yields a near-flat Zipf slope (far
    from natural text's -1) and a saturated Heaps exponent near 0 —
    exactly the machine-generated fingerprint the diagnostic exists
    to flag. Structural bounds: slope negative (frequency falls with
    rank), beta in [0, 1), vocab <= tokens."""
    from python_etl_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["tx25_zipf_heaps"].spark(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["vocab"] <= r["n_tokens"]
    assert -3.0 < r["zipf_slope"] < 0.0
    assert 0.0 <= r["heaps_beta"] < 1.0
    # the synthetic-corpus reading: flat Zipf, saturated Heaps
    assert r["zipf_slope"] > -0.6
    assert r["heaps_beta"] < 0.2


def test_funnel_monotone_and_strict_order(spark, sf_dir):
    """x59: funnel counts are monotone non-increasing down the steps;
    fractions bounded; and strict ordering is real — a hand-built user
    whose purchase precedes every click must count for step 2 but NOT
    step 3."""
    from python_etl_pipeline_spark.queries import REGISTRY

    rows = sorted(
        REGISTRY["x59_funnel_steps"].spark(spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    assert [r["step"] for r in rows] == [1, 2, 3]
    assert rows[0]["n_reached"] >= rows[1]["n_reached"] >= rows[2]["n_reached"]
    for r in rows:
        assert 0 <= r["reach_frac"] <= 1.0
        assert r["n_users"] == rows[0]["n_users"]

    import datetime

    base = datetime.datetime(2024, 1, 1)

    def ts(m):
        return base + datetime.timedelta(minutes=m)

    evs = [
        (1, ts(0), "view"), (1, ts(5), "purchase"), (1, ts(10), "click"),
        (2, ts(0), "view"), (2, ts(5), "click"), (2, ts(10), "purchase"),
    ]
    df = spark.createDataFrame(
        evs, "user_id long, ts timestamp, event_type string"
    )
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = df.select("user_id", "ts", "event_type", t1.alias("t1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    s2 = s1.select("user_id", "ts", "event_type", "t1", t2.alias("t2"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    u = (
        s2.select("user_id", "t1", "t2", t3.alias("t3"))
        .groupBy("user_id")
        .agg(F.max("t2").alias("t2"), F.max("t3").alias("t3"))
        .collect()
    )
    by_user = {r["user_id"]: r for r in u}
    assert by_user[1]["t2"] is not None and by_user[1]["t3"] is None
    assert by_user[2]["t2"] is not None and by_user[2]["t3"] is not None


def test_last_touch_attribution_semantics(spark, sf_dir):
    """x60: shares are conversion fractions (sum <= 1 — conversions
    with no in-window touch are unattributed by design); both channels
    exist; and the last-touch rule is real — a hand-built conversion
    whose latest in-window touch is a click attributes to click, and a
    touch OUTSIDE the 7-day lookback cannot win."""
    import datetime

    from python_etl_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["x60_last_touch_attribution"].spark(spark, sf_dir).collect()
    assert {r["channel"] for r in rows} <= {"view", "click"}
    total_share = sum(r["share"] for r in rows)
    assert 0 < total_share <= 1.0 + 1e-9
    n_conv = rows[0]["n_conversions"]
    assert sum(r["n_attributed"] for r in rows) <= n_conv

    base = datetime.datetime(2024, 6, 1)

    def ts(days):
        return base + datetime.timedelta(days=days)

    evs = [
        # conv 100: click at -1d beats view at -2d (last touch wins)
        (1, 100, ts(10), "purchase"),
        (1, 1, ts(9), "click"),
        (1, 2, ts(8), "view"),
        # conv 200: only touch is 8 days before -> outside lookback
        (2, 200, ts(20), "purchase"),
        (2, 3, ts(12), "click"),
    ]
    df = spark.createDataFrame(
        evs, "user_id long, event_id long, ts timestamp, event_type string"
    )
    conv = df.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = df.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (F.col("touch_ts") > F.col("conv_ts") - F.expr("INTERVAL 7 DAY"))
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), "channel"
    )
    att = {
        r["conv_id"]: r["channel"]
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("conv_id", "channel")
        .collect()
    }
    assert att == {100: "click"}  # 200 unattributed (outside lookback)


def test_retention_matrix_invariants(spark, sf_dir):
    """x61: offset-0 retention is exactly 1.0 for every cohort (the
    first-event week is by definition active); retention bounded in
    (0, 1]; offsets non-negative; n_active <= n_cohort; and cohort
    sizes sum to the distinct user count."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    rows = REGISTRY["x61_retention_cohorts"].spark(spark, sf_dir).collect()
    assert rows
    seen_cohorts = {}
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0 < r["n_active"] <= r["n_cohort"]
        assert 0 < r["retention"] <= 1.0
        if r["week_offset"] == 0:
            assert r["retention"] == 1.0, r
        seen_cohorts[r["cohort_week"]] = r["n_cohort"]
    n_users = (
        _t(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(seen_cohorts.values()) == n_users


def test_markov_rows_are_stochastic(spark, sf_dir):
    """x62: every 'cur' row of the transition matrix sums to 1 within
    per-cell rounding (4 dp x at most 5 cells); probabilities bounded;
    total transitions = total events minus one per user (every
    adjacent pair counted exactly once)."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    rows = REGISTRY["x62_markov_transitions"].spark(spark, sf_dir).collect()
    assert rows
    by_cur: dict[str, list] = {}
    for r in rows:
        assert 0.0 < r["p"] <= 1.0
        by_cur.setdefault(r["cur"], []).append(r)
    for cur, rs in by_cur.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) <= 0.0005 * len(rs), cur
    e = _t(spark, sf_dir, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in rows) == n_events - n_users


def test_exact_span_decontaminate_matches_pure_python(spark, sf_dir):
    """dd18: the whole operator re-derived in pure Python (tokenize,
    exact 8-gram match against the doc_id%29==0 benchmark split, merge
    overlapping/adjacent intervals) must agree row-for-row — an
    independent third implementation beside the Spark plan and the
    DuckDB oracle."""
    import re

    from python_etl_pipeline_spark.queries import REGISTRY, _t

    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip())
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    n = 8
    bench: set[str] = set()
    for did, t in docs.items():
        if did % 29 == 0:
            for i in range(len(t) - n + 1):
                bench.add(" ".join(t[i : i + n]))
    expected = {}
    for did, t in docs.items():
        if did % 29 == 0:
            continue
        starts = [
            i
            for i in range(len(t) - n + 1)
            if " ".join(t[i : i + n]) in bench
        ]
        if not starts:
            continue
        spans, n_grams = [], len(starts)
        for i in starts:
            if spans and i <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], i + n - 1)
            else:
                spans.append([i, i + n - 1])
        covered = sum(b - a + 1 for a, b in spans)
        expected[did] = (
            len(t),
            n_grams,
            len(spans),
            covered,
            round(covered / len(t), 4),
        )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_matched_grams"],
            r["n_spans"],
            r["covered_tokens"],
            round(r["contamination_frac"], 4),
        )
        for r in REGISTRY["dd18_exact_span_decontaminate"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == expected
    assert expected  # the fixture must actually exercise the operator


def test_gap_fill_interpolate_matches_pure_python(spark, sf_dir):
    """x63: the time-weighted interpolation re-derived sequentially in
    Python over each user's (ts, event_id)-ordered stream must agree
    on every repaired 'error' event (edge carries, midpoint ties
    included)."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = sorted(
        _t(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    by_user: dict[int, list] = {}
    for r in evs:
        by_user.setdefault(r["user_id"], []).append(r)
    expected = {}
    for rows in by_user.values():
        for i, r in enumerate(rows):
            if r["event_type"] != "error":
                continue
            t = r["ts"].timestamp()
            prev = next_ = None
            for q in reversed(rows[:i]):
                if q["event_type"] != "error" and q["value"] is not None:
                    prev = (q["value"], q["ts"].timestamp())
                    break
            for q in rows[i + 1 :]:
                if q["event_type"] != "error" and q["value"] is not None:
                    next_ = (q["value"], q["ts"].timestamp())
                    break
            if prev and next_:
                pv, pt = prev
                nv, nt = next_
                v = (
                    pv + (nv - pv) * (t - pt) / (nt - pt)
                    if nt > pt
                    else (pv + nv) / 2
                )
            elif prev:
                v = prev[0]
            elif next_:
                v = next_[0]
            else:
                v = None
            expected[r["event_id"]] = (
                None if v is None else round(v, 4)
            )
    got = {
        r["event_id"]: (
            None if r["value_filled"] is None else round(r["value_filled"], 4)
        )
        for r in REGISTRY["x63_gap_fill_interpolate"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        e, g = expected[k], got[k]
        if e is None:
            assert g is None, k
        else:
            assert abs(e - g) <= 1e-6, (k, e, g)
    assert expected


def test_cusum_matches_sequential_recursion(spark, sf_dir):
    """x64: the two-window prefix-sum rewrite must equal the textbook
    sequential recursion S_t = max(0, S_{t-1} + (x_t - k)) computed in
    Python from the same daily counts; cusum is non-negative by
    construction."""
    import statistics as stats

    from python_etl_pipeline_spark.queries import REGISTRY

    rows = (
        REGISTRY["x64_cusum_changepoint"].spark(spark, sf_dir).collect()
    )
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert r["cusum"] >= 0
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        xs = [r["n"] for r in rs]
        mu = sum(xs) / len(xs)
        sd = stats.pstdev(xs)
        k = mu + 0.5 * sd
        s = 0.0
        for r, x in zip(rs, xs):
            s = max(0.0, s + (x - k))
            assert abs(s - r["cusum"]) <= 2e-4, (et, r["day"], s, r["cusum"])
            assert r["changepoint"] == (1 if s > 4 * sd else 0)


def test_conversion_lag_matches_pure_python(spark, sf_dir):
    """x66: converting-user set and per-user lag re-derived in Python
    (first view, first purchase at-or-after it)."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    fv: dict[int, object] = {}
    for r in evs:
        if r["event_type"] == "view":
            if r["user_id"] not in fv or r["ts"] < fv[r["user_id"]]:
                fv[r["user_id"]] = r["ts"]
    fp: dict[int, object] = {}
    for r in evs:
        if (
            r["event_type"] == "purchase"
            and r["user_id"] in fv
            and r["ts"] >= fv[r["user_id"]]
        ):
            if r["user_id"] not in fp or r["ts"] < fp[r["user_id"]]:
                fp[r["user_id"]] = r["ts"]
    got = {
        r["user_id"]: (r["first_view"], r["first_purchase"], r["lag_sec"])
        for r in REGISTRY["x66_conversion_lag"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(fp)
    for u, (v, p, lag) in got.items():
        assert v == fv[u] and p == fp[u]
        assert abs(lag - (p - v).total_seconds()) <= 0.01
        assert lag >= 0
    assert got


def test_snapshot_cdc_matches_pure_python(spark, sf_dir):
    """i11: the full diff re-derived in Python from the same snapshot
    construction — every op classification and old/new value."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    rows = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    ).collect()
    old = {
        r["c_custkey"]: round(r["c_acctbal"], 2)
        for r in rows
        if r["c_custkey"] % 11 != 0
    }
    new = {
        r["c_custkey"]: round(
            r["c_acctbal"] + 100 if r["c_custkey"] % 5 == 0
            else r["c_acctbal"],
            2,
        )
        for r in rows
        if r["c_custkey"] % 13 != 0
    }
    expected = {}
    for k in set(old) | set(new):
        if k not in old:
            expected[k] = ("insert", None, new[k])
        elif k not in new:
            expected[k] = ("delete", old[k], None)
        elif old[k] != new[k]:
            expected[k] = ("update", old[k], new[k])
    got = {
        r["c_custkey"]: (r["op"], r["old_acctbal"], r["new_acctbal"])
        for r in REGISTRY["i11_snapshot_cdc_extract"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == expected
    assert {op for op, _, _ in got.values()} == {
        "insert", "delete", "update"
    }


def test_copurchase_triangles_match_pure_python(spark, sf_dir):
    """x67: edge list, triangle count and clustering coefficient
    re-derived with dict/set arithmetic from the raw tables."""
    from itertools import combinations

    from python_etl_pipeline_spark.queries import REGISTRY, _t

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    by_part: dict[int, set] = {}
    for r in li:
        ck = orders.get(r["l_orderkey"])
        if ck is not None:
            by_part.setdefault(r["l_partkey"], set()).add(ck)
    wt: dict[tuple, int] = {}
    for cks in by_part.values():
        for a, b in combinations(sorted(cks), 2):
            wt[(a, b)] = wt.get((a, b), 0) + 1
    edges = {p for p, w in wt.items() if w >= 3}
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in edges:
        # count c > b adjacent to both (a<b<c orientation)
        tri += len({c for c in adj[a] & adj[b] if c > b})
    wedges = sum(len(s) * (len(s) - 1) / 2 for s in adj.values())
    row = (
        REGISTRY["x67_copurchase_triangles"].spark(spark, sf_dir).first()
    )
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri
    assert abs(row["global_clustering"] - 3.0 * tri / wedges) <= 1e-5
    assert tri > 0


def test_kmv_overlap_matches_pure_python(spark, sf_dir):
    """hh6: the portable md5 hash, the bottom-64 sketch, the merged
    union estimate and both exact contracts re-derived with hashlib."""
    import hashlib

    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = _t(spark, sf_dir, "events").select(
        "event_type", "user_id"
    ).distinct().collect()
    users: dict[str, set] = {}
    for r in evs:
        users.setdefault(r["event_type"], set()).add(r["user_id"])

    def hv(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    def est(hashes: set) -> float:
        hs = sorted(hashes)
        if len(hs) < 64:
            return float(len(hs))
        return 63.0 * float(16**15) / hs[63]

    got = {
        (r["ta"], r["tb"]): r
        for r in REGISTRY["hh6_kmv_overlap"].spark(spark, sf_dir).collect()
    }
    types = sorted(users)
    assert set(got) == {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    for (a, b), r in got.items():
        ha = {hv(u) for u in users[a]}
        hb = {hv(u) for u in users[b]}
        eu = est(ha | hb)
        assert abs(r["est_union"] - round(eu, 2)) <= 1e-6
        assert r["exact_union"] == len(users[a] | users[b])
        assert r["exact_inter"] == len(users[a] & users[b])
        assert abs(
            r["est_inter"] - round(est(ha) + est(hb) - eu, 2)
        ) <= 1e-6
    # at this sf every audience is < k, so the sketch must degrade to
    # EXACT counts (the estimating regime is exercised by the sf0.01
    # oracle parity, where audiences are ~10x k)
    if all(len(users[t] | users[u]) < 64 for t in types for u in types):
        for (a, b), r in got.items():
            assert r["est_union"] == float(r["exact_union"])
            assert r["est_inter"] == float(r["exact_inter"])


def test_item_similarity_matches_pure_python(spark, sf_dir):
    """x68: buyer sets, Jaccard, support filter and deterministic
    top-5 ranking re-derived with dict/set arithmetic."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    buyers: dict[int, set] = {}
    for r in li:
        ck = orders.get(r["l_orderkey"])
        if ck is not None:
            buyers.setdefault(r["l_partkey"], set()).add(ck)
    by_buyer: dict[int, set] = {}
    for pk, cks in buyers.items():
        for ck in cks:
            by_buyer.setdefault(ck, set()).add(pk)
    inter: dict[tuple, int] = {}
    for pks in by_buyer.values():
        ps = sorted(pks)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                inter[(a, b)] = inter.get((a, b), 0) + 1
    neigh: dict[int, list] = {}
    for (a, b), i in inter.items():
        if i < 2:
            continue
        j = i / (len(buyers[a]) + len(buyers[b]) - i)
        neigh.setdefault(a, []).append((j, b, i))
        neigh.setdefault(b, []).append((j, a, i))
    expected = {}
    for p, lst in neigh.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rnk, (j, q, i) in enumerate(lst[:5], 1):
            expected[(p, q)] = (i, round(j, 4), rnk)
    got = {
        (r["partkey"], r["neighbor"]): (
            r["n_common_buyers"], round(r["jaccard"], 4), r["rnk"]
        )
        for r in REGISTRY["x68_item_similarity_topk"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == expected
    assert expected


def _bm25_python(docs: dict[int, list], terms, k1=1.2, b=0.75):
    import math

    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }
    scores = {}
    for did, toks in docs.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
        if s > 0:
            scores[did] = s
    return scores


def test_bm25_matches_pure_python(spark, sf_dir):
    """x69: scores and the deterministic top-10 re-derived with
    math.log arithmetic."""
    import re

    from python_etl_pipeline_spark.queries import (
        _BM25_TERMS,
        REGISTRY,
        _t,
    )

    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip())
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    scores = _bm25_python(docs, _BM25_TERMS)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expected = {
        did: (round(s, 4), rnk)
        for rnk, (did, s) in enumerate(ranked, 1)
    }
    got = {
        r["doc_id"]: (round(r["score"], 4), r["rnk"])
        for r in REGISTRY["x69_bm25_topk"].spark(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) == 10


def test_hybrid_rrf_matches_pure_python(spark, sf_dir):
    """ann23: both legs and the fusion re-derived in Python — BM25
    ranks via _bm25_python, cosine ranks via sequential float
    arithmetic over the same arrays, RRF = sum of 1/(60+rank)."""
    import math
    import re

    from python_etl_pipeline_spark.queries import (
        _BM25_TERMS,
        REGISTRY,
        _t,
    )

    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip())
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    scores = _bm25_python(docs, _BM25_TERMS)
    bm_rank = {
        did: rnk
        for rnk, (did, _) in enumerate(
            sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:1000],
            1,
        )
    }
    embs = {
        r["vec_id"]: r["embedding"]
        for r in _t(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    q = embs[0]
    qn = math.sqrt(sum(v * v for v in q))

    def cosim(v):
        dot = 0.0
        nn = 0.0
        for a, b in zip(v, q):
            dot += a * b
            nn += a * a
        return dot / (math.sqrt(nn) * qn)

    cos_rank = {
        vid: rnk
        for rnk, (vid, _) in enumerate(
            sorted(
                ((vid, cosim(v)) for vid, v in embs.items() if vid != 0),
                key=lambda kv: (-kv[1], kv[0]),
            )[:1000],
            1,
        )
    }
    rrf = {}
    for i in set(bm_rank) | set(cos_rank):
        rrf[i] = (1.0 / (60 + bm_rank[i]) if i in bm_rank else 0.0) + (
            1.0 / (60 + cos_rank[i]) if i in cos_rank else 0.0
        )
    top = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expected = {
        did: (
            round(s, 6),
            bm_rank.get(did),
            cos_rank.get(did),
            rnk,
        )
        for rnk, (did, s) in enumerate(top, 1)
    }
    got = {
        r["doc_id"]: (
            round(r["rrf"], 6),
            r["bm25_rank"],
            r["cos_rank"],
            r["rnk"],
        )
        for r in REGISTRY["ann23_hybrid_rrf"].spark(spark, sf_dir).collect()
    }
    assert got == expected


def test_quantile_normalize_matches_pure_python(spark, sf_dir):
    """x70: within-source percent ranks and the 257-point interpolated
    global grid re-derived in Python; every doc's normalized score
    must match its grid cell's quantile."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    rows = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(
            (float(r["n_chars"]), r["doc_id"])
        )
    pr = {}
    for src, lst in by_src.items():
        lst.sort()
        n = len(lst)
        for i, (s, did) in enumerate(lst):
            pr[did] = 0.0 if n == 1 else i / (n - 1)
    allscores = sorted(float(r["n_chars"]) for r in rows)
    m = len(allscores)

    def quantile(p):  # linear interpolation at p*(m-1)
        pos = p * (m - 1)
        lo = int(pos)
        hi = min(lo + 1, m - 1)
        frac = pos - lo
        return allscores[lo] * (1 - frac) + allscores[hi] * frac

    got = {
        r["doc_id"]: (round(r["pr"], 6), round(r["norm_score"], 4))
        for r in REGISTRY["x70_quantile_normalize"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(pr)
    for did, p in pr.items():
        cell = int(p * 256)
        want = quantile(cell / 256.0)
        gp, gn = got[did]
        assert abs(gp - round(p, 6)) <= 1e-6, did
        assert abs(gn - want) <= 5e-4, (did, gn, want)
    # normalization must be monotone in within-source rank
    for src, lst in by_src.items():
        ns = [got[did][1] for _, did in sorted(lst)]
        assert ns == sorted(ns), src


def test_ab_ztest_matches_pure_python(spark, sf_dir):
    """x71: assignment split, activation conversion and the pooled z
    statistic re-derived with hashlib + math."""
    import hashlib
    import math
    from datetime import timedelta

    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    t0: dict[int, object] = {}
    for r in evs:
        if r["user_id"] not in t0 or r["ts"] < t0[r["user_id"]]:
            t0[r["user_id"]] = r["ts"]
    conv = set()
    for r in evs:
        if (
            r["event_type"] == "purchase"
            and r["ts"] <= t0[r["user_id"]] + timedelta(days=1)
        ):
            conv.add(r["user_id"])
    arm = {
        u: (
            "A"
            if hashlib.md5(str(u).encode()).hexdigest() < "8"
            else "B"
        )
        for u in t0
    }
    na = sum(1 for u in arm if arm[u] == "A")
    nb = len(arm) - na
    ca = sum(1 for u in conv if arm[u] == "A")
    cb = len(conv) - ca
    pa, pb = ca / na, cb / nb
    pp = (ca + cb) / (na + nb)
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
    r = REGISTRY["x71_ab_test_ztest"].spark(spark, sf_dir).first()
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
        na, ca, nb, cb,
    )
    assert abs(r["z"] - round(z, 4)) <= 1e-6
    assert r["significant"] == (1 if abs(z) > 1.96 else 0)
    assert 0 < ca < na and 0 < cb < nb  # non-degenerate fixture


def test_perceptual_neardup_matches_pure_python(spark, sf_dir):
    """mm5: tile signatures, band candidates and the Hamming verify
    re-derived with hashlib; exact duplicates must land at hamming 0."""
    import hashlib
    import math

    from python_etl_pipeline_spark.queries import REGISTRY, _t

    texts = {
        r["doc_id"]: r["text"]
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def sig(t: str) -> str:
        w = math.ceil(len(t) / 16)
        return "".join(
            hashlib.md5(t[i * w : i * w + w].encode()).hexdigest()[0]
            for i in range(16)
        )

    sigs = {did: sig(t) for did, t in texts.items()}
    # 8 bands of 2 nibbles make the banding COMPLETE for hamming<=7
    # (pigeonhole), so the engine output must equal the brute-force
    # all-pairs <=4 ball — no recall caveat (r10 contract upgrade).
    expected = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(1 for x, y in zip(sigs[a], sigs[b]) if x != y)
            if h <= 4:
                expected[(a, b)] = h
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in REGISTRY["mm5_perceptual_neardup"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == expected
    # the perceptual property itself: a same-length single-character
    # edit touches exactly one tile, so the signature moves by at most
    # one nibble (inside the <=4 ball); an unrelated text lands far
    # outside it
    base = texts[sorted(texts)[0]]
    mid = len(base) // 2
    edited = base[:mid] + ("x" if base[mid] != "x" else "y") + base[mid + 1 :]

    def hamm(u, v):
        return sum(1 for x, y in zip(u, v) if x != y)

    assert hamm(sig(base), sig(edited)) <= 1
    other = texts[sorted(texts)[len(texts) // 2]]
    assert hamm(sig(base), sig(other)) > 4


def test_pmi_collocations_match_pure_python(spark, sf_dir):
    """tx27: document co-occurrence counts, PMI and the top-20 cut
    re-derived with set arithmetic + math.log."""
    import math
    import re
    from itertools import combinations

    from python_etl_pipeline_spark.queries import REGISTRY, _t

    docs = {
        r["doc_id"]: set(re.split(r"\s+", r["text"].strip()))
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    n = len(docs)
    df: dict[str, int] = {}
    co: dict[tuple, int] = {}
    for toks in docs.values():
        for t in toks:
            df[t] = df.get(t, 0) + 1
        for a, b in combinations(sorted(toks), 2):
            co[(a, b)] = co.get((a, b), 0) + 1
    scored = [
        (math.log(c * n / (df[a] * df[b])), a, b, c)
        for (a, b), c in co.items()
        if c >= 5
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expected = {
        (a, b): (c, round(pmi, 4), rnk)
        for rnk, (pmi, a, b, c) in enumerate(scored[:20], 1)
    }
    got = {
        (r["ta"], r["tb"]): (
            r["n_docs_together"], round(r["pmi"], 4), r["rnk"]
        )
        for r in REGISTRY["tx27_pmi_collocations"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == expected
    assert len(got) == 20


def test_behavior_entropy_matches_pure_python(spark, sf_dir):
    """x72: per-user transition matrices and the occupancy-weighted
    conditional entropy re-derived sequentially; deterministic users
    (single repeated transition type) must land at exactly 0."""
    import math

    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = sorted(
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    by_user: dict[int, list] = {}
    for r in evs:
        by_user.setdefault(r["user_id"], []).append(r["event_type"])
    expected = {}
    for u, seq in by_user.items():
        trans: dict[tuple, int] = {}
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
        if not trans:
            continue
        n = sum(trans.values())
        rows: dict[str, int] = {}
        for (a, _), c in trans.items():
            rows[a] = rows.get(a, 0) + c
        h = 0.0
        for a, rc in rows.items():
            hc = 0.0
            for (x, _), c in trans.items():
                if x == a:
                    p = c / rc
                    hc += -p * math.log(p)
            h += rc / n * hc
        expected[u] = (n, round(h, 4))
    got = {
        r["user_id"]: (r["n_transitions"], round(r["entropy_rate"], 4))
        for r in REGISTRY["x72_behavior_entropy"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(expected)
    for u in expected:
        assert got[u][0] == expected[u][0], u
        assert abs(got[u][1] - expected[u][1]) <= 2e-4, u
    assert expected
    assert all(h >= 0 for _, h in got.values())


def test_cdc_compaction_matches_pure_python(spark, sf_dir):
    """i12: the first/last net-effect fold re-derived sequentially,
    including the insert-then-delete cancellation."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = sorted(
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    streams: dict[int, list] = {}
    for r in evs:
        if r["event_type"] == "error":
            continue
        op = {"signup": "I", "purchase": "D"}.get(r["event_type"], "U")
        streams.setdefault(r["user_id"], []).append((op, r["value"]))
    expected = {}
    for u, ops in streams.items():
        first_op = ops[0][0]
        last_op = ops[-1][0]
        if first_op == "I" and last_op == "D":
            continue
        last_val = None
        for op, v in ops:
            if op != "D" and v is not None:
                last_val = v
        if last_op == "D":
            expected[u] = ("D", None)
        else:
            net = "I" if first_op == "I" else "U"
            expected[u] = (
                net, None if last_val is None else round(last_val, 4)
            )
    got = {
        r["user_id"]: (
            r["op"],
            None if r["value"] is None else round(r["value"], 4),
        )
        for r in REGISTRY["i12_cdc_compaction"].spark(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected


def test_fifo_match_matches_pure_python(spark, sf_dir):
    """x73: per-user ordinal matching re-derived with sorted lists;
    unmatched tails must drop."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = sorted(
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    views: dict[int, list] = {}
    purch: dict[int, list] = {}
    for r in evs:
        if r["event_type"] == "view":
            views.setdefault(r["user_id"], []).append(r["ts"])
        elif r["event_type"] == "purchase":
            purch.setdefault(r["user_id"], []).append(r["ts"])
    expected = {}
    for u in set(views) & set(purch):
        for k, (v, p) in enumerate(zip(views[u], purch[u]), 1):
            expected[(u, k)] = (
                v, p, round((p - v).total_seconds(), 2)
            )
    got = {
        (r["user_id"], r["rn"]): (
            r["view_ts"], r["purchase_ts"], round(r["lag_sec"], 2)
        )
        for r in REGISTRY["x73_fifo_match"].spark(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected


def test_mips_ranks_agree_and_match_pure_python(spark, sf_dir):
    """ann24: the norm-augmentation theorem must hold as data (raw-dot
    rank == augmented-cosine rank on every output row), and the top-10
    dots re-derive with sequential float arithmetic."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    embs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in _t(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    q = embs[0]
    dots = {
        vid: sum(a * b for a, b in zip(v, q))
        for vid, v in embs.items()
        if vid != 0
    }
    top = sorted(dots.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expected = {
        vid: (round(d, 4), rnk) for rnk, (vid, d) in enumerate(top, 1)
    }
    rows = REGISTRY["ann24_mips_topk"].spark(spark, sf_dir).collect()
    got = {r["vec_id"]: (round(r["dot"], 4), r["rnk"]) for r in rows}
    assert got == expected
    for r in rows:
        assert r["ranks_agree"] == 1, r
        assert r["rnk"] == r["aug_rnk"], r


def test_cohort_ltv_matches_pure_python(spark, sf_dir):
    """x74: cohort assignment, weekly revenue cells and the cumulative
    per-user curve re-derived sequentially; curves must be
    non-decreasing along week_offset."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    ).collect()

    def week(ts):
        # ISO Monday truncation, matching date_trunc('week', ...)
        d = ts.date()
        from datetime import timedelta

        return d - timedelta(days=d.weekday())

    first_ts: dict[int, object] = {}
    for r in evs:
        if r["user_id"] not in first_ts or r["ts"] < first_ts[r["user_id"]]:
            first_ts[r["user_id"]] = r["ts"]
    cohort = {u: week(t) for u, t in first_ts.items()}
    sizes: dict[object, int] = {}
    for c in cohort.values():
        sizes[c] = sizes.get(c, 0) + 1
    cells: dict[tuple, float] = {}
    for r in evs:
        if r["event_type"] != "purchase" or r["value"] is None:
            continue
        c = cohort[r["user_id"]]
        off = (week(r["ts"]) - c).days // 7
        cells[(c, off)] = cells.get((c, off), 0.0) + r["value"]
    expected = {}
    for c in sizes:
        cum = 0.0
        for off in sorted(o for (cc, o) in cells if cc == c):
            cum += cells[(c, off)]
            expected[(c, off)] = (sizes[c], round(cum / sizes[c], 4))
    got = {
        (r["cohort_week"].date(), r["week_offset"]): (
            r["n_cohort"], round(r["cum_ltv_per_user"], 4)
        )
        for r in REGISTRY["x74_cohort_ltv"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][0] == expected[k][0], k
        assert abs(got[k][1] - expected[k][1]) <= 2e-4, k
    # monotone curves
    by_c: dict[object, list] = {}
    for (c, off), (_, v) in got.items():
        by_c.setdefault(c, []).append((off, v))
    for c, pts in by_c.items():
        vals = [v for _, v in sorted(pts)]
        assert vals == sorted(vals), c


def test_rolling_active_users_matches_pure_python(spark, sf_dir):
    """x75: DAU/WAU/stickiness re-derived with per-day user sets; WAU
    must equal the union of the trailing 7 daily sets."""
    from datetime import timedelta

    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = _t(spark, sf_dir, "events").select("user_id", "ts").collect()
    daysets: dict[object, set] = {}
    for r in evs:
        daysets.setdefault(r["ts"].date(), set()).add(r["user_id"])
    got = {
        r["day"].date(): (r["dau"], r["wau"], round(r["stickiness"], 4))
        for r in REGISTRY["x75_rolling_active_users"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(daysets)
    for d, users in daysets.items():
        wau_set = set()
        for k in range(7):
            wau_set |= daysets.get(d - timedelta(days=k), set())
        dau, wau, stick = got[d]
        assert dau == len(users), d
        assert wau == len(wau_set), d
        assert abs(stick - round(dau / wau, 4)) <= 1e-6, d


def test_abc_analysis_matches_pure_python(spark, sf_dir):
    """x76: exact integer revenue, the cumulative share and the class
    boundaries re-derived with int arithmetic; Pareto invariants
    (class ordering along the ranking, share monotone to 1.0)."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    ).collect()
    rc: dict[int, int] = {}
    for r in li:
        c = round(r["l_extendedprice"] * 100) * round(
            100 - r["l_discount"] * 100
        )
        rc[r["l_partkey"]] = rc.get(r["l_partkey"], 0) + c
    total = sum(rc.values())
    ranked = sorted(rc.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = {}
    cum = 0
    for pk, c in ranked:
        cum += c
        share = cum / total
        cls = "A" if share <= 0.8 else ("B" if share <= 0.95 else "C")
        expected[pk] = ((c + 50) // 100 / 100, round(share, 6), cls)
    got = {
        r["partkey"]: (r["revenue"], round(r["cum_share"], 6), r["abc_class"])
        for r in REGISTRY["x76_abc_analysis"].spark(spark, sf_dir).collect()
    }
    assert got == expected
    assert {c for _, _, c in got.values()} == {"A", "B", "C"}
    # shares monotone along the ranking and ending at 1
    shares = [got[pk][1] for pk, _ in ranked]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) <= 1e-6


def test_streaming_rolling_active_folds(spark, tmp_path):
    """x75's operational twin: the DAU/WAU report served from the
    folded (user, day) state must equal the batch recompute over
    everything ingested so far; redelivery is idempotent."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from python_etl_pipeline_spark.operators.aggregate import (
        rolling_active_users,
        user_days,
    )
    from python_etl_pipeline_spark.streaming.file_stream import (
        compact_user_days_state,
        rolling_active_from_state_dir,
        stream_rolling_active_available_now,
        user_days_batch_writer,
        user_days_from_state_dir,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def write(path, rows):
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(
                        [r[0] for r in rows], pa.int64()
                    ),
                    "ts": pa.array(
                        [
                            datetime.datetime(2024, 1, r[1], r[2])
                            for r in rows
                        ],
                        pa.timestamp("us"),
                    ),
                }
            ),
            path,
        )

    def report(df):
        return {
            r["day"]: (r["dau"], r["wau"], r["stickiness"])
            for r in df.collect()
        }

    b1 = [(1, 1, 9), (2, 1, 10), (1, 2, 9), (3, 2, 11)]
    b2 = [(2, 3, 9), (4, 3, 10), (1, 9, 9), (2, 9, 12)]
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def full(rows):
        d = spark.createDataFrame(
            [
                (r[0], datetime.datetime(2024, 1, r[1], r[2]))
                for r in rows
            ],
            schema,
        )
        return report(rolling_active_users(user_days(d)))

    write(str(src / "b1.parquet"), b1)
    stream_rolling_active_available_now(spark, str(src), schema, state, ckpt)
    assert report(rolling_active_from_state_dir(spark, state)) == full(b1)

    write(str(src / "b2.parquet"), b2)
    stream_rolling_active_available_now(spark, str(src), schema, state, ckpt)
    assert report(rolling_active_from_state_dir(spark, state)) == full(
        b1 + b2
    )

    before = report(rolling_active_from_state_dir(spark, state))
    compact_user_days_state(spark, state)
    assert report(rolling_active_from_state_dir(spark, state)) == before

    # redelivery idempotency at the writer level
    writer = user_days_batch_writer(spark, state)
    d2 = spark.createDataFrame(
        [(r[0], datetime.datetime(2024, 1, r[1], r[2])) for r in b2],
        schema,
    )
    writer(d2, 99)
    once = {
        (r["user_id"], r["day"])
        for r in user_days_from_state_dir(spark, state).collect()
    }
    writer(d2, 99)
    again = {
        (r["user_id"], r["day"])
        for r in user_days_from_state_dir(spark, state).collect()
    }
    assert once == again


def test_seasonal_profile_matches_pure_python(spark, sf_dir):
    """x77: per-type day-of-week means and seasonal indexes
    re-derived with dict arithmetic; indexes must average to ~1
    weighted by day counts."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = _t(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily: dict[tuple, int] = {}
    for r in evs:
        daily[(r["event_type"], r["ts"].date())] = (
            daily.get((r["event_type"], r["ts"].date()), 0) + 1
        )
    by_cell: dict[tuple, list] = {}
    by_type: dict[str, list] = {}
    for (et, d), n in daily.items():
        by_cell.setdefault((et, d.isoweekday()), []).append(n)
        by_type.setdefault(et, []).append(n)
    expected = {}
    for (et, dow), ns in by_cell.items():
        o = sum(by_type[et]) / len(by_type[et])
        m = sum(ns) / len(ns)
        expected[(et, dow)] = (len(ns), round(m, 4), round(m / o, 4))
    got = {
        (r["event_type"], r["isodow"]): (
            r["n_days"], round(r["dow_mean"], 4),
            round(r["seasonal_index"], 4),
        )
        for r in REGISTRY["x77_seasonal_profile"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == expected
    # weighted mean of indexes is 1 per type
    for et, ns in by_type.items():
        tot_days = len(ns)
        wsum = sum(
            got[(et, dow)][0] * got[(et, dow)][2]
            for (t, dow) in got
            if t == et
        )
        assert abs(wsum / tot_days - 1.0) <= 5e-3, et


def test_trend_forecast_matches_pure_python(spark, sf_dir):
    """x78: the OLS normal equations re-derived with exact ints; the
    fitted line must pass through the centroid and the forecast must
    equal intercept + slope*(tmax+7)."""
    from python_etl_pipeline_spark.queries import REGISTRY, _t

    evs = _t(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily: dict[tuple, int] = {}
    for r in evs:
        daily[(r["event_type"], r["ts"].date())] = (
            daily.get((r["event_type"], r["ts"].date()), 0) + 1
        )
    series: dict[str, list] = {}
    for (et, d), n in daily.items():
        series.setdefault(et, []).append((d, n))
    expected = {}
    for et, pts in series.items():
        d0 = min(d for d, _ in pts)
        ty = [((d - d0).days, n) for d, n in pts]
        n = len(ty)
        st = sum(t for t, _ in ty)
        sy = sum(y for _, y in ty)
        sty = sum(t * y for t, y in ty)
        stt = sum(t * t for t, _ in ty)
        tmax = max(t for t, _ in ty)
        slope = (n * sty - st * sy) / (n * stt - st * st)
        intercept = (sy - slope * st) / n
        expected[et] = (
            n,
            round(slope, 6),
            round(intercept, 4),
            round(intercept + slope * (tmax + 7), 2),
        )
        # the OLS line passes through the centroid
        assert abs((intercept + slope * st / n) - sy / n) <= 1e-9
    got = {
        r["event_type"]: (
            r["n_days"], round(r["slope"], 6),
            round(r["intercept"], 4),
            round(r["forecast_next_week"], 2),
        )
        for r in REGISTRY["x78_trend_forecast"].spark(spark, sf_dir).collect()
    }
    assert got == expected
