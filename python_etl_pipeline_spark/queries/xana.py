"""Curation / analytics x-series (second half by registration order): MVs, allocators, drift, funnels, cohorts, forecasting, behavioral analytics.

Mechanically split from the former flat queries.py (r10);
docstrings and within-family registration order unchanged.
"""

from ._shared import *  # noqa: F401,F403 — F, Window, scalar/op helpers, register
from ._shared import _t, AS_OF, REGISTRY, register  # noqa: F401
from ._helpers import (  # noqa: F401
    _DUCK_COMP,
    _DUCK_QUALITY,
    _KMEANS_CHAINS,
    _bm25_scores_spark,
    _bm25_scores_sql,
    _kmeans_iter_sql,
)

_X26_SQL = """
WITH blocked AS (
  SELECT c_custkey, c_name, substring(c_name, 1, 16) AS blk FROM customer
)
SELECT a.c_custkey, count(*) AS n_fuzzy_matches
FROM blocked a JOIN blocked b
  ON a.blk = b.blk AND a.c_custkey <> b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
GROUP BY a.c_custkey
"""


@register("x26_fuzzy_match", _X26_SQL)
def x26_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching (edit-distance join): customers whose names
    are within Levenshtein distance 1, found via the standard blocked
    self-join — block on a name prefix, compare only within blocks.
    All-pairs edit distance is O(N²·len²) and unshippable at 100 TB; the
    prefix block makes the join a hash equi-join whose cost is
    Σ(block²), controlled by block granularity (recall trades off at
    block boundaries — production stacks use multiple blocking passes,
    e.g. prefix + phonetic key, and union the candidates). The
    distance filter itself is JVM codegen (F.levenshtein), no UDF."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    blocked = c.withColumn("blk", F.substring("c_name", 1, 16))
    # spread the probe side across blocks: the dim-sized scan arrives in
    # one split, and with the build side broadcast the whole O(Σblock²)
    # levenshtein work would otherwise run as ONE task. The partition
    # count is explicit because AQE would coalesce the tiny-by-bytes
    # shuffle back to one partition — the bytes are small, the CPU isn't
    # (4.8s -> 0.9s at sf0.1).
    par = spark.sparkContext.defaultParallelism
    a = blocked.repartition(par, "blk").select(
        F.col("c_custkey"), F.col("c_name").alias("_na"), "blk"
    )
    b = blocked.select(
        F.col("c_custkey").alias("_kb"), F.col("c_name").alias("_nb"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(
            (F.col("c_custkey") != F.col("_kb"))
            & (F.levenshtein(F.col("_na"), F.col("_nb")) <= 1)
        )
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_fuzzy_matches"))
    )


_MIX_TARGETS = [("en", 0.4), ("de", 0.15), ("es", 0.15), ("fr", 0.15), ("zh", 0.15)]


_X27_SQL = f"""
WITH targets (lang, share) AS (
  VALUES {', '.join(f"('{l}', {s})" for l, s in _MIX_TARGETS)}
),
budget AS (SELECT cast(round(count(*) * 0.5) AS BIGINT) AS total FROM documents),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT r.doc_id, r.lang
FROM ranked r JOIN targets t ON r.lang = t.lang CROSS JOIN budget b
WHERE r.rk <= cast(round(t.share * b.total) AS BIGINT)
"""


@register("x27_corpus_mix", _X27_SQL)
def x27_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: downsample each language to a TARGET share of a
    fixed token/doc budget (half the corpus here) — the mixture step
    every pretraining pipeline runs between curation and packing.
    Selection is deterministic (per-language rank over md5(doc_id), keep
    the first share×budget): re-runs and appends pick the same winners,
    unlike df.sample's partition-seeded draw. The per-group rank is one
    shuffle on lang; at 100 TB swap the exact rank for the pure-
    projection hash-threshold form (keep where md5-fraction < rate,
    rate = target/actual from a first-pass count) — no rank, no sort,
    approximate counts within binomial noise."""
    d = _t(spark, sf_dir, "documents")
    total = d.count()
    budget = round(total * 0.5)
    targets = spark.createDataFrame(_MIX_TARGETS, "lang string, share double")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("doc_id", "lang").withColumn("rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(targets), "lang")
        .filter(F.col("rk") <= F.round(F.col("share") * budget).cast("bigint"))
        .select("doc_id", "lang")
    )


@register(
    "x28_source_cap",
    f"""
    WITH q AS (
      SELECT doc_id, source, {_DUCK_QUALITY} AS quality FROM documents
    ),
    r AS (
      SELECT doc_id, source, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rk
      FROM q
    )
    SELECT doc_id, source, quality, cast(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 15
    """,
)
def x28_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contribution capping: keep the best K documents from
    each source (quality desc, doc_id tiebreak) so no single crawl/dump
    dominates the training mix — the standard guard against one domain
    flooding the corpus.

    One shuffle, keyed on source. At 100 TB the win is that only rank
    state crosses the wire per group — but a mega-source still lands on
    one reducer; the scale mitigation is a cheap pre-filter (per input
    partition, keep the local top-K before the shuffle — K per map task
    bounds the exchange at tasks*K rows per source), which AQE's skew
    splitting cannot do for rank. K=15 caps every 25-doc source in the
    test fixture so the pruning path is actually exercised."""
    from ..llm import quality_score

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id")
    return (
        d.select("doc_id", "source", quality_score(F.col("text")).alias("quality"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 15)
    )


_X44_SQL = """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
tot AS (SELECT sum(pow(n, 0.5)) AS sw, sum(n) AS total FROM c),
tgt AS (
  SELECT lang,
         least(n, cast(floor(0.5 * total * pow(n, 0.5) / sw) AS BIGINT)) AS take
  FROM c CROSS JOIN tot
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT r.doc_id, r.lang
FROM ranked r JOIN tgt USING (lang)
WHERE r.rk <= tgt.take
"""


@register("x44_temperature_mix", _X44_SQL)
def x44_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multinomial source weighting — the standard
    multilingual-pretraining rebalance (XLM-R's alpha-sampling, also
    used for domain mixing in LLaMA-class runs): sample language i with
    probability proportional to n_i^alpha. With alpha = 0.5 the size
    distribution is flattened — the dominant language is downsampled
    hardest while low-resource ones keep (or approach) full
    representation — which is exactly the knob x27's FIXED share table
    cannot express: there the shares are hand-set constants; here they
    are DERIVED from the observed sizes, so the mix adapts as the
    corpus grows. Take_i = min(n_i, floor(budget * n_i^alpha / sum_j
    n_j^alpha)) against a 50%-of-corpus budget; selection is the same
    deterministic md5-rank-within-language as x27, so re-runs and
    engines agree row-for-row. Plan: one lang-keyed count agg
    (5 rows), the 1-row weight total broadcast back, one lang-keyed
    rank window — the data-sized stage is a single shuffle on lang. At
    100 TB, swap the exact rank for the hash-threshold projection
    (keep where md5-fraction < take_i/n_i) and the rank shuffle
    disappears entirely; the rates come from the same 5-row agg."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    c = d.groupBy("lang").agg(F.count("*").alias("n"))
    tot = c.agg(
        F.sum(F.pow("n", F.lit(0.5))).alias("sw"),
        F.sum("n").alias("total"),
    )
    tgt = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.col("n"),
            F.floor(0.5 * F.col("total") * F.pow("n", F.lit(0.5)) / F.col("sw")),
        ).cast("bigint").alias("take"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.withColumn("rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(tgt), "lang")
        .filter(F.col("rk") <= F.col("take"))
        .select("doc_id", "lang")
    )


_X45_BUCKETS = 1_000_000


_X45_SQL = f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
tot AS (SELECT sum(pow(n, 0.5)) AS sw, sum(n) AS total FROM c),
tgt AS (
  SELECT lang, n,
         least(n, cast(floor(0.5 * total * pow(n, 0.5) / sw) AS BIGINT)) AS take
  FROM c CROSS JOIN tot
),
thr AS (
  SELECT lang,
         cast(floor({_X45_BUCKETS} * take * 1.0 / n) AS BIGINT) AS threshold
  FROM tgt
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr USING (lang)
WHERE {hash_bucket_sql('d.doc_id', _X45_BUCKETS)} < thr.threshold
"""


@register("x45_temperature_mix_threshold", _X45_SQL)
def x45_temperature_mix_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of x44: IDENTICAL alpha=0.5 temperature rates,
    but selection by hash PERCENTILE (keep where md5-bucket(doc_id) <
    rate) instead of exact per-language rank — the swap x27 and x44's
    docstrings promise, delivered as its own verified query. The rank
    window's corpus-sized shuffle on lang disappears entirely: the
    data-sized stage is scan -> broadcast-join the 5-row threshold
    table -> filter -> project, a map-only pipeline whose only
    exchanges carry the 5-row count/threshold frames. The cost is
    exactness: kept counts land within binomial noise of the target
    (|kept - rate*n| is O(sqrt(n)) — pinned in test_sampling.py)
    instead of hitting it exactly, the right trade when n_i is
    billions and the target itself derives from the data. Still fully
    deterministic: membership depends only on md5(doc_id), so re-runs,
    engines, and appends agree row-for-row (appends never reshuffle
    old members — unlike the rank form, where new docs shift
    everyone's rank), and the DuckDB oracle hash-matches exactly."""
    from ..operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    c = d.groupBy("lang").agg(F.count("*").alias("n"))
    tot = c.agg(
        F.sum(F.pow("n", F.lit(0.5))).alias("sw"),
        F.sum("n").alias("total"),
    )
    thr = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.floor(
            _X45_BUCKETS
            * F.least(
                F.col("n"),
                F.floor(
                    0.5 * F.col("total") * F.pow("n", F.lit(0.5)) / F.col("sw")
                ),
            )
            / F.col("n")
        ).cast("bigint").alias("threshold"),
    )
    return (
        d.join(F.broadcast(thr), "lang")
        .filter(hash_bucket("doc_id", _X45_BUCKETS) < F.col("threshold"))
        .select("doc_id", "lang")
    )


@register(
    "x29_doc_chunks",
    """
    WITH s AS (
      SELECT doc_id, text, unnest(generate_series(0, greatest(length(text) - 1, 0), 150)) AS start
      FROM documents
    )
    SELECT doc_id,
           cast(start AS BIGINT) AS start,
           substring(text, start + 1, 200) AS chunk,
           cast(length(substring(text, start + 1, 200)) AS BIGINT) AS chunk_len
    FROM s
    """,
)
def x29_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunking (200-char windows, stride 150)
    — the pre-embedding split every retrieval/embedding pipeline runs
    over long documents, keeping the (doc_id, start) lineage so chunks
    map back to source spans.

    sequence+explode is a narrow map-side fan-out: zero shuffles at any
    scale. The fan-out multiplies bytes ~len/stride×, so at 100 TB the
    input split size is the knob — shrink
    spark.sql.files.maxPartitionBytes so post-explode partitions still
    fit in memory (same note as the shingle fan-out in dd2/dd3)."""
    d = _t(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0), F.greatest(F.length("text") - 1, F.lit(0)), F.lit(150)
    )
    return (
        d.select("doc_id", "text", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            F.col("start").cast("bigint").alias("start"),
            F.expr("substring(text, start + 1, 200)").alias("chunk"),
            F.length(F.expr("substring(text, start + 1, 200)"))
            .cast("bigint")
            .alias("chunk_len"),
        )
    )


@register(
    "x46_retractable_mv",
    """
    WITH survivors AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 11 <> 0
    ),
    inserted AS (
      SELECT o_orderpriority, o_totalprice AS price
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    post AS (SELECT * FROM survivors UNION ALL SELECT * FROM inserted)
    SELECT o_orderpriority, count(*) AS n_rows,
           round(sum(price), 2) AS sum_val
    FROM post GROUP BY 1
    """,
)
def x46_retractable_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance under a FULL CDC feed — deletes
    and updates, not just i5's inserts: the stored per-priority
    count/sum state is folded with SIGNED partials from a
    before/after-image change feed (plans.cdc_signed_partials — the
    retraction algebra of Flink retract streams / DBSP Z-sets: I=+1/+new,
    D=-1/-old, U=0/new-old). The oracle recomputes the aggregate from
    scratch over the post-CDC table, so a green row proves fold ==
    full recompute under retraction — at 100 TB the difference between
    an O(|batch| + |state|) maintenance step and re-aggregating the
    whole fact history every batch. Feed (deterministic, x25's key
    algebra): %11 keys deleted, %7 (surviving) keys repriced +100,
    %13 keys re-inserted under fresh ids. Zero-count keys are dropped
    (the MV row no longer exists); the empty-to-zero path is pinned in
    tests/test_incremental.py."""
    from ..plans import cdc_signed_partials, merge_agg_state

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    state = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("o_totalprice").alias("sum_val"),
    )
    dels = o.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderpriority",
        F.lit("D").alias("op"),
        F.col("o_totalprice").alias("old_val"),
        F.lit(None).cast("double").alias("new_val"),
    )
    upds = o.filter(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 11 != 0)
    ).select(
        "o_orderpriority",
        F.lit("U").alias("op"),
        F.col("o_totalprice").alias("old_val"),
        (F.col("o_totalprice") + 100.0).alias("new_val"),
    )
    ins = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderpriority",
        F.lit("I").alias("op"),
        F.lit(None).cast("double").alias("old_val"),
        F.col("o_totalprice").alias("new_val"),
    )
    feed = dels.unionByName(upds).unionByName(ins)
    delta = cdc_signed_partials(
        feed, ["o_orderpriority"], sum_col="sum_val"
    )
    merged = merge_agg_state(
        state, delta, ["o_orderpriority"], count_col="n_rows", sum_cols=["sum_val"]
    )
    return merged.filter(F.col("n_rows") > 0).select(
        "o_orderpriority", "n_rows", F.round("sum_val", 2).alias("sum_val")
    )


_X47_BUCKETS = 1_000_000


def _x47_sql() -> str:
    from ..operators.sampling import hash_bucket_sql

    return f"""
    WITH c AS (
      SELECT lang, count(*) AS n_docs, sum(n_chars) AS chars
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT sum(sqrt(chars)) AS sw, sum(chars) AS total FROM c),
    plan AS (
      SELECT lang, n_docs, chars,
             least(4.0, 2.0 * total / (sw * sqrt(chars))) AS rpt
      FROM c CROSS JOIN tot
    ),
    p2 AS (
      SELECT lang, n_docs, chars, cast(floor(rpt) AS BIGINT) AS n_full,
             cast(floor((rpt - floor(rpt)) * {_X47_BUCKETS}) AS BIGINT) AS thr
      FROM plan
    ),
    fulls AS (
      SELECT lang, unnest(range(1, n_full + 1)) AS epoch,
             n_docs AS sel_docs, chars AS sel_chars
      FROM p2 WHERE n_full >= 1
    ),
    partial AS (
      SELECT d.lang, p2.n_full + 1 AS epoch, count(*) AS sel_docs,
             sum(d.n_chars) AS sel_chars
      FROM documents d JOIN p2 USING (lang)
      WHERE {hash_bucket_sql('d.doc_id', _X47_BUCKETS)} < p2.thr
      GROUP BY 1, 2
    )
    SELECT lang, cast(epoch AS BIGINT) AS epoch,
           cast(sel_docs AS BIGINT) AS n_docs,
           cast(sel_chars AS BIGINT) AS n_chars
    FROM (SELECT * FROM fulls UNION ALL SELECT * FROM partial)
    """


@register("x47_epoch_mixture", None)  # sql attached below
def x47_epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aware data-constrained mixture plan (Muennighoff et al.
    2023, arXiv:2305.16264: repeating data up to ~4 epochs is nearly as
    good as fresh data; x44's temperature weights say WHAT share each
    domain deserves, this says HOW to hit it when a domain is smaller
    than its share): per-language char-budget targets from alpha=0.5
    temperature weights against a 2x-corpus token budget, converted to
    a repeat factor capped at 4 epochs — emitted as the materialization
    plan a dataloader consumes: one row per (lang, epoch) with the doc
    and char counts that epoch contributes. Full epochs replay the
    whole domain; the final fractional epoch selects docs by the
    deterministic md5-bucket threshold (x45's zero-shuffle membership
    test), so re-runs and engines agree row-for-row. Plan shape: one
    lang-keyed agg (5 rows) + a 1-row total broadcast back + a
    5-row-table broadcast join onto the corpus for the partial epoch —
    the only corpus-sized stage is one scan; at 100 TB the epoch
    EXPANSION stays virtual (a loader reads the plan, not an exploded
    copy of the corpus)."""
    from ..operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    c = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    tot = c.agg(
        F.sum(F.sqrt("chars")).alias("sw"), F.sum("chars").alias("total")
    )
    rpt = F.least(
        F.lit(4.0), 2.0 * F.col("total") / (F.col("sw") * F.sqrt("chars"))
    )
    plan = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "chars",
        F.floor(rpt).cast("bigint").alias("n_full"),
        F.floor((rpt - F.floor(rpt)) * _X47_BUCKETS).cast("bigint").alias("thr"),
    )
    fulls = (
        plan.filter(F.col("n_full") >= 1)
        .select(
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("n_full"))).alias("ep"),
            F.col("n_docs").alias("sel_docs"),
            F.col("chars").alias("sel_chars"),
        )
        .select(
            "lang",
            F.col("ep").cast("bigint").alias("epoch"),
            "sel_docs",
            "sel_chars",
        )
    )
    partial = (
        d.join(F.broadcast(plan), "lang")
        .filter(hash_bucket(F.col("doc_id"), _X47_BUCKETS) < F.col("thr"))
        .groupBy("lang", (F.col("n_full") + 1).cast("bigint").alias("epoch"))
        .agg(
            F.count("*").cast("bigint").alias("sel_docs"),
            F.sum("n_chars").alias("sel_chars"),
        )
    )
    return fulls.unionByName(partial).select(
        "lang",
        "epoch",
        F.col("sel_docs").alias("n_docs"),
        F.col("sel_chars").cast("bigint").alias("n_chars"),
    )


REGISTRY["x47_epoch_mixture"].sql = _x47_sql()


_X48_TARGET = 100  # per-cell keep budget


def _x48_sql() -> str:
    from ..operators.sampling import hash_bucket_sql

    hb = hash_bucket_sql("a.vec_id", 1000000)
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4),
    {_KMEANS_CHAINS}
    assign AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    sizes AS (SELECT cell, count(*) AS n_members FROM assign GROUP BY 1),
    kept AS (
      SELECT a.cell, s.n_members,
             CASE WHEN {hb} < floor({_X48_TARGET} * 1000000.0 / s.n_members)
                  THEN 1 ELSE 0 END AS keep
      FROM assign a JOIN sizes s USING (cell)
    )
    SELECT cell, cast(n_members AS BIGINT) AS n_members,
           cast(sum(keep) AS BIGINT) AS n_kept,
           round(sum(keep) * 1.0 / n_members, 4) AS keep_rate
    FROM kept GROUP BY cell, n_members
    """


@register("x48_density_downsample", None)  # sql attached below
def x48_density_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-proportional downsampling — the diversity-preserving
    counterpart of SemDeDup (dd11): instead of deleting near-identical
    pairs, keep each k-means cell down to a fixed per-cell budget, so
    dense regions of embedding space (boilerplate, templates) are
    thinned hard while sparse regions (rare content) survive intact —
    the cluster-based data-pruning recipe of Sorscher et al. 2022
    (arXiv:2206.14486). Membership is decided by a content hash of the
    vector id against floor(budget * 1e6 / cell_size), so the sample is
    deterministic across runs, engines, partitionings, and appends
    (operators/sampling's split discipline — never df.sample()).

    Plan shape: kmeans_assign's broadcast-centroid Lloyd loop (the
    assignment is the only vector-sized shuffle), a cell-sized count,
    and the keep decision is a MAP-SIDE expression on the broadcast
    4-row size table — the corpus never shuffles for the sampling
    itself. The oracle replays the Lloyd chains (ann4's CTEs) and the
    identical md5 keep-hash."""
    from ..llm.similarity import kmeans_assign
    from ..operators.sampling import hash_bucket

    e = _t(spark, sf_dir, "embeddings")
    assign = kmeans_assign(e, k=4, iters=2, materialize=True)
    sizes = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
    thresh = F.floor(F.lit(_X48_TARGET * 1000000.0) / F.col("n_members"))
    kept = assign.join(F.broadcast(sizes), "cell").select(
        "cell",
        "n_members",
        (hash_bucket(F.col("vec_id"), 1000000) < thresh).cast("int").alias("keep"),
    )
    return kept.groupBy("cell", "n_members").agg(
        F.sum("keep").cast("bigint").alias("n_kept"),
        F.round(F.sum("keep") * 1.0 / F.col("n_members"), 4).alias("keep_rate"),
    ).select(
        "cell",
        F.col("n_members").cast("bigint").alias("n_members"),
        "n_kept",
        "keep_rate",
    )


REGISTRY["x48_density_downsample"].sql = _x48_sql()


_X49_CHUNK = 50       # docs per pseudo-file


_X49_TARGET = 16384   # compaction bin target bytes


@register(
    "x49_compaction_bins",
    f"""
    WITH chunks AS (
      SELECT source, cast(floor(doc_id / {_X49_CHUNK}) AS BIGINT) AS chunk_id,
             sum(n_chars) AS bytes
      FROM documents GROUP BY 1, 2
    ),
    ordered AS (
      SELECT source, chunk_id, bytes,
             sum(bytes) OVER (
               PARTITION BY source ORDER BY bytes DESC, chunk_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM chunks
    )
    SELECT source, cast(floor((cum - bytes) / {_X49_TARGET}.0) AS BIGINT) AS bin,
           cast(count(*) AS BIGINT) AS n_chunks,
           cast(sum(bytes) AS BIGINT) AS bin_bytes
    FROM ordered GROUP BY 1, 2
    """,
)
def x49_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLANNER — the maintenance query behind
    OPTIMIZE/rewriteDataFiles: given a file inventory (here each run of
    50 doc ids per source stands in for a data file, sized by
    its text bytes), assign files to merge bins of ~16 KiB
    by walking the size-descending order and cutting on the running
    total (next-fit-decreasing — within 2x of optimal bin count, and
    unlike first-fit it is pure window algebra, so both engines replay
    it exactly). Output: the merge manifest a compactor would execute,
    one row per (source, bin).

    Plan shape: everything after the (source, chunk) byte agg is
    file-METADATA-sized — the window partitions by source (keyed
    shuffle of inventory rows, never data bytes), exactly how a table
    service plans compaction over a 100 TB table: the planner reads
    the manifest, only the executor touches data."""
    d = _t(spark, sf_dir, "documents")
    chunks = (
        d.groupBy(
            "source",
            F.floor(F.col("doc_id") / _X49_CHUNK).cast("bigint").alias("chunk_id"),
        )
        .agg(F.sum("n_chars").alias("bytes"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("bytes").desc(), "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = chunks.withColumn("cum", F.sum("bytes").over(w))
    return (
        ordered.groupBy(
            "source",
            F.floor((F.col("cum") - F.col("bytes")) / float(_X49_TARGET))
            .cast("bigint")
            .alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("bytes").cast("bigint").alias("bin_bytes"),
        )
    )


_X50_K = 20


def _x50_sql() -> str:
    from ..llm.dedup import _hexint_sql

    hexed = _hexint_sql("md5('ps' || '|' || cast(doc_id AS VARCHAR))", 8)
    u = f"(({hexed}) + 0.5) / 4294967296.0"
    return f"""
    WITH scored AS (
      SELECT doc_id, n_chars, round(ln({u}) / n_chars, 8) AS priority
      FROM documents
    )
    SELECT doc_id, cast(n_chars AS BIGINT) AS n_chars, priority
    FROM scored ORDER BY priority DESC, doc_id LIMIT {_X50_K}
    """


@register("x50_priority_sample", None)  # sql attached below
def x50_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-Res): each row draws priority
    ln(u) / weight from a content-hash uniform u and the global top-k
    by priority is an exact weighted reservoir sample — the fixed-k
    counterpart of x19's Bernoulli sampler, and the one a summarizer
    keeps when the OUTPUT size must be bounded no matter how the
    corpus grows. Hash-derived u makes the sample a pure function of
    row identity: stable across runs, engines, partitionings, and
    executor counts (df.sample() is none of these), and mergeable —
    top-k of per-shard top-k's equals the global top-k, so a 100 TB
    run keeps k rows per shard and one k-row final heap.

    Plan shape: zero shuffles — a map-side priority projection and one
    TakeOrderedAndProject heap cut (never a global sort). Priorities
    are rounded to 8 dp IN the ordering key so the cut is engine-stable
    (pq_topk's convention)."""
    from ..llm.dedup import _hexint

    d = _t(spark, sf_dir, "documents")
    u = (
        _hexint(F.md5(F.concat_ws("|", F.lit("ps"), F.col("doc_id"))), 8)
        + 0.5
    ) / F.lit(4294967296.0)
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.round(F.log(u) / F.col("n_chars"), 8).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(_X50_K)
    )


REGISTRY["x50_priority_sample"].sql = _x50_sql()


def _x51_pr_iter_sql(prev: str, it: int) -> str:
    """One unweighted PageRank power iteration as a CTE."""
    return f"""
    pr{it} AS (
      SELECT n.vec_id,
             0.15 / nn.n + 0.85 * coalesce(c.s, 0) AS pr
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst, sum(p.pr / d.deg) AS s
        FROM edges e
        JOIN {prev} p ON p.vec_id = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY 1
      ) c ON c.dst = n.vec_id
    )"""


def _x51_sql() -> str:
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    kk AS (
      SELECT greatest(4, ceil(count(DISTINCT vec_id) / 500.0)) AS k FROM comp
    ),
    cent0 AS (
      SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k
    ),
    {_kmeans_iter_sql('cent0', 1)},
    {_kmeans_iter_sql('cent1', 2)},
    {_kmeans_iter_sql('cent2', 3)},
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    cand AS (
      SELECT x.vec_id AS a, y.vec_id AS b
      FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id <> y.vec_id
    ),
    dots AS (
      SELECT c.a, c.b, sum(ca.v * cb.v) AS dot
      FROM cand c
      JOIN comp ca ON ca.vec_id = c.a
      JOIN comp cb ON cb.vec_id = c.b AND cb.i = ca.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT dots.a, dots.b, round(dot / (na.norm * nb.norm), 4) AS cosine
      FROM dots
      JOIN norms na ON na.vec_id = dots.a
      JOIN norms nb ON nb.vec_id = dots.b
      WHERE na.norm > 0 AND nb.norm > 0
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM (
        SELECT a, b,
               row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) AS rnk
        FROM scored
      ) WHERE rnk <= 3
    ),
    nodes AS (SELECT DISTINCT vec_id FROM comp),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    pr0 AS (SELECT vec_id, 1.0 / nn.n AS pr FROM nodes, nn),
    {_x51_pr_iter_sql('pr0', 1)},
    {_x51_pr_iter_sql('pr1', 2)},
    {_x51_pr_iter_sql('pr2', 3)}
    SELECT vec_id, round(pr * nn.n, 4) AS pagerank
    FROM pr3, nn
    ORDER BY round(pr * nn.n, 4) DESC, vec_id
    LIMIT 20
    """


@register("x51_graph_pagerank", None)  # sql attached below
def x51_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance propagation over the k-NN similarity graph: three
    unweighted PageRank power iterations (d=0.85) over ann5's edges —
    the graph-centrality signal curation stacks use to find "hub"
    documents (highly connected = template/boilerplate-like mass,
    inverse of x48's density signal but link-based rather than
    cell-count-based) and the engine's demonstration of ITERATIVE
    graph algebra as pure DataFrame ops: each iteration is one
    edge-keyed join + dst-keyed agg + node-sized left join, exactly
    the shape GraphX/Pregel compiles to, with no driver loop state.

    Determinism across engines: the edge set is integer-exact (ann5
    ranks on the 4-dp ROUNDED cosine), the iteration arithmetic
    mirrors the oracle expression-for-expression, and the final
    N-normalized score is 4-dp rounded in the ordering key. Dangling
    cells (singletons with no out-edges) leak their mass — documented,
    identical in both engines, irrelevant to the ranking contract.

    Scale shape: the graph build derives its cell count from corpus
    size (k = N/500), so the per-cell gram is constant-bounded and the
    build scales linearly (fixed k=4 measured 16.7x wall at 10x data;
    derived k, 2.9x — SCALE.md round-9 addendum); the edge table is
    3N rows regardless of dimension, checkpointed ONCE, and each
    iteration shuffles edge-sized rows keyed on dst. At 100 TB you
    persist the edges (like the IVF index) and iterate to convergence
    with the same three-operator loop."""
    from ..llm.similarity import _gram_topk_fn, derived_k_init, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    # cell count DERIVES from corpus size (k = N / 500, the SemDeDup
    # recipe, shared helper derived_k_init): the per-cell gram stays
    # ~500x500 at ANY corpus size, so the edge build scales linearly
    # instead of quadratically (fixed k=4 measured 60.4 s at 10x;
    # derived k, 6.3 s). At the gate SFs (N <= 2000) the derived k is
    # 4 — identical to ann5's contract.
    _, assign = kmeans_fit(
        emb, "vec_id", "embedding", iters=2, materialize=True,
        init=derived_k_init(emb, "vec_id", "embedding"),
    )
    vecs = assign.join(emb.select("vec_id", "embedding"), "vec_id").select(
        F.col("vec_id").alias("__id"), "cell", F.col("embedding").alias("__v")
    )
    # top-3 ranked inside the gram kernel (the cell is the candidate
    # set) — the every-pair + window form mirrored a |cell|^2 pair
    # table through a 200M-row shuffle at the 100x corpus; see
    # llm.similarity._gram_topk_fn. Id type follows the input id
    # column (r13 advice)
    id_t = emb.schema["vec_id"].dataType.simpleString()
    edges = (
        vecs.groupBy("cell")
        .applyInPandas(
            _gram_topk_fn(3),
            schema=f"a {id_t}, b {id_t}, cosine double, rnk int",
        )
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    nodes = emb.select("vec_id")
    nn = nodes.agg(F.count("*").cast("double").alias("n"))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # all three unrolled iterations consume the degree-annotated edge
    # list — pin it once (edge-sized, the same state class as the
    # checkpointed edges) or each iteration re-runs the degree agg +
    # join from the edge checkpoint (r15 optimization, guide §2.4)
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
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
    out = pr.crossJoin(F.broadcast(nn)).select(
        "vec_id", F.round(F.col("pr") * F.col("n"), 4).alias("pagerank")
    )
    return out.orderBy(F.col("pagerank").desc(), "vec_id").limit(20)


REGISTRY["x51_graph_pagerank"].sql = _x51_sql()


def _x52_sql() -> str:
    from ..llm.dedup import shingles_sql

    sh = shingles_sql("text", 3)
    return f"""
    WITH ss AS (
      SELECT DISTINCT source, unnest(list_distinct({sh})) AS s
      FROM documents
    ),
    sizes AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS n_common
      FROM ss a JOIN ss b USING (s)
      WHERE a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, cast(n_common AS BIGINT) AS n_common,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 4) AS jaccard,
           round(n_common * 1.0 / least(sa.n, sb.n), 4) AS containment
    FROM pairs
    JOIN sizes sa ON sa.source = pairs.source_a
    JOIN sizes sb ON sb.source = pairs.source_b
    """


@register("x52_source_overlap", None)  # sql attached below
def x52_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: 3-gram shingle overlap
    between every pair of SOURCES — Jaccard and containment per pair.
    dd8 answers "is this document contaminated by the benchmark"; this
    answers the catalog-level question a corpus curator asks first:
    WHICH feeds overlap, and is the overlap mutual (high Jaccard,
    mirrored feeds) or one-way (high containment, one feed embedded in
    a bigger one) — the evidence for dropping a redundant source
    before paying per-document dedup on it, and the source-granularity
    leakage check when eval and train sets arrive as separate feeds.

    Plan shape: the (source, shingle)-type table feeds a shingle-keyed
    self-join — the inverted-index pattern of dd3, but the fan-out per
    shingle is bounded by the SOURCE count (a catalog-sized dimension,
    max S(S-1)/2 pairs per shingle), not by document frequency, so no
    posting cap is needed at any corpus scale. The keyed self-join is
    the correct 100 TB shape (both sides corpus-sized by design, like
    x51's edges); the size tables that close Jaccard are source-sized
    broadcasts. Reference analog: src/load.py's cross-table count
    reconciliation, lifted from row counts to content overlap."""
    from ..llm.dedup import _spread, shingles

    d = _t(spark, sf_dir, "documents")
    ss = _spread(d.select("source", "text")).select(
        "source",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
    ).distinct().localCheckpoint(eager=True)
    # ^ three consumers (sizes + both self-join legs) each re-ran the
    # shingle explode + distinct without the pin — the same
    # posting-table trade dd3's registered form makes (r15
    # optimization, guide §2.4)
    sizes = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = ss.alias("a"), ss.alias("b")
    pairs = (
        a.join(b, "s")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n").alias("nb")
    )
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                4,
            ).alias("jaccard"),
            F.round(
                F.col("n_common") / F.least(F.col("na"), F.col("nb")), 4
            ).alias("containment"),
        )
    )


REGISTRY["x52_source_overlap"].sql = _x52_sql()


_X54_SQL = """
WITH toks AS (
  SELECT source, doc_id % 2 = 0 AS is_old,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
cnt AS (
  SELECT source, tok,
         sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS c2
  FROM toks GROUP BY 1, 2
),
n AS (
  SELECT source, sum(c1) AS n1, sum(c2) AS n2,
         sum(CASE WHEN c1 > 0 THEN 1 ELSE 0 END) AS v1,
         sum(CASE WHEN c2 > 0 THEN 1 ELSE 0 END) AS v2
  FROM cnt GROUP BY 1
),
terms AS (
  SELECT cnt.source,
         (CASE WHEN c1 > 0
               THEN (c1 * 1.0 / n1)
                    * ln((c1 * 1.0 / n1)
                         / ((c1 * 1.0 / n1
                             + CASE WHEN n2 > 0 THEN c2 * 1.0 / n2
                                    ELSE 0 END) / 2))
               ELSE 0 END)
         + (CASE WHEN c2 > 0
                 THEN (c2 * 1.0 / n2)
                      * ln((c2 * 1.0 / n2)
                           / ((CASE WHEN n1 > 0 THEN c1 * 1.0 / n1
                                    ELSE 0 END
                               + c2 * 1.0 / n2) / 2))
                 ELSE 0 END) AS term
  FROM cnt JOIN n USING (source)
)
SELECT n.source, cast(n1 AS BIGINT) AS n_old_tokens,
       cast(n2 AS BIGINT) AS n_new_tokens,
       cast(v1 AS BIGINT) AS vocab_old, cast(v2 AS BIGINT) AS vocab_new,
       round(0.5 * s, 4) AS js_div
FROM (SELECT source, sum(term) AS s FROM terms GROUP BY 1) t
JOIN n USING (source)
"""


@register("x54_source_drift", _X54_SQL)
def x54_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring per source: Jensen-Shannon
    divergence between the unigram token distributions of two corpus
    snapshots — the text twin of ann13's vector-index drift report,
    and the number a feed-health monitor alerts on (a source whose
    token distribution jumps has changed crawler, language mix, or
    upstream corruption; x41's datacard says what a source IS, this
    says how fast it's MOVING). Snapshots here are the doc_id-parity
    halves (the i7 convention for synthetic versions); in production
    the flag is an ingest-batch or date column. JS rather than KL
    because it is symmetric, bounded by ln 2, and defined when either
    side has vocabulary the other lacks (the common case for drift).

    Plan shape: one (source, tok) count agg over the token explode —
    the same vocabulary-sized table tx23's model rides — then
    source-sized joins and a vocabulary-sized term sum; nothing
    corpus-sized shuffles twice. The per-batch (source, tok) counts
    are the fold x41 already persists, so an incremental deployment
    reuses the datacard state log. Reference analog: src/load.py's
    count reconciliation, lifted from row counts to distributions."""
    from ..llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        (F.col("doc_id") % 2 == 0).alias("is_old"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    cnt = toks.groupBy("source", "tok").agg(
        F.sum(F.when(F.col("is_old"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0)).alias("c2"),
    )
    n = cnt.groupBy("source").agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.when(F.col("c1") > 0, 1).otherwise(0)).alias("v1"),
        F.sum(F.when(F.col("c2") > 0, 1).otherwise(0)).alias("v2"),
    )
    # try-guarded ratios: a snapshot half can be EMPTY for a source
    # (n1 or n2 = 0) — its distribution is all-zero and the other
    # side's terms reduce to ln 2 (max drift), which is the right
    # answer; unguarded division trips ANSI DIVIDE_BY_ZERO.
    p = F.when(F.col("n1") > 0, F.col("c1") / F.col("n1")).otherwise(
        F.lit(0.0)
    )
    q = F.when(F.col("n2") > 0, F.col("c2") / F.col("n2")).otherwise(
        F.lit(0.0)
    )
    m = (p + q) / 2
    term = F.when(F.col("c1") > 0, p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("c2") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    s = (
        cnt.join(n.select("source", "n1", "n2"), "source")
        .select("source", term.alias("term"))
        .groupBy("source")
        .agg(F.sum("term").alias("s"))
    )
    return s.join(n, "source").select(
        "source",
        F.col("n1").cast("bigint").alias("n_old_tokens"),
        F.col("n2").cast("bigint").alias("n_new_tokens"),
        F.col("v1").cast("bigint").alias("vocab_old"),
        F.col("v2").cast("bigint").alias("vocab_new"),
        F.round(0.5 * F.col("s"), 4).alias("js_div"),
    )


_X59_SQL = """
WITH t AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1,
         ts, event_type
  FROM events
),
t2s AS (
  SELECT user_id, t1,
         min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
           OVER (PARTITION BY user_id) AS t2,
         ts, event_type
  FROM t
),
t3s AS (
  SELECT user_id, t1, t2,
         min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
           OVER (PARTITION BY user_id) AS t3
  FROM t2s
),
u AS (
  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
  FROM t3s GROUP BY 1
),
agg AS (
  SELECT count(*) AS n_users,
         sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS s1,
         sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS s2,
         sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS s3
  FROM u
)
SELECT steps.step, steps.step_name,
       cast(CASE steps.step WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END
            AS BIGINT) AS n_reached,
       cast(n_users AS BIGINT) AS n_users,
       round((CASE steps.step WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END)
             * 1.0 / n_users, 4) AS reach_frac
FROM agg CROSS JOIN (
  SELECT 1 AS step, 'view' AS step_name
  UNION ALL SELECT 2, 'view>click'
  UNION ALL SELECT 3, 'view>click>purchase'
) steps
"""


@register("x59_funnel_steps", _X59_SQL)
def x59_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: how many users complete
    view -> click -> purchase IN THAT ORDER — each step's timestamp
    must strictly follow the previous step's first completion, so a
    purchase before the first post-view click does not count (the
    semantics product analytics tools call a strict-order funnel).
    Computed without self-joins: three stacked conditional-min window
    passes over the SAME user partitioning — t1 = first view, t2 =
    first click after t1, t3 = first purchase after t2 — so Catalyst
    plans ONE user-keyed exchange for all three steps plus the
    user-level collapse; at any event volume the funnel costs one
    shuffle of (user, ts, type) triples. The step table is a 3-row
    constant joined as a broadcast. Complements x15 (sessionize) and
    st2 (session windows) in the event-analytics family.
    Reference analog: the phase-gated run_full of src/main.py — the
    same 'step k only counts after step k-1' dependency, applied to
    user behavior instead of pipeline phases."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    step1 = e.select("user_id", "ts", "event_type", t1.alias("t1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    step2 = step1.select("user_id", "ts", "event_type", "t1", t2.alias("t2"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    step3 = step2.select("user_id", "t1", "t2", t3.alias("t3"))
    u = step3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    agg = u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("t1").isNotNull().cast("int")).alias("s1"),
        F.sum(F.col("t2").isNotNull().cast("int")).alias("s2"),
        F.sum(F.col("t3").isNotNull().cast("int")).alias("s3"),
    )
    steps = spark.createDataFrame(
        [(1, "view"), (2, "view>click"), (3, "view>click>purchase")],
        "step int, step_name string",
    )
    reached = (
        F.when(F.col("step") == 1, F.col("s1"))
        .when(F.col("step") == 2, F.col("s2"))
        .otherwise(F.col("s3"))
    )
    return agg.crossJoin(F.broadcast(steps)).select(
        "step",
        "step_name",
        reached.cast("bigint").alias("n_reached"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(reached / F.col("n_users"), 4).alias("reach_frac"),
    )


_X63_SQL = """
WITH base AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN event_type <> 'error' AND value IS NOT NULL
              THEN value END AS vv,
         CASE WHEN event_type <> 'error' AND value IS NOT NULL
              THEN epoch(ts) END AS vt
  FROM events
),
nbr AS (
  SELECT event_id, user_id, ts, event_type, epoch(ts) AS t,
         last_value(vv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         last_value(vt IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
         first_value(vv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
         first_value(vt IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
  FROM base
)
SELECT event_id, user_id, ts,
       round(coalesce(
         CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           CASE WHEN nt > pt
                THEN pv + (nv - pv) * (t - pt) / (nt - pt)
                ELSE (pv + nv) / 2 END
         END, pv, nv), 4) AS value_filled
FROM nbr WHERE event_type = 'error'
"""


@register("x63_gap_fill_interpolate", _X63_SQL, first_round=9)
def x63_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation of missing telemetry: 'error'
    events carry no usable reading, so each one is repaired from its
    user's nearest valid readings on either side, weighted by how far
    (in event time) the gap sits between them — the standard sensor/
    metrics gap-repair that x9's step-wise forward-fill cannot express
    (ffill holds the LAST value flat; interpolation follows the trend
    line between neighbors). Edge gaps degrade gracefully: only a
    previous neighbor -> carry it forward; only a next -> carry it
    back; same-timestamp neighbors -> midpoint (no zero division).

    Plan shape: ONE user-keyed sort carries all four IGNORE-NULLS
    neighbor windows (same partition + order -> one exchange, one
    sort); everything else is map-side arithmetic. No joins, no
    self-join on time ranges — the classic interpolate-by-join
    formulation shuffles the table twice and breaks at skewed users,
    while the window form scales with the user-key partitioning at any
    event volume."""
    e = _t(spark, sf_dir, "events")
    # TZ-independent epoch seconds on the NTZ column (unix_micros
    # rejects NTZ; a cast would bind the driver session's timezone)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " ts)"
    ) / F.lit(1_000_000.0)
    # Anchor BOTH the value and its timestamp at value-BEARING valid
    # events: a valid event whose reading is NULL must contribute
    # neither (else pv and pt come from different events and the
    # interpolation weight is wrong) — r9 advice fix.
    valid = (F.col("event_type") != "error") & F.col("value").isNotNull()
    base = e.select(
        "event_id", "user_id", "ts", "event_type",
        us.alias("t"),
        F.when(valid, F.col("value")).alias("vv"),
        F.when(valid, us).alias("vt"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    wn = w.rowsBetween(1, Window.unboundedFollowing)
    nbr = base.select(
        "event_id", "user_id", "ts", "event_type", "t",
        F.last("vv", ignorenulls=True).over(wp).alias("pv"),
        F.last("vt", ignorenulls=True).over(wp).alias("pt"),
        F.first("vv", ignorenulls=True).over(wn).alias("nv"),
        F.first("vt", ignorenulls=True).over(wn).alias("nt"),
    )
    both = F.when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.when(
            F.col("nt") > F.col("pt"),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("t") - F.col("pt"))
            / (F.col("nt") - F.col("pt")),
        ).otherwise((F.col("pv") + F.col("nv")) / 2),
    )
    return nbr.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts",
        F.round(F.coalesce(both, F.col("pv"), F.col("nv")), 4).alias(
            "value_filled"
        ),
    )


_X64_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, day, n,
         avg(n) OVER (PARTITION BY event_type) AS mu,
         stddev_pop(n) OVER (PARTITION BY event_type) AS sd
  FROM daily
),
ps AS (
  SELECT event_type, day, n, sd,
         sum(n - (mu + 0.5 * sd)) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM st
),
cu AS (
  SELECT event_type, day, n, sd,
         s - least(0, min(s) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum
  FROM ps
)
SELECT event_type, cast(day AS TIMESTAMP) AS day, cast(n AS BIGINT) AS n,
       round(cusum, 4) AS cusum,
       cast(CASE WHEN cusum > 4 * sd THEN 1 ELSE 0 END AS BIGINT)
         AS changepoint
FROM cu
"""


@register("x64_cusum_changepoint", _X64_SQL, first_round=9)
def x64_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection over each event type's
    daily volume — the drift monitor that catches a sustained upward
    shift long before any single day trips a static threshold. The
    textbook recursion S_t = max(0, S_{t-1} + (x_t - k)) (allowance
    k = mu + 0.5*sd, alarm at 4*sd) is NOT window-expressible as
    written; it is rewritten exactly as S_t = ps_t - min(0,
    running_min(ps)) over the plain prefix sum ps — two ordered
    windows replace the sequential recursion, which is what makes a
    recursive detector runnable as a distributed plan at all.

    Plan shape: the only data-sized stage is the (type, day) count
    agg (map-side partials, then a matrix-sized result); the stats
    window and both ordered windows run over the daily matrix
    (|types| x |days| rows), partitioned by event_type — never a
    global sort, never a single-partition exchange. The mean is exact
    (integer sums in doubles); sd enters only scaled by 0.5 into the
    prefix drift, so cross-engine ulp differences stay orders below
    the 4-dp rounding."""
    from ..operators.aggregate import cusum_over_daily, daily_counts

    e = _t(spark, sf_dir, "events")
    out = cusum_over_daily(daily_counts(e, "event_type", "ts"))
    return out.select(
        F.col("k").alias("event_type"), "day", "n", "cusum", "changepoint"
    )


_X66_SQL = """
WITH fv AS (
  SELECT user_id, min(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY 1
),
fp AS (
  SELECT e.user_id, min(e.ts) AS first_purchase
  FROM events e JOIN fv ON fv.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
  GROUP BY 1
)
SELECT fv.user_id, fv.first_view, fp.first_purchase,
       round(epoch(fp.first_purchase) - epoch(fv.first_view), 2)
         AS lag_sec
FROM fv JOIN fp ON fp.user_id = fv.user_id
"""


@register("x66_conversion_lag", _X66_SQL, first_round=9)
def x66_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: for every user, the wall-clock gap between
    their FIRST view and their first purchase at-or-after it — the
    latency dimension x59's funnel (which counts WHO converts) does
    not report, and the input to conversion-SLA percentiles and
    marketing-window tuning.

    Plan shape: one scan feeds both user-keyed min-aggs (view firsts,
    then qualifying-purchase firsts); the qualifying filter is an
    equi-join on user_id with the ts predicate evaluated as a join
    residual — never an interval/range join, so no row explosion at
    any event volume. All three stages share the user_id key, so AQE
    can reuse one partitioning end-to-end; output is bounded by the
    converting-user count."""
    e = _t(spark, sf_dir, "events")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lag = F.expr(
        "timestampdiff(MICROSECOND, first_view, first_purchase)"
    ) / F.lit(1_000_000.0)
    return fv.join(fp, "user_id").select(
        "user_id", "first_view", "first_purchase",
        F.round(lag, 2).alias("lag_sec"),
    )


_X67_SQL = """
WITH buy AS (
  SELECT DISTINCT l_partkey AS pk, o_custkey AS ck
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
pairs AS (
  SELECT a.ck AS a, b.ck AS b
  FROM buy a JOIN buy b ON b.pk = a.pk AND a.ck < b.ck
  GROUP BY 1, 2 HAVING count(*) >= 3
),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM pairs UNION ALL SELECT b AS v FROM pairs
  ) GROUP BY 1
),
dstat AS (
  SELECT cast(count(*) AS BIGINT) AS n_nodes,
         sum(d * (d - 1) / 2.0) AS wedges
  FROM deg
),
estat AS (SELECT cast(count(*) AS BIGINT) AS n_edges FROM pairs),
tri AS (
  SELECT cast(count(*) AS BIGINT) AS n_triangles
  FROM pairs e1
  JOIN pairs e2 ON e2.a = e1.b
  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT n_nodes, n_edges, n_triangles,
       round(3.0 * n_triangles / wedges, 6) AS global_clustering
FROM dstat, estat, tri
"""


@register("x67_copurchase_triangles", _X67_SQL, first_round=9)
def x67_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient over the
    co-purchase graph — customers become neighbors when they bought
    >= 3 common parts (the support threshold that turns the bipartite
    projection into a meaningful similarity graph instead of a hairball),
    and the triangle census over that graph is the standard cohesion
    measure behind community detection and recommendation neighborhoods.
    Complements x51 (PageRank = centrality on a directed similarity
    graph) with the undirected local-structure statistic.

    Plan shape: the bipartite projection is a part-keyed self-join
    (fan-out bounded by buyers-per-part, the same inverted-index
    economics as dd3); the thresholded edge list is eagerly
    checkpointed ONCE and reused by the degree pass and all three legs
    of the triangle join — without the pin Spark would rebuild the
    projection five times. Triangle enumeration is two hash joins on
    edge endpoints with the a<b orientation guaranteeing each triangle
    counted exactly once — never an all-pairs stage; work scales with
    the edge list, which the support threshold keeps sparse as the
    customer count grows (co-purchase collisions thin out at fixed
    basket size)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    buy = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_partkey").alias("pk"), F.col("o_custkey").alias("ck")
        )
        .distinct()
    )
    a, b = buy.alias("ea"), buy.alias("eb")
    pairs = (
        a.join(
            b,
            (F.col("ea.pk") == F.col("eb.pk"))
            & (F.col("ea.ck") < F.col("eb.ck")),
        )
        .groupBy(
            F.col("ea.ck").alias("a"), F.col("eb.ck").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 3)
        .select("a", "b")
        .localCheckpoint(eager=True)  # reused 5x: degrees + 3 join legs
    )
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dstat = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2.0).alias("wedges"),
    )
    estat = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        dstat.crossJoin(estat)
        .crossJoin(tri)
        .select(
            "n_nodes", "n_edges", "n_triangles",
            F.round(3.0 * F.col("n_triangles") / F.col("wedges"), 6).alias(
                "global_clustering"
            ),
        )
    )


_X68_SQL = """
WITH buy AS (
  SELECT DISTINCT l_partkey AS pk, o_custkey AS ck
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
sizes AS (SELECT pk, count(*) AS n FROM buy GROUP BY 1),
inter AS (
  SELECT a.pk AS pa, b.pk AS pb, count(*) AS i
  FROM buy a JOIN buy b ON b.ck = a.ck AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= 2
),
sym AS (
  SELECT pa AS p, pb AS q, i FROM inter
  UNION ALL SELECT pb AS p, pa AS q, i FROM inter
),
jac AS (
  SELECT s.p, s.q, s.i,
         s.i * 1.0 / (sa.n + sb.n - s.i) AS j
  FROM sym s JOIN sizes sa ON sa.pk = s.p JOIN sizes sb ON sb.pk = s.q
),
ranked AS (
  SELECT p, q, i, j,
         row_number() OVER (PARTITION BY p ORDER BY j DESC, q) AS rnk
  FROM jac
)
SELECT p AS partkey, q AS neighbor,
       cast(i AS BIGINT) AS n_common_buyers,
       round(j, 4) AS jaccard,
       cast(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 5
"""


@register("x68_item_similarity_topk", _X68_SQL, first_round=9)
def x68_item_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for every part, its top-5
    most similar parts by Jaccard similarity of buyer sets (support
    >= 2 common buyers) — the classic neighborhood model behind
    "customers who bought this also bought", and the item-side
    complement of x67's customer-graph census. Ties rank
    deterministically (similarity desc, then neighbor id).

    Plan shape: the co-occurrence build is a buyer-keyed self-join
    (inverted-index economics — fan-out bounded by parts-per-buyer,
    the basket size, which does NOT grow with catalog or customer
    count); sizes join back as a part-keyed table. The top-5 cut is a
    row_number + filter that compiles to WindowGroupLimit, so each
    partition keeps a 5-element heap per part instead of sorting the
    full similarity list — the shape that keeps the cut constant-
    memory at any catalog size. No all-pairs stage anywhere: parts
    never meet unless a real basket joins them."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    buy = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_partkey").alias("pk"), F.col("o_custkey").alias("ck")
        )
        .distinct()
        # NOT pinned, deliberately: the static plan shows the fact
        # join 6 times, but AQE exchange reuse shares the
        # distinct's exchange across all consumers at runtime — a
        # checkpoint A/B measured a wash (3.76 s plain vs 3.80 s
        # pinned, isolated median-of-5 at sf0.1), so the ledger rule
        # (keep what measures better) leaves it plain. Contrast x87,
        # where the same pin measured −20%.
    )
    sizes = buy.groupBy("pk").agg(F.count(F.lit(1)).alias("n"))
    a, b = buy.alias("ba"), buy.alias("bb")
    inter = (
        a.join(
            b,
            (F.col("bb.ck") == F.col("ba.ck"))
            & (F.col("ba.pk") < F.col("bb.pk")),
        )
        .groupBy(F.col("ba.pk").alias("pa"), F.col("bb.pk").alias("pb"))
        .agg(F.count(F.lit(1)).alias("i"))
        .filter(F.col("i") >= 2)
    )
    sym = inter.select(
        F.col("pa").alias("p"), F.col("pb").alias("q"), "i"
    ).unionAll(
        inter.select(F.col("pb").alias("p"), F.col("pa").alias("q"), "i")
    )
    sa = sizes.select(F.col("pk").alias("p"), F.col("n").alias("na"))
    sb = sizes.select(F.col("pk").alias("q"), F.col("n").alias("nb"))
    jac = (
        sym.join(sa, "p")
        .join(sb, "q")
        .select(
            "p", "q", "i",
            (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).alias(
                "j"
            ),
        )
    )
    w = Window.partitionBy("p").orderBy(F.col("j").desc(), "q")
    return (
        jac.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            F.col("p").alias("partkey"),
            F.col("q").alias("neighbor"),
            F.col("i").cast("bigint").alias("n_common_buyers"),
            F.round("j", 4).alias("jaccard"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_X77_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
dw AS (
  SELECT event_type, isodow(day) AS isodow, n FROM daily
),
prof AS (
  SELECT event_type, isodow,
         count(*) AS n_days,
         avg(n) AS dow_mean
  FROM dw GROUP BY 1, 2
),
overall AS (
  SELECT event_type, avg(n) AS o_mean FROM dw GROUP BY 1
)
SELECT p.event_type, cast(p.isodow AS BIGINT) AS isodow,
       cast(p.n_days AS BIGINT) AS n_days,
       round(p.dow_mean, 4) AS dow_mean,
       round(p.dow_mean / o.o_mean, 4) AS seasonal_index
FROM prof p JOIN overall o ON o.event_type = p.event_type
"""


@register("x77_seasonal_profile", _X77_SQL, first_round=9)
def x77_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile per event type: the mean daily
    volume for each ISO weekday and its seasonal index (ratio to the
    type's overall daily mean) — the baseline a monitor divides out
    before alerting, so Saturday's dip stops looking like an incident
    (x64's CUSUM detects level SHIFTS; this captures the periodic
    component those shifts are judged against).

    Plan shape: identical economics to x64 — one (type, day) count
    agg is the only event-sized stage, then every frame is the
    |types| x 7 profile matrix; means are exact-integer sums divided
    by counts, so the cross-engine float story is trivial."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    dw = daily.select(
        "event_type", (F.weekday("day") + 1).alias("isodow"), "n"
    )
    prof = dw.groupBy("event_type", "isodow").agg(
        F.count(F.lit(1)).alias("n_days"), F.avg("n").alias("dow_mean")
    )
    overall = dw.groupBy("event_type").agg(F.avg("n").alias("o_mean"))
    return prof.join(F.broadcast(overall), "event_type").select(
        "event_type",
        F.col("isodow").cast("bigint").alias("isodow"),
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round("dow_mean", 4).alias("dow_mean"),
        F.round(F.col("dow_mean") / F.col("o_mean"), 4).alias(
            "seasonal_index"
        ),
    )


_X78_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         date_diff('day',
                   min(day) OVER (PARTITION BY event_type), day) AS t
  FROM daily
),
s AS (
  SELECT event_type,
         count(*) AS n, sum(t) AS st, sum(y) AS sy,
         sum(t * y) AS sty, sum(t * t) AS stt, max(t) AS tmax
  FROM idx GROUP BY 1
),
fit AS (
  SELECT event_type, n, tmax,
         (n * sty - st * sy) * 1e0 / (n * stt - st * st) AS slope,
         (sy - (n * sty - st * sy) * 1e0 / (n * stt - st * st) * st)
           / n AS intercept
  FROM s
)
SELECT event_type, cast(n AS BIGINT) AS n_days,
       round(slope, 6) AS slope,
       round(intercept, 4) AS intercept,
       round(intercept + slope * (tmax + 7), 2) AS forecast_next_week
FROM fit
"""


@register("x78_trend_forecast", _X78_SQL, first_round=9)
def x78_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear trend fit + one-week-ahead forecast per event type:
    closed-form OLS over the daily volume series (slope in
    events/day, intercept, and the projected volume 7 days past the
    last observation) — the capacity-planning readout that tells you
    WHEN a queue outgrows its workers, complementing x64 (is the
    level shifting NOW) and x77 (what is periodic). Every OLS moment
    (sum t, sum y, sum ty, sum t^2) is an exact integer sum — day
    indexes and counts are small ints, so the normal equations carry
    ZERO float accumulation and both engines divide identical
    integers.

    Plan shape: the (type, day) count agg is the only event-sized
    stage; the index window and moment agg run over the daily matrix
    keyed on type; the fit is a |types|-row projection."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    wt = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type", "y",
        F.datediff(F.col("day"), F.min("day").over(wt)).alias("t"),
    )
    s = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.max("t").alias("tmax"),
    )
    slope = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    intercept = (F.col("sy") - slope * F.col("st")) / F.col("n")
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
        F.round(intercept + slope * (F.col("tmax") + 7), 2).alias(
            "forecast_next_week"
        ),
    )


_X76_SQL = """
WITH rev AS (
  SELECT l_partkey AS partkey,
         sum(cast(round(l_extendedprice * 100) AS BIGINT)
             * cast(round(100 - l_discount * 100) AS BIGINT)) AS rc
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(rc) AS total FROM rev),
ranked AS (
  SELECT partkey, rc,
         sum(rc) OVER (ORDER BY rc DESC, partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
  FROM rev
)
SELECT partkey,
       cast((rc + 50) // 100 AS BIGINT) / 1e2 AS revenue,
       round(cum * 1e0 / tot.total, 6) AS cum_share,
       CASE WHEN cum * 1e0 / tot.total <= 0.8 THEN 'A'
            WHEN cum * 1e0 / tot.total <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked, tot
"""


@register("x76_abc_analysis", _X76_SQL, first_round=9)
def x76_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification of the part catalog by revenue:
    parts are ranked by net revenue, the running share of total
    revenue is computed along that ranking, and each part lands in
    class A (first 80% of revenue), B (to 95%) or C (tail) — the
    inventory-management classic, and the curation analog of "which
    sources carry 80% of the tokens".

    Plan shape: the fact scan collapses to a part-keyed revenue agg
    FIRST (map-side partials; the only event-sized stage). The
    cumulative revenue then rides the sequence engine's bucketed
    prefix-sum (``with_global_prefix_sum``): equi-depth buckets on the
    revenue key, O(buckets) driver-folded offsets, per-bucket windows
    — NO single-partition exchange anywhere, because unlike x55's
    ~100-row source catalog the part catalog grows with the corpus
    (tens of millions of parts at 100x) and the r9 unpartitioned
    window would funnel all of it through one task (r9 verdict fix;
    plan guard in test_plans.py). The aggregated frame is lazily
    localCheckpointed so the three passes the prefix-sum needs
    (quantile sketch, subtotal fold, final window) reuse one
    materialization of the fact scan instead of re-running it. The
    grand total is a single-row broadcast."""
    from ..operators.sequence import with_global_prefix_sum

    li = _t(spark, sf_dir, "lineitem")
    # cent x percent integer arithmetic: prices carry 2 decimals and
    # discounts 2, so the per-line revenue is EXACT in 64-bit ints —
    # the ranking, cumulative sum and class boundaries involve no
    # float summation order at all (a .005-boundary ulp difference
    # between engines flipped the display rounding in the double form)
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * F.round(100 - F.col("l_discount") * 100).cast("bigint")
        ).alias("rc")
    )
    rev = rev.localCheckpoint(eager=False)
    tot = rev.agg(F.sum("rc").alias("total"))
    share = F.col("cum") / F.col("total")
    return (
        with_global_prefix_sum(
            rev, "rc", ["rc", "partkey"], ascending=[False, True],
            name="cum",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "partkey",
            # half-up to cents in INTEGER space — a float round at the
            # .005 boundary goes opposite ways in the two engines
            (F.expr("(rc + 50) div 100") / F.lit(1e2)).alias("revenue"),
            F.round(share, 6).alias("cum_share"),
            F.when(share <= 0.8, "A")
            .when(share <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


_X74_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
),
rev AS (
  SELECT e.user_id, f.cohort_week,
         cast(date_diff('day', f.cohort_week,
                        date_trunc('week', e.ts)) / 7 AS BIGINT)
           AS week_offset,
         e.value
  FROM events e JOIN firsts f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
),
cells AS (
  SELECT cohort_week, week_offset, sum(value) AS wk_rev
  FROM rev GROUP BY 1, 2
),
sizes AS (SELECT cohort_week, count(*) AS n_cohort FROM firsts GROUP BY 1)
SELECT cast(c.cohort_week AS TIMESTAMP) AS cohort_week,
       c.week_offset,
       cast(s.n_cohort AS BIGINT) AS n_cohort,
       round(sum(c.wk_rev) OVER (PARTITION BY c.cohort_week
                                 ORDER BY c.week_offset
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW)
             / s.n_cohort, 4) AS cum_ltv_per_user
FROM cells c JOIN sizes s ON s.cohort_week = c.cohort_week
"""


@register("x74_cohort_ltv", _X74_SQL, first_round=9)
def x74_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: cumulative purchase revenue per
    signup-week cohort, per user, as a function of weeks since the
    cohort formed — x61 answers "are they still here", this answers
    "what are they worth by week k", the curve payback-period and
    LTV/CAC decisions read off. Week arithmetic matches x61's
    (date_trunc week, offset in whole weeks).

    Plan shape: the same two user-keyed stages as x61 (first-event
    agg, then a fact join keyed on user) followed by a cohort-matrix-
    sized running sum — the cumulative window runs over (cohorts x
    weeks) rows, never over events. Cohort sizes join as a
    cohort-sized broadcast."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    rev = (
        e.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")), F.col("cohort_week")
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
            "value",
        )
    )
    cells = rev.groupBy("cohort_week", "week_offset").agg(
        F.sum("value").alias("wk_rev")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_cohort").cast("bigint").alias("n_cohort"),
            F.round(
                F.sum("wk_rev").over(w) / F.col("n_cohort"), 4
            ).alias("cum_ltv_per_user"),
        )
    )


_X75_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
-- each (user, day) activity contributes to the 7-day windows ending
-- on day .. day+6; distinct again because a user active twice in a
-- window must count once
spans AS (
  SELECT DISTINCT user_id, day + to_days(cast(k AS INT)) AS wday
  FROM ud, unnest(range(0, 7)) r(k)
),
wau AS (SELECT wday AS day, count(*) AS wau FROM spans GROUP BY 1)
SELECT cast(d.day AS TIMESTAMP) AS day,
       cast(d.dau AS BIGINT) AS dau,
       cast(w.wau AS BIGINT) AS wau,
       round(d.dau * 1e0 / w.wau, 4) AS stickiness
FROM dau d JOIN wau w ON w.day = d.day
"""


@register("x75_rolling_active_users", _X75_SQL, first_round=9)
def x75_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: DAU, trailing-7-day WAU and the DAU/WAU
    stickiness ratio per day. DISTINCT users over a SLIDING window is
    not window-function-expressible (count-distinct does not compose
    over frames), so the scale-correct rewrite is the span explode:
    each (user, day) activity row contributes membership to the 7
    window-ending days, and a distinct + count per day recovers the
    exact rolling distinct — work scales with active-user-days x 7,
    never with the all-pairs of users x windows. WAU days trailing
    off the calendar edge (the first 6 days have partial windows) are
    reported as-is, exactly as a dashboard shows them.

    Plan shape: one distinct over (user, day) (the only event-sized
    stage), a 7-way span explode of that user-day table (map-side),
    and two day-keyed counts joined day-on-day. No window functions
    at all — the rolling distinct is pure explode + agg."""
    from ..operators.aggregate import rolling_active_users, user_days

    e = _t(spark, sf_dir, "events")
    return rolling_active_users(user_days(e))


_X73_SQL = """
WITH v AS (
  SELECT user_id, ts AS view_ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts AS purchase_ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, cast(v.rn AS BIGINT) AS rn, v.view_ts, p.purchase_ts,
       round(epoch(p.purchase_ts) - epoch(v.view_ts), 2) AS lag_sec
FROM v JOIN p ON p.user_id = v.user_id AND p.rn = v.rn
"""


@register("x73_fifo_match", _X73_SQL, first_round=9)
def x73_fifo_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO ordinal matching: each user's k-th purchase is matched to
    their k-th view — the first-in-first-out allocation used for
    inventory lot accounting, payment-to-invoice application, and
    demand-to-supply attribution, where the join key is POSITION in
    arrival order rather than any stored id. Unmatched tail positions
    (views with no k-th purchase or vice versa) drop out, exactly as
    FIFO leaves open lots.

    Plan shape: two user-keyed rank windows (one per stream, both
    riding the same user partitioning) and one equi-join on
    (user, position) — the ordinal join is hash-joinable because the
    rank turned ORDER into a KEY; the naive formulation (nth_value
    over a cross of the two streams) would be quadratic per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = (
        e.filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"),
                F.row_number().over(w).alias("rn"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"),
                F.row_number().over(w).alias("rn"))
    )
    lag = F.expr(
        "timestampdiff(MICROSECOND, view_ts, purchase_ts)"
    ) / F.lit(1_000_000.0)
    return v.join(p, ["user_id", "rn"]).select(
        "user_id",
        F.col("rn").cast("bigint").alias("rn"),
        "view_ts",
        "purchase_ts",
        F.round(lag, 2).alias("lag_sec"),
    )


_X72_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
trans AS (
  SELECT user_id, cur, nxt, count(*) AS c FROM seq
  WHERE nxt IS NOT NULL GROUP BY 1, 2, 3
),
rowsum AS (
  SELECT user_id, cur, sum(c) AS rc FROM trans GROUP BY 1, 2
),
tot AS (SELECT user_id, sum(c) AS n FROM trans GROUP BY 1),
cond AS (
  SELECT t.user_id, t.cur, t.c, r.rc,
         -(t.c * 1e0 / r.rc) * ln(t.c * 1e0 / r.rc) AS h_term
  FROM trans t JOIN rowsum r
    ON r.user_id = t.user_id AND r.cur = t.cur
),
hrow AS (
  SELECT user_id, cur, sum(h_term) AS h_cur, max(rc) AS rc
  FROM cond GROUP BY 1, 2
)
SELECT h.user_id,
       cast(tot.n AS BIGINT) AS n_transitions,
       round(sum(h.rc * 1e0 / tot.n * h.h_cur), 4) AS entropy_rate
FROM hrow h JOIN tot ON tot.user_id = h.user_id
GROUP BY h.user_id, tot.n
"""


@register("x72_behavior_entropy", _X72_SQL, first_round=9)
def x72_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy rate: the Shannon entropy of each
    user's first-order Markov transition matrix (x62's per-user form),
    weighted by observed state occupancy — H = sum_cur p(cur) *
    H(next | cur) in nats. Near-zero entropy marks deterministic,
    scripted clients (the bot signal x62's docstring promises);
    high entropy is organic browsing. This is the per-entity
    generalization of x62's corpus-level matrix.

    Plan shape: one user-keyed lead window (the same single exchange
    as x15/x62), then every aggregate is keyed on (user) or
    (user, cur) — the transition table per user is at most
    |types|^2 = 25 rows, so all post-window frames are user-bounded.
    No joins cross users; no global stage of any kind."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("user_id", "cur", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wr = Window.partitionBy("user_id", "cur")
    wu = Window.partitionBy("user_id")
    p = F.col("c") / F.col("rc")
    cond = trans.withColumn("rc", F.sum("c").over(wr)).withColumn(
        "n", F.sum("c").over(wu)
    )
    h_cur = cond.groupBy("user_id", "cur", "rc", "n").agg(
        F.sum(-p * F.log(p)).alias("h_cur")
    )
    out = h_cur.groupBy("user_id", "n").agg(
        F.round(
            F.sum(F.col("rc") / F.col("n") * F.col("h_cur")), 4
        ).alias("entropy_rate"),
    )
    return out.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_transitions"),
        "entropy_rate",
    )


_X70_FRACS = ", ".join(f"{i / 256:.8f}e0" for i in range(257))


_X70_SQL = f"""
WITH scored AS (
  SELECT doc_id, source, cast(n_chars AS DOUBLE) AS score FROM documents
),
pr AS (
  SELECT doc_id, source, score,
         percent_rank() OVER (PARTITION BY source
                              ORDER BY score, doc_id) AS pr
  FROM scored
),
qarr AS (
  SELECT quantile_cont(score, [{_X70_FRACS}]) AS qs FROM scored
),
grid AS (
  SELECT generate_subscripts(qs, 1) - 1 AS i, unnest(qs) AS qv FROM qarr
)
SELECT pr.doc_id, pr.source, pr.score,
       round(pr.pr, 6) AS pr,
       round(grid.qv, 4) AS norm_score
FROM pr JOIN grid
  ON grid.i = cast(floor(pr.pr * 256) AS BIGINT)
"""


@register("x70_quantile_normalize", _X70_SQL, first_round=9)
def x70_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of a per-document score —
    the calibration step a mixed-corpus curation pipeline runs before
    thresholding: each document's WITHIN-SOURCE percent rank is mapped
    onto the GLOBAL score distribution, so "top 10% of arxiv" and
    "top 10% of webcrawl" land on the same scale even when the raw
    score distributions differ wildly (quantile normalization, the
    microarray-analysis classic applied to quality scores; score here
    is the stored n_chars signal, standing in for any per-doc score).

    Plan shape: the within-source rank is a source-keyed window (the
    only data-sized exchange). The global distribution is NOT a global
    sort: it is compressed to a 257-point interpolated quantile GRID
    (one single-row exact-percentile agg -> exploded -> broadcast),
    and each doc joins its grid cell map-side. Exact-rank quantile
    normalization would need a full-corpus range sort; the grid form
    is the shape that survives 100 TB, with resolution 1/256 of the
    distribution (documented, tunable)."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("score")
    )
    wp = Window.partitionBy("source").orderBy("score", "doc_id")
    pr = scored.select(
        "doc_id", "source", "score",
        F.percent_rank().over(wp).alias("pr"),
    )
    fracs = F.array(*[F.lit(i / 256.0) for i in range(257)])
    grid = (
        scored.agg(
            F.percentile("score", fracs).alias("qs")
        )
        .select(F.posexplode("qs").alias("i", "qv"))
    )
    return (
        pr.join(
            F.broadcast(grid),
            F.col("i") == F.floor(F.col("pr") * 256).cast("bigint"),
        )
        .select(
            "doc_id", "source", "score",
            F.round("pr", 6).alias("pr"),
            F.round("qv", 4).alias("norm_score"),
        )
    )


_X71_SQL = """
WITH assign AS (
  SELECT DISTINCT user_id,
         CASE WHEN md5(cast(user_id AS VARCHAR)) < '8' THEN 'A'
              ELSE 'B' END AS variant
  FROM events
),
firsts AS (
  SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1
),
conv AS (
  SELECT DISTINCT e.user_id
  FROM events e JOIN firsts f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts <= f.t0 + INTERVAL 1 DAY
),
arms AS (
  SELECT variant,
         count(*) AS n_users,
         sum(CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END)
           AS n_conv
  FROM assign LEFT JOIN conv ON conv.user_id = assign.user_id
  GROUP BY 1
),
wide AS (
  SELECT
    max(CASE WHEN variant = 'A' THEN n_users END) AS na,
    max(CASE WHEN variant = 'A' THEN n_conv END) AS ca,
    max(CASE WHEN variant = 'B' THEN n_users END) AS nb,
    max(CASE WHEN variant = 'B' THEN n_conv END) AS cb
  FROM arms
),
stat AS (
  SELECT na, ca, nb, cb,
         ca * 1e0 / na AS pa, cb * 1e0 / nb AS pb,
         (ca + cb) * 1e0 / (na + nb) AS pp
  FROM wide
)
SELECT cast(na AS BIGINT) AS n_a, cast(ca AS BIGINT) AS conv_a,
       round(pa, 6) AS rate_a,
       cast(nb AS BIGINT) AS n_b, cast(cb AS BIGINT) AS conv_b,
       round(pb, 6) AS rate_b,
       round((pa - pb)
             / sqrt(pp * (1 - pp) * (1e0 / na + 1e0 / nb)), 4) AS z,
       cast(CASE WHEN abs((pa - pb)
             / sqrt(pp * (1 - pp) * (1e0 / na + 1e0 / nb))) > 1.96
             THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM stat
"""


@register("x71_ab_test_ztest", _X71_SQL, first_round=9)
def x71_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with a two-proportion z-test: users are
    assigned to arms by a deterministic md5 split (first hex digit
    < '8' -> A, the hash-based bucketing every experimentation system
    uses so assignment is stable and joins-free), conversion = a
    purchase within ONE DAY of the user's first event (the activation
    metric — chosen over raw "ever purchased", which is ~100% in this
    data and would put the pooled variance at the degenerate 0), and
    the pooled-variance z statistic decides
    significance at |z| > 1.96 — the closed-form readout an
    experimentation dashboard serves, computed in one pass.

    Plan shape: two user-keyed distincts and a user-keyed left join,
    then everything is arm-sized (2 rows) — the z arithmetic is a
    1-row projection. At any event volume the only data-sized stages
    are the distincts; assignment is a map-side hash expression, so
    no assignment table ever materializes or shuffles."""
    e = _t(spark, sf_dir, "events")
    assign = e.select(
        "user_id",
        F.when(
            F.md5(F.col("user_id").cast("string")) < "8", "A"
        )
        .otherwise("B")
        .alias("variant"),
    ).distinct()
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("t0"))
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("ts") <= F.col("t0") + F.expr("INTERVAL 1 DAY"))
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    arms = (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce("converted", F.lit(0))).alias("n_conv"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("n_conv"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("n_conv"))).alias("cb"),
    )
    pa = F.col("ca") / F.col("na")
    pb = F.col("cb") / F.col("nb")
    pp = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    z = (pa - pb) / F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return wide.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("ca").cast("bigint").alias("conv_a"),
        F.round(pa, 6).alias("rate_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("cb").cast("bigint").alias("conv_b"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 4).alias("z"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).cast("bigint").alias(
            "significant"
        ),
    )


_X69_SQL = f"""
WITH {_bm25_scores_sql()}
SELECT doc_id, round(score, 4) AS score,
       cast(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rnk
FROM bm25
QUALIFY rnk <= 10
"""


@register("x69_bm25_topk", _X69_SQL, first_round=9)
def x69_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (Robertson k1=1.2, b=0.75, the Lucene
    idf variant ln((N-df+0.5)/(df+0.5)+1)): top-10 documents for the
    fixed query "hash join stream" — the exact keyword-search scoring
    a corpus-curation stack uses for benchmark mining, targeted
    filtering, and as the lexical leg of hybrid retrieval (ann23).
    tx9's TF-IDF ranks terms WITHIN a document; BM25 ranks DOCUMENTS
    for a query, with document-length normalization TF-IDF lacks.

    Plan shape: one token explode feeds both the per-doc length agg
    and the query-term tf counts (the term filter prunes the explode
    to query-vocabulary size immediately); df and the (N, avgdl) stats
    frame are term-/single-row-sized broadcasts onto the tf stream —
    the corpus never shuffles on token content. The top-10 cut
    compiles to TakeOrderedAndProject (LimitPushDownThroughWindow
    converts the empty-partition row_number filter into per-partition
    heaps), never a full sort of the scored set."""
    d = _t(spark, sf_dir, "documents")
    scored = _bm25_scores_spark(d)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "doc_id",
            F.round("score", 4).alias("score"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_X62_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS cur, ts, event_id,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
trans AS (
  SELECT cur, nxt, count(*) AS c FROM seq WHERE nxt IS NOT NULL
  GROUP BY 1, 2
)
SELECT cur, nxt, cast(c AS BIGINT) AS n_transitions,
       round(c * 1.0 / sum(c) OVER (PARTITION BY cur), 4) AS p
FROM trans
"""


@register("x62_markov_transitions", _X62_SQL)
def x62_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), estimated from every
    adjacent pair in each user's (ts, event_id)-ordered stream — the
    behavioral fingerprint that feeds next-event prediction, bot
    detection (near-deterministic rows are scripted clients), and
    simulation; for text the identical algebra is tx10's bigram LM,
    so this is that operator generalized from tokens to event
    streams. Each row of the matrix sums to 1 by construction
    (verified in tests), making it directly usable as a stochastic
    matrix.

    Plan shape: one user-keyed window (the lead) — the same single
    exchange x15's sessionizer pays — then a transition-type agg
    whose group space is |event types|^2 (a constant-size matrix, 25
    cells here); normalization is a window over that matrix, so the
    transition subtree is computed exactly once (a normalize JOIN
    would re-derive it for the build side). At any event volume the
    only data-sized stage is the lead window."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # normalize via a window over the |types|^2 matrix — no join, and
    # the transition subtree is computed exactly once
    total = F.sum("c").over(Window.partitionBy("cur"))
    return trans.select(
        "cur",
        "nxt",
        F.col("c").cast("bigint").alias("n_transitions"),
        F.round(F.col("c") / total, 4).alias("p"),
    )


_X61_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
  FROM events
),
cells AS (
  SELECT f.cohort_week,
         cast(date_diff('day', f.cohort_week, a.active_week) / 7
              AS BIGINT) AS week_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN firsts f ON a.user_id = f.user_id
  GROUP BY 1, 2
),
sizes AS (SELECT cohort_week, count(*) AS n_cohort FROM firsts GROUP BY 1)
SELECT cast(cells.cohort_week AS TIMESTAMP) AS cohort_week,
       week_offset,
       cast(n_active AS BIGINT) AS n_active,
       cast(n_cohort AS BIGINT) AS n_cohort,
       round(n_active * 1.0 / n_cohort, 4) AS retention
FROM cells JOIN sizes ON sizes.cohort_week = cells.cohort_week
"""


@register("x61_retention_cohorts", _X61_SQL)
def x61_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the third member of the
    event-analytics trio (x15/st2 sessions, x59 funnel, x60
    attribution): users cohort by the ISO week of their FIRST event,
    and each (cohort, week-offset) cell reports what fraction of the
    cohort was active that many weeks later. Week arithmetic is
    integer throughout (date_trunc to Monday in both engines, day
    difference / 7), so the matrix is engine-exact.

    Plan shape: two user-keyed aggs (first-event week; distinct
    active weeks — both map-side combinable) join on user_id, then a
    cohort-keyed count-distinct; every frame after the raw scan is
    user-sized or smaller, and the matrix itself is (weeks x offsets)
    — a constant-size report no matter the event volume. Cohort sizes
    broadcast. Reference analog: src/load.py's per-batch summary
    counts, pivoted from batches to user lifecycles."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    cells = (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        F.col("cohort_week").cast("timestamp").alias("cohort_week"),
        "week_offset",
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("n_cohort").cast("bigint").alias("n_cohort"),
        F.round(F.col("n_active") / F.col("n_cohort"), 4).alias(
            "retention"
        ),
    )


_X60_SQL = """
WITH conv AS (
  SELECT user_id, event_id AS conv_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type AS channel, ts AS touch_ts
  FROM events WHERE event_type IN ('view', 'click')
),
pairs AS (
  SELECT conv.user_id, conv.conv_id, conv.conv_ts,
         touch.channel, touch.touch_ts
  FROM conv JOIN touch
    ON touch.user_id = conv.user_id
   AND touch.touch_ts <= conv.conv_ts
   AND touch.touch_ts > conv.conv_ts - INTERVAL 7 DAY
),
attributed AS (
  SELECT conv_id, channel FROM (
    SELECT conv_id, channel,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY touch_ts DESC, channel) AS rn
    FROM pairs
  ) WHERE rn = 1
),
tot AS (SELECT count(*) AS n_conv FROM conv)
SELECT attributed.channel,
       cast(count(*) AS BIGINT) AS n_attributed,
       cast(tot.n_conv AS BIGINT) AS n_conversions,
       round(count(*) * 1.0 / tot.n_conv, 4) AS share
FROM attributed, tot
GROUP BY 1, tot.n_conv
"""


@register("x60_last_touch_attribution", _X60_SQL)
def x60_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the most
    recent view/click by the same user within a 7-day lookback —
    x59's funnel says HOW MANY convert, this says WHICH channel gets
    the credit, the other half of the event-analytics pair. The
    touch-to-conversion join is an interval join keyed on user_id
    (the same bounded-interval shape the streaming side handles with
    stream_stream_interval_join), then one conversion-keyed
    row_number picks the latest touch — deterministic tie-break on
    (touch_ts desc, channel) so simultaneous touches attribute
    identically in both engines.

    Plan shape: the join is a user-keyed equi-join with the interval
    as a residual predicate — per-user fan-out is bounded by that
    user's touches in the lookback window, never a cartesian stage;
    the attribution window is keyed on conv_id (conversion-sized);
    the total is a broadcast scalar. At 100 TB the lookback bound is
    what keeps state finite — the same reason the streaming twin's
    watermark works."""
    e = _t(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("touch_ts")
            > F.col("conv_ts") - F.expr("INTERVAL 7 DAY")
        )
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), "channel"
    )
    attributed = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("conv_id", "channel")
    )
    tot = conv.agg(F.count(F.lit(1)).alias("n_conv"))
    return (
        attributed.groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n_attributed"))
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.col("n_attributed").cast("bigint").alias("n_attributed"),
            F.col("n_conv").cast("bigint").alias("n_conversions"),
            F.round(F.col("n_attributed") / F.col("n_conv"), 4).alias(
                "share"
            ),
        )
    )


_X58_B = 32  # bootstrap replicates


# Poisson(1) CDF thresholds for the inverse-CDF draw (k = 0..5; the
# tail mass past 6 is 6e-5 and maps to 6). Exact double literals so
# both engines binary-match the CASE ladder.
_X58_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
)


def _x58_sql() -> str:
    from ..llm.dedup import _hexint_sql

    hexed = _hexint_sql(
        "md5('bs' || '|' || cast(doc_id AS VARCHAR) || '|' "
        "|| cast(b AS VARCHAR))",
        8,
    )
    u = f"(({hexed}) + 0.5) / 4294967296.0"
    ladder = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_X58_CDF)
    )
    return f"""
    WITH reps AS (
      SELECT source, doc_id, cast(n_chars AS DOUBLE) AS x, b,
             CASE {ladder} ELSE 6 END AS w
      FROM documents CROSS JOIN (
        SELECT unnest(range(0, {_X58_B})) AS b
      )
    ),
    rmeans AS (
      SELECT source, b, sum(w * x) / sum(w) AS m
      FROM reps GROUP BY 1, 2 HAVING sum(w) > 0
    ),
    boot AS (SELECT source, stddev_samp(m) AS se_boot FROM rmeans GROUP BY 1),
    plain AS (
      SELECT source, count(*) AS n, avg(cast(n_chars AS DOUBLE)) AS mean_x,
             stddev_samp(cast(n_chars AS DOUBLE)) / sqrt(count(*))
               AS se_analytic
      FROM documents GROUP BY 1
    )
    SELECT plain.source, cast(n AS BIGINT) AS n, round(mean_x, 4) AS mean_x,
           round(se_boot, 4) AS se_boot,
           round(se_analytic, 4) AS se_analytic,
           round(se_boot / se_analytic, 2) AS se_ratio
    FROM plain JOIN boot ON boot.source = plain.source
    """


@register("x58_bootstrap_se", None)  # sql attached below
def x58_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error bars in ONE pass: Poisson-bootstrap standard errors for
    the per-source mean document length. The classical bootstrap
    resamples the data B times — B full scans, impossible at 100 TB.
    The Poisson bootstrap (Chamandy et al. 2012, "Estimating
    uncertainty for massive data streams") replaces resampling with
    per-row replicate weights w ~ Poisson(1): every row contributes
    to all B replicate sums in the same scan, the weighted replicate
    means' spread estimates the sampling error, and the replicate
    sums are plain map-side-combinable aggregates. Weights here are
    DERIVED from the row's identity hash through the exact Poisson(1)
    inverse CDF, so the "randomness" is reproducible across runs,
    engines, and partitionings — which is what lets a DuckDB oracle
    hash-match a bootstrap, normally the least replayable of methods.
    CONTRACT form: the analytic SE (sigma/sqrt(n)) runs in the same
    plan, and the ratio is pinned near 1 — the bootstrap is verified
    against closed-form truth where the closed form exists, so it can
    be trusted where it doesn't (ratio metrics, quantiles, dedup
    rates).

    Plan shape: one B-way explode (constant fan-out, map-side) into a
    (source, b)-keyed agg — replicate count, not corpus size, bounds
    the group space; the analytic side is one keyed agg over the raw
    rows. Reference analog: src/load.py's count reconciliation,
    upgraded from "is the count right" to "how sure are we about the
    statistic"."""
    from ..llm.dedup import _hexint

    d = _t(spark, sf_dir, "documents")
    reps = d.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("double").alias("x"),
        F.explode(
            F.sequence(F.lit(0), F.lit(_X58_B - 1))
        ).alias("b"),
    )
    u = (
        _hexint(
            F.md5(
                F.concat_ws(
                    "|", F.lit("bs"), F.col("doc_id"), F.col("b")
                )
            ),
            8,
        )
        + 0.5
    ) / F.lit(4294967296.0)
    w = F.lit(6)
    for k in range(len(_X58_CDF) - 1, -1, -1):
        w = F.when(u < float(_X58_CDF[k]), F.lit(k)).otherwise(w)
    reps = reps.withColumn("w", w)
    rmeans = (
        reps.groupBy("source", "b")
        .agg(F.sum(F.col("w") * F.col("x")).alias("sx"), F.sum("w").alias("sw"))
        .filter(F.col("sw") > 0)
        .select("source", "b", (F.col("sx") / F.col("sw")).alias("m"))
    )
    boot = rmeans.groupBy("source").agg(F.stddev_samp("m").alias("se_boot"))
    plain = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("n_chars").cast("double")).alias("mean_x"),
        (
            F.stddev_samp(F.col("n_chars").cast("double"))
            / F.sqrt(F.count(F.lit(1)))
        ).alias("se_analytic"),
    )
    return plain.join(boot, "source").select(
        "source",
        F.col("n").cast("bigint").alias("n"),
        F.round("mean_x", 4).alias("mean_x"),
        F.round("se_boot", 4).alias("se_boot"),
        F.round("se_analytic", 4).alias("se_analytic"),
        F.round(F.col("se_boot") / F.col("se_analytic"), 2).alias(
            "se_ratio"
        ),
    )


REGISTRY["x58_bootstrap_se"].sql = _x58_sql()


_X57_K = 5


def _x57_sql() -> str:
    from ..llm.dedup import _hexint_sql

    hexed = _hexint_sql("md5('ps' || '|' || cast(doc_id AS VARCHAR))", 8)
    u = f"(({hexed}) + 0.5) / 4294967296.0"
    return f"""
    WITH scored AS (
      SELECT source, doc_id, n_chars,
             round(ln({u}) / n_chars, 8) AS priority
      FROM documents
    )
    SELECT source, doc_id, cast(n_chars AS BIGINT) AS n_chars, priority,
           cast(row_number() OVER (PARTITION BY source
                                   ORDER BY priority DESC, doc_id)
                AS BIGINT) AS rk
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY source
                               ORDER BY priority DESC, doc_id) <= {_X57_K}
    """


@register("x57_per_source_reservoir", None)  # sql attached below
def x57_per_source_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced fixed-k sampling: an exact weighted reservoir
    (Efraimidis-Spirakis, x50's priority) of k={_k} documents from
    EVERY source — the op that builds a balanced eval/inspection set
    where x50 guarantees only a global size (a dominant source can
    claim every slot) and x12 guarantees only per-stratum rates (a
    tiny source can round to zero rows). Per-group fixed-k is the
    output contract a human-review queue or per-source quality probe
    actually needs: every feed represented, none over-represented,
    and the same hash-derived priorities make the per-source sample a
    pure function of row identity — stable across runs, engines, and
    partitionings, and mergeable (per-shard top-k per source folds to
    the global per-source top-k).

    Plan shape: a map-side priority projection and ONE source-keyed
    window (rank within source) — the per-group analog of x50's heap;
    the group-limit pushes below the exchange (WindowGroupLimit), so
    only ~k rows per source per input partition ever shuffle."""
    from ..llm.dedup import _hexint

    d = _t(spark, sf_dir, "documents")
    u = (
        _hexint(F.md5(F.concat_ws("|", F.lit("ps"), F.col("doc_id"))), 8)
        + 0.5
    ) / F.lit(4294967296.0)
    scored = d.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.round(F.log(u) / F.col("n_chars"), 8).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("priority").desc(), "doc_id"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _X57_K)
        .select(
            "source", "doc_id", "n_chars", "priority",
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


x57_per_source_reservoir.__doc__ = x57_per_source_reservoir.__doc__.replace(
    "{_k}", str(_X57_K)
)


REGISTRY["x57_per_source_reservoir"].sql = _x57_sql()


_X55_BUDGET_FRAC = 0.5


_X55_SQL = f"""
WITH sizes AS (
  SELECT source,
         sum(len(string_split_regex(trim(text), '\\s+'))) AS c
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT source, c,
         row_number() OVER (ORDER BY c, source) AS rk,
         sum(c) OVER (ORDER BY c, source ROWS UNBOUNDED PRECEDING) - c
           AS pre,
         count(*) OVER () AS s,
         sum(c) OVER () AS tot
  FROM sizes
),
b AS (SELECT floor({_X55_BUDGET_FRAC} * tot) AS budget FROM ranked LIMIT 1),
seg AS (
  SELECT min(rk) AS rk FROM ranked, b
  WHERE pre + (s - rk + 1) * c >= budget
),
lvl AS (
  SELECT (budget - pre) * 1.0 / (s - ranked.rk + 1) AS level
  FROM ranked JOIN seg ON ranked.rk = seg.rk CROSS JOIN b
)
SELECT sizes.source, cast(c AS BIGINT) AS n_tokens,
       round(least(c * 1.0, level), 2) AS alloc_tokens,
       round(least(c * 1.0, level) / c, 4) AS alloc_frac,
       c * 1.0 <= level AS kept_whole
FROM sizes CROSS JOIN lvl
"""


@register("x55_unimax_alloc", _X55_SQL)
def x55_unimax_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained mixture allocation by WATER-FILLING — the
    UniMax sampling rule (Chung et al. 2023): given a global token
    budget (here 50% of the corpus), every source receives
    min(its size, L) where the water level L is chosen so allocations
    sum exactly to the budget. Small sources are kept whole, large
    sources are capped at one common level — the fairness dual of
    x44's temperature mixing (which reweights by c^T and still lets
    the head dominate) and the allocation that minimizes the maximum
    repetition rate of any source under the budget. The level has a
    closed form: sort sources by size, find the segment where the
    budget line crosses the water profile (prefix + remaining*c spans
    the budget), then L = (budget - prefix_below) / n_at_or_above —
    pure window algebra, no iteration.

    Plan shape: ONE corpus-sized stage (the per-source token count,
    map-side combinable); everything after — ranking, prefix sums,
    segment pick, level — runs on the SOURCE CATALOG (a few hundred
    rows at any corpus scale), where the global-order window's single
    partition is the honest shape, same as x49's planner and the
    sequence engine's O(buckets) driver fold. Reference analog: the
    banding rules of src/transform.py, lifted from per-row category
    assignment to corpus-level capacity planning."""
    from ..llm.text import token_count

    d = _t(spark, sf_dir, "documents")
    sizes = d.groupBy("source").agg(
        F.sum(token_count("text")).alias("c")
    )
    w_ord = Window.orderBy("c", "source")
    w_all = Window.partitionBy()
    ranked = sizes.select(
        "source",
        "c",
        F.row_number().over(w_ord).alias("rk"),
        (
            F.sum("c").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.col("c")
        ).alias("pre"),
        F.count(F.lit(1)).over(w_all).alias("s"),
        F.sum("c").over(w_all).alias("tot"),
    )
    withb = ranked.withColumn(
        "budget", F.floor(F.lit(_X55_BUDGET_FRAC) * F.col("tot"))
    )
    seg = (
        withb.filter(
            F.col("pre") + (F.col("s") - F.col("rk") + 1) * F.col("c")
            >= F.col("budget")
        )
        .agg(F.min("rk").alias("rk"))
    )
    lvl = (
        withb.join(seg, "rk")
        .select(
            (
                (F.col("budget") - F.col("pre"))
                / (F.col("s") - F.col("rk") + 1)
            ).alias("level")
        )
    )
    return sizes.crossJoin(F.broadcast(lvl)).select(
        "source",
        F.col("c").cast("bigint").alias("n_tokens"),
        F.round(F.least(F.col("c").cast("double"), F.col("level")), 2).alias(
            "alloc_tokens"
        ),
        F.round(
            F.least(F.col("c").cast("double"), F.col("level")) / F.col("c"),
            4,
        ).alias("alloc_frac"),
        (F.col("c").cast("double") <= F.col("level")).alias("kept_whole"),
    )


_X56_SQL = """
WITH v AS (
  SELECT event_type AS grp,
         cast(round(value * 100, 0) AS BIGINT) AS v,
         cast(value AS DOUBLE) AS price
  FROM events
),
b AS (
  SELECT grp, length(bin(v)) AS blen,
         CASE WHEN v < 8 THEN v
              ELSE cast(floor(v / power(2, length(bin(v)) - 4)) AS BIGINT) - 8
         END AS sub,
         count(*) AS c
  FROM v GROUP BY 1, 2, 3
),
r AS (
  SELECT grp, blen, sub, c,
         CASE WHEN blen <= 3 THEN cast(sub AS DOUBLE)
              ELSE (sub + 8.5) * power(2, blen - 4) END AS rep,
         sum(c) OVER (PARTITION BY grp ORDER BY blen, sub
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM b
),
n AS (SELECT grp, sum(c) AS n FROM b GROUP BY 1),
qs AS (SELECT unnest([0.25, 0.75]) AS q),
est AS (
  SELECT r.grp, qs.q, arg_min(r.rep, r.blen * 8 + r.sub) / 100 AS qv
  FROM r JOIN n USING (grp) CROSS JOIN qs
  WHERE r.cum >= ceil(qs.q * n.n)
  GROUP BY 1, 2
),
fences AS (
  SELECT a.grp,
         a.qv - 1.5 * (b.qv - a.qv) AS lo,
         b.qv + 1.5 * (b.qv - a.qv) AS hi
  FROM est a JOIN est b ON a.grp = b.grp AND a.q = 0.25 AND b.q = 0.75
),
exact AS (
  SELECT grp,
         quantile_cont(price, 0.25) AS q1x,
         quantile_cont(price, 0.75) AS q3x
  FROM v GROUP BY 1
),
xfences AS (
  SELECT grp, q1x - 1.5 * (q3x - q1x) AS xlo, q3x + 1.5 * (q3x - q1x) AS xhi
  FROM exact
),
flags AS (
  SELECT v.grp,
         sum(CASE WHEN price < f.lo OR price > f.hi THEN 1 ELSE 0 END)
           AS n_out_sketch,
         sum(CASE WHEN price < xf.xlo OR price > xf.xhi THEN 1 ELSE 0 END)
           AS n_out_exact,
         sum(CASE WHEN (price < f.lo OR price > f.hi)
                   <> (price < xf.xlo OR price > xf.xhi)
                  THEN 1 ELSE 0 END) AS n_disagree,
         count(*) AS n
  FROM v JOIN fences f USING (grp) JOIN xfences xf USING (grp)
  GROUP BY 1
)
SELECT flags.grp AS event_type,
       round(f.lo, 2) AS fence_lo, round(f.hi, 2) AS fence_hi,
       cast(n_out_sketch AS BIGINT) AS n_out_sketch,
       cast(n_out_exact AS BIGINT) AS n_out_exact,
       cast(n_disagree AS BIGINT) AS n_disagree,
       round(n_disagree * 1.0 / n, 4) AS disagree_frac
FROM flags JOIN fences f ON f.grp = flags.grp
"""


@register("x56_sketch_fence_outliers", _X56_SQL)
def x56_sketch_fence_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flagging from SKETCH quantiles: Tukey fences
    (q1 - 1.5 IQR, q3 + 1.5 IQR) computed from hh5's mergeable
    log-bin histogram instead of an exact per-group sort — the
    composition a 100 TB quality monitor actually runs, because the
    histogram folds incrementally (x41's discipline) while exact
    quantiles re-sort history every batch. x4 flags outliers against
    a mean (skew-fragile); these fences are median-family robust.
    CONTRACT form: the exact-quantile fences run in the same plan and
    the query emits the per-group flag disagreement — the number that
    says what the sketch's 1/16 bin error costs in decisions (rows
    whose price sits between the sketch fence and the exact fence),
    pinned small in tests.

    Plan shape: hh5's histogram agg (the one corpus-sized keyed
    stage, map-side combinable) + a second pass that joins two
    source-catalog-sized fence tables back to flag rows — the flag
    pass is a broadcast join, never a sort. The exact side exists
    only for the contract."""
    from ..llm.sketch import logbin_histogram, logbin_quantiles

    e = _t(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100, 0).cast("bigint")
    vals = e.select(
        F.col("event_type").alias("grp"),
        v.alias("v"),
        F.col("value").cast("double").alias("price"),
    )
    # pin the histogram: it is the ONE corpus-sized agg, and un-pinned
    # it re-ran once per downstream reference (the quantile reader's
    # cum/total legs x the q1/q3 split x fences' two consumers pushed
    # the before-plan to 60 Exchanges; r15, guide §2.4). State is
    # catalog x bins rows — the mergeable sketch a monitor persists.
    b = logbin_histogram(vals, "grp", "v").localCheckpoint(eager=True)
    est = logbin_quantiles(b, (0.25, 0.75), "grp").select(
        "grp", "q", (F.col("est") / 100).alias("qv")
    )
    # q1/q3 as a conditional agg over est's (grp, q) rows — one pass,
    # replacing the filter-split + self-join that re-executed the
    # quantile subtree per leg (identical values: est always emits
    # both q rows per group)
    fences = (
        est.groupBy("grp")
        .agg(
            F.max(F.when(F.col("q") == 0.25, F.col("qv"))).alias("q1"),
            F.max(F.when(F.col("q") == 0.75, F.col("qv"))).alias("q3"),
        )
        .select(
            "grp",
            (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
            (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
        )
    )
    exact = vals.groupBy("grp").agg(
        F.percentile("price", 0.25).alias("q1x"),
        F.percentile("price", 0.75).alias("q3x"),
    )
    xfences = exact.select(
        "grp",
        (F.col("q1x") - 1.5 * (F.col("q3x") - F.col("q1x"))).alias("xlo"),
        (F.col("q3x") + 1.5 * (F.col("q3x") - F.col("q1x"))).alias("xhi"),
    )
    sk_out = (F.col("price") < F.col("lo")) | (F.col("price") > F.col("hi"))
    ex_out = (F.col("price") < F.col("xlo")) | (F.col("price") > F.col("xhi"))
    flags = (
        vals.join(F.broadcast(fences), "grp")
        .join(F.broadcast(xfences), "grp")
        .groupBy("grp")
        .agg(
            F.sum(sk_out.cast("int")).alias("n_out_sketch"),
            F.sum(ex_out.cast("int")).alias("n_out_exact"),
            F.sum((sk_out != ex_out).cast("int")).alias("n_disagree"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return flags.join(fences, "grp").select(
        F.col("grp").alias("event_type"),
        F.round(F.col("lo"), 2).alias("fence_lo"),
        F.round(F.col("hi"), 2).alias("fence_hi"),
        F.col("n_out_sketch").cast("bigint").alias("n_out_sketch"),
        F.col("n_out_exact").cast("bigint").alias("n_out_exact"),
        F.col("n_disagree").cast("bigint").alias("n_disagree"),
        F.round(F.col("n_disagree") / F.col("n"), 4).alias("disagree_frac"),
    )


_X53_W = 64  # chunk window, tokens


_X53_S = 48  # stride (16-token overlap between consecutive chunks)


_X53_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) <= {_X53_W} THEN 1
              ELSE cast(ceil((len(toks) - {_X53_W}) / {_X53_S}.0) AS BIGINT) + 1
         END AS nc
  FROM t
),
c AS (SELECT doc_id, toks, unnest(range(0, nc)) AS ci FROM m)
SELECT doc_id, cast(ci AS BIGINT) AS chunk_idx,
       cast(ci * {_X53_S} + 1 AS BIGINT) AS start_tok,
       cast(len(list_slice(toks, ci * {_X53_S} + 1,
                           ci * {_X53_S} + {_X53_W})) AS BIGINT) AS n_tokens,
       md5(array_to_string(list_slice(toks, ci * {_X53_S} + 1,
                                      ci * {_X53_S} + {_X53_W}), ' '))
         AS chunk_hash
FROM c
"""


@register("x53_rag_chunks", _X53_SQL)
def x53_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-ready chunking: split every document into overlapping
    64-token windows at stride 48 (16-token overlap so no
    sentence straddling a boundary is lost to BOTH chunks), with a
    STABLE identity per chunk — (doc_id, chunk_idx, start_tok) is a
    pure function of the text, and chunk_hash is the md5 of the chunk
    content, so re-running the pipeline, re-partitioning, or growing
    the corpus never re-keys existing chunks. This is the prep stage
    every RAG / embedding pipeline runs before ann1-ann20 can index at
    sub-document granularity, and the chunk_hash column is exactly
    what dd10's chunk-dedup and x21's incremental index consume —
    chunking, dedup, and ANN share one identity scheme.

    Plan shape: the zero-shuffle ideal — one projection computes the
    chunk count per doc, one explode emits the windows, every column
    is a map-side expression over the token array; no exchange of any
    kind, so it scales embarrassingly (each 100 TB file partition
    chunks independently). Window coverage is exact: the last window
    starts at (nc-1)*48+1 <= n, so every token lands in at
    least one chunk. Reference analog: the chunked big-file read of
    src/extract.py:359-425, applied to text rather than rows."""
    from ..llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    nc = (
        F.when(n <= _X53_W, F.lit(1).cast("bigint"))
        .otherwise(F.ceil((n - _X53_W) / F.lit(float(_X53_S))) + 1)
    )
    m = d.select(
        "doc_id", toks.alias("toks"), nc.alias("nc")
    )
    c = m.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("nc") - 1)).alias(
            "ci"
        ),
    )
    start = (F.col("ci") * _X53_S + 1).cast("int")
    chunk = F.slice(F.col("toks"), start, _X53_W)
    return c.select(
        "doc_id",
        F.col("ci").cast("bigint").alias("chunk_idx"),
        (F.col("ci") * _X53_S + 1).cast("bigint").alias("start_tok"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


_X79_TYPES = ["click", "error", "purchase", "signup", "view"]

_X79_SQL = f"""
SELECT user_id,
       {", ".join(
           f"cast(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
           f" AS n_{t}" for t in _X79_TYPES)},
       cast(round(coalesce(
         sum(value) FILTER (WHERE event_type = 'purchase'), 0) * 100)
         AS BIGINT) AS purchase_cents
FROM events GROUP BY 1
"""


@register("x79_user_feature_pivot", _X79_SQL, first_round=10)
def x79_user_feature_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity feature matrix via pivot: one row per user, one
    column per event type (counts) plus purchase revenue — the
    wide-format feature extraction every downstream model join starts
    from, and the inverse of x8's unpivot. The pivot VALUE LIST is
    fixed up front (the five reference event types): Spark's
    two-phase pivot with an unknown value list adds a whole distinct
    scan job and makes the output schema data-dependent — both
    unacceptable in a 100 TB lineage, where the set of event types is
    a contract, not a discovery.

    Plan shape: one user-keyed hash aggregation with map-side
    partials; the pivot compiles to conditional aggregates inside the
    SAME agg (no join, no extra shuffle, no Expand). Revenue is
    summed in exact integer cents (cross-engine float trap)."""
    e = _t(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in _X79_TYPES
    ]
    cents = F.round(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                )
            ),
            F.lit(0.0),
        )
        * 100
    ).cast("bigint")
    return e.groupBy("user_id").agg(*aggs, cents.alias("purchase_cents"))


# Quintile boundaries at the classic 20/40/60/80 cuts. Metrics are
# exact integers (days, counts, cents), so percentile interpolation
# (1-f)*a + f*b runs on exact inputs and both engines produce the
# same doubles.
_X80_QS = (0.2, 0.4, 0.6, 0.8)
_X80_REF = "2024-02-01 00:00:00"  # fixed recency anchor (max ts + 1d)

_X80_SQL = f"""
WITH m AS (
  SELECT user_id,
         date_diff('day', max(ts),
                   TIMESTAMP '{_X80_REF}') AS r_days,
         cast(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS freq,
         cast(coalesce(
           sum(cast(round(value * 100) AS BIGINT))
             FILTER (WHERE event_type = 'purchase'), 0)
           AS BIGINT) AS mon_cents
  FROM events GROUP BY 1
),
b AS (
  SELECT
    {", ".join(f"quantile_cont(r_days, {q}) AS rq{i}"
               for i, q in enumerate(_X80_QS))},
    {", ".join(f"quantile_cont(freq, {q}) AS fq{i}"
               for i, q in enumerate(_X80_QS))},
    {", ".join(f"quantile_cont(mon_cents, {q}) AS mq{i}"
               for i, q in enumerate(_X80_QS))}
  FROM m
)
SELECT user_id, cast(r_days AS BIGINT) AS r_days, freq, mon_cents,
       cast(5 - ((CASE WHEN r_days > rq0 THEN 1 ELSE 0 END)
               + (CASE WHEN r_days > rq1 THEN 1 ELSE 0 END)
               + (CASE WHEN r_days > rq2 THEN 1 ELSE 0 END)
               + (CASE WHEN r_days > rq3 THEN 1 ELSE 0 END)) AS BIGINT)
         AS r_score,
       cast(1 + (CASE WHEN freq > fq0 THEN 1 ELSE 0 END)
              + (CASE WHEN freq > fq1 THEN 1 ELSE 0 END)
              + (CASE WHEN freq > fq2 THEN 1 ELSE 0 END)
              + (CASE WHEN freq > fq3 THEN 1 ELSE 0 END) AS BIGINT)
         AS f_score,
       cast(1 + (CASE WHEN mon_cents > mq0 THEN 1 ELSE 0 END)
              + (CASE WHEN mon_cents > mq1 THEN 1 ELSE 0 END)
              + (CASE WHEN mon_cents > mq2 THEN 1 ELSE 0 END)
              + (CASE WHEN mon_cents > mq3 THEN 1 ELSE 0 END) AS BIGINT)
         AS m_score
FROM m, b
"""


@register("x80_rfm_scores", _X80_SQL, first_round=10)
def x80_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile scoring — the
    classic customer-value segmentation: days since last activity,
    purchase count, and purchase revenue per user, each bucketed 1-5
    against the population's 20/40/60/80th percentiles (recency
    inverted: most recent = 5).

    Plan shape: the scale-safe quintile is boundary-based, NOT
    ntile() — ntile is a GLOBAL ordered window (single-partition
    funnel at 100 TB), while the four percentile boundaries are one
    tiny all-agg row broadcast back over the user metrics, so scoring
    is a map-side CASE ladder. Metrics are exact integers (days,
    counts, per-event-rounded cents summed as ints) so the percentile
    interpolation arithmetic is bit-identical across engines AND the
    per-user state is a true (max, sum, sum) monoid — the same
    operators/aggregate.py algebra the streaming twin
    (stream_rfm_available_now) folds from its batch state."""
    from ..operators.aggregate import rfm_partials, rfm_scores

    e = _t(spark, sf_dir, "events")
    return rfm_scores(rfm_partials(e), _X80_REF)


_X81_ALPHA = 0.3  # smoothing weight on the newest observation


def _x81_horizon() -> int:
    from ..operators.aggregate import ewma_horizon

    return ewma_horizon(_X81_ALPHA)


_X81_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day, n,
         date_diff('day', min(day) OVER (PARTITION BY event_type), day)
           AS i
  FROM daily
),
w AS (
  SELECT event_type, day, n,
         i // {_x81_horizon()} AS b, i % {_x81_horizon()} AS l,
         pow({1 - _X81_ALPHA}e0,
             {_x81_horizon() - 1} - (i % {_x81_horizon()})) AS wt
  FROM idx
),
c AS (
  SELECT event_type, day, n, b, l, wt,
         sum(n * wt) OVER (PARTITION BY event_type, b ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS qx,
         sum(wt) OVER (PARTITION BY event_type, b ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS qn
  FROM w
),
bt AS (
  SELECT event_type, b + 1 AS b,
         sum(n * wt) AS sx, sum(wt) AS sn
  FROM w GROUP BY 1, 2
)
SELECT event_type, cast(day AS TIMESTAMP) AS day,
       cast(n AS BIGINT) AS n,
       round((qx / wt + coalesce(sx, 0e0)
                * pow({1 - _X81_ALPHA}e0, l + 1))
             / (qn / wt + coalesce(sn, 0e0)
                * pow({1 - _X81_ALPHA}e0, l + 1)), 4) AS ewma
FROM c LEFT JOIN bt USING (event_type, b)
"""


@register("x81_ewma_smoothing", _X81_SQL, first_round=10)
def x81_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bias-corrected exponentially-weighted moving average of the
    daily event-count series per event type (alpha = 0.3) — the
    anomaly-monitoring smoother that sits between x77's static
    seasonal profile and x64's CUSUM alarm: ewma_t =
    sum_i (1-a)^(t-i) x_i / sum_i (1-a)^(t-i).

    Plan shape and numeric design: the recursive definition unrolls
    into TWO cumulative sums per day-index BLOCK plus an exact
    one-block-back carry (blocks of L = ewma_horizon(alpha) days, the
    smoother's own <1-ulp memory — see ewma_over_daily's docstring:
    block rebasing keeps every weight in [2^-54, 1], so series of ANY
    length are NaN- and overflow-free, unlike a per-key (1-a)^(imax-i)
    rebase which underflows for >5.7-year series at alpha=0.3).
    All windows are event_type-keyed over the day-level matrix (the
    only event-sized stage is the daily count agg — a SUM monoid, so
    the streaming twin serves this same ewma_over_daily algebra from
    its folded per-batch count states); the carry join is
    block-granularity and broadcast. Both engines accumulate the same
    doubles in the same order, and the display round(4) absorbs the
    last ulp."""
    from ..operators.aggregate import ewma_over_daily

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return ewma_over_daily(daily, "event_type", _X81_ALPHA)


_X82_SQL = """
WITH rev AS (
  SELECT l_partkey AS partkey,
         sum(cast(round(l_extendedprice * 100) AS BIGINT)
             * cast(round(100 - l_discount * 100) AS BIGINT)) AS rc
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT rc, row_number() OVER (ORDER BY rc, partkey) AS i FROM rev
),
agg AS (
  -- HUGEINT accumulation: i*rc products reach ~2e18 per term at 10x
  -- the fixture and the SUM passes 64-bit long before the catalog
  -- stops growing — the rank identity needs 128-bit exactness
  SELECT count(*) AS n, sum(rc) AS s0,
         sum(cast(i AS HUGEINT) * rc) AS s1
  FROM ranked
)
SELECT cast(n AS BIGINT) AS n_parts,
       round((2e0 * s1) / (n * s0) - (n + 1e0) / n, 6) AS gini
FROM agg
"""


@register("x82_gini_concentration", _X82_SQL, first_round=10)
def x82_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across the part
    catalog — the scalar summary of x76's ABC curve (0 = revenue
    spread evenly, ->1 = a few parts carry everything), the number a
    curation pipeline tracks per snapshot to watch source/revenue
    concentration drift without shipping the whole Lorenz curve.
    Computed by the rank identity G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n
    over ascending-revenue ranks.

    Plan shape: the fact scan collapses to the part-keyed exact
    integer revenue agg (x76's), then the global ascending rank rides
    the sequence engine's bucketed decomposition
    (``with_global_sequence`` — O(buckets) driver offsets, per-bucket
    windows, NO single-partition exchange even though the rank is
    global), and the identity folds in one tiny final agg. The
    rank-weighted sum accumulates in DECIMAL(38,0)/HUGEINT — i*x_i
    terms reach ~2e18 already at the 10x fixture and the 64-bit SUM
    overflows long before the catalog stops growing (found by the r10
    10x run under ANSI mode, which turns the silent wrap into an
    error); the only float is the final two-division identity,
    rounded."""
    from ..operators.sequence import with_global_sequence

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * F.round(100 - F.col("l_discount") * 100).cast("bigint")
        ).alias("rc")
    )
    rev = rev.localCheckpoint(eager=False)
    ranked = with_global_sequence(rev, ["rc", "partkey"], name="i")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rc").alias("s0"),
        F.sum(
            F.col("i").cast("decimal(12,0)")
            * F.col("rc").cast("decimal(24,0)")
        ).alias("s1"),
    )
    n = F.col("n")
    # the identity's DENOMINATOR n*s0 also passes 64 bits (2e5 parts x
    # 6e17 total cents-bps at the 10x fixture) — evaluate the final
    # two-division identity entirely in double (exact inputs, one
    # rounding at 6 decimals; DuckDB's n*s0 is HUGEINT so only the
    # Spark side needs the cast)
    return agg.select(
        n.cast("bigint").alias("n_parts"),
        F.round(
            (2.0 * F.col("s1").cast("double"))
            / (n.cast("double") * F.col("s0").cast("double"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


_X83_REF = "2001-08-02 00:00:00"  # aging anchor (testdata max order date + 1 day)

_X83_SQL = f"""
WITH open_orders AS (
  SELECT o_orderkey, o_orderpriority,
         date_diff('day', o_orderdate, TIMESTAMP '{_X83_REF}') AS age_days
  FROM orders WHERE o_orderstatus <> 'F'
),
b AS (
  SELECT o_orderpriority,
         CASE WHEN age_days < 365 THEN '0-1y'
              WHEN age_days < 730 THEN '1-2y'
              WHEN age_days < 1460 THEN '2-4y'
              ELSE '4y+' END AS age_bucket,
         age_days
  FROM open_orders
)
SELECT o_orderpriority, age_bucket,
       cast(count(*) AS BIGINT) AS n_orders,
       cast(max(age_days) AS BIGINT) AS oldest_days
FROM b GROUP BY 1, 2
"""


@register("x83_backlog_aging", _X83_SQL, first_round=10)
def x83_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: every non-finalized order bucketed by
    how long it has been open (against a fixed reference date), per
    priority class — the operations-review matrix ("how much P1 work
    is older than two years?") and the curation analog of "how stale
    is the unprocessed ingest queue per priority". Bucket edges are
    closed-open in days, computed with date_diff on both engines.

    Plan shape: one pushed status filter (PushedFilters on the scan —
    'F' rows never leave parquet), map-side bucket CASE, one
    (priority, bucket)-keyed agg with partials. Nothing else. The
    output is at most |priorities| x 4 rows at any scale."""
    o = _t(spark, sf_dir, "orders")
    age = F.datediff(
        F.lit(_X83_REF).cast("timestamp"), F.col("o_orderdate")
    )
    bucket = (
        F.when(age < 365, "0-1y")
        .when(age < 730, "1-2y")
        .when(age < 1460, "2-4y")
        .otherwise("4y+")
    )
    return (
        o.filter(F.col("o_orderstatus") != "F")
        .select(
            "o_orderpriority",
            bucket.alias("age_bucket"),
            age.alias("age_days"),
        )
        .groupBy("o_orderpriority", "age_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.max("age_days").cast("bigint").alias("oldest_days"),
        )
    )


_X84_CHI2_95 = 3.841  # chi-square 95th percentile, 1 dof

_X84_SQL = f"""
WITH assign AS (
  SELECT DISTINCT user_id,
         CASE WHEN md5(cast(user_id AS VARCHAR)) < '8' THEN 'A'
              ELSE 'B' END AS variant
  FROM events
),
arms AS (
  SELECT
    count(*) FILTER (WHERE variant = 'A') AS na,
    count(*) FILTER (WHERE variant = 'B') AS nb
  FROM assign
)
SELECT cast(na AS BIGINT) AS n_a, cast(nb AS BIGINT) AS n_b,
       round(power(na - (na + nb) / 2e0, 2) / ((na + nb) / 2e0)
           + power(nb - (na + nb) / 2e0, 2) / ((na + nb) / 2e0), 4)
         AS chi2,
       cast(CASE WHEN
         power(na - (na + nb) / 2e0, 2) / ((na + nb) / 2e0)
       + power(nb - (na + nb) / 2e0, 2) / ((na + nb) / 2e0)
         > {_X84_CHI2_95} THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM arms
"""


@register("x84_srm_check", _X84_SQL, first_round=10)
def x84_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) guard for the A/B harness: a
    chi-square goodness-of-fit of the observed arm sizes against the
    designed 50/50 split, flagged at the 95% critical value — the
    experiment-invalidation check that must PASS before x71's z-test
    is even admissible (a biased assignment channel produces beautiful
    p-values about nothing; Fabijan et al.'s diagnosis is that most
    corrupted experiments announce themselves here first). Arm
    assignment is x71's EXACT hash expression, so the two queries
    audit the same experiment.

    Plan shape: one user-distinct agg (the only data-sized stage) into
    a single-row conditional count, then pure scalar arithmetic. The
    chi-square is computed from exact integer counts — the only floats
    are two divisions on one row."""
    e = _t(spark, sf_dir, "events")
    assign = e.select(
        "user_id",
        F.when(
            F.md5(F.col("user_id").cast("string")) < "8", "A"
        ).otherwise("B").alias("variant"),
    ).distinct()
    arms = assign.agg(
        F.count(F.when(F.col("variant") == "A", 1)).alias("na"),
        F.count(F.when(F.col("variant") == "B", 1)).alias("nb"),
    )
    e_half = (F.col("na") + F.col("nb")) / 2.0
    chi2 = (
        F.pow(F.col("na") - e_half, 2) / e_half
        + F.pow(F.col("nb") - e_half, 2) / e_half
    )
    return arms.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(chi2, 4).alias("chi2"),
        F.when(chi2 > _X84_CHI2_95, 1).otherwise(0).cast("bigint").alias(
            "srm_flag"
        ),
    )


_X85_SQL = """
WITH s AS (
  SELECT doc_id,
         md5(substring(text, 1, 64)) AS fp,
         CASE WHEN {b} < 80 THEN 'train'
              WHEN {b} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
fps AS (SELECT DISTINCT fp, split FROM s),
pairs AS (
  SELECT a.fp, a.split AS split_a, b.split AS split_b
  FROM fps a JOIN fps b
    ON a.fp = b.fp AND a.split < b.split
)
SELECT split_a, split_b,
       cast(count(*) AS BIGINT) AS n_shared_fingerprints
FROM pairs GROUP BY 1, 2
"""


@register("x85_split_leakage_audit", None, first_round=10)
def x85_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test LEAKAGE audit: content fingerprints (dd20's
    64-char boilerplate prefix hash) that appear in MORE THAN ONE of
    x11's hash splits, counted per split pair — the internal-hygiene
    twin of dd8/dd18's external decontamination: an eval split that
    shares templates with train inflates every metric computed on it,
    and because x11 splits on doc_id (correctly — content-keyed splits
    would break dedup accounting), near-identical documents DO land
    across splits unless this audit gates the release.

    Plan shape: one map-side projection (split bucket + prefix md5),
    a (fp, split)-distinct, and a fp-keyed self-join that only ever
    matches rows sharing a 16-byte fingerprint (inverted-index
    economics, never all-pairs); output is at most 3 rows."""
    from ..operators.sampling import train_val_test_split

    d = _t(spark, sf_dir, "documents")
    s = train_val_test_split(d, "doc_id", val_pct=10, test_pct=10).select(
        F.md5(F.substring("text", 1, 64)).alias("fp"), "split"
    )
    fps = s.distinct()
    a = fps.select("fp", F.col("split").alias("split_a"))
    b = fps.select("fp", F.col("split").alias("split_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fingerprints"))
    )


def _x85_sql() -> str:
    from ..operators.sampling import hash_bucket_sql

    return _X85_SQL.format(b=hash_bucket_sql("doc_id", 100))


REGISTRY["x85_split_leakage_audit"].sql = _x85_sql()


_X86_SQL = """
WITH b AS (
  SELECT source,
         quantile_cont(n_chars, 0.05) AS p05,
         quantile_cont(n_chars, 0.95) AS p95
  FROM documents GROUP BY 1
),
w AS (
  SELECT d.source,
         d.n_chars,
         least(greatest(d.n_chars * 1e0, b.p05), b.p95) AS wv
  FROM documents d JOIN b ON b.source = d.source
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       round(avg(n_chars), 4) AS raw_mean,
       round(avg(wv), 4) AS winsorized_mean,
       cast(count(*) FILTER (WHERE wv <> n_chars) AS BIGINT) AS n_clamped
FROM w GROUP BY 1
"""


@register("x86_winsorized_stats", _X86_SQL, first_round=10)
def x86_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clamped) per-source length statistics — the
    robust-aggregation form every data-quality dashboard should use
    instead of raw means, which one crawl artifact (a single 2 GB
    concatenation bug) can drag arbitrarily: values outside each
    source's [p05, p95] are clamped to the fence before averaging, and
    the clamp count itself is reported (a rising n_clamped is the
    earliest artifact signal). Complements x4's z-score outlier FLAGS
    (which identify rows) by producing the robust SUMMARY.

    Plan shape: one source-keyed percentile agg (exact interpolation
    over integer lengths — bit-identical across engines), broadcast
    back over the table for the map-side clamp, one source-keyed mean
    agg. Two source-keyed exchanges total, no window, no sort."""
    d = _t(spark, sf_dir, "documents")
    b = d.groupBy("source").agg(
        F.percentile(F.col("n_chars"), F.lit(0.05)).alias("p05"),
        F.percentile(F.col("n_chars"), F.lit(0.95)).alias("p95"),
    )
    w = d.join(F.broadcast(b), "source").select(
        "source", "n_chars",
        F.least(
            F.greatest(F.col("n_chars").cast("double"), F.col("p05")),
            F.col("p95"),
        ).alias("wv"),
    )
    return w.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("raw_mean"),
        F.round(F.avg("wv"), 4).alias("winsorized_mean"),
        F.count(F.when(F.col("wv") != F.col("n_chars"), 1))
        .cast("bigint")
        .alias("n_clamped"),
    )
