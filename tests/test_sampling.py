"""Deterministic sampling: membership must be a pure function of the key
— invariant to partitioning, run count, and table growth."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_etl_pipeline_spark.operators import (
    hash_bucket,
    stratified_hash_sample,
    train_val_test_split,
)


def test_split_partition_invariant(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    one = train_val_test_split(d.repartition(1), "doc_id")
    many = train_val_test_split(d.repartition(16), "doc_id")
    a = {r["doc_id"]: r["split"] for r in one.select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in many.select("doc_id", "split").collect()}
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}


def test_split_append_stable(spark, sf_dir):
    # old rows keep their split when new rows arrive (ntile would not)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = d.filter(F.col("doc_id") % 2 == 0)
    full_assign = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(d, "doc_id").select("doc_id", "split").collect()
    }
    half_assign = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(half, "doc_id").select("doc_id", "split").collect()
    }
    assert all(full_assign[k] == v for k, v in half_assign.items())


def test_stratified_rates_approximate(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = {"en": 30, "zh": 100, "es": 80, "de": 80, "fr": 80}
    sampled = stratified_hash_sample(d, "doc_id", rates, strata_col="lang")
    tot = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get("zh", 0) == tot["zh"]  # 100% stratum keeps everything
    # sampled subset honors the filter exactly: every kept row's bucket < rate
    kept = sampled.withColumn("b", hash_bucket(F.col("doc_id"), 100)).collect()
    for r in kept:
        assert r["b"] < rates[r["lang"]]


def test_hash_bucket_range_and_determinism(spark):
    df = spark.range(0, 2000).withColumn("b", hash_bucket(F.col("id"), 10))
    rows = df.groupBy("b").count().collect()
    assert {r["b"] for r in rows} == set(range(10))  # all buckets hit
    for r in rows:  # roughly uniform (2000 rows / 10 buckets = 200 +/- 50%)
        assert 100 <= r["count"] <= 300


def test_corpus_shuffle_is_dense_deterministic_permutation(spark, sf_dir):
    """x32: positions are exactly 1..N (dense, no gaps), and two
    constructions give the identical order — reproducible training
    order, unlike orderBy(rand())."""
    from python_etl_pipeline_spark.queries import REGISTRY

    a = {r["doc_id"]: r["shuffle_pos"]
         for r in REGISTRY["x32_corpus_shuffle"].spark(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in REGISTRY["x32_corpus_shuffle"].spark(spark, sf_dir).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, len(a) + 1))
    # ...and the order is not the identity (it actually shuffles)
    assert any(pos != i + 1 for i, (d, pos) in enumerate(sorted(a.items())))


def test_zorder_key_interleaves_quadrants(spark, sf_dir):
    """x33's locality contract: the top two z-key bits are the top bits
    of the two dimension bins, so each spatial quadrant maps to one
    contiguous z-key range — the property that gives parquet files
    tight min/max envelopes in BOTH dimensions."""
    from python_etl_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["x33_zorder_key"].spark(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        quadrant = (r["zx"] >= 128, r["zy"] >= 128)
        hi = (r["zkey"] >> 15 & 1 == 1, r["zkey"] >> 14 & 1 == 1)
        assert quadrant == hi
        assert 0 <= r["zkey"] < (1 << 16)


def test_token_sharding_balance_bound(spark, sf_dir):
    """x38 contract: LPT round-robin bounds per-shard token imbalance —
    max-min shard total can never exceed 8 documents' worth of the
    largest per-deal token count; on real data it should be far tighter
    than naive hashing. Assert the hard invariant (max-min <= max doc
    tokens * 1) that the deal order guarantees."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.queries import REGISTRY

    out = REGISTRY["x38_token_sharding"].spark(spark, sf_dir).collect()
    assert len(out) == 8
    totals = [r["total_tokens"] for r in out]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_doc = (
        docs.select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert max(totals) - min(totals) <= max_doc


def test_shard_assignment_materialized_balance(spark, sf_dir):
    """x40 end-to-end: the per-doc LPT assignment written through
    Warehouse.write_bucketed (bucketed BY shard, so each data-parallel
    reader opens only its own bucket files) must still satisfy the
    balance invariant ON THE MATERIALIZED TABLE — per-shard token
    totals read back from disk differ by at most one maximum document's
    tokens — and must be a partition of the corpus (every non-null-text
    doc exactly once)."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.queries import REGISTRY
    from python_etl_pipeline_spark.sources.warehouse import write_bucketed

    assign = REGISTRY["x40_shard_assignment"].spark(spark, sf_dir)
    write_bucketed(assign, "bkt", "shard_assignment", 8, "shard")
    back = spark.table("bkt.shard_assignment")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.filter(F.col("text").isNotNull()).count()
    assert back.count() == n_docs
    assert back.select("doc_id").distinct().count() == n_docs

    totals = {
        r["shard"]: r["t"]
        for r in back.groupBy("shard")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert sorted(totals) == list(range(8))
    max_doc = (
        docs.select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert max(totals.values()) - min(totals.values()) <= max_doc

    # layout-real: the catalog records the bucket spec a reader prunes by
    desc = spark.sql("DESCRIBE EXTENDED bkt.shard_assignment").collect()
    kv = {r["col_name"]: r["data_type"] for r in desc}
    assert "8" in kv.get("Num Buckets", "")
    assert "shard" in kv.get("Bucket Columns", "")


def test_leakage_safe_split_keeps_neardups_together(spark, sf_dir):
    """The property x39 exists for: every near-dup candidate pair must
    land on the same side of the split (a plain per-doc hash split
    leaks eval text into train through near-duplicates)."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.dedup import minhash_lsh_pairs
    from python_etl_pipeline_spark.queries import REGISTRY

    split = REGISTRY["x39_leakage_safe_split"].spark(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", max_bucket_size=100)
    joined = (
        pairs.join(
            split.select(F.col("doc_id").alias("a"), F.col("split").alias("sa")),
            "a",
        )
        .join(
            split.select(F.col("doc_id").alias("b"), F.col("split").alias("sb")),
            "b",
        )
    )
    assert joined.count() > 0  # fixture has near-dups
    assert joined.filter(F.col("sa") != F.col("sb")).count() == 0


def test_sharded_curriculum_invariants(spark, sf_dir):
    """x43's contract, checked on the MATERIALIZED shard-bucketed
    table: (1) positions are dense 1..n_s within every shard,
    (2) phases are non-decreasing along each shard's position order,
    (3) the (doc_id -> shard) map is exactly x40's LPT assignment, and
    (4) phase terciles split the corpus ~equally."""
    from pyspark.sql import Window, functions as F

    from python_etl_pipeline_spark.queries import REGISTRY
    from python_etl_pipeline_spark.sources.warehouse import write_bucketed

    out = REGISTRY["x43_sharded_curriculum"].spark(spark, sf_dir)
    write_bucketed(out, "bkt", "sharded_curriculum", 8, "shard")
    back = spark.table("bkt.sharded_curriculum")

    # (1) dense positions: per shard, sorted positions == 1..n_s
    per = back.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.min("position").alias("lo"),
        F.max("position").alias("hi"),
        F.countDistinct("position").alias("nd"),
    )
    for r in per.collect():
        assert (r["lo"], r["hi"], r["nd"]) == (1, r["n"], r["n"]), r

    # (2) phases non-decreasing along each shard's position order
    w = Window.partitionBy("shard").orderBy("position")
    regress = back.withColumn("prev", F.lag("phase").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("phase") < F.col("prev"))
    )
    assert regress.count() == 0

    # (3) shard map identical to x40's assignment
    x40 = REGISTRY["x40_shard_assignment"].spark(spark, sf_dir)
    diff = (
        back.select("doc_id", F.col("shard").alias("s43"))
        .join(x40.select("doc_id", F.col("shard").alias("s40")), "doc_id", "full")
        .filter(
            F.col("s43").isNull()
            | F.col("s40").isNull()
            | (F.col("s43") != F.col("s40"))
        )
    )
    assert diff.count() == 0

    # (4) tercile phases are balanced to within a row
    ph = {r["phase"]: r["n"] for r in back.groupBy("phase").count().withColumnRenamed("count", "n").collect()}
    assert sorted(ph) == [1, 2, 3]
    assert max(ph.values()) - min(ph.values()) <= 1


def test_temperature_mix_flattens_language_shares(spark, sf_dir):
    """x44's invariants: per-language kept counts equal the alpha=0.5
    temperature formula take_i = min(n_i, floor(budget * sqrt(n_i) /
    sum_j sqrt(n_j))); the dominant language's keep-RATE is the lowest
    (flattening); selection is deterministic across runs."""
    import math

    from python_etl_pipeline_spark.queries import REGISTRY

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_by_lang = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    sw = sum(math.sqrt(n) for n in n_by_lang.values())
    budget = 0.5 * sum(n_by_lang.values())
    want = {
        lang: min(n, math.floor(budget * math.sqrt(n) / sw))
        for lang, n in n_by_lang.items()
    }

    q = REGISTRY["x44_temperature_mix"].spark
    kept = {
        r["lang"]: r["n"]
        for r in q(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert kept == want
    rates = {lang: kept[lang] / n_by_lang[lang] for lang in kept}
    dominant = max(n_by_lang, key=n_by_lang.get)
    assert rates[dominant] == min(rates.values())
    # a rerun picks the identical rows
    a = sorted(r["doc_id"] for r in q(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in q(spark, sf_dir).collect())
    assert a == b


def test_temperature_threshold_tracks_rank_form_within_binomial_noise(spark, sf_dir):
    """x45's contract: the hash-threshold selection hits each
    language's temperature target within binomial noise (|kept -
    rate*n| <= 4*sqrt(n*rate*(1-rate)) + 1 — the price of dropping
    x44's rank shuffle), membership is append-stable (a kept doc stays
    kept when the query reruns), and its plan carries no window at
    all."""
    import math

    from python_etl_pipeline_spark.queries import REGISTRY

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_by_lang = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    sw = sum(math.sqrt(n) for n in n_by_lang.values())
    budget = 0.5 * sum(n_by_lang.values())

    kept = {
        r["lang"]: r["n"]
        for r in REGISTRY["x45_temperature_mix_threshold"]
        .spark(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in n_by_lang.items():
        take = min(n, math.floor(budget * math.sqrt(n) / sw))
        rate = math.floor(1_000_000 * take / n) / 1_000_000
        tol = 4 * math.sqrt(n * rate * (1 - rate)) + 1
        assert abs(kept.get(lang, 0) - rate * n) <= tol, (lang, kept, rate)

    # the threshold form plans NO window operator (x44's rank does)
    plan = (
        REGISTRY["x45_temperature_mix_threshold"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_epoch_mixture_plan_invariants(spark, sf_dir):
    """x47: every full epoch replays the whole domain, the fractional
    epoch is a strict subset, the 4-epoch cap holds, and every language
    in the corpus appears in the plan."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.queries import REGISTRY

    plan = REGISTRY["x47_epoch_mixture"].spark(spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {
        r["lang"]: (r["nd"], r["nc"])
        for r in d.groupBy("lang")
        .agg(F.count("*").alias("nd"), F.sum("n_chars").alias("nc"))
        .collect()
    }
    langs_in_plan = {r["lang"] for r in plan}
    assert langs_in_plan == set(totals)
    max_epoch = {}
    for r in plan:
        assert r["epoch"] <= 5  # cap 4 full + 1 partial
        max_epoch[r["lang"]] = max(max_epoch.get(r["lang"], 0), r["epoch"])
    for r in plan:
        nd, nc = totals[r["lang"]]
        if r["epoch"] < max_epoch[r["lang"]]:
            # full epoch: whole domain
            assert (r["n_docs"], r["n_chars"]) == (nd, nc)
        else:
            # last epoch: full or a strict subset (the fractional one)
            assert r["n_docs"] <= nd and r["n_chars"] <= nc


def test_dsir_importance_separates_target_from_raw(spark, sf_dir):
    """tx21: hashed-bigram importance weights must rank the target
    (English) slice above the rest of the corpus on average — the
    discriminative property DSIR selection relies on."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.queries import REGISTRY

    scored = REGISTRY["tx21_dsir_importance"].spark(spark, sf_dir)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    j = scored.join(d, "doc_id")
    rows = {
        r["is_en"]: r["mw"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("log_weight").alias("mw"))
        .collect()
    }
    assert rows[True] > rows[False]
    # and the relative keep-rule must actually select a majority-target set
    kept = j.filter(F.col("keep"))
    n_kept_en = kept.filter(F.col("lang") == "en").count()
    n_kept = kept.count()
    assert n_kept > 0
    n_docs = d.count()
    n_en = d.filter(F.col("lang") == "en").count()
    # precision well above the base rate (real lift), recall high
    assert n_kept_en / n_kept > 1.5 * (n_en / n_docs)
    assert n_kept_en / n_en > 0.8
