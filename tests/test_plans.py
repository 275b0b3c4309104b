"""Plan-quality regression guards: the physical-plan properties that
matter at 100 TB must survive refactors — pushdown, pruning, broadcast,
exchange counts."""

from __future__ import annotations

import contextlib
import io

from python_etl_pipeline_spark.queries import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "a0_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan          # filter reached the scan
    assert "l_partkey" not in plan                       # untouched column pruned
    assert plan.count("Exchange") <= 2                   # partial agg + AQE read


def test_flagship_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "flagship_customer_segments")
    # formatted output lists each node in the tree and again in details
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_watermark_append_is_pushed_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "i3_watermark_append")
    assert "GreaterThan(o_orderdate" in plan
    assert "Exchange" not in plan                        # zero-shuffle plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "p4_prune_valid_columns")
    assert "ReadSchema: struct<l_linenumber:int,l_quantity:double,l_tax:double>" in plan


def test_dedup_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "o2_dedup_keep_last")
    # one hash-partition exchange for the window; no global sort exchange
    assert plan.count("hashpartitioning") == 1
    assert "rangepartitioning" not in plan


def test_shipping_priority_topk_is_heap_not_sort(spark, sf_dir):
    # ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
    # heap), never a global rangepartitioned sort
    plan = _plan(spark, sf_dir, "a7_shipping_priority")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    # both date filters and the segment filter reached the scans
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_local_supplier_volume_broadcasts_dims(spark, sf_dir):
    # 6-way join: supplier/nation/region broadcast; only fact-fact joins
    # and the final agg may shuffle
    plan = _plan(spark, sf_dir, "a8_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3


def test_json_extract_prunes_to_two_columns(spark, sf_dir):
    # the JSON parse must not widen the scan: only event_type + props read
    plan = _plan(spark, sf_dir, "x13_json_extract")
    assert "event_type" in plan and "props" in plan
    for unused in ("user_id", "value:", "event_id"):
        assert unused not in plan


def test_media_features_prunes_scan(spark, sf_dir):
    # mapInPandas feature extraction reads only doc_id + text
    plan = _plan(spark, sf_dir, "mm1_media_features")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_embedding_neardup_never_collects(spark, sf_dir):
    """dd5's default path must stay fully distributed: constructing the
    query may not pull any rows to the driver (the old implementation
    collected every vector and broadcast a dense matrix), and the plan
    must score candidates via Arrow-batched pandas over a real parquet
    scan, not a LocalTableScan of driver-side data."""
    from unittest import mock

    from pyspark.sql import DataFrame

    def _banned(self, *a, **k):
        raise AssertionError("driver-side collect during query construction")

    with mock.patch.object(DataFrame, "collect", _banned), mock.patch.object(
        DataFrame, "toPandas", _banned
    ), mock.patch.object(DataFrame, "head", _banned), mock.patch.object(
        DataFrame, "take", _banned
    ):
        df = REGISTRY["dd5_embedding_neardup"].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan
    assert "embeddings.parquet" in plan  # vectors come from the scan...
    # ...and the only broadcast inputs are the tiny constant tables
    # (LSH coefficients), never the embeddings relation itself
    assert "PushedFilters" in plan


def test_global_sequence_no_single_partition_window(spark, sf_dir):
    """w1/o5 pin AUTO_INCREMENT / LIMIT-OFFSET semantics; the
    partition-offset composition must keep them fully parallel — the
    old ``Window.orderBy`` form planned Exchange SinglePartition and
    funneled every row through one task."""
    for name in ("w1_display_id", "o5_offset_slice", "o1_digit_sort"):
        plan = _plan(spark, sf_dir, name)
        assert "Exchange SinglePartition" not in plan, (name, plan)
        assert "Window" in plan  # still windowed, but keyed on the bucket
        assert "hashpartitioning(__bkt" in plan, (name, plan)


def test_line_dedup_two_shuffles_no_single_partition(spark, sf_dir):
    # dd15 = chunk-keyed first-occurrence window + doc_id reassembly
    # agg: exactly two wide exchanges, n_chunks as pure projection (no
    # third agg), and never a data-sized single partition
    plan = _plan(spark, sf_dir, "dd15_line_dedup")
    assert "Exchange SinglePartition" not in plan
    assert plan.count("hashpartitioning") <= 2, plan
    # the rn==1 filter must push the group-limit below the exchange so
    # duplicate chunks are dropped map-side, not shuffled
    assert "WindowGroupLimit" in plan


def test_datacard_windows_only_over_histogram(spark, sf_dir):
    # x37's median window runs over the (lang, n_tokens) histogram —
    # distinct values, never the corpus; the only data-sized exchanges
    # are the content-hash ranking and the lang agg
    plan = _plan(spark, sf_dir, "x37_corpus_datacard")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_sessionize_single_shuffle(spark, sf_dir):
    # lag window, running-sum window, and the groupBy all share the
    # user_id partitioning -> one hash exchange end-to-end
    plan = _plan(spark, sf_dir, "x15_sessionize")
    assert plan.count("hashpartitioning") <= 2  # window + final agg at most
    assert "rangepartitioning" not in plan


def test_salted_join_no_nested_loop(spark, sf_dir):
    # the salt must keep the join a hash equi-join on (key, salt) — never
    # a cartesian/nested-loop fallback, and no range sort anywhere
    plan = _plan(spark, sf_dir, "x24_salted_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "rangepartitioning" not in plan


def test_chunk_dedup_two_shuffles(spark, sf_dir):
    # dd10 = window keyed on chunk + groupBy doc_id: exactly two wide
    # exchanges; the chunk explode itself must stay narrow
    plan = _plan(spark, sf_dir, "dd10_chunk_dedup")
    assert plan.count("hashpartitioning") == 2
    assert "rangepartitioning" not in plan


def test_cdc_apply_single_shuffle(spark, sf_dir):
    # union is exchange-free; the ranking window pays the one PK shuffle
    # and the tombstone filter rides it
    plan = _plan(spark, sf_dir, "x25_cdc_apply")
    assert plan.count("hashpartitioning") == 1


def test_corpus_selection_single_shuffle(spark, sf_dir):
    # x28/tx12/tx13 each rank inside one partition key: exactly one
    # hash-partition exchange (the window), no global sort, no join
    for name in ("x28_source_cap", "tx12_token_budget", "tx13_quality_topfrac"):
        plan = _plan(spark, sf_dir, name)
        assert plan.count("hashpartitioning") == 1, (name, plan)
        assert "rangepartitioning" not in plan, name
        assert "Join" not in plan, name


def test_group_zscore_no_python_worker(spark, sf_dir):
    # x7's registered form must stay JVM-side: tiny stats agg broadcast
    # back to the rows — no Arrow/Python stage, no num-groups straggler
    plan = _plan(spark, sf_dir, "x7_group_zscore")
    for marker in ("FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan
    assert "BroadcastHashJoin" in plan


def test_semantic_dedup_never_collects(spark, sf_dir):
    """dd11's construction must stay distributed (k-means assignment and
    the cell-keyed gram pass are DataFrame ops; no vector on the driver),
    and the only Python stage is the per-cell gram kernel."""
    from unittest import mock

    from pyspark.sql import DataFrame

    def _banned(self, *a, **k):
        raise AssertionError("driver-side collect during query construction")

    with mock.patch.object(DataFrame, "collect", _banned), mock.patch.object(
        DataFrame, "toPandas", _banned
    ), mock.patch.object(DataFrame, "head", _banned), mock.patch.object(
        DataFrame, "take", _banned
    ):
        df = REGISTRY["dd11_semantic_dedup"].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # exactly one physical node (formatted output lists it twice: once
    # in the tree, once in the details section) — the gram kernel only
    assert 1 <= plan.count("FlatMapGroupsInPandas") <= 2
    assert "embeddings.parquet" in plan
    assert "CartesianProduct" not in plan


def test_containment_is_equi_join(spark, sf_dir):
    # dd12 must stay an inverted-index equi-join on the shingle — the
    # all-pairs cross product must never materialize
    plan = _plan(spark, sf_dir, "dd12_ngram_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_profiling_ops_shapes(spark, sf_dir):
    # x30: one keyed agg — a single hash exchange, combinable map-side
    plan = _plan(spark, sf_dir, "x30_histogram")
    assert plan.count("hashpartitioning") == 1
    assert "rangepartitioning" not in plan
    # x31: single melt + two-phase distinct agg, fully JVM-side
    plan = _plan(spark, sf_dir, "x31_column_profile")
    for marker in ("FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan
    assert "Expand" not in plan  # melt is stack (Generate), not the
    # multi-countDistinct Expand that would x5 the scan rows per distinct agg


def test_aqe_splits_skewed_join_at_runtime(spark, tmp_path):
    """The engine's stated skew story has two layers: explicit salting
    (x24) for aggregations AQE can't fix, and AQE skew-join for plain
    joins. Pin the second layer actually engaging: a join where one key
    holds ~all rows must show skew-handled shuffle reads in the final
    adaptive plan."""
    from pyspark.sql import functions as F

    # force tiny thresholds so the 200k-row fixture trips the skew logic
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # keep it a SMJ
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("x").alias("r")
        )
        # count() drives THIS Dataset's QueryExecution to completion so
        # its executedPlan is the final adaptive plan (a noop write
        # would execute a separate QueryExecution and leave this one
        # unfinalized)
        # bare join output: a downstream groupBy would re-require hash
        # distribution on k and legally veto the skew split
        joined = left.join(right, "k")
        joined.collect()  # collect() runs THIS Dataset's QueryExecution
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # the two AQE skew markers: the join tagged skew=true and the
        # shuffle read split into skewed sub-partitions
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_confusion_matrix_window_over_matrix_only(spark, sf_dir):
    # tx16's fraction window partitions by labeled_lang over the
    # (lang x lang) aggregate — never an unpartitioned window, never a
    # data-sized range sort
    plan = _plan(spark, sf_dir, "tx16_langid_confusion")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_leakage_split_reads_corpus_once_per_side(spark, sf_dir):
    # x39 = CC over the candidate graph + one left join + projection;
    # the split assignment itself must add no extra wide exchange over
    # the label join and no single-partition stage
    plan = _plan(spark, sf_dir, "x39_leakage_safe_split")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_round7_queries_no_single_partition(spark, sf_dir):
    """Round-7 additions: every global ordering rides the sequence
    engine (tx17 terciles, x40 shard ranks, x42 curriculum positions),
    x41's median window runs over the merged histogram (distinct
    (lang, nt) rows), tx18's majority window over <=3 rows per doc, and
    ann10's two cuts compile to TakeOrderedAndProject — so none of them
    may plan a single-partition exchange or a global range sort."""
    for name in (
        "tx17_perplexity_buckets",
        "tx18_lang_consistency",
        "x40_shard_assignment",
        "x41_datacard_incremental",
        "x42_curriculum_order",
        "ann10_ivfpq_topk",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "Exchange SinglePartition" not in plan, name
        assert "rangepartitioning" not in plan, name
    # the sequence-engine consumers still window on the bucket key
    for name in ("x40_shard_assignment", "x42_curriculum_order"):
        plan = _plan(spark, sf_dir, name)
        assert "hashpartitioning(__bkt" in plan, name


def test_round8_queries_no_single_partition(spark, sf_dir):
    """Round-8 additions: ann11 serves from the persisted index (probe
    + semi-join + two TakeOrderedAndProject cuts), ann12 is one
    broadcast-assign pass over the delta, tx19's scoring joins are
    vocabulary-keyed, and x43's three rankings all ride the sequence
    engine — none may plan a single-partition exchange or a global
    range sort."""
    for name in (
        "ann11_ivfpq_from_index",
        "ann12_incremental_assign",
        "ann13_index_drift",
        "ann14_batch_ivf_serve",
        "tx19_incremental_lm_score",
        "tx20_incremental_tfidf",
        "x43_sharded_curriculum",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "Exchange SinglePartition" not in plan, name
        assert "rangepartitioning" not in plan, name
    # x43's final ranking windows on the sequence engine's bucket key,
    # and the 8-row shard-base lookup must broadcast, never shuffle-join
    plan = _plan(spark, sf_dir, "x43_sharded_curriculum")
    assert "hashpartitioning(__bkt" in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_round8b_single_partition_only_on_metadata_frames(spark, sf_dir):
    """ann15 and x44 each carry exactly ONE single-partition exchange,
    and it sits over a metadata-sized frame by construction: ann15's
    1-row query-norm aggregate inside the exact rerank (the same shape
    ann1/ann2 have always had), x44's 5-row language-weight total that
    is broadcast back. The corpus-sized stages — ann15's member
    semi-join and rerank, x44's rank window — stay keyed, and no global
    range sort or shuffle join appears."""
    for name in ("ann15_filtered_topk", "x44_temperature_mix"):
        plan = _plan(spark, sf_dir, name)
        assert plan.count("Exchange SinglePartition") <= 1, name
        assert "rangepartitioning" not in plan, name
        assert "SortMergeJoin" not in plan, name
    # ann16 (warm-start refresh) is pure keyed Lloyd algebra — no
    # single-partition stage at all, argmin windows keyed on vec_id
    plan = _plan(spark, sf_dir, "ann16_centroid_refresh")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    # x44's corpus-sized window partitions on lang
    plan = _plan(spark, sf_dir, "x44_temperature_mix")
    assert "hashpartitioning(lang" in plan
    # x45 (the scale form) must plan NO window and no shuffle join —
    # the corpus side is scan -> broadcast-join -> filter -> project
    plan = _plan(spark, sf_dir, "x45_temperature_mix_threshold")
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # ann17 (filtered recall contract) runs BOTH the approximate and
    # exact sides in one plan, yet every join broadcasts (centroids,
    # allowed-id set, query vector are all tiny), both top-10 cuts
    # compile to TakeOrderedAndProject, and the only global stage is
    # the final <=10-row intersect/count — no range sort anywhere.
    plan = _plan(spark, sf_dir, "ann17_filtered_recall")
    assert plan.count("Exchange SinglePartition") <= 1
    assert "rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_round9_queries_no_single_partition(spark, sf_dir):
    """Round-9 additions: none may plan a single-partition exchange, a
    global range sort, a shuffle join, or a cartesian product — every
    shuffle stays keyed on a data key (doc_id / cell / lang / bucket /
    o_orderpriority, verified by inspection) and every join side that
    is dimension- or index-sized broadcasts."""
    for name in (
        "i7_pointintime_join",
        "x46_retractable_mv",
        "x47_epoch_mixture",
        "tx21_dsir_importance",
        "tx22_winnow_fingerprint",
        "mm4_block_dedup",
        "ann18_index_delete",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "Exchange SinglePartition" not in plan, name
        assert "rangepartitioning" not in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    # i7 (point-in-time SCD2 join): the dimension-history side
    # broadcasts onto the fact stream — zero shuffles of the fact side
    plan = _plan(spark, sf_dir, "i7_pointintime_join")
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" not in plan
    # mm4 (payload block dedup): ONE scan of documents, no join at all
    # — both reports fold out of the single (source, hash) aggregation
    plan = _plan(spark, sf_dir, "mm4_block_dedup")
    assert "Join" not in plan
    assert plan.count("Scan parquet") <= 2  # one node + its detail block
    # ann18 (tombstoned index serve): both top-k cuts compile to
    # per-partition heaps, and all index-side joins broadcast
    plan = _plan(spark, sf_dir, "ann18_index_delete")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # tx22 (winnowing): every window runs keyed on doc_id — the
    # (doc, window) rank never degenerates to a global sort
    plan = _plan(spark, sf_dir, "tx22_winnow_fingerprint")
    assert "hashpartitioning(doc_id" in plan


def test_round9b_queries_no_single_partition(spark, sf_dir):
    """Round-9 second wave: hh1's only corpus-sized stage is the token
    count (the sketch fold is vocabulary-sized and the 4096-cell sketch
    broadcasts to the estimate join); x48's keep decision is a map-side
    expression (the Lloyd assignment is the only vector-sized shuffle);
    x49 is metadata-sized after the chunk agg with the window keyed on
    source; ann19's shortlist and rerank cuts both compile to
    per-partition heaps. None may plan a single-partition exchange, a
    global range sort, a shuffle join, or a cartesian product."""
    for name in (
        "hh1_countmin_topk",
        "hh2_countmin_fold",
        "hh3_linear_counting",
        "hh4_hll_cardinality",
        "x48_density_downsample",
        "x49_compaction_bins",
        "x50_priority_sample",
        "ann19_sq8_topk",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "Exchange SinglePartition" not in plan, name
        assert "rangepartitioning" not in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    # the top-k cuts are heaps, not sorts
    for name in ("hh1_countmin_topk", "ann19_sq8_topk"):
        assert "TakeOrderedAndProject" in _plan(spark, sf_dir, name), name
    # x49's window stays keyed on the inventory partition column
    assert "hashpartitioning(source" in _plan(spark, sf_dir, "x49_compaction_bins")
    # x50 (priority sample) is the zero-shuffle ideal: a map-side
    # priority projection and one heap cut — no exchange of any kind
    plan = _plan(spark, sf_dir, "x50_priority_sample")
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """At 100 TB the build side of a selective join is often too big to
    broadcast but its KEY SET still fits a bloom filter — Spark's
    runtime bloom injection (spark.sql.optimizer.runtime.bloomFilter.*)
    then prunes the probe side BEFORE the shuffle, the semi-join
    pushdown that saves the dominant shuffle cost. This pins the knob's
    behavior: with broadcast disabled (forcing the shuffle-join regime
    those thresholds exist for) and the application-side size gate
    lowered to test scale, Catalyst injects bloom_filter/might_contain
    around the probe scan, and the result is identical to the
    un-bloomed join (the filter is conservative — no false negatives)."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}

    def q():
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )

    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        df = q()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "might_contain" in buf.getvalue().lower()
        bloomed = {(r["o_orderpriority"], r["n"]) for r in df.collect()}
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        plain = {(r["o_orderpriority"], r["n"]) for r in q().collect()}
        assert bloomed == plain
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivf_sq8_composition_plan(spark, sf_dir):
    """ann20 composes cell pruning with quantization: both cuts are
    heaps, every index-side join broadcasts, and no single-partition
    exchange, range sort, or cartesian stage appears (the 1-row
    query-cell/qnorm broadcasts plan as BroadcastNestedLoopJoin,
    which is the correct 1-row shape, not a data-sized cartesian)."""
    plan = _plan(spark, sf_dir, "ann20_ivf_sq8_topk")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_graph_pagerank_stays_keyed(spark, sf_dir):
    """x51's power iterations are keyed shuffle joins by DESIGN — at
    graph scale both sides (edges 3N, ranks N) outgrow any broadcast,
    so sort-merge/shuffle-hash on the key IS the correct 100 TB shape
    (what Pregel compiles to). What must never appear: a
    single-partition exchange, a global range sort (the final cut is a
    heap), or a cartesian stage."""
    plan = _plan(spark, sf_dir, "x51_graph_pagerank")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_nb_classifier_model_stays_vocabulary_sized(spark, sf_dir):
    """tx23's model tables (per-token class counts, class totals,
    prior) must join back as broadcast/hash dims — never a
    single-partition exchange or a cartesian stage (the scalar
    broadcasts plan as BroadcastNestedLoopJoin over 1-row frames,
    the correct shape). The only corpus-sized stages are the token
    explode, the (doc, tok) count, and the doc-keyed score sum."""
    plan = _plan(spark, sf_dir, "tx23_nb_quality_score")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_source_overlap_keyed_self_join(spark, sf_dir):
    """x52's shingle-keyed self-join is the correct corpus-scale shape
    (both sides data-sized by design, like x51's edges) — what must
    never appear is a cartesian stage, a single-partition exchange, or
    a global range sort; the size tables close Jaccard as broadcasts."""
    plan = _plan(spark, sf_dir, "x52_source_overlap")
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_rag_chunks_zero_shuffle(spark, sf_dir):
    """x53 is the zero-shuffle ideal: chunk count, window explode, and
    every output column are map-side expressions — no exchange of any
    kind may appear."""
    plan = _plan(spark, sf_dir, "x53_rag_chunks")
    assert "Exchange" not in plan


def test_logbin_quantile_histogram_is_the_only_data_stage(spark, sf_dir):
    """hh5's corpus-sized work is ONE keyed agg (the histogram build,
    map-side combinable) plus the exact-percentile contract side; the
    cumulative window runs over histogram rows keyed on the group —
    never a single-partition exchange, global range sort, or cartesian
    stage (the 3-row quantile frame broadcasts)."""
    plan = _plan(spark, sf_dir, "hh5_logbin_quantiles")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_source_drift_single_corpus_shuffle(spark, sf_dir):
    """x54's only corpus-sized exchange is the (source, tok) count;
    the JS term sum and every join after run on vocabulary- or
    source-sized frames keyed on source — no single-partition
    exchange, range sort, or cartesian stage."""
    plan = _plan(spark, sf_dir, "x54_source_drift")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_unimax_single_corpus_stage(spark, sf_dir):
    """x55's only corpus-sized stage is the per-source token count
    (keyed agg, map-side combinable); the water-level algebra runs on
    the source catalog, where the global-order window's single
    partition is the honest shape (a few hundred rows at any corpus
    scale — x49's planner precedent). No cartesian stage; the 1-row
    level broadcast is a BroadcastNestedLoopJoin by design."""
    plan = _plan(spark, sf_dir, "x55_unimax_alloc")
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(source" in plan


def test_schema_evolution_union_is_exchange_free(spark, sf_dir):
    """i8's evolved union concatenates two pushed scans partition-wise:
    zero exchanges of any kind, and both version filters reach their
    scans as pushed predicates."""
    plan = _plan(spark, sf_dir, "i8_schema_evolution")
    assert "Exchange" not in plan
    assert "PushedFilters" in plan


def test_novelty_df_join_no_pair_explosion(spark, sf_dir):
    """tx24 consumes the df table as a COUNT, not a pair enumeration:
    the only exchanges are the shingle-keyed df agg/join and the final
    doc-keyed agg — no cartesian stage, no single-partition exchange,
    no global range sort at any corpus scale."""
    plan = _plan(spark, sf_dir, "tx24_novelty_score")
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_probe_recall_curve_shares_assignment(spark, sf_dir):
    """ann21's three curve points ride broadcast-centroid passes and
    heap cuts — never a cartesian stage, single-partition data
    exchange, or global range sort (the per-point 1-row count frames
    cross-join as BroadcastNestedLoopJoin, the correct 1-row shape)."""
    plan = _plan(spark, sf_dir, "ann21_probe_recall_curve")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "TakeOrderedAndProject" in plan


def test_sketch_fence_flag_pass_broadcasts(spark, sf_dir):
    """x56's flag pass joins two catalog-sized fence tables back to
    the rows as broadcasts — never a sort, cartesian stage, or
    data-sized single-partition exchange."""
    plan = _plan(spark, sf_dir, "x56_sketch_fence_outliers")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_per_source_reservoir_group_limit_pushdown(spark, sf_dir):
    """x57's k-per-source cut must push the group limit below the
    exchange (WindowGroupLimit) so only ~k rows per source per input
    partition shuffle — and never plan a global sort or single
    partition."""
    plan = _plan(spark, sf_dir, "x57_per_source_reservoir")
    assert "WindowGroupLimit" in plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_bootstrap_se_replicates_stay_keyed(spark, sf_dir):
    """x58's B-way explode is a constant map-side fan-out feeding a
    (source, b)-keyed agg — never a cartesian stage, data-sized single
    partition, or range sort."""
    plan = _plan(spark, sf_dir, "x58_bootstrap_se")
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_zipf_heaps_fits_are_metadata_sized(spark, sf_dir):
    """tx25's regressions run on a 50-row heap cut and the source
    catalog; the corpus pays one token explode into two keyed aggs —
    no cartesian stage, and the top-k cut is a heap, not a global
    sort."""
    plan = _plan(spark, sf_dir, "tx25_zipf_heaps")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "TakeOrderedAndProject" in plan


def test_binary_hamming_serve_heap_cuts(spark, sf_dir):
    """ann22's Hamming shortlist and final cosine cut both compile to
    per-partition heaps; the coefficient join broadcasts; no cartesian
    stage or global range sort."""
    plan = _plan(spark, sf_dir, "ann22_binary_hamming_topk")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_funnel_single_user_exchange(spark, sf_dir):
    """x59's three conditional-min windows and the user collapse all
    share one user_id partitioning — exactly ONE data-sized hash
    exchange in the whole funnel; the 3-row step table broadcasts; no
    single-partition exchange, range sort, or cartesian stage."""
    plan = _plan(spark, sf_dir, "x59_funnel_steps")
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_attribution_join_stays_keyed(spark, sf_dir):
    """x60's touch-to-conversion interval join is a user-keyed
    equi-join with the lookback as a residual predicate — never a
    cartesian or broadcast-nested-loop stage; the attribution window
    keys on conv_id; the scalar total broadcasts."""
    plan = _plan(spark, sf_dir, "x60_last_touch_attribution")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(conv_id" in plan


def test_retention_frames_shrink_after_scan(spark, sf_dir):
    """x61: every frame after the raw scan is user-sized or smaller
    and keyed — no cartesian stage, no data-sized single-partition
    exchange, no range sort; cohort sizes broadcast."""
    plan = _plan(spark, sf_dir, "x61_retention_cohorts")
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_markov_single_data_stage(spark, sf_dir):
    """x62's only data-sized stage is the user-keyed lead window; the
    transition agg group space is |types|^2 and the normalize join
    broadcasts — no cartesian, single-partition, or range sort."""
    plan = _plan(spark, sf_dir, "x62_markov_transitions")
    assert plan.count("hashpartitioning(user_id") == 1
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_minhash_estimator_error_pair_keyed(spark, sf_dir):
    """dd17's error join is pair-/doc-keyed end-to-end: no cartesian
    stage and no global range sort; the report is one row."""
    plan = _plan(spark, sf_dir, "dd17_minhash_estimator_error")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_readability_zero_shuffle(spark, sf_dir):
    """tx26 is the zero-shuffle ideal: every column (sentence count,
    per-word syllable fold, the exact-integer score) is a map-side
    expression — no exchange of any kind."""
    plan = _plan(spark, sf_dir, "tx26_readability")
    assert "Exchange" not in plan


def test_fk_audit_anti_joins(spark, sf_dir):
    """i10's checks are anti-joins: dimension parents broadcast, no
    cartesian stage, no global range sort."""
    plan = _plan(spark, sf_dir, "i10_fk_integrity_audit")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_exact_span_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """dd18: the benchmark 8-gram set broadcasts onto the corpus gram
    stream (the corpus never shuffles on gram content, dd8's rule);
    after the match every exchange is keyed on doc_id — no cartesian,
    no single-partition stage, no global range sort."""
    plan = _plan(spark, sf_dir, "dd18_exact_span_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(doc_id" in plan


def test_gap_fill_single_user_sort(spark, sf_dir):
    """x63: all four IGNORE-NULLS neighbor windows share one user-keyed
    exchange + sort; no joins, no cartesian, no global range sort, no
    single-partition stage."""
    plan = _plan(spark, sf_dir, "x63_gap_fill_interpolate")
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Join" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_cusum_windows_stay_keyed(spark, sf_dir):
    """x64: the only data-sized stage is the (type, day) count agg;
    the stats and both ordered windows run keyed on event_type over
    the daily matrix — never a global sort or single-partition
    exchange."""
    plan = _plan(spark, sf_dir, "x64_cusum_changepoint")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(event_type" in plan


def test_conversion_lag_user_keyed(spark, sf_dir):
    """x66: both min-aggs and both joins share the user_id key; the ts
    qualifier is a join residual, never an interval join — no
    cartesian, no range sort, no single-partition exchange."""
    plan = _plan(spark, sf_dir, "x66_conversion_lag")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_snapshot_cdc_single_keyed_join(spark, sf_dir):
    """i11: one scan feeds both snapshot projections; the diff is a
    PK-keyed full-outer join with the unchanged-row filter as a join
    residual — no cartesian, no range sort, no single-partition
    exchange."""
    plan = _plan(spark, sf_dir, "i11_snapshot_cdc_extract")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "FullOuter" in plan


def test_triangle_census_edge_keyed(spark, sf_dir):
    """x67: the bipartite projection is part-keyed, the triangle legs
    are endpoint-keyed hash joins over the checkpointed edge list —
    no cartesian stage, no global range sort; the only
    single-partition stages are the three one-row report aggregates."""
    plan = _plan(spark, sf_dir, "x67_copurchase_triangles")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    # three scalar aggs + their one-row crossJoin assembly may each
    # plan a single-partition exchange; nothing data-sized may
    assert plan.count("Exchange SinglePartition") <= 4


def test_kmv_sketch_stays_k_sized(spark, sf_dir):
    """hh6: after the (type, user) distinct, every frame is sketch-
    (<=64 rows) or pair-table-sized; windows are keyed on type / pair
    — no cartesian (the |types|^2 pair build is a keyed theta-join on
    t< t), no global range sort, no single-partition exchange."""
    plan = _plan(spark, sf_dir, "hh6_kmv_overlap")
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_item_similarity_windowgrouplimit(spark, sf_dir):
    """x68: the top-5 cut compiles to WindowGroupLimit (per-partition
    5-element heaps, never a full sort of the similarity list); the
    co-occurrence build is buyer-keyed — no cartesian, no global range
    sort, no single-partition exchange."""
    plan = _plan(spark, sf_dir, "x68_item_similarity_topk")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_bm25_broadcast_stats_and_grouplimit(spark, sf_dir):
    """x69: df and corpus stats broadcast onto the term-filtered token
    stream (the corpus never shuffles on token content); the top-10
    cut compiles to TakeOrderedAndProject (LimitPushDownThroughWindow
    turns the empty-partition row_number filter into per-partition
    heaps) — no global range sort."""
    plan = _plan(spark, sf_dir, "x69_bm25_topk")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_hybrid_rrf_leg_cuts(spark, sf_dir):
    """ann23: all three cuts (two 1000-candidate legs + the final
    top-10) compile to TakeOrderedAndProject, the query vector
    broadcasts onto the vector scan, and the fusion join is id-keyed
    — no global range sort."""
    plan = _plan(spark, sf_dir, "ann23_hybrid_rrf")
    assert plan.count("TakeOrderedAndProject") >= 3
    assert "rangepartitioning" not in plan


def test_quantile_normalize_grid_broadcasts(spark, sf_dir):
    """x70: the global distribution is a 257-point grid (single-row
    percentile agg -> explode -> broadcast), NOT a global sort of the
    corpus; the within-source rank is the only data-sized window."""
    plan = _plan(spark, sf_dir, "x70_quantile_normalize")
    assert "BroadcastHashJoin" in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(source" in plan


def test_ab_ztest_user_keyed(spark, sf_dir):
    """x71: assignment is a map-side hash expression; the only
    data-sized stages are user-keyed aggs/joins; the z arithmetic is
    a 1-row projection."""
    plan = _plan(spark, sf_dir, "x71_ab_test_ztest")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_perceptual_neardup_band_bucketed(spark, sf_dir):
    """mm5: candidates come from the (band, value) bucket join —
    never an all-pairs stage; the signature build is one map-side
    projection; the Hamming verify joins are doc-keyed."""
    plan = _plan(spark, sf_dir, "mm5_perceptual_neardup")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_pmi_doc_keyed_pair_build(spark, sf_dir):
    """tx27: the pair build is a doc-keyed self-join; df/stats
    broadcast; top-20 compiles to TakeOrderedAndProject — no
    cartesian, no global range sort."""
    plan = _plan(spark, sf_dir, "tx27_pmi_collocations")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_behavior_entropy_user_keyed(spark, sf_dir):
    """x72: one user-keyed lead window, then user-bounded aggregates
    — no joins across users, no cartesian, no range sort, no
    single-partition exchange."""
    plan = _plan(spark, sf_dir, "x72_behavior_entropy")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan


def test_cdc_compaction_single_window_stage(spark, sf_dir):
    """i12: the whole compactor is one user-keyed window stage — no
    joins, no second data shuffle, no cartesian/range sort."""
    plan = _plan(spark, sf_dir, "i12_cdc_compaction")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_fifo_match_ordinal_hash_join(spark, sf_dir):
    """x73: the rank windows turn arrival order into a join KEY, so
    the ordinal match is a hash join on (user, position) — no
    cartesian, no range sort, no single-partition exchange."""
    plan = _plan(spark, sf_dir, "x73_fifo_match")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_mips_single_scan_economics(spark, sf_dir):
    """ann24: one corpus scan per ranking leg, max-norm/query frames
    broadcast, the dot cut via TakeOrderedAndProject and aug_rnk as a
    count-of-greater broadcast join against that bounded cut (r10
    verdict: NOT a corpus-wide window) — no range sort, no cartesian,
    no single-partition exchange anywhere."""
    plan = _plan(spark, sf_dir, "ann24_mips_topk")
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "TakeOrderedAndProject" in plan


def test_cohort_ltv_matrix_sized_window(spark, sf_dir):
    """x74: the cumulative window runs over the cohort matrix, keyed
    on cohort_week; cohort sizes broadcast; no cartesian, no range
    sort, no single-partition exchange."""
    plan = _plan(spark, sf_dir, "x74_cohort_ltv")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_rolling_active_users_no_windows(spark, sf_dir):
    """x75: the rolling distinct is explode + agg — no window
    functions, no cartesian, no range sort, no single-partition
    exchange; every exchange is keyed on day or (user, day)."""
    plan = _plan(spark, sf_dir, "x75_rolling_active_users")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_abc_cumulative_fully_parallel(spark, sf_dir):
    """x76: the cumulative revenue rides the bucketed prefix-sum
    (with_global_prefix_sum) — per-bucket windows keyed on __bkt, NO
    single-partition exchange and no global range sort anywhere, even
    though the running total is over the whole catalog (r9 verdict:
    the part catalog is corpus-proportional, unlike x55's source
    catalog, so the o1/w1 dispensation no longer applies)."""
    plan = _plan(spark, sf_dir, "x76_abc_analysis")
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(__bkt" in plan
    # the part-keyed agg ran once and was localCheckpointed; the plan's
    # data inputs are the checkpoint RDD (catalog-sized), not repeated
    # fact scans — three downstream passes, one fact-scan execution
    assert "lineitem.parquet" not in plan
    assert "localCheckpoint" in plan


def test_seasonal_and_trend_matrix_sized(spark, sf_dir):
    """x77/x78: the only event-sized stage is the (type, day) count;
    everything downstream is profile-/fit-matrix sized and keyed on
    event_type — no cartesian, no range sort, no single-partition
    exchange."""
    for name in ("x77_seasonal_profile", "x78_trend_forecast"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "rangepartitioning" not in plan, name
        assert "Exchange SinglePartition" not in plan, name
        assert "hashpartitioning(event_type" in plan, name
