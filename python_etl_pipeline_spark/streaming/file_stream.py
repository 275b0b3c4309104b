"""Streaming file ingestion — the reference's scheduler + file-tracker
pair as one mechanism (SURVEY.md §2.10).

A file-source streaming query with ``Trigger.AvailableNow`` and a
checkpoint gives exactly-once-per-file ingestion (I1) plus batch-cadence
execution (the scheduler's daily/twice-daily loop, main.py:364-419)
without any bespoke tracker table: the checkpoint's file log IS the
tracker, and one-query-per-sink subsumes the overlap lock
(main.py:341-346).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    out_dir: str,
    checkpoint_dir: str,
    fmt: str = "csv",
    transform=None,
) -> None:
    """Ingest all currently-available files exactly once, then stop.

    Each invocation is one scheduled batch window; files already in the
    checkpoint file-log are skipped (idempotent re-delivery). ``transform``
    is an optional DataFrame -> DataFrame stage applied in-stream (the
    extract DAG: validate -> project -> cleanse -> dedup-per-batch).
    """
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts(stream: DataFrame, watermark: str = "10 minutes",
                          window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregation over an event-time stream —
    late rows beyond the watermark are dropped and state is pruned, so
    state size is bounded by (watermark / window) x key cardinality
    regardless of total stream length."""
    from pyspark.sql import functions as F

    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream join: each left event pairs with right
    events for the same key within the trailing ``within`` interval.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store retains only (watermark + interval) of
    history per side — bounded state on unbounded streams, the condition
    Spark requires to ever drop stream-join state."""
    from pyspark.sql import functions as F

    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.ts BETWEEN l.ts - INTERVAL {within} AND l.ts"
    )
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
        F.col("l.value").alias("left_value"),
        F.col("r.value").alias("right_value"),
    )


def stream_dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming deduplication with bounded state: keep the first row per
    key, where duplicates are only expected within the watermark horizon
    (at-least-once upstream delivery, e.g. a replaying ingest source).

    Plain ``dropDuplicates`` on a stream keeps every key ever seen in the
    state store — unbounded growth. ``dropDuplicatesWithinWatermark``
    expires a key's state once the watermark passes its event time, so
    state is bounded by (watermark window × arrival rate) regardless of
    total stream length.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_document_curation(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    min_quality: float = 0.3,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming corpus curation: the batch `llm_curation_pipeline`'s
    score → filter → exact-dedup stages, restated for an unbounded
    document stream.

    Quality scoring and language-ID are pure projections (stream-safe,
    fused into the source micro-batch scan); exact dedup keys on the
    md5 content hash via ``dropDuplicatesWithinWatermark`` so state stays
    bounded by (watermark horizon × ingest rate) — the continuous-ingest
    form of a training-data intake pipeline, where near-dup passes run
    as periodic batch compaction over the curated sink (dd2/dd6), not
    in-stream.
    """
    from pyspark.sql import functions as F

    from ..llm.text import lang_id, quality_score

    scored = stream.select(
        "*",
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )
    kept = scored.filter(F.col("quality") >= min_quality)
    return kept.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def stream_frame_dedup(
    media_stream: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    stride: int = 64,
    window: int = 16,
) -> DataFrame:
    """Streaming multimodal frame dedup — mm3's continuous-ingest form:
    each arriving media payload fans out to fingerprinted frames INSIDE
    the Arrow batch (``llm.multimodal.sample_frames``, a mapInPandas
    operator — stream-safe, payload bytes never enter the state store),
    then ``dropDuplicatesWithinWatermark`` keeps each frame digest's
    FIRST occurrence with state bounded by (watermark horizon × frame
    rate). The event-time column rides through the sampler via
    ``passthrough`` so the frame stream stays watermarkable.

    Output: one row per first-seen frame (media_id, frame_idx,
    frame_len, frame_digest, ts). Per-media retention (drop media whose
    frames are mostly dups) is a batch decision over this sink —
    exactly how the batch pipeline splits it (mm2 sample → dd1 dedup →
    mm3 retention)."""
    from ..llm.multimodal import sample_frames

    frames = sample_frames(
        media_stream, stride=stride, window=window, passthrough=(ts_col,)
    )
    return frames.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["frame_digest"]
    )


def neardup_batch_writer(
    spark: SparkSession,
    index_dir: str,
    dups_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch sink for incremental near-dup: returns the
    ``(batch_df, batch_id) -> None`` closure that (1) computes the
    batch's MinHash band buckets, (2) joins them against every PRIOR
    batch's persisted signature index to emit ``(new_id, dup_of)``
    candidate pairs, and (3) appends the batch's buckets to the index.

    Exactly-once story: the streaming checkpoint guarantees each file
    enters exactly one micro-batch; foreachBatch may RE-RUN a batch
    after a crash, so both writes are keyed by ``batch_id=N``
    subdirectories written with overwrite — a re-delivered batch
    rewrites its own partition with identical content instead of
    appending twice, and the index join filters to ``batch_id <
    current`` so a re-run never sees its own half-written signatures.
    Factored out of :func:`stream_neardup_available_now` so a batch
    test can drive one step twice and assert idempotence."""
    from pyspark.sql import functions as F

    from ..llm.dedup import minhash_band_buckets, neardup_against_index

    def step(batch_df: DataFrame, batch_id: int) -> None:
        bb_new = minhash_band_buckets(
            batch_df, text_col, id_col
        ).localCheckpoint(eager=True)  # consumed twice: join + append
        import os

        # Hadoop FS listing, not local glob: index_dir is an
        # hdfs://-or-s3a:// URI in production and a local-FS glob would
        # silently see no prior batches there (same scheme-agnostic
        # pattern as Warehouse.exists).
        sc = spark.sparkContext
        jpath = sc._jvm.org.apache.hadoop.fs.Path(index_dir)
        fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
        prior = []
        if fs.exists(jpath):
            for st in fs.listStatus(jpath):
                name = st.getPath().getName()
                if name.startswith("batch_id=") and (
                    int(name.split("=", 1)[1]) < batch_id
                ):
                    prior.append(st.getPath().toString())
        if prior:
            index = spark.read.option("basePath", index_dir).parquet(*prior)
            dups = neardup_against_index(bb_new, index, id_col=id_col)
        else:
            dups = (
                bb_new.select(
                    F.col(id_col).alias("new_id"),
                    F.col(id_col).alias("dup_of"),
                ).limit(0)
            )
        dups.write.mode("overwrite").parquet(
            os.path.join(dups_dir, f"batch_id={batch_id}")
        )
        bb_new.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch_id={batch_id}")
        )

    return step


def stream_neardup_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    index_dir: str,
    dups_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "parquet",
) -> None:
    """Streaming incremental near-dup — x21's operational twin: a
    continuously-ingesting corpus is near-dup-checked per arrival batch
    against the persisted signature index, which grows by exactly the
    batch's signatures. The corpus text is never re-read: the index
    stores 4 (band, bucket-hash) rows per document (~1% of text bytes),
    and each micro-batch pays one (band, bh)-keyed join of batch x
    index — the shape a training-data intake actually runs at 100 TB,
    where a from-scratch dd2 pass per day would re-shingle the world.

    Batch CORRECTNESS twin: queries.x35_stream_neardup folds the same
    :func:`~..llm.dedup.neardup_against_index` step over a batched
    split of the documents table and is driver-verified against a
    DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            neardup_batch_writer(spark, index_dir, dups_dir, text_col, id_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_delta_batch_writer(
    spark: SparkSession,
    index_dir: str,
    events_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch sink for the streaming dedup DELTA —
    queries.dd22's operational twin: per arrival batch, emit the docs
    that BECAME duplicated, i.e. every endpoint of a new LSH collision,
    whether the endpoint is a new arrival or a prior-corpus doc that
    just acquired its first mirror. The closure (1) computes the
    batch's MinHash band buckets, (2) joins them against every PRIOR
    batch's persisted signature index (cross-batch collisions, BOTH
    endpoints emitted) and against themselves (intra-batch collisions),
    (3) writes the distinct collided ids under
    ``events_dir/batch_id=N``, and (4) appends the batch's buckets to
    the index. The event log is append-only; "when did this doc first
    become duplicated" is min(batch_id) per doc at read time
    (:func:`dedup_delta_from_state_dir`), so re-collisions in later
    batches are harmless rather than filtered per batch — that keeps
    every write a pure function of (batch, prior index) and the whole
    log a set-union monoid.

    No bucket cap here, deliberately: a cap makes pair discovery
    depend on arrival ORDER (a bucket crossing the cap drops pairs the
    same docs would have produced arriving earlier), which would break
    the fold == full-recompute contract the test pins. A production
    deployment that needs the degenerate-bucket guard derives the cap
    at index-build time (llm.caps) and accepts the documented recall
    trade — the same note as neardup_against_index.

    Exactly-once story (same as the near-dup sink): both writes are
    ``batch_id=N`` overwrite partitions, and the index join filters to
    ``batch_id < current``, so a crash-re-delivered batch rewrites
    identical content and never sees its own signatures."""
    import os

    from pyspark.sql import functions as F

    from ..llm.dedup import minhash_band_buckets

    def step(batch_df: DataFrame, batch_id: int) -> None:
        # consumed three times: prior-index join, self-join, append
        bb_new = minhash_band_buckets(
            batch_df, text_col, id_col
        ).localCheckpoint(eager=True)
        sc = spark.sparkContext
        jpath = sc._jvm.org.apache.hadoop.fs.Path(index_dir)
        fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
        prior = []
        if fs.exists(jpath):
            for st in fs.listStatus(jpath):
                name = st.getPath().getName()
                if name.startswith("batch_id=") and (
                    int(name.split("=", 1)[1]) < batch_id
                ):
                    prior.append(st.getPath().toString())
        a = bb_new.select(F.col(id_col).alias("a"), "band", "bh")
        b = bb_new.select(F.col(id_col).alias("b"), "band", "bh")
        intra = a.join(b, ["band", "bh"]).filter(F.col("a") < F.col("b"))
        hits = intra.select(F.col("a").alias(id_col)).union(
            intra.select(F.col("b").alias(id_col))
        )
        if prior:
            index = spark.read.option("basePath", index_dir).parquet(*prior)
            cross = a.join(
                index.select(F.col(id_col).alias("b"), "band", "bh"),
                ["band", "bh"],
            )
            hits = hits.union(
                cross.select(F.col("a").alias(id_col))
            ).union(cross.select(F.col("b").alias(id_col)))
        hits.distinct().write.mode("overwrite").parquet(
            os.path.join(events_dir, f"batch_id={batch_id}")
        )
        bb_new.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch_id={batch_id}")
        )

    return step


def dedup_delta_from_state_dir(
    spark: SparkSession, events_dir: str, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, became_dup_in_batch) — each ever-collided doc with the
    batch that first duplicated it, derived from the event log by a
    min(batch_id) fold (set-union monoid, so compaction/redelivery
    never change the answer)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(events_dir)
        .groupBy(id_col)
        .agg(F.min("batch_id").cast("bigint").alias("became_dup_in_batch"))
    )


def canonical_state_batch_writer(
    spark: SparkSession,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 64,
):
    """foreachBatch sink for incremental canonical election —
    queries.dd23's operational twin: maintain, per duplicate cluster,
    the argmax-quality member as arrivals land, WITHOUT revisiting
    prior members. Clusters here are dd20's template families (md5 of
    the first ``prefix_len`` chars — locally computable per batch, no
    global LSH pass in the hot path; the LSH-clustered batch form is
    dd23 itself, driver-verified against its oracle).

    The state log stores each batch's per-cluster best as a row
    (cluster_key, nq, doc_id, quality) — the argmax under
    (quality DESC, id ASC) is min of struct(-quality, id), a
    commutative idempotent monoid, so deriving the current canonicals
    just unions all batch partitions and re-aggregates
    (:func:`canonical_from_state_dir`), and compaction may fold the
    log at any time without changing any answer. Exactly-once story
    (same as every state sink here): batch_id=N overwrite partitions,
    and each partition is a pure function of its batch alone — a
    re-delivered batch rewrites identical content."""
    import os

    from pyspark.sql import functions as F

    from ..llm import quality_score

    def step(batch_df: DataFrame, batch_id: int) -> None:
        cand = F.struct(
            (-quality_score(F.col(text_col))).alias("nq"),
            F.col(id_col).alias("doc_id"),
            quality_score(F.col(text_col)).alias("quality"),
        )
        best = (
            batch_df.select(
                F.md5(
                    F.substring(F.col(text_col), 1, prefix_len)
                ).alias("cluster_key"),
                cand.alias("c"),
            )
            .groupBy("cluster_key")
            .agg(F.min("c").alias("c"))
            .select(
                "cluster_key", "c.nq", "c.doc_id", "c.quality"
            )
        )
        best.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return step


def canonical_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """(cluster_key, canonical_doc_id, canonical_quality) — the
    current canonicals: one min-of-struct re-aggregate over the state
    log (the groupBy IS the monoid merge)."""
    from pyspark.sql import functions as F

    s = spark.read.parquet(state_dir)
    return (
        s.select(
            "cluster_key",
            F.struct("nq", "doc_id", "quality").alias("c"),
        )
        .groupBy("cluster_key")
        .agg(F.min("c").alias("c"))
        .select(
            "cluster_key",
            F.col("c.doc_id").alias("canonical_doc_id"),
            F.col("c.quality").alias("canonical_quality"),
        )
    )


def compact_canonical_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance: fold every batch partition into one (batch_id=-1)
    — the merged per-cluster best is itself a valid partial (the
    monoid is idempotent), same stop-the-world contract and crash-safe
    swap as the other state compactors."""
    from pyspark.sql import functions as F

    staging = state_dir.rstrip("/") + ".compact"
    merged = (
        spark.read.parquet(state_dir)
        .select(
            "cluster_key", F.struct("nq", "doc_id", "quality").alias("c")
        )
        .groupBy("cluster_key")
        .agg(F.min("c").alias("c"))
        .select("cluster_key", "c.nq", "c.doc_id", "c.quality")
        .localCheckpoint(eager=True)
    )
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def stream_canonical_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "parquet",
    prefix_len: int = 64,
) -> None:
    """Streaming canonical election — dd23's operational twin on the
    AvailableNow cadence: per-cluster argmax-quality maintained as a
    batch-partitioned monoid state log. Batch CORRECTNESS twin:
    queries.dd23_canonical_reelection is driver-verified against its
    DuckDB oracle; fold == full-recompute over the stream is pinned in
    tests/test_streaming_dedup_delta.py."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            canonical_state_batch_writer(
                spark, state_dir, text_col, id_col, prefix_len
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_delta_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    index_dir: str,
    events_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "parquet",
) -> None:
    """Streaming dedup delta — dd22's operational twin on the same
    AvailableNow cadence as the other index sinks: the per-arrival
    incremental step dd22's docstring describes (shingle only the
    delta, join the stored band-bucket index, emit newly-duplicated
    docs) executed against a continuously-ingesting corpus. Batch
    CORRECTNESS twin: queries.dd22_dedup_delta is driver-verified
    against its DuckDB oracle; the fold == full-recompute contract
    (stream's collided-doc set == a from-scratch uncapped LSH pass) is
    pinned in tests/test_round12_ops.py."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            dedup_delta_batch_writer(
                spark, index_dir, events_dir, text_col, id_col
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def datacard_batch_writer(spark: SparkSession, state_dir: str):
    """foreachBatch sink for incremental datacard maintenance: returns
    the ``(batch_df, batch_id) -> None`` closure that computes the
    batch's three datacard partial states (:mod:`..llm.datacard`) and
    writes each under ``state_dir/{lang,hist,dup}/batch_id=N``.

    The persisted state is a LOG of per-batch partials: because every
    state is a commutative monoid, deriving the card just unions all
    batch partitions and re-aggregates (the groupBy IS the merge —
    :func:`datacard_from_state_dir`), and a maintenance job may compact
    old batch partitions into one at any time without changing any
    derived number. Exactly-once story (same as the near-dup sink): the
    streaming checkpoint guarantees each file enters exactly one
    micro-batch, and a crash-re-delivered batch OVERWRITES its own
    ``batch_id=N`` partitions with identical content instead of
    double-counting."""
    import os

    from ..llm.datacard import datacard_base, dup_state, hist_state, lang_state

    def step(batch_df: DataFrame, batch_id: int) -> None:
        base = datacard_base(batch_df).localCheckpoint(eager=True)
        for name, state in (
            ("lang", lang_state(base)),
            ("hist", hist_state(base)),
            ("dup", dup_state(base)),
        ):
            state.write.mode("overwrite").parquet(
                os.path.join(state_dir, name, f"batch_id={batch_id}")
            )

    return step


def datacard_from_state_dir(spark: SparkSession, state_dir: str) -> DataFrame:
    """Derive the x37-shaped datacard from the persisted state log —
    reads only aggregate-sized state, never the corpus text."""
    from ..llm.datacard import datacard_from_states

    return datacard_from_states(
        spark.read.parquet(f"{state_dir}/lang"),
        spark.read.parquet(f"{state_dir}/hist"),
        spark.read.parquet(f"{state_dir}/dup"),
    )


def lm_state_batch_writer(
    spark: SparkSession,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch sink for incremental bigram-LM maintenance
    (:mod:`..llm.lm` — tx19's operational twin): each arrival batch's
    bigram-count partial lands under ``state_dir/batch_id=N``. The
    state log is a sum-monoid: deriving the LM unions all partitions
    and re-aggregates (the groupBy IS the merge), so perplexity-scoring
    a growing corpus never rescans history. Exactly-once story matches
    the near-dup/datacard sinks: a crash-re-delivered batch OVERWRITES
    its own batch_id partition with identical content."""
    import os

    from ..llm.lm import bigram_instances, lm_count_state

    def step(batch_df: DataFrame, batch_id: int) -> None:
        state = lm_count_state(bigram_instances(batch_df, id_col, text_col))
        state.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return step


def lm_counts_from_state_dir(spark: SparkSession, state_dir: str) -> DataFrame:
    """(bg, c12) — the folded LM counts from the persisted state log;
    reads only vocabulary-sized state, never the corpus text."""
    from ..llm.lm import merge_lm_states

    state = spark.read.parquet(state_dir).drop("batch_id")
    return merge_lm_states(state, state.limit(0))


def compact_lm_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance job: fold every batch partition of the LM count
    state into one (``batch_id=-1``) — same stop-the-world contract
    and crash-safe swap as :func:`compact_datacard_state`."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = lm_counts_from_state_dir(spark, state_dir).localCheckpoint(
        eager=True
    )
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def stream_lm_state_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental bigram-LM: fold each arrival batch's
    bigram counts into the persisted state (tx19's operational twin,
    same AvailableNow cadence as the datacard sink). Batch CORRECTNESS
    twin: queries.tx19_incremental_lm_score folds the same llm.lm
    algebra over a batched split and is driver-verified against a
    from-scratch DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(lm_state_batch_writer(spark, state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def tfidf_state_batch_writer(
    spark: SparkSession,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch sink for incremental TF-IDF vocabulary maintenance
    (tx20's operational twin): each arrival batch writes its (term, df)
    document-frequency partial under ``state_dir/df/batch_id=N`` and
    its 1-row doc count under ``state_dir/n/batch_id=N`` — both
    sum-monoids, so the IDF table for the corpus-so-far is one groupBy
    over the df log and one sum over the count log (the tf side is
    batch-local by definition and needs no state). Exactly-once story
    matches the other sinks: re-delivered batches overwrite their own
    batch_id partitions."""
    import os

    from pyspark.sql import functions as F

    from ..llm.dedup import _spread
    from ..llm.text import tokens

    def step(batch_df: DataFrame, batch_id: int) -> None:
        tok = _spread(
            batch_df.select(F.col(id_col).alias("doc_id"), text_col)
        ).select("doc_id", F.explode(tokens(text_col)).alias("term"))
        dfq = (
            tok.groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
            .groupBy("term")
            .agg(F.count("*").cast("bigint").alias("df"))
        )
        dfq.write.mode("overwrite").parquet(
            os.path.join(state_dir, "df", f"batch_id={batch_id}")
        )
        batch_df.groupBy().agg(
            F.count("*").cast("bigint").alias("n_docs")
        ).write.mode("overwrite").parquet(
            os.path.join(state_dir, "n", f"batch_id={batch_id}")
        )

    return step


def tfidf_state_from_dir(spark: SparkSession, state_dir: str):
    """(df_counts, n_docs): the folded IDF inputs from the persisted
    state log — vocabulary-sized reads only."""
    from pyspark.sql import functions as F

    from ..plans import merge_agg_state

    df_state = spark.read.parquet(f"{state_dir}/df").drop("batch_id")
    dfq = merge_agg_state(df_state, df_state.limit(0), ["term"], count_col="df")
    n = (
        spark.read.parquet(f"{state_dir}/n")
        .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
    )
    return dfq, n


def stream_tfidf_state_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental TF-IDF vocabulary state — tx20's
    operational twin, same AvailableNow cadence as the LM/datacard
    sinks. Batch CORRECTNESS twin: queries.tx20_incremental_tfidf is
    driver-verified against tx9's from-scratch oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(tfidf_state_batch_writer(spark, state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ivf_assign_batch_writer(
    spark: SparkSession,
    centroids_dir: str,
    assign_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """foreachBatch sink for incremental ANN index maintenance (ann12's
    operational twin): each arrival batch of vectors is assigned to the
    FROZEN stored centroids (one broadcast pass,
    llm.similarity.ivf_incremental_assign) and appended to the stored
    assignment log under ``assign_dir/batch_id=N`` — work scales with
    the batch, the index grows without re-clustering, and
    ivf_query_from_index / ivf_batch_query_from_index serve from the
    grown assignment directly (equality with a full re-assign is pinned
    batch-side by ann12's oracle and
    test_query_from_incrementally_grown_index_matches_rebuild).
    Re-delivered batches overwrite their own batch_id partition. Run
    llm.similarity.ivf_cell_drift on before/after snapshots between
    streaming runs to decide when re-training is warranted."""
    import os

    from ..llm.similarity import ivf_incremental_assign

    def step(batch_df: DataFrame, batch_id: int) -> None:
        cent = spark.read.parquet(centroids_dir)
        ivf_incremental_assign(batch_df, cent, id_col, vec_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(assign_dir, f"batch_id={batch_id}"))

    return step


def stream_ivf_assign_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    centroids_dir: str,
    assign_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental IVF assignment — the ANN index's
    continuous-ingest form (x21/x41/tx19's sink pattern applied to
    vectors): every arriving vector batch folds into the persisted
    assignment against frozen centroids."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            ivf_assign_batch_writer(spark, centroids_dir, assign_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _swap_compacted(spark: SparkSession, root: str, staging: str) -> None:
    """Replace ``root`` with ``staging`` via two atomic directory
    renames (root -> .trash, staging -> root). The pair is not jointly
    atomic: a crash (or failed rename) between them leaves root missing
    with a complete trash copy to restore — detectable, never silently
    double-counted. Hadoop's ``FileSystem.rename`` reports most
    failures (missing parent, existing destination, object-store
    quirks) as a ``false`` RETURN, not an exception — each rename is
    checked and a failure raises with the trash copy intact; the trash
    is deleted only after the new root is verified present, so no
    branch can destroy the only surviving copy of the state."""
    sc = spark.sparkContext
    hadoop = sc._jvm.org.apache.hadoop.fs.Path
    p_root, p_stage, p_trash = hadoop(root), hadoop(staging), hadoop(root + ".trash")
    fs = p_root.getFileSystem(sc._jsc.hadoopConfiguration())

    def checked_rename(src, dst, err_msg):
        # FS implementations disagree on failure signaling: HDFS-style
        # stores return FALSE, the local FS raises — treat both as the
        # same recoverable condition
        try:
            ok = fs.rename(src, dst)
        except Exception as e:
            raise IOError(f"{err_msg}: {e}") from e
        if not ok:
            raise IOError(err_msg)

    if fs.exists(p_trash):
        fs.delete(p_trash, True)
    checked_rename(
        p_root, p_trash,
        f"compaction swap: rename {root} -> {root}.trash failed; "
        f"state root left untouched",
    )
    checked_rename(
        p_stage, p_root,
        f"compaction swap: rename {staging} -> {root} failed; the "
        f"pre-compaction state is intact at {root}.trash — restore "
        f"it before re-running",
    )
    if not fs.exists(p_root):
        raise IOError(
            f"compaction swap: {root} missing after rename reported "
            f"success; pre-compaction copy kept at {root}.trash"
        )
    fs.delete(p_trash, True)


def compact_neardup_index(spark: SparkSession, index_dir: str) -> None:
    """Maintenance job for the streaming near-dup signature index: fold
    every ``batch_id=N`` partition into one (``batch_id=-1``) so file
    count stops growing with batch count. The index is a plain row log
    (doc_id, band, bh) — compaction is a rewrite, no merge semantics —
    and the sink's prior-batch filter keeps working because -1 sorts
    before every real batch id. Same stop-the-world contract as
    :func:`compact_datacard_state`: run between streaming runs only
    (after awaitTermination, when every delivered batch is committed),
    never concurrently with the sink."""
    staging = index_dir.rstrip("/") + ".compact"
    rows = spark.read.parquet(index_dir).drop("batch_id").localCheckpoint(
        eager=True
    )
    rows.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, index_dir, staging)


def compact_datacard_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance job: fold every batch partition of each datacard
    state into ONE, so the state log stops growing with batch count
    (the derived numbers cannot change — the compaction groupBy IS the
    merge the derivation already runs, pinned by
    test_streaming_datacard.py).

    Crash-safety contract: this is a STOP-THE-WORLD maintenance step —
    run it between streaming runs (AvailableNow naturally yields such
    windows), never concurrently with the sink. The swap is two
    directory renames (state -> .trash, staging -> state): each rename
    is atomic on HDFS/local FS, the pair is not, and a crash between
    them leaves the state root missing with a complete .trash copy to
    restore — detectable, never silently double-counted. A
    Crash-safety via :func:`_swap_compacted`; the transactional
    single-commit form is Delta/Iceberg (retired as untestable here —
    SCALE.md "Delta/Iceberg MERGE") — this is the layout-level form
    of the same operation."""
    from ..llm.datacard import merge_dup_states, merge_hist_states, merge_lang_states

    mergers = {
        "lang": merge_lang_states,
        "hist": merge_hist_states,
        "dup": merge_dup_states,
    }
    for name, merge in mergers.items():
        root = f"{state_dir}/{name}"
        staging = f"{state_dir}/.compact_{name}"
        state = spark.read.parquet(root)
        # merge(x, empty) canonicalizes: one groupBy over all partials
        merged = merge(state, state.limit(0)).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
        _swap_compacted(spark, root, staging)


def stream_datacard_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental datacard — x41's operational twin: a
    continuously-ingesting corpus keeps its per-language datacard
    (volume, median length, duplicate rate, mean quality) current by
    folding each arrival batch into persisted mergeable states instead
    of recomputing the card from scratch (x37) per refresh. Per batch
    the work is one projection + three aggregate-sized states; deriving
    the card touches only state. Batch CORRECTNESS twin:
    queries.x41_datacard_incremental runs the same llm.datacard algebra
    over a batched split and is driver-verified against a from-scratch
    DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(datacard_batch_writer(spark, state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    warehouse_root: str,
    entity: str,
    pk: str | list,
    checkpoint_dir: str,
    fmt: str = "csv",
) -> None:
    """Continuous upsert ingestion: stream files → MERGE into a
    warehouse table via ``foreachBatch`` (K1/K2 restated for streaming —
    the reference's ON-DUPLICATE-KEY-UPDATE loader, extract.py:328-357,
    fed by a file watcher instead of a cron batch).

    Exactly-once story: the checkpoint file-log guarantees each file
    enters exactly one micro-batch; ``foreachBatch`` may RE-RUN a batch
    after a crash, so the sink must be idempotent — and last-writer-wins
    keyed on (pk, batch_id) is: re-merging an already-applied batch
    rewrites the same winners. At 100 TB the snapshot rewrite becomes a
    Delta/Iceberg MERGE (retired as untestable here; restoration code
    in SCALE.md "Delta/Iceberg MERGE") so only touched files rewrite;
    the foreachBatch seam is identical.
    """
    from ..plans.merge import upsert_last_writer_wins
    from ..sources.warehouse import Warehouse

    from pyspark.sql import functions as F

    wh = Warehouse(spark, warehouse_root)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        incoming = batch_df.withColumn(
            "_batch_seq", F.lit(batch_id).cast("long")
        )
        if wh.exists("production", entity):
            existing = wh.read("production", entity).withColumn(
                "_batch_seq", F.lit(-1).cast("long")
            )
            # break lineage before overwriting the directory being read
            merged = upsert_last_writer_wins(
                existing, incoming, pk, "_batch_seq"
            ).localCheckpoint(eager=True)
        else:
            merged = incoming
        wh.overwrite(merged.drop("_batch_seq"), "production", entity)

    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_totals(stream: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total, emitted on every update.

    The state dict is one row per user (bounded by user cardinality);
    this is the engine's template for operators Spark lacks natively —
    arbitrary per-key accumulators with exactly-once state via the
    streaming checkpoint.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
        })

    return stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def mv_state_batch_writer(
    spark: SparkSession,
    state_dir: str,
    keys: list[str],
    op_col: str = "op",
    old_col: str = "old_val",
    new_col: str = "new_val",
    count_col: str = "n_rows",
    sum_col: str = "sum_val",
):
    """foreachBatch sink for RETRACTABLE materialized-view maintenance
    (x46's operational twin): each arrival batch of before/after-image
    CDC events is reduced to SIGNED per-key partials
    (plans.cdc_signed_partials — I=+1/+new, D=-1/-old, U=0/new-old) and
    written under ``state_dir/batch_id=N``. Signed partials under sum
    are still a commutative monoid, so deriving the MV is one groupBy
    over the state log — deletes and updates cost exactly what inserts
    cost, and the corpus of past facts is never rescanned. Seed the
    log with the base snapshot's (unsigned) aggregate as a plain
    partial (e.g. ``batch_id=-1``). Exactly-once story matches the
    other sinks: a crash-re-delivered batch OVERWRITES its own
    batch_id partition with identical content."""
    import os

    from ..plans.incremental import cdc_signed_partials

    def step(batch_df: DataFrame, batch_id: int) -> None:
        state = cdc_signed_partials(
            batch_df, keys, op_col, old_col, new_col, count_col, sum_col
        )
        state.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return step


def mv_from_state_dir(
    spark: SparkSession,
    state_dir: str,
    keys: list[str],
    count_col: str = "n_rows",
    sum_col: str = "sum_val",
) -> DataFrame:
    """Derive the maintained view from the persisted signed-state log:
    one groupBy over aggregate-sized partials; keys retracted to a zero
    count have ceased to exist and are dropped."""
    from pyspark.sql import functions as F

    s = spark.read.parquet(state_dir).drop("batch_id")
    return (
        s.groupBy(*keys)
        .agg(
            F.sum(count_col).cast("bigint").alias(count_col),
            F.sum(sum_col).alias(sum_col),
        )
        .filter(F.col(count_col) > 0)
    )


def compact_mv_state(spark: SparkSession, state_dir: str, keys: list[str]) -> None:
    """Maintenance job: fold the signed-state log into one partition
    (``batch_id=-1``). The fold keeps zero-count keys OUT (they are
    fully retracted — compaction is exactly the point where their
    bookkeeping rows disappear); same stop-the-world contract and
    crash-safe swap as the other state compactors."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = mv_from_state_dir(spark, state_dir, keys).localCheckpoint(
        eager=True
    )
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def stream_mv_state_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    fmt: str = "parquet",
) -> None:
    """Streaming retractable-MV maintenance: fold each arrival batch of
    CDC events into the signed per-key state (x46's operational twin,
    same AvailableNow cadence as the other state sinks). Batch
    CORRECTNESS twin: queries.x46_retractable_mv folds the same
    retraction algebra and is driver-verified against a from-scratch
    DuckDB recompute of the post-CDC table."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            mv_state_batch_writer(spark, state_dir, keys)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def countmin_state_batch_writer(
    spark: SparkSession,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch sink for incremental Count-Min maintenance
    (:mod:`..llm.sketch` — hh2's operational twin): each arrival
    batch's d x w sketch partial lands under ``state_dir/batch_id=N``.
    The state log is a sum-monoid on the (j, b) cell key — deriving
    the corpus sketch unions all partitions and re-aggregates, so a
    heavy-hitter monitor over a growing stream keeps d*w cells of
    state and pays batch-sized arrival work, never a history rescan.
    Exactly-once story matches the LM/datacard sinks: a re-delivered
    batch OVERWRITES its own batch_id partition with identical
    content."""
    import os

    from pyspark.sql import functions as F

    from ..llm.sketch import countmin_build
    from ..llm.text import tokens

    def step(batch_df: DataFrame, batch_id: int) -> None:
        counts = (
            batch_df.select(F.explode(tokens(text_col)).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        countmin_build(counts).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return step


def countmin_from_state_dir(spark: SparkSession, state_dir: str) -> DataFrame:
    """(j, b, cnt) — the folded sketch from the persisted state log;
    reads only d*w-cell state partitions, never the corpus text."""
    from ..plans import merge_agg_state

    state = spark.read.parquet(state_dir).drop("batch_id")
    return merge_agg_state(state, state.limit(0), ["j", "b"], count_col="cnt")


def compact_countmin_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance job: fold every batch partition of the sketch state
    into one (``batch_id=-1``) — same stop-the-world contract and
    crash-safe swap as the LM/datacard compactors."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = countmin_from_state_dir(spark, state_dir).localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def stream_countmin_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental Count-Min sketch — hh2's operational twin,
    same AvailableNow cadence as the LM/TF-IDF/datacard sinks. Batch
    CORRECTNESS twin: queries.hh2_countmin_fold is driver-verified
    against hh1's one-pass DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(countmin_state_batch_writer(spark, state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def lc_bitmap_batch_writer(
    spark: SparkSession,
    state_dir: str,
    text_col: str = "text",
    key_col: str = "source",
):
    """foreachBatch sink for incremental linear-counting cardinality
    (:mod:`..llm.sketch` LC helpers — hh3's operational twin): each
    arrival batch's DISTINCT (key, bucket) hit set lands under
    ``state_dir/batch_id=N``. The bitmap is a UNION monoid — the
    corpus-so-far cardinality comes from a distinct over the state log
    (w-bounded rows per key), so a distinct-token monitor over a
    growing stream never rescans token history. Re-delivered batches
    overwrite their own batch_id partition (exactly-once, same
    contract as the CM/LM/datacard sinks)."""
    import os

    from ..llm.sketch import lc_hits

    def step(batch_df: DataFrame, batch_id: int) -> None:
        lc_hits(batch_df, key_col, text_col).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return step


def lc_bitmap_from_state_dir(spark: SparkSession, state_dir: str) -> DataFrame:
    """(key, b) — the folded bitmap from the persisted state log:
    distinct over the per-batch hit sets (the union-monoid merge)."""
    return spark.read.parquet(state_dir).drop("batch_id").distinct()


def compact_lc_bitmap_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance job: fold every batch partition of the bitmap state
    into one (``batch_id=-1``) — same stop-the-world contract and
    crash-safe swap as the other state compactors."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = lc_bitmap_from_state_dir(spark, state_dir).localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def stream_lc_bitmap_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental linear-counting bitmap — hh3's
    operational twin, same AvailableNow cadence as the CM/LM/datacard
    sinks. Batch CORRECTNESS twin: queries.hh3_linear_counting is
    driver-verified against its exact-distinct DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(lc_bitmap_batch_writer(spark, state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def hll_register_batch_writer(
    spark: SparkSession,
    state_dir: str,
    text_col: str = "text",
    key_col: str = "source",
):
    """foreachBatch sink for incremental HyperLogLog cardinality
    (:mod:`..llm.sketch` HLL helpers — hh4's operational twin): each
    arrival batch's (key, j, m_j) register table lands under
    ``state_dir/batch_id=N``. Registers are a MAX monoid — the
    corpus-so-far registers come from a groupBy-max over the state log
    (m-bounded rows per key per batch), so a cardinality monitor over
    a growing stream never rescans token history, and unlike the LC
    bitmap (hh3's twin) the state never saturates: 256 rows per key
    serve any cardinality. Re-delivered batches overwrite their own
    batch_id partition (exactly-once, same contract as the
    CM/LC/LM/datacard sinks)."""
    import os

    from ..llm.sketch import hll_registers

    def step(batch_df: DataFrame, batch_id: int) -> None:
        hll_registers(batch_df, key_col, text_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, f"batch_id={batch_id}"))

    return step


def hll_registers_from_state_dir(
    spark: SparkSession, state_dir: str, key_col: str = "source"
) -> DataFrame:
    """(key, j, m_j) — the folded registers from the persisted state
    log: groupBy-max over the per-batch registers (the max-monoid
    merge)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(state_dir)
        .groupBy(key_col, "j")
        .agg(F.max("m_j").alias("m_j"))
    )


def compact_hll_register_state(
    spark: SparkSession, state_dir: str, key_col: str = "source"
) -> None:
    """Maintenance job: fold every batch partition of the register
    state into one (``batch_id=-1``) — same stop-the-world contract
    and crash-safe swap as the other state compactors."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = hll_registers_from_state_dir(
        spark, state_dir, key_col
    ).localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def stream_hll_registers_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental HyperLogLog registers — hh4's operational
    twin, same AvailableNow cadence as the CM/LC/LM/datacard sinks.
    Batch CORRECTNESS twin: queries.hh4_hll_cardinality is
    driver-verified against its exact-distinct DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            hll_register_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def token_dist_batch_writer(
    spark: SparkSession,
    state_dir: str,
    text_col: str = "text",
    key_col: str = "source",
):
    """foreachBatch sink for per-source token-distribution states —
    x54's operational twin: each arrival batch's (key, tok, c) counts
    land under ``state_dir/batch_id=N``. Counts are a SUM monoid (the
    datacard/LM/TF-IDF algebra), so history folds by addition and the
    JS-drift report (:func:`js_drift_report`) compares any batch
    against everything before it WITHOUT rescanning text. Re-delivered
    batches overwrite their own batch_id partition (exactly-once, same
    contract as the other state sinks)."""
    import os

    from pyspark.sql import functions as F

    from ..llm.text import tokens

    def step(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(
                key_col, F.explode(tokens(text_col)).alias("tok")
            )
            .groupBy(key_col, "tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .write.mode("overwrite")
            .parquet(os.path.join(state_dir, f"batch_id={batch_id}"))
        )

    return step


def token_dist_from_state_dir(
    spark: SparkSession,
    state_dir: str,
    key_col: str = "source",
    max_batch_id: int | None = None,
) -> DataFrame:
    """(key, tok, c) — the folded distribution from the persisted
    state log (sum-monoid merge), optionally restricted to batches
    strictly BEFORE ``max_batch_id`` (the history side of a drift
    comparison)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(state_dir)
    if max_batch_id is not None:
        df = df.filter(F.col("batch_id") < max_batch_id)
    return df.groupBy(key_col, "tok").agg(F.sum("c").alias("c"))


def js_drift_report(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    key_col: str = "source",
) -> DataFrame:
    """(key, n_hist_tokens, n_batch_tokens, js_div): Jensen-Shannon
    divergence of arrival batch ``batch_id``'s per-key token
    distribution against the FOLD of all earlier batches — the
    continuous-ingest form of queries.x54_source_drift (same guarded
    term algebra; x54 is the driver-verified batch CORRECTNESS twin).
    All inputs are state-log rows: no text is rescanned, so the
    monitor's cost rides vocabulary size, not corpus size."""
    from pyspark.sql import functions as F

    hist = token_dist_from_state_dir(
        spark, state_dir, key_col, max_batch_id=batch_id
    ).withColumnRenamed("c", "c1")
    cur = (
        spark.read.parquet(state_dir)
        .filter(F.col("batch_id") == batch_id)
        .groupBy(key_col, "tok")
        .agg(F.sum("c").alias("c2"))
    )
    cnt = hist.join(cur, [key_col, "tok"], "full_outer").fillna(
        0, subset=["c1", "c2"]
    )
    n = cnt.groupBy(key_col).agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
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
        cnt.join(n, key_col)
        .select(key_col, term.alias("term"))
        .groupBy(key_col)
        .agg(F.sum("term").alias("s"))
    )
    return s.join(n, key_col).select(
        key_col,
        F.col("n1").cast("bigint").alias("n_hist_tokens"),
        F.col("n2").cast("bigint").alias("n_batch_tokens"),
        F.round(0.5 * F.col("s"), 4).alias("js_div"),
    )


def stream_token_dist_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming per-source token-distribution states — x54's
    operational twin, same AvailableNow cadence as the other state
    sinks."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            token_dist_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def logbin_hist_batch_writer(
    spark: SparkSession,
    state_dir: str,
    key_col: str = "event_type",
    value_col: str = "value",
):
    """foreachBatch sink for incremental log-bin quantile histograms —
    hh5's operational twin (and x56's fence source): each arrival
    batch's (key, blen, sub, c) histogram lands under
    ``state_dir/batch_id=N``. Bin counts are a SUM monoid, so history
    folds by addition and any quantile (or Tukey fence) reads off the
    folded histogram without re-sorting past batches. Re-delivered
    batches overwrite their own batch_id partition (exactly-once,
    same contract as the other state sinks). Values are scaled to
    cents in the sink so the state holds only non-negative bigints."""
    import os

    from pyspark.sql import functions as F

    from ..llm.sketch import logbin_histogram

    def step(batch_df: DataFrame, batch_id: int) -> None:
        v = F.round(F.col(value_col) * 100, 0).cast("bigint")
        vals = batch_df.select(F.col(key_col).alias("grp"), v.alias("v"))
        logbin_histogram(vals, "grp", "v").write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return step


def logbin_hist_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """(grp, blen, sub, c) — the folded histogram from the persisted
    state log (sum-monoid merge)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(state_dir)
        .groupBy("grp", "blen", "sub")
        .agg(F.sum("c").alias("c"))
    )


def stream_logbin_hist_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental log-bin histograms — hh5's operational
    twin, same AvailableNow cadence as the other state sinks. Batch
    CORRECTNESS twin: queries.hh5_logbin_quantiles is driver-verified
    against its exact-percentile DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            logbin_hist_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def block_index_batch_writer(
    spark: SparkSession,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch sink for a content-addressed BLOCK STORE ingest —
    mm4's operational twin: each arrival batch's payloads are cut into
    fixed blocks (llm.multimodal.payload_blocks, native binary md5 —
    no Python worker), the batch's distinct block hashes anti-join the
    persisted index, and only blocks the store has NEVER seen land
    under ``index_dir/batch_id=N`` — exactly how a dedup store admits
    writes: bytes-on-disk grow with NEW content, not with ingest
    volume. Re-delivered batches overwrite their own batch_id
    partition; re-running a batch can re-admit at most its own blocks
    (idempotent, same contract as the near-dup index sink)."""
    import os

    from pyspark.sql import functions as F

    from ..llm.multimodal import attach_binary_payload, payload_blocks

    def step(batch_df: DataFrame, batch_id: int) -> None:
        m = attach_binary_payload(batch_df, text_col, id_col)
        blocks = (
            payload_blocks(m)
            .groupBy("h")
            .agg(F.max("blen").alias("blen"))
        )
        try:
            existing = spark.read.parquet(index_dir).filter(
                F.col("batch_id") != batch_id
            ).select("h")
            blocks = blocks.join(existing, "h", "left_anti")
        except Exception:
            pass  # first batch: no index yet
        blocks.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch_id={batch_id}")
        )

    return step


def block_index_from_dir(spark: SparkSession, index_dir: str) -> DataFrame:
    """(h, blen) — the store's distinct blocks from the persisted
    index log (first-writer-wins across batches by construction; a
    defensive distinct keeps redelivered overlaps harmless)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(index_dir)
        .groupBy("h")
        .agg(F.max("blen").alias("blen"))
    )


def stream_block_dedup_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    index_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming content-addressed block ingest — mm4's operational
    twin, same AvailableNow cadence as the other index sinks. Batch
    CORRECTNESS twin: queries.mm4_block_dedup is driver-verified
    against its DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            block_index_batch_writer(spark, index_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def reservoir_batch_writer(
    spark: SparkSession,
    state_dir: str,
    k: int = 5,
    key_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
):
    """foreachBatch sink for a streaming per-key weighted reservoir —
    x57's operational twin: each arrival batch's per-key top-k by the
    Efraimidis-Spirakis hash priority lands under
    ``state_dir/batch_id=N``. Per-key top-k is a mergeable fold (the
    top-k of a union is the top-k of per-part top-k's — x57's pinned
    merge property), so the CURRENT balanced sample is a group-limit
    over the state log, never a history rescan, and state is bounded
    by k rows per key per batch (k per key after compaction).
    Re-delivered batches overwrite their own batch_id partition."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..llm.dedup import _hexint

    def step(batch_df: DataFrame, batch_id: int) -> None:
        u = (
            _hexint(
                F.md5(F.concat_ws("|", F.lit("ps"), F.col(id_col))), 8
            )
            + 0.5
        ) / F.lit(4294967296.0)
        scored = batch_df.select(
            key_col,
            id_col,
            F.col(weight_col).cast("bigint").alias("w"),
            F.round(F.log(u) / F.col(weight_col), 8).alias("priority"),
        )
        wnd = Window.partitionBy(key_col).orderBy(
            F.col("priority").desc(), id_col
        )
        (
            scored.withColumn("rk", F.row_number().over(wnd))
            .filter(F.col("rk") <= k)
            .drop("rk")
            .write.mode("overwrite")
            .parquet(os.path.join(state_dir, f"batch_id={batch_id}"))
        )

    return step


def reservoir_from_state_dir(
    spark: SparkSession,
    state_dir: str,
    k: int = 5,
    key_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(key, id, w, priority) — the current per-key reservoir: top-k
    by priority over the state log (the mergeable-fold read)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    wnd = Window.partitionBy(key_col).orderBy(
        F.col("priority").desc(), id_col
    )
    return (
        spark.read.parquet(state_dir)
        .drop("batch_id")
        .withColumn("rk", F.row_number().over(wnd))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def stream_reservoir_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    fmt: str = "parquet",
) -> None:
    """Streaming per-key weighted reservoir — x57's operational twin,
    same AvailableNow cadence as the other state sinks. Batch
    CORRECTNESS twin: queries.x57_per_source_reservoir is
    driver-verified against its DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            reservoir_batch_writer(spark, state_dir, k=k)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def daily_counts_batch_writer(
    spark: SparkSession,
    state_dir: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
):
    """foreachBatch sink for incremental daily volume counts — x64's
    operational twin state: each arrival batch's (key, day) partial
    counts land under ``state_dir/batch_id=N``. Counts are a SUM
    monoid, so the corpus-so-far daily matrix is a sum over the state
    log — the CUSUM drift monitor re-derives from a matrix-sized fold,
    never rescanning event history. Re-delivered batches overwrite
    their own batch_id partition (exactly-once, same contract as the
    CM/LM/datacard sinks)."""
    import os

    from ..operators.aggregate import daily_counts

    def step(batch_df: DataFrame, batch_id: int) -> None:
        daily_counts(batch_df, key_col, ts_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, f"batch_id={batch_id}"))

    return step


def daily_counts_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """(k, day, n) — the folded daily matrix (sum-monoid merge over
    the per-batch partials)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(state_dir)
        .groupBy("k", "day")
        .agg(F.sum("n").alias("n"))
    )


def compact_daily_counts_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance: fold every batch partition into one (batch_id=-1)
    — same stop-the-world contract and crash-safe swap as the other
    state compactors."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = daily_counts_from_state_dir(spark, state_dir).localCheckpoint(
        eager=True
    )
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def cusum_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """The CUSUM change-point report served from the persisted daily
    state — the same ``cusum_over_daily`` algebra the driver
    hash-verifies via x64's DuckDB oracle, applied to the folded
    matrix instead of a full event scan."""
    from ..operators.aggregate import cusum_over_daily

    return cusum_over_daily(daily_counts_from_state_dir(spark, state_dir))


def stream_daily_cusum_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental CUSUM drift monitor — x64's operational
    twin, same AvailableNow cadence as the other state sinks. Batch
    CORRECTNESS twin: queries.x64_cusum_changepoint is driver-verified
    against its DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            daily_counts_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def kmv_state_batch_writer(
    spark: SparkSession,
    state_dir: str,
    key_col: str = "event_type",
    id_col: str = "user_id",
):
    """foreachBatch sink for incremental KMV (bottom-k) distinct
    sketches — hh6's operational twin: each arrival batch's per-key
    bottom-64 hash set lands under ``state_dir/batch_id=N``. The
    sketch is a UNION monoid (bottom-k of unioned bottom-ks), so the
    audience-so-far sketch folds from k-sized rows per key — a
    distinct-count monitor over a growing stream never rescans id
    history. Re-delivered batches overwrite their own batch_id
    partition."""
    import os

    from pyspark.sql import functions as F

    from ..llm.sketch import kmv_bottomk, kmv_hash

    def step(batch_df: DataFrame, batch_id: int) -> None:
        h = batch_df.select(
            F.col(key_col).alias("k"),
            kmv_hash(F.col(id_col)).alias("hv"),
        )
        kmv_bottomk(h, ["k"]).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return step


def kmv_from_state_dir(spark: SparkSession, state_dir: str) -> DataFrame:
    """(k, hv) — the folded bottom-64 sketch per key (union-monoid
    merge: union the per-batch sketches, distinct, bottom-k again)."""
    from ..llm.sketch import kmv_bottomk

    return kmv_bottomk(
        spark.read.parquet(state_dir).drop("batch_id"), ["k"]
    )


def compact_kmv_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance: fold every batch partition into one (batch_id=-1)."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = kmv_from_state_dir(spark, state_dir).localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def stream_kmv_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental KMV distinct-count sketch — hh6's
    operational twin, same AvailableNow cadence as the other state
    sinks. Batch CORRECTNESS twin: queries.hh6_kmv_overlap is
    driver-verified against its DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            kmv_state_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def user_days_batch_writer(
    spark: SparkSession,
    state_dir: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """foreachBatch sink for incremental rolling-engagement state —
    x75's operational twin: each arrival batch's DISTINCT (user, day)
    activity set lands under ``state_dir/batch_id=N``. The state is a
    UNION monoid (same shape as the LC bitmap), so DAU/WAU over a
    growing stream folds from user-day rows — no event history
    rescans. Re-delivered batches overwrite their own batch_id
    partition (exactly-once, same contract as the other state
    sinks)."""
    import os

    from ..operators.aggregate import user_days

    def step(batch_df: DataFrame, batch_id: int) -> None:
        user_days(batch_df, user_col, ts_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, f"batch_id={batch_id}"))

    return step


def user_days_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """(user_id, day) — the folded activity set (union-monoid merge)."""
    return spark.read.parquet(state_dir).drop("batch_id").distinct()


def compact_user_days_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance: fold every batch partition into one (batch_id=-1)."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = user_days_from_state_dir(spark, state_dir).localCheckpoint(
        eager=True
    )
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def rolling_active_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """The DAU/WAU/stickiness report served from the persisted
    activity state — the same ``rolling_active_users`` algebra the
    driver hash-verifies via x75's DuckDB oracle."""
    from ..operators.aggregate import rolling_active_users

    return rolling_active_users(user_days_from_state_dir(spark, state_dir))


def stream_rolling_active_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental DAU/WAU — x75's operational twin, same
    AvailableNow cadence as the other state sinks. Batch CORRECTNESS
    twin: queries.x75_rolling_active_users is driver-verified against
    its DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            user_days_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def bloom_state_batch_writer(
    spark: SparkSession,
    state_dir: str,
    text_col: str = "text",
    key_col: str = "source",
):
    """foreachBatch sink for the incremental Bloom membership sketch —
    hh7's operational twin: each arrival batch's per-key occupied bit
    positions (<= 256 ints per key) land under
    ``state_dir/batch_id=N``. The filter is a set-UNION monoid, so the
    vocabulary-so-far sketch folds by DISTINCT over state rows — a
    "might shard X contain token T" monitor over a growing corpus
    never rescans document history. Re-delivered batches overwrite
    their own batch_id partition (exactly-once, same contract as the
    other state sinks)."""
    import os

    from ..llm.sketch import bloom_positions

    def step(batch_df: DataFrame, batch_id: int) -> None:
        bloom_positions(batch_df, text_col, key_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, f"batch_id={batch_id}"))

    return step


def bloom_occupied_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """(key, pos) — the folded occupied-position set (union monoid)."""
    return spark.read.parquet(state_dir).drop("batch_id").distinct()


def compact_bloom_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance: fold every batch partition into one (batch_id=-1)."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = bloom_occupied_from_state_dir(spark, state_dir).localCheckpoint(
        eager=True
    )
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def bloom_membership_from_state_dir(
    spark: SparkSession, state_dir: str, probes: list[str],
    key_col: str = "source",
) -> DataFrame:
    """(key, probe, bloom_hit) served from the persisted sketch — the
    same ``bloom_probe`` algebra hh7's driver-verified batch query
    runs; no-false-negative contract holds over any batching because
    union never clears a bit."""
    from ..llm.sketch import bloom_probe

    return bloom_probe(
        bloom_occupied_from_state_dir(spark, state_dir), probes, key_col
    )


def stream_bloom_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental Bloom membership sketch — hh7's
    operational twin, same AvailableNow cadence as the other state
    sinks. Batch CORRECTNESS twin: queries.hh7_bloom_membership is
    driver-verified against its DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            bloom_state_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def rfm_state_batch_writer(spark: SparkSession, state_dir: str):
    """foreachBatch sink for incremental RFM state — x80's operational
    twin: each arrival batch's per-user (last_ts, purchase count,
    purchase cents) partials land under ``state_dir/batch_id=N``. The
    state is a (max, sum, sum) monoid — cents are rounded per EVENT
    and summed as exact integers, so any batching folds to exactly the
    full-history values (operators/aggregate.py:rfm_partials, shared
    with the batch query). Re-delivered batches overwrite their own
    batch_id partition."""
    import os

    from ..operators.aggregate import rfm_partials

    def step(batch_df: DataFrame, batch_id: int) -> None:
        rfm_partials(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return step


def rfm_state_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """(user_id, last_ts, freq, mon_cents) — folded (max, sum, sum)."""
    from ..operators.aggregate import rfm_fold

    return rfm_fold(spark.read.parquet(state_dir).drop("batch_id"))


def compact_rfm_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance: fold every batch partition into one (batch_id=-1)."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = rfm_state_from_state_dir(spark, state_dir).localCheckpoint(
        eager=True
    )
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def rfm_scores_from_state_dir(
    spark: SparkSession, state_dir: str, ref: str
) -> DataFrame:
    """The RFM quintile report served from persisted state — the same
    ``rfm_scores`` algebra x80's driver-verified batch query runs."""
    from ..operators.aggregate import rfm_scores

    return rfm_scores(rfm_state_from_state_dir(spark, state_dir), ref)


def stream_rfm_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental RFM scoring — x80's operational twin,
    same AvailableNow cadence as the other state sinks. Batch
    CORRECTNESS twin: queries.x80_rfm_scores is driver-verified
    against its DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            rfm_state_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ewma_from_state_dir(
    spark: SparkSession, state_dir: str, alpha: float = 0.3
) -> DataFrame:
    """The EWMA smoothing report served from the SAME persisted
    daily-count state the CUSUM twin maintains (one state log, two
    monitors — the sum-monoid matrix is the shared substrate): x81's
    ``ewma_over_daily`` algebra applied to the folded counts instead
    of a full event scan. Batch CORRECTNESS twin: x81_ewma_smoothing
    is driver-verified against its DuckDB oracle."""
    from ..operators.aggregate import ewma_over_daily

    return ewma_over_daily(
        daily_counts_from_state_dir(spark, state_dir), "k", alpha
    )


def daily_hll_batch_writer(
    spark: SparkSession,
    state_dir: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "user_id",
):
    """foreachBatch sink for per-(key, day) HyperLogLog registers —
    hh9's operational twin state: each arrival batch's daily register
    table lands under ``state_dir/batch_id=N``. Registers are a MAX
    monoid, so the corpus-so-far daily registers fold by groupBy-max
    over the state log — the rolling-distinct monitor re-derives from
    <= 256 rows per (key, day) without rescanning id history.
    Re-delivered batches overwrite their own batch_id partition
    (exactly-once, same contract as the CM/LM/KMV sinks)."""
    import os

    from pyspark.sql import functions as F

    from ..llm.sketch import hll_value_registers

    def step(batch_df: DataFrame, batch_id: int) -> None:
        uh = batch_df.select(
            F.col(key_col).alias("k"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            F.col(id_col).alias("id"),
        ).distinct()
        hll_value_registers(uh, ["k", "day"], "id").write.mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, f"batch_id={batch_id}"))

    return step


def daily_hll_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """(k, day, j, m_j) — the folded daily registers (max-monoid merge
    over the per-batch register tables)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(state_dir)
        .groupBy("k", "day", "j")
        .agg(F.max("m_j").alias("m_j"))
    )


def rolling_hll_from_state_dir(
    spark: SparkSession, state_dir: str, window: int = 7
) -> DataFrame:
    """The rolling-window distinct estimate served from the persisted
    daily register state — the same ``rolling_register_estimate``
    algebra hh9's batch form is driver-verified with, applied to the
    folded registers instead of a full event scan. (The serve is
    estimate-only: the exact contract side needs raw ids, which the
    state deliberately does not keep — that economy is the point.)"""
    from ..llm.sketch import rolling_register_estimate

    return rolling_register_estimate(
        daily_hll_from_state_dir(spark, state_dir), "k", "day", window
    )


def compact_daily_hll_state(spark: SparkSession, state_dir: str) -> None:
    """Maintenance: fold every batch partition into one (batch_id=-1)
    — same stop-the-world contract and crash-safe swap as the other
    state compactors."""
    staging = state_dir.rstrip("/") + ".compact"
    merged = daily_hll_from_state_dir(spark, state_dir).localCheckpoint(
        eager=True
    )
    merged.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
    _swap_compacted(spark, state_dir, staging)


def stream_daily_hll_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming incremental rolling-HLL distinct monitor — hh9's
    operational twin, same AvailableNow cadence as the other state
    sinks. Batch CORRECTNESS twin: queries.hh9_rolling_hll is
    driver-verified against its exact-contract DuckDB oracle."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            daily_hll_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def error_rate_from_state_dir(
    spark: SparkSession, state_dir: str, error_key: str = "error"
) -> DataFrame:
    """The Wilson-fenced daily error-rate report served from the SAME
    persisted daily-count state the CUSUM and EWMA twins maintain —
    one state log, three monitors (the (k, day, n) matrix is a sum
    monoid, so every per-day total and error count folds exactly).
    Batch CORRECTNESS twin: queries.x93_error_rate_monitor is
    driver-verified against its DuckDB oracle."""
    from ..operators.aggregate import wilson_error_rate_over_daily

    return wilson_error_rate_over_daily(
        daily_counts_from_state_dir(spark, state_dir), error_key
    )


# --------------------------------------------------------------------------
# TPC-H-shape analytics twins (a-series): the r12 verdict's one
# remaining twin asymmetry. a0 (Q1 pricing summary) and a11 (Q6
# revenue filter) are pure additive aggregates — sum/count monoids —
# so they fold into the same batch_id-keyed state-log pattern as the
# sketch and datacard sinks: per batch, ONE partial aggregate lands
# under state_dir/batch_id=N (re-delivered batches overwrite their own
# partition — exactly-once); the serve folds the state log (group-
# keys x batches rows, never a fact re-scan) and derives the exact
# a0/a11 output shape. Batch CORRECTNESS twins:
# queries.a0_pricing_summary / a11_forecast_revenue_change are
# driver-verified against DuckDB oracles; the fold==full-recompute
# tests (tests/test_streaming_tpch.py) tie these sinks to them.

_A0_CUTOFF = "2000-09-02 00:00:00"


def pricing_summary_batch_writer(spark: SparkSession, state_dir: str):
    """foreachBatch sink for the streaming Q1 pricing summary — a0's
    operational twin. State per batch: partial (sum_qty, sum_price,
    sum_disc_price, sum_charge, sum_disc, n) per (l_returnflag,
    l_linestatus) — the averages derive from folded sums at serve
    time, so the state is a pure SUM monoid (|flags|x|statuses| rows
    per batch ~ 6 rows, corpus-size-independent)."""
    import os

    from pyspark.sql import functions as F

    def step(batch_df: DataFrame, batch_id: int) -> None:
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        part = (
            batch_df.filter(
                F.col("l_shipdate")
                <= F.lit(_A0_CUTOFF).cast("timestamp")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("s_qty"),
                F.sum("l_extendedprice").alias("s_price"),
                F.sum(disc_price).alias("s_disc_price"),
                F.sum(disc_price * (1 + F.col("l_tax"))).alias("s_charge"),
                F.sum("l_discount").alias("s_disc"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        part.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return step


def pricing_summary_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Fold the state log and derive a0's exact output columns
    (identical names and rounding, so fold == full-recompute is
    row-comparable against the driver-verified batch query)."""
    from pyspark.sql import functions as F

    s = (
        spark.read.parquet(state_dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("s_qty").alias("s_qty"),
            F.sum("s_price").alias("s_price"),
            F.sum("s_disc_price").alias("s_disc_price"),
            F.sum("s_charge").alias("s_charge"),
            F.sum("s_disc").alias("s_disc"),
            F.sum("n").alias("n"),
        )
    )
    return s.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("s_qty"), 2).alias("sum_qty"),
        F.round(F.col("s_price"), 2).alias("sum_base_price"),
        F.round(F.col("s_disc_price"), 2).alias("sum_disc_price"),
        F.round(F.col("s_charge"), 2).alias("sum_charge"),
        F.round(F.col("s_qty") / F.col("n"), 4).alias("avg_qty"),
        F.round(F.col("s_price") / F.col("n"), 4).alias("avg_price"),
        F.round(F.col("s_disc") / F.col("n"), 4).alias("avg_disc"),
        F.col("n").alias("count_order"),
    )


def stream_pricing_summary_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming Q1: lineitem files land continuously; every arrival
    batch folds into the 6-row pricing-summary state instead of
    re-scanning the fact table per refresh."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            pricing_summary_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def potential_revenue_batch_writer(spark: SparkSession, state_dir: str):
    """foreachBatch sink for the streaming Q6 revenue filter — a11's
    operational twin. One partial-sum row per batch; every predicate
    is applied batch-side so the state holds only the filtered sum."""
    import os

    from pyspark.sql import functions as F

    def step(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum(
                F.col("l_extendedprice") * F.col("l_discount")
            ).alias("s_rev")
        )
        part.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return step


def potential_revenue_from_state_dir(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """a11's exact output (one row, potential_revenue rounded 2dp)
    from the folded per-batch partial sums."""
    from pyspark.sql import functions as F

    return spark.read.parquet(state_dir).agg(
        F.round(F.sum("s_rev"), 2).alias("potential_revenue")
    )


def stream_potential_revenue_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Streaming Q6: the filter-and-fold revenue monitor kept current
    per arrival batch — state is one number per batch."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    q = (
        stream.writeStream.foreachBatch(
            potential_revenue_batch_writer(spark, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
