"""Streaming incremental near-dup (stream_neardup_available_now):
exactly-once per file via the checkpoint file-log, idempotent
batch_id-keyed writes under foreachBatch re-delivery, and dup pairs
detected only against PRIOR batches' persisted signatures."""

from __future__ import annotations

from pyspark.sql import types as T

from python_etl_pipeline_spark.streaming.file_stream import (
    neardup_batch_writer,
    stream_neardup_available_now,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

# Long enough that 3-shingles + 16 minhashes are meaningful; doc 6
# repeats doc 1 verbatim so every band bucket matches (an exact dup is
# the strongest near-dup candidate — deterministic across seeds).
T1 = "the quick brown fox jumps over the lazy dog near the river bank"
T2 = "pack my box with five dozen liquor jugs before the storm arrives"
T3 = "how vexingly quick daft zebras jump over the ancient stone walls"
T4 = "a completely different sentence about gardening tomatoes in clay pots"


def _write_batch(spark, path, rows):
    # one plain .parquet FILE (not a directory): the streaming file
    # source lists files, it does not recurse into subdirectories
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
            }
        ),
        path,
    )


def test_stream_neardup_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "index")
    dups_dir = str(tmp_path / "dups")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, str(src / "b1.parquet"), [(1, T1), (2, T2), (3, T3)])
    stream_neardup_available_now(
        spark, str(src), SCHEMA, index_dir, dups_dir, ckpt
    )
    index = spark.read.option("basePath", index_dir).parquet(index_dir)
    assert index.select("doc_id").distinct().count() == 3
    assert index.count() == 12  # 4 bands per doc
    dups = spark.read.parquet(dups_dir)
    assert dups.count() == 0

    # re-run with no new files: checkpoint file-log skips everything
    stream_neardup_available_now(
        spark, str(src), SCHEMA, index_dir, dups_dir, ckpt
    )
    assert (
        spark.read.option("basePath", index_dir)
        .parquet(index_dir)
        .select("doc_id")
        .distinct()
        .count()
        == 3
    )

    # a new file arrives: doc 6 duplicates doc 1, doc 7 is novel.
    # Only the delta is processed; the dup pair points at the stored
    # corpus and BOTH new signatures join the index.
    _write_batch(spark, str(src / "b2.parquet"), [(6, T1), (7, T4)])
    stream_neardup_available_now(
        spark, str(src), SCHEMA, index_dir, dups_dir, ckpt
    )
    index = spark.read.option("basePath", index_dir).parquet(index_dir)
    assert index.select("doc_id").distinct().count() == 5
    pairs = {
        (r["new_id"], r["dup_of"])
        for r in spark.read.parquet(dups_dir).collect()
    }
    assert (6, 1) in pairs
    assert all(n == 6 for n, _ in pairs)  # doc 7 is novel text


def test_neardup_index_compaction_preserves_detection(spark, tmp_path):
    """compact_neardup_index folds the batch log into one partition:
    the stored signatures are unchanged as a SET, and a batch arriving
    after compaction still detects its dups against the compacted
    index (the -1 partition passes the prior-batch filter)."""
    import glob

    from python_etl_pipeline_spark.streaming.file_stream import (
        compact_neardup_index,
    )

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "index")
    dups_dir = str(tmp_path / "dups")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, str(src / "b1.parquet"), [(1, T1), (2, T2)])
    _write_batch(spark, str(src / "b2.parquet"), [(3, T3)])
    stream_neardup_available_now(spark, str(src), SCHEMA, index_dir, dups_dir, ckpt)

    def sigs():
        return {
            (r["doc_id"], r["band"], r["bh"])
            for r in spark.read.option("basePath", index_dir)
            .parquet(index_dir)
            .select("doc_id", "band", "bh")
            .collect()
        }

    before = sigs()
    compact_neardup_index(spark, index_dir)
    assert sigs() == before
    assert glob.glob(f"{index_dir}/batch_id=*") == [f"{index_dir}/batch_id=-1"]

    # post-compaction arrival: doc 6 repeats doc 1 (stored pre-compaction)
    _write_batch(spark, str(src / "b3.parquet"), [(6, T1)])
    stream_neardup_available_now(spark, str(src), SCHEMA, index_dir, dups_dir, ckpt)
    pairs = {
        (r["new_id"], r["dup_of"])
        for r in spark.read.parquet(dups_dir).collect()
    }
    assert (6, 1) in pairs


def test_neardup_batch_step_is_idempotent(spark, tmp_path):
    """foreachBatch may re-deliver a batch after a crash: re-running the
    same (batch_df, batch_id) must leave index and dups byte-identical —
    no double-append, and the re-run must not pair the batch against its
    own first-attempt signatures."""
    index_dir = str(tmp_path / "index")
    dups_dir = str(tmp_path / "dups")
    step = neardup_batch_writer(spark, index_dir, dups_dir)

    b0 = spark.createDataFrame([(1, T1), (2, T2)], SCHEMA)
    b1 = spark.createDataFrame([(6, T1), (7, T3)], SCHEMA)
    step(b0, 0)
    step(b1, 1)

    def state():
        idx = {
            tuple(r)
            for r in spark.read.option("basePath", index_dir)
            .parquet(index_dir)
            .collect()
        }
        d = {tuple(r) for r in spark.read.parquet(dups_dir).collect()}
        return idx, d

    first = state()
    dup_pairs = {
        (r["new_id"], r["dup_of"])
        for r in spark.read.parquet(dups_dir).collect()
    }
    assert dup_pairs == {(6, 1)}
    step(b1, 1)  # crash re-delivery of the same batch
    assert state() == first


def test_index_bucket_cap_bounds_degenerate_fanout(spark):
    """A degenerate index bucket (many docs sharing a band bucket —
    empty/boilerplate text) must be excludable from the incremental
    join: with the cap, a new doc landing in that bucket produces no
    candidate pairs from it; legitimate small buckets still match."""
    from python_etl_pipeline_spark.llm.dedup import (
        minhash_band_buckets,
        neardup_against_index,
    )

    # 50 identical boilerplate docs -> one degenerate bucket per band;
    # 2 distinct docs form a small legitimate bucket pair
    rows = [(i, "word " * 30) for i in range(50)] + [
        (100, T1),
        (101, T3),
    ]
    corpus = spark.createDataFrame(rows, SCHEMA)
    index = minhash_band_buckets(corpus, "text", "doc_id")
    new = spark.createDataFrame([(200, "word " * 30), (201, T1)], SCHEMA)
    bb_new = minhash_band_buckets(new, "text", "doc_id")

    uncapped = neardup_against_index(bb_new, index)
    capped = neardup_against_index(bb_new, index, max_bucket_size=10)
    un = {(r["new_id"], r["dup_of"]) for r in uncapped.collect()}
    cp = {(r["new_id"], r["dup_of"]) for r in capped.collect()}
    assert len(un) == 51  # 200 pairs with all 50 boilerplate + (201,100)
    assert cp == {(201, 100)}  # degenerate bucket excluded, real dup kept


def test_batch_writer_handles_scheme_uris(spark, tmp_path):
    """The index listing goes through the Hadoop FS API precisely so
    scheme'd URIs (hdfs://, s3a://) work; pin that with file:// — a
    local-glob implementation would see zero prior batches here and
    silently report no duplicates."""
    index_dir = f"file://{tmp_path}/index"
    dups_dir = f"file://{tmp_path}/dups"
    step = neardup_batch_writer(spark, index_dir, dups_dir)
    step(spark.createDataFrame([(1, T1)], SCHEMA), 0)
    step(spark.createDataFrame([(6, T1)], SCHEMA), 1)
    pairs = {
        (r["new_id"], r["dup_of"])
        for r in spark.read.parquet(dups_dir).collect()
    }
    assert pairs == {(6, 1)}
