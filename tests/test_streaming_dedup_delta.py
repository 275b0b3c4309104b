"""Streaming dedup delta (stream_dedup_delta_available_now) — dd22's
operational twin: the ever-collided doc set folded over arrival
batches must equal a from-scratch uncapped LSH pass over the full
corpus (fold == full recompute), first-duplication batches follow
min(batch_id) semantics, and foreachBatch re-delivery is idempotent."""

from __future__ import annotations

from pyspark.sql import types as T

from python_etl_pipeline_spark.streaming.file_stream import (
    dedup_delta_batch_writer,
    dedup_delta_from_state_dir,
    stream_dedup_delta_available_now,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

T1 = "the quick brown fox jumps over the lazy dog near the river bank"
T2 = "pack my box with five dozen liquor jugs before the storm arrives"
T3 = "how vexingly quick daft zebras jump over the ancient stone walls"
T4 = "a completely different sentence about gardening tomatoes in clay pots"


def _write_batch(path, rows):
    # one plain .parquet FILE: the streaming file source lists files
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


def test_stream_dedup_delta_fold_equals_full_recompute(spark, tmp_path):
    """Three arrival batches with intra-batch dups (1,2), cross-batch
    dups (6 dups 1; 8 dups 3), and novel docs: the streamed
    ever-collided set must equal the endpoint set of an uncapped
    minhash_lsh_pairs pass over the union corpus — arrival order and
    batching must not change WHO is flagged duplicated."""
    from python_etl_pipeline_spark.llm.dedup import minhash_lsh_pairs

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "index")
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    batches = [
        [(1, T1), (2, T1), (3, T3)],  # 1-2 collide intra-batch
        [(6, T1), (7, T4)],  # 6 collides with stored 1 and 2
        [(8, T3), (9, T2)],  # 8 collides with stored 3
    ]
    for i, rows in enumerate(batches):
        _write_batch(str(src / f"b{i}.parquet"), rows)
        stream_dedup_delta_available_now(
            spark, str(src), SCHEMA, index_dir, events_dir, ckpt
        )

    got = {
        (r["doc_id"], r["became_dup_in_batch"])
        for r in dedup_delta_from_state_dir(spark, events_dir).collect()
    }
    corpus = spark.createDataFrame(
        [r for b in batches for r in b], SCHEMA
    )
    pairs = minhash_lsh_pairs(corpus, "text", "doc_id")
    want_ids = {
        i for r in pairs.collect() for i in (r["a"], r["b"])
    }
    assert {d for d, _ in got} == want_ids
    # first-duplication semantics: 1 and 2 collide in batch 0; 6 first
    # collides on arrival (batch 1); 3 only becomes duplicated when 8
    # arrives (batch 2) — the min(batch_id) fold must say so.
    by_doc = dict(got)
    assert by_doc[1] == 0 and by_doc[2] == 0
    assert by_doc[6] == 1
    assert by_doc[3] == 2 and by_doc[8] == 2
    assert 7 not in by_doc and 9 not in by_doc  # novel docs never flagged


def test_dedup_delta_batch_step_is_idempotent(spark, tmp_path):
    """A crash-re-delivered (batch_df, batch_id) rewrites identical
    content: index and event log byte-identical, and the re-run never
    collides the batch against its own first-attempt signatures."""
    index_dir = str(tmp_path / "index")
    events_dir = str(tmp_path / "events")
    step = dedup_delta_batch_writer(spark, index_dir, events_dir)

    step(spark.createDataFrame([(1, T1), (2, T2)], SCHEMA), 0)
    step(spark.createDataFrame([(6, T1), (7, T3)], SCHEMA), 1)

    def state():
        idx = {
            tuple(r)
            for r in spark.read.option("basePath", index_dir)
            .parquet(index_dir)
            .collect()
        }
        ev = {
            tuple(r)
            for r in spark.read.option("basePath", events_dir)
            .parquet(events_dir)
            .collect()
        }
        return idx, ev

    first = state()
    assert {
        (r["doc_id"], r["became_dup_in_batch"])
        for r in dedup_delta_from_state_dir(spark, events_dir).collect()
    } == {(1, 1), (6, 1)}
    step(spark.createDataFrame([(6, T1), (7, T3)], SCHEMA), 1)  # re-delivery
    assert state() == first


# ---------------------------- canonical election twin (dd23's sink)

HDR = (
    "template family header block shared across mirrors version two "
    "copyright notice line"
)
BODY_HI = (
    " the quick brown fox jumps over the lazy dog and it is a fine day"
    " in the park with the birds and the trees of a green field"
)


def test_stream_canonical_fold_equals_full_recompute(spark, tmp_path):
    """Arrivals land in three batches; the folded canonical per
    template-family cluster must equal a from-scratch argmax over the
    union corpus, and a higher-quality later arrival must RE-ELECT the
    cluster's canonical."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm import quality_score
    from python_etl_pipeline_spark.streaming.file_stream import (
        canonical_from_state_dir,
        compact_canonical_state,
        stream_canonical_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    batches = [
        [(1, HDR + " short body"), (2, T2)],
        [(6, HDR + BODY_HI)],  # same 64-char prefix, higher quality
        [(7, T4)],
    ]
    for i, rows in enumerate(batches):
        _write_batch(str(src / f"b{i}.parquet"), rows)
        stream_canonical_available_now(
            spark, str(src), SCHEMA, state_dir, ckpt
        )

    got = {
        r["cluster_key"]: (r["canonical_doc_id"], r["canonical_quality"])
        for r in canonical_from_state_dir(spark, state_dir).collect()
    }
    corpus = spark.createDataFrame(
        [r for b in batches for r in b], SCHEMA
    )
    want = {
        r["cluster_key"]: (r["doc_id"], r["quality"])
        for r in corpus.select(
            F.md5(F.substring("text", 1, 64)).alias("cluster_key"),
            F.struct(
                (-quality_score(F.col("text"))).alias("nq"),
                F.col("doc_id").alias("doc_id"),
                quality_score(F.col("text")).alias("quality"),
            ).alias("c"),
        )
        .groupBy("cluster_key")
        .agg(F.min("c").alias("c"))
        .select("cluster_key", "c.doc_id", "c.quality")
        .collect()
    }
    assert got == want
    # the HDR cluster was re-elected: doc 6 beat doc 1
    hdr_key = [
        k for k, (d, _q) in got.items() if d in (1, 6)
    ]
    assert len(hdr_key) == 1 and got[hdr_key[0]][0] == 6

    # compaction folds to one partition and changes no answer
    compact_canonical_state(spark, state_dir)
    import glob

    assert glob.glob(f"{state_dir}/batch_id=*") == [
        f"{state_dir}/batch_id=-1"
    ]
    after = {
        r["cluster_key"]: (r["canonical_doc_id"], r["canonical_quality"])
        for r in canonical_from_state_dir(spark, state_dir).collect()
    }
    assert after == got


def test_canonical_batch_step_is_idempotent(spark, tmp_path):
    from python_etl_pipeline_spark.streaming.file_stream import (
        canonical_from_state_dir,
        canonical_state_batch_writer,
    )

    state_dir = str(tmp_path / "state")
    step = canonical_state_batch_writer(spark, state_dir)
    step(spark.createDataFrame([(1, HDR + " short body")], SCHEMA), 0)
    step(spark.createDataFrame([(6, HDR + BODY_HI)], SCHEMA), 1)

    def state():
        return {
            tuple(r)
            for r in spark.read.option("basePath", state_dir)
            .parquet(state_dir)
            .collect()
        }

    first = state()
    step(spark.createDataFrame([(6, HDR + BODY_HI)], SCHEMA), 1)
    assert state() == first
    got = {
        (r["cluster_key"], r["canonical_doc_id"])
        for r in canonical_from_state_dir(spark, state_dir).collect()
    }
    assert len(got) == 1 and next(iter(got))[1] == 6


def test_canonical_tie_breaks_min_id_regardless_of_arrival_order(
    spark, tmp_path
):
    """Two cluster members with IDENTICAL quality (same text) arriving
    in different batches: the fold must elect min doc_id no matter
    which arrived first — the tie-break half of the argmax monoid."""
    from python_etl_pipeline_spark.streaming.file_stream import (
        canonical_from_state_dir,
        canonical_state_batch_writer,
    )

    for order, batches in (
        ("high-id-first", [[(5, HDR + " same body")], [(3, HDR + " same body")]]),
        ("low-id-first", [[(3, HDR + " same body")], [(5, HDR + " same body")]]),
    ):
        state_dir = str(tmp_path / f"state_{order}")
        step = canonical_state_batch_writer(spark, state_dir)
        for i, rows in enumerate(batches):
            step(spark.createDataFrame(rows, SCHEMA), i)
        rows = canonical_from_state_dir(spark, state_dir).collect()
        assert len(rows) == 1 and rows[0]["canonical_doc_id"] == 3, order
