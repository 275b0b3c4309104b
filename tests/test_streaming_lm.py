"""Streaming incremental bigram-LM state (stream_lm_state_available_now):
the LM counts folded from the persisted state log must equal the
from-scratch recompute over everything ingested so far, stay exactly-once
under crash redelivery, and survive compaction unchanged — tx19's
operational twin (the same llm.lm algebra the driver hash-verifies
against a DuckDB oracle)."""

from __future__ import annotations

import glob

from pyspark.sql import types as T

from python_etl_pipeline_spark.llm.lm import (
    bigram_instances,
    lm_count_state,
    lm_score_docs,
)
from python_etl_pipeline_spark.streaming.file_stream import (
    compact_lm_state,
    lm_counts_from_state_dir,
    lm_state_batch_writer,
    stream_lm_state_available_now,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

ROWS1 = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
]
ROWS2 = [
    (3, "the quick brown fox naps under the old tree"),
    (4, "five dozen boxes of the quick liquor"),
]
ROWS3 = [(5, "the lazy dog naps over the box")]


def _counts(df):
    return {r["bg"]: r["c12"] for r in df.collect()}


def _full_counts(spark, rows):
    d = spark.createDataFrame(rows, SCHEMA)
    return _counts(lm_count_state(bigram_instances(d)))


def _write_batch(path, rows, spark=None):
    """Single parquet FILE (not a directory) so the file-stream source
    sees exactly one new file per batch."""
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


def test_stream_lm_state_folds_to_full_recompute(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(str(src / "b1.parquet"), ROWS1, spark)
    stream_lm_state_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    assert _counts(lm_counts_from_state_dir(spark, state_dir)) == _full_counts(
        spark, ROWS1
    )

    # new arrivals fold in; already-ingested files are not re-counted
    _write_batch(str(src / "b2.parquet"), ROWS2, spark)
    stream_lm_state_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    assert _counts(lm_counts_from_state_dir(spark, state_dir)) == _full_counts(
        spark, ROWS1 + ROWS2
    )

    # compaction folds the log to one partition without changing counts
    before = _counts(lm_counts_from_state_dir(spark, state_dir))
    compact_lm_state(spark, state_dir)
    assert _counts(lm_counts_from_state_dir(spark, state_dir)) == before
    assert len(glob.glob(f"{state_dir}/batch_id=*")) == 1

    # post-compaction arrivals keep folding correctly
    _write_batch(str(src / "b3.parquet"), ROWS3, spark)
    stream_lm_state_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    assert _counts(lm_counts_from_state_dir(spark, state_dir)) == _full_counts(
        spark, ROWS1 + ROWS2 + ROWS3
    )


def test_lm_state_writer_idempotent_on_redelivery(spark, tmp_path):
    """foreachBatch may re-run a batch after a crash: same batch_id
    must overwrite, never double-count."""
    state_dir = str(tmp_path / "state")
    step = lm_state_batch_writer(spark, state_dir)
    b1 = spark.createDataFrame(ROWS1, SCHEMA)
    step(b1, 0)
    once = _counts(lm_counts_from_state_dir(spark, state_dir))
    step(b1, 0)  # crash re-delivery of the SAME batch
    assert _counts(lm_counts_from_state_dir(spark, state_dir)) == once
    step(spark.createDataFrame(ROWS2, SCHEMA), 1)
    assert _counts(lm_counts_from_state_dir(spark, state_dir)) == _full_counts(
        spark, ROWS1 + ROWS2
    )


def test_scores_from_folded_state_match_inline(spark, tmp_path):
    """Scoring any document set against the folded state equals tx10's
    inline path over the same corpus."""
    state_dir = str(tmp_path / "state")
    step = lm_state_batch_writer(spark, state_dir)
    step(spark.createDataFrame(ROWS1, SCHEMA), 0)
    step(spark.createDataFrame(ROWS2, SCHEMA), 1)
    corpus = spark.createDataFrame(ROWS1 + ROWS2, SCHEMA)
    inst = bigram_instances(corpus)
    folded = lm_counts_from_state_dir(spark, state_dir)
    inline = lm_count_state(inst)
    got = {
        r["doc_id"]: (r["avg_nll"], r["n_bigrams"])
        for r in lm_score_docs(inst, folded).collect()
    }
    want = {
        r["doc_id"]: (r["avg_nll"], r["n_bigrams"])
        for r in lm_score_docs(inst, inline).collect()
    }
    assert got == want and len(got) == 4
