"""Streaming incremental datacard (stream_datacard_available_now):
the per-language card derived from the persisted state log must equal
the from-scratch recompute over everything ingested so far, stay
exactly-once under checkpoint re-runs, and fold new arrivals without
touching history (x41's operational twin — the same llm.datacard
algebra the driver hash-verifies against a DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import types as T

from python_etl_pipeline_spark.streaming.file_stream import (
    datacard_batch_writer,
    datacard_from_state_dir,
    stream_datacard_available_now,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

ROWS1 = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "pack my box with five dozen liquor jugs", "en"),
    (3, "der schnelle braune fuchs springt hoch", "de"),
]
ROWS2 = [
    (4, "the quick brown fox jumps over the lazy dog", "en"),  # dup of 1
    (5, "ein ganz anderer satz ueber etwas neues", "de"),
    (6, None, "fr"),  # all-NULL-text language must still appear
]
ROWS3 = [
    (7, "pack my box with five dozen liquor jugs", "de"),  # cross-lang dup of 2
]


def _write_batch(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
            }
        ),
        path,
    )


def _full_recompute(spark, rows):
    from python_etl_pipeline_spark.llm.datacard import (
        datacard_base,
        datacard_from_states,
        dup_state,
        hist_state,
        lang_state,
    )

    df = spark.createDataFrame(rows, SCHEMA)
    base = datacard_base(df)
    return datacard_from_states(lang_state(base), hist_state(base), dup_state(base))


def _card(df):
    return {r["lang"]: r.asDict() for r in df.collect()}


def test_stream_datacard_matches_full_recompute(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(str(src / "b1.parquet"), ROWS1)
    _write_batch(str(src / "b2.parquet"), ROWS2)
    stream_datacard_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    got = _card(datacard_from_state_dir(spark, state_dir))
    want = _card(_full_recompute(spark, ROWS1 + ROWS2))
    assert got == want
    assert got["en"]["dup_rate"] > 0  # doc 4 is an exact dup of doc 1
    assert "fr" in got and got["fr"]["median_tokens"] is None

    # exactly-once: re-running over the same source with the same
    # checkpoint ingests nothing new and changes no number
    stream_datacard_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    assert _card(datacard_from_state_dir(spark, state_dir)) == want

    # incremental fold: a third arrival updates the card to the new
    # full recompute — including a CROSS-BATCH, cross-language dup
    # (doc 7 repeats doc 2's text, so it counts as de-language dup)
    _write_batch(str(src / "b3.parquet"), ROWS3)
    stream_datacard_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    got3 = _card(datacard_from_state_dir(spark, state_dir))
    want3 = _card(_full_recompute(spark, ROWS1 + ROWS2 + ROWS3))
    assert got3 == want3
    assert got3["de"]["dup_rate"] > 0


def test_compaction_changes_no_number_and_future_batches_fold(spark, tmp_path):
    """compact_datacard_state folds the batch log into one partition
    per state: the derived card must be bit-identical before/after, the
    per-state partition count must drop to 1, and batches arriving
    AFTER compaction must keep folding correctly."""
    import glob

    from python_etl_pipeline_spark.streaming.file_stream import (
        compact_datacard_state,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(str(src / "b1.parquet"), ROWS1)
    _write_batch(str(src / "b2.parquet"), ROWS2)
    stream_datacard_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    before = _card(datacard_from_state_dir(spark, state_dir))

    compact_datacard_state(spark, state_dir)
    assert _card(datacard_from_state_dir(spark, state_dir)) == before
    for name in ("lang", "hist", "dup"):
        parts = glob.glob(f"{state_dir}/{name}/batch_id=*")
        assert len(parts) == 1, parts

    # post-compaction arrivals fold against the compacted state
    _write_batch(str(src / "b3.parquet"), ROWS3)
    stream_datacard_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    got = _card(datacard_from_state_dir(spark, state_dir))
    assert got == _card(_full_recompute(spark, ROWS1 + ROWS2 + ROWS3))


def test_datacard_batch_writer_idempotent_on_redelivery(spark, tmp_path):
    """foreachBatch may re-run a batch after a crash: re-invoking the
    step with the same batch_id must overwrite, not double-count."""
    state_dir = str(tmp_path / "state")
    step = datacard_batch_writer(spark, state_dir)
    b1 = spark.createDataFrame(ROWS1, SCHEMA)
    step(b1, 0)
    once = _card(datacard_from_state_dir(spark, state_dir))
    step(b1, 0)  # crash re-delivery of the SAME batch
    assert _card(datacard_from_state_dir(spark, state_dir)) == once
    step(spark.createDataFrame(ROWS2, SCHEMA), 1)
    assert _card(datacard_from_state_dir(spark, state_dir)) == _card(
        _full_recompute(spark, ROWS1 + ROWS2)
    )


def test_swap_compacted_failed_rename_preserves_trash(spark, tmp_path):
    """The compaction swap's crash contract: Hadoop FileSystem.rename
    reports failure as a FALSE RETURN, and a failed promote (staging ->
    root) must raise with the pre-compaction copy intact at root.trash
    — the unconditional trash delete of the old code would have
    destroyed the only surviving copy of the state."""
    import pytest

    from python_etl_pipeline_spark.streaming.file_stream import _swap_compacted

    root = tmp_path / "state"
    root.mkdir()
    (root / "part-0.parquet").write_text("old state")
    # staging does not exist -> rename(staging, root) returns false
    with pytest.raises(IOError, match="intact"):
        _swap_compacted(spark, str(root), str(tmp_path / "missing_staging"))
    trash = tmp_path / "state.trash"
    assert trash.exists() and (trash / "part-0.parquet").read_text() == "old state"
