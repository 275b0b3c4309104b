"""Streaming retractable-MV maintenance (stream_mv_state_available_now):
the view derived from the signed-state log must equal a sequential
Python replay of the CDC feed, stay exactly-once under crash
redelivery, and survive compaction unchanged — x46's operational twin
(the same plans.cdc_signed_partials algebra the driver hash-verifies
against a DuckDB oracle)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from python_etl_pipeline_spark.streaming.file_stream import (
    compact_mv_state,
    mv_from_state_dir,
    mv_state_batch_writer,
    stream_mv_state_available_now,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("old_val", T.DoubleType()),
        T.StructField("new_val", T.DoubleType()),
    ]
)

# base snapshot: a=2 rows (10+20), b=1 row (5)
BASE = [("a", 2, 30.0), ("b", 1, 5.0)]
# batch 1: insert c, update one a row 10 -> 12
B1 = [("c", "I", None, 7.0), ("a", "U", 10.0, 12.0)]
# batch 2: retract b entirely, delete one a row (the 20), insert a new a
B2 = [("b", "D", 5.0, None), ("a", "D", 20.0, None), ("a", "I", None, 3.0)]


def _replay(batches):
    """Sequential truth: multiset of row values per key."""
    state = {"a": [10.0, 20.0], "b": [5.0]}
    for rows in batches:
        for k, op, old, new in rows:
            vals = state.setdefault(k, [])
            if op == "I":
                vals.append(new)
            elif op == "D":
                vals.remove(old)
            else:
                vals.remove(old)
                vals.append(new)
    return {
        k: (len(v), round(sum(v), 6)) for k, v in state.items() if v
    }


def _mv(spark, state_dir):
    return {
        r["k"]: (r["n_rows"], round(r["sum_val"], 6))
        for r in mv_from_state_dir(spark, state_dir, ["k"]).collect()
    }


def _write_batch(path, rows):
    pq.write_table(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.string()),
                "op": pa.array([r[1] for r in rows], pa.string()),
                "old_val": pa.array([r[2] for r in rows], pa.float64()),
                "new_val": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        path,
    )


def _seed_base(spark, state_dir):
    spark.createDataFrame(
        BASE, "k string, n_rows long, sum_val double"
    ).write.mode("overwrite").parquet(f"{state_dir}/batch_id=-1")


def test_stream_mv_folds_to_sequential_replay(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _seed_base(spark, state_dir)
    _write_batch(str(src / "b1.parquet"), B1)
    stream_mv_state_available_now(
        spark, str(src), SCHEMA, state_dir, ckpt, ["k"]
    )
    assert _mv(spark, state_dir) == _replay([B1])

    _write_batch(str(src / "b2.parquet"), B2)
    stream_mv_state_available_now(
        spark, str(src), SCHEMA, state_dir, ckpt, ["k"]
    )
    # b fully retracted -> absent from the derived view
    assert _mv(spark, state_dir) == _replay([B1, B2])
    assert "b" not in _mv(spark, state_dir)


def test_mv_redelivery_is_idempotent(spark, tmp_path):
    """A crash-redelivered batch overwrites its own partition with
    identical content — folding twice equals folding once."""
    state_dir = str(tmp_path / "state")
    _seed_base(spark, state_dir)
    writer = mv_state_batch_writer(spark, state_dir, ["k"])
    batch = spark.createDataFrame(B1, SCHEMA)
    writer(batch, 0)
    once = _mv(spark, state_dir)
    writer(batch, 0)  # redelivery
    assert _mv(spark, state_dir) == once == _replay([B1])


def test_mv_compaction_preserves_view_and_drops_retracted(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    _seed_base(spark, state_dir)
    writer = mv_state_batch_writer(spark, state_dir, ["k"])
    writer(spark.createDataFrame(B1, SCHEMA), 0)
    writer(spark.createDataFrame(B2, SCHEMA), 1)
    before = _mv(spark, state_dir)

    compact_mv_state(spark, state_dir, ["k"])
    assert _mv(spark, state_dir) == before == _replay([B1, B2])
    # compaction physically removed the fully-retracted key's rows
    log = spark.read.parquet(state_dir)
    assert log.filter("k = 'b'").count() == 0
