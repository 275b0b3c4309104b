"""a-series streaming twins (r12 verdict #7): the TPC-H-shape
additive aggregates fold into the standing batch_id-keyed state-log
pattern. Pinned here: fold == full-recompute against the
driver-verified batch queries (a0, a11), and exactly-once redelivery
idempotency of the batch writers."""

from __future__ import annotations

import pyarrow.parquet as pq

from python_etl_pipeline_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _split_lineitem(spark, src_dir, n=3):
    """Write the sf0.001 lineitem rows as n parquet files (row-slice
    split) into src_dir — the arrival batches."""
    t = pq.read_table(f"{SF_DIR}/lineitem.parquet")
    step = (t.num_rows + n - 1) // n
    for i in range(n):
        pq.write_table(
            t.slice(i * step, step), str(src_dir / f"b{i}.parquet")
        )
    return spark.read.parquet(str(src_dir / "b0.parquet")).schema


def _rows(df, keys):
    return sorted(
        tuple(r[c] for c in df.columns) for r in df.collect()
    ) if keys is None else {
        tuple(r[k] for k in keys): tuple(r[c] for c in df.columns)
        for r in df.collect()
    }


def test_stream_pricing_summary_fold_equals_batch_a0(spark, tmp_path):
    from python_etl_pipeline_spark.streaming.file_stream import (
        pricing_summary_from_state_dir,
        stream_pricing_summary_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    schema = _split_lineitem(spark, src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    stream_pricing_summary_available_now(
        spark, str(src), schema, state, ckpt
    )
    got = _rows(
        pricing_summary_from_state_dir(spark, state),
        ("l_returnflag", "l_linestatus"),
    )
    want = _rows(
        REGISTRY["a0_pricing_summary"].spark(spark, SF_DIR),
        ("l_returnflag", "l_linestatus"),
    )
    assert got == want and len(want) >= 4


def test_stream_potential_revenue_fold_equals_batch_a11(spark, tmp_path):
    from python_etl_pipeline_spark.streaming.file_stream import (
        potential_revenue_from_state_dir,
        stream_potential_revenue_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    schema = _split_lineitem(spark, src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    stream_potential_revenue_available_now(
        spark, str(src), schema, state, ckpt
    )
    got = potential_revenue_from_state_dir(spark, state).collect()
    want = (
        REGISTRY["a11_forecast_revenue_change"]
        .spark(spark, SF_DIR)
        .collect()
    )
    assert len(got) == len(want) == 1
    assert got[0]["potential_revenue"] == want[0]["potential_revenue"]
    assert got[0]["potential_revenue"] is not None


def test_tpch_writers_idempotent_on_redelivery(spark, tmp_path):
    """foreachBatch may re-run a batch after a crash: re-delivering
    batch 0 must overwrite its own partition, leaving the fold
    unchanged (same contract as the sketch/datacard sinks)."""
    from python_etl_pipeline_spark.streaming.file_stream import (
        potential_revenue_batch_writer,
        potential_revenue_from_state_dir,
        pricing_summary_batch_writer,
        pricing_summary_from_state_dir,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    b0 = li.filter("l_orderkey % 2 = 0")
    b1 = li.filter("l_orderkey % 2 = 1")

    s1 = str(tmp_path / "s_a0")
    step = pricing_summary_batch_writer(spark, s1)
    step(b0, 0)
    step(b1, 1)
    before = _rows(
        pricing_summary_from_state_dir(spark, s1),
        ("l_returnflag", "l_linestatus"),
    )
    step(b0, 0)  # redelivery
    after = _rows(
        pricing_summary_from_state_dir(spark, s1),
        ("l_returnflag", "l_linestatus"),
    )
    assert before == after

    s2 = str(tmp_path / "s_a11")
    step2 = potential_revenue_batch_writer(spark, s2)
    step2(b0, 0)
    step2(b1, 1)
    before2 = potential_revenue_from_state_dir(spark, s2).collect()
    step2(b0, 0)  # redelivery
    after2 = potential_revenue_from_state_dir(spark, s2).collect()
    assert before2 == after2
