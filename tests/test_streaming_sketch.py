"""Streaming incremental Count-Min sketch (stream_countmin_available_now):
the sketch folded from the persisted state log must equal the one-pass
sketch over everything ingested so far, stay exactly-once under crash
redelivery, and survive compaction unchanged — hh2's operational twin
(the same llm.sketch algebra the driver hash-verifies against hh1's
DuckDB oracle)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_etl_pipeline_spark.llm.sketch import countmin_build
from python_etl_pipeline_spark.llm.text import tokens
from python_etl_pipeline_spark.streaming.file_stream import (
    compact_countmin_state,
    countmin_from_state_dir,
    countmin_state_batch_writer,
    stream_countmin_available_now,
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


def _cells(df):
    return {(r["j"], r["b"]): r["cnt"] for r in df.collect()}


def _full_sketch(spark, rows):
    d = spark.createDataFrame(rows, SCHEMA)
    counts = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _cells(countmin_build(counts))


def _write_batch(path, rows):
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


def test_stream_countmin_folds_to_full_recompute(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(str(src / "b1.parquet"), ROWS1)
    stream_countmin_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    assert _cells(countmin_from_state_dir(spark, state_dir)) == _full_sketch(
        spark, ROWS1
    )

    # new arrivals fold in; already-ingested files are not re-counted
    _write_batch(str(src / "b2.parquet"), ROWS2)
    stream_countmin_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    assert _cells(countmin_from_state_dir(spark, state_dir)) == _full_sketch(
        spark, ROWS1 + ROWS2
    )

    # compaction folds the log to one partition without changing cells
    before = _cells(countmin_from_state_dir(spark, state_dir))
    compact_countmin_state(spark, state_dir)
    assert _cells(countmin_from_state_dir(spark, state_dir)) == before
    assert len(glob.glob(f"{state_dir}/batch_id=*")) == 1

    # post-compaction arrivals keep folding correctly
    _write_batch(str(src / "b3.parquet"), ROWS3)
    stream_countmin_available_now(spark, str(src), SCHEMA, state_dir, ckpt)
    assert _cells(countmin_from_state_dir(spark, state_dir)) == _full_sketch(
        spark, ROWS1 + ROWS2 + ROWS3
    )


def test_countmin_writer_idempotent_on_redelivery(spark, tmp_path):
    """foreachBatch may re-run a batch after a crash: same batch_id
    must overwrite, never double-count."""
    state_dir = str(tmp_path / "state")
    step = countmin_state_batch_writer(spark, state_dir)
    b1 = spark.createDataFrame(ROWS1, SCHEMA)
    step(b1, 0)
    once = _cells(countmin_from_state_dir(spark, state_dir))
    step(b1, 0)  # redelivery
    assert _cells(countmin_from_state_dir(spark, state_dir)) == once
    step(spark.createDataFrame(ROWS2, SCHEMA), 1)
    assert _cells(countmin_from_state_dir(spark, state_dir)) == _full_sketch(
        spark, ROWS1 + ROWS2
    )


LC_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

LC1 = [
    ("web", "the quick brown fox jumps over the lazy dog"),
    ("books", "pack my box with five dozen liquor jugs"),
]
LC2 = [
    ("web", "the quick brown fox naps under the old tree"),
    ("books", "five dozen boxes of the quick liquor"),
]


def _bitmap(df):
    return {(r["source"], r["b"]) for r in df.collect()}


def _full_bitmap(spark, rows):
    from python_etl_pipeline_spark.llm.sketch import lc_hits

    return _bitmap(lc_hits(spark.createDataFrame(rows, LC_SCHEMA)))


def _write_lc_batch(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "source": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        ),
        path,
    )


def test_stream_lc_bitmap_folds_to_full_recompute(spark, tmp_path):
    from python_etl_pipeline_spark.llm.sketch import lc_estimate
    from python_etl_pipeline_spark.streaming.file_stream import (
        compact_lc_bitmap_state,
        lc_bitmap_from_state_dir,
        stream_lc_bitmap_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_lc_batch(str(src / "b1.parquet"), LC1)
    stream_lc_bitmap_available_now(spark, str(src), LC_SCHEMA, state_dir, ckpt)
    assert _bitmap(lc_bitmap_from_state_dir(spark, state_dir)) == _full_bitmap(
        spark, LC1
    )

    # overlapping arrivals union in (distinct semantics, not double-set)
    _write_lc_batch(str(src / "b2.parquet"), LC2)
    stream_lc_bitmap_available_now(spark, str(src), LC_SCHEMA, state_dir, ckpt)
    folded = lc_bitmap_from_state_dir(spark, state_dir)
    assert _bitmap(folded) == _full_bitmap(spark, LC1 + LC2)

    # the estimate derives from the folded bitmap alone
    ests = {r["source"]: r for r in lc_estimate(folded).collect()}
    assert set(ests) == {"web", "books"}
    for r in ests.values():
        assert r["n_est"] >= r["n_buckets"]  # ln form always >= hits

    # compaction folds the log without changing the bitmap
    before = _bitmap(lc_bitmap_from_state_dir(spark, state_dir))
    compact_lc_bitmap_state(spark, state_dir)
    assert _bitmap(lc_bitmap_from_state_dir(spark, state_dir)) == before


def test_lc_bitmap_writer_idempotent_on_redelivery(spark, tmp_path):
    from python_etl_pipeline_spark.streaming.file_stream import (
        lc_bitmap_batch_writer,
        lc_bitmap_from_state_dir,
    )

    state_dir = str(tmp_path / "state")
    step = lc_bitmap_batch_writer(spark, state_dir)
    b1 = spark.createDataFrame(LC1, LC_SCHEMA)
    step(b1, 0)
    once = _bitmap(lc_bitmap_from_state_dir(spark, state_dir))
    step(b1, 0)  # redelivery
    assert _bitmap(lc_bitmap_from_state_dir(spark, state_dir)) == once


def _regs(df):
    return {(r["source"], r["j"]): r["m_j"] for r in df.collect()}


def _full_regs(spark, rows):
    from python_etl_pipeline_spark.llm.sketch import hll_registers

    return _regs(hll_registers(spark.createDataFrame(rows, LC_SCHEMA)))


def test_stream_hll_registers_fold_to_full_recompute(spark, tmp_path):
    from python_etl_pipeline_spark.llm.sketch import HLL_M, hll_estimate
    from python_etl_pipeline_spark.streaming.file_stream import (
        compact_hll_register_state,
        hll_registers_from_state_dir,
        stream_hll_registers_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_lc_batch(str(src / "b1.parquet"), LC1)
    stream_hll_registers_available_now(
        spark, str(src), LC_SCHEMA, state_dir, ckpt
    )
    assert _regs(
        hll_registers_from_state_dir(spark, state_dir)
    ) == _full_regs(spark, LC1)

    # overlapping arrivals merge by MAX (never double-count, never lose)
    _write_lc_batch(str(src / "b2.parquet"), LC2)
    stream_hll_registers_available_now(
        spark, str(src), LC_SCHEMA, state_dir, ckpt
    )
    folded = hll_registers_from_state_dir(spark, state_dir)
    assert _regs(folded) == _full_regs(spark, LC1 + LC2)

    # the estimate derives from the folded registers alone
    ests = {r["source"]: r for r in hll_estimate(folded).collect()}
    assert set(ests) == {"web", "books"}
    for r in ests.values():
        assert 0 < r["n_registers"] <= HLL_M
        assert r["n_est"] > 0

    # compaction folds the log without changing the registers
    before = _regs(hll_registers_from_state_dir(spark, state_dir))
    compact_hll_register_state(spark, state_dir)
    assert _regs(hll_registers_from_state_dir(spark, state_dir)) == before


def test_hll_register_writer_idempotent_on_redelivery(spark, tmp_path):
    from python_etl_pipeline_spark.streaming.file_stream import (
        hll_register_batch_writer,
        hll_registers_from_state_dir,
    )

    state_dir = str(tmp_path / "state")
    step = hll_register_batch_writer(spark, state_dir)
    b1 = spark.createDataFrame(LC1, LC_SCHEMA)
    step(b1, 0)
    once = _regs(hll_registers_from_state_dir(spark, state_dir))
    step(b1, 0)  # redelivery
    assert _regs(hll_registers_from_state_dir(spark, state_dir)) == once


def test_stream_token_dist_drift_report(spark, tmp_path):
    import math

    from python_etl_pipeline_spark.streaming.file_stream import (
        js_drift_report,
        stream_token_dist_available_now,
        token_dist_from_state_dir,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_lc_batch(str(src / "b1.parquet"), LC1)
    stream_token_dist_available_now(
        spark, str(src), LC_SCHEMA, state_dir, ckpt
    )
    _write_lc_batch(str(src / "b2.parquet"), LC2)
    stream_token_dist_available_now(
        spark, str(src), LC_SCHEMA, state_dir, ckpt
    )

    # the folded state equals a from-scratch count of the union
    folded = {
        (r["source"], r["tok"]): r["c"]
        for r in token_dist_from_state_dir(spark, state_dir).collect()
    }
    full: dict[tuple, int] = {}
    for s, text in LC1 + LC2:
        for t in text.split():
            full[(s, t)] = full.get((s, t), 0) + 1
    assert folded == full

    # drift of batch 1 vs history (= batch 0): bounded, both sides seen
    rep = {
        r["source"]: r
        for r in js_drift_report(spark, state_dir, batch_id=1).collect()
    }
    assert set(rep) == {"web", "books"}
    for r in rep.values():
        assert 0.0 < r["js_div"] <= math.log(2) + 1e-9
        assert r["n_hist_tokens"] > 0 and r["n_batch_tokens"] > 0


def test_token_dist_drift_identity_and_idempotency(spark, tmp_path):
    from python_etl_pipeline_spark.streaming.file_stream import (
        js_drift_report,
        token_dist_batch_writer,
        token_dist_from_state_dir,
    )

    state_dir = str(tmp_path / "state")
    step = token_dist_batch_writer(spark, state_dir)
    b = spark.createDataFrame(LC1, LC_SCHEMA)
    step(b, 0)
    once = {
        (r["source"], r["tok"]): r["c"]
        for r in token_dist_from_state_dir(spark, state_dir).collect()
    }
    step(b, 0)  # redelivery overwrites, never double-counts
    assert {
        (r["source"], r["tok"]): r["c"]
        for r in token_dist_from_state_dir(spark, state_dir).collect()
    } == once

    # identical batch vs identical history -> exactly zero drift
    step(b, 1)
    rep = js_drift_report(spark, state_dir, batch_id=1).collect()
    assert rep and all(r["js_div"] == 0.0 for r in rep)


HIST_SCHEMA = "event_type string, value double"
H1 = [("click", 1.00), ("click", 2.50), ("view", 10.00), ("view", 200.00)]
H2 = [("click", 3.75), ("click", 150.00), ("view", 12.25)]


def _write_hist_batch(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_type": [r[0] for r in rows],
                "value": [r[1] for r in rows],
            }
        ),
        path,
    )


def _hist(df):
    return {(r["grp"], r["blen"], r["sub"]): r["c"] for r in df.collect()}


def test_stream_logbin_hist_folds_and_serves_quantiles(spark, tmp_path):
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.sketch import (
        logbin_histogram,
        logbin_quantiles,
    )
    from python_etl_pipeline_spark.streaming.file_stream import (
        logbin_hist_from_state_dir,
        stream_logbin_hist_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def full(rows):
        df = spark.createDataFrame(rows, HIST_SCHEMA)
        vals = df.select(
            F.col("event_type").alias("grp"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
        )
        return logbin_histogram(vals, "grp", "v")

    _write_hist_batch(str(src / "b1.parquet"), H1)
    stream_logbin_hist_available_now(
        spark, str(src), HIST_SCHEMA, state_dir, ckpt
    )
    assert _hist(logbin_hist_from_state_dir(spark, state_dir)) == _hist(
        full(H1)
    )

    _write_hist_batch(str(src / "b2.parquet"), H2)
    stream_logbin_hist_available_now(
        spark, str(src), HIST_SCHEMA, state_dir, ckpt
    )
    folded = logbin_hist_from_state_dir(spark, state_dir)
    assert _hist(folded) == _hist(full(H1 + H2))

    # quantiles read off the folded state; medians land inside the
    # per-key value range (scaled units = cents)
    est = {
        (r["grp"], r["q"]): r["est"]
        for r in logbin_quantiles(folded, (0.5,), "grp").collect()
    }
    assert set(g for g, _ in est) == {"click", "view"}
    assert 100 <= est[("click", 0.5)] <= 15000
    assert 1000 <= est[("view", 0.5)] <= 20000


RES_SCHEMA = "source string, doc_id long, n_chars long"
R1 = [("web", 1, 100), ("web", 2, 900), ("web", 3, 50), ("books", 10, 400)]
R2 = [("web", 4, 700), ("web", 5, 30), ("books", 11, 200), ("books", 12, 800)]


def _write_res_batch(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "source": [r[0] for r in rows],
                "doc_id": [r[1] for r in rows],
                "n_chars": [r[2] for r in rows],
            }
        ),
        path,
    )


def test_stream_reservoir_folds_to_full_recompute(spark, tmp_path):
    from pyspark.sql import Window

    from python_etl_pipeline_spark.llm.dedup import _hexint
    from python_etl_pipeline_spark.streaming.file_stream import (
        reservoir_from_state_dir,
        stream_reservoir_available_now,
    )

    K = 2
    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def full(rows):
        df = spark.createDataFrame(rows, RES_SCHEMA)
        u = (
            _hexint(
                F.md5(F.concat_ws("|", F.lit("ps"), F.col("doc_id"))), 8
            )
            + 0.5
        ) / F.lit(4294967296.0)
        scored = df.select(
            "source", "doc_id",
            F.round(F.log(u) / F.col("n_chars"), 8).alias("priority"),
        )
        wnd = Window.partitionBy("source").orderBy(
            F.col("priority").desc(), "doc_id"
        )
        return {
            (r["source"], r["doc_id"])
            for r in scored.withColumn("rk", F.row_number().over(wnd))
            .filter(F.col("rk") <= K)
            .collect()
        }

    _write_res_batch(str(src / "b1.parquet"), R1)
    stream_reservoir_available_now(
        spark, str(src), RES_SCHEMA, state_dir, ckpt, k=K
    )
    got = {
        (r["source"], r["doc_id"])
        for r in reservoir_from_state_dir(spark, state_dir, k=K).collect()
    }
    assert got == full(R1)

    _write_res_batch(str(src / "b2.parquet"), R2)
    stream_reservoir_available_now(
        spark, str(src), RES_SCHEMA, state_dir, ckpt, k=K
    )
    got = {
        (r["source"], r["doc_id"])
        for r in reservoir_from_state_dir(spark, state_dir, k=K).collect()
    }
    assert got == full(R1 + R2)  # fold == full recompute (merge property)


EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _write_events(path, rows):
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [datetime.datetime(2024, 1, r[1], r[2]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[3] for r in rows], pa.int64()),
                "event_type": [r[4] for r in rows],
            }
        ),
        path,
    )


# (event_id, day-of-month, hour, user_id, type)
EV1 = [
    (1, 1, 9, 10, "click"), (2, 1, 10, 11, "click"), (3, 1, 11, 10, "view"),
    (4, 2, 9, 12, "click"), (5, 2, 10, 13, "view"),
]
EV2 = [
    (6, 2, 11, 10, "click"), (7, 3, 9, 14, "click"), (8, 3, 10, 11, "click"),
    (9, 3, 11, 15, "view"), (10, 3, 12, 16, "view"),
]
EV3 = [(11, 4, 9, 17, "click"), (12, 4, 10, 10, "view")]


def _cusum_rows(df):
    return {
        (r["k"], r["day"]): (r["n"], r["cusum"], r["changepoint"])
        for r in df.collect()
    }


def _full_cusum(spark, rows):
    from python_etl_pipeline_spark.operators.aggregate import (
        cusum_over_daily,
        daily_counts,
    )

    d = spark.createDataFrame(
        [
            (
                r[0],
                __import__("datetime").datetime(2024, 1, r[1], r[2]),
                r[3],
                r[4],
            )
            for r in rows
        ],
        EV_SCHEMA,
    )
    return _cusum_rows(cusum_over_daily(daily_counts(d)))


def test_stream_cusum_folds_to_full_recompute(spark, tmp_path):
    from python_etl_pipeline_spark.streaming.file_stream import (
        compact_daily_counts_state,
        cusum_from_state_dir,
        stream_daily_cusum_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_events(str(src / "b1.parquet"), EV1)
    stream_daily_cusum_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    assert _cusum_rows(cusum_from_state_dir(spark, state_dir)) == _full_cusum(
        spark, EV1
    )

    _write_events(str(src / "b2.parquet"), EV2)
    stream_daily_cusum_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    assert _cusum_rows(cusum_from_state_dir(spark, state_dir)) == _full_cusum(
        spark, EV1 + EV2
    )

    before = _cusum_rows(cusum_from_state_dir(spark, state_dir))
    compact_daily_counts_state(spark, state_dir)
    assert _cusum_rows(cusum_from_state_dir(spark, state_dir)) == before
    assert len(glob.glob(f"{state_dir}/batch_id=*")) == 1

    _write_events(str(src / "b3.parquet"), EV3)
    stream_daily_cusum_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    assert _cusum_rows(cusum_from_state_dir(spark, state_dir)) == _full_cusum(
        spark, EV1 + EV2 + EV3
    )


def test_daily_counts_writer_idempotent_on_redelivery(spark, tmp_path):
    """foreachBatch may re-run a batch after a crash: re-invoking the
    writer with the SAME batch_id must leave the folded matrix
    unchanged (overwrite, not append)."""
    from python_etl_pipeline_spark.streaming.file_stream import (
        daily_counts_batch_writer,
        daily_counts_from_state_dir,
    )

    state_dir = str(tmp_path / "state")
    writer = daily_counts_batch_writer(spark, state_dir)
    import datetime

    def df(rows):
        return spark.createDataFrame(
            [
                (r[0], datetime.datetime(2024, 1, r[1], r[2]), r[3], r[4])
                for r in rows
            ],
            EV_SCHEMA,
        )

    writer(df(EV1), 0)
    writer(df(EV2), 1)
    once = {
        (r["k"], r["day"]): r["n"]
        for r in daily_counts_from_state_dir(spark, state_dir).collect()
    }
    writer(df(EV2), 1)  # redelivery
    again = {
        (r["k"], r["day"]): r["n"]
        for r in daily_counts_from_state_dir(spark, state_dir).collect()
    }
    assert once == again


def _kmv_fold(spark, rows):
    from python_etl_pipeline_spark.llm.sketch import (
        kmv_bottomk,
        kmv_estimate,
        kmv_hash,
    )

    import datetime

    d = spark.createDataFrame(
        [
            (r[0], datetime.datetime(2024, 1, r[1], r[2]), r[3], r[4])
            for r in rows
        ],
        EV_SCHEMA,
    )
    h = d.select(
        F.col("event_type").alias("k"), kmv_hash(F.col("user_id")).alias("hv")
    )
    return {
        (r["k"], r["hv"])
        for r in kmv_bottomk(h, ["k"]).collect()
    }, {
        r["k"]: (r["est"], r["nh"])
        for r in kmv_estimate(kmv_bottomk(h, ["k"]), ["k"]).collect()
    }


def test_stream_kmv_folds_to_full_recompute(spark, tmp_path):
    from python_etl_pipeline_spark.llm.sketch import kmv_estimate
    from python_etl_pipeline_spark.streaming.file_stream import (
        compact_kmv_state,
        kmv_from_state_dir,
        stream_kmv_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_events(str(src / "b1.parquet"), EV1)
    stream_kmv_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    sk, est = _kmv_fold(spark, EV1)
    assert {
        (r["k"], r["hv"]) for r in kmv_from_state_dir(spark, state_dir).collect()
    } == sk

    _write_events(str(src / "b2.parquet"), EV2)
    stream_kmv_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    sk2, est2 = _kmv_fold(spark, EV1 + EV2)
    folded = kmv_from_state_dir(spark, state_dir)
    assert {(r["k"], r["hv"]) for r in folded.collect()} == sk2
    assert {
        r["k"]: (r["est"], r["nh"])
        for r in kmv_estimate(folded, ["k"]).collect()
    } == est2

    before = {(r["k"], r["hv"]) for r in kmv_from_state_dir(spark, state_dir).collect()}
    compact_kmv_state(spark, state_dir)
    assert {
        (r["k"], r["hv"]) for r in kmv_from_state_dir(spark, state_dir).collect()
    } == before
    assert len(glob.glob(f"{state_dir}/batch_id=*")) == 1

    # the exact-regime contract: every audience here is < k, so the
    # estimate equals the true distinct count
    truth: dict[str, set] = {}
    for r in EV1 + EV2:
        truth.setdefault(r[4], set()).add(r[3])
    for k, (est_v, nh) in {
        r["k"]: (r["est"], r["nh"])
        for r in kmv_estimate(kmv_from_state_dir(spark, state_dir), ["k"]).collect()
    }.items():
        assert est_v == float(len(truth[k])) and nh == len(truth[k])


def test_ewma_served_from_cusum_state(spark, tmp_path):
    """One state log, two monitors: the EWMA smoother serves from the
    SAME persisted daily-count matrix the CUSUM twin maintains, and
    must equal the full-recompute EWMA over everything ingested."""
    from python_etl_pipeline_spark.operators.aggregate import (
        daily_counts,
        ewma_over_daily,
    )
    from python_etl_pipeline_spark.streaming.file_stream import (
        ewma_from_state_dir,
        stream_daily_cusum_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def _rows(df):
        return {
            (r["k"], r["day"]): (r["n"], r["ewma"]) for r in df.collect()
        }

    def _full(rows):
        import datetime

        d = spark.createDataFrame(
            [
                (r[0], datetime.datetime(2024, 1, r[1], r[2]), r[3], r[4])
                for r in rows
            ],
            EV_SCHEMA,
        )
        return _rows(ewma_over_daily(daily_counts(d), "k"))

    _write_events(str(src / "b1.parquet"), EV1)
    stream_daily_cusum_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    assert _rows(ewma_from_state_dir(spark, state_dir)) == _full(EV1)

    _write_events(str(src / "b2.parquet"), EV2)
    stream_daily_cusum_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    assert _rows(ewma_from_state_dir(spark, state_dir)) == _full(EV1 + EV2)
    # smoother sanity on the folded state: ewma tracks between the
    # series min and max per key
    got = _rows(ewma_from_state_dir(spark, state_dir))
    by_k: dict[str, list] = {}
    for (k, _), (n, _e) in got.items():
        by_k.setdefault(k, []).append(n)
    for (k, _), (_n, e) in got.items():
        assert min(by_k[k]) - 1e-9 <= e <= max(by_k[k]) + 1e-9


def test_rolling_hll_served_from_register_state(spark, tmp_path):
    """hh9's operational twin: per-batch daily HLL registers fold by
    max into exactly the registers a full pass would build, so the
    rolling estimate from state equals the full recompute; redelivery
    is idempotent; compaction preserves the serve."""
    import glob

    from python_etl_pipeline_spark.llm.sketch import (
        hll_value_registers,
        rolling_register_estimate,
    )
    from python_etl_pipeline_spark.streaming.file_stream import (
        compact_daily_hll_state,
        rolling_hll_from_state_dir,
        stream_daily_hll_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def _rows(df):
        return {
            (r["k"], r["out_day"]): r["n_est"] for r in df.collect()
        }

    def _full(rows):
        import datetime

        d = spark.createDataFrame(
            [
                (r[0], datetime.datetime(2024, 1, r[1], r[2]), r[3], r[4])
                for r in rows
            ],
            EV_SCHEMA,
        )
        uh = d.select(
            F.col("event_type").alias("k"),
            F.date_trunc("day", "ts").alias("day"),
            F.col("user_id").alias("id"),
        ).distinct()
        return _rows(
            rolling_register_estimate(
                hll_value_registers(uh, ["k", "day"], "id"), "k", "day"
            )
        )

    _write_events(str(src / "b1.parquet"), EV1)
    stream_daily_hll_available_now(
        spark, str(src), EV_SCHEMA, state_dir, ckpt
    )
    assert _rows(rolling_hll_from_state_dir(spark, state_dir)) == _full(EV1)

    _write_events(str(src / "b2.parquet"), EV2)
    stream_daily_hll_available_now(
        spark, str(src), EV_SCHEMA, state_dir, ckpt
    )
    want = _full(EV1 + EV2)
    assert _rows(rolling_hll_from_state_dir(spark, state_dir)) == want

    # redelivery idempotency: re-writing a batch partition by hand
    # (the foreachBatch overwrite contract) does not change the fold
    from python_etl_pipeline_spark.streaming.file_stream import (
        daily_hll_batch_writer,
    )
    import datetime

    b2 = spark.createDataFrame(
        [
            (r[0], datetime.datetime(2024, 1, r[1], r[2]), r[3], r[4])
            for r in EV2
        ],
        EV_SCHEMA,
    )
    daily_hll_batch_writer(spark, state_dir)(b2, 1)
    assert _rows(rolling_hll_from_state_dir(spark, state_dir)) == want

    # compaction invariance + single folded partition afterwards
    compact_daily_hll_state(spark, state_dir)
    assert _rows(rolling_hll_from_state_dir(spark, state_dir)) == want
    assert len(glob.glob(f"{state_dir}/batch_id=*")) == 1

    # small-cardinality regime: the linear-counting correction keeps
    # every estimate within 5% of the exact rolling distinct
    # (m*ln(m/(m-n)) ~ n + n^2/2m for n << m=256 — e.g. 3.02 for 3)
    import collections

    day_users = collections.defaultdict(set)
    for r in EV1 + EV2:
        day_users[(r[4], r[1])].add(r[3])
    got = _rows(rolling_hll_from_state_dir(spark, state_dir))
    for (k, day), est in got.items():
        exact = len(
            set().union(
                *(
                    day_users.get((k, d), set())
                    for d in range(day.day - 6, day.day + 1)
                )
            )
        )
        assert abs(est - exact) / max(exact, 1) < 0.05, (
            k, day, est, exact,
        )


def test_error_rate_served_from_cusum_state(spark, tmp_path):
    """One state log, THREE monitors: the Wilson error-rate report
    serves from the same persisted daily-count matrix as the CUSUM and
    EWMA twins, and equals the full recompute over everything
    ingested."""
    from python_etl_pipeline_spark.operators.aggregate import (
        daily_counts,
        wilson_error_rate_over_daily,
    )
    from python_etl_pipeline_spark.streaming.file_stream import (
        error_rate_from_state_dir,
        stream_daily_cusum_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def _rows(df):
        return {
            r["day"]: (
                r["n"], r["n_errors"], r["rate"],
                r["wilson_lo"], r["wilson_hi"], r["is_anomalous"],
            )
            for r in df.collect()
        }

    def _full(rows):
        import datetime

        d = spark.createDataFrame(
            [
                (r[0], datetime.datetime(2024, 1, r[1], r[2]), r[3], r[4])
                for r in rows
            ],
            EV_SCHEMA,
        )
        return _rows(wilson_error_rate_over_daily(daily_counts(d)))

    # include some 'error' events so the numerator is non-trivial
    EVE = [
        (21, 1, 12, 10, "error"), (22, 2, 12, 11, "error"),
        (23, 3, 13, 12, "error"), (24, 3, 14, 12, "error"),
    ]
    _write_events(str(src / "b1.parquet"), EV1 + EVE[:2])
    stream_daily_cusum_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    assert _rows(error_rate_from_state_dir(spark, state_dir)) == _full(
        EV1 + EVE[:2]
    )

    _write_events(str(src / "b2.parquet"), EV2 + EVE[2:])
    stream_daily_cusum_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    got = _rows(error_rate_from_state_dir(spark, state_dir))
    assert got == _full(EV1 + EV2 + EVE)
    # interval property holds on the served report too
    for _n, _e, rate, lo, hi, _a in got.values():
        assert lo - 1e-9 <= rate <= hi + 1e-9
