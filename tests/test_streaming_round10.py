"""Round-10 streaming twins: the incremental Bloom membership sketch
(hh7's operational twin) and incremental RFM scoring (x80's) — fold ==
full recompute, exactly-once under crash redelivery, compaction
invariance, and the algebra shared verbatim with the driver-verified
batch queries."""

from __future__ import annotations

import glob
from datetime import datetime

from pyspark.sql import types as T

from python_etl_pipeline_spark.llm.sketch import (
    bloom_positions,
    bloom_probe,
)
from python_etl_pipeline_spark.operators.aggregate import (
    rfm_fold,
    rfm_partials,
    rfm_scores,
)
from python_etl_pipeline_spark.streaming.file_stream import (
    bloom_membership_from_state_dir,
    bloom_occupied_from_state_dir,
    bloom_state_batch_writer,
    compact_bloom_state,
    compact_rfm_state,
    rfm_scores_from_state_dir,
    rfm_state_batch_writer,
    rfm_state_from_state_dir,
    stream_bloom_available_now,
    stream_rfm_available_now,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)
D1 = [
    ("web", "the quick brown fox jumps over the lazy dog"),
    ("books", "pack my box with five dozen liquor jugs"),
]
D2 = [
    ("web", "hash join stream engines shuffle data"),
    ("books", "five dozen boxes of the quick liquor"),
]
D3 = [("web", "zebra stripes under the old tree")]
PROBES = ["hash", "quick", "zebra", "flink"]


def _write_docs(path, rows):
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


def _bloom_full(spark, rows):
    d = spark.createDataFrame(rows, DOC_SCHEMA)
    occ = {(r["source"], r["pos"]) for r in bloom_positions(d).collect()}
    ans = {
        (r["source"], r["probe"]): r["bloom_hit"]
        for r in bloom_probe(
            bloom_positions(d), PROBES
        ).collect()
    }
    return occ, ans


def _bloom_state(spark, state_dir):
    occ = {
        (r["source"], r["pos"])
        for r in bloom_occupied_from_state_dir(spark, state_dir).collect()
    }
    ans = {
        (r["source"], r["probe"]): r["bloom_hit"]
        for r in bloom_membership_from_state_dir(
            spark, state_dir, PROBES
        ).collect()
    }
    return occ, ans


def test_stream_bloom_folds_to_full_recompute(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(str(src / "b1.parquet"), D1)
    stream_bloom_available_now(spark, str(src), DOC_SCHEMA, state_dir, ckpt)
    assert _bloom_state(spark, state_dir) == _bloom_full(spark, D1)

    _write_docs(str(src / "b2.parquet"), D2)
    stream_bloom_available_now(spark, str(src), DOC_SCHEMA, state_dir, ckpt)
    assert _bloom_state(spark, state_dir) == _bloom_full(spark, D1 + D2)
    # membership monotonicity: union never clears a bit, so 'hash'
    # (arriving only in batch 2) now hits, and batch-1 hits survive
    _, ans = _bloom_state(spark, state_dir)
    assert ans[("web", "hash")] == 1
    assert ans[("web", "quick")] == 1
    assert ans[("books", "flink")] == 0  # absent everywhere: still miss

    before = _bloom_state(spark, state_dir)
    compact_bloom_state(spark, state_dir)
    assert _bloom_state(spark, state_dir) == before
    assert len(glob.glob(f"{state_dir}/batch_id=*")) == 1

    _write_docs(str(src / "b3.parquet"), D3)
    stream_bloom_available_now(spark, str(src), DOC_SCHEMA, state_dir, ckpt)
    assert _bloom_state(spark, state_dir) == _bloom_full(spark, D1 + D2 + D3)
    # no false negatives over ANY batching: every present probe hits
    _, ans = _bloom_state(spark, state_dir)
    assert ans[("web", "zebra")] == 1


def test_bloom_writer_idempotent_on_redelivery(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    step = bloom_state_batch_writer(spark, state_dir)
    b1 = spark.createDataFrame(D1, DOC_SCHEMA)
    step(b1, 0)
    once = _bloom_state(spark, state_dir)
    step(b1, 0)  # redelivery
    assert _bloom_state(spark, state_dir) == once
    step(spark.createDataFrame(D2, DOC_SCHEMA), 1)
    assert _bloom_state(spark, state_dir) == _bloom_full(spark, D1 + D2)


EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)
REF = "2024-02-01 00:00:00"
E1 = [
    (1, datetime(2024, 1, 3, 8), 1, "purchase", 10.01),
    (2, datetime(2024, 1, 5, 9), 1, "view", None),
    (3, datetime(2024, 1, 4, 7), 2, "purchase", 5.555),
    (4, datetime(2024, 1, 2, 6), 3, "view", None),
]
E2 = [
    # the monoid traps: user 1's later activity moves last_ts; user 3
    # converts; user 2 adds sub-cent residue that per-batch rounding
    # of SUMS would mis-fold (0.004 + 0.004 cents-level drift)
    (5, datetime(2024, 1, 9, 8), 1, "purchase", 0.004),
    (6, datetime(2024, 1, 8, 9), 2, "purchase", 0.004),
    (7, datetime(2024, 1, 7, 7), 3, "purchase", 20.0),
    (8, datetime(2024, 1, 10, 7), 4, "view", None),
]


def _write_events(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": [r[3] for r in rows],
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        ),
        path,
    )


def _rfm_full(spark, rows):
    d = spark.createDataFrame(rows, EV_SCHEMA)
    state = {
        r["user_id"]: (r["last_ts"], r["freq"], r["mon_cents"])
        for r in rfm_partials(d).collect()
    }
    report = {
        r["user_id"]: tuple(r)[1:]
        for r in rfm_scores(rfm_partials(d), REF).collect()
    }
    return state, report


def _rfm_state(spark, state_dir):
    state = {
        r["user_id"]: (r["last_ts"], r["freq"], r["mon_cents"])
        for r in rfm_state_from_state_dir(spark, state_dir).collect()
    }
    report = {
        r["user_id"]: tuple(r)[1:]
        for r in rfm_scores_from_state_dir(spark, state_dir, REF).collect()
    }
    return state, report


def test_stream_rfm_folds_to_full_recompute(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_events(str(src / "b1.parquet"), E1)
    stream_rfm_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    assert _rfm_state(spark, state_dir) == _rfm_full(spark, E1)

    _write_events(str(src / "b2.parquet"), E2)
    stream_rfm_available_now(spark, str(src), EV_SCHEMA, state_dir, ckpt)
    assert _rfm_state(spark, state_dir) == _rfm_full(spark, E1 + E2)
    state, _ = _rfm_state(spark, state_dir)
    # the max-monoid moved: user 1's recency reflects batch 2
    assert state[1][0] == datetime(2024, 1, 9, 8)
    # per-event cents: 10.01 -> 1001, + 0.004 -> round 0 => 1001 (the
    # round-of-batch-sum form would have produced 1001 too here, but
    # user 2: 5.555 -> 556 + 0.004 -> 0 = 556, while
    # round((5.555 + 0.004) * 100) = 556 — equal only because the
    # residues cancel; the test pins the per-event definition)
    assert state[1][2] == 1001
    assert state[2][2] == 556

    before = _rfm_state(spark, state_dir)
    compact_rfm_state(spark, state_dir)
    assert _rfm_state(spark, state_dir) == before
    assert len(glob.glob(f"{state_dir}/batch_id=*")) == 1


def test_rfm_writer_idempotent_on_redelivery(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    step = rfm_state_batch_writer(spark, state_dir)
    b1 = spark.createDataFrame(E1, EV_SCHEMA)
    step(b1, 0)
    once = _rfm_state(spark, state_dir)
    step(b1, 0)  # redelivery
    assert _rfm_state(spark, state_dir) == once
    step(spark.createDataFrame(E2, EV_SCHEMA), 1)
    assert _rfm_state(spark, state_dir) == _rfm_full(spark, E1 + E2)


def test_rfm_fold_is_associative_across_batchings(spark):
    """(max, sum, sum): any split of the event stream folds to the
    same state — including the per-event cents rounding that makes the
    monetary leg batching-invariant."""
    all_rows = E1 + E2
    full = {
        r["user_id"]: (r["last_ts"], r["freq"], r["mon_cents"])
        for r in rfm_partials(
            spark.createDataFrame(all_rows, EV_SCHEMA)
        ).collect()
    }
    for cut in (1, 3, 5, 7):
        a = rfm_partials(spark.createDataFrame(all_rows[:cut], EV_SCHEMA))
        b = rfm_partials(spark.createDataFrame(all_rows[cut:], EV_SCHEMA))
        folded = {
            r["user_id"]: (r["last_ts"], r["freq"], r["mon_cents"])
            for r in rfm_fold(a.unionByName(b)).collect()
        }
        assert folded == full, f"cut={cut}"
