"""Streaming operational twins of the round-8 incremental folds:
TF-IDF vocabulary state (tx20) and IVF assignment growth (ann12).
Each fold read back from its persisted state log must equal the
from-scratch recompute over everything ingested so far, and stay
exactly-once under crash redelivery."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

DOCS1 = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
]
DOCS2 = [
    (3, "the quick brown fox naps under the old tree"),
    (4, "five dozen boxes of the quick liquor"),
]


def _write_docs(path, rows):
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


def _df_counts(spark, rows):
    """From-scratch (term -> df, n_docs) over a row list."""
    from python_etl_pipeline_spark.llm.text import tokens

    d = spark.createDataFrame(rows, DOC_SCHEMA)
    tok = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    dfq = {
        r["term"]: r["df"]
        for r in tok.groupBy("doc_id", "term")
        .count()
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
        .collect()
    }
    return dfq, len(rows)


def test_stream_tfidf_state_folds_to_full_recompute(spark, tmp_path):
    from python_etl_pipeline_spark.streaming.file_stream import (
        stream_tfidf_state_available_now,
        tfidf_state_from_dir,
    )

    src = tmp_path / "src"
    src.mkdir()
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(str(src / "b1.parquet"), DOCS1)
    stream_tfidf_state_available_now(spark, str(src), DOC_SCHEMA, state_dir, ckpt)
    dfq, n = tfidf_state_from_dir(spark, state_dir)
    want_df, want_n = _df_counts(spark, DOCS1)
    assert {r["term"]: r["df"] for r in dfq.collect()} == want_df
    assert n.first()["n_docs"] == want_n

    # new arrivals fold in without re-reading ingested files
    _write_docs(str(src / "b2.parquet"), DOCS2)
    stream_tfidf_state_available_now(spark, str(src), DOC_SCHEMA, state_dir, ckpt)
    dfq, n = tfidf_state_from_dir(spark, state_dir)
    want_df, want_n = _df_counts(spark, DOCS1 + DOCS2)
    assert {r["term"]: r["df"] for r in dfq.collect()} == want_df
    assert n.first()["n_docs"] == want_n


def test_tfidf_state_writer_idempotent_on_redelivery(spark, tmp_path):
    from python_etl_pipeline_spark.streaming.file_stream import (
        tfidf_state_batch_writer,
        tfidf_state_from_dir,
    )

    state_dir = str(tmp_path / "state")
    step = tfidf_state_batch_writer(spark, state_dir)
    b1 = spark.createDataFrame(DOCS1, DOC_SCHEMA)
    step(b1, 0)
    dfq, n = tfidf_state_from_dir(spark, state_dir)
    once = ({r["term"]: r["df"] for r in dfq.collect()}, n.first()["n_docs"])
    step(b1, 0)  # crash re-delivery
    dfq, n = tfidf_state_from_dir(spark, state_dir)
    assert ({r["term"]: r["df"] for r in dfq.collect()}, n.first()["n_docs"]) == once


def test_stream_ivf_assign_grows_index_exactly(spark, tmp_path):
    """The streamed assignment log must equal a full re-assign of all
    streamed vectors against the frozen centroids, and redelivery must
    not double-assign."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from python_etl_pipeline_spark.llm.similarity import (
        ivf_incremental_assign,
        kmeans_fit,
    )
    from python_etl_pipeline_spark.streaming.file_stream import (
        ivf_assign_batch_writer,
        stream_ivf_assign_available_now,
    )

    rng = random.Random(31)
    vecs = [
        (i, [float(rng.gauss(0, 1)) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    base = df.filter("vec_id < 40")
    cent, assign0 = kmeans_fit(base, k=4, iters=2)
    cent_dir = str(tmp_path / "cent")
    assign_dir = str(tmp_path / "assign")
    cent.write.parquet(cent_dir)
    assign0.write.parquet(f"{assign_dir}/batch_id=-1")

    def _write_vecs(path, rows):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float32())
                    ),
                }
            ),
            path,
        )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    src = tmp_path / "vsrc"
    src.mkdir()
    _write_vecs(str(src / "d1.parquet"), vecs[40:50])
    stream_ivf_assign_available_now(
        spark, str(src), schema, cent_dir, assign_dir, str(tmp_path / "vckpt")
    )
    _write_vecs(str(src / "d2.parquet"), vecs[50:60])
    stream_ivf_assign_available_now(
        spark, str(src), schema, cent_dir, assign_dir, str(tmp_path / "vckpt")
    )

    grown = spark.read.parquet(assign_dir).drop("batch_id")
    assert grown.count() == 60
    cent_r = spark.read.parquet(cent_dir)
    full = {
        (r["vec_id"], r["cell"])
        for r in ivf_incremental_assign(df, cent_r).collect()
    }
    assert {(r["vec_id"], r["cell"]) for r in grown.collect()} == full

    # crash re-delivery of a batch overwrites, never duplicates
    step = ivf_assign_batch_writer(spark, cent_dir, assign_dir)
    step(df.filter("vec_id >= 50"), 1)
    again = spark.read.parquet(assign_dir).drop("batch_id")
    assert again.count() == 60
    assert {(r["vec_id"], r["cell"]) for r in again.collect()} == full
