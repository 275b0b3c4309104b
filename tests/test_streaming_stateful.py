"""Streaming windowed aggregation (watermark) and custom stateful
operator (applyInPandasWithState) driven end-to-end with memory sinks."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_etl_pipeline_spark.operators.aggregate import salted_agg
from python_etl_pipeline_spark.streaming import (
    windowed_event_counts,
    running_user_totals,
)

EVENT_SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
])


def _write_events_parquet(spark, path):
    rows = [
        ("2024-01-01 00:05:00", 1, "click", 1.0),
        ("2024-01-01 00:20:00", 1, "click", 2.0),
        ("2024-01-01 00:40:00", 2, "view", 3.0),
        ("2024-01-01 01:10:00", 1, "click", 4.0),
        ("2024-01-01 01:30:00", 2, "view", 5.0),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in rows],
        ["ts_s", "user_id", "event_type", "value"],
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "event_type", "value"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_windowed_stream_agg(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events_parquet(spark, src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = windowed_event_counts(stream, watermark="10 minutes", window="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode emits only watermark-closed windows; with a single batch
    # the final window stays open, so expect the 00:00 window rows only
    rows = {(r["window_start"].isoformat(), r["event_type"]): r
            for r in spark.sql("SELECT * FROM win_out").collect()}
    assert rows[("2024-01-01T00:00:00", "click")]["n_events"] == 2
    assert rows[("2024-01-01T00:00:00", "view")]["n_events"] == 1


def test_stateful_running_totals(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events_parquet(spark, src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["user_id"]: r for r in spark.sql(
        "SELECT * FROM state_out ORDER BY user_id").collect()}
    assert rows[1]["n_events"] == 3 and rows[1]["total_value"] == 7.0
    assert rows[2]["n_events"] == 2 and rows[2]["total_value"] == 8.0


def test_stream_stream_interval_join(spark, tmp_path):
    from python_etl_pipeline_spark.streaming import stream_stream_interval_join

    src = str(tmp_path / "events")
    _write_events_parquet(spark, src)
    schema = spark.read.parquet(src).schema
    purchases = (
        spark.readStream.schema(schema).parquet(src)
        .filter(F.col("event_type") == "click")
    )
    views = (
        spark.readStream.schema(schema).parquet(src)
        .filter(F.col("event_type") == "view")
    )
    # user 1 clicks at 00:05/00:20/01:10; user 2 views at 00:40/01:30 —
    # join clicks to themselves would be trivial; join clicks(left) with
    # clicks-as-right to exercise interval matching: use same-user pairs.
    joined = stream_stream_interval_join(
        purchases, purchases, key="user_id", within="30 minutes",
        watermark="10 minutes",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory").queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r["left_ts"].isoformat(), r["right_ts"].isoformat())
            for r in spark.sql("SELECT * FROM ssj_out").collect()}
    # self-pairs always match; 00:20 matches prior 00:05 (15 min back);
    # 01:10 matches neither (50 min gap)
    assert ("2024-01-01T00:20:00", "2024-01-01T00:05:00") in rows
    assert ("2024-01-01T00:05:00", "2024-01-01T00:05:00") in rows
    assert ("2024-01-01T01:10:00", "2024-01-01T00:20:00") not in rows


def test_stream_dedup_within_watermark(spark, tmp_path):
    from python_etl_pipeline_spark.streaming import stream_dedup_within_watermark

    src = str(tmp_path / "dup_events")
    rows = [
        ("2024-01-01 00:05:00", 1, "click", 1.0),
        ("2024-01-01 00:05:00", 1, "click", 1.0),  # exact redelivery
        ("2024-01-01 00:06:00", 1, "click", 2.0),
        ("2024-01-01 00:06:00", 1, "click", 2.0),
        ("2024-01-01 00:40:00", 2, "view", 3.0),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "user_id", "event_type", "value"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "event_type", "value"
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    deduped = stream_dedup_within_watermark(
        stream, ["user_id", "ts"], watermark="10 minutes"
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT user_id, ts FROM dedup_out").collect()
    assert len(got) == 3  # 5 rows, 2 redeliveries dropped, state bounded by watermark
    assert len({(r["user_id"], r["ts"]) for r in got}) == 3


def test_salted_agg_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    salted = salted_agg(
        orders, ["o_orderpriority"],
        {"o_totalprice": "sum", "o_orderkey": "count"}, n_salts=8,
    )
    plain = orders.groupBy("o_orderpriority").agg(
        F.sum("o_totalprice").alias("sum_o_totalprice"),
        F.count("o_orderkey").alias("count_o_orderkey"),
    )
    s = {r["o_orderpriority"]: r for r in salted.collect()}
    p = {r["o_orderpriority"]: r for r in plain.collect()}
    assert set(s) == set(p)
    for k in p:
        assert s[k]["count_o_orderkey"] == p[k]["count_o_orderkey"]
        assert abs(s[k]["sum_o_totalprice"] - p[k]["sum_o_totalprice"]) < 1e-6


def test_stream_document_curation(spark, tmp_path):
    """Streaming score->filter->dedup must equal its batch equivalent."""
    from python_etl_pipeline_spark.llm.text import quality_score
    from python_etl_pipeline_spark.streaming import stream_document_curation

    src = str(tmp_path / "doc_stream")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with_ts = docs.select(
        "doc_id", "text", F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ingest_ts")
    )
    # inject exact duplicates: re-deliver the first 5 docs with new ids
    dup = with_ts.orderBy("doc_id").limit(5).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    with_ts.unionByName(dup).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    curated = stream_document_curation(stream, min_quality=0.3)
    q = (
        curated.writeStream.outputMode("append")
        .format("memory").queryName("curated_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_cur"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT content_hash, quality FROM curated_out")

    batch = (
        spark.read.parquet(src)
        .select("text", quality_score("text").alias("quality"), F.md5("text").alias("content_hash"))
        .filter(F.col("quality") >= 0.3)
        .dropDuplicates(["content_hash"])
    )
    assert got.count() == batch.count()
    assert got.count() == got.select("content_hash").distinct().count()
    assert got.filter(F.col("quality") < 0.3).count() == 0
