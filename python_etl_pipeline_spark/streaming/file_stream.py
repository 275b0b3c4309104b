"""Streaming file ingestion — the reference's scheduler + file-tracker
pair as one mechanism (SURVEY.md §2.10).

A file-source streaming query with ``Trigger.AvailableNow`` and a
checkpoint gives exactly-once-per-file ingestion (I1) plus batch-cadence
execution (the scheduler's daily/twice-daily loop, main.py:364-419)
without any bespoke tracker table: the checkpoint's file log IS the
tracker, and one-query-per-sink subsumes the overlap lock
(main.py:341-346).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    out_dir: str,
    checkpoint_dir: str,
    fmt: str = "csv",
    transform=None,
) -> None:
    """Ingest all currently-available files exactly once, then stop.

    Each invocation is one scheduled batch window; files already in the
    checkpoint file-log are skipped (idempotent re-delivery). ``transform``
    is an optional DataFrame -> DataFrame stage applied in-stream (the
    extract DAG: validate -> project -> cleanse -> dedup-per-batch).
    """
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).csv(src_dir)
    else:
        stream = reader.format(fmt).load(src_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
