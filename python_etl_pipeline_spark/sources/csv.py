"""CSV source — tier-1 all-string scan (SURVEY.md §2.1 S1–S3).

Reproduces the reference's read contract (src/extract.py:377, :430):
header row, every column StringType (``dtype=str``), empty strings
preserved (``keep_default_na=False``), quoted fields with embedded
commas handled. The reference's chunked-read path for >10 MB files
(S2, src/extract.py:359-425) is unnecessary — Spark partitions file
scans natively — and its per-entity glob (S3) is the path argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# a value no real CSV field contains: keeps Spark's null-coercion away
# from genuine data so we can reproduce pandas' keep_default_na=False
_NULL_SENTINEL = "@@NULL@@"


def read_csv_all_string(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str] | None = None,
) -> DataFrame:
    """Read CSV(s) with an all-string schema; no type inference.

    Matches ``pd.read_csv(dtype=str, keep_default_na=False)``: every
    column is a string and missing/empty fields are '' (never NULL) —
    null-sentinel normalization (P3) is a separate, explicit operator.
    """
    reader = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("nullValue", _NULL_SENTINEL)
        .option("emptyValue", "")
    )
    if columns is not None:
        schema = T.StructType([T.StructField(c, T.StringType(), True) for c in columns])
        df = reader.schema(schema).csv(path)
    else:
        raw = reader.csv(path)
        df = raw.select(*[raw[c].cast("string").alias(c) for c in raw.columns])
    # unquoted empty fields surface as NULL from the univocity parser even
    # with a sentinel nullValue; pandas keep_default_na=False yields ''.
    return df.select(*[F.coalesce(df[c], F.lit("")).alias(c) for c in df.columns])


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str],
) -> tuple[DataFrame, DataFrame]:
    """All-string CSV read that splits malformed rows into a quarantine
    channel instead of silently null-padding them (the distributed form
    of the reference's per-row try/except logging, src/logger.py usage
    in extract.py — bad rows must be *visible*, not dropped).

    Returns ``(good, quarantined)``: ``good`` has the declared columns;
    ``quarantined`` carries the raw malformed line plus its source file
    for audit. Uses Spark's ``columnNameOfCorruptRecord`` channel — rows
    whose field count/quoting breaks the schema land whole in the
    corrupt column. Both outputs are lazy projections of ONE scan, so at
    100 TB the file is read once and the quarantine rate costs nothing
    extra; the quarantine sink is append-only and tiny by assumption
    (alert when it isn't).
    """
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in columns]
        + [T.StructField("_corrupt", T.StringType(), True)]
    )
    raw = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("nullValue", _NULL_SENTINEL)
        .option("emptyValue", "")
        .schema(schema)
        .csv(path)
    )
    # input_file_name() must bind before the cache boundary (a cached
    # plan no longer carries file-scan context); caching the split point
    # avoids re-parsing when both legs are acted on, and Spark requires
    # it anyway to observe _corrupt (SPARK-38523).
    raw = raw.withColumn("_src_file", F.input_file_name()).cache()
    bad = raw.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line"),
        F.col("_src_file").alias("source_file"),
    )
    good = raw.filter(F.col("_corrupt").isNull()).drop("_corrupt", "_src_file")
    good = good.select(
        *[F.coalesce(good[c], F.lit("")).alias(c) for c in good.columns]
    )
    return good, bad
