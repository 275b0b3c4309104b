"""JDBC source (SURVEY.md §2.1 S5) — partitioned parallel reads.

The reference paginates `SELECT ... ORDER BY pk LIMIT n OFFSET m` in a
driver loop (src/transform.py:150-168, batch=5000). Spark's JDBC source
does the same partitioning natively and in parallel: ``partitionColumn``
with bounds splits the table into ``numPartitions`` range predicates,
each read by its own task.

No JDBC driver jar ships in this environment, so ``.load()`` is left to
the caller; the function returns the fully-configured reader.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def jdbc_reader_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound,
    upper_bound,
    num_partitions: int = 8,
    fetch_size: int = 5000,
    properties: dict[str, str] | None = None,
):
    """Build a partitioned JDBC DataFrameReader (call ``.load()`` where a
    driver jar is on the classpath).

    ``fetch_size`` mirrors the reference's 5000-row fetch batches; the
    range partitioning replaces its LIMIT/OFFSET pagination with
    predicate pushdown per task.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader
