"""JDBC source (SURVEY.md §2.1 S5) — partitioned parallel reads.

The reference paginates `SELECT ... ORDER BY pk LIMIT n OFFSET m` in a
driver loop (src/transform.py:150-168, batch=5000). Spark's JDBC source
does the same partitioning natively and in parallel: ``partitionColumn``
with bounds splits the table into ``numPartitions`` range predicates,
each read by its own task — the LIMIT/OFFSET pagination becomes a WHERE
range predicate pushed to the database per task, so N tasks stream N
disjoint slices concurrently instead of one driver loop fetching pages
serially.

Exercised end-to-end against Apache Derby (embedded), whose jars ship
inside the Spark distribution — no external database needed. For a real
deployment the same reader works unchanged against Postgres/MySQL once
their driver jar is on the executor classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = True) -> str:
    """Embedded-Derby JDBC URL for a filesystem path.

    Derby embedded runs inside the JVM that opens it, which in Spark
    local mode is shared by driver and executors — so partitioned reads
    work. On a real cluster an embedded file DB is driver-only; use a
    server-mode URL (`jdbc:derby://host/db`) or a real RDBMS there.
    """
    return f"jdbc:derby:{db_path}" + (";create=true" if create else "")


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame to a JDBC table (reference load path
    src/load.py executemany-batches; Spark batches inserts per task)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


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
    """Build a partitioned JDBC DataFrameReader.

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
