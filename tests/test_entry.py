"""Driver-contract smoke tests: entry() produces rows; every oracle SQL
actually runs on DuckDB; registry wiring is consistent."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_registry_consistency():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 30
    assert set(o).issubset(set(q))


def test_oracle_sql_runs_on_duckdb(sf_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, sql in entrymod.oracle_sql().items():
        con.execute(sql).fetchall()


def test_bench_headline_names_are_registered():
    """bench.py is the driver's perf gate: a renamed query must fail CI
    here, not silently drop out of the headline set at bench time."""
    import bench
    from python_etl_pipeline_spark.queries import REGISTRY

    missing = [
        n for n in bench.HEADLINE + bench.CONTRACT if n not in REGISTRY
    ]
    assert not missing, missing
    dupes = set(bench.HEADLINE) & set(bench.CONTRACT)
    assert not dupes, f"queries in both HEADLINE and CONTRACT: {dupes}"
