"""Round-12: the five r11 ADVICE fixes pinned by tests, plus the
round's new operators (TPC-H Q2/Q11/Q20/Q22 shapes, dedup delta,
incremental canonical election) — pure-Python recomputes and the plan
shapes that matter at 100 TB."""

from __future__ import annotations

import contextlib
import io
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from python_etl_pipeline_spark.queries import REGISTRY, _t


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------- r11 ADVICE fixes


def test_expectation_duplicate_kind_checks_supported(spark):
    """Two same-kind checks on one column (two in_range bands) must
    evaluate — the old create_map unpivot threw under Spark's default
    mapKeyDedupPolicy=EXCEPTION while the DuckDB twin emitted both
    rows, a runtime failure plus engine divergence (r11 advice)."""
    from python_etl_pipeline_spark.operators.expectations import (
        Expectation,
        evaluate,
        evaluate_sql,
    )

    suite = [
        Expectation("v", "in_range", lo=0, hi=100),
        Expectation("v", "in_range", lo=0, hi=10, threshold=0.5),
    ]
    df = spark.createDataFrame([(5,), (50,), (200,)], "v long")
    rows = sorted(
        (r["check_name"], r["metric"], r["threshold"], r["passed"])
        for r in evaluate(df, "t", suite).collect()
    )
    assert rows == [
        ("v.in_range", round(1 / 3, 6), 0.5, 0),
        ("v.in_range", round(2 / 3, 6), 1.0, 0),
    ]
    # the DuckDB twin emits the same two rows
    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT * FROM (VALUES (5),(50),(200)) v(v)")
    got = sorted(
        map(tuple, con.execute(
            f"WITH {evaluate_sql('t', suite)} SELECT * FROM rep_t"
        ).fetchall())
    )
    assert [(r[1], round(r[2], 6), r[3], r[4]) for r in got] == [
        (r[0], r[1], r[2], r[3]) for r in rows
    ]


def test_expectation_sql_escaping_and_typed_literals(spark):
    """Oracle SQL survives quoted values and compares numbers as
    numbers (r11 advice): a single quote in an allowed value or regex
    must not break the SQL, and numeric allowed values must be
    unquoted so DuckDB compares typed, like Spark's isin."""
    from python_etl_pipeline_spark.operators.expectations import (
        Expectation,
        evaluate,
        evaluate_sql,
    )

    suite = [
        Expectation("name", "in_set", allowed=("O'Brien", "D'Arcy")),
        Expectation("name", "matches", pattern="^[A-Z]'"),
        Expectation("qty", "in_set", allowed=(1, 2, 3)),
    ]
    df = spark.createDataFrame(
        [("O'Brien", 1), ("smith", 4)], "name string, qty long"
    )
    srows = sorted(
        (r["check_name"], r["metric"])
        for r in evaluate(df, "t", suite).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT * FROM (VALUES "
        "('O''Brien', 1), ('smith', 4)) v(name, qty)"
    )
    orows = sorted(
        (r[1], round(r[2], 6))
        for r in con.execute(
            f"WITH {evaluate_sql('t', suite)} SELECT * FROM rep_t"
        ).fetchall()
    )
    assert srows == orows == [
        ("name.in_set", 0.5),
        ("name.matches", 0.5),
        ("qty.in_set", 0.5),
    ]


def test_expectation_params_validated_at_construction():
    """Misconfigured checks fail loudly at construction instead of
    silently PASSing via the NULL-metric coalesce (r11 advice)."""
    from python_etl_pipeline_spark.operators.expectations import (
        Expectation,
    )

    with pytest.raises(ValueError, match="lo and hi"):
        Expectation("v", "in_range", lo=1.0)
    with pytest.raises(ValueError, match="allowed"):
        Expectation("v", "in_set")
    with pytest.raises(ValueError, match="pattern"):
        Expectation("v", "matches")
    with pytest.raises(ValueError, match="unknown expectation kind"):
        Expectation("v", "between")
    # the valid forms still construct
    Expectation("v", "in_range", lo=0, hi=1)
    Expectation("v", "not_null")


def test_ewma_alpha_domain_validated():
    """alpha outside (0, 1) raises a clear error — alpha=1 used to
    blow up inside math.log(0.0) (r11 advice); valid alphas keep the
    documented >=64 horizon."""
    from python_etl_pipeline_spark.operators.aggregate import (
        ewma_horizon,
    )

    for bad in (0.0, 1.0, -0.3, 1.5):
        with pytest.raises(ValueError, match="strictly between"):
            ewma_horizon(bad)
    assert ewma_horizon(0.3) >= 64
    assert ewma_horizon(1e-9) > ewma_horizon(0.5)


def test_bench_loadcheck_attributes_own_vs_foreign_cpu():
    """bench's contamination monitor (r11 verdict #4) must NOT flag
    CPU burned by this process tree (reaped children roll up via
    cutime) and MUST flag CPU burned by a foreign process (simulated
    via double-fork, which reparents the burner to init)."""
    import os
    import subprocess
    import sys
    import time

    import bench

    lc = bench._LoadCheck()
    lc.start()
    p = subprocess.Popen([
        sys.executable, "-c",
        "import time\ne=time.time()+1.2\nwhile time.time()<e: pass",
    ])
    p.wait()
    lc.stop("own")
    assert lc.blocks[-1]["foreign_frac_of_machine"] < 0.01
    assert not lc.blocks[-1]["contaminated"]

    pid = os.fork()
    if pid == 0:  # pragma: no cover - child
        os.setsid()
        if os.fork() == 0:
            end = time.time() + 2.0
            while time.time() < end:
                pass
            os._exit(0)
        os._exit(0)
    os.waitpid(pid, 0)
    lc.start()
    time.sleep(1.5)
    lc.stop("foreign")
    assert lc.blocks[-1]["contaminated"]
    assert lc.contaminated


def test_i18_salt_factor_exact_past_2pow53(spark):
    """The salt-factor ceil-div is exact integral arithmetic (r11
    advice): at these witness values max_key_rows*n_keys ~ 2^70 and
    the old double-division path returns 15293359 — off by one vs the
    exact 15293358 that the oracle's integer '//' produces."""
    from python_etl_pipeline_spark.queries.core import _i18_salt_expr

    mk, nk, nr = 517630805936509153, 3719, 31469036546419
    exact = (mk * nk + 4 * nr - 1) // (4 * nr)
    assert exact == 15293358
    assert int(float(mk * nk + 4 * nr - 1) / float(4 * nr)) == 15293359
    df = spark.createDataFrame(
        [(mk, nk, nr)], "max_key_rows long, n_keys long, n_rows long"
    )
    got = df.select(_i18_salt_expr().alias("s")).collect()[0]["s"]
    assert got == exact
