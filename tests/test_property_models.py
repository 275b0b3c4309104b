"""Model-based property tests for the two primitives everything else
leans on: the partition-offset sequence engine (w1/o1/o5/x32/x38) and
the discrete-quantile fold (all derived caps, x34, x37). Each is
checked against an executable Python model over randomized inputs with
heavy ties — the regime where a bucketing or cumulative-walk bug would
hide."""

from __future__ import annotations

import math
import random

from python_etl_pipeline_spark.llm.caps import discrete_quantiles
from python_etl_pipeline_spark.operators.sequence import with_global_sequence


def test_global_sequence_matches_sorted_model(spark):
    """seq must equal the 1-based rank in the total order (k, id) for a
    key distribution with massive ties (2000 rows, 31 distinct keys —
    every bucket boundary lands inside a tie run)."""
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 30)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, k long").repartition(8)
    out = with_global_sequence(df, ["k", "id"], name="seq").collect()
    expect = {
        rid: rank
        for rank, (rid, _) in enumerate(
            sorted(rows, key=lambda r: (r[1], r[0])), start=1
        )
    }
    assert {r["id"]: r["seq"] for r in out} == expect


def test_global_sequence_constant_key_single_bucket_degenerate(spark):
    """All-equal leading keys collapse every quantile boundary to one
    value: the engine must still emit a gap-free 1..N permutation via
    the tie-break column."""
    df = spark.createDataFrame([(i, 5) for i in range(500)], "id long, k long")
    out = with_global_sequence(df, ["k", "id"], name="seq").collect()
    assert sorted(r["seq"] for r in out) == list(range(1, 501))
    assert all(r["seq"] == r["id"] + 1 for r in out)


def test_discrete_quantiles_cardinality_guard(spark):
    """The packed-histogram fold is single-task on the distinct-value
    histogram; pointing it at a high-cardinality column must fail with
    an explicit message, not OOM silently."""
    import pytest

    df = spark.range(50).selectExpr("id as v")
    with pytest.raises(Exception, match="max_distinct"):
        discrete_quantiles(df, "v", [0.5], max_distinct=10).collect()
    # and just-under-the-cap inputs still compute
    row = discrete_quantiles(df, "v", [1.0], max_distinct=50).first()
    assert row["__q0"] == 49


def test_global_sequence_deterministic_across_runs(spark):
    """Cross-run determinism contract: re-running with_global_sequence
    on the SAME data yields the IDENTICAL id -> seq mapping, even
    though each run re-derives its quantile boundaries (approxQuantile
    is deterministic for a given input, and once collected the
    boundaries are frozen as literals — value-derived buckets cannot
    drift with AQE re-planning, partition order, or job retries).

    The contract is PER-SNAPSHOT: appending rows between runs re-derives
    boundaries AND shifts ranks of everything after the insertion point
    (any dense global sequence does), so sequences must never be used
    as durable cross-run identity — which is exactly why the I3
    incremental paths key on watermarks/anti-joins, not sequence
    numbers, and why I2's upsert keys on the natural PK."""
    rng = random.Random(13)
    rows = [(i, rng.randint(0, 30)) for i in range(1500)]
    df = spark.createDataFrame(rows, "id long, k long").repartition(8)
    first = {
        r["id"]: r["seq"]
        for r in with_global_sequence(df, ["k", "id"], name="seq").collect()
    }
    # second run: fresh plan over a differently-partitioned but
    # value-identical frame — boundary derivation and bucket counts
    # re-run from scratch
    df2 = spark.createDataFrame(rows, "id long, k long").repartition(3)
    second = {
        r["id"]: r["seq"]
        for r in with_global_sequence(df2, ["k", "id"], name="seq").collect()
    }
    assert first == second


def test_discrete_quantiles_match_sorted_model(spark):
    """q_p = min(v : cum_count >= ceil(p*n)) == the ceil(p*n)-th
    smallest element; randomized multisets across sizes 1..200."""
    rng = random.Random(11)
    ps = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    for _ in range(8):
        n = rng.randint(1, 200)
        vals = [rng.randint(0, 20) for _ in range(n)]
        df = spark.createDataFrame([(v,) for v in vals], "v int")
        row = discrete_quantiles(df, "v", ps).first()
        sv = sorted(vals)
        for i, p in enumerate(ps):
            assert row[f"__q{i}"] == sv[math.ceil(p * n) - 1], (
                n, p, sv, row.asDict(),
            )
