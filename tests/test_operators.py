"""Relational core operator tests: dedup determinism, projection
validation, key splits — the reference's order-sensitive semantics
(FIXTURES.md cross-cutting requirements 2/3/5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_etl_pipeline_spark.operators import (
    validate_and_project,
    pk_filter,
    normalize_nulls,
    dedup_keep_first,
    dedup_keep_last,
    split_new_vs_existing,
)
from python_etl_pipeline_spark.operators.project import SchemaMismatchError


@pytest.fixture
def dup_df(spark):
    # (pk, seq, val): pk 'a' appears 3x, 'b' 2x
    rows = [("a", 1, "a1"), ("a", 2, "a2"), ("a", 3, "a3"), ("b", 1, "b1"), ("b", 2, "b2"), ("c", 1, "c1")]
    return spark.createDataFrame(rows, ["pk", "seq", "val"])


def test_dedup_keep_last(spark, dup_df):
    out = {r["pk"]: r["val"] for r in dedup_keep_last(dup_df, "pk", "seq").collect()}
    assert out == {"a": "a3", "b": "b2", "c": "c1"}


def test_dedup_keep_first(spark, dup_df):
    out = {r["pk"]: r["val"] for r in dedup_keep_first(dup_df, "pk", "seq").collect()}
    assert out == {"a": "a1", "b": "b1", "c": "c1"}


def test_validate_and_project(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], ["b", "a", "c"])
    out = validate_and_project(df, ["a", "b", "c"])
    assert out.columns == ["a", "b", "c"]
    with pytest.raises(SchemaMismatchError):
        validate_and_project(df, ["a", "b", "d"])


def test_pk_filter(spark):
    df = spark.createDataFrame([("1",), ("",), ("  ",), (None,), ("2",)], ["pk"])
    assert sorted(r["pk"] for r in pk_filter(df, "pk").collect()) == ["1", "2"]


def test_normalize_nulls(spark):
    df = spark.createDataFrame([("nan", 1), ("ok", 2), ("<NA>", 3), ("", 4)], ["s", "i"])
    out = [r["s"] for r in normalize_nulls(df).orderBy("i").collect()]
    assert out == [None, "ok", None, None]


def test_split_new_vs_existing(spark):
    incoming = spark.createDataFrame([("1", "x"), ("2", "y"), ("3", "z")], ["pk", "v"])
    existing = spark.createDataFrame([("2", "old"), ("9", "old")], ["pk", "v"])
    new_rows, updated = split_new_vs_existing(incoming, existing, "pk")
    assert sorted(r["pk"] for r in new_rows.collect()) == ["1", "3"]
    assert sorted(r["pk"] for r in updated.collect()) == ["2"]


def test_salted_join_matches_plain(spark):
    from python_etl_pipeline_spark.operators.joins import salted_join

    # 90% of fact rows share one hot key — the skew case salting targets
    fact = spark.range(0, 1000).selectExpr(
        "CASE WHEN id % 10 = 0 THEN id ELSE 7 END AS k", "id AS payload"
    )
    dim = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS dval")
    plain = fact.join(dim, "k").select("k", "payload", "dval")
    salted = salted_join(fact, dim, "k", salts=4).select("k", "payload", "dval")
    assert "__salt" not in salted.columns
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_csv_quarantine_split(spark, tmp_path):
    from python_etl_pipeline_spark.sources.csv import read_csv_with_quarantine

    p = tmp_path / "mixed.csv"
    # row 3 has a dangling quote: univocity can't parse it against the schema
    p.write_text('id,name,amount\n1,alice,10\n2,"bob,jr",20\n3,"broken,30\n4,carol,40\n')
    good, bad = read_csv_with_quarantine(spark, str(p), ["id", "name", "amount"])
    good_rows = {r["id"]: (r["name"], r["amount"]) for r in good.collect()}
    assert set(good_rows) == {"1", "2", "4"}
    assert good_rows["2"] == ("bob,jr", "20")
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "broken" in bad_rows[0]["raw_line"]
    assert bad_rows[0]["source_file"].endswith("mixed.csv")


def test_group_zscore_grouped_map_matches_expression(spark, sf_dir):
    """§2.11 grouped-map surface: the applyInPandas z-score twin must
    match the registered expression form bit-for-bit (same rounding,
    same ddof) — the UDF machinery demo, not the production path."""
    from python_etl_pipeline_spark.queries import (
        x7_group_zscore,
        x7_group_zscore_grouped_map,
    )

    expr = {
        r["o_orderkey"]: r["zscore"]
        for r in x7_group_zscore(spark, sf_dir).collect()
    }
    udf = {
        r["o_orderkey"]: r["zscore"]
        for r in x7_group_zscore_grouped_map(spark, sf_dir).collect()
    }
    assert expr == udf


def test_global_sequence_properties(spark):
    """with_global_sequence must emit a gap-free permutation of 1..N
    ordered by the key, for uniform, heavily-duplicated (all rows in
    one quantile bucket), tiny, and singleton inputs."""
    import random

    from python_etl_pipeline_spark.operators.sequence import with_global_sequence

    rng = random.Random(7)
    cases = [
        [(i,) for i in rng.sample(range(10_000), 500)],        # uniform
        [(rng.choice([1, 2, 3]),) for _ in range(300)],        # 3 hot keys
        [(42,)] * 50,                                          # one key
        [(5,)],                                                # singleton
        [(i % 7,) for i in range(200)],                        # cyclic dups
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "k long")
        out = with_global_sequence(df, ["k"], name="seq").collect()
        n = len(rows)
        seqs = sorted(r["seq"] for r in out)
        assert seqs == list(range(1, n + 1)), "gap-free permutation"
        # monotone: ordering rows by seq must order keys non-decreasingly
        by_seq = [r["k"] for r in sorted(out, key=lambda r: r["seq"])]
        assert by_seq == sorted(by_seq), "sequence follows key order"


def test_global_sequence_rejects_null_leading_key(spark):
    """A null leading order key would silently land in bucket 0 and be
    sequenced first; the guard raises at execution instead."""
    import pytest
    from python_etl_pipeline_spark.operators.sequence import with_global_sequence

    df = spark.createDataFrame(
        [(1.0, "a"), (None, "b"), (3.0, "c")], "k double, v string"
    )
    with pytest.raises(Exception, match="null in leading order column"):
        with_global_sequence(df, ["k"], name="seq").collect()


def test_global_sequence_empty_input_short_circuits(spark):
    from python_etl_pipeline_spark.operators.sequence import with_global_sequence

    df = spark.createDataFrame([], "k double, v string")
    out = with_global_sequence(df, ["k"], name="seq")
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["k", "v", "seq"]


def test_global_prefix_sum_matches_serial_scan(spark):
    """with_global_prefix_sum must equal the single-partition running
    total for ascending AND descending leading keys, under duplicates
    (ties resolved by the trailing key), hot keys and singletons."""
    import random

    from python_etl_pipeline_spark.operators.sequence import (
        with_global_prefix_sum,
    )

    rng = random.Random(11)
    cases = [
        [(rng.randrange(10_000), i, rng.randrange(100)) for i in range(400)],
        [(rng.choice([1, 2, 3]), i, rng.randrange(50)) for i in range(300)],
        [(42, i, 7) for i in range(50)],
        [(5, 0, 9)],
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "k long, t long, v long")
        for asc in (True, False):
            got = {
                (r["k"], r["t"]): r["cum"]
                for r in with_global_prefix_sum(
                    df, "v", ["k", "t"], ascending=[asc, True]
                ).collect()
            }
            acc, want = 0, {}
            for k, t, v in sorted(
                rows, key=lambda r: ((r[0] if asc else -r[0]), r[1])
            ):
                acc += v
                want[(k, t)] = acc
            assert got == want, f"ascending={asc}"


def test_global_prefix_sum_null_values_and_empty_schema(spark):
    """NULL value_col rows follow SQL SUM semantics: an all-NULL bucket
    folds as 0 into downstream offsets (no driver TypeError), a row
    whose cumulative frame holds only NULLs gets NULL, and the empty-
    input short-circuit emits the same column type (the SUM result
    type) as the non-empty path — for bigint AND double value columns
    (r10 ADVICE)."""
    from python_etl_pipeline_spark.operators.sequence import (
        with_global_prefix_sum,
    )

    # force tiny buckets so the leading all-NULL keys own a bucket
    rows = [(1, None), (2, None), (3, 10), (4, None), (5, 5)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in with_global_prefix_sum(
            df, "v", ["k"], num_buckets=4
        ).collect()
    }
    assert got == {1: None, 2: None, 3: 10, 4: 10, 5: 15}

    for typ, want in [("long", "bigint"), ("double", "double")]:
        empty = spark.createDataFrame([], f"k long, v {typ}")
        out = with_global_prefix_sum(empty, "v", ["k"])
        assert out.collect() == []
        assert out.schema["cum"].dataType.simpleString() == want
        # non-empty path for the same input type must agree
        one = with_global_prefix_sum(
            spark.createDataFrame(
                [(1, 2 if typ == "long" else 2.0)], f"k long, v {typ}"
            ),
            "v",
            ["k"],
        )
        assert (
            one.schema["cum"].dataType.simpleString()
            == out.schema["cum"].dataType.simpleString()
        )


def test_global_prefix_sum_rejects_null_leading_key(spark):
    import pytest

    from python_etl_pipeline_spark.operators.sequence import (
        with_global_prefix_sum,
    )

    df = spark.createDataFrame(
        [(1.0, 1), (None, 2), (3.0, 3)], "k double, v long"
    )
    with pytest.raises(Exception, match="null in leading order column"):
        with_global_prefix_sum(df, "v", ["k"]).collect()
