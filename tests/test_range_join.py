"""Range (band) join: binned equi-join decomposition must agree with the
naive broadcast nested-loop plan, and must not itself plan a nested loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_etl_pipeline_spark.operators import range_join

BANDS = [
    ("micro", 0.0, 50_000.0),
    ("small", 50_000.0, 100_000.0),
    ("medium", 100_000.0, 200_000.0),
    ("large", 200_000.0, 600_000.0),
]


def _bands(spark):
    return spark.createDataFrame(BANDS, "band string, lo double, hi double")


def _counts(df):
    return {
        r["band"]: (r["n"], round(r["s"], 2))
        for r in df.groupBy("band")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()
    }


def test_binned_range_join_matches_naive(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    naive = range_join(orders, _bands(spark), "o_totalprice")
    binned = range_join(orders, _bands(spark), "o_totalprice", bin_width=50_000.0)
    assert _counts(naive) == _counts(binned)
    # bands cover the whole price domain -> every order lands in one band
    assert sum(n for n, _ in _counts(binned).values()) == orders.count()


def test_binned_range_join_is_equi_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    binned = range_join(orders, _bands(spark), "o_totalprice", bin_width=50_000.0)
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_boundary_value_matches_exactly_one_band(spark):
    # half-open [lo, hi): a value on a band boundary belongs to the upper band
    fact = spark.createDataFrame([(50_000.0,), (49_999.99,)], "o_totalprice double")
    out = range_join(fact, _bands(spark), "o_totalprice", bin_width=50_000.0)
    rows = {r["o_totalprice"]: r["band"] for r in out.collect()}
    assert out.count() == 2
    assert rows[50_000.0] == "small" and rows[49_999.99] == "micro"
