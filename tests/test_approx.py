"""Sketch aggregates: assert accuracy bounds against exact values
(no cross-engine oracle exists for HLL++/KLL internals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_etl_pipeline_spark.queries import x6_approx_stats
from python_etl_pipeline_spark.sources.table_formats import delta_available, merge_into

import pytest


def test_approx_stats_accuracy(spark, sf_dir):
    approx = {r["l_returnflag"]: r for r in x6_approx_stats(spark, sf_dir).collect()}
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_orders"] - e["n"]) / e["n"] < 0.05   # HLL++ rsd
        assert abs(a["median_price_approx"] - e["median"]) / e["median"] < 0.05


def test_merge_into_stub_guides_to_snapshot_merge(spark):
    if delta_available():
        pytest.skip("delta runtime present; stub path not applicable")
    df = spark.range(1)
    with pytest.raises(NotImplementedError, match="snapshot merge"):
        merge_into("/tmp/nowhere", df, "id")
