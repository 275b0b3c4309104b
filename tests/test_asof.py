"""As-of join fixture semantics: backward match, ties visible,
no-prior-row -> NULL, per-key isolation."""

from __future__ import annotations

from python_etl_pipeline_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 10, "L1"), ("u1", 20, "L2"), ("u1", 5, "L0"), ("u2", 10, "L3")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [("u1", 7, 7.0), ("u1", 10, 10.0), ("u1", 15, 15.0), ("u3", 1, 99.0)],
        ["k", "t", "v"],
    )
    out = asof_join(left, right, key="k", left_time="t", right_time="t",
                    value_cols=["v"])
    got = {r["tag"]: r["v_asof"] for r in out.collect()}
    assert got == {
        "L0": None,    # no right row at or before t=5
        "L1": 10.0,    # tie at t=10 is visible (right sorts before left)
        "L2": 15.0,    # most recent of {7,10,15}
        "L3": None,    # u2 has no right rows; u3's rows never leak
    }
    assert out.count() == 4
