"""Data-derived blow-up caps (llm/caps.py): the Tukey-fence cap drops
degenerate groups, the floor protects legitimate duplicate clusters on
clean corpora, and the hard ceiling bounds task memory whatever the
distribution says."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_etl_pipeline_spark.llm.caps import derived_cap, filter_by_derived_cap
from python_etl_pipeline_spark.llm.dedup import minhash_lsh_pairs


def _groups(spark, sizes: dict[str, int]):
    rows = [(g, i) for g, n in sizes.items() for i in range(n)]
    return spark.createDataFrame(rows, "g string, v int")


def test_derived_cap_drops_only_the_outlier_group(spark):
    """Bulk groups of size 1-3 set the fence; a 100-row group is far
    above it and gets dropped; everything else survives."""
    sizes = {f"g{i}": 1 + i % 3 for i in range(30)} | {"huge": 100}
    df = _groups(spark, sizes)
    kept = filter_by_derived_cap(df, ["g"], floor=10)
    names = {r["g"] for r in kept.select("g").distinct().collect()}
    assert "huge" not in names
    assert len(names) == 30


def test_cap_floor_protects_small_dup_clusters(spark):
    """A clean corpus (fence = 1) must NOT cap real duplicate clusters
    below the floor: q3 = IQR = 1 here, so the bare fence would be 1 and
    discard the 5-row group — the floor keeps it."""
    sizes = {f"u{i}": 1 for i in range(50)} | {"dup": 5}
    kept = filter_by_derived_cap(_groups(spark, sizes), ["g"], floor=10)
    assert kept.filter(F.col("g") == "dup").count() == 5


def test_hard_max_bounds_task_memory(spark):
    """When the distribution itself is heavy (every group size 50, fence
    = 50), the hard ceiling still wins: it is the gram kernel's memory
    bound, not a statistical choice."""
    sizes = {f"g{i}": 50 for i in range(8)}
    kept = filter_by_derived_cap(
        _groups(spark, sizes), ["g"], floor=10, hard_max=20
    )
    assert kept.count() == 0


def test_derived_cap_value_is_integer_exact(spark):
    """cap = q3 + 3*IQR with discrete quantiles: sizes 1..8 (one group
    each) give q1 = 2, q3 = 6, cap = max(6 + 12, floor)."""
    sizes = {f"g{i}": i for i in range(1, 9)}
    szs = _groups(spark, sizes).groupBy("g").agg(F.count("*").alias("sz"))
    cap = derived_cap(szs.select("sz"), "sz", floor=1).first()["__cap"]
    assert cap == 18


def test_minhash_auto_cap_end_to_end(spark):
    """The 'auto' wiring: 30 unique docs seed the bucket-size fence at 1
    (120 singleton buckets), 60 byte-identical docs form degenerate
    buckets of 60 (dropped — far above cap = floor = 10), and a planted
    2-doc duplicate cluster survives the floor."""
    rows = [(i, "exactly the same boilerplate text in every row of this set")
            for i in range(60)]
    rows += [(200 + u, f"unique{u} filler{u} document{u} body{u} text{u} "
              f"tail{u} words{u} here{u}") for u in range(30)]
    rows += [(100 + j, "a genuinely duplicated pair of documents right here")
             for j in range(2)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", max_bucket_size="auto", cap_floor=10
        ).collect()
    }
    assert pairs == {(100, 101)}  # no boilerplate pair leaked


def test_lsh_precision_contract_at_gate_scale(spark):
    """dd14's stated bound: MinHash banding's candidate set verifies at
    >= 0.5 precision against exact Jaccard(t=0.3) on the fixture
    (measured 1.0 at sf0.001/sf0.01 — every candidate is a true
    near-dup; the bound leaves margin for fixture drift)."""
    from python_etl_pipeline_spark.queries import REGISTRY

    row = REGISTRY["dd14_lsh_precision"].spark(
        spark, "/root/testdata/sf0.001"
    ).first()
    assert row["n_candidates"] > 0
    assert row["precision_at_t"] >= 0.5


def test_discrete_quantiles_ignore_nulls_and_match_duckdb(spark):
    """Nulls in the value column must not shift the quantiles: Spark's
    Window.orderBy sorts nulls first in the cumulative sum, DuckDB's
    ORDER BY sorts them last — with nulls in the histogram the two
    engines disagree by the null count. discrete_quantiles filters them
    out; the DuckDB twin (WHERE v IS NOT NULL) then agrees exactly."""
    import duckdb

    from python_etl_pipeline_spark.llm.caps import discrete_quantiles

    vals = [1, 2, 3, 4, 5, 6, 7, 8, None, None, None]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    row = discrete_quantiles(df, "v", [0.25, 0.5, 0.75]).first()

    con = duckdb.connect()
    dq = con.execute(
        """
        WITH vals(v) AS (SELECT unnest(?)),
        hist AS (SELECT v, count(*) AS c FROM vals
                 WHERE v IS NOT NULL GROUP BY 1),
        cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
                       sum(c) OVER () AS n FROM hist)
        SELECT min(CASE WHEN cum >= ceil(0.25 * n) THEN v END),
               min(CASE WHEN cum >= ceil(0.5 * n) THEN v END),
               min(CASE WHEN cum >= ceil(0.75 * n) THEN v END)
        FROM cum
        """,
        [vals],
    ).fetchone()
    assert (row["__q0"], row["__q1"], row["__q2"]) == dq == (2, 4, 6)
