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


def test_logbin_quantile_error_bound_randomized(spark):
    """Model check for the log-bin quantile sketch (hh5/x56's algebra):
    over randomized heavy-tailed integer data (ties, outliers, tiny
    values below the exact-bin region), every estimated quantile must
    land within the 1/16 relative-error bound of the TRUE rank-order
    statistic (exact for values < 8, where bins are unit-width)."""
    import random

    from python_etl_pipeline_spark.llm.sketch import (
        logbin_histogram,
        logbin_quantiles,
    )

    rng = random.Random(23)
    for trial in range(3):
        vals = (
            [rng.randint(0, 7) for _ in range(50)]
            + [rng.randint(8, 1000) for _ in range(300)]
            + [rng.randint(10**5, 10**7) for _ in range(30)]
            + [rng.choice([5, 64, 4096])] * 40  # heavy ties
        )
        rng.shuffle(vals)
        df = spark.createDataFrame(
            [("g", v) for v in vals], "grp string, v long"
        )
        hist = logbin_histogram(df, "grp", "v")
        qs = (0.1, 0.5, 0.9, 0.99)
        est = {
            float(r["q"]): r["est"]
            for r in logbin_quantiles(hist, qs, "grp").collect()
        }
        s = sorted(vals)
        for q in qs:
            true = s[math.ceil(q * len(s)) - 1]
            e = est[q]
            if true < 8:
                assert e == true, (trial, q, e, true)
            else:
                assert abs(e - true) / true <= 1 / 16 + 1e-12, (
                    trial, q, e, true,
                )


def test_hll_registers_match_python_model_and_merge(spark):
    """Model check for the HLL register algebra (hh4's): Spark's
    register table must equal a direct Python recomputation from the
    same md5 hashes, and a random 3-way shard split must max-merge to
    exactly the full registers (associativity + commutativity of the
    max monoid over an arbitrary partitioning)."""
    import hashlib
    import random

    from python_etl_pipeline_spark.llm.sketch import HLL_M, HLL_W, hll_registers

    rng = random.Random(41)
    words = [f"w{rng.randint(0, 400)}" for _ in range(1200)]
    docs = [
        ("s" + str(i % 3), " ".join(rng.sample(words, rng.randint(5, 40))))
        for i in range(60)
    ]

    def model(rows):
        regs: dict[tuple, int] = {}
        for src, text in rows:
            for tok in text.strip().split():
                h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
                j, v = h % HLL_M, h // HLL_M
                rho = (HLL_W + 1) if v == 0 else HLL_W + 1 - v.bit_length()
                k = (src, j)
                regs[k] = max(regs.get(k, 0), rho)
        return regs

    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        (r["source"], r["j"]): r["m_j"]
        for r in hll_registers(df).collect()
    }
    assert got == model(docs)

    shards = [[], [], []]
    for row in docs:
        shards[rng.randint(0, 2)].append(row)
    merged: dict[tuple, int] = {}
    for sh in shards:
        for k, v in model(sh).items():
            merged[k] = max(merged.get(k, 0), v)
    assert merged == model(docs)


def test_funnel_and_attribution_match_python_model(spark):
    """Model check for the event-analytics pair: random event streams
    (ties broken by event_id, shuffled arrival order) — the strict
    funnel's per-user step flags and last-touch attribution must equal
    a direct Python recomputation of the same rules."""
    import datetime
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(99)
    base = datetime.datetime(2024, 3, 1)
    types = ["view", "click", "purchase"]
    rows = []
    eid = 0
    for user in range(40):
        for _ in range(rng.randint(1, 12)):
            eid += 1
            rows.append(
                (
                    user,
                    eid,
                    base + datetime.timedelta(minutes=rng.randint(0, 5000)),
                    rng.choice(types),
                )
            )
    rng.shuffle(rows)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )

    # --- strict funnel: Spark (x59's exact construction) ---
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = df.select("user_id", "ts", "event_type", t1.alias("t1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    s2 = s1.select("user_id", "ts", "event_type", "t1", t2.alias("t2"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    got = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in s2.select("user_id", "t1", "t2", t3.alias("t3"))
        .groupBy("user_id")
        .agg(
            F.max("t1").alias("t1"), F.max("t2").alias("t2"),
            F.max("t3").alias("t3"),
        )
        .collect()
    }

    # --- strict funnel: Python model ---
    by_user: dict[int, list] = {}
    for u, e, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, e, ty))
    for u, evs in by_user.items():
        m1 = min((ts for ts, _, ty in evs if ty == "view"), default=None)
        m2 = (
            min(
                (ts for ts, _, ty in evs if ty == "click" and ts > m1),
                default=None,
            )
            if m1
            else None
        )
        m3 = (
            min(
                (ts for ts, _, ty in evs if ty == "purchase" and ts > m2),
                default=None,
            )
            if m2
            else None
        )
        assert got[u] == (m1, m2, m3), (u, got[u], (m1, m2, m3))

    # --- last-touch attribution: Spark (x60's construction) ---
    conv = df.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = df.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (F.col("touch_ts") > F.col("conv_ts") - F.expr("INTERVAL 7 DAY"))
    )
    wnd = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), "channel"
    )
    got_att = {
        r["conv_id"]: r["channel"]
        for r in pairs.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") == 1)
        .select("conv_id", "channel")
        .collect()
    }

    # --- attribution: Python model ---
    want_att = {}
    for u, e, ts, ty in rows:
        if ty != "purchase":
            continue
        cands = [
            (t2_, ch)
            for (u2, _, t2_, ch) in rows
            if u2 == u
            and ch in ("view", "click")
            and t2_ <= ts
            and t2_ > ts - datetime.timedelta(days=7)
        ]
        if cands:
            # latest touch; tie -> lexicographically smaller channel
            latest = max(c[0] for c in cands)
            chans = sorted(ch for t, ch in cands if t == latest)
            want_att[e] = chans[0]
    assert got_att == want_att


def test_global_prefix_sum_matches_sorted_model_under_ties(spark):
    """cum must equal the serial running total over the total order
    (k, id) — both directions, with heavy ties (so bucket boundaries
    land mid-tie-run) and negative values (so the running total is
    non-monotone and an offset-fold bug cannot hide behind ordering).
    This is x76/x82's substrate: the Gini rank identity and the ABC
    cumulative share both ride this exact decomposition."""
    rng = random.Random(13)
    rows = [
        (i, rng.randint(0, 30), rng.randint(-50, 100)) for i in range(2000)
    ]
    from python_etl_pipeline_spark.operators.sequence import (
        with_global_prefix_sum,
    )

    df = spark.createDataFrame(rows, "id long, k long, v long").repartition(8)
    for asc in (True, False):
        got = {
            r["id"]: r["cum"]
            for r in with_global_prefix_sum(
                df, "v", ["k", "id"], ascending=[asc, True], num_buckets=13
            ).collect()
        }
        acc = 0
        for rid, _k, v in sorted(
            rows, key=lambda r: ((r[1] if asc else -r[1]), r[0])
        ):
            acc += v
            assert got[rid] == acc, (asc, rid)


def test_prefix_min_model_property(spark):
    """Model property for the prefix-MIN engine (x91's substrate):
    random data with duplicates and negatives, both directions, both
    frame forms, against the serial scan — the min-monoid twin of the
    prefix-sum property above."""
    import random

    from python_etl_pipeline_spark.operators.sequence import (
        with_global_prefix_min,
    )

    rng = random.Random(14)
    rows = [
        (i, rng.randint(0, 30), rng.randint(-50, 100)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, k long, v long").repartition(8)
    for asc in (True, False):
        for inclusive in (True, False):
            got = {
                r["id"]: r["runmin"]
                for r in with_global_prefix_min(
                    df,
                    "v",
                    ["k", "id"],
                    ascending=[asc, True],
                    num_buckets=13,
                    inclusive=inclusive,
                ).collect()
            }
            cur = None
            for rid, _k, v in sorted(
                rows, key=lambda r: ((r[1] if asc else -r[1]), r[0])
            ):
                want = (
                    cur
                    if not inclusive
                    else (v if cur is None else min(cur, v))
                )
                assert got[rid] == want, (asc, inclusive, rid)
                cur = v if cur is None else min(cur, v)
