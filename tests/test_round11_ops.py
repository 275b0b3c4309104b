"""Round-11 operators: survivorship golden record, join-skew audit,
PII density, basket lift, CUPED, sweep-line concurrency — pure-Python
recomputes plus the plan shapes that matter at 100 TB."""

from __future__ import annotations

import contextlib
import io
import math
import re

from pyspark.sql import functions as F

from python_etl_pipeline_spark.queries import REGISTRY, _t


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _events(spark, sf_dir):
    return [
        r.asDict()
        for r in _t(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect()
    ]


def _orders(spark, sf_dir):
    return [
        r.asDict()
        for r in _t(spark, sf_dir, "orders").collect()
    ]


# ---------------------------------------------------------------- i17


def test_survivorship_matches_pure_python(spark, sf_dir):
    """Field-level survivorship: recency / mode / min / max rules each
    recomputed serially, modal ties broken by value desc."""
    rows = _orders(spark, sf_dir)
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    want = {}
    for ck, rs in by_cust.items():
        latest = max(
            rs,
            key=lambda r: int(r["o_orderdate"].timestamp()) * 100000000
            + r["o_orderkey"],
        )
        counts: dict[str, int] = {}
        for r in rs:
            counts[r["o_orderstatus"]] = counts.get(r["o_orderstatus"], 0) + 1
        modal = max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        want[ck] = (
            latest["o_orderpriority"],
            modal,
            min(r["o_orderdate"] for r in rs),
            max(round(r["o_totalprice"] * 100) for r in rs),
            len(rs),
        )
    got = {
        r["custkey"]: (
            r["latest_priority"],
            r["modal_status"],
            r["first_order_ts"],
            r["max_price_cents"],
            r["n_orders"],
        )
        for r in REGISTRY["i17_survivorship_golden_record"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want


def test_survivorship_plan_keyed(spark, sf_dir):
    """i17: everything customer-keyed — no single-partition exchange,
    no range sort; the mode's group-limit window prunes map-side."""
    plan = _plan(spark, sf_dir, "i17_survivorship_golden_record")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------- i18


def test_join_skew_audit_matches_pure_python(spark, sf_dir):
    li = [
        r.asDict()
        for r in _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ]
    orders = _orders(spark, sf_dir)

    def leg(keys):
        cnt: dict[int, int] = {}
        for k in keys:
            cnt[k] = cnt.get(k, 0) + 1
        dist = sorted(cnt.values())
        n_keys, n_rows, mx = len(dist), sum(dist), max(dist)
        # linear-interpolated p99 (both engines' continuous percentile)
        idx = (n_keys - 1) * 0.99
        lo, hi = int(math.floor(idx)), int(math.ceil(idx))
        p99 = dist[lo] + (idx - lo) * (dist[hi] - dist[lo])
        salt = (mx * n_keys + 4 * n_rows - 1) // (4 * n_rows)
        return (
            n_keys,
            n_rows,
            mx,
            round(p99, 2),
            round(mx * n_keys / n_rows, 2),
            salt,
        )

    want = {
        "lineitem->orders": leg([r["l_orderkey"] for r in li]),
        "lineitem->part": leg([r["l_partkey"] for r in li]),
        "orders->customer": leg([r["o_custkey"] for r in orders]),
    }
    got = {
        r["relationship"]: (
            r["n_keys"],
            r["n_rows"],
            r["max_key_rows"],
            r["p99_key_rows"],
            r["skew_ratio"],
            r["salt_factor"],
        )
        for r in REGISTRY["i18_join_skew_audit"].spark(spark, sf_dir).collect()
    }
    assert got.keys() == want.keys()
    for rel in want:
        g, w = got[rel], want[rel]
        assert g[:3] == w[:3], rel
        assert abs(g[3] - w[3]) < 0.011, rel  # p99 interpolation ulp
        assert g[4] == w[4] and g[5] == w[5], rel
    # every salt factor >= 1; unskewed FKs recommend 1 (no salting)
    assert all(v[5] >= 1 for v in got.values())


def test_join_skew_audit_plan(spark, sf_dir):
    """i18: three key-keyed counts folded to single-row stats — the
    single-partition exchanges are the 1-row stat folds (3, bounded by
    the relationship count, never data-sized); no windows, no joins."""
    plan = _plan(spark, sf_dir, "i18_join_skew_audit")
    assert "Window" not in plan
    assert "Join" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------- tx30


def test_pii_density_matches_pure_python(spark, sf_dir):
    docs = [
        r.asDict()
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .collect()
    ]
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\b\d{10}\b")
    ssn = re.compile(r"\b\d{3}-\d{2}-\d{4}\b")
    agg: dict[str, list[int]] = {}
    for d in docs:
        t = d["text"]
        if d["doc_id"] % 3 == 0:
            t += (
                f" contact user{d['doc_id']}@example.com or 9876543210 "
                "ssn 123-45-6789"
            )
        a = agg.setdefault(d["source"], [0, 0, 0, 0])
        a[0] += len(t.strip().split())
        a[1] += len(email.findall(t))
        a[2] += len(phone.findall(t))
        a[3] += len(ssn.findall(t))
    got = {
        r["source"]: r.asDict()
        for r in REGISTRY["tx30_pii_density_audit"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got.keys() == agg.keys()
    for src, (toks, em, ph, sn) in agg.items():
        g = got[src]
        assert (g["n_tokens"], g["n_emails"], g["n_phones"], g["n_ssns"]) == (
            toks, em, ph, sn
        ), src
        assert abs(
            g["pii_per_10k_tokens"] - round(1e4 * (em + ph + sn) / toks, 4)
        ) < 1e-9
        # planted PII is on every third doc: counts must be non-zero
        assert g["n_emails"] > 0 and g["n_ssns"] > 0


def test_pii_density_plan_mapside(spark, sf_dir):
    """tx30: regex counts are map-side expressions — exactly ONE
    exchange (the source agg), no explode, no window, no join."""
    plan = _plan(spark, sf_dir, "tx30_pii_density_audit")
    assert plan.count("Exchange") <= 2  # partial/final of one agg
    assert "Generate" not in plan  # no explode
    assert "Window" not in plan
    assert "Join" not in plan


# ---------------------------------------------------------------- x87


def test_basket_lift_matches_pure_python(spark, sf_dir):
    li = [
        (r["o_custkey"], r["l_partkey"])
        for r in _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_partkey")
        .collect()
    ]
    baskets: dict[int, set] = {}
    for buyer, item in li:
        baskets.setdefault(buyer, set()).add(item)
    n_baskets = len(baskets)
    freq: dict[int, int] = {}
    pair: dict[tuple, int] = {}
    for items in baskets.values():
        s = sorted(items)
        for it in s:
            freq[it] = freq.get(it, 0) + 1
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                pair[(a, b)] = pair.get((a, b), 0) + 1
    scored = [
        (
            round(n * n_baskets / (freq[a] * freq[b]), 4),
            a,
            b,
            n,
            round(n / freq[a], 4),
        )
        for (a, b), n in pair.items()
        if n >= 5
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(a, b, n, lift, conf) for lift, a, b, n, conf in scored[:10]]
    got = [
        (r["item_a"], r["item_b"], r["n_ab"], r["lift"], r["confidence"])
        for r in REGISTRY["x87_basket_lift"].spark(spark, sf_dir).collect()
    ]
    assert got == want
    # association-rule sanity: every surviving pair has lift > 1 here
    # (support floor kills the independent-pair noise)
    assert all(g[3] > 1 for g in got)


def test_basket_lift_plan(spark, sf_dir):
    """x87: buyer-keyed pair build, broadcast frequencies, top-10 via
    TakeOrderedAndProject — no global sort, no cartesian."""
    plan = _plan(spark, sf_dir, "x87_basket_lift")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------- x88


def test_cuped_matches_pure_python(spark, sf_dir):
    import datetime
    import hashlib

    ev = _events(spark, sf_dir)
    split = datetime.datetime(2024, 1, 16)
    per_user: dict[int, list[int]] = {}
    for e in ev:
        u = per_user.setdefault(e["user_id"], [0, 0])
        cents = round(e["value"] * 100)
        if e["ts"] < split:
            u[0] += cents
        else:
            u[1] += cents
    xs = [v[0] for v in per_user.values()]
    ys = [v[1] for v in per_user.values()]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (n - 1)
    varx = sum((x - mx) ** 2 for x in xs) / (n - 1)
    theta = cov / varx
    arms: dict[str, list] = {"A": [], "B": []}
    for uid, (x, y) in per_user.items():
        v = "A" if hashlib.md5(str(uid).encode()).hexdigest() < "8" else "B"
        arms[v].append((x, y))
    got = {
        r["variant"]: r.asDict()
        for r in REGISTRY["x88_cuped_adjustment"].spark(spark, sf_dir).collect()
    }
    assert set(got) == {"A", "B"}
    for v, pairs in arms.items():
        g = got[v]
        assert g["n_users"] == len(pairs)
        mean_y = sum(y for _, y in pairs) / len(pairs)
        adj = sum(y - theta * (x - mx) for x, y in pairs) / len(pairs)
        assert abs(g["mean_y_cents"] - mean_y) < 0.02
        assert abs(g["adj_mean_cents"] - adj) < 0.02
        assert abs(g["theta"] - theta) < 1e-4
    # identity: CUPED shifts means but preserves the pooled average
    pooled_raw = sum(
        got[v]["mean_y_cents"] * got[v]["n_users"] for v in got
    )
    pooled_adj = sum(
        got[v]["adj_mean_cents"] * got[v]["n_users"] for v in got
    )
    assert abs(pooled_raw - pooled_adj) / max(abs(pooled_raw), 1) < 1e-4


def test_cuped_plan_one_userkeyed_agg(spark, sf_dir):
    """x88: one user-keyed agg, pooled moments broadcast, 2-row arm
    fold — no windows, no range sort."""
    plan = _plan(spark, sf_dir, "x88_cuped_adjustment")
    assert "Window" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ---------------------------------------------------------------- x89


def test_peak_concurrency_matches_pure_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e["ts"])
    sessions = []
    for ts_list in by_user.values():
        ts_list.sort()
        start = prev = ts_list[0]
        for t in ts_list[1:]:
            if (t - prev).total_seconds() * 1e6 > 30 * 60 * 1e6:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    deltas = []
    for s, e_ in sessions:
        us = int(s.timestamp() * 1e6)
        ue = int(e_.timestamp() * 1e6) + 1000000
        deltas.append((us, 1))
        deltas.append((ue, -1))
    deltas.sort()
    cur = 0
    peak: dict[int, int] = {}
    for t, d in deltas:
        cur += d
        day = t // (86400 * 1000000)
        peak[day] = max(peak.get(day, cur), cur)
    got = {
        int(r["day"].timestamp()) // 86400: r["peak_concurrent"]
        for r in REGISTRY["x89_peak_concurrency"].spark(spark, sf_dir).collect()
    }
    assert got == peak
    # capacity sanity: concurrency never exceeds the user count
    assert max(got.values()) <= len(by_user)


def test_peak_concurrency_fully_parallel(spark, sf_dir):
    """x89: the global sweep rides the bucketed prefix-sum engine —
    no single-partition exchange, no range sort anywhere."""
    plan = _plan(spark, sf_dir, "x89_peak_concurrency")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------- dd21


def test_soft_dedup_weights_invariants(spark, sf_dir):
    """dd21 vs dd6: same clusters, weight = 1/size, every doc present,
    and sum(weight) == number of clusters (soft dedup preserves the
    deduped corpus size by construction)."""
    out = [
        r.asDict()
        for r in REGISTRY["dd21_soft_dedup_weights"]
        .spark(spark, sf_dir)
        .collect()
    ]
    n_docs = _t(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    sizes: dict[int, int] = {}
    for r in out:
        assert abs(r["sample_weight"] - round(1 / r["cluster_size"], 6)) < 1e-9
        sizes[r["cluster_id"]] = r["cluster_size"]
        assert r["cluster_size"] >= 1
    # actual membership counts must equal the claimed sizes
    member_counts: dict[int, int] = {}
    for r in out:
        member_counts[r["cluster_id"]] = member_counts.get(r["cluster_id"], 0) + 1
    assert member_counts == sizes
    total_w = sum(r["sample_weight"] for r in out)
    assert abs(total_w - len(sizes)) < 1e-3
    # dd6's multi-doc clusters must appear with identical sizes
    dd6 = {
        r["cluster_id"]: r["cluster_size"]
        for r in REGISTRY["dd6_lsh_dup_clusters"].spark(spark, sf_dir).collect()
    }
    for cid, sz in dd6.items():
        assert sizes.get(cid) == sz, cid


def test_soft_dedup_plan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dd21_soft_dedup_weights")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------- mm7


def test_scene_cuts_match_pure_python(spark, sf_dir):
    import hashlib

    docs = {
        r["doc_id"]: r["text"]
        for r in _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()
    }
    want = {}
    for mid, text in docs.items():
        b = text.encode()
        sigs = []
        for fi in range((len(b) - 1) // 64 + 1):
            window = text[fi * 64: fi * 64 + 16]
            sigs.append(
                int(hashlib.md5(window.encode()).hexdigest()[:8], 16)
            )
        cuts = [
            1 if bin(a ^ b_).count("1") > 16 else 0
            for a, b_ in zip(sigs, sigs[1:])
        ]
        # scene lengths from cut positions
        lens, cur = [], 1
        for c in cuts:
            if c:
                lens.append(cur)
                cur = 1
            else:
                cur += 1
        lens.append(cur)
        want[mid] = (len(sigs), len(lens), len(lens) - 1, max(lens))
    got = {
        r["media_id"]: (
            r["n_frames"], r["n_scenes"], r["n_cuts"], r["longest_scene"]
        )
        for r in REGISTRY["mm7_scene_cuts"].spark(spark, sf_dir).collect()
    }
    assert got == want


def test_scene_cuts_plan_media_keyed(spark, sf_dir):
    """mm7: everything media-keyed after the Arrow frame fan-out — no
    single-partition exchange, no joins, no range sort."""
    plan = _plan(spark, sf_dir, "mm7_scene_cuts")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "Join" not in plan


# ---------------------------------------------------------------- ann29


def test_mmr_matches_pure_python(spark, sf_dir):
    """Full greedy MMR recomputed serially from the raw embeddings —
    same array-order float folds, same round(6) grid, same tie rules."""
    rows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in _t(spark, sf_dir, "embeddings").collect()
    }
    q = rows[0]

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (na ** 0.5 * nb ** 0.5)

    rel = {
        vid: round(cos(v, q), 6) for vid, v in rows.items() if vid != 0
    }
    pool = sorted(rel, key=lambda v: (-rel[v], v))[:50]
    sim = {
        (a, b): round(cos(rows[a], rows[b]), 6)
        for i, a in enumerate(pool)
        for b in pool[i + 1:]
    }
    sim.update({(b, a): s for (a, b), s in list(sim.items())})
    sel, remaining, want = [], set(pool), []
    while len(want) < 10:
        best, bs = None, None
        for vid in sorted(remaining):
            pen = max((sim[(vid, s)] for s in sel), default=0.0)
            sc = 0.7 * rel[vid] - 0.3 * pen
            if bs is None or sc > bs:
                best, bs = vid, sc
        sel.append(best)
        remaining.discard(best)
        want.append((len(want) + 1, best, rel[best], round(bs, 4)))
    got = [
        (r["rnk"], r["vec_id"], r["rel"], r["mmr_score"])
        for r in REGISTRY["ann29_mmr_rerank"]
        .spark(spark, sf_dir)
        .orderBy("rnk")
        .collect()
    ]
    assert got == want
    # diversity property: MMR's picks are no more self-similar than
    # the plain top-10 (usually strictly less)
    top10 = pool[:10]
    mmr10 = [v for _, v, _, _ in got]

    def avg_pairwise(ids):
        ps = [
            sim[(a, b)] for i, a in enumerate(ids) for b in ids[i + 1:]
        ]
        return sum(ps) / len(ps)

    assert avg_pairwise(mmr10) <= avg_pairwise(top10) + 1e-9


# ---------------------------------------------------------------- hh9


def test_rolling_hll_exact_side_and_merge(spark, sf_dir):
    """hh9: the exact side equals a serial rolling distinct, and the
    register max-monoid makes the rolling estimate EQUAL to an HLL
    built directly on each window's users."""
    ev = _events(spark, sf_dir)
    day0: dict[tuple, set] = {}
    for e in ev:
        d = e["ts"].date()
        day0.setdefault((e["event_type"], d), set()).add(e["user_id"])
    days = sorted({d for _, d in day0})
    maxd = max(days)
    want_exact = {}
    for (t, d), _ in day0.items():
        pass
    types = sorted({t for t, _ in day0})
    import datetime

    for t in types:
        for d in days:
            users = set()
            for k in range(7):
                users |= day0.get((t, d - datetime.timedelta(days=k)), set())
            if users:
                want_exact[(t, d)] = len(users)
    # out_days beyond data (d..maxd only) — the query spreads forward,
    # so any (t, d) with contributors within the window is present
    got = {
        (r["event_type"], r["day"].date()): r
        for r in REGISTRY["hh9_rolling_hll"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(want_exact)
    for k, r in got.items():
        assert r["n_exact"] == want_exact[k], k
        assert r["rel_err"] <= 0.30, (k, r["rel_err"])


def test_rolling_hll_plan_keyed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "hh9_rolling_hll")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- i19


def test_dq_expectations_match_pure_python(spark, sf_dir):
    from python_etl_pipeline_spark.queries.core import _i19_suites

    got = {
        (r["table_name"], r["check_name"]): (
            r["metric"], r["threshold"], r["passed"]
        )
        for r in REGISTRY["i19_dq_expectations"].spark(spark, sf_dir).collect()
    }
    suites = _i19_suites()
    assert len(got) == sum(len(s) for s in suites.values())
    for t, suite in suites.items():
        rows = [r.asDict() for r in _t(spark, sf_dir, t).collect()]
        for e in suite:
            vals = [r[e.column] for r in rows]
            nn = [v for v in vals if v is not None]
            if e.kind == "not_null":
                m = len(nn) / len(vals)
            elif e.kind == "unique":
                m = len(set(vals)) / len(vals)
            elif e.kind == "in_range":
                m = (
                    sum(1 for v in nn if e.lo <= v <= e.hi) / len(nn)
                    if nn else 1.0
                )
            elif e.kind == "in_set":
                m = (
                    sum(1 for v in nn if v in e.allowed) / len(nn)
                    if nn else 1.0
                )
            elif e.kind == "matches":
                m = (
                    sum(1 for v in nn if re.match(e.pattern, v)) / len(nn)
                    if nn else 1.0
                )
            else:  # non_empty
                m = sum(
                    1 for v in vals if v is not None and v.strip()
                ) / len(vals)
            g = got[(t, e.name)]
            assert abs(g[0] - round(m, 6)) < 1e-9, (t, e.name, g, m)
            assert g[1] == e.threshold
            assert g[2] == (1 if g[0] >= g[1] else 0)
    # the fixture satisfies its own contracts: everything passes
    assert all(v[2] == 1 for v in got.values())


def test_dq_expectations_plan_one_pass_per_table(spark, sf_dir):
    """i19: each table contributes one pruned scan; report rows come
    from explode(array) over the single agg row — no windows, no joins,
    and the customer scan reads only the checked columns."""
    plan = _plan(spark, sf_dir, "i19_dq_expectations")
    assert "Window" not in plan
    assert "Join" not in plan
    # formatted plans name each node twice (tree + details): count the
    # numbered detail entries, one per physical scan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 4
    assert "c_acctbal" in plan and "c_name" not in plan


def test_dq_expectations_fails_on_violation(spark):
    """A synthetic violation must flip passed to 0 with the metric
    reporting the actual fraction."""
    from python_etl_pipeline_spark.operators.expectations import (
        Expectation,
        evaluate,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "id long, s string"
    )
    rep = {
        r["check_name"]: (r["metric"], r["passed"])
        for r in evaluate(
            df,
            "t",
            [
                Expectation("id", "unique"),
                Expectation("s", "not_null"),
                Expectation("id", "in_range", lo=1, hi=2),
            ],
        ).collect()
    }
    assert rep["id.unique"] == (round(2 / 3, 6), 0)
    assert rep["s.not_null"] == (round(2 / 3, 6), 0)
    assert rep["id.in_range"] == (1.0, 1)


# ---------------------------------------------------------------- x90


def test_seasonal_anomaly_matches_pure_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily: dict[tuple, int] = {}
    for e in ev:
        daily[(e["event_type"], e["ts"].date())] = (
            daily.get((e["event_type"], e["ts"].date()), 0) + 1
        )
    # expected per (type, dow); then residual sigma per type
    groups: dict[tuple, list] = {}
    for (t, d), n in daily.items():
        groups.setdefault((t, d.isoweekday() % 7), []).append(n)
    resid = {}
    for (t, d), n in daily.items():
        g = groups[(t, d.isoweekday() % 7)]
        resid[(t, d)] = n - sum(g) / len(g)
    sig: dict[str, float] = {}
    for t in {t for t, _ in daily}:
        rs = [v for (tt, _), v in resid.items() if tt == t]
        mu = sum(rs) / len(rs)
        sig[t] = (sum((r - mu) ** 2 for r in rs) / (len(rs) - 1)) ** 0.5
    got = {
        (r["event_type"], r["day"].date()): r.asDict()
        for r in REGISTRY["x90_seasonal_anomaly"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(daily)
    n_anom = 0
    for k, r in got.items():
        assert r["n"] == daily[k]
        assert abs(r["resid"] - round(resid[k], 2)) < 0.011
        flag = 1 if abs(resid[k]) > 2 * sig[k[0]] else 0
        assert r["is_anomaly"] == flag, (k, r, resid[k], sig[k[0]])
        n_anom += flag
    # the 2-sigma fence flags a small minority, never everything
    assert n_anom < len(got) * 0.2


def test_seasonal_anomaly_plan_matrix_windows(spark, sf_dir):
    """x90: one corpus-sized daily agg, then (type, dow)- and
    type-keyed windows over the matrix — no single-partition
    exchange, no joins."""
    plan = _plan(spark, sf_dir, "x90_seasonal_anomaly")
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------- mm8


def test_chunk_dedup_savings_match_mm6(spark, sf_dir):
    """mm8 recomputed from mm6's collected chunk table: first
    occurrence by (doc, start) per digest, per-source byte sums."""
    chunks = [
        r.asDict()
        for r in REGISTRY["mm6_cdc_chunks"].spark(spark, sf_dir).collect()
    ]
    src = {
        r["doc_id"]: r["source"]
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    first: dict[str, tuple] = {}
    for c in chunks:
        k = (c["doc_id"], c["chunk_start"])
        if c["chunk_digest"] not in first or k < first[c["chunk_digest"]]:
            first[c["chunk_digest"]] = k
    agg: dict[str, list[int]] = {}
    for c in chunks:
        a = agg.setdefault(src[c["doc_id"]], [0, 0, 0, 0])
        a[0] += 1
        a[2] += c["chunk_len"]
        if first[c["chunk_digest"]] == (c["doc_id"], c["chunk_start"]):
            a[1] += 1
            a[3] += c["chunk_len"]
    got = {
        r["source"]: r.asDict()
        for r in REGISTRY["mm8_chunk_dedup_savings"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got.keys() == agg.keys()
    for s, (nc, nu, tb, ub) in agg.items():
        g = got[s]
        assert (
            g["n_chunks"], g["n_unique_chunks"],
            g["total_bytes"], g["unique_bytes"],
        ) == (nc, nu, tb, ub), s
        assert abs(g["savings_pct"] - round(1 - ub / tb, 4)) < 1e-9
        assert 0 <= g["savings_pct"] < 1
    # duplicates exist in the fixture: somewhere savings are real
    assert sum(a[0] - a[1] for a in agg.values()) > 0


def test_chunk_dedup_savings_plan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "mm8_chunk_dedup_savings")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------- x91


def test_pareto_frontier_matches_bruteforce(spark, sf_dir):
    """Skyline recomputed by brute-force domination over the distinct
    (price, size) pairs — the O(n^2) definition the running-min form
    must equal exactly."""
    parts = [
        (r["p_partkey"], round(r["p_retailprice"] * 100), r["p_size"])
        for r in _t(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    pairs = {(p, s) for _, p, s in parts}

    def dominated(a):
        return any(
            b[0] <= a[0] and b[1] >= a[1] and b != a for b in pairs
        )

    frontier = {a for a in pairs if not dominated(a)}
    want = {
        (k, s, p) for k, p, s in parts if (p, s) in frontier
    }
    got = {
        (r["p_partkey"], r["p_size"], r["price_cents"])
        for r in REGISTRY["x91_pareto_frontier"].spark(spark, sf_dir).collect()
    }
    assert got == want
    assert got  # the frontier is never empty
    # frontier property: strictly increasing size along increasing price
    fr = sorted(frontier)
    for (p1, s1), (p2, s2) in zip(fr, fr[1:]):
        assert p1 < p2 and s1 < s2


def test_pareto_frontier_plan_fully_parallel(spark, sf_dir):
    """x91: the dominance test is the bucketed prefix-MIN engine — no
    single-partition exchange, no O(n^2) join, no range sort."""
    plan = _plan(spark, sf_dir, "x91_pareto_frontier")
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_global_prefix_min_matches_serial(spark):
    """The engine op itself: inclusive AND exclusive running mins equal
    the serial scan, under duplicates and per-bucket decomposition."""
    import random

    from python_etl_pipeline_spark.operators.sequence import (
        with_global_prefix_min,
    )

    rng = random.Random(91)
    rows = [(rng.randrange(1000), i, rng.randrange(100)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    for inclusive in (True, False):
        got = {
            (r["k"], r["t"]): r["runmin"]
            for r in with_global_prefix_min(
                df, "v", ["k", "t"], inclusive=inclusive, num_buckets=8
            ).collect()
        }
        cur = None
        want = {}
        for k, t, v in sorted(rows):
            want[(k, t)] = cur if not inclusive else (
                v if cur is None else min(cur, v)
            )
            cur = v if cur is None else min(cur, v)
        assert got == want, f"inclusive={inclusive}"


# ---------------------------------------------------------------- x92


def _sessions_30min(ev):
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(
            (e["ts"], e["event_id"], e["event_type"])
        )
    sessions = []
    for seq in by_user.values():
        seq.sort()
        cur = [seq[0]]
        for item in seq[1:]:
            if (item[0] - cur[-1][0]).total_seconds() * 1e6 > 30 * 60 * 1e6:
                sessions.append(cur)
                cur = []
            cur.append(item)
        sessions.append(cur)
    return sessions


def test_top_paths_match_pure_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    counts: dict[str, int] = {}
    for s in _sessions_30min(ev):
        path = ">".join(t for _, _, t in s)
        counts[path] = counts.get(path, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["path"], r["n_sessions"])
        for r in REGISTRY["x92_top_paths"].spark(spark, sf_dir).collect()
    ]
    assert got == want


def test_top_paths_plan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x92_top_paths")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------- i20


def test_missing_partition_audit_matches_pure_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    hours: dict[str, set] = {}
    for e in ev:
        h = int(
            e["ts"].replace(minute=0, second=0, microsecond=0).timestamp()
            // 3600
        )
        hours.setdefault(e["event_type"], set()).add(h)
    h0 = min(min(v) for v in hours.values())
    h1 = max(max(v) for v in hours.values())
    got = {
        r["event_type"]: r.asDict()
        for r in REGISTRY["i20_missing_partition_audit"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got.keys() == hours.keys()
    for t, hs in hours.items():
        g = got[t]
        assert g["expected_hours"] == h1 - h0 + 1
        assert g["present_hours"] == len(hs)
        assert g["missing_hours"] == h1 - h0 + 1 - len(hs)
        sh = sorted(hs)
        inner = max(
            (b - a - 1 for a, b in zip(sh, sh[1:])), default=0
        )
        want_gap = max(inner, sh[0] - h0, h1 - sh[-1])
        assert g["max_gap_hours"] == want_gap, t
        # the audit's core invariant
        assert g["present_hours"] + g["missing_hours"] == g["expected_hours"]


def test_missing_partition_audit_plan(spark, sf_dir):
    """i20: one event-sized distinct, type-keyed lag over slot rows,
    broadcast span — single-partition exchange only for the 1-row
    global span fold."""
    plan = _plan(spark, sf_dir, "i20_missing_partition_audit")
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- x93


def test_error_rate_monitor_matches_pure_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily: dict[object, list[int]] = {}
    for e in ev:
        a = daily.setdefault(e["ts"].date(), [0, 0])
        a[0] += 1
        a[1] += 1 if e["event_type"] == "error" else 0
    p0 = sum(v[1] for v in daily.values()) / sum(v[0] for v in daily.values())
    z = 1.96
    got = {
        r["day"].date(): r.asDict()
        for r in REGISTRY["x93_error_rate_monitor"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(daily)
    for d, (n, errs) in daily.items():
        g = got[d]
        assert (g["n"], g["n_errors"]) == (n, errs)
        p = errs / n
        center = (p + z * z / (2 * n)) / (1 + z * z / n)
        hw = (z / (1 + z * z / n)) * (
            p * (1 - p) / n + z * z / (4 * n * n)
        ) ** 0.5
        assert abs(g["rate"] - round(p, 6)) < 1e-9
        assert abs(g["wilson_lo"] - round(center - hw, 6)) < 1e-9
        assert abs(g["wilson_hi"] - round(center + hw, 6)) < 1e-9
        assert g["is_anomalous"] == (
            1 if (p0 < center - hw or p0 > center + hw) else 0
        )
    # interval sanity: lo <= rate <= hi everywhere (Wilson property)
    for g in got.values():
        assert g["wilson_lo"] - 1e-9 <= g["rate"] <= g["wilson_hi"] + 1e-9


def test_error_rate_monitor_plan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x93_error_rate_monitor")
    assert "rangepartitioning" not in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ---------------------------------------------------------------- tx31


def test_effective_tokens_consistent_with_dd21(spark, sf_dir):
    """tx31 recomputed from dd21's weights and per-doc token counts:
    raw sums, weighted sums, inflation >= 1 with equality iff no
    duplicates in the source."""
    weights = {
        r["doc_id"]: (r["cluster_size"], r["sample_weight"])
        for r in REGISTRY["dd21_soft_dedup_weights"]
        .spark(spark, sf_dir)
        .collect()
    }
    docs = [
        r.asDict()
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .collect()
    ]
    agg: dict[str, list[float]] = {}
    for d in docs:
        ntoks = len(d["text"].strip().split())
        a = agg.setdefault(d["source"], [0, 0.0, 0])
        a[0] += ntoks
        a[1] += ntoks / weights[d["doc_id"]][0]
        a[2] += 1 if weights[d["doc_id"]][0] > 1 else 0
    got = {
        r["source"]: r.asDict()
        for r in REGISTRY["tx31_effective_tokens"].spark(spark, sf_dir).collect()
    }
    assert got.keys() == agg.keys()
    for s, (raw, eff, ndup) in agg.items():
        g = got[s]
        assert g["raw_tokens"] == raw
        assert abs(g["effective_tokens"] - eff) < 0.02
        assert abs(g["dup_inflation"] - round(raw / eff, 4)) < 1e-3
        assert g["dup_inflation"] >= 1.0
        if ndup == 0:
            assert g["dup_inflation"] == 1.0
        assert g["effective_tokens"] <= g["raw_tokens"] + 1e-9


def test_effective_tokens_plan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tx31_effective_tokens")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


# ----------------------------------------------------------- a9/a10/a11


def test_tpch_trio_matches_pure_python(spark, sf_dir):
    """Q14/Q10/Q6 shapes recomputed serially (a10 in exact cents)."""
    import datetime

    li = [
        r.asDict() for r in _t(spark, sf_dir, "lineitem").collect()
    ]
    orders = {r["o_orderkey"]: r.asDict() for r in _orders_df(spark, sf_dir)}
    parts = {
        r["p_partkey"]: r["p_type"]
        for r in _t(spark, sf_dir, "part").collect()
    }
    custs = {
        r["c_custkey"]: r["c_name"]
        for r in _t(spark, sf_dir, "customer").collect()
    }
    # a9
    num = den = 0.0
    for l in li:
        if (
            datetime.datetime(1996, 9, 1)
            <= l["l_shipdate"]
            < datetime.datetime(1996, 10, 1)
        ):
            rev = l["l_extendedprice"] * (1 - l["l_discount"])
            den += rev
            if parts[l["l_partkey"]] == "PROMO":
                num += rev
    got9 = REGISTRY["a9_promotion_effect"].spark(spark, sf_dir).first()
    assert abs(got9["promo_revenue_pct"] - round(100 * num / den, 4)) < 1e-3
    assert 0 < got9["promo_revenue_pct"] < 100
    # a10
    agg: dict[int, list] = {}
    for l in li:
        o = orders[l["l_orderkey"]]
        if l["l_returnflag"] == "R" and (
            datetime.datetime(1996, 1, 1)
            <= o["o_orderdate"]
            < datetime.datetime(1996, 4, 1)
        ):
            a = agg.setdefault(o["o_custkey"], [0, 0])
            # HALF_UP on the double value (Spark/DuckDB round), not
            # Python's banker's rounding
            a[0] += math.floor(
                l["l_extendedprice"] * (1 - l["l_discount"]) * 100 + 0.5
            )
            a[1] += 1
    top = sorted(agg.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    want10 = [
        (ck, custs[ck], round(cents / 100, 2), n)
        for ck, (cents, n) in top
    ]
    got10 = [
        (r["c_custkey"], r["c_name"], r["revenue"], r["n_items"])
        for r in REGISTRY["a10_returned_items"].spark(spark, sf_dir).collect()
    ]
    assert got10 == want10
    # a11
    pot = sum(
        l["l_extendedprice"] * l["l_discount"]
        for l in li
        if datetime.datetime(1996, 1, 1)
        <= l["l_shipdate"]
        < datetime.datetime(1997, 1, 1)
        and 0.05 <= l["l_discount"] <= 0.07
        and l["l_quantity"] < 24
    )
    got11 = REGISTRY["a11_forecast_revenue_change"].spark(spark, sf_dir).first()
    assert abs(got11["potential_revenue"] - pot) < 0.02


def _orders_df(spark, sf_dir):
    return _t(spark, sf_dir, "orders").collect()


def test_tpch_trio_plans(spark, sf_dir):
    """a9: broadcast part dim + pushed month filter; a10:
    TakeOrderedAndProject, no global sort; a11: all four predicates in
    PushedFilters, zero joins/windows."""
    p9 = _plan(spark, sf_dir, "a9_promotion_effect")
    assert "BroadcastHashJoin" in p9
    assert "PushedFilters: [" in p9 and "l_shipdate" in p9
    p10 = _plan(spark, sf_dir, "a10_returned_items")
    assert "TakeOrderedAndProject" in p10
    assert "rangepartitioning" not in p10
    p11 = _plan(spark, sf_dir, "a11_forecast_revenue_change")
    assert "Join" not in p11 and "Window" not in p11
    pushed = p11.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)


# ----------------------------------------------------------- a12/a13


def test_q4_q13_shapes_match_pure_python(spark, sf_dir):
    import datetime

    orders = [r.asDict() for r in _orders_df(spark, sf_dir)]
    li = [
        (r["l_orderkey"], r["l_shipdate"])
        for r in _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ]
    by_order: dict[int, list] = {}
    for k, sd in li:
        by_order.setdefault(k, []).append(sd)
    # a12
    want12: dict[str, int] = {}
    for o in orders:
        if (
            datetime.datetime(1996, 7, 1)
            <= o["o_orderdate"]
            < datetime.datetime(1996, 10, 1)
        ) and any(
            sd > o["o_orderdate"] for sd in by_order.get(o["o_orderkey"], [])
        ):
            want12[o["o_orderpriority"]] = (
                want12.get(o["o_orderpriority"], 0) + 1
            )
    got12 = {
        r["o_orderpriority"]: r["n_orders"]
        for r in REGISTRY["a12_late_order_priorities"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got12 == want12
    # a13: zero-order customers must appear in bucket 0
    per_cust: dict[int, int] = {
        r["c_custkey"]: 0
        for r in _t(spark, sf_dir, "customer").select("c_custkey").collect()
    }
    for o in orders:
        per_cust[o["o_custkey"]] += 1
    want13: dict[int, int] = {}
    for n in per_cust.values():
        want13[n] = want13.get(n, 0) + 1
    got13 = {
        r["n_orders"]: r["n_customers"]
        for r in REGISTRY["a13_customer_order_distribution"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got13 == want13
    assert sum(got13.values()) == len(per_cust)


def test_q4_semi_join_plan(spark, sf_dir):
    """a12 must plan a LEFT SEMI (EXISTS — one probe per order, no
    multi-line fan-out), with the quarter filter pushed to the orders
    scan; a13 keeps the zero-bucket via a left outer join."""
    p12 = _plan(spark, sf_dir, "a12_late_order_priorities")
    assert "LeftSemi" in p12
    assert "o_orderdate" in p12.split("PushedFilters", 1)[1].split("]", 1)[0]
    p13 = _plan(spark, sf_dir, "a13_customer_order_distribution")
    assert "LeftOuter" in p13
    assert "rangepartitioning" not in p13


# ----------------------------------------------------------- a14/a15


def test_q18_q15_shapes_match_pure_python(spark, sf_dir):
    import datetime

    li = [r.asDict() for r in _t(spark, sf_dir, "lineitem").collect()]
    orders = {r["o_orderkey"]: r.asDict() for r in _orders_df(spark, sf_dir)}
    custs = {
        r["c_custkey"]: r["c_name"]
        for r in _t(spark, sf_dir, "customer").collect()
    }
    sups = {
        r["s_suppkey"]: r["s_name"]
        for r in _t(spark, sf_dir, "supplier").collect()
    }
    # a14
    qty: dict[int, float] = {}
    for l in li:
        qty[l["l_orderkey"]] = qty.get(l["l_orderkey"], 0) + l["l_quantity"]
    big = sorted(
        ((int(q), k) for k, q in qty.items() if q > 300),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    want14 = [
        (
            custs[orders[k]["o_custkey"]],
            k,
            orders[k]["o_orderdate"],
            math.floor(orders[k]["o_totalprice"] * 100 + 0.5),
            q,
        )
        for q, k in big
    ]
    got14 = [
        (
            r["c_name"], r["o_orderkey"], r["o_orderdate"],
            r["totalprice_cents"], r["total_qty"],
        )
        for r in REGISTRY["a14_large_volume_orders"]
        .spark(spark, sf_dir)
        .collect()
    ]
    assert got14 == want14
    assert got14  # threshold chosen so the fixture has survivors
    # a15
    revc: dict[int, int] = {}
    for l in li:
        if (
            datetime.datetime(1996, 1, 1)
            <= l["l_shipdate"]
            < datetime.datetime(1996, 4, 1)
        ):
            revc[l["l_suppkey"]] = revc.get(l["l_suppkey"], 0) + math.floor(
                l["l_extendedprice"] * (1 - l["l_discount"]) * 100 + 0.5
            )
    mx = max(revc.values())
    want15 = {(k, sups[k], v) for k, v in revc.items() if v == mx}
    got15 = {
        (r["s_suppkey"], r["s_name"], r["rev_cents"])
        for r in REGISTRY["a15_top_supplier"].spark(spark, sf_dir).collect()
    }
    assert got15 == want15


def test_q18_q15_plans(spark, sf_dir):
    """a14: the HAVING set drives BROADCAST joins back to the facts,
    top-20 via TakeOrderedAndProject; a15: quarter filter pushed,
    scalar max broadcast, no windows."""
    p14 = _plan(spark, sf_dir, "a14_large_volume_orders")
    assert "BroadcastHashJoin" in p14
    assert "TakeOrderedAndProject" in p14
    assert "rangepartitioning" not in p14
    p15 = _plan(spark, sf_dir, "a15_top_supplier")
    assert "l_shipdate" in p15.split("PushedFilters", 1)[1].split("]", 1)[0]
    assert "Window" not in p15
    assert "rangepartitioning" not in p15


# ----------------------------------------------------------------- a16


def test_q21_blame_matches_pure_python(spark, sf_dir):
    import datetime

    li = [
        r.asDict()
        for r in _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .collect()
    ]
    odate = {
        r["o_orderkey"]: r["o_orderdate"] for r in _orders_df(spark, sf_dir)
    }
    sups = {
        r["s_suppkey"]: r["s_name"]
        for r in _t(spark, sf_dir, "supplier").collect()
    }
    per: dict[int, list] = {}
    for l in li:
        late = l["l_shipdate"] > odate[l["l_orderkey"]] + datetime.timedelta(
            days=60
        )
        a = per.setdefault(l["l_orderkey"], [set(), set()])
        a[0].add(l["l_suppkey"])
        if late:
            a[1].add(l["l_suppkey"])
    wait: dict[int, int] = {}
    for allsup, latesup in per.values():
        if len(allsup) >= 2 and len(latesup) == 1:
            s = next(iter(latesup))
            wait[s] = wait.get(s, 0) + 1
    want = sorted(
        ((n, s) for s, n in wait.items()), key=lambda t: (-t[0], t[1])
    )[:10]
    want = [(s, sups[s], n) for n, s in want]
    got = [
        (r["s_suppkey"], r["s_name"], r["numwait"])
        for r in REGISTRY["a16_waiting_blame"].spark(spark, sf_dir).collect()
    ]
    assert got == want
    assert got  # qualifying orders exist in the fixture


def test_q21_grouped_rewrite_plan(spark, sf_dir):
    """a16 scans the order-lineitem join ONCE (the textbook
    EXISTS/NOT-EXISTS form probes lineitem three times): exactly one
    lineitem scan in the plan, supplier broadcast, top-10 heap."""
    plan = _plan(spark, sf_dir, "a16_waiting_blame")
    # each physical scan prints exactly one Location: [...] detail line
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
