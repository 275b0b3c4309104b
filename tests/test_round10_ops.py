"""Round-10 operators: feature pivot, RFM, EWMA, keywords, lexical
diversity, bag-of-words dedup, range search, Bloom membership, the
late-arriving-dimension join and content-defined chunking — pure-Python
recomputes plus the plan shapes that matter at 100 TB."""

from __future__ import annotations

import contextlib
import hashlib
import io
import math

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


def _docs(spark, sf_dir):
    return {
        r["doc_id"]: r["text"]
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }


# ---------------------------------------------------------------- x79


def test_user_feature_pivot_matches_pure_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    want: dict[int, dict] = {}
    for e in ev:
        u = want.setdefault(
            e["user_id"], {f"n_{t}": 0 for t in types} | {"cents": 0.0}
        )
        u[f"n_{e['event_type']}"] += 1
        if e["event_type"] == "purchase" and e["value"] is not None:
            u["cents"] += e["value"]
    got = {
        r["user_id"]: r.asDict()
        for r in REGISTRY["x79_user_feature_pivot"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        for t in types:
            assert g[f"n_{t}"] == w[f"n_{t}"], (uid, t)
        assert g["purchase_cents"] == round(w["cents"] * 100)


def test_user_feature_pivot_single_agg_no_expand(spark, sf_dir):
    """The fixed value list compiles the pivot into conditional
    aggregates inside ONE user-keyed hash agg — no Expand node, no
    second shuffle, no distinct-scan job for the value list."""
    plan = _plan(spark, sf_dir, "x79_user_feature_pivot")
    assert "Expand" not in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("hashpartitioning") == 1


# ---------------------------------------------------------------- x80


def _pctl(sorted_vals, q):
    """numpy-style linear interpolation on pre-sorted values."""
    h = (len(sorted_vals) - 1) * q
    lo, f = int(math.floor(h)), h - math.floor(h)
    hi = min(lo + 1, len(sorted_vals) - 1)
    return sorted_vals[lo] + f * (sorted_vals[hi] - sorted_vals[lo])


def test_rfm_scores_match_pure_python(spark, sf_dir):
    from datetime import datetime

    ev = _events(spark, sf_dir)
    ref = datetime(2024, 2, 1)
    m: dict[int, dict] = {}
    for e in ev:
        u = m.setdefault(
            e["user_id"], {"last": e["ts"], "freq": 0, "cents": 0.0}
        )
        u["last"] = max(u["last"], e["ts"])
        if e["event_type"] == "purchase":
            u["freq"] += 1
            if e["value"] is not None:
                u["cents"] += e["value"]
    for u in m.values():
        # Spark datediff() counts calendar-day boundaries, not 24h gaps
        u["r_days"] = (ref.date() - u["last"].date()).days
        u["mon"] = round(u["cents"] * 100)
    qs = (0.2, 0.4, 0.6, 0.8)
    rb = [_pctl(sorted(u["r_days"] for u in m.values()), q) for q in qs]
    fb = [_pctl(sorted(u["freq"] for u in m.values()), q) for q in qs]
    mb = [_pctl(sorted(u["mon"] for u in m.values()), q) for q in qs]
    got = {
        r["user_id"]: r.asDict()
        for r in REGISTRY["x80_rfm_scores"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(m)
    for uid, u in m.items():
        g = got[uid]
        assert g["r_days"] == u["r_days"]
        assert g["freq"] == u["freq"]
        assert g["mon_cents"] == u["mon"]
        assert g["r_score"] == 5 - sum(u["r_days"] > b for b in rb)
        assert g["f_score"] == 1 + sum(u["freq"] > b for b in fb)
        assert g["m_score"] == 1 + sum(u["mon"] > b for b in mb)
    # quintiles are non-degenerate on this data: every score in 1..5
    assert {g["r_score"] for g in got.values()} <= set(range(1, 6))
    assert len({g["f_score"] for g in got.values()}) >= 2


def test_rfm_boundary_agg_is_bounded_single_row(spark, sf_dir):
    """Boundary-based quintiles, not ntile(): the only single-partition
    exchange is the 12-value global percentile agg (one row), never the
    user metrics themselves."""
    import re

    plan = _plan(spark, sf_dir, "x80_rfm_scores")
    # 'percentile(' is fine; a bare ntile() window is not
    assert not re.search(r"\bntile\(", plan)
    assert plan.count("Exchange SinglePartition") <= 1
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------- x81


def test_ewma_matches_pure_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily: dict[tuple, int] = {}
    for e in ev:
        daily[(e["event_type"], e["ts"].date())] = (
            daily.get((e["event_type"], e["ts"].date()), 0) + 1
        )
    by_type: dict[str, list] = {}
    for (t, d), n in sorted(daily.items()):
        by_type.setdefault(t, []).append((d, n))
    a = 0.3
    want = {}
    for t, series in by_type.items():
        d0, dmax = series[0][0], series[-1][0]
        imax = (dmax - d0).days
        xw = nw = 0.0
        for d, n in series:  # same order, same rebased weights
            i = (d - d0).days
            wt = (1 - a) ** (imax - i)
            xw += n * wt
            nw += wt
            want[(t, d)] = (n, xw / nw)
    got = {
        (r["event_type"], r["day"].date()): (r["n"], r["ewma"])
        for r in REGISTRY["x81_ewma_smoothing"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, (n, e) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - e) <= 5e-4, (k, got[k][1], e)
    # smoothing property: EWMA varies less than the raw series
    for t, series in by_type.items():
        if len(series) < 3:
            continue
        raw = [n for _, n in series]
        sm = [got[(t, d)][1] for d, _ in series]
        raw_jump = max(abs(b - a_) for a_, b in zip(raw, raw[1:]))
        sm_jump = max(abs(b - a_) for a_, b in zip(sm, sm[1:]))
        assert sm_jump <= raw_jump


def test_ewma_long_series_no_nan(spark):
    """r10 ADVICE regression: the old per-key (1-a)^(imax-i) rebase
    underflowed to exactly 0 past ~2085 days at alpha=0.3, giving the
    EARLY rows of a >5.7-year series 0/0 = NaN. The block-rebased form
    must match the exact serial recurrence at every row of an
    8000-day sparse series (gaps included), with no NaN anywhere."""
    import datetime
    import math
    import random

    from python_etl_pipeline_spark.operators.aggregate import (
        ewma_over_daily,
    )

    rng = random.Random(81)
    a = 0.3
    d0 = datetime.datetime(2000, 1, 1)
    rows = []
    series: dict[str, list] = {"k1": [], "k2": []}
    for key, step in (("k1", 1), ("k2", 7)):  # dense and weekly-sparse
        day = 0
        while day < 8000:
            n = rng.randrange(1, 1000)
            rows.append((key, d0 + datetime.timedelta(days=day), n))
            series[key].append((day, n))
            day += step if rng.random() < 0.9 else step * 40  # gaps
    daily = spark.createDataFrame(rows, "event_type string, day timestamp, n long")
    got = {
        (r["event_type"], (r["day"] - d0).days): r["ewma"]
        for r in ewma_over_daily(daily, "event_type", a).collect()
    }
    assert all(e is not None and not math.isnan(e) for e in got.values())
    for key, ser in series.items():
        xw = nw = 0.0
        prev = None
        for day, n in ser:
            decay = (1 - a) ** (day - prev) if prev is not None else 0.0
            xw = xw * decay + n
            nw = nw * decay + 1.0
            prev = day
            want = xw / nw
            assert abs(got[(key, day)] - want) <= max(
                5e-4, 1e-9 * abs(want)
            ), (key, day, got[(key, day)], want)


def test_ewma_windows_type_keyed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x81_ewma_smoothing")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(event_type" in plan


# --------------------------------------------------------------- tx28


def test_rake_keywords_match_pure_python(spark, sf_dir):
    stop = {"the", "a", "of", "and", "to", "in", "is", "it"}
    want = {}
    for did, text in _docs(spark, sf_dir).items():
        freq: dict[str, int] = {}
        for tok in text.strip().split():
            if tok and tok not in stop:
                freq[tok] = freq.get(tok, 0) + 1
        top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rnk, (term, f_) in enumerate(top, 1):
            want[(did, rnk)] = (term, f_)
    got = {
        (r["doc_id"], r["rnk"]): (r["term"], r["freq"])
        for r in REGISTRY["tx28_rake_keywords"].spark(spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------- tx29


def test_lexical_diversity_matches_pure_python(spark, sf_dir):
    got = {
        r["doc_id"]: r.asDict()
        for r in REGISTRY["tx29_lexical_diversity"]
        .spark(spark, sf_dir)
        .collect()
    }
    docs = _docs(spark, sf_dir)
    assert set(got) == set(docs)
    for did, text in docs.items():
        toks = text.strip().split()
        freq: dict[str, int] = {}
        for t in toks:
            freq[t] = freq.get(t, 0) + 1
        n, v = len(toks), len(freq)
        h = (
            0.0
            if n == 1
            else (math.log(n) + sum(-c * math.log(c) for c in freq.values()) / n)
            / math.log(2)
        )
        g = got[did]
        assert g["n_tokens"] == n and g["n_types"] == v
        assert abs(g["ttr"] - v / n) <= 5e-5
        assert abs(g["entropy_bits"] - h) <= 5e-4
        # entropy is bounded by log2(n_types) (uniform case)
        assert g["entropy_bits"] <= math.log2(max(v, 2)) + 1e-9


# --------------------------------------------------------------- dd19


def test_bow_dedup_matches_pure_python_and_catches_reorders(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    groups: dict[str, list] = {}
    for did, text in docs.items():
        h = hashlib.md5(
            " ".join(sorted(text.strip().split())).encode()
        ).hexdigest()
        groups.setdefault(h, []).append(did)
    got = {
        r["bow_hash"]: (r["keep_id"], r["n_copies"])
        for r in REGISTRY["dd19_bow_dedup"].spark(spark, sf_dir).collect()
    }
    assert got == {
        h: (min(ids), len(ids)) for h, ids in groups.items()
    }
    # the property dd1 lacks: a token-order permutation of an existing
    # doc lands in ITS group, not a new one
    some = next(iter(docs.values()))
    reordered = " ".join(reversed(some.strip().split()))
    h1 = hashlib.md5(" ".join(sorted(some.strip().split())).encode()).hexdigest()
    h2 = hashlib.md5(
        " ".join(sorted(reordered.split())).encode()
    ).hexdigest()
    assert h1 == h2
    assert hashlib.md5(some.encode()) != hashlib.md5(reordered.encode())


def test_bow_dedup_one_shuffle_no_text_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dd19_bow_dedup")
    assert plan.count("hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    # only the 16-byte hash crosses the exchange, never the text
    assert "text" not in plan.split("Exchange")[1].split("\n")[0]


# -------------------------------------------------------------- ann25


def test_range_search_matches_pure_python(spark, sf_dir):
    rows = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    q = vecs[0]
    qn = math.sqrt(sum(x * x for x in q))
    want = {}
    for vid, v in vecs.items():
        if vid == 0:
            continue
        dot = sum(a * b for a, b in zip(v, q))
        cos = dot / (math.sqrt(sum(a * a for a in v)) * qn)
        if cos >= 0.25:
            want[vid] = cos
    got = {
        r["vec_id"]: r["cos"]
        for r in REGISTRY["ann25_range_search"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for vid, c in want.items():
        assert abs(got[vid] - c) <= 5e-4


def test_range_search_no_ordering_stage(spark, sf_dir):
    """Radius search is a pure filter — no top-k cut, no sort, no
    single-partition stage anywhere; the query vector is the only
    broadcast."""
    plan = _plan(spark, sf_dir, "ann25_range_search")
    assert "TakeOrdered" not in plan
    assert "Sort" not in plan.replace("SortMergeJoin", "")
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- hh7


def _bloom_pos(tok: str, j: int, m: int = 256) -> int:
    h = hashlib.md5(f"bf{j}|{tok}".encode()).hexdigest()[:4]
    return int(h, 16) % m


def test_bloom_membership_matches_pure_python(spark, sf_dir):
    from python_etl_pipeline_spark.queries import _HH7_K, _HH7_PROBES

    rows = (
        _t(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    vocab: dict[str, set] = {}
    for r in rows:
        vocab.setdefault(r["source"], set()).update(r["text"].strip().split())
    bits = {
        s: {
            _bloom_pos(t, j)
            for t in toks
            for j in range(_HH7_K)
        }
        for s, toks in vocab.items()
    }
    got = {
        (r["source"], r["probe"]): (r["member"], r["bloom_hit"])
        for r in REGISTRY["hh7_bloom_membership"].spark(spark, sf_dir).collect()
    }
    assert set(got) == {
        (s, p) for s in vocab for p in _HH7_PROBES
    }
    absent_hits = 0
    for (s, p), (member, hit) in got.items():
        assert member == (1 if p in vocab[s] else 0)
        want_hit = all(
            _bloom_pos(p, j) in bits[s] for j in range(_HH7_K)
        )
        assert hit == (1 if want_hit else 0)
        # THE bloom contract: no false negatives, ever
        assert hit >= member, (s, p)
        absent_hits += member == 0
    # the probe list exercises both present and absent tokens
    members = [m for m, _ in got.values()]
    assert 0 < sum(members) < len(members)


# ---------------------------------------------------------------- i13


def test_late_arriving_dim_keeps_and_flags_orphan_facts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    out = {
        r["o_orderkey"]: r.asDict()
        for r in REGISTRY["i13_late_arriving_dim"].spark(spark, sf_dir).collect()
    }
    # every fact survives the join — nothing silently dropped
    assert set(out) == {r["o_orderkey"] for r in o}
    names = {
        r["c_custkey"]: r["c_name"]
        for r in _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .collect()
    }
    n_inferred = 0
    for r in o:
        g = out[r["o_orderkey"]]
        if r["o_custkey"] % 97 == 0:
            assert g["inferred"] == 1
            assert g["cust_name"] == "INFERRED"
            assert g["nationkey"] == -1
            n_inferred += 1
        else:
            assert g["inferred"] == 0
            assert g["cust_name"] == names[r["o_custkey"]]
    assert n_inferred > 0  # fixture actually exercises the late path


def test_late_arriving_dim_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "i13_late_arriving_dim")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------- mm6


def _cdc_chunks(text: str, w: int = 8, stride: int = 8):
    n = len(text)
    bounds = [1]
    kmax = max((n - w) // stride, 0)
    for k in range(1, kmax + 1):
        pos = k * stride + 1
        h = hashlib.md5(text[pos - 1 : pos - 1 + w].encode()).hexdigest()
        if h[0] in ("0", "1"):
            bounds.append(pos)
    out = []
    for i, b in enumerate(bounds):
        end = bounds[i + 1] if i + 1 < len(bounds) else n + 1
        seg = text[b - 1 : end - 1]
        out.append((b, end - b, hashlib.md5(seg.encode()).hexdigest()))
    return out


def test_cdc_chunks_match_pure_python_and_tile_exactly(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    got: dict[int, list] = {}
    for r in REGISTRY["mm6_cdc_chunks"].spark(spark, sf_dir).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_start"], r["chunk_len"], r["chunk_digest"])
        )
    assert set(got) == set(docs)
    for did, text in docs.items():
        chunks = sorted(got[did])
        assert chunks == _cdc_chunks(text)
        # chunks tile the payload exactly: no gap, no overlap
        pos = 1
        for start, ln, _ in chunks:
            assert start == pos
            pos += ln
        assert pos == len(text) + 1


def test_cdc_chunks_insertion_locality(spark, sf_dir):
    """The property fixed blocks lack: appending a prefix re-chunks
    only up to the first surviving boundary — every boundary at
    position > shift still exists shifted, so most chunk digests
    survive (mm4's fixed blocks all shift and zero digests survive)."""
    text = next(t for t in _docs(spark, sf_dir).values() if len(t) > 200)
    base = {d for _, _, d in _cdc_chunks(text)}
    # insert 8 chars (one full stride) at the very front: interior
    # windows all realign exactly one stride later
    edited = "ZZZZZZZZ" + text
    after = {d for _, _, d in _cdc_chunks(edited)}
    shared = base & after
    assert len(shared) >= max(len(base) - 2, 1)


def test_cdc_chunks_doc_keyed_plan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "mm6_cdc_chunks")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(doc_id" in plan


# ---------------------------------------------------------------- x82


def test_gini_matches_pure_python(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    ).collect()
    rev: dict[int, int] = {}
    for r in li:
        rc = round(r["l_extendedprice"] * 100) * round(
            100 - r["l_discount"] * 100
        )
        rev[r["l_partkey"]] = rev.get(r["l_partkey"], 0) + rc
    xs = [rc for _, rc in sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))]
    n = len(xs)
    s0 = sum(xs)
    s1 = sum(i * x for i, x in enumerate(xs, 1))
    gini = (2.0 * s1) / (n * s0) - (n + 1.0) / n
    row = REGISTRY["x82_gini_concentration"].spark(spark, sf_dir).collect()
    assert len(row) == 1
    assert row[0]["n_parts"] == n
    assert abs(row[0]["gini"] - gini) <= 5e-6
    assert 0.0 <= row[0]["gini"] < 1.0  # non-degenerate fixture


def test_gini_rank_is_bucketed_no_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x82_gini_concentration")
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(__bkt" in plan
    # only the 1-row final fold may pass a single partition
    assert plan.count("Exchange SinglePartition") <= 1


# -------------------------------------------------------------- ann26


def test_label_centroid_quality_matches_pure_python(spark, sf_dir):
    rows = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            [float(x) for x in r["embedding"]]
        )
    cents = {
        lab: [sum(col) / len(vs) for col in zip(*vs)]
        for lab, vs in by_label.items()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    want = {}
    for lab, vs in by_label.items():
        coh = sum(cos(v, cents[lab]) for v in vs) / len(vs)
        other = max(
            cos(cents[lab], c) for l2, c in cents.items() if l2 != lab
        )
        want[lab] = (len(vs), coh, other, 1 if coh > other else 0)
    got = {
        r["label"]: r.asDict()
        for r in REGISTRY["ann26_label_centroid_quality"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(want)
    for lab, (n, coh, other, sep) in want.items():
        g = got[lab]
        assert g["n_members"] == n
        assert abs(g["cohesion"] - coh) <= 5e-4
        assert abs(g["max_other_centroid_cos"] - other) <= 5e-4
        assert g["separated"] == sep
    # fixture reality check only: the sf0.001 clusters are NOISY
    # (cohesion ~0.14 vs inter-centroid ~0.18), which is exactly what
    # the audit exists to surface — so pin that the numbers are alive
    # (positive cohesion, a non-constant separated column is allowed
    # to be almost all zeros here), not that the clusters are good
    assert all(g["cohesion"] > 0 for g in got.values())


def test_label_centroid_joins_broadcast_matrix(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ann26_label_centroid_quality")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "rangepartitioning" not in plan


# --------------------------------------------------------------- dd20


def test_prefix_dedup_matches_pure_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    groups: dict[str, list] = {}
    fulls: dict[str, set] = {}
    for did, text in docs.items():
        ph = hashlib.md5(text[:64].encode()).hexdigest()
        groups.setdefault(ph, []).append(did)
        fulls.setdefault(ph, set()).add(
            hashlib.md5(text.encode()).hexdigest()
        )
    got = {
        r["prefix_hash"]: (r["keep_id"], r["n_docs"], r["n_variants"])
        for r in REGISTRY["dd20_prefix_dedup"].spark(spark, sf_dir).collect()
    }
    assert got == {
        ph: (min(ids), len(ids), len(fulls[ph]))
        for ph, ids in groups.items()
    }
    # the discrimination the op exists for: a shared prefix with a
    # different body is n_docs > n_variants... construct it in python
    a, b = "HEADER " * 12 + "unique body one", "HEADER " * 12 + "other body"
    assert hashlib.md5(a[:64].encode()) .hexdigest() == hashlib.md5(
        b[:64].encode()
    ).hexdigest()


def test_prefix_dedup_one_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dd20_prefix_dedup")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------- hh8


def test_ams_f2_matches_pure_python_and_is_unbiased_ish(spark, sf_dir):
    docs = (
        _t(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    tf: dict[tuple, int] = {}
    for r in docs:
        for tok in r["text"].strip().split():
            tf[(r["source"], tok)] = tf.get((r["source"], tok), 0) + 1
    sources = {s for s, _ in tf}
    want = {}
    for s in sources:
        items = [(tok, c) for (s2, tok), c in tf.items() if s2 == s]
        f2 = sum(c * c for _, c in items)
        sks = []
        for j in range(8):
            sk = 0
            for tok, c in items:
                h = hashlib.md5(f"ams{j}|{tok}".encode()).hexdigest()[0]
                sign = 1 if int(h, 16) % 2 == 0 else -1
                sk += c * sign
            sks.append(sk)
        est = sum(x * x for x in sks) // 8
        want[s] = (f2, est)
    got = {
        r["source"]: (r["f2_exact"], r["f2_est"], r["rel_error"])
        for r in REGISTRY["hh8_ams_f2"].spark(spark, sf_dir).collect()
    }
    assert set(got) == sources
    rel_errs = []
    for s, (f2, est) in want.items():
        assert got[s][0] == f2
        assert got[s][1] == est
        rel_errs.append(got[s][2])
    # estimator sanity on this fixture: 8 sign rows keep the MEAN
    # relative error bounded even if single sources wobble
    assert sum(rel_errs) / len(rel_errs) < 1.0


def test_ams_f2_single_source_keyed_fold(spark, sf_dir):
    plan = _plan(spark, sf_dir, "hh8_ams_f2")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(source" in plan


# ---------------------------------------------------------------- i14


def test_bitemporal_asof_time_travel_semantics(spark, sf_dir):
    """as_of_tx=1 sees the ORIGINAL segment even for later-corrected
    keys; as_of_tx=2 sees CORRECTED exactly for %7 keys. Every fact
    resolves exactly one dimension row."""
    segs = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    facts = [
        (r["o_orderkey"], r["o_custkey"])
        for r in _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
        if r["o_orderkey"] % 10 == 0
    ]
    got = {
        r["o_orderkey"]: (r["as_of_tx"], r["attr"])
        for r in REGISTRY["i14_bitemporal_asof"].spark(spark, sf_dir).collect()
    }
    assert set(got) == {k for k, _ in facts}
    corrected_seen = original_seen = 0
    for ok, ck in facts:
        tx = 1 + (ok // 10) % 2
        want = (
            "CORRECTED" if (tx == 2 and ck % 7 == 0) else segs[ck]
        )
        assert got[ok] == (tx, want), (ok, ck)
        if tx == 1 and ck % 7 == 0:
            original_seen += 1  # time travel ignored the correction
        if tx == 2 and ck % 7 == 0:
            corrected_seen += 1
    assert original_seen > 0 and corrected_seen > 0


def test_bitemporal_join_is_pk_keyed(spark, sf_dir):
    """Both interval predicates ride as join residuals on one PK-keyed
    join — no cartesian, no range partitioning."""
    plan = _plan(spark, sf_dir, "i14_bitemporal_asof")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------- x83


def test_backlog_aging_matches_pure_python(spark, sf_dir):
    from datetime import datetime

    ref = datetime(2001, 8, 2)
    rows = (
        _t(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority", "o_orderdate")
        .collect()
    )
    want: dict[tuple, list] = {}
    for r in rows:
        if r["o_orderstatus"] == "F":
            continue
        age = (ref.date() - r["o_orderdate"].date()).days
        b = (
            "0-1y" if age < 365
            else "1-2y" if age < 730
            else "2-4y" if age < 1460
            else "4y+"
        )
        want.setdefault((r["o_orderpriority"], b), []).append(age)
    got = {
        (r["o_orderpriority"], r["age_bucket"]): (
            r["n_orders"], r["oldest_days"]
        )
        for r in REGISTRY["x83_backlog_aging"].spark(spark, sf_dir).collect()
    }
    assert got == {
        k: (len(v), max(v)) for k, v in want.items()
    }
    assert len(got) > 1  # fixture spans buckets/priorities


def test_backlog_aging_pushes_status_filter(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x83_backlog_aging")
    assert "PushedFilters" in plan
    assert "o_orderstatus" in plan.split("PushedFilters")[1][:200]
    assert "Exchange SinglePartition" not in plan


# -------------------------------------------------------------- ann27


def test_centroid_confusion_matches_pure_python(spark, sf_dir):
    rows = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    vecs = {
        r["vec_id"]: (r["label"], [float(x) for x in r["embedding"]])
        for r in rows
    }
    by_label: dict[int, list] = {}
    for lab, v in vecs.values():
        by_label.setdefault(lab, []).append(v)
    cents = {
        lab: [sum(c) / len(vs) for c in zip(*vs)]
        for lab, vs in by_label.items()
    }

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )

    want: dict[tuple, int] = {}
    for lab, v in vecs.values():
        pred = min(
            cents, key=lambda cl: (-cos(v, cents[cl]), cl)
        )
        want[(lab, pred)] = want.get((lab, pred), 0) + 1
    got = {
        (r["true_label"], r["pred_label"]): r["n"]
        for r in REGISTRY["ann27_centroid_confusion"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want
    # the audit is meaningful: the diagonal clearly beats the 1/|labels|
    # chance rate (the fixture's clusters are noisy — ~37% accuracy at
    # sf0.001 — so "mostly diagonal" would overfit the fixture)
    diag = sum(n for (t, p), n in got.items() if t == p)
    n_labels = len({t for t, _ in got})
    assert diag * n_labels > 2 * sum(got.values())


def test_centroid_confusion_broadcasts_matrix(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ann27_centroid_confusion")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------- x84


def test_srm_check_matches_pure_python(spark, sf_dir):
    ev = _events(spark, sf_dir)
    users = {e["user_id"] for e in ev}
    na = sum(
        1 for u in users if hashlib.md5(str(u).encode()).hexdigest() < "8"
    )
    nb = len(users) - na
    exp = (na + nb) / 2.0
    chi2 = (na - exp) ** 2 / exp + (nb - exp) ** 2 / exp
    row = REGISTRY["x84_srm_check"].spark(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert abs(r["chi2"] - chi2) <= 5e-4
    assert r["srm_flag"] == (1 if chi2 > 3.841 else 0)
    # no healthy-split assertion: at the sf0.001 fixture's 15 users a
    # fair split still flags often (the observed 3/12 rightly does) —
    # the 5% false-positive rate is a large-N property


# ---------------------------------------------------------------- i15


def test_late_data_profile_matches_pure_python(spark, sf_dir):
    # replay the deterministic delayed channel: every 7th event
    # arrives 10 sequence slots late
    ev = sorted(
        _events(spark, sf_dir),
        key=lambda e: (
            e["event_id"] + (10 if e["event_id"] % 7 == 0 else 0),
            e["event_id"],
        ),
    )
    hwm: dict[int, object] = {}
    lates: dict[str, list] = {}
    for e in ev:
        prev = hwm.get(e["user_id"])
        hwm[e["user_id"]] = e["ts"] if prev is None else max(prev, e["ts"])
        delta = hwm[e["user_id"]] - e["ts"]
        late = int(
            (delta.days * 86_400_000_000
             + delta.seconds * 1_000_000
             + delta.microseconds) // 1_000_000
        )
        lates.setdefault(e["event_type"], []).append(late)
    got = {
        r["event_type"]: r.asDict()
        for r in REGISTRY["i15_late_data_profile"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(lates)
    for t, xs in lates.items():
        g = got[t]
        assert g["n_events"] == len(xs)
        assert g["n_late"] == sum(1 for x in xs if x > 0)
        assert g["max_late_s"] == max(xs)
        assert abs(g["p95_late_s"] - _pctl(sorted(xs), 0.95)) <= 0.02
    # the profile is informative: the fixture's id order is not the
    # time order, so SOME lateness exists to profile
    assert any(g["n_late"] > 0 for g in got.values())


def test_late_data_profile_one_user_keyed_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "i15_late_data_profile")
    assert "Exchange SinglePartition" not in plan.split("ObjectHashAggregate")[0]
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(user_id" in plan


# -------------------------------------------------------------- ann28


def test_top_eigen_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    X = np.array(
        [[float(x) for x in r["embedding"]] for r in rows], dtype=np.float64
    )
    Xc = X - X.mean(axis=0)
    C = Xc.T @ Xc / (X.shape[0] - 1)
    # replay the exact 3-iteration power method
    u = np.ones(C.shape[0]) / np.sqrt(C.shape[0])
    us = []
    for _ in range(3):
        w = C @ u
        u = w / np.linalg.norm(w)
        us.append(u)
    lam = float(u @ C @ u)
    row = REGISTRY["ann28_top_eigen"].spark(spark, sf_dir).collect()[0]
    assert row["n_dims"] == C.shape[0]
    assert abs(row["top_eigenvalue"] - lam) <= 5e-4
    assert abs(row["explained_share"] - lam / np.trace(C)) <= 5e-4
    assert abs(
        row["convergence_cos"] - abs(float(us[1] @ us[2]))
    ) <= 5e-4
    # the Rayleigh quotient never exceeds the true top eigenvalue
    true_top = float(np.linalg.eigvalsh(C)[-1])
    assert row["top_eigenvalue"] <= true_top + 1e-6
    assert 0 < row["explained_share"] <= 1


def test_top_eigen_covariance_is_the_only_corpus_stage(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ann28_top_eigen")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan
    # power iterations run on the checkpointed 4096-cell matrix, so
    # the embeddings scan appears at most... (checkpoint truncates) —
    # pin instead that no single-partition exchange exists
    assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------- x85


def test_split_leakage_audit_matches_pure_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)

    def bucket(did):
        return int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16) % 100

    fps = set()
    for did, text in docs.items():
        b = bucket(did)
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        fps.add((hashlib.md5(text[:64].encode()).hexdigest(), split))
    want: dict[tuple, int] = {}
    by_fp: dict[str, set] = {}
    for fp, split in fps:
        by_fp.setdefault(fp, set()).add(split)
    for fp, splits in by_fp.items():
        ss = sorted(splits)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (r["split_a"], r["split_b"]): r["n_shared_fingerprints"]
        for r in REGISTRY["x85_split_leakage_audit"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want
    # the audit exists because leakage exists on this fixture
    assert sum(got.values()) > 0


def test_split_leakage_fp_keyed_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x85_split_leakage_audit")
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------- x86


def test_winsorized_stats_match_pure_python(spark, sf_dir):
    rows = (
        _t(spark, sf_dir, "documents")
        .select("source", "n_chars")
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
    got = {
        r["source"]: r.asDict()
        for r in REGISTRY["x86_winsorized_stats"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(by_src)
    for src, xs in by_src.items():
        p05 = _pctl(sorted(xs), 0.05)
        p95 = _pctl(sorted(xs), 0.95)
        wv = [min(max(float(x), p05), p95) for x in xs]
        g = got[src]
        assert g["n_docs"] == len(xs)
        assert abs(g["raw_mean"] - sum(xs) / len(xs)) <= 5e-4
        assert abs(g["winsorized_mean"] - sum(wv) / len(wv)) <= 5e-4
        assert g["n_clamped"] == sum(1 for x, w in zip(xs, wv) if w != x)
        # robustness property: the winsorized mean sits inside the fences
        assert p05 - 1e-9 <= g["winsorized_mean"] <= p95 + 1e-9


# ---------------------------------------------------------------- i16


def test_retention_planner_matches_pure_python(spark, sf_dir):
    import calendar
    from datetime import datetime

    days = {
        r["o_orderdate"].date()
        for r in _t(spark, sf_dir, "orders").select("o_orderdate").collect()
    }
    from datetime import timedelta

    ref = datetime.combine(max(days), datetime.min.time()) + timedelta(days=1)
    got = {
        r["snap"].date(): (r["reason"], r["retained"])
        for r in REGISTRY["i16_retention_planner"].spark(spark, sf_dir).collect()
    }
    assert set(got) == days
    reasons = {"daily": 0, "monthly": 0, "yearly": 0, "expire": 0}
    for d in days:
        age = (ref.date() - d).days
        is_me = d.day == calendar.monthrange(d.year, d.month)[1]
        is_ye = d.month == 12 and d.day == 31
        if age <= 30:
            want = ("daily", 1)
        elif is_ye:
            want = ("yearly", 1)
        elif is_me and age <= 365:
            want = ("monthly", 1)
        else:
            want = ("expire", 0)
        assert got[d] == want, d
        reasons[want[0]] += 1
    # every tier is exercised by the fixture's 6.5-year date range
    assert all(v > 0 for v in reasons.values()), reasons


def test_retention_planner_map_side_only(spark, sf_dir):
    """Pure map-side date arithmetic over the snapshot distinct: the
    only join is the single-row newest-snapshot anchor broadcast, and
    the only single-partition exchange is that 1-row agg."""
    plan = _plan(spark, sf_dir, "i16_retention_planner")
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange SinglePartition") <= 1
