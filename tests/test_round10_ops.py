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
