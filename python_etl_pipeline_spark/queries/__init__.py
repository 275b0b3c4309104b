"""Driver-contract query registry (package form).

Formerly the single-file ``queries.py`` (12.9k lines); split by family
in round 10 with an identical public contract: ``REGISTRY``,
``register``, ``_t``, ``queries()``, ``oracle_sql()``, the gate prefix,
and every per-query function/constant are re-exported here, so
``from python_etl_pipeline_spark.queries import <anything>`` works
exactly as before the split.

Registration order: submodules import in family order below; within a
family the original definition order is preserved, so QUERIES.md
(grouped by family) and the driver's 50-slot gate prefix are unchanged
by the split.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import (  # noqa: F401
    _FIRST_ROUND,
    _t,
    AS_OF,
    QuerySpec,
    REGISTRY,
    register,
)
from . import _helpers  # noqa: E402
from . import core, dd, ann, tx, hh, mm, xcur, xana, xbiz  # noqa: E402

# Re-export every submodule name — tests pin per-query constants
# (sketch widths, LSH planes, chunker geometry, ...) by importing them
# from this package exactly as they did from the flat module.
for _m in (_helpers, core, dd, ann, tx, hh, mm, xcur, xana, xbiz):
    for _k, _v in vars(_m).items():
        if not _k.startswith("__") and _k not in globals():
            globals()[_k] = _v
del _m, _k, _v

# The external driver's correctness gate verifies exactly the FIRST 50
# ``queries()`` entries against their DuckDB oracles.
#
# STANDING GATE-ROTATION POLICY (adopted round 6, per the r5 verdict;
# staleness anchored to _GATE_ROUND and horizon raised to 4 in round 7
# — arithmetic in tests/test_gate_policy.py's module docstring):
# every round, _GATE_PREFIX =
#   (1) every query ADDED or whose code/oracle CHANGED that round —
#       a prior green row stops vouching the moment the code moves;
#   (2) the ~12 semantically subtle §2 sentinels under permanent watch
#       (f2 date-pivot, o2/o3 keep-last/first, i2 upsert, i3 watermark
#       + anti-join, j1 anti/semi split, s4 file identity, w1/o5
#       sequence engine, flagship) — the queries whose semantics are
#       easiest to silently regress;
#   (3) rotating fill, oldest last-driver-row first, so no query's
#       last hard verification ages out.
# The staleness contract is ENFORCED in tests/test_gate_policy.py,
# which recomputes each query's last-verified round from the
# CORRECTNESS_r*.json files of rounds BEFORE _GATE_ROUND and fails CI
# if a query past the horizon (including brand-new queries, never
# verified) is missing from this prefix.
_GATE_ROUND = 10  # the round this prefix was built for

# GATE ARITHMETIC, round-10 state: registry 216 at the time this
# prefix froze (horizon-5 bound 5*46+4 = 234 still holds; the next
# crossing at ~234 decides horizon 6 vs capping growth — decide in
# the crossing round, arithmetic in the commit). No escalation needed
# this round.
_GATE_PREFIX = [
    # (1) the 23 round-9 additions that have never carried a driver
    # row (judge-parity-verified in r9; the r9 verdict's top action is
    # to give each a hard driver CORRECTNESS row). Four of them also
    # CHANGED this round — x63 (interpolation anchors gated on
    # value-bearing events), mm5 (8x2 banding makes hamming<=4 exact),
    # ann24 (oracle dimension derived from data), x76 (cumulative
    # window re-planned onto the bucketed prefix-sum) — so their slots
    # are doubly required.
    "x63_gap_fill_interpolate",
    "x64_cusum_changepoint",
    "x66_conversion_lag",
    "x67_copurchase_triangles",
    "x68_item_similarity_topk",
    "x69_bm25_topk",
    "x70_quantile_normalize",
    "x71_ab_test_ztest",
    "x72_behavior_entropy",
    "x73_fifo_match",
    "x74_cohort_ltv",
    "x75_rolling_active_users",
    "x76_abc_analysis",
    "x77_seasonal_profile",
    "x78_trend_forecast",
    "ann23_hybrid_rrf",
    "ann24_mips_topk",
    "dd18_exact_span_decontaminate",
    "hh6_kmv_overlap",
    "i11_snapshot_cdc_extract",
    "i12_cdc_compaction",
    "mm5_perceptual_neardup",
    "tx27_pmi_collocations",
    # (2) permanent sentinels (4)
    "flagship_customer_segments",
    "f2_safe_date",
    "i2_upsert_last_writer_wins",
    "s4_file_identity",
    # (4) ADDED this round (10): the user feature pivot, RFM quintile
    # scoring, EWMA smoothing, RAKE keywords, lexical diversity,
    # bag-of-words dedup, cosine range search, Bloom membership, the
    # late-arriving-dimension join, and content-defined chunking —
    # every new query gets a driver row the round it lands.
    "x79_user_feature_pivot",
    "x80_rfm_scores",
    "x81_ewma_smoothing",
    "tx28_rake_keywords",
    "tx29_lexical_diversity",
    "dd19_bow_dedup",
    "ann25_range_search",
    "hh7_bloom_membership",
    "i13_late_arriving_dim",
    "mm6_cdc_chunks",
    # second wave: Gini concentration (prefix-rank engine reuse), the
    # labeled-centroid cluster-quality audit, shared-prefix boilerplate
    # detection, and the AMS F2 sketch contract.
    "x82_gini_concentration",
    "ann26_label_centroid_quality",
    "dd20_prefix_dedup",
    "hh8_ams_f2",
    # third wave: the bitemporal (two-clock) AS-OF join, backlog aging
    # buckets, and the nearest-centroid confusion matrix.
    "i14_bitemporal_asof",
    "x83_backlog_aging",
    "ann27_centroid_confusion",
    # fourth wave: the SRM experiment guard, the late-data watermark
    # profile, and the power-iteration anisotropy audit.
    "x84_srm_check",
    "i15_late_data_profile",
    "ann28_top_eigen",
    # fifth wave: the split-leakage audit, winsorized robust stats,
    # and the GFS snapshot-retention planner. The 23 new-in-round
    # queries plus the 23 never-gated r9 queries plus the 4 sentinels
    # fill all 50 slots — the entire last=r5 rotation cohort
    # (s5/st2/st3/tx15/x2/.../x33 and a0) is displaced to round 11,
    # where the horizon makes them mandatory.
    "x85_split_leakage_audit",
    "x86_winsorized_stats",
    "i16_retention_planner",
]

# Beyond the gate prefix: queries with non-trivial wall time (multi-job
# iterative plans, Python-worker stages, or large compare row counts)
# go last so a time-budgeted run maximizes checked queries; registry
# definition order is kept for everything else.
_EXPENSIVE_LAST = [
    "dd6_lsh_dup_clusters",
    "ann4_kmeans_train",
    "tx10_bigram_lm_score",
    "dd7_simhash_hamming",
    # round-7 heavies (in the r7 gate, so tail-ordered only once they
    # rotate out): ann10 runs two subspace trainings + coarse assign;
    # tx17 re-runs tx10's LM join before the tercile rank
    "ann10_ivfpq_topk",
    "tx17_perplexity_buckets",
    # round-8 heavies: ann11's FIRST invocation per dataset builds the
    # whole IVF-PQ index (later ones serve from the cache); tx19 folds
    # three batch count states before scoring; ann16 runs three Lloyd
    # passes (two base + one warm full) in-plan for oracle replay
    "ann11_ivfpq_from_index",
    "tx19_incremental_lm_score",
    "ann16_centroid_refresh",
    # round-9 heavies: tx22 runs the w-fold window explode + the
    # fine-grained (doc, window) rank; ann18 pays the cached-index
    # build on first invocation like ann11; tx21 explodes every bigram
    # (even fused, the explode is the dominant stage); x48 trains
    # k-means in-plan for the oracle twin
    "tx22_winnow_fingerprint",
    "ann18_index_delete",
    "tx21_dsir_importance",
    "x48_density_downsample",
    # x51 pays ann5's full graph build (Lloyd + per-cell gram) plus an
    # eager edge checkpoint before the three PR iterations
    "x51_graph_pagerank",
    # round-9 third-wave heavies: ann21 runs four searches (brute
    # truth + three probe levels) in one plan by design; dd17 pays
    # dd2's candidate build PLUS the exact-Jaccard truth join; ann22's
    # 48-projection agg is its fixed build cost
    "ann21_probe_recall_curve",
    "dd17_minhash_estimator_error",
    "ann22_binary_hamming_topk",
    # round-9 fourth-wave heavies: x67 pays the bipartite projection +
    # triangle joins; x68 pays the full buyer-keyed co-occurrence
    # build (support-1 pairs dominate before the HAVING)
    "x67_copurchase_triangles",
    "x68_item_similarity_topk",
    # round-10 heavy: ann28 pays the dims^2 covariance self-join before
    # its (cheap) power iterations — tail-ordered once it rotates out
    # of the r10 gate
    "ann28_top_eigen",
]

# Fail fast on typos: a name that silently fell out of the prefix would
# skip its driver verification without any signal.
_unknown = [n for n in _GATE_PREFIX + _EXPENSIVE_LAST if n not in REGISTRY]
assert not _unknown, f"gate/tail entries not in REGISTRY: {_unknown}"
assert len(_GATE_PREFIX) == len(set(_GATE_PREFIX)) == 50, (
    f"_GATE_PREFIX must hold exactly the driver's 50 slots, "
    f"got {len(_GATE_PREFIX)}"
)
# _GATE_PREFIX may temporarily absorb an expensive-tail query (the
# round it is re-gated); _ordered_names drops it from the tail then.


def _ordered_names() -> list[str]:
    tail = [n for n in _EXPENSIVE_LAST if n not in _GATE_PREFIX]
    mid = [n for n in REGISTRY if n not in _GATE_PREFIX and n not in tail]
    return _GATE_PREFIX + mid + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].sql
        for name in _ordered_names()
        if REGISTRY[name].sql is not None
    }
