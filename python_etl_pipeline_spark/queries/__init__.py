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
_GATE_ROUND = 12  # the round this prefix was built for

# GATE ARITHMETIC, round-12 state (the r11 verdict's "decide with
# arithmetic in the commit"): mandatory slots are the 4 sentinels +
# the 5 OVERDUE last=r5 queries (x19/x20/x30/x31/x33, deferred once
# in r11 per the documented trade) + the entire 33-query last=r6
# cohort (due now; omitting any would dump it overdue onto r13) +
# the 2 queries whose CODE changed this round (i18 exact salt div,
# i19 array-of-structs unpivot — both r11 advice fixes) = 44, leaving
# exactly 6 slots. Round-12 growth is therefore CAPPED at 6 new
# queries instead of raising the horizon: registry 265 + 6 = 271
# stays under the horizon-6 bound 6*46 + 4 = 280, so every query
# keeps the tighter 6-round freshness guarantee. Forward look: the
# last=r7 cohort is 42 queries, due at r13 latest-overdue-at-r14 —
# r13 must take most of them (42 + 4 sentinels = 46 slots) and can
# add at most ~9 before the registry crosses 280, at which point the
# horizon rises to 7 (bound 326) per the standing discipline.
#
# x81 also saw a code change this round (ewma_horizon now validates
# 0 < alpha < 1 — r11 advice) but takes NO slot, on the same
# documented trade as r11's x76/x82: the change is an entry guard on
# a domain the registered query never leaves (alpha=0.3), its sf0.01
# parity hash was re-verified unchanged this session, and the
# full-registry --parity sweep covers it.
_GATE_PREFIX = [
    # (1) CHANGED this round (r11 advice fixes)
    "i18_join_skew_audit",
    "i19_dq_expectations",
    # (1b) ADDED this round — the four remaining distinct TPC-H
    # shapes (Q2/Q11/Q20/Q22 re-expressed on the lineitem offer
    # relation; the fixture has no partsupp), plus the r11-verdict
    # item-6 pair: the cross-snapshot dedup delta and the monoid
    # canonical re-election. That exhausts the round's capped growth
    # of 6 (registry 265 + 6 = 271 <= the horizon-6 bound 280).
    "a17_min_cost_supplier",
    "a18_important_stock",
    "a19_excess_inventory_suppliers",
    "a20_lost_customers",
    "dd22_dedup_delta",
    "dd23_canonical_reelection",
    # (2) permanent sentinels (4)
    "flagship_customer_segments",
    "f2_safe_date",
    "i2_upsert_last_writer_wins",
    "s4_file_identity",
    # (3a) OVERDUE last=r5 cohort (5) — deferred one round in r11 by
    # the wave-7/8 additions; tests/test_gate_policy.py turns red if
    # any is omitted now.
    "x19_weighted_sample",
    "x20_trailing_range_frame",
    "x30_histogram",
    "x31_column_profile",
    "x33_zorder_key",
    # (3b) the entire last=r6 cohort (33) — due at 12; rotating them
    # all now keeps r13's mandatory set at the 42-query r7 cohort
    # instead of 42 + stragglers.
    "a0_pricing_summary",
    "a1_table_counts",
    "a2_max_watermark",
    "a3_multiagg_summary",
    "a4_distinct_keys",
    "a5_metrics_fold",
    "dd15_line_dedup",
    "f1_safe_val",
    "f3_safe_num",
    "f4_calc_age",
    "f5_tenure_days",
    "f6_customer_segment",
    "f7_region_map",
    "f8_gender_norm",
    "f9_duration_months",
    "f10_risk_category",
    "f11_transaction_category",
    "f12_fraud_flag",
    "f15_md5_hash",
    "j3_fact_dim_join",
    "p1_projection_reorder",
    "p2_pk_filter",
    "p3_null_sentinels",
    "p4_prune_valid_columns",
    "p5_date_range_guard",
    "set1_except_intersect",
    "tx16_langid_confusion",
    "w2_running_sum",
    "w3_topk_per_group",
    "x6_approx_stats",
    "x34_length_buckets",
    "x36_dedup_rate_by_source",
    "x37_corpus_datacard",
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
