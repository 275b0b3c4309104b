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
_GATE_ROUND = 11  # the round this prefix was built for

# GATE ARITHMETIC, round-11 state: registry 265 after this round's 26
# additions; horizon-6 bound 6*46 + 4 = 280 holds with 15 of slack.
# At the recent ~20-26/round growth the crossing lands in round 12 —
# decide there (horizon 7 bound 326, or cap growth), arithmetic in
# the crossing commit as always.
_GATE_PREFIX = [
    # (1a) CHANGED this round — a prior green row stops vouching the
    # moment the code moves: x81 (EWMA re-based per block, oracle
    # rewritten), hh7 (empty-token Bloom guard, both engines), ann24
    # (aug_rnk re-planned as count-of-greater). x76/x82 were initially
    # slotted too (they ride the prefix-sum engine, whose NULL/empty
    # handling changed) but were traded for the wave-6 additions when
    # the 50 slots ran out: their own inputs are never NULL, their
    # sf0.01 hashes were re-verified unchanged this session, and the
    # full-registry --parity sweep covers them — the weakest claim on
    # a slot that a brand-new query needs more.
    "x81_ewma_smoothing",
    "hh7_bloom_membership",
    "ann24_mips_topk",
    # (1b) ADDED this round (10) — every new query gets a driver row
    # the round it lands.
    "i17_survivorship_golden_record",
    "i18_join_skew_audit",
    "tx30_pii_density_audit",
    "x87_basket_lift",
    "x88_cuped_adjustment",
    "x89_peak_concurrency",
    "dd21_soft_dedup_weights",
    "mm7_scene_cuts",
    "ann29_mmr_rerank",
    "hh9_rolling_hll",
    # (2) permanent sentinels (4)
    "flagship_customer_segments",
    "f2_safe_date",
    "i2_upsert_last_writer_wins",
    "s4_file_identity",
    # (3) the entire last=r5 cohort (22) — displaced from the r10 gate
    # by the rotation crunch; at horizon 6 they would turn overdue in
    # round 12, so they rotate in NOW rather than pile onto r12.
    "s5_jdbc_partitioned",
    "st2_session_window",
    "st3_sliding_window",
    "tx15_gopher_rules",
    "x2_rollup",
    "x3_cube",
    "x4_outlier_flag",
    "x5_asof_join",
    "x7_group_zscore",
    "x8_unpivot",
    "x9_resample_ffill",
    "x12_stratified_sample",
    "x13_json_extract",
    "x14_exact_percentile",
    "x15_sessionize",
    "x16_table_diff",
    "x17_salted_agg",
    # x19_weighted_sample, x20_trailing_range_frame, x30_histogram,
    # x31_column_profile and x33_zorder_key were displaced by the
    # wave-7/8 additions (a12-a16): at 11-5 = horizon they are legal
    # to defer ONE round, and tests/test_gate_policy.py mechanically
    # forces them into the r12 gate where they turn overdue.
    # (1b continued) the wave-3/4 additions — new queries displace
    # rotating fill, never the overdue cohort.
    "i19_dq_expectations",
    "x90_seasonal_anomaly",
    "mm8_chunk_dedup_savings",
    "x91_pareto_frontier",
    "x92_top_paths",
    "i20_missing_partition_audit",
    "x93_error_rate_monitor",
    "tx31_effective_tokens",
    "a9_promotion_effect",
    "a10_returned_items",
    "a11_forecast_revenue_change",
    "a12_late_order_priorities",
    "a13_customer_order_distribution",
    "a14_large_volume_orders",
    "a15_top_supplier",
    "a16_waiting_blame",
    # No rotating fill this round: 26 new + 3 changed + 4 sentinels +
    # 17 of the 22-query last=r5 cohort consume all 50 slots. Round
    # 12 owes: x19/x20/x30/x31/x33 (overdue at 12) + the last=r6
    # cohort (33, due at 12) = 38 mandatory slots, ~8 free for r12.
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
