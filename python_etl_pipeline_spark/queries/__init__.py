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
_GATE_ROUND = 13  # the round this prefix was built for

# GATE ARITHMETIC, round-13 state — THE HORIZON RISES 6 -> 7 (the
# crossing the r12 commit and verdict both forecast, decided here,
# before any round-13 operator work, per the standing discipline):
#
# The horizon-6 bound 6*46 + 4 = 280 is not yet crossed by SIZE
# (registry 271, +4 this round = 275), but the horizon-6 SCHEDULE is
# saturated, which is the binding constraint: last-driver-row cohorts
# are r7:42, r8:46, r9:46, r10:43, r11:44, r12:50 against a per-round
# capacity of 46 non-sentinel slots. Under horizon 6 the r13 gate
# takes the r7 cohort (42) + 4 additions = 46 exactly; the r14 gate
# would then owe the ENTIRE 46-query r8 cohort + 4 sentinels = 50
# slots with ZERO room for round-14's own changed/added queries — and
# any query whose code changes must re-gate immediately (rule 1), so
# a zero-slack round is not a schedule, it is a deadlock. Horizon 6
# admits no steady state once any cohort reaches 46. At horizon 7 the
# bound is 7*46 + 4 = 326 vs registry 275, and the steady-state
# retirement rate is 275/7 ~ 39.3 slots/round against capacity 46 —
# ~6.7 slots/round of standing slack for changes and growth.
# Freshness cost: a query may now wait 7 rounds between driver rows;
# the judge's full-registry parity sweeps (271/271 green in r12)
# remain the between-rows backstop. Next crossing at ~326 or when the
# largest cohort reaches 46 again — decide there.
#
# Round-13 slots: 4 sentinels + the whole 42-query r7 cohort (not
# mandatory until r14 under horizon 7, but rotating oldest-first now
# keeps every later round under its slack) + 4 additions = 50.
_GATE_PREFIX = [
    # (1) ADDED this round (4): per-source unigram KL vs corpus,
    # cross-language near-dup mirrors, leave-one-source-out corpus
    # ablation, and LOO kNN label accuracy. These took the r8-cohort
    # head-start slots the gate commit reserved (o2/i3_antijoin/
    # j1_anti/w1 rotate with their cohort in r14; overdue only at r16
    # under horizon 7). Registry 271 + 4 = 275 <= horizon-7 bound 326.
    "tx32_source_unigram_divergence",
    "dd24_cross_lang_mirrors",
    "x94_loo_source_ablation",
    "ann30_knn_label_accuracy",
    # (2) permanent sentinels (4)
    "flagship_customer_segments",
    "f2_safe_date",
    "i2_upsert_last_writer_wins",
    "s4_file_identity",
    # (3) the entire last=r7 cohort (42), oldest-first rotation.
    "a6_dedup_counters",
    "ann2_ivf_topk",
    "ann4_kmeans_train",
    "ann5_knn_graph",
    "ann6_recall_at_k",
    "ann7_multiprobe_topk",
    "ann9_pq_topk",
    "ann10_ivfpq_topk",
    "dd2_minhash_lsh",
    "dd3_ngram_jaccard",
    "dd5_embedding_neardup",
    "dd6_lsh_dup_clusters",
    "dd11_semantic_dedup",
    "dd12_ngram_containment",
    "dd13_cluster_canonical",
    "dd14_lsh_precision",
    "f13_boolean_recast",
    "f16_case_norms",
    "i3_watermark_append",
    "i4_reconcile_counts",
    "j1_semi_existing_keys",
    "k4_export_nafill",
    "llm_curation_pipeline",
    "o1_digit_sort",
    "o3_dedup_keep_first",
    "o5_offset_slice",
    "s1_allstring_scan",
    "s2_partitioned_scan",
    "s3_multifile_glob",
    "st1_tumbling_window",
    "tx17_perplexity_buckets",
    "tx18_lang_consistency",
    "x1_pivot",
    "x18_sequence_packing",
    "x21_incremental_neardup",
    "x32_corpus_shuffle",
    "x35_stream_neardup",
    "x38_token_sharding",
    "x39_leakage_safe_split",
    "x40_shard_assignment",
    "x41_datacard_incremental",
    "x42_curriculum_order",
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
