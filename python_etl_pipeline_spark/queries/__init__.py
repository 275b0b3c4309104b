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
_GATE_ROUND = 14  # the round this prefix was built for

# GATE ARITHMETIC, round-14 state — HORIZON STAYS 7 (bound 7*46 + 4 =
# 326 vs registry 275; the binding constraint remains the SCHEDULE).
# Cohorts entering this round: r8:46 (mandatory at r15 — gap 7),
# r9:46 (mandatory at r16), r10:43, r11:44, r12:46, r13:50.
#
# The r13 verdict's ask: pre-rotate ~40 of the 46-query r8 cohort NOW
# so r15 is never owed a full cohort with zero slack. This gate takes
# 40 of the 46 (including every r8 member the round-14 index-build
# work touches: ann11/ann12/ann13/ann14/ann15/ann16/ann17), defers 6
# cheap untouched pure-function twins (tx11/tx12/tx13/tx14/x44/x45)
# to r15, and reserves the two tail r8 slots (x27/x28) as HEAD-START
# slots for this round's planned additions (they displace to r15 with
# the deferred six when the additions land — r15 then owes 8 r8 rows
# + its own changes against capacity 46).
#
# Forward schedule under this smoothing (the arithmetic the r13
# verdict asked for): r15 owes 8 r8 + ~10 changes/additions, leaving
# ~28 slots to pre-rotate the 46-query r9 cohort; r16 then owes the
# ~18 r9 remainder + its changes with ~18 slots of slack — the
# steady-state retirement rate 275/7 ~ 39.3/round holds with no
# zero-slack round anywhere in the window.
#
# Rule-1 slots this round (code/oracle CHANGED in round 14): the
# IVF-PQ index build derives its coarse cell count from corpus size
# and every corpus-sized assignment site routes through the broadcast
# BLAS kernel, so the persisted-index consumers' ORACLES change
# (ann11/ann14/ann15/ann17 — r8 members anyway — plus ann18) and the
# PQ trainers'/assignment plans change (ann9/ann10 + r8 members
# ann12/ann13/ann16). Kernel-INTERNAL hardening (near-tie exact
# recompute, NaN fail-loud, derived id schema) is result-preserving
# for the remaining r13-green k-means consumers (ann4/ann5/ann30/
# dd11/dd13/llm_curation — driver rows one round old); those are
# covered by this round's full-registry parity sweep at two SFs
# rather than gate slots, exactly the r13 precedent. x48/x51/ann20
# (kernel consumers, last driver row r9) take gate slots now.
_GATE_PREFIX = [
    # (0) ADDED this round (4): the index-quality pair (coarse cells
    # + PQ codebook — ann31 gates the derived coarse cell count
    # end-to-end, ann32 the stored codebooks), the per-source
    # Zipf-slope hygiene screen, and the per-source near-dup
    # incidence report. They take head-start slots reserved from the
    # r8 cohort (x27/x28/x26/x29 displace to r15 with their cohort —
    # overdue at r15, in next round's gate; r15 then owes 10 r8 rows
    # + its changes, still ~20 slots of r9 pre-rotation slack).
    # Registry 275 + 4 = 279 <= horizon-7 bound 326.
    "ann31_index_build_stats",
    "tx33_zipf_slope",
    "ann32_pq_distortion",
    "dd25_source_dup_rate",
    # (1) permanent sentinels (4)
    "flagship_customer_segments",
    "f2_safe_date",
    "i2_upsert_last_writer_wins",
    "s4_file_identity",
    # (2) round-14 changed queries NOT already owed as r8 cohort (6):
    # ann18's oracle gains the derived-k seed (last row r9); ann9/
    # ann10 run the re-routed PQ trainer (r13 rows stop vouching);
    # ann20/x48/x51 are kernel consumers with r9-old rows.
    "ann18_index_delete",
    "ann9_pq_topk",
    "ann10_ivfpq_topk",
    "ann20_ivf_sq8_topk",
    "x48_density_downsample",
    "x51_graph_pagerank",
    # (3) 40 of the 46-query r8 cohort, index-path members first
    # (their code/oracles also change this round), then the rest in
    # registry order. x27/x28 are the addition head-start slots.
    "ann11_ivfpq_from_index",
    "ann12_incremental_assign",
    "ann13_index_drift",
    "ann14_batch_ivf_serve",
    "ann15_filtered_topk",
    "ann16_centroid_refresh",
    "ann17_filtered_recall",
    "j1_anti_new_keys",
    "o2_dedup_keep_last",
    "w1_display_id",
    "i3_antijoin_append",
    "dd4_simhash",
    "dd8_decontaminate",
    "dd9_repeated_spans",
    "dd10_chunk_dedup",
    "ann1_bruteforce_topk",
    "ann3_batch_topk",
    "tx1_token_stats",
    "tx2_quality_score",
    "tx3_lang_id",
    "tx4_fingerprint",
    "tx5_top_tokens",
    "tx6_pii_redact",
    "tx7_repetition_ratio",
    "tx8_bpe_tokens",
    "tx9_tfidf_keywords",
    "tx10_bigram_lm_score",
    "tx19_incremental_lm_score",
    "tx20_incremental_tfidf",
    "mm1_media_features",
    "x10_range_join",
    "x11_train_val_test_split",
    "x24_salted_join",
    "x25_cdc_apply",
    "x43_sharded_curriculum",
    "dd7_simhash_hamming",
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
