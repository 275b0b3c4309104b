"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries":
{name: sec}, "sf": ...}.

Each query executes end-to-end via the no-op sink (full scan ->
transform -> exchange pipeline, no driver collect). Timings are
STEADY-STATE: every plan is first executed once at sf0.001 (and the
e2e pipeline once at 1/100 volume) so whole-stage-codegen compilation,
Python-worker spin-up, and reader initialization are paid before the
clock starts — the regime a long-running cluster actually operates in.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "flagship_customer_segments",
    # mm1 runs FIRST among the Arrow/Python-worker queries: measured in
    # isolation it is ~0.53 s median-of-5, but r6's bench (mm1 after the
    # e2e block + a dozen Arrow-worker queries) reported 1.09 s with a
    # tight spread — accumulated Python-worker state roughly doubles
    # it. Front-running it keeps the recorded number the steady-state
    # one (see SCALE.md "mm1 bench-order artifact").
    "mm1_media_features",
    "a0_pricing_summary",
    "j3_fact_dim_join",
    "o2_dedup_keep_last",
    "w2_running_sum",
    "i2_upsert_last_writer_wins",
    "i3_watermark_append",
    "f2_safe_date",
    "f3_safe_num",
    "st1_tumbling_window",
    "dd1_exact_dedup",
    "dd2_minhash_lsh",
    "dd3_ngram_jaccard",
    "dd5_embedding_neardup",
    "ann1_bruteforce_topk",
    "tx2_quality_score",
    "x10_range_join",
    "x11_train_val_test_split",
    "dd7_simhash_hamming",
    "dd8_decontaminate",
    "tx9_tfidf_keywords",
    "tx10_bigram_lm_score",
    "ann4_kmeans_train",
    "x18_sequence_packing",
    "dd9_repeated_spans",
    "dd10_chunk_dedup",
    "dd11_semantic_dedup",
    "x21_incremental_neardup",
    "x24_salted_join",
    "x25_cdc_apply",
    "x26_fuzzy_match",
    # round 6 additions
    "dd15_line_dedup",
    "x35_stream_neardup",
    # round 7 additions
    "x40_shard_assignment",
    "x41_datacard_incremental",
    "x42_curriculum_order",
    "tx17_perplexity_buckets",
    "tx18_lang_consistency",
    # round 8 additions. ann11 vs ann10 is the build/serve cost split:
    # ann10 trains in-plan every run; ann11's warmup run builds the
    # persisted index once and the timed runs serve from it — its
    # median is the query latency a vector store quotes.
    "ann11_ivfpq_from_index",
    "ann12_incremental_assign",
    "tx19_incremental_lm_score",
    "x43_sharded_curriculum",
    # 5 queries served from one shared IVF index in a single plan —
    # compare against 5x the single-query path's wall
    "ann14_batch_ivf_serve",
    # metadata-filtered serve from the same index: the filter shrinks
    # the rerank, so this should track ann11's serve cost from below
    "ann15_filtered_topk",
    "x44_temperature_mix",
    # the map-only hash-threshold form of x44 — its wall should sit
    # under the rank form's, and the gap is the rank shuffle's price
    "x45_temperature_mix_threshold",
    # warm-start refresh trains in-plan (two base Lloyd passes + one
    # warm full pass) for oracle replay — a build-time number, like ann10
    "ann16_centroid_refresh",
    # round 9 additions
    "i7_pointintime_join",
    "x46_retractable_mv",
    "x47_epoch_mixture",
    "tx21_dsir_importance",
    "tx22_winnow_fingerprint",
    "mm4_block_dedup",
    # tombstoned serve from the cached IVF index: should track ann11's
    # serve cost — the tombstone anti-join is index-metadata-sized
    "ann18_index_delete",
    # round 9 second wave: CM-sketch heavy hitters (corpus cost = one
    # token count), density downsampling (corpus cost = one Lloyd
    # assignment), the metadata-sized compaction planner, and the
    # training-free SQ8 serve (its gap vs ann1 is quantization's price)
    "hh1_countmin_topk",
    "hh2_countmin_fold",
    "hh3_linear_counting",
    "x48_density_downsample",
    "x49_compaction_bins",
    "x50_priority_sample",
    "ann19_sq8_topk",
    # graph build (derived-k Lloyd + cell gram) + 3 PageRank
    # iterations in one plan — a build-time number like ann10/ann16
    "x51_graph_pagerank",
    # IVF x SQ8 composition — in-plan Lloyd for the oracle twin, so a
    # build-time number; the cell-scoped quantized scan is the serve
    "ann20_ivf_sq8_topk",
    # round 9 third wave: HLL cardinality contract (corpus cost = one
    # token explode feeding register + exact sides), in-plan NB quality
    # classifier (model tables vocabulary-sized), cross-source overlap
    # matrix (shingle-keyed self-join, catalog-bounded fan-out), and
    # the zero-shuffle RAG chunker
    "hh4_hll_cardinality",
    "tx23_nb_quality_score",
    "x52_source_overlap",
    "x53_rag_chunks",
    # log-bin quantile sketch (one histogram agg + the exact-percentile
    # contract side) and the per-source JS drift monitor
    "hh5_logbin_quantiles",
    "x54_source_drift",
    # UniMax water-filling allocator: one catalog-sized answer from one
    # corpus-sized count — should be near-flat at any scale
    "x55_unimax_alloc",
    # schema-drift union: two pushed scans, zero exchanges
    "i8_schema_evolution",
    # novelty scoring: df table consumed as a count (no pair fan-out)
    "tx24_novelty_score",
    # the recall-vs-cost tuning curve: brute-force ground truth + 3
    # probe levels in one plan — a contract query, priced accordingly
    "ann21_probe_recall_curve",
    # sketch-fence outlier monitor: histogram + broadcast flag pass
    "x56_sketch_fence_outliers",
    # balanced k-per-source reservoir: one group-limited window
    "x57_per_source_reservoir",
    # hash-derived Poisson bootstrap: 32 replicate means in one pass
    "x58_bootstrap_se",
    # Zipf/Heaps corpus fingerprint: two closed-form log-log fits
    "tx25_zipf_heaps",
    # binary-code serve: 48-bit codes, integer Hamming shortlist
    "ann22_binary_hamming_topk",
    # strict-order funnel: three stacked windows, one user exchange
    "x59_funnel_steps",
    # last-touch attribution: bounded-lookback interval join
    "x60_last_touch_attribution",
    # retention cohorts: constant-size matrix from user-keyed aggs
    "x61_retention_cohorts",
    # Markov transitions: one lead window -> constant-size matrix
    "x62_markov_transitions",
    # MinHash estimator contract: dd2 candidates + exact-Jaccard truth
    "dd17_minhash_estimator_error",
    # readability: zero-shuffle per-doc score fold
    "tx26_readability",
    # FK integrity audit: anti-join orphan counts per relationship
    "i10_fk_integrity_audit",
    # exact-span decontamination: broadcast benchmark grams + doc-keyed
    # interval merge
    "dd18_exact_span_decontaminate",
    # gap repair: one user-keyed sort, four IGNORE-NULLS windows
    "x63_gap_fill_interpolate",
    # CUSUM drift: prefix-sum rewrite of the sequential recursion
    "x64_cusum_changepoint",
    # conversion lag: user-keyed min-aggs + residual-qualified join
    "x66_conversion_lag",
    # snapshot CDC extraction: PK-keyed full-outer diff
    "i11_snapshot_cdc_extract",
    # triangle census: checkpointed edge list + endpoint-keyed joins
    "x67_copurchase_triangles",
    # KMV audience overlap: bottom-64 sketches + exact contract
    "hh6_kmv_overlap",
    # item-item Jaccard top-5: buyer-keyed co-occurrence + WindowGroupLimit
    "x68_item_similarity_topk",
    # BM25 retrieval: broadcast stats, TakeOrderedAndProject cut
    "x69_bm25_topk",
    # hybrid RRF: two candidate-cut legs + id-keyed fusion
    "ann23_hybrid_rrf",
    # quantile normalization: source-keyed rank + broadcast grid
    "x70_quantile_normalize",
    # A/B z-test: map-side assignment, user-keyed aggs, 1-row stats
    "x71_ab_test_ztest",
    # perceptual near-dup: tile signatures, band buckets, Hamming verify
    "mm5_perceptual_neardup",
    # PMI collocations: doc-keyed pair build + broadcast df
    "tx27_pmi_collocations",
    # behavior entropy: one lead window, user-bounded aggs
    "x72_behavior_entropy",
    # CDC compaction: one user-keyed window stage, no joins
    "i12_cdc_compaction",
    # FIFO matching: rank windows -> (user, position) hash join
    "x73_fifo_match",
    # MIPS + augmentation contract: two rankings, one scan each
    "ann24_mips_topk",
    # cohort LTV: user-keyed join + cohort-matrix running sum
    "x74_cohort_ltv",
    # rolling DAU/WAU: span-explode rewrite of sliding distinct
    "x75_rolling_active_users",
    # ABC analysis: integer revenue agg + catalog-sized ranking
    "x76_abc_analysis",
    # seasonal profile + trend forecast: matrix-sized after one agg
    "x77_seasonal_profile",
    "x78_trend_forecast",
    # round 10 additions
    # user feature pivot: fixed value list -> ONE user-keyed agg
    "x79_user_feature_pivot",
    # RFM quintiles: boundary broadcast, no ntile window
    "x80_rfm_scores",
    # EWMA smoothing: two cumulative sums over the daily matrix
    "x81_ewma_smoothing",
    # RAKE keywords: (doc, term) agg + doc-keyed group-limit window
    "tx28_rake_keywords",
    # lexical diversity: two doc-keyed aggs, one-pass entropy fold
    "tx29_lexical_diversity",
    # bag-of-words dedup: map-side canonical hash, one 16-byte agg
    "dd19_bow_dedup",
    # cosine range search: pure filter, no top-k cut
    "ann25_range_search",
    # Bloom membership: vocabulary distinct + 256-int sketch per source
    "hh7_bloom_membership",
    # late-arriving dim: one LEFT broadcast join, coalesced placeholders
    "i13_late_arriving_dim",
    # content-defined chunking: candidate fan-out + doc-keyed lead
    "mm6_cdc_chunks",
    # Gini: x76's integer revenue agg + bucketed global rank
    "x82_gini_concentration",
    # cluster-quality audit: one component shuffle + matrix-sized joins
    "ann26_label_centroid_quality",
    # prefix dedup: two md5s map-side, one 16-byte-key agg
    "dd20_prefix_dedup",
    # AMS F2: (source, token) count agg -> 8 signed sums per source
    "hh8_ams_f2",
    # bitemporal AS-OF: one PK-keyed join, two interval residuals
    "i14_bitemporal_asof",
    # backlog aging: pushed status filter + tiny grid agg
    "x83_backlog_aging",
    # centroid confusion: broadcast matrix + vec-keyed argmax window
    "ann27_centroid_confusion",
    # SRM guard: one user-distinct agg, scalar chi-square
    "x84_srm_check",
    # late-data profile: one user-keyed HWM window + |types| agg
    "i15_late_data_profile",
    # top-eigen audit: covariance shuffle + 4096-cell power iterations
    "ann28_top_eigen",
    # split-leakage audit: fp-keyed self-join, 3-row output
    "x85_split_leakage_audit",
    # winsorized stats: percentile broadcast + clamped mean
    "x86_winsorized_stats",
    # retention planner: snapshot distinct + map-side GFS tiers
    "i16_retention_planner",
    # round 11 additions
    # survivorship: one customer-keyed agg + mode window, AQE join
    "i17_survivorship_golden_record",
    # join-skew audit: 3 key-keyed counts -> 3 one-row stat folds
    "i18_join_skew_audit",
    # PII density: map-side regex counts, one source agg
    "tx30_pii_density_audit",
    # basket lift: buyer-keyed pairs + HAVING, broadcast freqs, top-10
    "x87_basket_lift",
    # CUPED: one user-keyed agg, pooled moments broadcast
    "x88_cuped_adjustment",
    # peak concurrency: sweep-line on the bucketed prefix-sum engine
    "x89_peak_concurrency",
    # soft dedup: dd2 candidates + CC labels -> weight join
    "dd21_soft_dedup_weights",
    # scene cuts: Arrow frame fan-out, media-keyed windows only
    "mm7_scene_cuts",
    # MMR rerank: corpus scan + pool cut; greedy on pool-sized state
    "ann29_mmr_rerank",
    # rolling HLL: register max-monoid span-spread + exact contract
    "hh9_rolling_hll",
    # DQ expectations: one pruned-scan agg pass per table
    "i19_dq_expectations",
    # seasonal anomaly: daily agg + two matrix-sized keyed windows
    "x90_seasonal_anomaly",
    # chunk dedup savings: mm6 chunks + digest-keyed first-occurrence
    "mm8_chunk_dedup_savings",
    # skyline: bucketed prefix-MIN engine + broadcast frontier join
    "x91_pareto_frontier",
    # top journeys: session-bounded path agg, TakeOrdered cut
    "x92_top_paths",
    # partition-gap audit: one (type, hour) distinct + keyed lag
    "i20_missing_partition_audit",
    # Wilson error-rate monitor: day agg + broadcast global rate
    "x93_error_rate_monitor",
    # effective tokens: dd21 clusters x tx1 token counts, source agg
    "tx31_effective_tokens",
    # TPC-H Q14/Q10/Q6 shapes: pushed filters, broadcast dims,
    # TakeOrdered cut / zero-join scan fold
    "a9_promotion_effect",
    "a10_returned_items",
    "a11_forecast_revenue_change",
    # TPC-H Q4/Q13 shapes: EXISTS as LeftSemi; left-join histogram
    "a12_late_order_priorities",
    "a13_customer_order_distribution",
    # TPC-H Q18/Q15 shapes: HAVING-set broadcast; tie-safe scalar max
    "a14_large_volume_orders",
    "a15_top_supplier",
    # TPC-H Q21 shape via the grouped rewrite: one fact pass, not 3
    "a16_waiting_blame",
    # round 12 additions
    # TPC-H Q2 shape: window-min offer pick, one fact scan, dim chain
    "a17_min_cost_supplier",
    # TPC-H Q11 shape: one part-keyed agg + 1-row global-scalar filter
    "a18_important_stock",
    # TPC-H Q20 shape: conditional sums off ONE fact scan -> LeftSemi
    "a19_excess_inventory_suppliers",
    # TPC-H Q22 shape: pruned-orders LeftAnti + substring buckets
    "a20_lost_customers",
    # cross-snapshot dedup delta: two LSH+CC passes (oracle-replayable
    # form of the incremental index refresh the streaming twin runs)
    "dd22_dedup_delta",
    # canonical re-election: per-cluster argmax monoid fold
    "dd23_canonical_reelection",
    # round 13 additions
    # per-source unigram KL vs corpus: one explode, vocab-sized rest
    "tx32_source_unigram_divergence",
    # cross-language near-dup mirrors off the shared LSH build
    "dd24_cross_lang_mirrors",
    # leave-one-source-out ablation: complement math, one corpus pass
    "x94_loo_source_ablation",
    # LOO kNN label accuracy over ann5's cell-local graph
    "ann30_knn_label_accuracy",
    # round 14 additions
    # persisted-index build-quality report (reads the cached index;
    # first invocation per dataset pays the build, like ann11)
    "ann31_index_build_stats",
    # per-source Zipf slope: one explode, vocab-sized fit
    "tx33_zipf_slope",
    # PQ codebook distortion report off the cached persisted index
    "ann32_pq_distortion",
    # per-source near-dup incidence off the shared LSH build
    "dd25_source_dup_rate",
    # round 15 additions
    # two-level coarse quantizer: derived-k super training + per-super
    # local Lloyd inside applyInPandas (bounded broadcast at any N)
    "ann33_two_level_assign",
    # sampled estimator-error certificate: dd2's shared pair build +
    # an O(sample) exact-Jaccard truth side (dd17's production twin)
    "dd26_sampled_estimator_error",
    # two-level serve path: in-plan base training (ann12's precedent)
    # + stage-1 super probe + per-super cogroup delta assignment
    "ann34_two_level_serve",
    # two-level top-k tree search off the cached persisted index
    # (warmup builds it once; timed runs are the serve latency)
    "ann35_two_level_topk",
    # the tree's recall certificate: ann35's probe vs brute force
    "ann36_two_level_recall",
    # super-level drift report over the grown two-level index
    "ann37_two_level_drift",
    # partial refresh: only flagged supers re-train (in-plan base
    # training for the oracle — a build-time number like ann16)
    "ann38_two_level_partial_refresh",
]

# Build/contract-time queries measured OUTSIDE the headline total
# (r9/r10 verdicts): ann10 trains two PQ subspaces in-plan every run
# by design — the production serve shape is ann11's
# from-persisted-index path, which IS in the headline. Timings land in
# BENCH_DETAIL.json under "contract_queries" so the cost stays
# tracked round-over-round without dominating the headline number.
CONTRACT = [
    "ann10_ivfpq_topk",
]


def _total_busy_jiffies() -> int:
    """All-CPU busy jiffies (user+nice+system+irq+softirq+steal) from
    /proc/stat — the denominator for the foreign-load check."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # cpu user nice system idle iowait irq softirq steal ...
    u, n, s = int(parts[1]), int(parts[2]), int(parts[3])
    irq = int(parts[6]) if len(parts) > 6 else 0
    sirq = int(parts[7]) if len(parts) > 7 else 0
    steal = int(parts[8]) if len(parts) > 8 else 0
    return u + n + s + irq + sirq + steal


def _proc_tree_jiffies(root_pid: int) -> int:
    """utime+stime summed over root_pid's process SUBTREE (the bench
    driver, its JVM, and every pyspark worker are all descendants), so
    total_busy - tree = CPU burned by processes that are NOT this
    bench."""
    children: dict[int, list[int]] = {}
    stat: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        # comm can contain spaces/parens: split after the LAST ')'
        rest = raw.rsplit(")", 1)[1].split()
        pid = int(d)
        ppid = int(rest[1])
        # utime+stime (this process) + cutime+cstime (its REAPED
        # children — pyspark workers die mid-block and their time
        # rolls into the JVM's cutime; live children are counted via
        # their own /proc entry, so there is no double count)
        stat[pid] = (
            int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        )
        children.setdefault(ppid, []).append(pid)
    total = 0
    stack = [root_pid]
    while stack:
        p = stack.pop()
        total += stat.get(p, 0)
        stack.extend(children.get(p, []))
    return total


class _LoadCheck:
    """Per-block foreign-CPU monitor (r11 verdict #4): the driver's
    r11 bench absorbed +7.9% on shared slots from concurrent machine
    load that the builder's clean rerun showed was not real — the
    headline number must self-identify when that happens. Measures,
    per bench block, what fraction of the machine's busy CPU time was
    burned OUTSIDE this process tree; a block is flagged contaminated
    when foreign work exceeded 2% of machine capacity over the block
    (foreign_cpu > 0.02 * ncpu * wall — on this 32-core box even a
    single fully-busy foreign core, 3.1%, trips it, while measured
    idle noise is ~0.05%)."""

    def __init__(self) -> None:
        self.pid = os.getpid()
        self.ncpu = os.cpu_count() or 1
        self.blocks: list[dict] = []
        # measurements discarded by _run_block's bounded auto-rerun
        # (r12 verdict #3) — kept for the record, excluded from the
        # contaminated flag: a block whose clean rerun succeeded IS
        # clean.
        self.discarded: list[dict] = []

    def start(self) -> None:
        self._t0 = time.time()
        self._busy0 = _total_busy_jiffies()
        self._tree0 = _proc_tree_jiffies(self.pid)
        self._load0 = os.getloadavg()[0]

    def stop(self, label: str) -> None:
        wall = time.time() - self._t0
        hz = os.sysconf("SC_CLK_TCK")
        foreign = (
            (_total_busy_jiffies() - self._busy0)
            - (_proc_tree_jiffies(self.pid) - self._tree0)
        ) / hz
        # round BEFORE the flag so contaminated is a pure function of
        # the recorded fraction (r12 advice: an unrounded frac in
        # (0.02, 0.02005) used to set the flag while the stored value
        # said 0.02 — unreproducible from the artifact).
        frac = round(foreign / max(wall, 1e-9) / self.ncpu, 4)
        self.blocks.append({
            "block": label,
            "wall_sec": round(wall, 1),
            "foreign_cpu_sec": round(foreign, 1),
            "foreign_frac_of_machine": frac,
            "load1_at_start": round(self._load0, 2),
            "contaminated": frac > 0.02,
        })

    @property
    def contaminated(self) -> bool:
        return any(b["contaminated"] for b in self.blocks)


def _cpu_calibration() -> dict:
    """Fixed single-core work units timed before any Spark work: a
    pure-Python arithmetic loop and a BLAS matmul (median of 3 each).
    Recorded per run so cross-round wall comparisons can normalize out
    HOST execution-throughput shifts: r12->r13 isolated medians rose
    27-65% on byte-identical data, untouched code, and zero measured
    foreign CPU — a host-side change the guest cannot observe directly
    (no steal, no cpufreq visibility). With this number in every
    BENCH_DETAIL, the next such episode is attributable in one
    division instead of a round of A/Bs.

    The matmul half runs in a SUBPROCESS with every threadpool env
    knob pinned to 1 (r13 verdict: an unpinned probe measured 0.073 s
    under a warm multi-threaded OpenBLAS pool vs 1.046 s single-core
    elsewhere — 14x of pure threadpool availability, the exact
    ambiguity the probe exists to remove; in-process pinning is not
    reliable because the pool is already initialized by the time the
    probe runs). ``blas_threads_effective`` (process CPU / wall during
    the timed matmul) is recorded beside the number so a pin failure
    is visible in the artifact itself rather than silently folded
    into the throughput reading."""
    import json
    import subprocess
    import sys

    def med3(fn):
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        return sorted(runs)[1]

    def py_loop():
        s = 0
        for i in range(10_000_000):
            s += i * i

    probe = (
        "import numpy as np, time, os, json\n"
        "a = np.random.default_rng(0).standard_normal((1500, 1500))\n"
        "runs, ratios = [], []\n"
        "for _ in range(3):\n"
        "    c0 = os.times(); t0 = time.time()\n"
        "    a @ a\n"
        "    t1 = time.time(); c1 = os.times()\n"
        "    runs.append(t1 - t0)\n"
        "    cpu = (c1.user + c1.system) - (c0.user + c0.system)\n"
        "    ratios.append(cpu / max(t1 - t0, 1e-9))\n"
        "print(json.dumps({'sec': sorted(runs)[1],"
        " 'threads': sorted(ratios)[1]}))\n"
    )
    env = dict(os.environ)
    for k in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
        "VECLIB_MAXIMUM_THREADS",
    ):
        env[k] = "1"
    res = subprocess.run(
        [sys.executable, "-c", probe],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    if res.returncode != 0:
        # surface the probe's real failure (numpy import error, crash)
        # instead of an opaque JSONDecodeError on empty stdout
        raise RuntimeError(
            f"BLAS calibration probe failed (exit {res.returncode}): "
            f"{res.stderr.strip()[-500:]}"
        )
    blas = json.loads(res.stdout)
    return {
        "py_loop_10m_sec": round(med3(py_loop), 3),
        "blas_1500_matmul_sec": round(blas["sec"], 3),
        "blas_threads_effective": round(blas["threads"], 2),
    }


def _run_block(label, fn, loadcheck, reset=None, max_retries=2):
    """Run one timed bench block with bounded auto-rerun (r12 verdict
    #3): the load monitor has twice correctly flagged driver runs where
    foreign machine load inflated a block, but the committed artifact
    stayed inflated until a human discarded and re-ran it. Here a
    contaminated measurement is discarded (kept in
    ``loadcheck.discarded`` for the record) and the block re-measured,
    up to ``max_retries`` extra times; the first clean measurement
    wins. ``reset`` (e.g. a fresh SparkSession + warmup) restores the
    block's steady-state protocol before each retry so a rerun is
    measured under the same conditions as a first run. If every
    attempt is contaminated the last one is kept, flag intact — the
    artifact still self-identifies. The kept block records
    ``rerun`` = how many discarded attempts preceded it."""
    attempt = 0
    while True:
        loadcheck.start()
        out = fn()
        loadcheck.stop(label)
        blk = loadcheck.blocks[-1]
        blk["rerun"] = attempt
        if not blk["contaminated"] or attempt >= max_retries:
            return out
        loadcheck.discarded.append(loadcheck.blocks.pop())
        attempt += 1
        if reset is not None:
            reset()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from python_etl_pipeline_spark.session import get_spark
    from python_etl_pipeline_spark.queries import REGISTRY

    # Bench hygiene (r15 verdict #5): the ann11-family and ann35-family
    # slots serve from an index persisted under the system tempdir keyed
    # on the dataset's file identity (_cached_ivfpq_index /
    # _cached_two_level_index). That cache survives across bench and
    # driver runs, so a run could inherit a PREVIOUS run's build and the
    # headline would depend on prior-run residue. Clear it at bench
    # start: the untimed warmup passes rebuild the index inside THIS
    # run (build cost paid here, where it belongs), and the timed
    # medians remain the serve latency they are documented to be.
    import glob as _glob
    import shutil as _shutil
    import tempfile as _tempfile

    for pat in ("spark_graft_ivfpq_*", "spark_graft_twolevel_*"):
        for p in _glob.glob(os.path.join(_tempfile.gettempdir(), pat)):
            _shutil.rmtree(p, ignore_errors=True)

    spark = get_spark("bench")
    # warm the JVM/session so the first query doesn't pay startup cost
    spark.range(1).count()

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    loadcheck = _LoadCheck()
    cpu_calib = _cpu_calibration()  # host-epoch yardstick, pre-Spark

    # end-to-end banking pipeline at the reference's exact volume (107k
    # messy CSV rows: BASELINE.md's best full run = 50.1s / ~2,100 rows/s).
    # Measured FIRST, before even the sf0.001 headline warmup loop: 35+
    # queries x 4 executions leave the session with accumulated JVM
    # heap/GC and Python-worker state that was measured to inflate a
    # subsequent e2e run from ~4.9s to ~8.6s (round 5), and the round-8
    # headline additions (index builds, PQ training) inflated it again
    # from an isolated 5.5s median to 6.6s when only their WARMUPS ran
    # ahead of it — each block is timed right after its own warmup
    # instead.
    import shutil
    import tempfile

    from tools.gen_banking_csv import generate
    from python_etl_pipeline_spark.pipeline import Pipeline

    # warmup at 1/100 volume compiles the pipeline's plans before timing
    warm = tempfile.mkdtemp(prefix="bench_e2e_warm_")
    try:
        wc = generate(f"{warm}/in", scale=0.01)
        Pipeline(spark, f"{warm}/wh").run_full(
            {e: [f"{warm}/in/{e}_1.csv"] for e in wc}
        )
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        counts = generate(f"{tmp}/in", scale=1.0)
        files = {e: [f"{tmp}/in/{e}_1.csv"] for e in counts}

        # One UNTIMED full-volume run first, then median-of-5. The r10
        # number (7.68 s, spread 7.56-8.40) was a warmup artifact, not
        # a code change: an isolated r11 sequence at HEAD ran 7.35,
        # 6.98, 6.31, 5.43, 5.51 — the first full-volume runs pay page
        # cache + JIT costs the 1/100 warmup doesn't cover, and a
        # median-of-3 sits entirely inside that biased-high window.
        def time_e2e():
            sub = tempfile.mkdtemp(dir=tmp)  # run_full mutates state
            Pipeline(spark, f"{sub}/wh_warm").run_full(files)
            runs = []
            for i in range(5):
                t0 = time.time()
                Pipeline(spark, f"{sub}/wh{i}").run_full(files)
                runs.append(time.time() - t0)
            runs.sort()
            return runs

        e2e_runs = _run_block("e2e", time_e2e, loadcheck)
        e2e = round(e2e_runs[2], 3)
        timings["pipeline_e2e_107k_rows"] = e2e
        spread["pipeline_e2e_107k_rows"] = [
            round(e2e_runs[0], 3), round(e2e_runs[-1], 3)
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # The headline runs in BLOCKS of 20 queries, each block in a FRESH
    # SparkSession. Rationale (round 9): accumulated session state —
    # Python/Arrow workers, JVM heap/GC pressure, codegen caches —
    # inflates LATE queries in a long single-session run; with 65
    # headline queries the tail inflation reached 2-3x (tx19 measured
    # 6.08 s at position ~44 of a single-session run vs 3.19 s
    # median-of-3 in a fresh session; tx10 2.13 vs 1.34). This is the
    # same artifact that hit mm1 in r6 and e2e in r8, grown with the
    # list; per-block session recycling bounds it at any headline size.
    # Disk-backed state (the IVF-PQ index cache, ingest logs) survives
    # session restarts, so warm-serve semantics are unchanged.
    warm_dir = "/root/testdata/sf0.001"
    BLOCK = 20

    def fresh_session_and_warm(block):
        # EVERY block gets a fresh session — including the first, which
        # previously inherited the e2e pipeline's accumulated JVM and
        # Python-worker state (r10: dd5 measured 2.88 s at slot 15 of
        # the contaminated first block vs 2.09 s isolated median-of-5;
        # the r9 "dd5 regression" was this artifact, not a code change).
        # Also the retry reset: a rerun block is measured from the same
        # fresh-session + warmed steady state as a first run.
        nonlocal spark
        spark.stop()
        spark = get_spark("bench")
        spark.range(1).count()
        # steady-state warmup: run each block plan once at the smallest
        # SF so codegen compilation and reader init are paid up front
        if os.path.isdir(warm_dir):
            for name in block:
                try:
                    REGISTRY[name].spark(spark, warm_dir).write.mode(
                        "overwrite"
                    ).format("noop").save()
                except Exception:
                    pass  # warmup is best-effort; the timed run decides

    def time_queries(block, out):
        # Per-query: one warm-up execution at the TARGET sf (beyond the
        # sf0.001 compile pass — it also warms the page cache for the
        # real input files), then median-of-3 timed runs. The median
        # defeats the +/-50% single-shot noise this harness has shown
        # (tx10 moved 3.76s -> 1.63s across rounds with no code
        # change); the spread is recorded so a verdict can tell
        # regression from noise without a re-run.
        for name in block:
            spec = REGISTRY[name]
            spec.spark(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs = []
            for _ in range(3):
                t0 = time.time()
                spec.spark(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                runs.append(time.time() - t0)
            runs.sort()
            out[name] = round(runs[1], 3)
            spread[name] = [round(runs[0], 3), round(runs[-1], 3)]

    for start in range(0, len(HEADLINE), BLOCK):
        block = HEADLINE[start:start + BLOCK]
        fresh_session_and_warm(block)
        _run_block(
            f"headline[{start}:{start + len(block)}]",
            lambda block=block: time_queries(block, timings),
            loadcheck,
            reset=lambda block=block: fresh_session_and_warm(block),
        )

    # Contract/build-time queries: same fresh-session + warmup +
    # median-of-3 protocol, but their wall stays OUT of the headline
    # total (see CONTRACT above).
    contract: dict[str, float] = {}
    if CONTRACT:
        fresh_session_and_warm(CONTRACT)
        _run_block(
            "contract",
            lambda: time_queries(CONTRACT, contract),
            loadcheck,
            reset=lambda: fresh_session_and_warm(CONTRACT),
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    # The round in flight = newest driver-recorded bench + 1; stamps
    # this run's BENCH_DETAIL so a later comparison can tell whether
    # its baseline is genuinely the PREVIOUS round (r10 ADVICE: the
    # usual commit cadence lands BENCH_DETAIL before bench re-runs, so
    # "git show HEAD:" could silently compare a round to itself).
    import glob
    import re as _re

    _recorded = [
        int(_re.search(r"r(\d+)", Path(p).name).group(1))
        for p in glob.glob(
            str(Path(__file__).resolve().parent / "BENCH_r*.json")
        )
    ]
    cur_round = (max(_recorded) + 1) if _recorded else 1
    result = {
        "metric": "headline_queries_total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "round": cur_round,
        "pipeline_e2e_rows_per_sec": round(sum(counts.values()) / e2e),
        # r11 verdict #4: an inflated run must self-identify. True when
        # any block saw foreign processes burn >5% of machine CPU while
        # it was being timed; per-block numbers in BENCH_DETAIL.json.
        "contaminated": loadcheck.contaminated,
    }
    # Shared-slot comparison vs the previous ROUND's recorded bench:
    # with a growing headline list the TOTAL reads as a regression
    # every round, so the primary round-over-round signal is the sum
    # over the slot intersection (r9 verdict). The per-query map of
    # the previous round lives in a COMMITTED BENCH_DETAIL.json (the
    # BENCH_r*.json stdout records may have dropped their query maps
    # to fit the driver's line budget) — but the usual commit cadence
    # lands BENCH_DETAIL before bench re-runs in the SAME round, so
    # plain HEAD could compare a round against itself (r10 ADVICE).
    # Walk the file's git history to the newest version whose "round"
    # stamp is strictly BEFORE the round in flight (versions predating
    # the stamp are pre-r11 and accepted as-is), and record which
    # round the baseline came from.
    import subprocess

    pq: dict[str, float] = {}
    prev_round = None
    try:
        repo = Path(__file__).resolve().parent
        commits = subprocess.check_output(
            ["git", "log", "--format=%H", "--", "BENCH_DETAIL.json"],
            cwd=repo, stderr=subprocess.DEVNULL, text=True,
        ).split()
        for c in commits:
            try:
                prev = json.loads(
                    subprocess.check_output(
                        ["git", "show", f"{c}:BENCH_DETAIL.json"],
                        cwd=repo, stderr=subprocess.DEVNULL,
                    )
                )
            except Exception:
                continue
            r = prev.get("round")
            if (r is None or r < cur_round) and prev.get("queries"):
                pq = prev["queries"]
                prev_round = r
                break
    except Exception:
        pass
    if not pq:
        for b in sorted(
            glob.glob(str(Path(__file__).resolve().parent / "BENCH_r*.json")),
            key=lambda p: -int(_re.search(r"r(\d+)", Path(p).name).group(1)),
        ):
            try:
                rec = json.load(open(b))
                pq = rec.get("queries") or {}
                prev_round = int(
                    _re.search(r"r(\d+)", Path(b).name).group(1)
                )
            except Exception:
                continue
            if pq:
                break
    if pq:
        shared = sorted(set(pq) & set(timings))
        result["shared_prev_sec"] = round(sum(pq[q] for q in shared), 3)
        result["shared_curr_sec"] = round(
            sum(timings[q] for q in shared), 3
        )
        result["shared_n"] = len(shared)
        result["shared_prev_round"] = prev_round
    # The driver captures only a ~2000-char stdout TAIL: the one-line
    # result JSON must stay under that or it is recorded truncated
    # (BENCH_r06.json parsed as null). Per-run spreads go to a side
    # file instead of the summary line; if the summary itself ever
    # outgrows the budget, drop per-query precision before dropping
    # queries.
    with open(Path(__file__).resolve().parent / "BENCH_DETAIL.json", "w") as f:
        json.dump(
            {
                **result,
                "contract_queries": contract,
                "spread": spread,
                "load_blocks": loadcheck.blocks,
                "discarded_blocks": loadcheck.discarded,
                "cpu_calib": cpu_calib,
            },
            f,
            indent=1,
        )
    # Per-query map in the printed line (r15 verdict #1): the driver
    # parses the LAST JSON line inside a ~2000-char stdout TAIL
    # (BENCH_r06.json overflowed it and was recorded parsed=null), while
    # the full 180-slot map is >=5,000 chars even at reduced precision —
    # the two constraints cannot both be met with every slot inline.
    # r14/r15 printed a pointer only, which left the driver's per-query
    # comparison empty (PERF_r15 per_query = {}, geomean = null).
    # Resolution: inline as many per-query timings as fit the budget,
    # LARGEST WALL FIRST (those dominate any perf comparison and any
    # real regression), with the omitted remainder summed so the line
    # stays self-consistent (value == sum(queries) + queries_omitted_sec
    # up to rounding) and the complete map still committed in
    # BENCH_DETAIL.json. Nothing is removed from the timed slot set —
    # this only chooses which of the 180 timings fit on the line.
    BUDGET = 1900
    items = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    result["queries"] = {}
    result["queries_n_total"] = len(timings)
    result["queries_omitted_sec"] = 0.0
    result["queries_in"] = "BENCH_DETAIL.json"

    def _line() -> str:
        return json.dumps(result, separators=(",", ":"))

    for name, sec in items:
        result["queries"][name] = sec
        if len(_line()) > BUDGET - 30:  # slack for the omitted-sum digits
            del result["queries"][name]
            break
    result["queries_omitted_sec"] = round(
        result["value"] - sum(result["queries"].values()), 3
    )
    print(_line())


if __name__ == "__main__":
    main()
