"""Deduplication operators for training-data pipelines.

Four tiers of dedup, all DataFrame-native and hash-deterministic
(md5 — identical in Spark and DuckDB, so every operator is
oracle-checkable):

* **exact** — group by content fingerprint; keep min id. One shuffle
  on the 16-byte hash regardless of document size.
* **MinHash + LSH** — shingle -> k min-hashes -> band buckets ->
  candidate pairs via a bucket self-join. At 100 TB this is THE
  scalable near-dup path: cost is O(docs x shingles) for signatures
  (map-side) plus a shuffle keyed by (band, bucket-hash); no all-pairs
  comparison ever materializes.
* **SimHash** — 16-bit majority-vote signature; near-dups share or
  almost share the signature (join on signature or small Hamming ball).
* **n-gram Jaccard** — exact set similarity, evaluated only on pairs
  that share at least one shingle (inverted-index join), never all
  pairs.

Embedding-cosine near-dup lives in similarity.py (same pair machinery).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _spread(df: DataFrame) -> DataFrame:
    """Fan a narrow source out to cluster parallelism before CPU-heavy
    per-document work (shingling, per-shingle md5).

    Rationale: a table arriving in fewer input splits than the cluster
    has cores (one small parquet file, one unsplittable row group) would
    pin the whole shingle pipeline to those few tasks. One cheap
    round-robin shuffle of the raw rows unlocks full-width execution of
    the far more expensive downstream projection. At real corpus scale
    the source has orders of magnitude more splits than cores, the
    guard is false, and this is a no-op — no shuffle is ever added to a
    100 TB scan."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: one row per distinct content hash with the surviving
    (minimum) id and the duplicate count."""
    h = F.md5(F.col(text_col))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
    )


def shingles(c: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (distinct not applied —
    callers choose). Documents shorter than ``n`` tokens yield an empty
    array — the guard matters: ``sequence(1, 0)`` would otherwise be a
    DESCENDING sequence ``[1, 0]`` and ``slice(_, 0, n)`` errors.

    The tokenization is LET-BOUND through a single-element array +
    outer ``transform`` so the regex split evaluates ONCE per row:
    higher-order functions are interpreted (no whole-stage codegen, no
    subexpression elimination inside the lambda body), so referencing
    ``split(text)`` directly from the inner lambda re-runs the regex
    once per gram POSITION — a ~tokens× blowup measured at 4-5x wall
    on every shingle pass in the engine. A lambda variable is a cheap
    bound reference, which restores once-per-row evaluation while
    keeping this a pure Column function (no call-site projection
    contract)."""
    col = F.col(c) if isinstance(c, str) else c

    def _grams(toks: Column) -> Column:
        # positions 1 .. size-n+1, each -> space-joined slice of n tokens
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
        )

    return F.flatten(F.transform(F.array(tokens(col)), _grams))


def shingles_sql(text_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (kept adjacent so the two stay in
    lock-step)."""
    toks = f"string_split_regex(trim({text_expr}), '\\s+')"
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )


# Affine MinHash family over a single 32-bit md5-derived shingle hash:
# hash_j(s) = (A_j * h32(s) + B_j) mod P. One md5 per shingle total (the
# 16 per-seed re-hashes of the naive scheme were 16x the md5 cost);
# products stay < 2^62 so 64-bit arithmetic is exact in both engines.
MINHASH_P = 2_147_483_647  # 2^31 - 1
MINHASH_AB: list[tuple[int, int]] = [
    (1_203_793_621, 422_527_909), (633_992_881, 1_979_550_215),
    (905_080_397, 19_217_741), (1_537_206_167, 873_420_029),
    (411_757_933, 1_355_098_493), (1_846_337_491, 705_271_837),
    (297_814_549, 1_122_706_873), (1_088_425_333, 255_119_957),
    (721_638_419, 1_684_913_251), (1_429_867_561, 542_338_199),
    (183_929_977, 958_274_561), (1_962_515_129, 1_247_830_103),
    (514_296_553, 86_341_267), (1_316_782_951, 1_530_920_689),
    (836_197_201, 370_158_413), (1_675_440_347, 1_810_376_917),
]


def _hexint(md5_col: Column, n_chars: int) -> Column:
    """First ``n_chars`` hex chars of an md5 column -> bigint.

    One ``conv(hex, 16, 10)`` intrinsic (r15 optimization): the
    previous form chained ``n_chars`` instr+substring evaluations per
    row — measured 0.90 -> 0.56 s median on the sf0.1 signature-hash
    pass, byte-identical output (verified by exceptAll both ways on
    the full shingle table), and this expression sits under every
    MinHash/LSH/sketch consumer. n_chars <= 15 keeps the value under
    2^60, inside BIGINT for both engines; inputs are md5 hex, so the
    ANSI-mode conv/cast never sees a malformed digit."""
    assert n_chars <= 15, "conv result must stay inside BIGINT"
    return F.conv(F.substring(md5_col, 1, n_chars), 16, 10).cast("bigint")


def _hexint_sql(md5_expr: str, n_chars: int) -> str:
    expr = "cast(0 AS BIGINT)"
    for k in range(n_chars):
        expr = f"({expr} * 16 + strpos('{_HEX}', substr({md5_expr}, {k + 1}, 1)) - 1)"
    return expr


def _h32(md5_col: Column) -> Column:
    """First 8 hex chars of an md5 column -> bigint in [0, 2^32)."""
    return _hexint(md5_col, 8)


def _h32_sql(md5_expr: str) -> str:
    return _hexint_sql(md5_expr, 8)



def minhash_band_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    rows: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, bh) LSH bucket assignments — the persisted form of a
    MinHash signature index. Computing this for a NEW batch and joining
    it against a stored copy for the existing corpus is the incremental
    dedup path: the corpus is never re-shingled, only the delta is
    (queries.x21_incremental_neardup)."""
    assert bands * rows == n_hashes
    exploded = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("s"),
    )
    hashed = exploded.select(F.col(id_col), F.md5(F.col("s")).alias("m")).select(
        F.col(id_col), _h32(F.col("m")).alias("h")
    )
    sig_aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"s{j}")
        for j, (a, b) in enumerate(MINHASH_AB[:n_hashes])
    ]
    with_sig = hashed.groupBy(id_col).agg(*sig_aggs)
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(f"s{b * rows + r}").cast("string") for r in range(rows)],
                )
            )
            for b in range(bands)
        ]
    )
    return with_sig.select(
        F.col(id_col), F.posexplode(band_hashes).alias("band", "bh")
    )


def neardup_against_index(
    bb_new: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """One incremental near-dup step: join a NEW batch's band buckets
    (``minhash_band_buckets`` output) against the persisted signature
    index -> distinct ``(new_id, dup_of)`` candidate pairs.

    This is the operation a continuously-ingesting training-data
    pipeline runs per arrival batch: only the delta is shingled, the
    join shuffles on (band, bh) keys the index is already stored under,
    and cost scales with the batch — never the corpus. Used by both the
    batch fold (queries.x21/x35) and the streaming foreachBatch sink
    (streaming.file_stream.stream_neardup_available_now), so the driver
    gate verifies the exact step the stream executes.

    ``max_bucket_size`` caps the INDEX side per (band, bh): a
    degenerate bucket (empty docs, boilerplate) otherwise taxes every
    future batch with its full population of candidate rows, forever.
    A production deployment derives the cap once per corpus alongside
    the persisted index (llm.caps.derived_cap over the stored bucket
    sizes — computed at index-build time, not per batch) and passes the
    literal here; the registered gate queries run uncapped so the
    oracle stays a plain join."""
    a = bb_new.select(F.col(id_col).alias("new_id"), "band", "bh")
    b = index.select(F.col(id_col).alias("dup_of"), "band", "bh")
    if max_bucket_size is not None:
        from pyspark.sql import Window

        wb = Window.partitionBy("band", "bh")
        b = (
            b.withColumn("__bsz", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    return a.join(b, ["band", "bh"]).select("new_id", "dup_of").distinct()


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    rows: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | str | None = None,
    cap_floor: int = 100,
    materialize: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) via MinHash + LSH banding.

    Plan shape at scale: signature computation is a pure projection
    (no shuffle); band explosion multiplies rows by `bands`; the
    self-join shuffles on (band, bucket_hash) only — documents that
    share no bucket never meet.

    ``max_bucket_size`` is the degenerate-bucket guard: a bucket holding
    B documents emits B(B-1)/2 pairs, so one boilerplate-heavy bucket of
    10^6 docs would emit 5*10^11 rows. Buckets larger than the cap are
    dropped *before* the self-join (a count window over the join key —
    no extra shuffle beyond the one the join pays anyway). Documents in
    an oversized bucket usually co-occur in other, smaller buckets of
    their remaining bands, so recall degrades gracefully.

    ``max_bucket_size="auto"`` derives the cap from the bucket-size
    distribution itself (Tukey fence q3 + 3*IQR, never below
    ``cap_floor`` — see :mod:`..llm.caps`), so the same query text is
    safe at any corpus size without retuning the literal.

    ``materialize=True`` checkpoints the band-bucket table before it
    fans out: the self-join consumes it twice (three+ times with the
    auto cap), and without materialization Spark re-executes the whole
    shingle -> md5 -> 16-minhash pipeline per consumer — recompute of
    exactly the stage that dominates at corpus scale. The bucket table
    is 4 rows x ~24 bytes per document (the persisted signature index
    x21 stores), orders of magnitude smaller than the text it came
    from, so executor-local materialization is cheap. It is OFF by
    default because the checkpoint is an EAGER side effect — a real
    Spark job at plan-construction time — and a plan-builder API must
    stay lazy unless the caller opts in; every registered query that
    executes the plan immediately passes ``materialize=True``.
    """
    assert bands * rows == n_hashes
    banded = minhash_band_buckets(
        df, text_col, id_col, n_hashes=n_hashes, bands=bands, rows=rows,
        shingle_n=shingle_n,
    )
    if materialize:
        banded = banded.localCheckpoint(eager=True)
    return lsh_pairs_from_buckets(
        banded, id_col=id_col, max_bucket_size=max_bucket_size,
        cap_floor=cap_floor,
    )


def lsh_pairs_from_buckets(
    banded: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | str | None = None,
    cap_floor: int = 100,
) -> DataFrame:
    """The cap + bucket-self-join tail of :func:`minhash_lsh_pairs`,
    taking an already-built ``(id, band, bh)`` bucket table.

    Split out because the bucket table — the output of the corpus-heavy
    shingle→md5→minhash stage — is a pure PER-DOCUMENT function: any
    corpus snapshot's buckets are a doc-filter of the full table, so a
    cross-snapshot consumer (queries.dd22_dedup_delta) computes
    signatures ONCE and derives each snapshot's pair graph from a
    filtered view, instead of re-shingling the corpus per snapshot.
    Cap semantics are per-snapshot by construction: the count window
    runs on the filtered table the caller passes."""
    if max_bucket_size == "auto":
        from .caps import filter_by_derived_cap

        banded = filter_by_derived_cap(banded, ["band", "bh"], floor=cap_floor)
    elif max_bucket_size is not None:
        from pyspark.sql import Window

        wb = Window.partitionBy("band", "bh")
        banded = (
            banded.withColumn("__bsz", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = banded.select(F.col(id_col).alias("a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_jaccard: float = 0.3,
    shingle_n: int = 3,
    max_doc_freq: int | str | None = None,
    cap_floor: int = 100,
    materialize: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard for every pair sharing >= 1 shingle.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle, count intersections, derive |A ∪ B| = |A| + |B| - |A ∩ B|.
    All-pairs never materializes — only co-occurring pairs shuffle.

    ``max_doc_freq`` is the posting-list cap: a shingle appearing in D
    documents contributes D(D-1)/2 join rows, so one boilerplate trigram
    in 10^6 docs would alone emit 5*10^11 pairs. Shingles with document
    frequency above the cap are excluded from the *join* (count window
    over the shingle — same key the join shuffles on); per-document
    sizes still count every shingle, so capped Jaccard is a strict lower
    bound of true Jaccard and pairs whose only overlap is ultra-common
    boilerplate drop out — which is the curation intent.

    ``max_doc_freq="auto"`` derives the cap from the doc-frequency
    distribution (Tukey fence q3 + 3*IQR, floor ``cap_floor`` — see
    :mod:`..llm.caps`): a corpus 100x bigger has proportionally longer
    legitimate posting lists, and the derived cap tracks that without
    retuning the literal.

    ``materialize=True`` checkpoints the exploded shingle table: its
    three consumers (per-doc sizes, the cap derivation, the
    inverted-index join) shuffle on three DIFFERENT keys, so without
    materialization Spark re-runs the explode once per consumer —
    measured 21% of dd3's wall at sf0.1 (3.87 → 3.07 s median). The
    posting table is the size the join shuffles anyway; a production
    corpus persists it as the inverted index (the same trade as dd2's
    band-bucket table). OFF by default: the checkpoint is an EAGER
    side effect (a real job at plan-CONSTRUCTION time), surprising
    from a plan builder, and filters cannot push below a checkpoint —
    registered queries that execute immediately opt in with
    ``materialize=True``.
    """
    sh = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("s"),
    )
    if materialize:
        sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    if max_doc_freq == "auto":
        from .caps import filter_by_derived_cap

        sh = filter_by_derived_cap(sh, ["s"], floor=cap_floor)
    elif max_doc_freq is not None:
        from pyspark.sql import Window

        ws = Window.partitionBy("s")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(ws))
            .filter(F.col("__df") <= max_doc_freq)
            .drop("__df")
        )
    a = sh.select(F.col(id_col).alias("a"), "s")
    b = sh.select(F.col(id_col).alias("b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .filter(jac >= min_jaccard)
        .select("a", "b", F.round(jac, 4).alias("jaccard"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_containment: float = 0.3,
    shingle_n: int = 3,
    max_doc_freq: int | str | None = None,
    cap_floor: int = 100,
    materialize: bool = False,
) -> DataFrame:
    """Asymmetric near-dup: n-gram containment C(A→B) = |S_A ∩ S_B| / |S_A|.

    Jaccard misses the quote/superset case — a short document fully
    embedded in a long one scores |A|/|B| ≈ 0 symmetric overlap but
    C(A→B) = 1. Emits one row per unordered pair (a < b) carrying BOTH
    directions (``c_ab``, ``c_ba``), kept when either side reaches
    ``min_containment`` — the curation signal for "this doc is mostly a
    copy of part of that one".

    Same inverted-index shape as :func:`ngram_jaccard_pairs` — explode
    distinct shingles, self-join on the shingle, one (a, b) count agg —
    and the same ``max_doc_freq`` posting-list cap bounding any one
    shingle's D(D-1)/2 join fan-out ("auto" derives it from the
    doc-frequency distribution, floor ``cap_floor`` — :mod:`..llm.caps`).
    Capped containment is a strict lower bound of true containment
    (sizes still count every shingle). ``materialize`` checkpoints the
    shingle table exactly as in :func:`ngram_jaccard_pairs` (same
    three-consumer shape, same eager-at-construction caveat).
    """
    sh = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("s"),
    )
    if materialize:
        sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    if max_doc_freq == "auto":
        from .caps import filter_by_derived_cap

        sh = filter_by_derived_cap(sh, ["s"], floor=cap_floor)
    elif max_doc_freq is not None:
        from pyspark.sql import Window

        ws = Window.partitionBy("s")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(ws))
            .filter(F.col("__df") <= max_doc_freq)
            .drop("__df")
        )
    a = sh.select(F.col(id_col).alias("a"), "s")
    b = sh.select(F.col(id_col).alias("b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    c_ab = F.col("i") / F.col("na")
    c_ba = F.col("i") / F.col("nb")
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .filter(F.greatest(c_ab, c_ba) >= min_containment)
        .select(
            "a",
            "b",
            F.round(c_ab, 4).alias("c_ab"),
            F.round(c_ba, 4).alias("c_ba"),
        )
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, label) over the undirected pair graph, label = the minimum
    node id of the component — the "pick one survivor per duplicate
    cluster" primitive.

    Iterative min-label propagation run to a FIXED POINT: each round
    every node takes the min of its own and its neighbors' labels; the
    loop stops when a round changes zero labels (one cheap ``count()``
    per round on the already-checkpointed frame). A fixed round budget
    would silently split any duplicate chain longer than the budget —
    convergence needs exactly ``diameter`` rounds, and near-dup
    components are shallow in practice. ``max_iter`` is a runaway guard
    only; hitting it raises rather than returning split clusters.
    Labels are seeded with round 1's output (min of self and
    neighbors, one groupBy over the edge table) rather than the
    identity labeling: for clique-shaped components — the common
    near-dup case — the seed already IS the fixed point, so the loop's
    first iteration is just the convergence confirmation (measured
    −28% on dd22 at sf0.1, shared by every CC consumer).

    At web scale the same per-round plan (join + groupBy min) is the
    inner step of small-star/large-star alternation; plain propagation
    suffices for bounded-diameter dedup graphs.
    """
    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    edges = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    # Partition count must track GRAPH size, not the session default: a
    # dedup-pair graph is orders of magnitude smaller than the corpus it
    # came from, and per-round fixed cost (tasks × rounds) dominates the
    # fixed-point loop when every round schedules session-width tasks
    # over a few thousand edges. ~2M edges per partition; the same
    # formula widens naturally for a billion-edge graph.
    n_parts = max(1, min(int(edges.count() // 2_000_000) + 1, 2000))
    edges = edges.repartition(n_parts, "b").localCheckpoint(eager=True)
    # Seed with ROUND 1's output instead of the identity labeling:
    # label0(node) = min(node, min neighbor), one groupBy over the
    # edges the identity init would have joined against anyway. For
    # clique-shaped dedup components (the common near-dup case) this
    # IS the fixed point, so the loop's first iteration is the
    # convergence confirmation — one full propagation round saved for
    # every CC consumer (dd6/dd13/dd21/dd22/dd23/tx31/...). Both
    # directions of every edge are present, so the a-side covers every
    # node.
    labels = (
        edges.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__nbr"))
        .select(
            "node",
            F.least(F.col("node"), F.col("__nbr")).alias("label"),
        )
        .coalesce(n_parts)
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(edges.a)
            .agg(F.min("label").alias("nbr_label"))
            .select(F.col("a").alias("node"), "nbr_label")
        )
        # carry the OLD label through the round's checkpoint so the
        # convergence check is a filter+count over the materialized
        # frame instead of a second node-keyed shuffle join of old vs
        # new labels — one fewer shuffle per round for every CC
        # consumer (r15 optimization, guide §2.4; labels themselves
        # are byte-identical, __old never leaves this loop)
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("__old"),
            )
            .coalesce(n_parts)
            .localCheckpoint(eager=True)  # cut the growing lineage per round
        )
        changed = new_labels.filter(F.col("label") != F.col("__old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the guard; raise max_iter"
    )


# --- SimHash ----------------------------------------------------------------
# 16-bit simhash from the first 4 hex chars of md5(token): per bit, sum +1/-1
# over tokens by bit value, take the sign. All arithmetic (strpos on a hex
# alphabet + integer div/mod) so Spark and DuckDB agree bit-for-bit.

_HEX = "0123456789abcdef"


def _hexval(chr_col: Column) -> Column:
    return (F.instr(F.lit(_HEX), chr_col) - 1).cast("int")


def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """id -> 16-bit simhash (BIGINT). Explode tokens once, aggregate 16
    bit-sums in a single groupBy pass (one shuffle on id)."""
    toks = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    h4 = F.substring(F.md5(F.col("tok")), 1, 4)
    with_bits = toks.select(
        id_col,
        *[
            (
                ((_hexval(F.substring(h4, 4 - b // 4, 1)) / (2 ** (b % 4))).cast("int") % 2)
                .alias(f"bit{b}")
            )
            for b in range(16)
        ],
    )
    aggs = [
        F.sum(F.when(F.col(f"bit{b}") == 1, 1).otherwise(-1)).alias(f"s{b}")
        for b in range(16)
    ]
    summed = with_bits.groupBy(id_col).agg(*aggs)
    sim = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return summed.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def simhash16_sql(table: str, text_col: str, id_col: str) -> str:
    """DuckDB twin of :func:`simhash16`."""
    tok_cte = (
        f"SELECT {id_col}, unnest(string_split_regex(trim({text_col}), '\\s+')) AS tok "
        f"FROM {table}"
    )
    bit_exprs = []
    for b in range(16):
        char_idx = 4 - b // 4  # 1-based from left; bit15 lives in char 1
        bit_exprs.append(
            f"cast(floor((strpos('{_HEX}', substr(md5(tok), {char_idx}, 1)) - 1) "
            f"/ {2 ** (b % 4)}) AS INT) % 2 AS bit{b}"
        )
    sum_exprs = [
        f"sum(CASE WHEN bit{b} = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(16)
    ]
    sim_terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(16)
    )
    return f"""
    WITH toks AS ({tok_cte}),
    bits AS (SELECT {id_col}, {', '.join(bit_exprs)} FROM toks),
    sums AS (SELECT {id_col}, {', '.join(sum_exprs)} FROM bits GROUP BY {id_col})
    SELECT {id_col}, cast({sim_terms} AS BIGINT) AS simhash FROM sums
    """


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, s0..s{n-1}) — the raw MinHash signature table, the
    estimator UNDER the band buckets: sig-component agreement
    fraction estimates Jaccard (E[s_j(a) == s_j(b)] = J(a,b)), which
    dd17 verifies as a numeric contract. Kept standalone (same
    affine family and shingle pipeline as :func:`minhash_band_buckets`,
    which packs these into band hashes) so adding the estimator view
    never touches the driver-verified near-dup paths."""
    exploded = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles(F.col(text_col), shingle_n))
        ).alias("s"),
    )
    hashed = exploded.select(
        F.col(id_col), _h32(F.md5(F.col("s"))).alias("h")
    )
    return hashed.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(
                f"s{j}"
            )
            for j, (a, b) in enumerate(MINHASH_AB[:n_hashes])
        ]
    )
