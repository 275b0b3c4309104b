"""Deduplication family (dd1-dd23): exact, MinHash banded LSH, SimHash, n-gram Jaccard, embedding near-dup, decontamination, soft-dedup weights, cross-snapshot delta, canonical (re-)election.

Mechanically split from the former flat queries.py (r10);
docstrings and within-family registration order unchanged.
"""

from ._shared import *  # noqa: F401,F403 — F, Window, scalar/op helpers, register
from ._shared import _t, AS_OF, REGISTRY, register  # noqa: F401
from ._helpers import (  # noqa: F401
    _DUCK_COMP,
    _DUCK_TOKS,
    _EN,
    _kmeans_iter_sql,
    _minhash_ctes,
)

@register(
    "dd1_exact_dedup",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dd1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (exact): hash-groupBy keep-min-id. One shuffle on the
    16-byte hash — document size never crosses the exchange."""
    from ..llm import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"), "text", "doc_id")


def _minhash_sql(
    n_hashes: int = 16,
    bands: int = 4,
    rows: int = 4,
    max_bucket_size: int | str | None = None,
) -> str:
    return f"""
    WITH {_minhash_ctes(n_hashes, bands, rows, max_bucket_size)}
    SELECT a, b FROM mh_pairs
    """


@register("dd2_minhash_lsh", _minhash_sql(max_bucket_size="auto"))
def dd2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (MinHash+LSH): shingle → 16 md5-min-hashes → 4 bands × 4 rows
    → bucket self-join, degenerate buckets dropped before the join. The
    scalable near-dup path: no all-pairs compare, shuffle keyed on
    (band, bucket), pair fan-out bounded by the bucket cap — DERIVED
    from the bucket-size distribution (Tukey fence q3+3*IQR, floor 100;
    llm/caps.py) rather than a literal, so the same query text stays
    safe at any corpus size. The oracle reproduces the derived cap with
    integer-exact discrete quantiles."""
    from ..llm.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        max_bucket_size="auto", materialize=True,
    )


def _dd14_sql() -> str:
    return f"""
    WITH {_minhash_ctes(max_bucket_size="auto")},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.a, p.b, count(*) AS i
      FROM mh_pairs p
      JOIN sh x ON x.doc_id = p.a
      JOIN sh y ON y.doc_id = p.b AND y.s = x.s
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT count(*) AS n_verified
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.a
      JOIN sizes sb ON sb.doc_id = inter.b
      WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.3
    ),
    cand AS (SELECT count(*) AS n_candidates FROM mh_pairs)
    SELECT cast(n_candidates AS BIGINT) AS n_candidates,
           cast(n_verified AS BIGINT) AS n_verified,
           CASE WHEN n_candidates > 0
                THEN round(n_verified * 1.0 / n_candidates, 4) END AS precision_at_t
    FROM cand, verified
    """


@register("dd14_lsh_precision", None)  # finalized below (needs minhash CTEs)
def dd14_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH quality contract from the PRECISION side — ann6's twin:
    of the candidate pairs MinHash banding surfaces (dd2), what fraction
    survives exact Jaccard verification at t=0.3? Candidate-then-verify
    is the standard two-stage near-dup pipeline (band collisions prune
    the pair space, exact set similarity confirms); this query emits
    (n_candidates, n_verified, precision) as one row so the pruning
    quality is hash-checked at every scale, not assumed. Low precision
    means wasted verification work (bands too coarse); the recall side
    is ann6's and the band-layout solver (lsh_params_for) trades the
    two explicitly."""
    from ..llm.dedup import _spread, minhash_lsh_pairs, shingles

    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size="auto", materialize=True
    ).localCheckpoint(eager=True)
    sh = _spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sha = sh.select(F.col("doc_id").alias("a"), "s")
    shb = sh.select(F.col("doc_id").alias("b"), "s")
    inter = (
        cand.join(sha, "a")
        .join(shb, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    verified = (
        inter.join(sa, "a").join(sb, "b").filter(jac >= 0.3)
        .agg(F.count("*").cast("bigint").alias("n_verified"))
    )
    ncand = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    return ncand.crossJoin(verified).select(
        "n_candidates",
        "n_verified",
        F.when(
            F.col("n_candidates") > 0,
            F.round(F.col("n_verified") / F.col("n_candidates"), 4),
        ).alias("precision_at_t"),
    )


REGISTRY["dd14_lsh_precision"].sql = _dd14_sql()


def _ngram_jaccard_sql(max_doc_freq: int | str | None = None) -> str:
    from ..llm.caps import tukey_cap_sql_ctes
    from ..llm.dedup import shingles_sql

    if max_doc_freq == "auto":
        cap = tukey_cap_sql_ctes("sh", "s", floor=100).lstrip() + ","
    elif max_doc_freq is not None:
        cap = (
            f"capped AS (SELECT doc_id, s FROM sh "
            f"QUALIFY count(*) OVER (PARTITION BY s) <= {max_doc_freq}),"
        )
    else:
        cap = "capped AS (SELECT * FROM sh),"
    return f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({shingles_sql('text')})) AS s FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    {cap}
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.3
    """


@register("dd3_ngram_jaccard", _ngram_jaccard_sql(max_doc_freq="auto"))
def dd3_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (n-gram Jaccard): exact set similarity over the
    inverted-index join — only pairs sharing a shingle are scored, and
    ultra-common shingles are excluded from the join (posting-list cap:
    bounds per-shingle pair fan-out; capped Jaccard is a lower bound, so
    boilerplate-only overlaps drop out). The cap is DERIVED from the
    doc-frequency distribution (Tukey fence, floor 100; llm/caps.py):
    the sf0.1 fence is already 5x the sf0.01 one, so a literal tuned at
    one scale mis-caps at the next — the derived cap tracks the corpus."""
    from ..llm.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", 0.3,
        max_doc_freq="auto", materialize=True,
    )


def _ngram_containment_sql(min_containment: float, max_doc_freq: int) -> str:
    from ..llm.dedup import shingles_sql

    return f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({shingles_sql('text')})) AS s FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    capped AS (SELECT doc_id, s FROM sh
               QUALIFY count(*) OVER (PARTITION BY s) <= {max_doc_freq}),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(i * 1.0 / sa.n, 4) AS c_ab, round(i * 1.0 / sb.n, 4) AS c_ba
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE greatest(i * 1.0 / sa.n, i * 1.0 / sb.n) >= {min_containment}
    """


@register("dd12_ngram_containment", _ngram_containment_sql(0.3, 100))
def dd12_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (asymmetric containment): C(A→B) = |S_A ∩ S_B| / |S_A| —
    catches the quote/superset case symmetric Jaccard (dd3) misses: a
    short doc fully embedded in a long one has near-zero Jaccard but
    containment 1. One row per pair with both directions; the same
    inverted-index join and df-100 posting-list cap as dd3."""
    from ..llm.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", 0.3,
        max_doc_freq=100, materialize=True,
    )


@register("dd4_simhash", None)  # placeholder replaced below
def dd4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (SimHash): 16-bit majority-vote signature — near-dups land on
    equal/adjacent signatures; grouping on the signature is one shuffle."""
    from ..llm.dedup import simhash16

    return simhash16(_t(spark, sf_dir, "documents"), "text", "doc_id")


def _finalize_dd4():
    from ..llm.dedup import simhash16_sql

    REGISTRY["dd4_simhash"].sql = simhash16_sql("documents", "text", "doc_id")


_finalize_dd4()


def _hyperplane_lsh_sql(
    min_sim: float,
    n_planes: int = 16,
    bands: int = 4,
    max_bucket_size: int | str | None = None,
) -> str:
    """DuckDB twin of cosine_pairs' default bucketed path: identical
    md5-derived hyperplane coefficients -> identical sign-bit band
    buckets -> identical candidate set (including the degenerate-bucket
    cap when ``max_bucket_size`` is set — "auto" emits the derived-cap
    CTE chain with cosine_pairs' floor/ceiling); exact cosine on
    candidates."""
    from ..llm.caps import tukey_cap_sql_ctes
    from ..llm.dedup import _hexint_sql

    rows_per_band = n_planes // bands
    md5_exprs = ", ".join(
        f"md5('rp{p}|' || cast(i AS VARCHAR)) AS m{p}" for p in range(n_planes)
    )
    coef_exprs = ", ".join(
        f"({_hexint_sql(f'm{p}', 8)} / 2147483648.0 - 1.0) AS r{p}"
        for p in range(n_planes)
    )
    proj_exprs = ", ".join(f"sum(v * r{p}) AS pr{p}" for p in range(n_planes))
    bit_exprs = ", ".join(
        f"CASE WHEN pr{p} >= 0 THEN 1 ELSE 0 END AS b{p}" for p in range(n_planes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT vec_id, {b} AS band, md5({concat}) AS bh FROM bits".format(
            b=b,
            concat=" || '|' || ".join(
                f"cast(b{b * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    idx AS (SELECT DISTINCT i FROM comp),
    md5s AS (SELECT i, {md5_exprs} FROM idx),
    coefs AS (SELECT i, {coef_exprs} FROM md5s),
    coef AS (SELECT comp.vec_id, comp.v, {', '.join(f'coefs.r{p}' for p in range(n_planes))}
             FROM comp JOIN coefs ON comp.i = coefs.i),
    proj AS (SELECT vec_id, {proj_exprs} FROM coef GROUP BY vec_id),
    bits AS (SELECT vec_id, {bit_exprs} FROM proj),
    bands AS ({band_selects}),
    {
        tukey_cap_sql_ctes("bands", "band, bh", floor=200, hard_max=5000).lstrip()
        if max_bucket_size == "auto"
        else (
            "kept AS (SELECT band, bh FROM bands GROUP BY 1, 2"
            + (
                f" HAVING count(*) <= {max_bucket_size}"
                if max_bucket_size is not None
                else ""
            )
            + "), capped AS (SELECT bands.* FROM bands "
            "JOIN kept USING (band, bh))"
        )
    },
    cand AS (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM capped x
      JOIN capped y ON x.band = y.band AND x.bh = y.bh
                    AND x.vec_id < y.vec_id
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    dots AS (
      SELECT c.a, c.b, sum(ca.v * cb.v) AS dot
      FROM cand c
      JOIN comp ca ON ca.vec_id = c.a
      JOIN comp cb ON cb.vec_id = c.b AND cb.i = ca.i
      GROUP BY 1, 2
    )
    SELECT dots.a, dots.b, round(dot / (na.norm * nb.norm), 4) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = dots.a
    JOIN norms nb ON nb.vec_id = dots.b
    WHERE na.norm > 0 AND nb.norm > 0
      AND dot / (na.norm * nb.norm) >= {min_sim}
    """


@register("dd5_embedding_neardup", _hyperplane_lsh_sql(0.25, max_bucket_size="auto"))
def dd5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (embedding cosine): near-dup pairs above a cosine threshold
    via the default BUCKETED path — hyperplane-LSH candidates, exact
    cosine on survivors, zero driver-side state (the oracle reproduces
    the same md5-derived buckets AND the bucket-size cap, so the
    candidate set is checked too).

    Threshold-recall contract: with 4 bands of 4 sign bits a pair at
    cosine c collides in at least one band with probability
    1 - (1 - (1 - arccos(c)/pi)^4)^4 — >99.9% at c=0.9, ~39% at this
    query's deliberately-low c=0.25. Low thresholds are inherently
    hostile to hyperplane LSH: use ``preset="high_recall"`` (derives the
    band layout from ``min_sim`` via lsh_params_for — 0.25 -> 11 bands
    of 3 bits, ~91% recall) or ``allow_all_pairs`` for exact recall on
    bounded inputs. ``max_bucket_size="auto"`` derives the
    degenerate-bucket cap from the bucket-size distribution (Tukey
    fence, floor 200, hard ceiling 5000 = the gram kernel's task-memory
    bound; llm/caps.py) — the OOM guard a 100 TB run needs, now
    scale-adaptive; the oracle reproduces the identical derived cap so
    the pruning is verified, not just claimed."""
    from ..llm import cosine_pairs

    return cosine_pairs(
        _t(spark, sf_dir, "embeddings"), min_sim=0.25,
        max_bucket_size="auto", materialize=True,
    )


_DD6_SQL = f"""
WITH RECURSIVE {_minhash_ctes(max_bucket_size=100)},
edges AS (SELECT a, b FROM mh_pairs UNION SELECT b, a FROM mh_pairs),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r FROM edges e JOIN reach ON reach.node = e.b
),
labels AS (SELECT node, min(r) AS label FROM reach GROUP BY node)
SELECT label AS cluster_id, count(*) AS cluster_size, min(node) AS keep_id
FROM labels GROUP BY label
"""


@register("dd6_lsh_dup_clusters", _DD6_SQL)
def dd6_lsh_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (clusters): connected components over the MinHash-LSH
    candidate-pair graph via iterative min-label propagation — the
    canonical "pick one survivor per duplicate cluster" step.

    Each round is one join + one groupBy, iterated to a FIXED POINT
    (llm.dedup.connected_components) — a fixed round budget would
    split any duplicate chain longer than the budget. At scale this is
    the standard large-graph CC recipe (alternate small-star /
    large-star); here plain propagation suffices. The DuckDB oracle
    reaches the same fixed point by a different route — recursive-CTE
    transitive closure + min-reach per node — so the hash match is an
    independent check of the iterative Spark plan, not a replay of it.
    """
    from ..llm.dedup import connected_components, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size=100, materialize=True
    ).localCheckpoint(eager=True)
    labels = connected_components(pairs)
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
            F.min("node").alias("keep_id"),
        )
        .select(F.col("label").alias("cluster_id"), "cluster_size", "keep_id")
    )


_DD13_SQL = f"""
WITH RECURSIVE {_minhash_ctes(max_bucket_size=100)},
edges AS (SELECT a, b FROM mh_pairs UNION SELECT b, a FROM mh_pairs),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r FROM edges e JOIN reach ON reach.node = e.b
),
labels AS (SELECT node, min(r) AS label FROM reach GROUP BY node),
q AS (
  SELECT doc_id,
         round(0.4 * least(length(text) / 500.0, 1.0)
             + 0.3 * (1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text))
             + 0.3 * least(len(list_filter({{TOKS}}, x -> list_contains({{EN}}, x))) * 1.0
                           / len({{TOKS}}) * 5.0, 1.0), 10) AS quality
  FROM documents
),
lab AS (
  SELECT d.doc_id, coalesce(labels.label, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels ON labels.node = d.doc_id
)
SELECT lab.doc_id, lab.cluster_id, q.quality,
       (row_number() OVER (PARTITION BY lab.cluster_id
                           ORDER BY q.quality DESC, lab.doc_id) = 1) AS is_canonical
FROM lab JOIN q ON q.doc_id = lab.doc_id
"""


@register("dd13_cluster_canonical", None)  # finalized below (needs _EN/_DUCK_TOKS)
def dd13_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection — the curation keep-rule composed
    end-to-end: MinHash-LSH candidate pairs -> connected components
    (duplicate clusters) -> keep the HIGHEST-QUALITY member of each
    cluster (tie -> min doc_id), not merely the min id. dd6 answers
    "which docs are together"; this answers the question a training-set
    builder actually asks: "which copy do we train on". Singleton docs
    (no near-dup) are their own cluster and always canonical.

    Plan shape: the pair graph + CC is dd6's (per-round join + min-agg
    to a fixed point, graph-sized partitioning), quality is a pure
    projection fused into the scan, the final pick is one window over
    cluster_id. The oracle reaches the same fixed point by recursive-CTE
    transitive closure and replays the quality formula exactly, so
    cluster membership AND the argmax-quality pick are hash-checked."""
    from ..llm import quality_score
    from ..llm.dedup import connected_components, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size=100, materialize=True
    ).localCheckpoint(eager=True)
    labels = connected_components(pairs).withColumnRenamed("node", "doc_id")
    lab = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("label", F.col("doc_id")).alias("cluster_id")
        )
    )
    q = docs.select("doc_id", quality_score(F.col("text")).alias("quality"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        lab.join(q, "doc_id")
        .select(
            "doc_id",
            "cluster_id",
            "quality",
            (F.row_number().over(w) == 1).alias("is_canonical"),
        )
    )


REGISTRY["dd13_cluster_canonical"].sql = _DD13_SQL.replace(
    "{TOKS}", _DUCK_TOKS
).replace("{EN}", _EN)


# ===========================================================================
# Round-2 widening: hamming near-dup, batch ANN, skew-salted agg, BPE-ish
# tokens, sliding windows, SCD2 history, trailing range frames
# ===========================================================================


@register("dd7_simhash_hamming", None)  # filled by _finalize_dd7
def dd7_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (SimHash hamming ball): pairs whose 16-bit signatures differ
    by <= 1 bit. The scalable shape is neighborhood-explode: each doc
    probes its signature plus all 16 one-bit flips (17 rows) and joins
    probe == signature — an equi-join keyed on the signature, never an
    all-pairs XOR scan (the oracle does the dumb O(N^2) XOR, which is
    exactly what makes it a good independent check)."""
    from ..llm.dedup import simhash16

    # both join sides consume the signature table; un-pinned, the
    # shingle -> per-bit-majority build ran twice (the probe and
    # signature legs shuffle on different keys, so no exchange reuse
    # is possible). ~10 bytes/doc — the persisted-index class (r15,
    # guide §2.4)
    sig = simhash16(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).localCheckpoint(eager=True)
    left = sig.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    probe_arr = F.array(
        F.col("sa"), *[F.col("sa").bitwiseXOR(F.lit(1 << b)) for b in range(16)]
    )
    probes = left.select("a", "sa", F.explode(probe_arr).alias("probe"))
    right = sig.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"))
    return (
        probes.join(right, probes.probe == right.sb)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
        .select(
            "a", "b", F.expr("cast(bit_count(sa ^ sb) AS INT)").alias("hamming")
        )
    )


def _finalize_dd7():
    from ..llm.dedup import simhash16_sql

    REGISTRY["dd7_simhash_hamming"].sql = f"""
    WITH sims AS ({simhash16_sql('documents', 'text', 'doc_id')})
    SELECT a.doc_id AS a, b.doc_id AS b,
           cast(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
    """


_finalize_dd7()


# ===========================================================================
# Training-data curation round 2: decontamination, TF-IDF, bigram-LM
# scoring, k-means IVF centroid training
# ===========================================================================


_SHINGLE4_SQL = None  # filled lazily by _decon_sql


def _decon_sql() -> str:
    from ..llm.dedup import shingles_sql

    sh = shingles_sql("text", 4)
    return f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({sh})) AS s FROM documents
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 29 = 0),
    train AS (SELECT * FROM sh WHERE doc_id % 29 <> 0)
    SELECT t.doc_id, count(*) AS n_shared
    FROM train t JOIN bench USING (s)
    GROUP BY 1
    """


@register("dd8_decontaminate", None)  # sql attached below (needs import)
def dd8_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word 4-gram with a held-out benchmark set (here the deterministic
    doc_id % 29 == 0 slice standing in for an eval suite). The scale
    shape is the only one that works at 100 TB: the benchmark's distinct
    shingle set is small and BROADCAST, the corpus side is a map-side
    explode + broadcast-hash semi-match + one groupBy on doc_id — the
    100 TB corpus is never shuffled on shingle text. Mirrors the n-gram
    overlap decontamination procedure of GPT-3/PaLM appendix C."""
    from ..llm.dedup import _spread, shingles

    d = _t(spark, sf_dir, "documents")
    sh = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("text"), 4))).alias("s")
    )
    bench = sh.filter(F.col("doc_id") % 29 == 0).select("s").distinct()
    train = sh.filter(F.col("doc_id") % 29 != 0)
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )


REGISTRY["dd8_decontaminate"].sql = _decon_sql()


_SEMDEDUP_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
cent0 AS (
  SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4
),
{_kmeans_iter_sql('cent0', 1)},
{_kmeans_iter_sql('cent1', 2)},
{_kmeans_iter_sql('cent2', 3)},
asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
{{CELL_CAP}},
norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
cand AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM capped x JOIN capped y ON x.cell = y.cell AND x.vec_id < y.vec_id
),
dots AS (
  SELECT c.a, c.b, sum(ca.v * cb.v) AS dot
  FROM cand c
  JOIN comp ca ON ca.vec_id = c.a
  JOIN comp cb ON cb.vec_id = c.b AND cb.i = ca.i
  GROUP BY 1, 2
),
dup AS (
  SELECT DISTINCT dots.b
  FROM dots
  JOIN norms na ON na.vec_id = dots.a
  JOIN norms nb ON nb.vec_id = dots.b
  WHERE na.norm > 0 AND nb.norm > 0
    AND dot / (na.norm * nb.norm) >= 0.3
)
SELECT asg.vec_id, asg.cell, (dup.b IS NULL) AS is_kept
FROM asg LEFT JOIN dup ON asg.vec_id = dup.b
"""


def _semdedup_sql() -> str:
    from ..llm.caps import tukey_cap_sql_ctes

    return _SEMDEDUP_SQL.replace(
        "{CELL_CAP}",
        tukey_cap_sql_ctes("asg", "cell", floor=200, hard_max=5000).strip(),
    )


@register("dd11_semantic_dedup", None)  # finalized below (needs cap CTEs)
def dd11_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (semantic, SemDeDup-style): k-means cells + one BLAS gram
    matrix per cell; vectors with an in-cell neighbor above 0.3 cosine
    and a lower id are dropped (is_kept = false). Composes the two
    halves that already exist — :func:`llm.similarity.kmeans_assign`
    (= ann4's trainer, broadcast centroids) and the per-group gram
    kernel shared with dd5. ``max_cell_size="auto"`` turns the OOM
    guard on with a cap derived from the cell-size distribution (Tukey
    fence, floor 200, ceiling 5000; llm/caps.py): balanced cells always
    pass, a skew blow-out is excluded from the gram pass (its members
    stay in the output, un-scored). The oracle replays both Lloyd
    iterations as CTE chains, the derived cap, and the in-cell pair
    scoring exactly — assignment, candidate set, and keep/drop
    decisions are all hash-checked."""
    from ..llm.similarity import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), k=4, iters=2, min_sim=0.3,
        max_cell_size="auto", materialize=True,
    )


REGISTRY["dd11_semantic_dedup"].sql = _semdedup_sql()


def _dd9_sql() -> str:
    n = 8
    toks = "string_split_regex(trim(text), '\\s+')"
    # positional shingles: (pos 1-based, 8-token window)
    return f"""
    WITH pos_sh AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len({toks}) - {n - 1}, 0) + 1),
               i -> {{'i': i, 'g': array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')}}
             )) AS u
      FROM documents
    ),
    flat AS (SELECT doc_id, u.i AS pos, u.g AS g FROM pos_sh),
    capped AS (
      SELECT * FROM flat
      QUALIFY count(DISTINCT doc_id) OVER (PARTITION BY g) <= 10
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           cast(a.pos AS BIGINT) AS pos_a, cast(b.pos AS BIGINT) AS pos_b
    FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
    """


@register("dd9_repeated_spans", None)  # sql attached below
def dd9_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-span detection (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better", the ExactSubstr
    operator's distributed restatement): every position pair where two
    documents share a verbatim 8-token window — the input a surgical
    span-REMOVAL pass needs (unlike dd3, which only scores whole-doc
    overlap). Inverted-index join on the window text with a
    doc-frequency cap (>10 docs = boilerplate, excluded — same guard as
    dd3's posting lists). Suffix-array construction is the single-node
    recipe; the window-hash inverted index is the shuffle-native one."""
    from ..llm.dedup import _spread, shingles

    d = _t(spark, sf_dir, "documents")
    sh = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.posexplode(shingles(F.col("text"), 8)).alias("pos0", "g")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    wdf = Window.partitionBy("g")
    capped = (
        sh.withColumn("__df", F.size(F.collect_set("doc_id").over(wdf)))
        .filter(F.col("__df") <= 10)
        .drop("__df")
    )
    a = capped.select(F.col("doc_id").alias("a"), F.col("pos").alias("pos_a"), "g")
    b = capped.select(F.col("doc_id").alias("b"), F.col("pos").alias("pos_b"), "g")
    return (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.col("pos_a").cast("bigint").alias("pos_a"),
            F.col("pos_b").cast("bigint").alias("pos_b"),
        )
    )


REGISTRY["dd9_repeated_spans"].sql = _dd9_sql()


_DD10_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, cast(ceil(len(t) / 16.0) AS INT)),
           i -> {'pos': i,
                 'chunk': array_to_string(list_slice(t, i * 16 + 1, i * 16 + 16), ' ')}
         )) AS u
  FROM toks
),
flat AS (SELECT doc_id, u.pos AS pos, u.chunk AS chunk FROM chunks),
ranked AS (
  SELECT doc_id,
         CASE WHEN row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) = 1
              THEN 1 ELSE 0 END AS kept
  FROM flat
)
SELECT doc_id, count(*) AS n_chunks,
       cast(sum(kept) AS BIGINT) AS n_kept,
       round(sum(kept) * 1.0 / count(*), 4) AS retained_frac
FROM ranked GROUP BY doc_id
"""


@register("dd10_chunk_dedup", _DD10_SQL)
def dd10_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup (paragraph dedup with synthetic 16-token
    chunks as the paragraph stand-in, since the corpus has no newlines):
    every verbatim-repeated chunk keeps only its first occurrence
    (min (doc_id, pos) wins — row_number over the chunk text), and each
    document reports how much of it survives. This is the removal-side
    complement of dd9's span *detection*: a pipeline drops rows with low
    retained_frac or reassembles kept chunks. One shuffle keyed on chunk
    text (16-token strings, so the key space is huge and well-spread);
    at 100 TB hash the chunk to a 128-bit key first so the exchange
    carries 16 bytes, not the text."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nchunks = F.ceil(F.size(toks) / F.lit(16.0)).cast("int")
    chunked = d.select(
        "doc_id",
        F.posexplode(
            # let-bind the token array: referencing the split from the
            # lambda body would re-run the regex once per CHUNK
            let_(
                toks,
                lambda t: F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size(t) / F.lit(16.0)).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(t, i * 16 + 1, 16), " "
                    ),
                ),
            )
        ).alias("pos", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    ranked = chunked.withColumn(
        "kept", F.when(F.row_number().over(w) == 1, 1).otherwise(0)
    )
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.round(F.sum("kept") / F.count("*"), 4).alias("retained_frac"),
    )


_DD15_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, cast(ceil(len(t) / 16.0) AS INT)),
           i -> {'pos': i,
                 'chunk': array_to_string(list_slice(t, i * 16 + 1, i * 16 + 16), ' ')}
         )) AS u
  FROM toks
),
flat AS (SELECT doc_id, u.pos AS pos, u.chunk AS chunk FROM chunks),
ranked AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
  FROM flat
),
reasm AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM ranked WHERE rn = 1 GROUP BY doc_id
),
counts AS (SELECT doc_id, count(*) AS n_chunks FROM flat GROUP BY doc_id)
SELECT c.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       cast(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       cast(c.n_chunks - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
FROM counts c LEFT JOIN reasm r USING (doc_id)
"""


@register("dd15_line_dedup", _DD15_SQL)
def dd15_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup with REASSEMBLY — the CCNet/RefinedWeb corpus
    stage that strips boilerplate repeated across pages (nav bars,
    cookie banners, license headers) by deleting every non-first
    occurrence of a repeated line and stitching the survivors back into
    the document. Restated on 16-token windows ("lines"), since the
    synthetic corpus has no newlines — the same chunking as dd10, whose
    output is the retention REPORT where this emits the cleaned TEXT.

    Distributed shape: one shuffle keyed on chunk text for the global
    first-occurrence ranking (at 100 TB hash the chunk to 128 bits
    first so the exchange carries 16 bytes/row), one doc_id shuffle for
    reassembly; order restored by sorting each doc's surviving (pos,
    chunk) pairs inside the aggregate — no global sort, no window
    without partitioning. Docs whose every chunk was seen earlier
    collapse to an empty clean_text (kept, so the corpus row count is
    stable; a curation pipeline then drops empties by filter)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nchunks = F.ceil(F.size(toks) / F.lit(16.0)).cast("int")
    chunked = d.select(
        "doc_id",
        F.posexplode(
            # let-bind the token array: referencing the split from the
            # lambda body would re-run the regex once per CHUNK
            let_(
                toks,
                lambda t: F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size(t) / F.lit(16.0)).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(t, i * 16 + 1, 16), " "
                    ),
                ),
            )
        ).alias("pos", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    ranked = chunked.withColumn("rn", F.row_number().over(w))
    reasm = (
        ranked.filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "chunk"))
                    ),
                    lambda x: x["chunk"],
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").cast("bigint").alias("n_kept"),
        )
    )
    # n_chunks is a pure projection of the token count — no second
    # explode, no aggregation shuffle for the left side of the join
    counts = d.select("doc_id", nchunks.cast("bigint").alias("n_chunks"))
    return counts.join(reasm, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_dropped"),
    )


def _dd17_sql() -> str:
    agree = " + ".join(
        f"CASE WHEN sa.s{j} = sb.s{j} THEN 1 ELSE 0 END" for j in range(16)
    )
    return f"""
    WITH {_minhash_ctes(max_bucket_size="auto")},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.a, p.b, count(*) AS i
      FROM mh_pairs p
      JOIN sh x ON x.doc_id = p.a
      JOIN sh y ON y.doc_id = p.b AND y.s = x.s
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.a, p.b,
             ({agree}) / 16.0 AS est,
             coalesce(i, 0) * 1.0
               / (za.n + zb.n - coalesce(i, 0)) AS truth
      FROM mh_pairs p
      LEFT JOIN inter ON inter.a = p.a AND inter.b = p.b
      JOIN sizes za ON za.doc_id = p.a
      JOIN sizes zb ON zb.doc_id = p.b
      JOIN sig sa ON sa.doc_id = p.a
      JOIN sig sb ON sb.doc_id = p.b
    )
    SELECT cast(count(*) AS BIGINT) AS n_pairs,
           round(avg(abs(est - truth)), 4) AS mae,
           round(max(abs(est - truth)), 4) AS max_abs_err,
           round(avg(est - truth), 4) AS bias
    FROM scored
    """


@register("dd17_minhash_estimator_error", None)  # sql attached below
def dd17_minhash_estimator_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The MinHash ESTIMATOR's numeric contract — the third leg of the
    near-dup verification stool: ann6 measures what bucketing costs in
    recall, dd14 what it costs in precision, and this measures the
    estimator itself: over dd2's candidate pairs, how far does the
    16-component signature-agreement fraction sit from the exact
    Jaccard it estimates (E[s_j(a)=s_j(b)] = J)? Emits MAE, worst
    case, and signed bias in one row. With k=16 the theoretical
    standard error at J=0.5 is sqrt(J(1-J)/k) ~ 0.125 — the measured
    MAE is the verified counterpart, and a corpus whose MAE breaks
    away from that band has correlated shingles (boilerplate) that
    the banding parameters should be retuned for.

    Plan shape: the candidate pairs and signature table share one
    shingle pipeline (both sides of dd2's index); the error join is
    pair-keyed; the report is one row. The exact-Jaccard side is the
    contract's truth and exists only here — production serves the
    estimate."""
    from ..llm.dedup import (
        _spread,
        minhash_lsh_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size="auto", materialize=True
    ).localCheckpoint(eager=True)
    # NOT semi-joined to pair members (r15 A/B): dd26's sampled-docs
    # reduction applied here measured 4.20 -> 4.63 s — at gate SFs the
    # planted duplicates put most docs in some pair, so the pdocs
    # filter removes little and only adds a distinct + broadcast.
    # dd26 remains the production form where the reduction is real.
    sigs = minhash_signatures(docs, "text", "doc_id")
    sh = _spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # exact intersection via the shingle co-occurrence join (dd14's form)
    sha = sh.select(F.col("doc_id").alias("a"), "s")
    shb = sh.select(F.col("doc_id").alias("b"), "s")
    inter = (
        pairs.join(sha, "a").join(shb, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sigs.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"s{j}").alias(f"sa{j}") for j in range(16)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"s{j}").alias(f"sb{j}") for j in range(16)],
    )
    agree = sum(
        F.when(F.col(f"sa{j}") == F.col(f"sb{j}"), 1).otherwise(0)
        for j in range(16)
    )
    za = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    scored = (
        pairs.join(inter, ["a", "b"], "left")
        .join(za, "a")
        .join(zb, "b")
        .join(sa, "a")
        .join(sb, "b")
        .select(
            (agree / F.lit(16.0)).alias("est"),
            (
                F.coalesce(F.col("i"), F.lit(0))
                / (
                    F.col("na")
                    + F.col("nb")
                    - F.coalesce(F.col("i"), F.lit(0))
                )
            ).alias("truth"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg(F.abs(F.col("est") - F.col("truth"))), 4).alias("mae"),
        F.round(F.max(F.abs(F.col("est") - F.col("truth"))), 4).alias(
            "max_abs_err"
        ),
        F.round(F.avg(F.col("est") - F.col("truth")), 4).alias("bias"),
    )


REGISTRY["dd17_minhash_estimator_error"].sql = _dd17_sql()


def _dd18_sql() -> str:
    toks = "string_split_regex(trim(text), '\\s+')"
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, len(t) AS n_tokens, t,
             unnest(range(1, greatest(len(t) - 7, 0) + 1)) AS start
      FROM toks
    ),
    grams AS (
      SELECT doc_id, n_tokens, start,
             array_to_string(list_slice(t, start, start + 7), ' ') AS s
      FROM pos
    ),
    bench AS (SELECT DISTINCT s FROM grams WHERE doc_id % 29 = 0),
    hits AS (
      SELECT g.doc_id, g.n_tokens, g.start, g.start + 7 AS fin
      FROM grams g JOIN bench USING (s)
      WHERE g.doc_id % 29 <> 0
    ),
    isl AS (
      SELECT doc_id, n_tokens, start, fin,
             CASE WHEN start > coalesce(max(fin) OVER (
                    PARTITION BY doc_id ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) + 1
                  THEN 1 ELSE 0 END AS newspan
      FROM hits
    ),
    spans AS (
      SELECT doc_id, n_tokens, start, fin,
             sum(newspan) OVER (PARTITION BY doc_id ORDER BY start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS span_id
      FROM isl
    ),
    merged AS (
      SELECT doc_id, n_tokens, span_id,
             min(start) AS s0, max(fin) AS s1, count(*) AS n_grams
      FROM spans GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           cast(n_tokens AS BIGINT) AS n_tokens,
           cast(sum(n_grams) AS BIGINT) AS n_matched_grams,
           cast(count(*) AS BIGINT) AS n_spans,
           cast(sum(s1 - s0 + 1) AS BIGINT) AS covered_tokens,
           round(sum(s1 - s0 + 1) * 1.0 / n_tokens, 4)
             AS contamination_frac
    FROM merged GROUP BY doc_id, n_tokens
    """


@register("dd18_exact_span_decontaminate", None, first_round=9)
def dd18_exact_span_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-match span decontamination (the GPT-3/PaLM recipe): every
    corpus document is scanned for token 8-grams that appear VERBATIM
    in the benchmark split (doc_id % 29 = 0, dd8's convention), the
    matched [start, start+7] token intervals are merged into maximal
    contaminated spans (overlapping OR adjacent intervals coalesce),
    and each contaminated document reports its span count and the
    fraction of its tokens covered. dd8 answers "does this doc share
    shingles with the benchmark" (a set-overlap signal that tolerates
    paraphrase); this is the stricter positional contract — exact
    contiguous reproductions and HOW MUCH of the document they cover —
    which is what the published decontamination procedures actually
    threshold on before dropping or splitting documents.

    Plan shape: benchmark 8-grams are benchmark-sized and BROADCAST to
    the corpus gram stream — the corpus never shuffles on gram content
    (dd8's scale rule). After the match, everything is keyed on doc_id:
    one window pair (running max-end -> island ids, the gaps-and-
    islands merge) and two doc-keyed aggs, all hash-partitioned on
    doc_id with sizes bounded by matched grams, not corpus grams. At
    100 TB the only corpus-sized stages are the gram projection (map-
    side) and the broadcast-hash match. Reference analog: the
    staging-vs-final reconciliation of src/load.py lifted from row
    counts to span content."""
    from ..llm.dedup import shingles, tokens

    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.posexplode(shingles(F.col("text"), 8)).alias("p", "s"),
    ).select(
        "doc_id", "n_tokens", (F.col("p") + 1).alias("start"), "s"
    )
    bench = (
        grams.filter(F.col("doc_id") % 29 == 0).select("s").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % 29 != 0)
        .join(F.broadcast(bench), "s")
        .select(
            "doc_id", "n_tokens", "start",
            (F.col("start") + 7).alias("fin"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("start")
    prev_fin = F.max("fin").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = hits.withColumn(
        "newspan",
        (F.col("start") > F.coalesce(prev_fin, F.lit(-1)) + 1).cast("int"),
    )
    spans = isl.withColumn(
        "span_id",
        F.sum("newspan").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = (
        spans.withColumn("n_tokens", F.col("n_tokens").cast("bigint"))
        .groupBy("doc_id", "n_tokens", "span_id")
        .agg(
            F.min("start").alias("s0"),
            F.max("fin").alias("s1"),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )
    return merged.groupBy("doc_id", "n_tokens").agg(
        F.sum("n_grams").cast("bigint").alias("n_matched_grams"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("s1") - F.col("s0") + 1)
        .cast("bigint")
        .alias("covered_tokens"),
        F.round(
            F.sum(F.col("s1") - F.col("s0") + 1) / F.col("n_tokens"), 4
        ).alias("contamination_frac"),
    )


REGISTRY["dd18_exact_span_decontaminate"].sql = _dd18_sql()


_DD19_SQL = f"""
WITH canon AS (
  SELECT doc_id,
         md5(list_aggregate(list_sort({_DUCK_TOKS}), 'string_agg', ' '))
           AS bow_hash
  FROM documents
)
SELECT bow_hash,
       min(doc_id) AS keep_id,
       cast(count(*) AS BIGINT) AS n_copies
FROM canon GROUP BY 1
"""


@register("dd19_bow_dedup", _DD19_SQL, first_round=10)
def dd19_bow_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words (order-insensitive) exact dedup: the canonical
    form is the SORTED token multiset, so shuffled / re-ordered copies
    of the same content — paragraph reshuffles, list reorderings, the
    classic scraped-page permutation — collapse into one group, which
    dd1's byte-exact hash cannot do and dd2's MinHash only catches
    probabilistically. Same keep-min-id group contract as dd1.

    Plan shape: one map-side projection (split -> array_sort ->
    concat -> md5; the sort is per-row over ~100 tokens, not a data
    exchange) followed by a single hash agg on the 16-byte canonical
    hash — document text never crosses the shuffle. Identical
    economics to dd1 at any scale (reference analog:
    src/extract.py:222-270's file-level md5 identity, relaxed to
    content identity modulo order)."""
    from ..llm.dedup import _spread

    d = _t(spark, sf_dir, "documents")
    bow = F.md5(
        F.concat_ws(" ", F.array_sort(F.split(F.trim("text"), r"\s+")))
    )
    return (
        _spread(d.select("doc_id", "text"))
        .select("doc_id", bow.alias("bow_hash"))
        .groupBy("bow_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


_DD20_PREFIX = 64  # chars of leading boilerplate keyed on

_DD20_SQL = f"""
WITH p AS (
  SELECT doc_id,
         md5(substring(text, 1, {_DD20_PREFIX})) AS prefix_hash,
         md5(text) AS full_hash
  FROM documents
)
SELECT prefix_hash,
       min(doc_id) AS keep_id,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(count(DISTINCT full_hash) AS BIGINT) AS n_variants
FROM p GROUP BY 1
"""


@register("dd20_prefix_dedup", _DD20_SQL, first_round=10)
def dd20_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix (boilerplate) detection: documents grouped by the
    hash of their first {n} characters, with the count of distinct
    FULL texts inside each prefix group — the crawl-cleanup signal for
    template families (same header/nav/license block, different body:
    n_docs high, n_variants high) vs true duplicates (n_variants = 1),
    which neither dd1 (whole-text identity) nor dd2 (global
    similarity) isolates as a prefix phenomenon.

    Plan shape: one map-side projection (two md5s over a bounded
    prefix + the text) and one hash agg on the 16-byte prefix key;
    the distinct-variant count is a partial-aggregated
    count(DISTINCT) on 16-byte hashes — document text never crosses
    the exchange. dd1 economics with a two-level key."""
    d = _t(spark, sf_dir, "documents")
    p = d.select(
        "doc_id",
        F.md5(F.substring("text", 1, _DD20_PREFIX)).alias("prefix_hash"),
        F.md5("text").alias("full_hash"),
    )
    return p.groupBy("prefix_hash").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("full_hash").cast("bigint").alias("n_variants"),
    )


_DD21_SQL = f"""
WITH RECURSIVE {_minhash_ctes(max_bucket_size=100)},
edges AS (SELECT a, b FROM mh_pairs UNION SELECT b, a FROM mh_pairs),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r FROM edges e JOIN reach ON reach.node = e.b
),
labels AS (SELECT node, min(r) AS label FROM reach GROUP BY node),
lab AS (
  SELECT d.doc_id, coalesce(labels.label, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels ON labels.node = d.doc_id
),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
SELECT lab.doc_id, lab.cluster_id,
       cast(sizes.cluster_size AS BIGINT) AS cluster_size,
       round(1.0 / sizes.cluster_size, 6) AS sample_weight
FROM lab JOIN sizes ON sizes.cluster_id = lab.cluster_id
"""


@register("dd21_soft_dedup_weights", _DD21_SQL, first_round=11)
def dd21_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of DROPPING near-duplicates (dd6's
    keep-one-survivor), every document stays in the corpus with a
    sampling weight 1/cluster_size — the duplication-aware reweighting
    training-data pipelines use when duplicates carry signal (a doc
    repeated across 8 mirrors contributes one doc's worth of expected
    gradient, not eight). Singletons keep weight 1, so the weighted
    corpus size equals the deduped corpus size by construction.

    Plan shape: dd2's MinHash-LSH candidate pairs + dd6's iterative
    min-label propagation build the clusters (the only corpus-heavy
    stages, shared machinery); the weight assignment is a cluster-keyed
    count joined back to the label table (AQE broadcasts the
    cluster-sized side). The oracle reaches the same fixed point via
    recursive-CTE transitive closure — an independent route to the
    same clusters."""
    from ..llm.dedup import connected_components, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size=100, materialize=True
    ).localCheckpoint(eager=True)
    labels = connected_components(pairs)
    lab = (
        docs.select("doc_id")
        .join(labels, docs.doc_id == labels.node, "left")
        .select(
            "doc_id",
            F.coalesce("label", "doc_id").alias("cluster_id"),
        )
        # NOT pinned (r15 A/B): a localCheckpoint here measured 2.79
        # -> 5.34 s isolated — AQE exchange reuse already covers the
        # two consumers, and the pin demoted the cluster-size join
        # from broadcast to sort-merge
    )
    sizes = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return lab.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size",
        F.round(F.lit(1.0) / F.col("cluster_size"), 6).alias(
            "sample_weight"
        ),
    )


_DD22_SQL = f"""
WITH RECURSIVE
{_minhash_ctes(max_bucket_size=100)},
edges AS (SELECT a, b FROM mh_pairs UNION SELECT b, a FROM mh_pairs),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r FROM edges e JOIN reach ON reach.node = e.b
),
labels AS (SELECT node, min(r) AS label FROM reach GROUP BY node),
lab AS (
  SELECT d.doc_id, coalesce(labels.label, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels ON labels.node = d.doc_id
),
sizes AS (SELECT cluster_id, count(*) AS n FROM lab GROUP BY 1),
new_sz AS (
  SELECT lab.doc_id, sizes.n AS new_n
  FROM lab JOIN sizes USING (cluster_id)
),
{_minhash_ctes(max_bucket_size=100,
               source="(SELECT * FROM documents WHERE doc_id % 5 <> 4)",
               suffix="_v1")},
edges_v1 AS (SELECT a, b FROM mh_pairs_v1 UNION SELECT b, a FROM mh_pairs_v1),
reach_v1 AS (
  SELECT a AS node, a AS r FROM edges_v1
  UNION
  SELECT e.a AS node, reach_v1.r
  FROM edges_v1 e JOIN reach_v1 ON reach_v1.node = e.b
),
labels_v1 AS (SELECT node, min(r) AS label FROM reach_v1 GROUP BY node),
lab_v1 AS (
  SELECT d.doc_id, coalesce(labels_v1.label, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels_v1 ON labels_v1.node = d.doc_id
  WHERE d.doc_id % 5 <> 4
),
sizes_v1 AS (SELECT cluster_id, count(*) AS n FROM lab_v1 GROUP BY 1),
old_sz AS (
  SELECT lab_v1.doc_id, sizes_v1.n AS old_n
  FROM lab_v1 JOIN sizes_v1 USING (cluster_id)
)
SELECT o.doc_id,
       cast(o.old_n AS BIGINT) AS old_cluster_size,
       cast(n.new_n AS BIGINT) AS new_cluster_size,
       round(1.0 / o.old_n, 6) AS old_weight,
       round(1.0 / n.new_n, 6) AS new_weight,
       CASE WHEN o.old_n = 1 THEN 'became_duplicated'
            WHEN n.new_n > o.old_n THEN 'duplication_grew'
            ELSE 'duplication_reduced' END AS status
FROM old_sz o JOIN new_sz n USING (doc_id)
WHERE o.old_n <> n.new_n
"""


@register("dd22_dedup_delta", _DD22_SQL, first_round=12)
def dd22_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot dedup DELTA — which base-corpus documents BECAME
    (more) duplicated between corpus versions, the report a corpus
    curator reads before refreshing dd21's sampling weights: a doc that
    was a singleton in v1 and picks up mirrors in v2 silently doubles
    its expected gradient contribution unless its weight is cut. v1 is
    the base corpus (doc_id % 5 != 4, the same snapshot convention as
    ann12's arrivals), v2 the full corpus; output is every v1 doc whose
    near-dup cluster size changed, with old/new sizes, old/new dd21
    weights, and the transition (became_duplicated / duplication_grew /
    duplication_reduced — the last possible because a bucket crossing
    the degenerate-bucket cap drops out of the pair graph). Pairs with
    x54's source drift: that reports distribution shift, this reports
    duplication shift.

    Plan shape: the corpus-heavy shingle→md5→minhash stage runs ONCE —
    band-bucket assignments are a pure per-document function, so v1's
    bucket table is a doc-filter of the full corpus's (measured 2×
    on the 10× corpus vs re-shingling per snapshot) — and each
    snapshot derives its own capped pair graph + CC labels from its
    filtered view (the cap is re-counted per snapshot, preserving the
    exact two-pass semantics the oracle replays). A production
    deployment persists that bucket table (x21's signature store): a
    refresh shingles only the arrival delta and re-labels only
    components the new edges touch, so per-refresh cost scales with
    the delta — the streaming twin (streaming.file_stream.
    stream_dedup_delta_available_now) executes exactly that
    incremental step per arrival batch. The final report join is
    doc-keyed; the size tables are cluster-keyed aggregates AQE
    broadcasts."""
    from ..llm.dedup import (
        connected_components,
        lsh_pairs_from_buckets,
        minhash_band_buckets,
    )

    docs = _t(spark, sf_dir, "documents")
    banded = minhash_band_buckets(docs, "text", "doc_id").localCheckpoint(
        eager=True
    )

    def soft_sizes(bb: DataFrame, d: DataFrame, out: str) -> DataFrame:
        pairs = lsh_pairs_from_buckets(
            bb, max_bucket_size=100
        ).localCheckpoint(eager=True)
        labels = connected_components(pairs).withColumnRenamed("node", "doc_id")
        lab = (
            d.select("doc_id")
            .join(labels, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("label", F.col("doc_id")).alias("cluster_id"),
            )
            # NOT pinned — r16 variance-gated A/B (median-of-9,
            # the protocol that flipped tx31's sibling pin to a clear
            # win): pinning lab here measured 4.10 -> 6.13 s — two
            # checkpoint materializations (one per snapshot) cost
            # more than the join re-run, because lab.join(sizes) and
            # the sizes agg share the cluster_id exchange AQE reuses.
        )
        sizes = lab.groupBy("cluster_id").agg(
            F.count(F.lit(1)).cast("bigint").alias(out)
        )
        return lab.join(sizes, "cluster_id").select("doc_id", out)

    v1 = F.col("doc_id") % 5 != 4
    old = soft_sizes(banded.filter(v1), docs.filter(v1), "old_cluster_size")
    new = soft_sizes(banded, docs, "new_cluster_size")
    return (
        old.join(new, "doc_id")
        .filter(F.col("old_cluster_size") != F.col("new_cluster_size"))
        .select(
            "doc_id",
            "old_cluster_size",
            "new_cluster_size",
            F.round(F.lit(1.0) / F.col("old_cluster_size"), 6).alias(
                "old_weight"
            ),
            F.round(F.lit(1.0) / F.col("new_cluster_size"), 6).alias(
                "new_weight"
            ),
            F.when(F.col("old_cluster_size") == 1, "became_duplicated")
            .when(
                F.col("new_cluster_size") > F.col("old_cluster_size"),
                "duplication_grew",
            )
            .otherwise("duplication_reduced")
            .alias("status"),
        )
    )


from ._helpers import _DUCK_QUALITY  # noqa: E402


_DD23_SQL = f"""
WITH RECURSIVE
{_minhash_ctes(max_bucket_size=100)},
edges AS (SELECT a, b FROM mh_pairs UNION SELECT b, a FROM mh_pairs),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r FROM edges e JOIN reach ON reach.node = e.b
),
labels AS (SELECT node, min(r) AS label FROM reach GROUP BY node),
lab AS (
  SELECT d.doc_id, coalesce(labels.label, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels ON labels.node = d.doc_id
),
q AS (SELECT doc_id, {_DUCK_QUALITY} AS quality FROM documents),
m AS (
  SELECT lab.doc_id, lab.cluster_id, q.quality
  FROM lab JOIN q USING (doc_id)
),
newc AS (
  SELECT cluster_id, doc_id, quality,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, doc_id) AS rn
  FROM m
),
oldc AS (
  SELECT cluster_id, doc_id,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, doc_id) AS rn
  FROM m WHERE doc_id % 5 <> 4
)
SELECT n.cluster_id,
       n.doc_id AS canonical_doc_id,
       n.quality AS canonical_quality,
       (o.doc_id IS NULL OR o.doc_id <> n.doc_id) AS was_reelected
FROM (SELECT * FROM newc WHERE rn = 1) n
LEFT JOIN (SELECT * FROM oldc WHERE rn = 1) o USING (cluster_id)
"""


@register("dd23_canonical_reelection", _DD23_SQL, first_round=12)
def dd23_canonical_reelection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental canonical RE-ELECTION — the update step dd13 lacks:
    dd13 picks each cluster's argmax-quality member ONCE; when new
    members arrive (doc_id % 5 == 4, the ann12 snapshot convention)
    the stored canonical table must be revised without revisiting the
    cluster's full membership. The per-cluster argmax under
    (quality DESC, doc_id ASC) is a commutative, associative monoid —
    min of struct(-quality, doc_id) — so the stored state (one row per
    cluster: its current best) folds with the arrival batch's per-
    cluster bests in ONE union + re-aggregate, exactly like ann12's
    fold into the persisted IVF assignment. Output per cluster: the
    (possibly re-elected) canonical, its quality, and whether the
    arrival CHANGED the canonical (was_reelected; true also for
    clusters the arrivals created). The DuckDB oracle never sees the
    fold: it recomputes each cluster's argmax over ALL members from
    scratch, so the hash match proves fold == full-recompute.

    Plan shape: cluster membership is dd13's pair graph + CC (computed
    in-plan so the oracle can replay it; production reads the stored
    label table), quality is a scan-fused projection; the fold itself
    is state-table-sized + delta-sized — one groupBy on cluster_id, no
    corpus pass. At 100 TB the re-election step touches only clusters
    with arrivals."""
    from ..llm import quality_score
    from ..llm.dedup import connected_components, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size=100, materialize=True
    ).localCheckpoint(eager=True)
    labels = connected_components(pairs).withColumnRenamed("node", "doc_id")
    m = (
        docs.select(
            "doc_id", quality_score(F.col("text")).alias("quality")
        )
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("cluster_id"),
            "quality",
        )
        # NOT pinned — re-A/B'd in r16 under the variance-gated
        # median-of-9 protocol that flipped tx31's sibling pin to a
        # clear win: here the pin measured 4.27 -> 5.90 s (r15's wash
        # now resolved as a REGRESSION). The filtered consumers reach
        # the same cluster_id exchange, so AQE reuse covers them and
        # the pin only adds a doc-sized eager materialization.
    )
    # the argmax monoid: min over struct(-quality, doc_id); the raw
    # quality rides along in the third field so the output never
    # negates back through float -0.0.
    cand = F.struct(
        (-F.col("quality")).alias("nq"),
        F.col("doc_id").alias("doc_id"),
        F.col("quality").alias("quality"),
    )
    state = (
        m.filter(F.col("doc_id") % 5 != 4)
        .groupBy("cluster_id")
        .agg(F.min(cand).alias("best"))
    )
    delta = m.filter(F.col("doc_id") % 5 == 4).select(
        "cluster_id", cand.alias("best")
    )
    folded = (
        state.select("cluster_id", "best")
        .union(delta)
        .groupBy("cluster_id")
        .agg(F.min("best").alias("best"))
    )
    return (
        folded.join(
            state.select(
                "cluster_id", F.col("best.doc_id").alias("old_id")
            ),
            "cluster_id",
            "left",
        )
        .select(
            "cluster_id",
            F.col("best.doc_id").alias("canonical_doc_id"),
            F.col("best.quality").alias("canonical_quality"),
            (
                F.col("old_id").isNull()
                | (F.col("old_id") != F.col("best.doc_id"))
            ).alias("was_reelected"),
        )
    )


def _dd24_sql() -> str:
    return f"""
WITH {_minhash_ctes(max_bucket_size=100)}
SELECT least(da.lang, db.lang) AS lang_lo,
       greatest(da.lang, db.lang) AS lang_hi,
       cast(count(*) AS BIGINT) AS n_pairs,
       cast(min(p.a) AS BIGINT) AS example_a
FROM mh_pairs p
JOIN documents da ON da.doc_id = p.a
JOIN documents db ON db.doc_id = p.b
WHERE da.lang <> db.lang
GROUP BY 1, 2
"""


@register("dd24_cross_lang_mirrors", _dd24_sql(), first_round=13)
def dd24_cross_lang_mirrors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs that SPAN languages — translation-mirror
    detection: a multilingual crawl carries the same page under
    several language codes (machine-translated mirrors, mislabeled
    langid, boilerplate-dominated pages), and counting them per
    language pair tells a curation plan which languages' token counts
    are inflated by shared content rather than native text. Candidate
    pairs come from the SAME banded-LSH engine as dd2 (shingle
    near-dup survives word-order-preserving translation artifacts and
    mislabeled langid, the dominant mirror classes); the lang join
    then keeps only pairs whose endpoints disagree. Output per
    unordered language pair: mirror-pair count and the smallest
    participating doc_id (a deterministic example for triage).

    Plan shape: dd2's candidate build (shingle -> minhash -> band
    bucket join, never all-pairs) plus two doc-keyed joins against
    the lang column — at 100 TB the lang frame is doc-count-sized but
    2 columns, and the final agg is |langs|^2-sized. No new
    corpus-sized stage beyond the shared LSH build."""
    from ..llm.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size=100, materialize=True
    )
    la = docs.select(F.col("doc_id").alias("a"), F.col("lang").alias("lang_a"))
    lb = docs.select(F.col("doc_id").alias("b"), F.col("lang").alias("lang_b"))
    return (
        pairs.join(la, "a")
        .join(lb, "b")
        .filter(F.col("lang_a") != F.col("lang_b"))
        .groupBy(
            F.least("lang_a", "lang_b").alias("lang_lo"),
            F.greatest("lang_a", "lang_b").alias("lang_hi"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("a").cast("bigint").alias("example_a"),
        )
    )


def _dd25_sql() -> str:
    return f"""
WITH {_minhash_ctes(max_bucket_size=100)},
dup AS (SELECT a AS doc_id FROM mh_pairs UNION SELECT b FROM mh_pairs)
SELECT d.source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(count(dup.doc_id) AS BIGINT) AS n_dup_docs,
       round(count(dup.doc_id) * 1.0 / count(*), 6) AS dup_rate
FROM documents d LEFT JOIN dup ON dup.doc_id = d.doc_id
GROUP BY 1
"""


@register("dd25_source_dup_rate", _dd25_sql(), first_round=14)
def dd25_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE near-dup incidence — the duplication profile a
    mixture plan reads next to tx32's KL fingerprint and tx33's Zipf
    slope: a source whose documents mostly have near-dup neighbors
    contributes far fewer EFFECTIVE tokens than its row count says
    (x27/x44's temperature weights over-sample it), and a sudden
    incidence jump is the crawl-quality regression signal dd22 reports
    cross-snapshot, here sliced by origin. A doc counts as duplicated
    if it has at least one banded-LSH candidate neighbor — dd2's
    candidate semantics (shingle -> minhash -> band-bucket join with
    the degenerate-bucket cap), deliberately the same engine so the
    rate is consistent with every other dd-series report. Output per
    source: doc count, duplicated-doc count, rate.

    Plan shape: the corpus-sized work is dd2's shared LSH build
    (never all-pairs); the dup-id set is pair-graph-sized, the join
    back is doc-keyed, and the report is |sources| rows. At 100 TB
    nothing beyond the signature pass scales with the corpus.
    Reference-analog: the per-source data-quality profiling loop of
    src/transform.py, applied to duplication."""
    from ..llm.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size=100, materialize=True
    )
    dup = (
        pairs.select(F.col("a").alias("doc_id"))
        .union(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    return (
        docs.join(dup, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count("__dup").cast("bigint").alias("n_dup_docs"),
            F.round(F.count("__dup") / F.count(F.lit(1)), 6).alias("dup_rate"),
        )
    )


def _dd26_sql() -> str:
    agree = " + ".join(
        f"CASE WHEN sa.s{j} = sb.s{j} THEN 1 ELSE 0 END" for j in range(16)
    )
    return f"""
    WITH {_minhash_ctes(max_bucket_size="auto")},
    mrate AS (
      SELECT cast(count(*) AS BIGINT) AS n_total,
             cast(greatest(1, ceil(count(*) / 200.0)) AS BIGINT) AS m
      FROM mh_pairs
    ),
    sp AS (
      SELECT p.a, p.b FROM mh_pairs p, mrate
      WHERE ((p.a % 1000003) * 1000003 + (p.b % 1000003)) % mrate.m = 0
    ),
    sdocs AS (SELECT a AS doc_id FROM sp UNION SELECT b FROM sp),
    shs AS (SELECT sh.* FROM sh JOIN sdocs USING (doc_id)),
    sizes AS (SELECT doc_id, count(*) AS n FROM shs GROUP BY doc_id),
    inter AS (
      SELECT p.a, p.b, count(*) AS i
      FROM sp p
      JOIN shs x ON x.doc_id = p.a
      JOIN shs y ON y.doc_id = p.b AND y.s = x.s
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.a, p.b,
             ({agree}) / 16.0 AS est,
             coalesce(i, 0) * 1.0
               / (za.n + zb.n - coalesce(i, 0)) AS truth
      FROM sp p
      LEFT JOIN inter ON inter.a = p.a AND inter.b = p.b
      JOIN sizes za ON za.doc_id = p.a
      JOIN sizes zb ON zb.doc_id = p.b
      JOIN sig sa ON sa.doc_id = p.a
      JOIN sig sb ON sb.doc_id = p.b
    )
    SELECT (SELECT n_total FROM mrate) AS n_pairs,
           cast(count(*) AS BIGINT) AS n_sampled,
           round(avg(abs(est - truth)), 4) AS mae,
           round(max(abs(est - truth)), 4) AS max_abs_err,
           round(avg(est - truth), 4) AS bias,
           round(sqrt(ln(40.0) / (2 * nullif(count(*), 0))), 4)
             AS mae_bound95
    FROM scored
    """


@register("dd26_sampled_estimator_error", _dd26_sql(), first_round=15)
def dd26_sampled_estimator_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dd17's estimator-error contract made AFFORDABLE at production
    scale (r14 verdict #3): dd17's exact-Jaccard truth side scans
    every candidate pair's shingles — measured LINEAR in the corpus
    (4.5 s at sf0.1 -> 479 s at 100x), so the one check that certifies
    MinHash error could never run exactly where certification matters
    (after a parameter change on a real corpus). Here the truth side
    runs on a DETERMINISTIC HASH-SAMPLE of the candidate pairs with a
    DERIVED rate: m = ceil(n_pairs / 200), keep pairs where
    ((a % 1000003) * 1000003 + (b % 1000003)) % m = 0 — ~200 sampled
    pairs at ANY corpus size (the derived-k pattern applied to
    sampling; the multiplicative pair hash is overflow-safe BIGINT
    arithmetic both engines compute bit-identically, and seeded by the
    ids alone so the oracle replays it). The exact-Jaccard join then
    touches only the sampled docs' shingles (semi-join before the
    co-occurrence join) — O(sample), near-flat wall at 100x, while
    the estimate side still rides dd2's shared banded build.

    Because |est - truth| lies in [0, 1], the sampled MAE carries a
    distribution-free Hoeffding bound: P(|MAE_sample - MAE_pop| > t)
    <= 2 exp(-2 n t^2), so the 95% half-width is
    t = sqrt(ln(2/0.05) / (2 n)) — emitted as ``mae_bound95``
    (~0.096 at n=200): the certificate says "population MAE is within
    this of the sampled MAE with 95% confidence". dd17 keeps the
    exhaustive form for gate SFs; this is the production twin.

    Output: one row — total candidate pairs, sampled count, sampled
    MAE / worst case / signed bias, and the Hoeffding 95% bound."""
    from ..llm.dedup import (
        _spread,
        minhash_lsh_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size="auto", materialize=True
    ).localCheckpoint(eager=True)
    mrate = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.greatest(
            F.lit(1).cast("bigint"), F.ceil(F.count(F.lit(1)) / 200.0)
        ).alias("m"),
    )
    sampled = (
        pairs.crossJoin(F.broadcast(mrate))
        .filter(
            (
                (F.col("a") % 1000003) * 1000003 + (F.col("b") % 1000003)
            ) % F.col("m")
            == 0
        )
        .select("a", "b", "n_total")
    ).localCheckpoint(eager=True)
    sdocs = (
        sampled.select(F.col("a").alias("doc_id"))
        .union(sampled.select("b"))
        .distinct()
    )
    # EVERYTHING past the shared pair build is O(sample): signatures
    # are a deterministic per-doc function, so both the estimate side
    # and the exact-Jaccard truth side semi-join the corpus down to
    # the ~2x200 sampled docs BEFORE any per-doc work — without this,
    # the est-side signature build and its two pair joins re-scan and
    # re-shuffle the full corpus for a 200-row output (measured 91 s
    # vs dd2's own 18.5 s at the 100x corpus; ~20 s after).
    # the sampled-doc set is <= 2*target rows at ANY corpus size —
    # broadcast-hint the semi-join so the static plan is a BHJ rather
    # than leaving the sort-merge -> broadcast conversion to AQE
    sampled_docs = docs.join(F.broadcast(sdocs), "doc_id", "left_semi")
    sigs = minhash_signatures(sampled_docs, "text", "doc_id")
    sh = _spread(sampled_docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sha = sh.select(F.col("doc_id").alias("a"), "s")
    shb = sh.select(F.col("doc_id").alias("b"), "s")
    inter = (
        sampled.join(sha, "a")
        .join(shb, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sigs.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"s{j}").alias(f"sa{j}") for j in range(16)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"s{j}").alias(f"sb{j}") for j in range(16)],
    )
    agree = sum(
        F.when(F.col(f"sa{j}") == F.col(f"sb{j}"), 1).otherwise(0)
        for j in range(16)
    )
    za = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    scored = (
        sampled.join(inter, ["a", "b"], "left")
        .join(za, "a")
        .join(zb, "b")
        .join(sa, "a")
        .join(sb, "b")
        .select(
            "n_total",
            (agree / F.lit(16.0)).alias("est"),
            (
                F.coalesce(F.col("i"), F.lit(0))
                / (
                    F.col("na")
                    + F.col("nb")
                    - F.coalesce(F.col("i"), F.lit(0))
                )
            ).alias("truth"),
        )
    )
    return scored.agg(
        F.first("n_total").alias("n_pairs"),
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.round(F.avg(F.abs(F.col("est") - F.col("truth"))), 4).alias("mae"),
        F.round(F.max(F.abs(F.col("est") - F.col("truth"))), 4).alias(
            "max_abs_err"
        ),
        F.round(F.avg(F.col("est") - F.col("truth")), 4).alias("bias"),
        F.round(
            # guard the n=0 corner (no candidate pairs at all): ANSI
            # mode would raise DIVIDE_BY_ZERO; emit NULL like the
            # oracle's nullif (r15 review)
            F.when(
                F.count(F.lit(1)) > 0,
                F.sqrt(F.log(F.lit(40.0)) / (2 * F.count(F.lit(1)))),
            ),
            4,
        ).alias("mae_bound95"),
    )
