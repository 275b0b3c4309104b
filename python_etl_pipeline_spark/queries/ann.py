"""Similarity search / ANN family (ann1-ann24): brute-force cosine, IVF, PQ/SQ8/binary quantization, MIPS, hybrid RRF.

Mechanically split from the former flat queries.py (r10);
docstrings and within-family registration order unchanged.
"""

from ._shared import *  # noqa: F401,F403 — F, Window, scalar/op helpers, register
from ._shared import _t, AS_OF, REGISTRY, register  # noqa: F401
from ._helpers import (  # noqa: F401
    _DUCK_COMP,
    _KMEANS_CHAINS,
    _bm25_scores_spark,
    _bm25_scores_sql,
    _kmeans_iter_sql,
)

@register(
    "ann1_bruteforce_topk",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    dots AS (
      SELECT c.vec_id, sum(c.v * q.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN q ON c.i = q.i GROUP BY c.vec_id
    ),
    qn AS (SELECT sqrt(sum(v*v)) AS qnorm FROM comp WHERE vec_id = 0)
    SELECT vec_id, round(dot / (norm * qnorm), 4) AS cosine
    FROM dots, qn
    WHERE vec_id <> 0
    ORDER BY round(dot / (norm * qnorm), 4) DESC, vec_id
    LIMIT 10
    """,
)
def ann1_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search (exact): brute-force cosine top-10 for a stored
    query vector."""
    from ..llm import brute_force_topk

    return brute_force_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10)


@register(
    "ann2_ivf_topk",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    cent AS (SELECT vec_id AS c, i, v AS cv FROM comp WHERE vec_id < 8),
    cross_dots AS (
      SELECT comp.vec_id, cent.c, sum(comp.v * cent.cv) AS dot
      FROM comp JOIN cent ON comp.i = cent.i GROUP BY 1, 2
    ),
    scored AS (
      SELECT cross_dots.vec_id, c, dot / (nv.norm * nc.norm) AS cos
      FROM cross_dots
      JOIN norms nv ON nv.vec_id = cross_dots.vec_id
      JOIN norms nc ON nc.vec_id = c
    ),
    assign AS (
      SELECT vec_id, c AS centroid FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) = 1
    ),
    qc AS (SELECT centroid FROM assign WHERE vec_id = 0),
    cluster AS (
      SELECT assign.vec_id FROM assign, qc
      WHERE assign.centroid = qc.centroid AND assign.vec_id <> 0
    ),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    dots AS (
      SELECT c.vec_id, sum(c.v * q.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN q ON c.i = q.i
      WHERE c.vec_id IN (SELECT vec_id FROM cluster)
      GROUP BY c.vec_id
    ),
    qn AS (SELECT sqrt(sum(v*v)) AS qnorm FROM comp WHERE vec_id = 0)
    SELECT vec_id, round(dot / (norm * qnorm), 4) AS cosine
    FROM dots, qn
    ORDER BY round(dot / (norm * qnorm), 4) DESC, vec_id
    LIMIT 5
    """,
)
def ann2_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search (IVF): nearest-centroid assignment, then exact
    search inside the query's cell only."""
    from ..llm.similarity import ivf_topk

    return ivf_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=5, n_centroids=8)


@register(
    "ann6_recall_at_k",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
    alldots AS (
      SELECT c.vec_id, sum(c.v * q.qv) AS dot
      FROM comp c JOIN q ON c.i = q.i GROUP BY c.vec_id
    ),
    scoredall AS (
      SELECT d.vec_id, d.dot / (n.norm * qn.qnorm) AS cos
      FROM alldots d JOIN norms n ON n.vec_id = d.vec_id, qn
      WHERE d.vec_id <> 0
    ),
    bf AS (SELECT vec_id FROM scoredall
           ORDER BY round(cos, 4) DESC, vec_id LIMIT 10),
    cent AS (SELECT vec_id AS c, i, v AS cv FROM comp WHERE vec_id < 8),
    cross_dots AS (
      SELECT comp.vec_id, cent.c, sum(comp.v * cent.cv) AS dot
      FROM comp JOIN cent ON comp.i = cent.i GROUP BY 1, 2
    ),
    scored AS (
      SELECT cross_dots.vec_id, c, dot / (nv.norm * nc.norm) AS cos
      FROM cross_dots
      JOIN norms nv ON nv.vec_id = cross_dots.vec_id
      JOIN norms nc ON nc.vec_id = c
    ),
    assign AS (
      SELECT vec_id, c AS centroid FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) = 1
    ),
    qc AS (SELECT centroid FROM assign WHERE vec_id = 0),
    cluster AS (
      SELECT assign.vec_id FROM assign, qc
      WHERE assign.centroid = qc.centroid AND assign.vec_id <> 0
    ),
    ivf AS (SELECT vec_id FROM scoredall
            WHERE vec_id IN (SELECT vec_id FROM cluster)
            ORDER BY round(cos, 4) DESC, vec_id LIMIT 10),
    inter AS (SELECT vec_id FROM bf INTERSECT SELECT vec_id FROM ivf)
    SELECT cast(10 AS BIGINT) AS k, count(*) AS n_hits,
           round(count(*) / 10.0, 4) AS recall_at_k
    FROM inter
    """,
)
def ann6_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN quality CONTRACT as a query: recall@10 of the IVF search
    (ann2's single-probe path, nprobe=1 reads ~1/n_cells of the corpus)
    against the exact brute-force top-10 (ann1) for the same stored
    query vector. IVF's speed comes from searching one coarse cell —
    this measures exactly what that pruning costs in recall, the same
    way CORRECTNESS measures value parity: the oracle recomputes both
    top-10 sets and the identical intersection. Deterministic on both
    engines (4-dp rounded cosine, ties by vec_id).
    tests/test_similarity.py pins recall_at_k >= 0.5 at gate scale."""
    from ..llm.similarity import brute_force_topk, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    bf = brute_force_topk(emb, query_id=0, k=10)
    ivf = ivf_topk(emb, query_id=0, k=10, n_centroids=8)
    inter = bf.select("vec_id").intersect(ivf.select("vec_id"))
    return inter.agg(F.count("*").cast("bigint").alias("n_hits")).select(
        F.lit(10).cast("bigint").alias("k"),
        "n_hits",
        F.round(F.col("n_hits") / 10.0, 4).alias("recall_at_k"),
    )


def _pq_iter_sql(prev: str, it: int, comp: str, sfx: str) -> str:
    """One Lloyd iteration scoped to a PQ subspace: same math as
    _kmeans_iter_sql but parameterized on the component CTE and a
    name suffix so two subspaces can train in one WITH chain."""
    return f"""
    assign{it}{sfx} AS (
      SELECT {comp}.vec_id, {prev}.cell,
             row_number() OVER (
               PARTITION BY {comp}.vec_id
               ORDER BY sum(({comp}.v - {prev}.v) * ({comp}.v - {prev}.v)), {prev}.cell
             ) AS rn
      FROM {comp} JOIN {prev} ON {comp}.i = {prev}.i
      GROUP BY {comp}.vec_id, {prev}.cell
    ),
    cent{it}{sfx} AS (
      SELECT a.cell, {comp}.i, avg({comp}.v) AS v
      FROM assign{it}{sfx} a JOIN {comp} ON {comp}.vec_id = a.vec_id
      WHERE a.rn = 1
      GROUP BY 1, 2
    )"""


def _ann9_sql() -> str:
    # split conditions are 1-based (generate_subscripts): i <= d2 with
    # d2 = floor(max_i/2) matches Spark's 0-based i < floor((max_i+1)/2)
    sub = []
    for sfx, cond in (("a", "i <= d2"), ("b", "i > d2")):
        sub.append(f"""
    comp{sfx} AS (SELECT comp.vec_id, comp.i, comp.v FROM comp, dhalf WHERE {cond}),
    cent0{sfx} AS (SELECT vec_id AS cell, i, v FROM comp{sfx} WHERE vec_id < 16),
    {_pq_iter_sql(f'cent0{sfx}', 1, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent1{sfx}', 2, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent2{sfx}', 3, f'comp{sfx}', sfx)},
    code{sfx} AS (SELECT vec_id, cell FROM assign3{sfx} WHERE rn = 1),
    q{sfx} AS (SELECT i, v AS qv FROM comp{sfx} WHERE vec_id = 0),
    tab{sfx} AS (
      SELECT c.cell, sum(c.v * q{sfx}.qv) AS t{sfx}
      FROM cent2{sfx} c JOIN q{sfx} ON c.i = q{sfx}.i
      GROUP BY 1
    )""")
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    dhalf AS (SELECT cast(floor(max(i) / 2.0) AS INT) AS d2 FROM comp),
    {','.join(sub)},
    adot AS (
      SELECT codea.vec_id, taba.ta + tabb.tb AS adot
      FROM codea
      JOIN taba ON taba.cell = codea.cell
      JOIN codeb ON codeb.vec_id = codea.vec_id
      JOIN tabb ON tabb.cell = codeb.cell
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
    shortlist AS (
      SELECT adot.vec_id,
             round(adot / (n.norm * qn.qnorm), 4) AS ac
      FROM adot JOIN norms n ON n.vec_id = adot.vec_id, qn
      WHERE adot.vec_id <> 0
      ORDER BY ac DESC, adot.vec_id
      LIMIT 100
    ),
    qfull AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    exact AS (
      SELECT c.vec_id, sum(c.v * qfull.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qfull ON c.i = qfull.i
      WHERE c.vec_id IN (SELECT vec_id FROM shortlist)
      GROUP BY 1
    )
    SELECT exact.vec_id, round(dot / (norm * qn.qnorm), 4) AS cosine
    FROM exact, qn
    ORDER BY round(dot / (norm * qn.qnorm), 4) DESC, exact.vec_id
    LIMIT 10
    """


@register("ann9_pq_topk", None)  # finalized below (composed CTE chain)
def ann9_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011 — the IVF-PQ code
    path) in its production shape: vectors compress to a 2-code tuple
    (one k-means code per half-space, 16 codes each), the query scans
    CODES via a broadcast lookup table of query-to-centroid dots
    (approx_dot = t0[code0] + t1[code1] — no vector arithmetic per
    candidate), the top-100 shortlist is then rescored with EXACT
    cosine and the true top-10 emitted. The memory/IO win at 100 TB:
    the code scan touches 1 byte/subspace per vector instead of 256
    float bytes; exact work is confined to the shortlist. Quantization
    error only moves the shortlist boundary (recall ~0.8 here vs ~0.2
    for raw PQ ranking on these near-random vectors — PQ's worst
    case). Oracle replays both subspace trainings, code assignment,
    lookup tables, the 4-dp-rounded shortlist cut, and the exact
    rerank."""
    from ..llm.similarity import pq_rerank_topk

    return pq_rerank_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=10, shortlist=100,
        n_codes=16,
    )


REGISTRY["ann9_pq_topk"].sql = _ann9_sql()


def _ann10_sql() -> str:
    # ann9's PQ chain (full-corpus codes + lookup tables) composed with
    # ann2's coarse-cell chain; the shortlist is cut INSIDE the query's
    # cell. Sub-CTE names are disjoint by construction (PQ uses
    # {comp,cent,assign}N{a,b}; IVF uses centc/cross_dots/scoredc/...).
    sub = []
    for sfx, cond in (("a", "i <= d2"), ("b", "i > d2")):
        sub.append(f"""
    comp{sfx} AS (SELECT comp.vec_id, comp.i, comp.v FROM comp, dhalf WHERE {cond}),
    cent0{sfx} AS (SELECT vec_id AS cell, i, v FROM comp{sfx} WHERE vec_id < 16),
    {_pq_iter_sql(f'cent0{sfx}', 1, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent1{sfx}', 2, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent2{sfx}', 3, f'comp{sfx}', sfx)},
    code{sfx} AS (SELECT vec_id, cell FROM assign3{sfx} WHERE rn = 1),
    q{sfx} AS (SELECT i, v AS qv FROM comp{sfx} WHERE vec_id = 0),
    tab{sfx} AS (
      SELECT c.cell, sum(c.v * q{sfx}.qv) AS t{sfx}
      FROM cent2{sfx} c JOIN q{sfx} ON c.i = q{sfx}.i
      GROUP BY 1
    )""")
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    dhalf AS (SELECT cast(floor(max(i) / 2.0) AS INT) AS d2 FROM comp),
    {','.join(sub)},
    adot AS (
      SELECT codea.vec_id, taba.ta + tabb.tb AS adot
      FROM codea
      JOIN taba ON taba.cell = codea.cell
      JOIN codeb ON codeb.vec_id = codea.vec_id
      JOIN tabb ON tabb.cell = codeb.cell
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
    centc AS (SELECT vec_id AS c, i, v AS cv FROM comp WHERE vec_id < 8),
    cross_dots AS (
      SELECT comp.vec_id, centc.c, sum(comp.v * centc.cv) AS dot
      FROM comp JOIN centc ON comp.i = centc.i GROUP BY 1, 2
    ),
    scoredc AS (
      SELECT cross_dots.vec_id, c, dot / (nv.norm * nc.norm) AS cos
      FROM cross_dots
      JOIN norms nv ON nv.vec_id = cross_dots.vec_id
      JOIN norms nc ON nc.vec_id = c
    ),
    assignc AS (
      SELECT vec_id, c AS centroid FROM scoredc
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) = 1
    ),
    qc AS (SELECT centroid FROM assignc WHERE vec_id = 0),
    cluster AS (
      SELECT assignc.vec_id FROM assignc, qc
      WHERE assignc.centroid = qc.centroid AND assignc.vec_id <> 0
    ),
    shortlist AS (
      SELECT adot.vec_id,
             round(adot / (n.norm * qn.qnorm), 4) AS ac
      FROM adot JOIN norms n ON n.vec_id = adot.vec_id, qn
      WHERE adot.vec_id <> 0
        AND adot.vec_id IN (SELECT vec_id FROM cluster)
      ORDER BY ac DESC, adot.vec_id
      LIMIT 50
    ),
    qfull AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    exact AS (
      SELECT c.vec_id, sum(c.v * qfull.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qfull ON c.i = qfull.i
      WHERE c.vec_id IN (SELECT vec_id FROM shortlist)
      GROUP BY 1
    )
    SELECT exact.vec_id, round(dot / (norm * qn.qnorm), 4) AS cosine
    FROM exact, qn
    ORDER BY round(dot / (norm * qn.qnorm), 4) DESC, exact.vec_id
    LIMIT 10
    """


@register("ann10_ivfpq_topk", None)  # finalized below (composed CTE chain)
def ann10_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF-PQ ANN (Jégou et al. 2011 — the FAISS IVFPQ layout,
    composing ann2's coarse quantizer with ann9's product quantizer):
    the query probes its coarse cell, PQ asymmetric distance ranks ONLY
    that cell's members from compressed codes, the in-cell top-50
    shortlist is rescored with exact cosine, and the true top-10 is
    emitted. Per-query IO at 100 TB: one broadcast centroid table, the
    probed cell's CODE rows (bytes/vector), 50 full vectors. The PQ
    codes are trained on the full corpus — cell membership only filters
    the code scan, exactly how a persisted IVFPQ index serves every
    query from one code table. The oracle replays coarse assignment,
    both subspace trainings, the lookup tables, the 4-dp-rounded
    in-cell shortlist cut, and the exact rerank."""
    from ..llm.similarity import ivfpq_topk

    return ivfpq_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=10, shortlist=50,
        n_codes=16, n_centroids=8,
    )


REGISTRY["ann10_ivfpq_topk"].sql = _ann10_sql()


def _ivfpq_index_dir(sf_dir: str) -> str:
    """Cache location for the persisted IVF-PQ index over this
    sf_dir's embeddings — keyed by resolved path + file stats so a
    regenerated dataset invalidates the cache, and parameter-versioned
    so an index-layout change can never serve stale results."""
    import hashlib
    import os
    import tempfile

    p = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(p)
    key = hashlib.md5(
        f"{os.path.realpath(p)}|{st.st_mtime_ns}|{st.st_size}"
        f"|coarseD500x2_pq16x2_v2".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_ivfpq_{key}")


def _ann11_sql() -> str:
    # ann9's PQ chains + ann4's coarse-kmeans chain (the EXACT trainers
    # build_ivfpq_index persists) + the stored-index serve path: L2
    # probe of the trained centroids, member semi-join, in-member PQ
    # shortlist, exact rerank. Because the index build is fully
    # deterministic, replaying it from scratch here equals reading the
    # persisted tables on the Spark side.
    sub = []
    for sfx, cond in (("a", "i <= d2"), ("b", "i > d2")):
        sub.append(f"""
    comp{sfx} AS (SELECT comp.vec_id, comp.i, comp.v FROM comp, dhalf WHERE {cond}),
    cent0{sfx} AS (SELECT vec_id AS cell, i, v FROM comp{sfx} WHERE vec_id < 16),
    {_pq_iter_sql(f'cent0{sfx}', 1, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent1{sfx}', 2, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent2{sfx}', 3, f'comp{sfx}', sfx)},
    code{sfx} AS (SELECT vec_id, cell FROM assign3{sfx} WHERE rn = 1),
    q{sfx} AS (SELECT i, v AS qv FROM comp{sfx} WHERE vec_id = 0),
    tab{sfx} AS (
      SELECT c.cell, sum(c.v * q{sfx}.qv) AS t{sfx}
      FROM cent2{sfx} c JOIN q{sfx} ON c.i = q{sfx}.i
      GROUP BY 1
    )""")
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    dhalf AS (SELECT cast(floor(max(i) / 2.0) AS INT) AS d2 FROM comp),
    {','.join(sub)},
    adot AS (
      SELECT codea.vec_id, taba.ta + tabb.tb AS adot
      FROM codea
      JOIN taba ON taba.cell = codea.cell
      JOIN codeb ON codeb.vec_id = codea.vec_id
      JOIN tabb ON tabb.cell = codeb.cell
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
    kk AS (
      SELECT greatest(4, ceil(count(DISTINCT vec_id) / 500.0)) AS k FROM comp
    ),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k),
    {_kmeans_iter_sql('cent0', 1)},
    {_kmeans_iter_sql('cent1', 2)},
    {_kmeans_iter_sql('cent2', 3)},
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    qfull AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    qd AS (
      SELECT cent2.cell,
             sum((cent2.v - qfull.qv) * (cent2.v - qfull.qv)) AS dist
      FROM cent2 JOIN qfull ON cent2.i = qfull.i GROUP BY 1
    ),
    probe AS (SELECT cell FROM qd ORDER BY dist, cell LIMIT 2),
    members AS (
      SELECT asg.vec_id FROM asg JOIN probe USING (cell)
      WHERE asg.vec_id <> 0
    ),
    shortlist AS (
      SELECT adot.vec_id,
             round(adot / (n.norm * qn.qnorm), 4) AS ac
      FROM adot JOIN norms n ON n.vec_id = adot.vec_id, qn
      WHERE adot.vec_id IN (SELECT vec_id FROM members)
      ORDER BY ac DESC, adot.vec_id
      LIMIT 50
    ),
    exact AS (
      SELECT c.vec_id, sum(c.v * qfull.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qfull ON c.i = qfull.i
      WHERE c.vec_id IN (SELECT vec_id FROM shortlist)
      GROUP BY 1
    )
    SELECT exact.vec_id, round(dot / (norm * qn.qnorm), 4) AS cosine
    FROM exact, qn
    ORDER BY round(dot / (norm * qn.qnorm), 4) DESC, exact.vec_id
    LIMIT 10
    """


@register("ann11_ivfpq_from_index", None)  # finalized below (composed CTEs)
def ann11_ivfpq_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN served from a PERSISTED IVF-PQ index — the query-latency
    half of ann10's build+query conflation, separated so the bench
    quotes what a 100 TB vector store actually serves: ann10's headline
    is dominated by the two in-plan PQ subspace trainings; this query
    trains NOTHING in-plan. The index (coarse k-means centroids + full
    assignment + PQ codes + two subspace centroid tables,
    llm.similarity.build_ivfpq_index) is built once per dataset and
    cached on disk keyed by the embeddings file's identity. Since
    round 14 the coarse cell count DERIVES from corpus size
    (k = N/500, llm.similarity.derived_k_init — a fixed coarse_k has
    the growing-cell defect the r13 100x run caught in ann5) and the
    oracle replays the derivation as its kk CTE; at the gate SFs the
    derived k is 4, so stored results are unchanged. The serve
    path (ivfpq_query_from_index) reads only index state plus the
    query's own row: L2 probe of the k-row centroid table, member
    semi-join against the stored assignment, PQ-code shortlist via two
    broadcast lookup tables, exact rerank of 50 vectors. The oracle
    replays the deterministic index BUILD from scratch and the same
    serve path — stored == retrained, which is exactly the persisted-
    index contract (the ANN analog of x21's stored-signature index;
    reference-analog: the stored-state idempotency of
    src/extract.py:222-270 applied to vectors)."""
    from ..llm.similarity import ivfpq_query_from_index

    emb = _t(spark, sf_dir, "embeddings")
    idx = _cached_ivfpq_index(spark, sf_dir, emb)
    return ivfpq_query_from_index(
        emb, *idx, query_id=0, k=10, shortlist=50, nprobe=2
    )


def _cached_ivfpq_index(spark: SparkSession, sf_dir: str, emb: DataFrame):
    """Build-once/serve-many for the registered persisted-index
    queries: the five IVF-PQ index tables for this sf_dir's embeddings,
    built on first use and cached on disk (:func:`_ivfpq_index_dir` —
    keyed by file identity + params, promoted atomically). The build is
    fully deterministic, so stored == retrained and a DuckDB oracle
    replaying the training from scratch verifies a query served from
    this cache. Shared by ann11 (single IVF-PQ query) and ann14
    (batched coarse-IVF serve — it reads the coarse centroid +
    assignment tables and ignores the PQ ones)."""
    import os
    import shutil

    from ..llm.similarity import build_ivfpq_index, read_ivfpq_index

    idx_dir = _ivfpq_index_dir(sf_dir)
    if not os.path.isdir(idx_dir):
        staging = f"{idx_dir}.build_{os.getpid()}"
        build_ivfpq_index(
            emb, staging, coarse_k=None, coarse_iters=2, n_codes=16,
            pq_iters=2,
        )  # coarse_k=None = corpus-derived cell count (round 14)
        try:
            os.rename(staging, idx_dir)  # atomic promote
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)  # concurrent build won
    return read_ivfpq_index(spark, idx_dir)


_ANN12_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
base AS (SELECT * FROM comp WHERE vec_id % 5 <> 4),
cent0 AS (SELECT vec_id AS cell, i, v FROM base WHERE vec_id < 4),
{_pq_iter_sql('cent0', 1, 'base', '')},
{_pq_iter_sql('cent1', 2, 'base', '')},
full_assign AS (
  SELECT comp.vec_id, cent2.cell,
         row_number() OVER (
           PARTITION BY comp.vec_id
           ORDER BY sum((comp.v - cent2.v) * (comp.v - cent2.v)), cent2.cell
         ) AS rn
  FROM comp JOIN cent2 ON comp.i = cent2.i
  GROUP BY comp.vec_id, cent2.cell
)
SELECT vec_id, cell FROM full_assign
WHERE rn = 1 AND vec_id % 5 = 4
"""


_ANN13_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
base AS (SELECT * FROM comp WHERE vec_id % 5 <> 4),
cent0 AS (SELECT vec_id AS cell, i, v FROM base WHERE vec_id < 4),
{_pq_iter_sql('cent0', 1, 'base', '')},
{_pq_iter_sql('cent1', 2, 'base', '')},
full_assign AS (
  SELECT comp.vec_id, cent2.cell,
         row_number() OVER (
           PARTITION BY comp.vec_id
           ORDER BY sum((comp.v - cent2.v) * (comp.v - cent2.v)), cent2.cell
         ) AS rn
  FROM comp JOIN cent2 ON comp.i = cent2.i
  GROUP BY comp.vec_id, cent2.cell
),
asg AS (SELECT vec_id, cell FROM full_assign WHERE rn = 1),
before AS (
  SELECT cell, count(*) AS n_before FROM asg WHERE vec_id % 5 <> 4 GROUP BY 1
),
after AS (SELECT cell, count(*) AS n_after FROM asg GROUP BY 1),
tot AS (
  SELECT (SELECT sum(n_before) FROM before) AS tb,
         (SELECT sum(n_after) FROM after) AS ta
)
SELECT a.cell,
       coalesce(b.n_before, 0) AS n_before,
       a.n_after,
       round(coalesce(b.n_before, 0) * 1.0 / tot.tb, 6) AS share_before,
       round(a.n_after * 1.0 / tot.ta, 6) AS share_after,
       (coalesce(b.n_before, 0) = 0
        OR a.n_after * 1.0 / tot.ta
           > 2.0 * (coalesce(b.n_before, 0) * 1.0 / tot.tb)) AS retrain
FROM after a LEFT JOIN before b USING (cell), tot
"""


@register("ann13_index_drift", _ANN13_SQL)
def ann13_index_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift report that closes ann12's maintenance loop, as a
    hash-verified query rather than a pytest-only claim: after folding
    the delta batch (vec_id % 5 == 4) into the stored IVF assignment
    against frozen centroids, report per cell how the corpus share
    moved and whether re-training is warranted (share more than
    doubled, or the cell was empty at build time —
    llm.similarity.ivf_cell_drift, the exact threshold a maintenance
    scheduler acts on). The oracle replays the base training, the
    frozen-centroid re-assignment, and the same count/share/flag
    algebra. Cell-count-sized output; the only corpus-sized work is
    the assignment ann12 already does."""
    from ..llm.similarity import (
        ivf_cell_drift,
        ivf_incremental_assign,
        kmeans_fit,
    )

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    cent, assign_before = kmeans_fit(
        base, "vec_id", "embedding", k=4, iters=2, materialize=True
    )
    assign_after = assign_before.unionByName(
        ivf_incremental_assign(delta, cent)
    )
    return ivf_cell_drift(assign_before, assign_after)


def _ann14_sql() -> str:
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    kk AS (
      SELECT greatest(4, ceil(count(DISTINCT vec_id) / 500.0)) AS k FROM comp
    ),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k),
    {{KMEANS_CHAINS}}
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    qcomp AS (SELECT vec_id AS qid, i, v AS qv FROM comp WHERE vec_id < 5),
    qd AS (
      SELECT qcomp.qid, cent2.cell,
             sum((cent2.v - qcomp.qv) * (cent2.v - qcomp.qv)) AS dist
      FROM cent2 JOIN qcomp ON cent2.i = qcomp.i
      GROUP BY 1, 2
    ),
    probe AS (
      SELECT qid, cell FROM qd
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dist, cell) <= 2
    ),
    members AS (
      SELECT p.qid, a.vec_id
      FROM asg a JOIN probe p ON a.cell = p.cell
      WHERE a.vec_id <> p.qid
    ),
    dots AS (
      SELECT m.qid, m.vec_id, sum(c.v * qc.qv) AS dot
      FROM members m
      JOIN comp c ON c.vec_id = m.vec_id
      JOIN qcomp qc ON qc.qid = m.qid AND qc.i = c.i
      GROUP BY 1, 2
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    scored AS (
      SELECT d.qid AS query_id, d.vec_id,
             round(d.dot / (n.norm * qn.norm), 4) AS cosine
      FROM dots d
      JOIN norms n ON n.vec_id = d.vec_id
      JOIN norms qn ON qn.vec_id = d.qid
    )
    SELECT query_id, vec_id, cosine FROM scored
    QUALIFY row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) <= 5
    """


@register("ann14_batch_ivf_serve", None)  # sql attached after _kmeans_iter_sql
def ann14_batch_ivf_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN serving from ONE shared IVF index — the read path a
    near-dup pass or retrieval dataloader actually runs: many queries
    per micro-batch against the same stored index, answered in a
    single plan (per-query job submission would dominate at thousands
    of lookups). Five stored vectors (vec_id < 5) are answered top-5
    each; every stage is batched — one (qid, cell) probe agg over the
    broadcast centroid table, one assignment join for all members, one
    (qid, candidate)-keyed exact rerank with the queries' components
    broadcast, one qid-partitioned cut window (parallel across
    queries, no global sort). Serves from the SAME cached persisted
    index as ann11 (coarse centroid + assignment tables; the PQ tables
    go unused) — zero in-plan training, so the bench number is batch
    serve latency. The oracle replays the deterministic k-means
    training (ann4's chain), the batched L2 probe, member join, and
    rerank — stored == retrained, ann11's contract. Per-query equality
    with the single-query serve path is pinned in
    test_similarity.py."""
    from ..llm.similarity import ivf_batch_query_from_index

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign, _codes, _ca, _cb = _cached_ivfpq_index(spark, sf_dir, emb)
    return ivf_batch_query_from_index(
        emb, cent, assign, [0, 1, 2, 3, 4], k=5, nprobe=2
    )


@register("ann15_filtered_topk", None)  # sql attached after _kmeans_iter_sql
def ann15_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED ANN from the persisted IVF index: top-10
    cosine neighbors of vector 0 among only the vectors with
    ``label = 3`` (~12% of the corpus) — the filtered-search mode every
    production vector store serves ("nearest passages with license X /
    language Y / date > Z"). The filter lands at CANDIDATE GENERATION:
    the probed cells' member set is semi-joined to the predicate ids
    BEFORE any distance work (llm.similarity.
    ivf_filtered_query_from_index), so the rerank still yields a full
    k. The naive alternative — post-filtering an unfiltered top-k —
    silently returns fewer than k under any selective predicate
    (pinned in test_similarity.py). Serves from the SAME cached
    persisted index as ann11/ann14 (coarse tables only); the predicate
    side is a pushed-down parquet scan of (vec_id, label) — at 100 TB
    the filter only ever SHRINKS the reranked member set, and the
    vectors of excluded ids are never read past the scan. The oracle
    replays the deterministic index build and the same filtered serve
    chain — stored == retrained, ann11's contract."""
    from ..llm.similarity import ivf_filtered_query_from_index

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign, _codes, _ca, _cb = _cached_ivfpq_index(spark, sf_dir, emb)
    allowed = emb.filter(F.col("label") == 3).select("vec_id")
    return ivf_filtered_query_from_index(
        emb, cent, assign, allowed, query_id=0, k=10, nprobe=2
    )


@register("ann17_filtered_recall", None)  # sql attached after _kmeans_iter_sql
def ann17_filtered_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FILTERED-search quality contract: recall@10 of ann15's
    pre-filtered IVF serve against the exact brute-force top-10 over
    the same predicate subset (label = 3). Filtered ANN has a known
    failure mode the unfiltered contract (ann6) cannot see — a
    selective predicate thins every probed cell, so the same nprobe
    covers less of the *eligible* neighborhood and recall can collapse
    even while unfiltered recall looks healthy (the problem
    ACORN-style filter-aware indexes exist to fix). This query makes
    that trade a verified number, the same discipline as ann6/dd14:
    both the approximate and exact sides replayed by the oracle,
    deterministic on both engines (4-dp rounded cosine, vec_id
    tie-break). The recall floor is pinned in test_similarity.py."""
    from ..llm.similarity import brute_force_topk, ivf_filtered_query_from_index

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign, _codes, _ca, _cb = _cached_ivfpq_index(spark, sf_dir, emb)
    allowed = emb.filter(F.col("label") == 3).select("vec_id")
    approx = ivf_filtered_query_from_index(
        emb, cent, assign, allowed, query_id=0, k=10, nprobe=2
    )
    exact = brute_force_topk(
        emb.filter((F.col("label") == 3) | (F.col("vec_id") == 0)),
        query_id=0,
        k=10,
    )
    inter = exact.select("vec_id").intersect(approx.select("vec_id"))
    return inter.agg(F.count("*").cast("bigint").alias("n_hits")).select(
        F.lit(10).cast("bigint").alias("k"),
        "n_hits",
        F.round(F.col("n_hits") / 10.0, 4).alias("recall_at_k"),
    )


def _ann17_sql() -> str:
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    kk AS (
      SELECT greatest(4, ceil(count(DISTINCT vec_id) / 500.0)) AS k FROM comp
    ),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k),
    {{KMEANS_CHAINS}}
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    qcomp AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    qd AS (
      SELECT cent2.cell,
             sum((cent2.v - qcomp.qv) * (cent2.v - qcomp.qv)) AS dist
      FROM cent2 JOIN qcomp ON cent2.i = qcomp.i
      GROUP BY 1
    ),
    probe AS (SELECT cell FROM qd ORDER BY dist, cell LIMIT 2),
    members AS (
      SELECT a.vec_id FROM asg a JOIN probe USING (cell)
      WHERE a.vec_id <> 0
        AND a.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 3)
    ),
    exactf AS (
      SELECT c.vec_id, sum(c.v * qcomp.qv) AS dot,
             sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qcomp ON c.i = qcomp.i
      WHERE c.vec_id <> 0
        AND c.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 3)
      GROUP BY 1
    ),
    qn AS (SELECT sqrt(sum(qv * qv)) AS qnorm FROM qcomp),
    bf AS (
      SELECT e.vec_id FROM exactf e, qn
      ORDER BY round(e.dot / (e.norm * qn.qnorm), 4) DESC, e.vec_id
      LIMIT 10
    ),
    ivf AS (
      SELECT e.vec_id FROM exactf e, qn
      WHERE e.vec_id IN (SELECT vec_id FROM members)
      ORDER BY round(e.dot / (e.norm * qn.qnorm), 4) DESC, e.vec_id
      LIMIT 10
    ),
    inter AS (SELECT vec_id FROM bf INTERSECT SELECT vec_id FROM ivf)
    SELECT cast(10 AS BIGINT) AS k, count(*) AS n_hits,
           round(count(*) / 10.0, 4) AS recall_at_k
    FROM inter
    """


def _ann15_sql() -> str:
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    kk AS (
      SELECT greatest(4, ceil(count(DISTINCT vec_id) / 500.0)) AS k FROM comp
    ),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k),
    {{KMEANS_CHAINS}}
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    qcomp AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    qd AS (
      SELECT cent2.cell,
             sum((cent2.v - qcomp.qv) * (cent2.v - qcomp.qv)) AS dist
      FROM cent2 JOIN qcomp ON cent2.i = qcomp.i
      GROUP BY 1
    ),
    probe AS (SELECT cell FROM qd ORDER BY dist, cell LIMIT 2),
    members AS (
      SELECT a.vec_id FROM asg a JOIN probe USING (cell)
      WHERE a.vec_id <> 0
        AND a.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 3)
    ),
    dots AS (
      SELECT c.vec_id, sum(c.v * qcomp.qv) AS dot,
             sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qcomp ON c.i = qcomp.i
      WHERE c.vec_id IN (SELECT vec_id FROM members)
      GROUP BY 1
    ),
    qn AS (SELECT sqrt(sum(qv * qv)) AS qnorm FROM qcomp)
    SELECT d.vec_id, round(d.dot / (d.norm * qn.qnorm), 4) AS cosine
    FROM dots d, qn
    ORDER BY round(d.dot / (d.norm * qn.qnorm), 4) DESC, d.vec_id
    LIMIT 10
    """


@register("ann12_incremental_assign", _ANN12_SQL)
def ann12_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance: fold a new vector batch
    (vec_id % 5 == 4 stands in for today's arrivals) into a persisted
    IVF index WITHOUT re-clustering — assign only the delta to the
    existing centroids in one broadcast pass and append to the stored
    assignment table. The oracle proves the folding is exact: it trains
    the same centroids on the base corpus, re-assigns EVERYTHING to
    those fixed centroids from scratch, and restricts to the delta —
    incremental-assign == full-assign on fixed centroids, so the grown
    index is byte-identical to a rebuild (until centroid DRIFT says
    retrain: llm.similarity.ivf_cell_drift reports per-cell share growth
    and flags when re-training is warranted — pinned in
    test_similarity.py). x21/x41's incremental pattern applied to the
    last index in the engine that previously required a full rebuild.
    In production `cent` is a parquet read of the stored index; here it
    is retrained in-plan so the DuckDB oracle can replay it."""
    from ..llm.similarity import ivf_incremental_assign, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    cent, _ = kmeans_fit(base, "vec_id", "embedding", k=4, iters=2,
                         materialize=True)
    return ivf_incremental_assign(delta, cent)


_ANN16_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
base AS (SELECT * FROM comp WHERE vec_id % 5 <> 4),
cent0 AS (SELECT vec_id AS cell, i, v FROM base WHERE vec_id < 4),
{_pq_iter_sql('cent0', 1, 'base', '')},
{_pq_iter_sql('cent1', 2, 'base', '')},
{_pq_iter_sql('cent2', 3, 'comp', '')},
final_assign AS (
  SELECT comp.vec_id, cent3.cell,
         row_number() OVER (
           PARTITION BY comp.vec_id
           ORDER BY sum((comp.v - cent3.v) * (comp.v - cent3.v)), cent3.cell
         ) AS rn
  FROM comp JOIN cent3 ON comp.i = cent3.i
  GROUP BY comp.vec_id, cent3.cell
),
members AS (
  SELECT cell, count(*) AS n_members FROM final_assign WHERE rn = 1 GROUP BY 1
),
norms AS (
  SELECT cell, round(sqrt(sum(v * v)), 4) AS centroid_norm
  FROM cent3 GROUP BY 1
)
SELECT m.cell, m.n_members, n.centroid_norm
FROM members m JOIN norms n USING (cell)
"""


@register("ann16_centroid_refresh", _ANN16_SQL)
def ann16_centroid_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm-start centroid REFRESH — the step ann13's drift report
    triggers, completing the index lifecycle (build ann11 → serve
    ann11/ann14/ann15 → grow ann12 → drift ann13 → REFRESH): one Lloyd
    iteration over the GROWN corpus (base + the ann12 delta)
    initialized from the stored base-trained centroids
    (kmeans_fit(init=...)), instead of a from-scratch re-train. Warm
    start converges in 1-2 iterations because the stored centroids
    already describe most of the mass — at 100 TB that's the
    difference between one corpus pass and the full Lloyd schedule,
    and it never re-seeds, so cell identities are STABLE across
    refreshes (the stored assignment/code tables stay joinable on
    cell). Output is ann4's shape on the refreshed index: per-cell
    member count + centroid norm. Descent property (refresh never
    increases within-cell SSE on the grown corpus) is pinned in
    test_similarity.py; the oracle replays base training then the
    warm-start iteration and final re-assignment as CTE chains."""
    from ..llm.similarity import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    stored, _ = kmeans_fit(base, "vec_id", "embedding", k=4, iters=2,
                           materialize=True)
    refreshed, assign = kmeans_fit(emb, "vec_id", "embedding", iters=1,
                                   materialize=True, init=stored)
    norms = refreshed.groupBy("cell").agg(
        F.round(F.sqrt(F.sum(F.col("v") * F.col("v"))), 4).alias("centroid_norm")
    )
    return (
        assign.groupBy("cell")
        .agg(F.count("*").alias("n_members"))
        .join(norms, "cell")
        .select("cell", "n_members", "centroid_norm")
    )


@register(
    "ann7_multiprobe_topk",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
    cent AS (SELECT vec_id AS c, i, v AS cv FROM comp WHERE vec_id < 8),
    cross_dots AS (
      SELECT comp.vec_id, cent.c, sum(comp.v * cent.cv) AS dot
      FROM comp JOIN cent ON comp.i = cent.i GROUP BY 1, 2
    ),
    scored AS (
      SELECT cross_dots.vec_id, c, dot / (nv.norm * nc.norm) AS cos
      FROM cross_dots
      JOIN norms nv ON nv.vec_id = cross_dots.vec_id
      JOIN norms nc ON nc.vec_id = c
    ),
    assign AS (
      SELECT vec_id, c AS centroid FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) = 1
    ),
    qc AS (
      SELECT c AS centroid FROM scored WHERE vec_id = 0
      QUALIFY row_number() OVER (ORDER BY cos DESC, c) <= 2
    ),
    cluster AS (
      SELECT assign.vec_id FROM assign JOIN qc USING (centroid)
      WHERE assign.vec_id <> 0
    ),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    dots AS (
      SELECT c.vec_id, sum(c.v * q.qv) AS dot, sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN q ON c.i = q.i
      WHERE c.vec_id IN (SELECT vec_id FROM cluster)
      GROUP BY c.vec_id
    ),
    qn AS (SELECT sqrt(sum(v*v)) AS qnorm FROM comp WHERE vec_id = 0)
    SELECT vec_id, round(dot / (norm * qnorm), 4) AS cosine
    FROM dots, qn
    ORDER BY round(dot / (norm * qnorm), 4) DESC, vec_id
    LIMIT 10
    """,
)
def ann7_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search (multi-probe IVF): the recall/cost dial that
    ann6 measures, turned one notch — search the TWO cells nearest the
    query (nprobe=2) instead of one. Coarse-quantizer misses (a true
    neighbor assigned to the runner-up cell) are exactly what the extra
    probe recovers; cost grows to ~2/n_cells of the corpus, still a
    fraction of the exact scan. tests pin recall(nprobe=2) >=
    recall(nprobe=1) on the same ground truth."""
    from ..llm.similarity import ivf_topk

    return ivf_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=10, n_centroids=8,
        nprobe=2,
    )


@register(
    "ann8_embedding_moments",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    stats AS (
      SELECT a.i AS i, b.i AS j, count(*) AS n,
             sum(a.v * b.v) AS sxy, sum(a.v) AS sx, sum(b.v) AS sy
      FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    )
    SELECT cast(i - 1 AS BIGINT) AS i, cast(j - 1 AS BIGINT) AS j,
           round(sxy / n - (sx / n) * (sy / n), 6) + 0.0 AS cov
    FROM stats
    """,
)  # i/j re-based (generate_subscripts is 1-based, posexplode 0-based);
# "+ 0.0" canonicalizes IEEE negative zero, which the engines produce
# on different sides of values that round to 0.000000
def ann8_embedding_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space moments: per-dimension means and the full
    covariance matrix (upper triangle, population form E[xy]-E[x]E[y]) —
    the statistics whitening, PCA initialization, and drift monitoring
    consume. Distributed shape: the component self-join co-partitions on
    vec_id (one keyed shuffle of N*d rows); the d^2 fan-out happens
    AFTER the join and collapses immediately via map-side partial aggs
    into d(d+1)/2 output groups — no d^2-sized shuffle ever
    materializes, and nothing scales with N past the join. cov rounded
    at 6 dp: double accumulation across partitionings agrees far below
    1e-6 at any N where covariance is meaningful."""
    from ..llm.similarity import _components

    comp = _components(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    a = comp.select("vec_id", F.col("i").alias("ia"), F.col("v").alias("va"))
    b = comp.select("vec_id", F.col("i").alias("jb"), F.col("v").alias("vb"))
    stats = (
        a.join(b, "vec_id")
        .filter(F.col("ia") <= F.col("jb"))
        .groupBy("ia", "jb")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("va") * F.col("vb")).alias("sxy"),
            F.sum("va").alias("sx"),
            F.sum("vb").alias("sy"),
        )
    )
    return stats.select(
        F.col("ia").cast("bigint").alias("i"),
        F.col("jb").cast("bigint").alias("j"),
        (
            F.round(
                F.col("sxy") / F.col("n")
                - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")),
                6,
            )
            + F.lit(0.0)  # canonicalize IEEE -0.0 (see oracle note)
        ).alias("cov"),
    )


@register(
    "ann3_batch_topk",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    q AS (SELECT vec_id AS q, i, v AS qv FROM comp WHERE vec_id < 3),
    dots AS (
      SELECT c.vec_id, q.q, sum(c.v * q.qv) AS dot
      FROM comp c JOIN q ON c.i = q.i GROUP BY 1, 2
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY 1),
    scored AS (
      SELECT d.q, d.vec_id, d.dot / (nv.norm * nq.norm) AS cos_raw
      FROM dots d
      JOIN norms nv ON nv.vec_id = d.vec_id
      JOIN norms nq ON nq.vec_id = d.q
      WHERE d.vec_id <> d.q
    )
    SELECT q, vec_id, round(cos_raw, 4) AS cosine,
           cast(row_number() OVER (PARTITION BY q ORDER BY cos_raw DESC, vec_id)
                AS BIGINT) AS rnk
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY q ORDER BY cos_raw DESC, vec_id) <= 3
    """,
)
def ann3_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search (batched): top-3 neighbors for EVERY query in a
    query set, in one plan — the production ANN shape (queries arrive in
    batches, not one at a time). The query-side components broadcast;
    scoring is one groupBy; ranking is a per-query window."""
    from ..llm.similarity import _components

    emb = _t(spark, sf_dir, "embeddings")
    comp = _components(emb, "vec_id", "embedding")
    q = comp.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q"), "i", F.col("v").alias("qv")
    )
    dots = (
        comp.join(F.broadcast(q), "i")
        .groupBy("vec_id", "q")
        .agg(F.sum(F.col("v") * F.col("qv")).alias("dot"))
    )
    norms = comp.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm"))
    qnorms = norms.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q"), F.col("norm").alias("qnorm")
    )
    scored = (
        dots.join(norms, "vec_id")
        .join(F.broadcast(qnorms), "q")
        .filter(F.col("vec_id") != F.col("q"))
        .select("q", "vec_id", (F.col("dot") / (F.col("norm") * F.col("qnorm"))).alias("cos_raw"))
    )
    w = Window.partitionBy("q").orderBy(F.col("cos_raw").desc(), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "q",
            "vec_id",
            F.round("cos_raw", 4).alias("cosine"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_KMEANS_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
cent0 AS (
  SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4
),
{_kmeans_iter_sql('cent0', 1)},
{_kmeans_iter_sql('cent1', 2)},
{_kmeans_iter_sql('cent2', 3)},
members AS (
  SELECT cell, count(*) AS n_members FROM assign3 WHERE rn = 1 GROUP BY 1
),
norms AS (
  SELECT cell, round(sqrt(sum(v * v)), 4) AS centroid_norm
  FROM cent2 GROUP BY 1
)
SELECT members.cell, members.n_members, norms.centroid_norm
FROM members JOIN norms USING (cell)
"""


# ann11/ann14's oracles compose _kmeans_iter_sql (defined just above)
# with their serve chains — attached here because the helper does not
# exist yet at their registration sites
REGISTRY["ann11_ivfpq_from_index"].sql = _ann11_sql()


REGISTRY["ann14_batch_ivf_serve"].sql = _ann14_sql().replace(
    "{KMEANS_CHAINS}", _KMEANS_CHAINS
)


REGISTRY["ann15_filtered_topk"].sql = _ann15_sql().replace(
    "{KMEANS_CHAINS}", _KMEANS_CHAINS
)


REGISTRY["ann17_filtered_recall"].sql = _ann17_sql().replace(
    "{KMEANS_CHAINS}", _KMEANS_CHAINS
)


@register("ann4_kmeans_train", _KMEANS_SQL)
def ann4_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF centroid TRAINING: two Lloyd's k-means iterations (k=4,
    deterministic init = vectors 0..3) — assignment is the map-only
    broadcast BLAS kernel (llm.similarity._nearest_cell_blas), the
    update is a per-(cell, dim) average. No corpus vector ever reaches
    the driver (only the k x d centroid table, once per iteration);
    the update join is the single keyed shuffle per iteration.
    Output: per-cell member count and centroid L2 norm. Completes the
    IVF story: ann4 trains the cells ann2_ivf_topk probes. The DuckDB
    oracle replays both iterations as CTE chains — the argmin tie-break
    (distance, then cell) and the count/avg algebra are engine-exact.
    The Lloyd loop itself is :func:`llm.similarity.kmeans_fit` — the
    same trainer dd11_semantic_dedup clusters with."""
    from ..llm.similarity import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign = kmeans_fit(
        emb, "vec_id", "embedding", k=4, iters=2, materialize=True
    )
    norms = cent.groupBy("cell").agg(
        F.round(F.sqrt(F.sum(F.col("v") * F.col("v"))), 4).alias("centroid_norm")
    )
    return (
        assign.groupBy("cell")
        .agg(F.count("*").alias("n_members"))
        .join(norms, "cell")
        .select("cell", "n_members", "centroid_norm")
    )


_KNN_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
kk AS (
  SELECT greatest(4, ceil(count(DISTINCT vec_id) / 500.0)) AS k FROM comp
),
cent0 AS (
  SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k
),
{_kmeans_iter_sql('cent0', 1)},
{_kmeans_iter_sql('cent1', 2)},
{_kmeans_iter_sql('cent2', 3)},
asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
cand AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id <> y.vec_id
),
dots AS (
  SELECT c.a, c.b, sum(ca.v * cb.v) AS dot
  FROM cand c
  JOIN comp ca ON ca.vec_id = c.a
  JOIN comp cb ON cb.vec_id = c.b AND cb.i = ca.i
  GROUP BY 1, 2
),
scored AS (
  SELECT dots.a, dots.b, round(dot / (na.norm * nb.norm), 4) AS cosine
  FROM dots
  JOIN norms na ON na.vec_id = dots.a
  JOIN norms nb ON nb.vec_id = dots.b
  WHERE na.norm > 0 AND nb.norm > 0
)
SELECT a AS vec_id, b AS neighbor, cosine,
       cast(row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) AS BIGINT) AS rnk
FROM scored
QUALIFY row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) <= 3
"""


@register("ann5_knn_graph", _KNN_SQL)
def ann5_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: the k-NN GRAPH — top-3 cosine neighbors for
    EVERY vector, restricted to its IVF cell (ann1/ann3 answer one
    query or a query set; this materializes the all-nodes graph that
    clustering, graph-based dedup, and diversity sampling consume).

    IVF-cell restriction is the scale contract: cells bound the
    per-task pairwise work exactly as in dd11, so the graph build is
    k-means assignment + one per-cell gram + a per-vector top-k window
    keyed on the vector id. The cell count DERIVES from corpus size
    (k = N / 500, x51's SemDeDup recipe: the r13 100× run caught the
    fixed-k=4 form growing 50k-vector cells whose gram matrices are
    quadratic in corpus size; at the gate SFs, N <= 2000, the derived
    k is 4, so gate results are unchanged). Recall is cell-local (the
    IVF approximation); probe multiple cells for higher recall. Both
    directions of each in-cell pair are ranked, ties broken by
    neighbor id on the 4-dp rounded cosine in BOTH engines (ordering
    by the raw value would let sub-rounding noise pick different
    top-3 sets)."""
    from ..llm.similarity import _gram_topk_fn, derived_k_init, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    _, assign = kmeans_fit(
        emb, "vec_id", "embedding", iters=2, materialize=True,
        init=derived_k_init(emb, "vec_id", "embedding"),
    )
    vecs = assign.join(emb.select("vec_id", "embedding"), "vec_id").select(
        F.col("vec_id").alias("__id"), "cell", F.col("embedding").alias("__v")
    )
    # the cell IS the candidate set, so each member's top-3 ranks
    # inside the gram kernel — emitting 3 rows/vector instead of the
    # |cell|^2 mirrored pair table the old every-pair + window form
    # shuffled (200M rows at the 100x corpus; _gram_topk_fn docstring).
    # The output id type follows the input id column (r13 advice: a
    # hard-coded bigint would silently Arrow-cast a non-bigint caller)
    id_t = emb.schema["vec_id"].dataType.simpleString()
    graph = vecs.groupBy("cell").applyInPandas(
        _gram_topk_fn(3), schema=f"a {id_t}, b {id_t}, cosine double, rnk int"
    )
    return graph.select(
        F.col("a").alias("vec_id"),
        F.col("b").alias("neighbor"),
        "cosine",
        F.col("rnk").cast("bigint").alias("rnk"),
    )


@register("ann18_index_delete", None)  # sql attached below (ann11's + tombstones)
def ann18_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETES from the persisted IVF-PQ index — the shrink half of the
    maintenance pair ann12 opened (grow): tombstone every ``vec_id % 9
    == 1`` (three of ann11's current top-10 neighbors die, so the
    deletion is OBSERVABLE in the answer, not a no-op filter), anti-join
    the stored assignment + PQ-code tables against the tombstones
    (llm.similarity.ivfpq_delete_tombstones), and serve the same top-10
    query ann11 serves. Deleted vectors must vanish from every stage —
    coarse members, PQ shortlist, exact rerank — which filtering the
    membership tables guarantees by construction; centroids stay (a
    delete doesn't move a trained centroid; ann13's drift report says
    when to retrain). The oracle replays ann11's full deterministic
    build + serve with the tombstone predicate on the member set.
    Physical compaction (rewrite-minus-tombstones, atomic swap) and
    tombstone==compacted serve equivalence are pinned in
    tests/test_similarity.py. Reference analog: the delete-aware half
    of the stored-state idempotency of src/extract.py:222-270."""
    from ..llm.similarity import ivfpq_delete_tombstones, ivfpq_query_from_index

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign, codes, ca, cb = _cached_ivfpq_index(spark, sf_dir, emb)
    tomb = emb.filter(F.col("vec_id") % 9 == 1).select("vec_id")
    assign_r, codes_r = ivfpq_delete_tombstones(assign, codes, tomb)
    emb_r = emb.join(tomb, "vec_id", "left_anti")
    return ivfpq_query_from_index(
        emb_r, cent, assign_r, codes_r, ca, cb, query_id=0, k=10,
        shortlist=50, nprobe=2,
    )


REGISTRY["ann18_index_delete"].sql = _ann11_sql().replace(
    "WHERE asg.vec_id <> 0",
    "WHERE asg.vec_id <> 0 AND asg.vec_id % 9 <> 1",
)


@register(
    "ann19_sq8_topk",
    f"""
    WITH comp AS ({_DUCK_COMP}),
    stats AS (SELECT i, min(v) AS mn, max(v) AS mx FROM comp GROUP BY i),
    codes AS (
      SELECT vec_id, comp.i,
             CASE WHEN mx > mn
                  THEN least(255, floor((v - mn) / (mx - mn) * 256))
                  ELSE 0 END AS code
      FROM comp JOIN stats ON comp.i = stats.i
    ),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    approx AS (
      SELECT c.vec_id,
             round(sum((mn + (code + 0.5) * (mx - mn) / 256) * qv), 4)
               AS sq8_score
      FROM codes c
      JOIN stats ON c.i = stats.i
      JOIN q ON c.i = q.i
      WHERE c.vec_id <> 0
      GROUP BY 1
      ORDER BY sq8_score DESC, c.vec_id
      LIMIT 50
    ),
    exact AS (
      SELECT comp.vec_id, a.sq8_score, sum(comp.v * q.qv) AS dot,
             sqrt(sum(comp.v * comp.v)) AS norm
      FROM comp JOIN approx a ON comp.vec_id = a.vec_id
      JOIN q ON comp.i = q.i
      GROUP BY 1, 2
    ),
    qn AS (SELECT sqrt(sum(v * v)) AS qnorm FROM comp WHERE vec_id = 0)
    SELECT vec_id, round(dot / (norm * qnorm), 4) AS cosine, sq8_score
    FROM exact, qn
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def ann19_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, scalar-quantized (SQ8) serve mode: 8-bit
    per-dimension quantization against corpus [min, max] — 1 byte/dim
    storage with NO training step (one mergeable d-sized min/max agg),
    the cheap default real vector stores offer before IVF/PQ tuning.
    Approximate scan over dequantized codes cuts a 50-candidate
    shortlist (4-dp rounded score, pq_topk's engine-stable convention),
    exact rerank returns top-10. See llm/similarity.sq8_topk for the
    plan-shape notes."""
    from ..llm.similarity import sq8_topk

    return sq8_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10, shortlist=50)


def _ann20_sql() -> str:
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    cent0 AS (
      SELECT vec_id AS cell, i, v FROM comp WHERE vec_id < 4
    ),
    {_KMEANS_CHAINS}
    asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
    qc AS (SELECT cell FROM asg WHERE vec_id = 0),
    members AS (
      SELECT a.vec_id FROM asg a, qc
      WHERE a.cell = qc.cell AND a.vec_id <> 0
    ),
    stats AS (SELECT i, min(v) AS mn, max(v) AS mx FROM comp GROUP BY i),
    codes AS (
      SELECT comp.vec_id, comp.i,
             CASE WHEN mx > mn
                  THEN least(255, floor((v - mn) / (mx - mn) * 256))
                  ELSE 0 END AS code
      FROM comp JOIN stats ON comp.i = stats.i
      WHERE comp.vec_id IN (SELECT vec_id FROM members)
    ),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    approx AS (
      SELECT c.vec_id,
             round(sum((mn + (code + 0.5) * (mx - mn) / 256) * qv), 4)
               AS sq8_score
      FROM codes c
      JOIN stats ON c.i = stats.i
      JOIN q ON c.i = q.i
      GROUP BY 1
      ORDER BY sq8_score DESC, c.vec_id
      LIMIT 50
    ),
    exact AS (
      SELECT comp.vec_id, a.sq8_score, sum(comp.v * q.qv) AS dot,
             sqrt(sum(comp.v * comp.v)) AS norm
      FROM comp JOIN approx a ON comp.vec_id = a.vec_id
      JOIN q ON comp.i = q.i
      GROUP BY 1, 2
    ),
    qn AS (SELECT sqrt(sum(v * v)) AS qnorm FROM comp WHERE vec_id = 0)
    SELECT vec_id, round(dot / (norm * qnorm), 4) AS cosine, sq8_score
    FROM exact, qn
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """


@register("ann20_ivf_sq8_topk", None)  # sql attached below
def ann20_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, IVF x SQ8 composition (FAISS's ``IVF<n>,SQ8``
    index type): the coarse cells prune the CANDIDATE SET to the
    query's cell, scalar quantization shrinks the SCANNED BYTES to 1
    per dimension, and the savings multiply — closing the loop ann19's
    scale note promised ("at production scale SQ8 composes with IVF").
    Like ann10/ann16, the REGISTERED form trains the cells in-plan so
    the oracle can replay them — its bench wall is dominated by the
    two Lloyd iterations, a build-time number; the serve-path story is
    the quantized scan itself, which is cell-scoped (1/k of ann19's
    code rows) and would ride a persisted index exactly as ann11
    serves ann10's. See llm/similarity.ivf_sq8_topk."""
    from ..llm.similarity import ivf_sq8_topk

    return ivf_sq8_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=10, shortlist=50
    )


REGISTRY["ann20_ivf_sq8_topk"].sql = _ann20_sql()


_ANN21_PROBES = (1, 2, 4)


_ANN21_SQL = f"""
WITH comp AS ({{comp}}),
norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
alldots AS (
  SELECT c.vec_id, sum(c.v * q.qv) AS dot
  FROM comp c JOIN q ON c.i = q.i GROUP BY c.vec_id
),
scoredall AS (
  SELECT d.vec_id, d.dot / (n.norm * qn.qnorm) AS cos
  FROM alldots d JOIN norms n ON n.vec_id = d.vec_id, qn
  WHERE d.vec_id <> 0
),
bf AS (SELECT vec_id FROM scoredall
       ORDER BY round(cos, 4) DESC, vec_id LIMIT 10),
cent AS (SELECT vec_id AS c, i, v AS cv FROM comp WHERE vec_id < 8),
cross_dots AS (
  SELECT comp.vec_id, cent.c, sum(comp.v * cent.cv) AS dot
  FROM comp JOIN cent ON comp.i = cent.i GROUP BY 1, 2
),
scored AS (
  SELECT cross_dots.vec_id, c, dot / (nv.norm * nc.norm) AS cos
  FROM cross_dots
  JOIN norms nv ON nv.vec_id = cross_dots.vec_id
  JOIN norms nc ON nc.vec_id = c
),
assign AS (
  SELECT vec_id, c AS centroid FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) = 1
),
qcells AS (
  SELECT c, row_number() OVER (ORDER BY cos DESC, c) AS pr
  FROM scored WHERE vec_id = 0
),
nps AS (SELECT unnest([{", ".join(str(p) for p in _ANN21_PROBES)}]) AS np),
cand AS (
  SELECT nps.np, a.vec_id
  FROM assign a
  JOIN qcells qc ON a.centroid = qc.c
  JOIN nps ON qc.pr <= nps.np
  WHERE a.vec_id <> 0
),
ivfk AS (
  SELECT np, vec_id FROM (
    SELECT cand.np, s.vec_id,
           row_number() OVER (PARTITION BY cand.np
                              ORDER BY round(s.cos, 4) DESC, s.vec_id) AS rn
    FROM cand JOIN scoredall s ON s.vec_id = cand.vec_id
  ) WHERE rn <= 10
),
hits AS (
  SELECT np, count(*) AS n_hits FROM ivfk
  WHERE vec_id IN (SELECT vec_id FROM bf) GROUP BY 1
),
scan AS (SELECT np, count(*) AS n_scanned FROM cand GROUP BY 1)
SELECT nps.np AS nprobe, cast(10 AS BIGINT) AS k,
       cast(coalesce(scan.n_scanned, 0) AS BIGINT) AS n_scanned,
       cast(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(hits.n_hits, 0) / 10.0, 4) AS recall_at_k
FROM nps
LEFT JOIN scan ON scan.np = nps.np
LEFT JOIN hits ON hits.np = nps.np
"""


@register("ann21_probe_recall_curve", None)  # sql attached below
def ann21_probe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-vs-cost TUNING CURVE in one plan: recall@10 and
    candidate-scan size for nprobe in {1, 2, 4} against the same
    brute-force ground truth — the table an ANN operator actually
    reads before picking a probe count. ann6 measures one point and
    ann7 one notch up; this emits the curve, so "how many probes buy
    recall 0.9, and what do they cost in scanned rows" is a SELECT,
    not three reruns. n_scanned is the cost axis: it grows ~linearly
    in nprobe while recall saturates — the knee is the operating
    point. Monotonicity in both axes is pinned (more probes never
    scan less or recall less; candidates nest by construction).

    Plan shape: ONE coarse-assignment kernel pass and ONE brute-force
    ground-truth ranking shared by all three curve points (each is
    pinned with a localCheckpoint — before r15 the static plan
    re-executed the assignment kernel once per probe level and per
    consumer, and the brute-force side once per intersect: 12 corpus
    scans for a 3-row answer, guide §2.4). The per-level member sets
    are prefix slices of a single 8-row probe ranking (candidates
    nest by construction, so rank <= nprobe replays each level's
    ``ORDER BY cos DESC, c LIMIT nprobe`` exactly); the exact rerank
    per probe level cuts via per-partition heaps."""
    from pyspark.sql import Window

    from ..llm.similarity import (
        _components,
        _nearest_centroid_cos_blas,
        _rerank_members,
        brute_force_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    bf = (
        brute_force_topk(emb, query_id=0, k=10)
        .select("vec_id")
        .localCheckpoint(eager=True)
    )
    # shared coarse state — byte-for-byte _ivf_cluster_members'
    # arithmetic (same kernel, same (cos DESC, c ASC) probe order),
    # computed once for the whole curve
    comp = _components(emb, "vec_id", "embedding")
    cent = comp.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c"), "i", F.col("v").alias("cv")
    )
    assign = _nearest_centroid_cos_blas(
        emb, "vec_id", "embedding", cent
    ).localCheckpoint(eager=True)
    qcomp = comp.filter(F.col("vec_id") == 0).select(
        "i", F.col("v").alias("qv")
    )
    qnorm = qcomp.agg(
        F.sqrt(F.sum(F.col("qv") * F.col("qv"))).alias("qnorm")
    )
    cnorms = cent.groupBy("c").agg(
        F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cnorm")
    )
    ranked = (
        cent.join(F.broadcast(qcomp), "i")
        .groupBy("c")
        .agg(F.sum(F.col("cv") * F.col("qv")).alias("dot"))
        .join(F.broadcast(cnorms), "c")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "c",
            (F.col("dot") / (F.col("qnorm") * F.col("cnorm"))).alias("cos"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("cos").desc(), F.col("c"))
            ),
        )
        .select(F.col("c").alias("centroid"), "rnk")
        .localCheckpoint(eager=True)  # 8 rows
    )
    parts = []
    for np_ in _ANN21_PROBES:
        members = (
            assign.join(
                F.broadcast(ranked.filter(F.col("rnk") <= np_)), "centroid"
            )
            .filter(F.col("vec_id") != 0)
            .select("vec_id")
        )
        topk = _rerank_members(emb, members, 0, 10, "vec_id", "embedding")
        hits = topk.select("vec_id").intersect(bf)
        parts.append(
            members.agg(F.count(F.lit(1)).alias("n_scanned"))
            .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
            .select(
                F.lit(np_).cast("bigint").alias("nprobe"),
                F.lit(10).cast("bigint").alias("k"),
                F.col("n_scanned").cast("bigint").alias("n_scanned"),
                F.col("n_hits").cast("bigint").alias("n_hits"),
                F.round(F.col("n_hits") / 10.0, 4).alias("recall_at_k"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _ann21_sql() -> str:
    return _ANN21_SQL.format(comp=_DUCK_COMP)


REGISTRY["ann21_probe_recall_curve"].sql = _ann21_sql()


_ANN24_SQL = """
WITH comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         cast(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
norms AS (
  SELECT vec_id, sum(v * v) AS sq FROM comp GROUP BY 1
),
mx AS (SELECT max(sq) AS msq FROM norms),
-- derive the augmented index from the data's own dimensionality so a
-- dimension change fails loudly instead of truncating dots (r9 advice)
dims AS (SELECT max(i) AS d FROM comp),
-- the augmented component: every vector gets one extra coordinate
-- sqrt(M^2 - |x|^2); the query's extra coordinate is 0
acomp AS (
  SELECT vec_id, i, v FROM comp
  UNION ALL
  SELECT n.vec_id, dims.d + 1 AS i, sqrt(mx.msq - n.sq) AS v
  FROM norms n, mx, dims
),
q AS (SELECT i, qv FROM (
  SELECT i, v AS qv FROM comp WHERE vec_id = 0
  UNION ALL SELECT dims.d + 1 AS i, 0e0 AS qv FROM dims
)),
qn AS (SELECT sqrt(sum(qv * qv)) AS qnorm FROM q),
dots AS (
  SELECT c.vec_id, sum(c.v * q.qv) AS dot
  FROM comp c
  JOIN (SELECT i, qv FROM q, dims WHERE i <= dims.d) q ON q.i = c.i
  WHERE c.vec_id <> 0 GROUP BY 1
),
augsc AS (
  SELECT a.vec_id,
         sum(a.v * q.qv) / (sqrt(sum(a.v * a.v)) * any_value(qn.qnorm))
           AS aug_cos
  FROM acomp a JOIN q ON q.i = a.i, qn
  WHERE a.vec_id <> 0 GROUP BY 1
),
ranked AS (
  SELECT d.vec_id, d.dot, g.aug_cos,
         row_number() OVER (ORDER BY d.dot DESC, d.vec_id) AS rnk,
         row_number() OVER (ORDER BY g.aug_cos DESC, g.vec_id)
           AS aug_rnk
  FROM dots d JOIN augsc g ON g.vec_id = d.vec_id
)
SELECT vec_id, round(dot, 4) AS dot,
       cast(rnk AS BIGINT) AS rnk,
       cast(aug_rnk AS BIGINT) AS aug_rnk,
       cast(CASE WHEN rnk = aug_rnk THEN 1 ELSE 0 END AS BIGINT)
         AS ranks_agree
FROM ranked WHERE rnk <= 10
"""


@register("ann24_mips_topk", _ANN24_SQL, first_round=9)
def ann24_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search (MIPS) with the norm-augmentation
    contract: top-10 vectors by RAW dot product with the stored query
    (recommendation scoring, where popular items legitimately have
    bigger norms and cosine would erase that), plus the
    Shrivastava-Li reduction verified as data: augmenting each vector
    with sqrt(M^2-|x|^2) (M = max norm) and the query with 0 makes
    augmented-norms constant, so augmented-COSINE rank must equal raw
    dot rank — both rankings are computed and the per-row agreement
    flag is part of the output (the property that lets every cosine
    index in this engine — IVF/PQ/SQ8/LSH — serve MIPS unchanged).

    Plan shape (r10 verdict fix): ann1's one-fold-per-vector scan
    economics; the max-norm and query-norm are single-row broadcasts.
    The dot top-10 cut is a TakeOrderedAndProject (distributed heap,
    no global sort). The augmented-cosine rank is needed ONLY for
    those 10 candidates, so it is NOT a corpus-wide window (a
    single-partition funnel at 100 TB): aug_rnk = 1 + the count of
    corpus vectors strictly ahead in (aug_cos DESC, vec_id) order,
    computed as a broadcast-nested-loop join of the 10-row cut
    against the corpus scores followed by a candidate-keyed count —
    fully parallel over the corpus, identical integer result to
    row_number (the oracle keeps the row_number formulation). rnk is
    the same count-of-greater over the cut itself (top-10 membership
    makes the within-cut count exact). Two corpus scans total, zero
    single-partition exchanges."""
    from ..llm.similarity import cosine_expr

    emb = _t(spark, sf_dir, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq = F.aggregate(
        F.transform(vd, lambda x: x * x),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    qrow = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    mx = emb.agg(F.max(sq).alias("msq"))
    # augmented vectors materialized as data (double precision, the
    # same arithmetic the oracle's UNION ALL component row carries):
    # x' = [x, sqrt(M^2-|x|^2)], q' = [q, 0]
    aug = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(mx))
        .select(
            "vec_id", "embedding",
            F.concat(
                vd, F.array(F.sqrt(F.col("msq") - sq))
            ).alias("aug_emb"),
        )
    )
    qaug = qrow.select(
        "qe",
        F.concat(
            F.transform(F.col("qe"), lambda x: x.cast("double")),
            F.array(F.lit(0.0)),
        ).alias("q_aug"),
    )
    scored = aug.crossJoin(F.broadcast(qaug)).select(
        "vec_id",
        F.aggregate(
            F.zip_with(
                F.transform(F.col("embedding"), lambda x: x.cast("double")),
                F.transform(F.col("qe"), lambda x: x.cast("double")),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("dot"),
        cosine_expr(F.col("aug_emb"), F.col("q_aug")).alias("aug_cos"),
    )
    cut = (
        scored.orderBy(F.col("dot").desc(), "vec_id")
        .limit(10)
        .select(
            F.col("vec_id").alias("c_id"),
            F.col("dot").alias("c_dot"),
            F.col("aug_cos").alias("c_aug"),
        )
    )
    # rnk: strictly-ahead count within the cut (exact for top-10
    # members — anything ahead of them by dot is itself in the cut)
    peers = cut.select(
        F.col("c_id").alias("p_id"), F.col("c_dot").alias("p_dot")
    )
    ranked = (
        cut.join(
            F.broadcast(peers),
            (F.col("p_dot") > F.col("c_dot"))
            | (
                (F.col("p_dot") == F.col("c_dot"))
                & (F.col("p_id") < F.col("c_id"))
            ),
            "left",
        )
        .groupBy("c_id", "c_dot", "c_aug")
        .agg((F.count("p_id") + 1).alias("rnk"))
    )
    # aug_rnk: strictly-ahead count against the WHOLE corpus's
    # augmented-cosine ordering — candidate frame broadcast, corpus
    # side streamed, one candidate-keyed count
    corpus = scored.select(
        F.col("vec_id").alias("g_id"), F.col("aug_cos").alias("g_aug")
    )
    ahead = (
        corpus.join(
            F.broadcast(ranked.select("c_id", "c_aug")),
            (F.col("g_aug") > F.col("c_aug"))
            | (
                (F.col("g_aug") == F.col("c_aug"))
                & (F.col("g_id") < F.col("c_id"))
            ),
            "inner",
        )
        .groupBy("c_id")
        .agg(F.count("g_id").alias("n_ahead"))
    )
    return (
        ranked.join(F.broadcast(ahead), "c_id", "left")
        .select(
            F.col("c_id").alias("vec_id"),
            F.round("c_dot", 4).alias("dot"),
            F.col("rnk").cast("bigint").alias("rnk"),
            (F.coalesce(F.col("n_ahead"), F.lit(0)) + 1)
            .cast("bigint")
            .alias("aug_rnk"),
            F.when(
                F.col("rnk") == F.coalesce(F.col("n_ahead"), F.lit(0)) + 1, 1
            )
            .otherwise(0)
            .cast("bigint")
            .alias("ranks_agree"),
        )
    )


_ANN23_SQL = f"""
WITH {_bm25_scores_sql()},
bm_ranked AS (
  SELECT id, rb FROM (
    SELECT doc_id AS id,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rb
    FROM bm25
  ) WHERE rb <= 1000
),
comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         cast(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
cos AS (
  SELECT c.vec_id,
         sum(c.v * q.qv)
           / (sqrt(sum(c.v * c.v)) * sqrt((SELECT sum(qv * qv) FROM q)))
           AS cosim
  FROM comp c JOIN q ON q.i = c.i
  WHERE c.vec_id <> 0
  GROUP BY 1
),
cos_ranked AS (
  SELECT id, rc FROM (
    SELECT vec_id AS id,
           row_number() OVER (ORDER BY cosim DESC, vec_id) AS rc
    FROM cos
  ) WHERE rc <= 1000
),
fused AS (
  SELECT coalesce(b.id, c.id) AS doc_id,
         coalesce(1e0 / (60 + b.rb), 0)
           + coalesce(1e0 / (60 + c.rc), 0)
           AS rrf,
         b.rb AS bm25_rank, c.rc AS cos_rank
  FROM bm_ranked b FULL OUTER JOIN cos_ranked c ON c.id = b.id
)
SELECT doc_id, round(rrf, 6) AS rrf,
       cast(bm25_rank AS BIGINT) AS bm25_rank,
       cast(cos_rank AS BIGINT) AS cos_rank,
       cast(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
         AS rnk
FROM fused
QUALIFY rnk <= 10
"""


@register("ann23_hybrid_rrf", _ANN23_SQL, first_round=9)
def ann23_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (RRF, the industry-
    standard score-free fusion: sum of 1/(60+rank) over legs): the
    lexical leg is x69's BM25 ranking for "hash join stream", the
    dense leg is exact cosine against the stored query vector
    (vec_id 0, ann1's convention), each leg CUT to its top-1000
    candidates before fusion (the production hybrid shape — fusion
    work is candidate-list-sized, never corpus-sized), and documents
    missing from a leg contribute nothing for it — lexical-only and
    dense-only matches both stay retrievable, which is the whole
    point of hybrid search. Top-10 by fused score with per-leg ranks
    reported for explainability.

    Plan shape: each leg is its own keyed pipeline (BM25: broadcast
    stats onto the term-filtered token stream; cosine: one array fold
    per vector against a broadcast query); the fusion is an id-keyed
    full-outer join of two rank tables, and the final cut is
    TakeOrderedAndProject. Nothing in the fusion grows faster than
    the leg outputs."""
    from ..llm.similarity import cosine_expr

    d = _t(spark, sf_dir, "documents")
    wb = Window.orderBy(F.col("score").desc(), "doc_id")
    bm = (
        _bm25_scores_spark(d)
        .withColumn("rb", F.row_number().over(wb))
        .filter(F.col("rb") <= 1000)  # candidate cut -> TakeOrdered
        .select(F.col("doc_id").alias("id"), "rb")
    )
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    cos = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            cosine_expr(F.col("embedding"), F.col("qe")).alias("cosim"),
        )
    )
    wc = Window.orderBy(F.col("cosim").desc(), "vec_id")
    cr = (
        cos.withColumn("rc", F.row_number().over(wc))
        .filter(F.col("rc") <= 1000)  # candidate cut -> TakeOrdered
        .select(F.col("vec_id").alias("id"), "rc")
    )
    fused = bm.join(cr, "id", "full_outer").select(
        F.col("id").alias("doc_id"),
        (
            F.coalesce(1.0 / (60 + F.col("rb")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rc")), F.lit(0.0))
        ).alias("rrf"),
        F.col("rb").alias("bm25_rank"),
        F.col("rc").alias("cos_rank"),
    )
    wf = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= 10)
        .select(
            "doc_id",
            F.round("rrf", 6).alias("rrf"),
            F.col("bm25_rank").cast("bigint").alias("bm25_rank"),
            F.col("cos_rank").cast("bigint").alias("cos_rank"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_ANN22_PLANES = 48


_ANN22_SHORTLIST = 50


def _ann22_sql() -> str:
    from ..llm.dedup import _hexint_sql

    n = _ANN22_PLANES
    md5_exprs = ", ".join(
        f"md5('rp{p}|' || cast(i AS VARCHAR)) AS m{p}" for p in range(n)
    )
    coef_exprs = ", ".join(
        f"({_hexint_sql(f'm{p}', 8)} / 2147483648.0 - 1.0) AS r{p}"
        for p in range(n)
    )
    proj_exprs = ", ".join(f"sum(v * r{p}) AS pr{p}" for p in range(n))
    code_expr = " + ".join(
        f"CASE WHEN pr{p} >= 0 THEN cast({1 << p} AS BIGINT) "
        f"ELSE 0 END"
        for p in range(n)
    )
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    idx AS (SELECT DISTINCT i FROM comp),
    md5s AS (SELECT i, {md5_exprs} FROM idx),
    coefs AS (SELECT i, {coef_exprs} FROM md5s),
    joined AS (
      SELECT comp.vec_id, comp.v,
             {', '.join(f'coefs.r{p}' for p in range(n))}
      FROM comp JOIN coefs ON comp.i = coefs.i
    ),
    proj AS (SELECT vec_id, {proj_exprs} FROM joined GROUP BY vec_id),
    codes AS (SELECT vec_id, ({code_expr}) AS code FROM proj),
    qc AS (SELECT code AS qcode FROM codes WHERE vec_id = 0),
    ham AS (
      SELECT vec_id, bit_count(xor(code, qcode)) AS hamming
      FROM codes, qc WHERE vec_id <> 0
    ),
    short AS (
      SELECT vec_id, hamming FROM ham
      ORDER BY hamming, vec_id LIMIT {_ANN22_SHORTLIST}
    ),
    norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY 1),
    q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    qn AS (SELECT norm AS qnorm FROM norms WHERE vec_id = 0),
    exact AS (
      SELECT comp.vec_id, sum(comp.v * q.qv) AS dot
      FROM comp JOIN q ON comp.i = q.i
      WHERE comp.vec_id IN (SELECT vec_id FROM short)
      GROUP BY 1
    ),
    topk AS (
      SELECT e.vec_id,
             round(e.dot / (n2.norm * qn.qnorm), 4) AS cosine
      FROM exact e JOIN norms n2 ON n2.vec_id = e.vec_id, qn
      ORDER BY cosine DESC, e.vec_id LIMIT 10
    )
    SELECT topk.vec_id, topk.cosine,
           cast(short.hamming AS BIGINT) AS hamming
    FROM topk JOIN short ON short.vec_id = topk.vec_id
    """


@register("ann22_binary_hamming_topk", None)  # sql attached below
def ann22_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search from BINARY codes — the most compressed member
    of the quantization family (ann19 SQ8 = 1 byte/dim, ann9/ann10 PQ
    = codebook ids, this = 48 BITS per vector regardless of dimension,
    a 21x shrink vs SQ8 at d=128): pack 48 random-hyperplane sign bits
    into one bigint, shortlist by Hamming distance — one
    ``bit_count(code XOR qcode)`` instruction per candidate — and
    exact-rerank the survivors. dd5 uses the same hyperplanes to BUCKET
    for dedup; this SERVES top-k from them, completing the
    dedup/search symmetry. At 100 TB the code table is 8 bytes/vector
    (a 10^10-vector corpus fits in 80 GB — broadcastable per
    executor), so the full-precision scan shrinks to the shortlist.
    Plane coefficients are the md5-derived constants
    hyperplane_lsh_buckets ships, so the oracle packs bit-identical
    codes; the Hamming cut is integer-exact (no rounding anywhere
    before the final cosine).

    Plan shape: one broadcast coefficient join + id-keyed projection
    agg builds codes; the Hamming cut compiles to
    TakeOrderedAndProject; only shortlist vectors are read at full
    precision (ann19's serve pattern, smaller state)."""
    from ..llm.similarity import binary_hamming_topk

    return binary_hamming_topk(
        _t(spark, sf_dir, "embeddings"),
        query_id=0,
        k=10,
        shortlist=_ANN22_SHORTLIST,
        n_planes=_ANN22_PLANES,
    )


REGISTRY["ann22_binary_hamming_topk"].sql = _ann22_sql()


_ANN25_RADIUS = 0.25  # cosine floor for the range query

_ANN25_SQL = f"""
WITH comp AS ({{comp}}),
norms AS (
  SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM comp GROUP BY 1
),
q AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
qn AS (SELECT nrm AS qnrm FROM norms WHERE vec_id = 0),
dots AS (
  SELECT c.vec_id, sum(c.v * q.qv) AS dot
  FROM comp c JOIN q ON q.i = c.i
  WHERE c.vec_id <> 0 GROUP BY 1
)
SELECT d.vec_id, round(d.dot / (n.nrm * qn.qnrm), 4) AS cos
FROM dots d JOIN norms n ON n.vec_id = d.vec_id, qn
WHERE d.dot / (n.nrm * qn.qnrm) >= {_ANN25_RADIUS}
"""


@register("ann25_range_search", None, first_round=10)
def ann25_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) similarity search: EVERY vector whose cosine to
    the stored query (vec_id 0) clears a fixed floor — the
    "find all near-duplicates / all relevant passages" contract,
    complementing ann1's top-k (k-bounded) cut. Unlike top-k, range
    search needs NO global ordering stage at any scale: the predicate
    is a pure per-row filter after the one fold-per-vector cosine, so
    the plan is a single scan with map-side evaluation — the result
    set size is data-dependent by definition, and downstream consumers
    cap it themselves if they must.

    Plan shape: one embeddings scan, one fold per vector
    (F.aggregate dot + norm against the broadcast single-row query),
    filter, project. No exchange except the tiny query-row broadcast;
    no TakeOrdered, no window."""
    from ..llm.similarity import cosine_expr

    emb = _t(spark, sf_dir, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", vd.alias("v"))
    q = base.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv")
    )
    cos = cosine_expr(F.col("v"), F.col("qv"))
    return (
        base.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("rawcos"))
        .filter(F.col("rawcos") >= _ANN25_RADIUS)
        .select("vec_id", F.round("rawcos", 4).alias("cos"))
    )


REGISTRY["ann25_range_search"].sql = _ANN25_SQL.format(comp=_DUCK_COMP)


_ANN26_SQL = """
WITH comp AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
         cast(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent AS (
  SELECT label, i, avg(v) AS cv FROM comp GROUP BY 1, 2
),
cnorm AS (
  SELECT label, sqrt(sum(cv * cv)) AS cn FROM cent GROUP BY 1
),
memdot AS (
  SELECT c.vec_id, c.label,
         sum(c.v * ct.cv) AS dot,
         sqrt(sum(c.v * c.v)) AS vn
  FROM comp c JOIN cent ct ON ct.label = c.label AND ct.i = c.i
  GROUP BY 1, 2
),
cohesion AS (
  SELECT m.label, count(*) AS n,
         avg(m.dot / (m.vn * cn.cn)) AS coh
  FROM memdot m JOIN cnorm cn ON cn.label = m.label
  GROUP BY 1
),
cc AS (
  SELECT a.label AS la, b.label AS lb,
         sum(a.cv * b.cv) AS dot
  FROM cent a JOIN cent b ON a.i = b.i AND a.label <> b.label
  GROUP BY 1, 2
),
sep AS (
  SELECT cc.la AS label,
         max(cc.dot / (na.cn * nb.cn)) AS max_other
  FROM cc JOIN cnorm na ON na.label = cc.la
          JOIN cnorm nb ON nb.label = cc.lb
  GROUP BY 1
)
SELECT c.label, cast(c.n AS BIGINT) AS n_members,
       round(c.coh, 4) AS cohesion,
       round(s.max_other, 4) AS max_other_centroid_cos,
       cast(CASE WHEN c.coh > s.max_other THEN 1 ELSE 0 END AS BIGINT)
         AS separated
FROM cohesion c JOIN sep s ON s.label = c.label
"""


@register("ann26_label_centroid_quality", _ANN26_SQL, first_round=10)
def ann26_label_centroid_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space cluster-quality audit over the LABELED corpus:
    per label, the member count, COHESION (mean cosine of members to
    their own label centroid) and SEPARATION (max cosine between this
    centroid and any other), with a per-label separated flag — the
    silhouette-style health check a curation pipeline runs after
    retraining an embedder or ingesting a new source, answering "are
    the classes still tight and apart" from one scan plus
    label-matrix-sized joins.

    Plan shape: one posexplode feeds a (label, dim) mean agg — the
    centroid matrix is |labels| x dims and everything downstream
    (centroid norms, the centroid-centroid cosine grid, the
    separation max) is matrix-sized. Member-to-centroid cosines join
    the component stream to the BROADCAST centroid matrix keyed on
    (label, dim) and fold per vector — one corpus-sized shuffle
    total. No k-means training: labels are data, so the audit is
    deterministic and oracle-replayable."""
    emb = _t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", "label",
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("i0", "v"),
    ).select("vec_id", "label", (F.col("i0") + 1).alias("i"), "v")
    cent = comp.groupBy("label", "i").agg(F.avg("v").alias("cv"))
    cnorm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cn")
    )
    memdot = (
        comp.join(
            F.broadcast(cent.withColumnRenamed("label", "clabel")),
            (F.col("clabel") == F.col("label"))
            & (cent["i"] == comp["i"]),
        )
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("cv")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("vn"),
        )
    )
    cohesion = (
        memdot.join(F.broadcast(cnorm), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("dot") / (F.col("vn") * F.col("cn"))).alias(
                "coh"
            ),
        )
    )
    a = cent.select(
        F.col("label").alias("la"), "i", F.col("cv").alias("av")
    )
    b = cent.select(
        F.col("label").alias("lb"), "i", F.col("cv").alias("bv")
    )
    cc = (
        a.join(b, ["i"])
        .filter(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(F.sum(F.col("av") * F.col("bv")).alias("dot"))
    )
    na = cnorm.select(F.col("label").alias("la"), F.col("cn").alias("can"))
    nb = cnorm.select(F.col("label").alias("lb"), F.col("cn").alias("cbn"))
    sep = (
        cc.join(F.broadcast(na), "la")
        .join(F.broadcast(nb), "lb")
        .groupBy(F.col("la").alias("label"))
        .agg(F.max(F.col("dot") / (F.col("can") * F.col("cbn"))).alias(
            "max_other"
        ))
    )
    return (
        cohesion.join(sep, "label")
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_members"),
            F.round("coh", 4).alias("cohesion"),
            F.round("max_other", 4).alias("max_other_centroid_cos"),
            F.when(F.col("coh") > F.col("max_other"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("separated"),
        )
    )


_ANN27_SQL = """
WITH comp AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
         cast(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent AS (
  SELECT label AS clabel, i, avg(v) AS cv FROM comp GROUP BY 1, 2
),
cnorm AS (SELECT clabel, sqrt(sum(cv * cv)) AS cn FROM cent GROUP BY 1),
scored AS (
  SELECT c.vec_id, c.label, ct.clabel,
         sum(c.v * ct.cv) AS dot,
         sqrt(sum(c.v * c.v)) AS vn
  FROM comp c JOIN cent ct ON ct.i = c.i
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT s.vec_id, s.label, s.clabel,
         row_number() OVER (
           PARTITION BY s.vec_id
           ORDER BY s.dot / (s.vn * n.cn) DESC, s.clabel) AS rnk
  FROM scored s JOIN cnorm n ON n.clabel = s.clabel
)
SELECT label AS true_label, clabel AS pred_label,
       cast(count(*) AS BIGINT) AS n
FROM ranked WHERE rnk = 1
GROUP BY 1, 2
"""


@register("ann27_centroid_confusion", _ANN27_SQL, first_round=10)
def ann27_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classifier confusion matrix: every vector is
    assigned to its max-cosine LABEL centroid (tie-break: smaller
    label) and the (true, predicted) grid is counted — the one-scan
    "is the embedding space linearly usable" audit that complements
    ann26's geometry numbers with an actual classification outcome;
    diagonal mass = nearest-centroid accuracy, off-diagonal cells name
    WHICH classes bleed into each other (the label-noise shortlist a
    curation pass reviews first).

    Plan shape: the centroid matrix is |labels| x dims (one component
    agg) and BROADCASTS into the scoring join, which folds |labels|
    cosines per vector in one pass; the argmax is a vec_id-keyed
    row_number window (group-limited), and the confusion grid is a
    final |labels|^2-bounded agg. One corpus-sized shuffle total —
    training-free, so the whole audit is oracle-replayable."""
    emb = _t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", "label",
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("i0", "v"),
    ).select("vec_id", "label", (F.col("i0") + 1).alias("i"), "v")
    cent = comp.groupBy(F.col("label").alias("clabel"), "i").agg(
        F.avg("v").alias("cv")
    )
    cnorm = cent.groupBy("clabel").agg(
        F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cn")
    )
    scored = (
        comp.join(F.broadcast(cent), ["i"])
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(F.col("v") * F.col("cv")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("vn"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        (F.col("dot") / (F.col("vn") * F.col("cn"))).desc(), "clabel"
    )
    ranked = scored.join(F.broadcast(cnorm), "clabel").withColumn(
        "rnk", F.row_number().over(w)
    )
    return (
        ranked.filter(F.col("rnk") == 1)
        .groupBy(
            F.col("label").alias("true_label"),
            F.col("clabel").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _ann28_sql() -> str:
    # three unrolled power iterations over the (i, j) covariance cells
    it = """
w{k} AS (
  SELECT c.i, sum(c.cv * {p}.u) AS w
  FROM cov c JOIN {p} ON {p}.i = c.j GROUP BY 1
),
n{k} AS (SELECT sqrt(sum(w * w)) AS nn FROM w{k}),
v{k} AS (SELECT i, w / nn AS u FROM w{k}, n{k}),
"""
    its = "".join(
        it.format(k=k, p=f"v{k - 1}" if k > 1 else "u0") for k in (1, 2, 3)
    ).rstrip().rstrip(",")
    return f"""
WITH comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         cast(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
mu AS (SELECT i, avg(v) AS m FROM comp GROUP BY 1),
cen AS (
  SELECT c.vec_id, c.i, c.v - mu.m AS cv
  FROM comp c JOIN mu ON mu.i = c.i
),
nv AS (SELECT count(DISTINCT vec_id) AS n FROM cen),
cov AS (
  SELECT a.i, b.i AS j, sum(a.cv * b.cv) / (any_value(nv.n) - 1) AS cv
  FROM cen a JOIN cen b ON a.vec_id = b.vec_id, nv
  GROUP BY 1, 2
),
u0 AS (SELECT DISTINCT i, 1e0 / sqrt(max(i) OVER ()) AS u FROM comp),
{its},
lam AS (
  SELECT sum(v3.u * c.cv * v3b.u) AS l
  FROM cov c JOIN v3 ON v3.i = c.i JOIN v3 v3b ON v3b.i = c.j
),
tr AS (SELECT sum(cv) AS t FROM cov WHERE i = j),
conv AS (SELECT sum(v2.u * v3.u) AS c FROM v2 JOIN v3 ON v3.i = v2.i)
SELECT cast((SELECT max(i) FROM comp) AS BIGINT) AS n_dims,
       round(lam.l, 4) AS top_eigenvalue,
       round(lam.l / tr.t, 4) AS explained_share,
       round(abs(conv.c), 4) AS convergence_cos
FROM lam, tr, conv
"""


def _ann28_cov_partials(batches):
    """Raw-moment gemm kernel for ann28 (guide §4.2): per task,
    accumulate S = sum_v x x^T (one float64 BLAS gemm per Arrow
    batch), the column sums and the row count, and emit them ONCE as
    (i, j, s) rows — d^2 cells, d sentinel rows with j=0 for the
    column sums, one (0, 0) row for the count. The old vec_id
    self-join streamed N*d^2 joined rows through codegen for the same
    arithmetic. Loud contracts, matching ``_nearest_cell_blas``:
    ragged widths and null elements raise (the exploded join form
    would silently skip null elements; the gate corpora have none,
    and silence here would corrupt the moment identity). Module-level
    so executors import it (worker reuse keeps the module warm) and
    tests drive it directly on hand-built record batches."""
    import numpy as np
    import pyarrow as pa

    S = None
    sx = None
    cnt = 0
    d = None
    for b in batches:
        if b.num_rows == 0:
            continue
        col = b.column(0)
        if col.null_count or col.values.null_count:
            raise ValueError(
                "ann28 covariance kernel: null embedding element"
            )
        off = col.offsets.to_numpy()
        widths = np.diff(off)
        if d is None:
            d = int(widths[0])
            S = np.zeros((d, d), dtype=np.float64)
            sx = np.zeros(d, dtype=np.float64)
        if (widths != d).any():
            raise ValueError(
                "ann28 covariance kernel: ragged embedding widths "
                f"(expected {d}, saw {sorted(set(widths))[:5]})"
            )
        M = np.asarray(
            col.values.to_numpy(zero_copy_only=False)[
                off[0] : off[-1]
            ],
            dtype=np.float64,
        ).reshape(-1, d)
        S += M.T @ M
        sx += M.sum(axis=0)
        cnt += M.shape[0]
    if cnt == 0:
        return
    idx = np.arange(1, d + 1, dtype=np.int64)
    ii = np.concatenate([np.repeat(idx, d), idx, [0]])
    jj = np.concatenate(
        [np.tile(idx, d), np.zeros(d, dtype=np.int64), [0]]
    )
    ss = np.concatenate([S.ravel(), sx, [float(cnt)]])
    yield pa.RecordBatch.from_arrays(
        [
            pa.array(ii, type=pa.int64()),
            pa.array(jj, type=pa.int64()),
            pa.array(ss, type=pa.float64()),
        ],
        names=["i", "j", "s"],
    )


@register("ann28_top_eigen", None, first_round=10)
def ann28_top_eigen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding space by THREE
    unrolled power iterations over the covariance matrix — the
    anisotropy audit for learned embeddings: a large explained-variance
    share on the top eigenvalue is the "rogue dimension" pathology
    (Timkey & van Schijndel 2021) that wrecks cosine retrieval, and
    watching lambda_1/trace per snapshot catches an embedder
    regression before recall metrics move. Reported: top eigenvalue,
    its share of total variance (trace), and |cos(u2, u3)| as the
    convergence certificate (=1.0000 when three iterations sufficed).

    Plan shape: the covariance build is the ONE corpus-sized stage —
    a map-only Arrow gemm kernel (one float64 ``M.T @ M`` per batch,
    the `_nearest_cell_blas` treatment applied to second moments)
    that emits dims^2 raw-moment cells + dims column sums + a count
    per task; the shuffle carries tasks x (d^2 + d + 1) rows, never
    the corpus. The old vec_id self-join form streamed N x d^2 joined
    rows through codegen for identical arithmetic (isolated sf0.1
    A/B in OPTIMIZATION_r15.md §16). Mean-centering folds in
    declaratively via the raw-moment identity
    cov = (Sxx - Sx Sx^T / cnt) / (n-1) — the exact centered sum with
    the same per-component mean, benign here because the corpus is
    near-zero-mean (mean^2/var ~ 2e-6; a mean-dominated corpus should
    center first). Every power iteration is a matrix-vector product
    ON THE 4096-CELL matrix, i.e. driver-negligible. Deterministic
    up to float summation order (which the hash-agg plan never fixed
    anyway): fixed uniform start vector, fixed iteration count — no
    randomness, so the oracle replays it exactly."""
    emb = _t(spark, sf_dir, "embeddings")
    # n and dims in ONE explode-free action over the raw table: the
    # old pair of driver actions each re-ran a corpus-sized subtree
    # (n re-built explode+mu+centering join just to distinct-count
    # ids; dims re-ran the explode for max(i)). posexplode drops null
    # AND empty embeddings, so the matching population is rows with
    # size(embedding) > 0 — identical n and dims by construction.
    # n_rows guards the kernel's duplicate-id contract below;
    # min_dims guards the MIXED-WIDTH corner (r15 ADVICE): the Arrow
    # kernel's ragged check only sees widths within one task's batch
    # stream, so a corpus whose widths differ ACROSS partitions but
    # are uniform within each task would pass the kernel and the
    # groupBy would sum mismatched partial-moment cells silently.
    # min(width) rides the same single action at zero extra cost.
    n, dims, min_dims, n_rows = emb.agg(
        F.count_distinct(
            F.when(F.size("embedding") > 0, F.col("vec_id"))
        ),
        F.max(F.when(F.size("embedding") > 0, F.size("embedding"))),
        F.min(F.when(F.size("embedding") > 0, F.size("embedding"))),
        F.count(F.when(F.size("embedding") > 0, F.lit(1))),
    ).first()
    if n != n_rows:
        raise ValueError(
            "ann28 covariance kernel: duplicate vec_id rows "
            f"({n_rows} rows, {n} distinct ids) — the gemm form sums "
            "each row once, while the old vec_id self-join would "
            "cross-pair duplicates; dedup the input first"
        )
    if n_rows and min_dims != dims:
        raise ValueError(
            "ann28 covariance kernel: mixed embedding widths across "
            f"the corpus (min {min_dims}, max {dims}) — partial "
            "moments of different dimensionality cannot be summed; "
            "pad or filter the input to one width first"
        )

    vecs = emb.filter(F.size("embedding") > 0).select(
        F.transform(
            F.col("embedding"), lambda x: x.cast("double")
        ).alias("e")
    )
    sums = (
        vecs.mapInArrow(
            _ann28_cov_partials, "i bigint, j bigint, s double"
        )
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )
    # cov_ij = (Sxx_ij - Sx_i*Sx_j/cnt) / (n-1): the raw-moment form
    # of the centered sum — exactly sum((x_i - mu_i)(x_j - mu_j)) with
    # mu = Sx/cnt, i.e. the same mu the old per-component avg computed.
    # All decode frames are <= d^2 rows; the corpus crosses the kernel
    # once and nothing corpus-sized is ever shuffled.
    tot = sums.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("s").alias("cnt")
    )
    musum = sums.filter((F.col("j") == 0) & (F.col("i") > 0))
    cov = (
        sums.filter((F.col("i") > 0) & (F.col("j") > 0))
        .join(
            F.broadcast(musum.select("i", F.col("s").alias("sxi"))),
            "i",
        )
        .join(
            F.broadcast(
                musum.select(
                    F.col("i").alias("j"), F.col("s").alias("sxj")
                )
            ),
            "j",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "i",
            "j",
            (
                (
                    F.col("s")
                    - F.col("sxi") * F.col("sxj") / F.col("cnt")
                )
                / (n - 1)
            ).alias("cv"),
        )
    )
    cov = cov.localCheckpoint(eager=False)
    u = cov.select("i").distinct().select(
        "i", F.lit(1.0 / dims ** 0.5).alias("u")
    )
    for _ in range(3):
        prev = u
        w = (
            cov.join(
                prev.select(F.col("i").alias("j"), "u"), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("cv") * F.col("u")).alias("w"))
        )
        nn = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nn"))
        u = w.crossJoin(F.broadcast(nn)).select(
            "i", (F.col("w") / F.col("nn")).alias("u")
        )
        if _ == 1:
            u2 = u.localCheckpoint(eager=False)
        u = u.localCheckpoint(eager=False)
    v3 = u
    lam = (
        cov.join(v3.select(F.col("i"), F.col("u").alias("ui")), "i")
        .join(
            v3.select(F.col("i").alias("j"), F.col("u").alias("uj")), "j"
        )
        .agg(F.sum(F.col("ui") * F.col("cv") * F.col("uj")).alias("l"))
    )
    tr = cov.filter(F.col("i") == F.col("j")).agg(
        F.sum("cv").alias("t")
    )
    conv = (
        u2.select("i", F.col("u").alias("u2"))
        .join(v3.select("i", F.col("u").alias("u3")), "i")
        .agg(F.abs(F.sum(F.col("u2") * F.col("u3"))).alias("c"))
    )
    return (
        lam.crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(conv))
        .select(
            F.lit(dims).cast("bigint").alias("n_dims"),
            F.round("l", 4).alias("top_eigenvalue"),
            F.round(F.col("l") / F.col("t"), 4).alias("explained_share"),
            F.round("c", 4).alias("convergence_cos"),
        )
    )


REGISTRY["ann28_top_eigen"].sql = _ann28_sql()


_ANN29_POOL = 50  # candidate pool reranked for diversity
_ANN29_K = 10
_ANN29_LAMBDA = 0.7  # relevance weight; 1-lambda penalizes redundancy


def _ann29_sql() -> str:
    """Greedy MMR unrolled: sel{i} CTEs accumulate the selected set,
    pick{i} CTEs take the argmax of lambda*rel - (1-lambda)*max-sim-to-
    selected over the remaining pool; both engines compare the SAME
    round(6) relevance/similarity values so the argmax is stable."""
    lam, mu = _ANN29_LAMBDA, round(1 - _ANN29_LAMBDA, 10)
    head = f"""
WITH comp AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         cast(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
q AS MATERIALIZED (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
cos AS (
  SELECT c.vec_id,
         round(sum(c.v * q.qv)
               / (sqrt(sum(c.v * c.v))
                  * sqrt((SELECT sum(qv * qv) FROM q))), 6) AS rel
  FROM comp c JOIN q ON q.i = c.i
  WHERE c.vec_id <> 0 GROUP BY 1
),
pool AS MATERIALIZED (
  SELECT vec_id, rel FROM cos
  ORDER BY rel DESC, vec_id LIMIT {_ANN29_POOL}
),
norms AS (
  SELECT c.vec_id, sqrt(sum(c.v * c.v)) AS nrm
  FROM comp c JOIN pool p ON p.vec_id = c.vec_id GROUP BY 1
),
sims AS (
  SELECT ca.vec_id AS a, cb.vec_id AS b,
         round(sum(ca.v * cb.v) / (na.nrm * nb.nrm), 6) AS sim
  FROM comp ca
  JOIN pool pa ON pa.vec_id = ca.vec_id
  JOIN comp cb ON cb.i = ca.i
  JOIN pool pb ON pb.vec_id = cb.vec_id AND ca.vec_id < cb.vec_id
  JOIN norms na ON na.vec_id = ca.vec_id
  JOIN norms nb ON nb.vec_id = cb.vec_id
  GROUP BY 1, 2, na.nrm, nb.nrm
),
bisims AS MATERIALIZED (
  SELECT a, b, sim FROM sims
  UNION ALL SELECT b AS a, a AS b, sim FROM sims
)"""
    parts = [head]
    for i in range(1, _ANN29_K + 1):
        prev = (
            "(SELECT vec_id FROM ("
            + " UNION ALL ".join(
                f"SELECT vec_id FROM pick{j}" for j in range(1, i)
            )
            + "))"
            if i > 1
            else None
        )
        pen = (
            f"coalesce((SELECT max(s.sim) FROM bisims s "
            f"WHERE s.a = p.vec_id AND s.b IN {prev}), 0e0)"
            if prev
            else "0e0"
        )
        notin = f"AND p.vec_id NOT IN {prev}" if prev else ""
        parts.append(
            f""",
pick{i} AS MATERIALIZED (
  SELECT {i} AS rnk, p.vec_id, p.rel,
         {lam} * p.rel - {mu} * {pen} AS score
  FROM pool p WHERE 1=1 {notin}
  ORDER BY score DESC, p.vec_id LIMIT 1
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM pick{i}" for i in range(1, _ANN29_K + 1)
    )
    return (
        "".join(parts)
        + f"""
SELECT cast(rnk AS BIGINT) AS rnk, vec_id, rel,
       round(score, 4) AS mmr_score
FROM ({union})"""
    )


@register("ann29_mmr_rerank", None, first_round=11)
def ann29_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998)
    — diversity-aware top-k: from the 50-strong cosine candidate pool,
    greedily pick 10 results maximizing lambda*relevance -
    (1-lambda)*max-similarity-to-already-picked. The retrieval stack's
    answer to near-duplicate hits: ann1 returns 10 copies of the same
    cluster, MMR returns the cluster once plus nine genuinely
    different neighbors.

    Plan shape: the corpus-sized work is ann1's one-fold-per-vector
    scan + a TakeOrderedAndProject pool cut; pool pairwise cosines are
    a 50x50 broadcast self-join (pool-bounded, corpus-independent).
    The greedy selection itself is inherently sequential k-step state
    — it runs on the collected POOL-SIZED matrix (50 rel + 1225 sim
    rows, the same documented bounded-driver-state contract as the
    sequence engine's O(buckets) offsets), never on corpus data. Both
    engines compare identical round(6) scores, so the argmax chain is
    reproducible; the oracle unrolls the same greedy into 10 CTE
    steps."""
    from ..llm.similarity import cosine_expr

    emb = _t(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qrow))
        .select(
            "vec_id", "embedding",
            F.round(
                cosine_expr(F.col("embedding"), F.col("qe")), 6
            ).alias("rel"),
        )
    )
    pool = scored.orderBy(F.col("rel").desc(), "vec_id").limit(_ANN29_POOL)
    a = pool.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    b = pool.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb")
    )
    sims_df = (
        a.join(F.broadcast(b), F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.round(cosine_expr(F.col("ea"), F.col("eb")), 6).alias("sim"),
        )
    )
    rel = {
        r["vec_id"]: r["rel"] for r in pool.select("vec_id", "rel").collect()
    }
    sim: dict[tuple, float] = {}
    for r in sims_df.collect():
        sim[(r["a"], r["b"])] = r["sim"]
        sim[(r["b"], r["a"])] = r["sim"]
    lam, mu = _ANN29_LAMBDA, round(1 - _ANN29_LAMBDA, 10)
    selected: list[tuple] = []
    remaining = dict(rel)
    while len(selected) < _ANN29_K and remaining:
        best_id, best_score = None, None
        for vid in sorted(remaining):
            pen = max(
                (sim[(vid, s)] for s, *_ in selected), default=0.0
            )
            score = lam * remaining[vid] - mu * pen
            if best_score is None or score > best_score:
                best_id, best_score = vid, score
        selected.append((best_id, rel[best_id], best_score))
        del remaining[best_id]
    rows = [
        (i + 1, vid, rv, round(sc, 4))
        for i, (vid, rv, sc) in enumerate(selected)
    ]
    return spark.createDataFrame(
        rows, "rnk bigint, vec_id bigint, rel double, mmr_score double"
    )


REGISTRY["ann29_mmr_rerank"].sql = _ann29_sql()


_ANN30_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
kk AS (
  SELECT greatest(4, ceil(count(DISTINCT vec_id) / 500.0)) AS k FROM comp
),
cent0 AS (
  SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k
),
{_kmeans_iter_sql('cent0', 1)},
{_kmeans_iter_sql('cent1', 2)},
{_kmeans_iter_sql('cent2', 3)},
asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
norms AS (SELECT vec_id, sqrt(sum(v*v)) AS norm FROM comp GROUP BY vec_id),
cand AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id <> y.vec_id
),
dots AS (
  SELECT c.a, c.b, sum(ca.v * cb.v) AS dot
  FROM cand c
  JOIN comp ca ON ca.vec_id = c.a
  JOIN comp cb ON cb.vec_id = c.b AND cb.i = ca.i
  GROUP BY 1, 2
),
scored AS (
  SELECT dots.a, dots.b, round(dot / (na.norm * nb.norm), 4) AS cosine
  FROM dots
  JOIN norms na ON na.vec_id = dots.a
  JOIN norms nb ON nb.vec_id = dots.b
  WHERE na.norm > 0 AND nb.norm > 0
),
top3 AS (
  SELECT a, b FROM scored
  QUALIFY row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) <= 3
),
votes AS (
  SELECT t.a AS vec_id, e.label AS nb_label, count(*) AS c
  FROM top3 t JOIN embeddings e ON e.vec_id = t.b
  GROUP BY 1, 2
),
pred AS (
  SELECT vec_id, nb_label AS pred_label FROM votes
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, nb_label) = 1
)
SELECT e.label,
       cast(count(*) AS BIGINT) AS n_vecs,
       cast(sum(CASE WHEN p.pred_label = e.label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       round(avg(CASE WHEN p.pred_label = e.label THEN 1.0 ELSE 0.0 END), 4)
         AS accuracy
FROM pred p JOIN embeddings e ON e.vec_id = p.vec_id
GROUP BY 1
"""


@register("ann30_knn_label_accuracy", _ANN30_SQL, first_round=13)
def ann30_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality PROBE: leave-one-out kNN label accuracy — for
    every vector, predict its label by majority vote of its top-3
    cosine neighbors (itself excluded) and score the prediction
    against the vector's own label, reported per label. The standard
    cheap answer to "are these embeddings good enough to curate
    with?": high kNN accuracy means the space separates the classes
    that downstream near-dup/clustering decisions rely on; a label
    whose accuracy collapses is one the space cannot see (compare
    ann26's centroid view — a class can be centroid-separated yet
    locally entangled, which is exactly what a vote over NEAREST
    neighbors detects and a centroid cannot). Vote ties break to the
    smallest label; the neighbor set is ann5's (cell-local, 4-dp
    cosine, id tie-break) so both engines rank identically.

    Plan shape: shares ann5's scale contract verbatim — corpus-derived
    k-means cells (k = N / 500, cells ~500 vectors at any corpus size)
    bound the pairwise work, one BLAS gram per cell via applyInPandas,
    a per-vector top-3 window — then adds only label-sized joins and a
    |labels|-row aggregate. Vectors with no in-cell neighbor (zero
    norm or singleton cell) are not scored, identically in both
    engines (inner joins end-to-end)."""
    from ..llm.similarity import _gram_topk_fn, derived_k_init, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    _, assign = kmeans_fit(
        emb, "vec_id", "embedding", iters=2, materialize=True,
        init=derived_k_init(emb, "vec_id", "embedding"),
    )
    vecs = assign.join(emb.select("vec_id", "embedding"), "vec_id").select(
        F.col("vec_id").alias("__id"), "cell", F.col("embedding").alias("__v")
    )
    # top-3 ranked inside the gram kernel (the cell is the candidate
    # set) — same rewrite as ann5; see _gram_topk_fn. Id type follows
    # the input id column (r13 advice)
    id_t = emb.schema["vec_id"].dataType.simpleString()
    top3 = vecs.groupBy("cell").applyInPandas(
        _gram_topk_fn(3), schema=f"a {id_t}, b {id_t}, cosine double, rnk int"
    )
    labels = emb.select("vec_id", "label")
    votes = (
        top3.join(labels.withColumnRenamed("vec_id", "b"), "b")
        .groupBy(F.col("a").alias("vec_id"), F.col("label").alias("nb_label"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vw = Window.partitionBy("vec_id").orderBy(F.col("c").desc(), "nb_label")
    pred = (
        votes.withColumn("rn", F.row_number().over(vw))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("nb_label").alias("pred_label"))
    )
    hit = F.when(F.col("pred_label") == F.col("label"), 1).otherwise(0)
    return (
        pred.join(labels, "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(hit).cast("bigint").alias("n_correct"),
            F.round(F.avg(hit), 4).alias("accuracy"),
        )
    )


_ANN31_SQL = f"""
WITH comp AS ({_DUCK_COMP}),
kk AS (
  SELECT greatest(4, ceil(count(DISTINCT vec_id) / 500.0)) AS k FROM comp
),
cent0 AS (SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k),
{_KMEANS_CHAINS}
asg AS (SELECT vec_id, cell FROM assign3 WHERE rn = 1),
d2 AS (
  SELECT comp.vec_id, asg.cell,
         sum((comp.v - c.v) * (comp.v - c.v)) AS sqd
  FROM comp
  JOIN asg ON asg.vec_id = comp.vec_id
  JOIN cent2 c ON c.cell = asg.cell AND c.i = comp.i
  GROUP BY 1, 2
),
norms AS (
  SELECT cell, round(sqrt(sum(v * v)), 4) AS centroid_norm
  FROM cent2 GROUP BY 1
)
SELECT d2.cell, count(*) AS n_members,
       round(avg(sqd), 4) AS avg_sq_dist,
       norms.centroid_norm
FROM d2 JOIN norms ON norms.cell = d2.cell
GROUP BY d2.cell, norms.centroid_norm
"""


@register("ann31_index_build_stats", _ANN31_SQL, first_round=14)
def ann31_index_build_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-build QUALITY report for the persisted IVF-PQ index —
    the number an operator reads before trusting a fresh (or drifted)
    index: per coarse cell, its member count, its mean squared L2
    distance to the trained centroid (the coarse quantization error —
    the quantity Lloyd iterations minimize and the recall/cost dial
    nprobe trades against), and the centroid norm. Balanced counts +
    uniform error = a healthy derived-k build; a fat cell with high
    error is exactly where filtered/probed recall collapses first
    (ann13 says WHEN to retrain from drift; this says WHERE the index
    is weak). Gates round 14's derived coarse cell count end-to-end:
    the Spark side reads the CACHED persisted index (same build
    ann11/ann14/ann15/ann17/ann18 serve from — build-once, stats are
    an index read, not a retrain), and the oracle replays the full
    derived-k training (kk CTE + three Lloyd chains) plus the same
    per-cell algebra — stored == retrained, ann11's contract.
    Reference-analog: the post-load count/health reconciliation of
    src/load.py:210-258 applied to index state.

    Plan shape: the stats pass is one (cell, i)-keyed broadcast join
    of the k x d centroid table against the member components + two
    keyed aggregates — linear in corpus, never pairwise; at 100 TB it
    rides the same scan the encode pass already pays."""
    from ..llm.similarity import _components

    emb = _t(spark, sf_dir, "embeddings")
    cent, assign, _codes, _ca, _cb = _cached_ivfpq_index(spark, sf_dir, emb)
    comp = _components(emb, "vec_id", "embedding")
    cdf = cent.select("cell", "i", F.col("v").alias("cv"))
    sqd = (
        comp.join(assign, "vec_id")
        .join(F.broadcast(cdf), ["cell", "i"])
        .groupBy("vec_id", "cell")
        .agg(F.sum((F.col("v") - F.col("cv")) ** 2).alias("sqd"))
    )
    norms = cent.groupBy("cell").agg(
        F.round(F.sqrt(F.sum(F.col("v") * F.col("v"))), 4).alias(
            "centroid_norm"
        )
    )
    return (
        sqd.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.round(F.avg("sqd"), 4).alias("avg_sq_dist"),
        )
        .join(norms, "cell")
        .select("cell", "n_members", "avg_sq_dist", "centroid_norm")
    )


def _ann32_sql() -> str:
    # ann11's per-subspace PQ training chains (the EXACT trainers the
    # persisted index stores), then the distortion algebra: for every
    # vector, the squared L2 between its subspace slice and its
    # assigned codeword, averaged per (subspace, code).
    sub = []
    for sfx, cond in (("a", "i <= d2"), ("b", "i > d2")):
        sub.append(f"""
    comp{sfx} AS (SELECT comp.vec_id, comp.i, comp.v FROM comp, dhalf WHERE {cond}),
    cent0{sfx} AS (SELECT vec_id AS cell, i, v FROM comp{sfx} WHERE vec_id < 16),
    {_pq_iter_sql(f'cent0{sfx}', 1, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent1{sfx}', 2, f'comp{sfx}', sfx)},
    {_pq_iter_sql(f'cent2{sfx}', 3, f'comp{sfx}', sfx)},
    code{sfx} AS (SELECT vec_id, cell FROM assign3{sfx} WHERE rn = 1),
    err{sfx} AS (
      SELECT code{sfx}.cell AS code, comp{sfx}.vec_id,
             sum((comp{sfx}.v - c.v) * (comp{sfx}.v - c.v)) AS sqe
      FROM comp{sfx}
      JOIN code{sfx} ON code{sfx}.vec_id = comp{sfx}.vec_id
      JOIN cent2{sfx} c ON c.cell = code{sfx}.cell AND c.i = comp{sfx}.i
      GROUP BY 1, 2
    )""")
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    dhalf AS (SELECT cast(floor(max(i) / 2.0) AS INT) AS d2 FROM comp),
    {','.join(sub)},
    err AS (
      SELECT 'a' AS subspace, code, sqe FROM erra
      UNION ALL
      SELECT 'b' AS subspace, code, sqe FROM errb
    )
    SELECT subspace, cast(code AS BIGINT) AS code,
           cast(count(*) AS BIGINT) AS n_vectors,
           round(avg(sqe), 4) AS mse
    FROM err GROUP BY 1, 2
    """


@register("ann32_pq_distortion", _ann32_sql(), first_round=14)
def ann32_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ half of the index-quality pair (ann31 reports the coarse
    quantizer; this reports the PRODUCT quantizer): per (subspace,
    code), how many vectors encode to that codeword and the mean
    squared L2 between their subspace slice and the codeword — the
    quantization distortion that bounds PQ ranking error (Jégou et
    al. 2011: asymmetric-distance error is the codeword residual), so
    it is the number that says whether a recall regression (ann6,
    ann17) is the COARSE cells' fault or the codebook's. A code
    hoarding most vectors at high mse means the codebook under-fits
    its subspace — retrain with more iterations or codes; balanced
    low-mse codes certify the stored index. Reads the SAME cached
    persisted index ann11/ann31 serve from (codes + both codebooks,
    zero in-plan training); the oracle replays the deterministic
    per-subspace trainings from scratch — stored == retrained.

    Plan shape: two (cell, i)-keyed broadcast joins of the tiny
    codebook tables against the coded components + keyed aggregates —
    linear in corpus, the stats ride the same scan the encode pass
    pays. Output: |2 x n_codes| rows."""
    from ..llm.similarity import _components

    emb = _t(spark, sf_dir, "embeddings")
    _cent, _assign, codes, ca, cb = _cached_ivfpq_index(spark, sf_dir, emb)
    comp = _components(emb, "vec_id", "embedding")
    outs = []
    for label, code_col, cdf in (("a", "code0", ca), ("b", "code1", cb)):
        c = cdf.select("cell", "i", F.col("v").alias("cv"))
        sqe = (
            comp.join(
                codes.select("vec_id", F.col(code_col).alias("cell")),
                "vec_id",
            )
            .join(F.broadcast(c), ["cell", "i"])  # inner join keeps the
            # codebook's own component range — no explicit d2 split
            .groupBy("vec_id", "cell")
            .agg(F.sum((F.col("v") - F.col("cv")) ** 2).alias("sqe"))
        )
        outs.append(
            sqe.groupBy("cell")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
                F.round(F.avg("sqe"), 4).alias("mse"),
            )
            .select(
                F.lit(label).alias("subspace"),
                F.col("cell").cast("bigint").alias("code"),
                "n_vectors",
                "mse",
            )
        )
    return outs[0].unionByName(outs[1])


def _tl_local_iter_sql(
    prev: str, it: int, comp: str = "comp", sup: str = "sassign",
    pfx: str = "l",
) -> str:
    """One PER-SUPER Lloyd iteration for the two-level quantizer: each
    vector scores only against ITS super's current cells (join through
    the ``sup`` (vec_id, sc) CTE), ties to the smallest cell id; the
    update averages members per (cell, i), and cells that lose every
    member drop out — the exact semantics of two_level_kmeans' in-task
    numpy loop. ``comp`` parameterizes the component CTE (ann34 trains
    over the base split only); ``sup``/``pfx`` let a second chain run
    in the same WITH body (ann38's partial refresh re-trains the
    flagged supers' GROWN member sets as a g-prefixed chain)."""
    return f"""
    {pfx}assign{it} AS (
      SELECT sa.vec_id, c.cell,
             row_number() OVER (
               PARTITION BY sa.vec_id
               ORDER BY sum(({comp}.v - c.v) * ({comp}.v - c.v)), c.cell
             ) AS rn
      FROM {sup} sa
      JOIN {comp} ON {comp}.vec_id = sa.vec_id
      JOIN {prev} c ON c.sc = sa.sc AND c.i = {comp}.i
      GROUP BY sa.vec_id, c.cell
    ),
    {pfx}cent{it} AS (
      SELECT sa.sc, a.cell, {comp}.i, avg({comp}.v) AS v
      FROM {pfx}assign{it} a
      JOIN {sup} sa ON sa.vec_id = a.vec_id
      JOIN {comp} ON {comp}.vec_id = a.vec_id
      WHERE a.rn = 1
      GROUP BY 1, 2, 3
    )"""


def _ann33_sql() -> str:
    # gate-SF parameters: per_super_vec=125 (k1 = max(4, ceil(N/125))
    # supers), per_cell=25 (k2_s = least(n_s, max(2, ceil(n_s/25)))
    # cells inside each super), 2 Lloyd iterations at both levels.
    # Level 1 is the standard derived-k chain (kk/cent0/_KMEANS_CHAINS
    # with assign3 = final assignment vs cent2); level 2 seeds each
    # super's cells from its k2_s smallest member ids and iterates
    # per-super (see _tl_local_iter_sql).
    return f"""
    WITH comp AS ({_DUCK_COMP}),
    kk AS (
      SELECT greatest(4, ceil(count(DISTINCT vec_id) / 125.0)) AS k FROM comp
    ),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k),
    {_KMEANS_CHAINS}
    sassign AS (SELECT vec_id, cell AS sc FROM assign3 WHERE rn = 1),
    szs AS (
      SELECT sc, least(count(*), greatest(2, ceil(count(*) / 25.0))) AS k2
      FROM sassign GROUP BY 1
    ),
    seedrank AS (
      SELECT sc, vec_id,
             row_number() OVER (PARTITION BY sc ORDER BY vec_id) AS rnk
      FROM sassign
    ),
    lcent0 AS (
      SELECT s.sc, s.vec_id AS cell, comp.i, comp.v
      FROM seedrank s
      JOIN szs USING (sc)
      JOIN comp ON comp.vec_id = s.vec_id
      WHERE s.rnk <= szs.k2
    ),
    {_tl_local_iter_sql('lcent0', 1)},
    {_tl_local_iter_sql('lcent1', 2)},
    {_tl_local_iter_sql('lcent2', 3)}
    SELECT sa.vec_id, sa.sc AS super_cell, a.cell
    FROM lassign3 a JOIN sassign sa USING (vec_id)
    WHERE a.rn = 1
    ORDER BY sa.vec_id
    """


@register("ann33_two_level_assign", _ann33_sql(), first_round=15)
def ann33_two_level_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (cells-of-cells) coarse quantization of the whole
    corpus — the FAISS-style hierarchical IVF that keeps CENTROID
    STATE BOUNDED at any corpus size (r14 verdict #2): the derived-k
    single-level rule grows its k x d broadcast table linearly with N
    (~205 MB at 2e8 vectors, d=64; the kernels now fail loudly past
    a 256 MB envelope), while here the only broadcast is the k1 x d
    SUPER table (k1 ~ N/250k in production — ~20 MB at 1e10 vectors)
    and each super's cells are trained locally inside one
    applyInPandas task over its ~bounded member set, so the full cell
    table never exists in one place (llm.similarity.two_level_kmeans;
    reference parity: the reference has no ANN surface — this extends
    the engine's LLM-pipeline family; envelope arithmetic in SCALE.md
    "Broadcast centroid envelope").

    Output: (vec_id, super_cell, cell) for every vector — the
    hierarchical assignment (nearest cell WITHIN the nearest super).
    Gate-SF parameters make the tree non-trivial at 500 vectors:
    4+ supers of ~125 members, ~5 cells each. The oracle replays both
    levels: the standard derived-k Lloyd chain for supers, then the
    per-super seeded local Lloyd (smallest-k2_s-member-ids seed, two
    iterations, final per-super argmin with dist-then-cell
    tie-break)."""
    from ..llm.similarity import two_level_kmeans

    emb = _t(spark, sf_dir, "embeddings")
    _, assign = two_level_kmeans(
        emb,
        per_super_vec=125,
        per_cell=25,
        super_floor=4,
        cell_floor=2,
        iters=2,
    )
    return assign.orderBy("vec_id")


def _two_level_grow_ctes() -> str:
    """Shared oracle CTE body for the grown two-level index (ann34/
    ann37/ann38) — ann12's base/delta split (vec_id % 5) applied to
    the two-level layout: train both levels on BASE only (the same
    chains as ann33 but over the base CTE), derive the STORED
    serve-time cell table lcent3 (member means under the FINAL
    training assignment — the table build_two_level_index persists via
    two_level_cells), then serve the delta: dsup = stage-1 argmin over
    the stored super table cent2, ds2 = stage-2 argmin over the chosen
    super's lcent3 cells. Ends with basemap/deltamap — the grown
    index's per-vector (vec_id, sc, cell) rows."""
    return f"""
    comp AS ({_DUCK_COMP}),
    base AS (SELECT * FROM comp WHERE vec_id % 5 <> 4),
    kk AS (
      SELECT greatest(4, ceil(count(DISTINCT vec_id) / 125.0)) AS k FROM base
    ),
    cent0 AS (SELECT vec_id AS cell, i, v FROM base, kk WHERE vec_id < kk.k),
    {_pq_iter_sql('cent0', 1, 'base', '')},
    {_pq_iter_sql('cent1', 2, 'base', '')},
    {_pq_iter_sql('cent2', 3, 'base', '')},
    sassign AS MATERIALIZED (SELECT vec_id, cell AS sc FROM assign3 WHERE rn = 1),
    szs AS (
      SELECT sc, least(count(*), greatest(2, ceil(count(*) / 25.0))) AS k2
      FROM sassign GROUP BY 1
    ),
    seedrank AS (
      SELECT sc, vec_id,
             row_number() OVER (PARTITION BY sc ORDER BY vec_id) AS rnk
      FROM sassign
    ),
    lcent0 AS (
      SELECT s.sc, s.vec_id AS cell, base.i, base.v
      FROM seedrank s
      JOIN szs USING (sc)
      JOIN base ON base.vec_id = s.vec_id
      WHERE s.rnk <= szs.k2
    ),
    {_tl_local_iter_sql('lcent0', 1, 'base')},
    {_tl_local_iter_sql('lcent1', 2, 'base')},
    {_tl_local_iter_sql('lcent2', 3, 'base')},
    delta AS (SELECT * FROM comp WHERE vec_id % 5 = 4),
    ds1 AS (
      SELECT d.vec_id, c.cell AS sc,
             row_number() OVER (
               PARTITION BY d.vec_id
               ORDER BY sum((d.v - c.v) * (d.v - c.v)), c.cell
             ) AS rn
      FROM delta d JOIN cent2 c ON d.i = c.i
      GROUP BY d.vec_id, c.cell
    ),
    dsup AS MATERIALIZED (SELECT vec_id, sc FROM ds1 WHERE rn = 1),
    ds2 AS (
      SELECT d.vec_id, c.cell,
             row_number() OVER (
               PARTITION BY d.vec_id
               ORDER BY sum((d.v - c.v) * (d.v - c.v)), c.cell
             ) AS rn
      FROM dsup ds
      JOIN delta d ON d.vec_id = ds.vec_id
      JOIN lcent3 c ON c.sc = ds.sc AND c.i = d.i
      GROUP BY d.vec_id, c.cell
    ),
    basemap AS MATERIALIZED (
      SELECT a.vec_id, sa.sc, a.cell
      FROM lassign3 a JOIN sassign sa USING (vec_id)
      WHERE a.rn = 1
    ),
    deltamap AS MATERIALIZED (
      SELECT ds.vec_id, ds.sc, a.cell
      FROM ds2 a JOIN dsup ds USING (vec_id)
      WHERE a.rn = 1
    )"""


def _ann34_sql() -> str:
    return f"""
    WITH {_two_level_grow_ctes()}
    SELECT vec_id, sc AS super_cell, cell
    FROM deltamap
    ORDER BY vec_id
    """


@register("ann34_two_level_serve", _ann34_sql(), first_round=15)
def ann34_two_level_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVE/GROW path of the two-level index (completing ann33's
    build half the way ann12 completes ann11's): new vectors (the
    vec_id % 5 == 4 delta, ann12's split) are assigned against a
    STORED two-level clustering without re-training and without any
    corpus-sized broadcast — stage 1 probes the k1 x d super table
    (the only broadcast, ~20 MB at 1e10 vectors in production),
    stage 2 cogroups each delta vector with ONLY its super's cell
    centroids inside one applyInPandas task
    (llm.similarity.two_level_serve_assign). In production the base
    clustering is a parquet read of build_two_level_index's three
    tables; here it is trained in-plan so the DuckDB oracle can
    replay the whole path (ann12's precedent) — stored == in-plan is
    pinned by test_two_level_index_roundtrip. The served cell table
    is two_level_cells' member means under the final training
    assignment (the oracle's lcent3), the exact table the build
    persists. Output: (vec_id, super_cell, cell) per delta vector."""
    from ..llm.similarity import (
        two_level_cells,
        two_level_kmeans,
        two_level_serve_assign,
    )

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    sup_cent, assign = two_level_kmeans(
        base,
        per_super_vec=125,
        per_cell=25,
        super_floor=4,
        cell_floor=2,
        iters=2,
    )
    assign = assign.localCheckpoint(eager=True)
    cells = two_level_cells(assign, base)
    return two_level_serve_assign(delta, sup_cent, cells).orderBy("vec_id")


def _two_level_index_dir(sf_dir: str) -> str:
    """Cache location for the persisted two-level index over this
    sf_dir's embeddings — same keying discipline as
    :func:`_ivfpq_index_dir` (file identity + parameter version)."""
    import hashlib
    import os
    import tempfile

    p = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(p)
    key = hashlib.md5(
        f"{os.path.realpath(p)}|{st.st_mtime_ns}|{st.st_size}"
        f"|tl125x25_v1".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_twolevel_{key}")


def _cached_two_level_index(spark: SparkSession, sf_dir: str, emb: DataFrame):
    """Build-once/serve-many for the two-level index queries: the
    three tables of build_two_level_index over this sf_dir's FULL
    embeddings (gate parameters), built on first use, promoted
    atomically, deterministic — so stored == retrained and the DuckDB
    oracle replaying the training verifies a query served from this
    cache (ann11's pattern applied to the two-level layout)."""
    import os
    import shutil

    from ..llm.similarity import (
        build_two_level_index,
        read_two_level_index,
    )

    idx_dir = _two_level_index_dir(sf_dir)
    if not os.path.isdir(idx_dir):
        staging = f"{idx_dir}.build_{os.getpid()}"
        build_two_level_index(
            emb, staging, per_super_vec=125, per_cell=25, super_floor=4,
            cell_floor=2, iters=2,
        )
        try:
            os.rename(staging, idx_dir)  # atomic promote
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
    return read_two_level_index(spark, idx_dir)


def _two_level_search_ctes() -> str:
    """Shared oracle CTE body for the two-level tree search (ann35/
    ann36): replay ann33's full-corpus two-level training (supers
    cent2, stored cells lcent3 = member means under the final
    assignment lassign3 — the exact tables build_two_level_index
    persists), then the tree probe: 2 supers, 3 cells, the probed
    members' exact-cosine scores in ``dots``/``qn``."""
    return f"""
    comp AS ({_DUCK_COMP}),
    kk AS (
      SELECT greatest(4, ceil(count(DISTINCT vec_id) / 125.0)) AS k FROM comp
    ),
    cent0 AS (SELECT vec_id AS cell, i, v FROM comp, kk WHERE vec_id < kk.k),
    {_KMEANS_CHAINS}
    sassign AS (SELECT vec_id, cell AS sc FROM assign3 WHERE rn = 1),
    szs AS (
      SELECT sc, least(count(*), greatest(2, ceil(count(*) / 25.0))) AS k2
      FROM sassign GROUP BY 1
    ),
    seedrank AS (
      SELECT sc, vec_id,
             row_number() OVER (PARTITION BY sc ORDER BY vec_id) AS rnk
      FROM sassign
    ),
    lcent0 AS (
      SELECT s.sc, s.vec_id AS cell, comp.i, comp.v
      FROM seedrank s
      JOIN szs USING (sc)
      JOIN comp ON comp.vec_id = s.vec_id
      WHERE s.rnk <= szs.k2
    ),
    {_tl_local_iter_sql('lcent0', 1)},
    {_tl_local_iter_sql('lcent1', 2)},
    {_tl_local_iter_sql('lcent2', 3)},
    cellmap AS (
      SELECT a.vec_id, sa.sc, a.cell
      FROM lassign3 a JOIN sassign sa USING (vec_id)
      WHERE a.rn = 1
    ),
    qcomp AS (SELECT i, v AS qv FROM comp WHERE vec_id = 0),
    sprobe AS (
      SELECT c.cell AS sc
      FROM cent2 c JOIN qcomp ON c.i = qcomp.i
      GROUP BY c.cell
      ORDER BY sum((c.v - qcomp.qv) * (c.v - qcomp.qv)), c.cell
      LIMIT 2
    ),
    cprobe AS (
      SELECT l.cell
      FROM lcent3 l
      JOIN sprobe ON l.sc = sprobe.sc
      JOIN qcomp ON l.i = qcomp.i
      GROUP BY l.cell
      ORDER BY sum((l.v - qcomp.qv) * (l.v - qcomp.qv)), l.cell
      LIMIT 3
    ),
    members AS (
      SELECT m.vec_id FROM cellmap m JOIN cprobe USING (cell)
      WHERE m.vec_id <> 0
    ),
    dots AS (
      SELECT c.vec_id, sum(c.v * qcomp.qv) AS dot,
             sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qcomp ON c.i = qcomp.i
      WHERE c.vec_id IN (SELECT vec_id FROM members)
      GROUP BY 1
    ),
    qn AS (SELECT sqrt(sum(qv * qv)) AS qnorm FROM qcomp)"""


def _ann35_sql() -> str:
    return f"""
    WITH {_two_level_search_ctes()}
    SELECT d.vec_id, round(d.dot / (d.norm * qn.qnorm), 4) AS cosine
    FROM dots d, qn
    ORDER BY round(d.dot / (d.norm * qn.qnorm), 4) DESC, d.vec_id
    LIMIT 10
    """


@register("ann35_two_level_topk", _ann35_sql(), first_round=15)
def ann35_two_level_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k SEARCH through the persisted two-level index — the query
    a 1e10-vector store actually serves, completing the two-level
    lifecycle (build ann33 → grow ann34 → SEARCH): probe the k1-row
    super table for the 2 nearest supers (squared-L2, the training
    metric, so the query's own super is always probe #1), rank only
    THOSE supers' cells from the stored per-super cell table and keep
    3, semi-join the stored assignment to the probed cells for the
    member pool, exact-cosine rerank, top-10 by (4-dp cosine, id).
    State touched per query: k1 x d supers + ~2*per_super/per_cell
    cell rows + the probed members — never the full cell table, the
    property the broadcast envelope exists to protect. Serves from
    the SAME cached persisted index shape ann11 uses
    (_cached_two_level_index, built once per dataset, deterministic,
    atomically promoted); the oracle replays the full two-level
    training and the tree search from scratch — stored ==
    retrained."""
    from ..llm.similarity import cosine_expr

    emb = _t(spark, sf_dir, "embeddings")
    sup_cent, cells, assign = _cached_two_level_index(spark, sf_dir, emb)
    comp_q = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.posexplode("embedding").alias("i", "qv"))
    )
    sprobe = (
        sup_cent.join(F.broadcast(comp_q), "i")
        .groupBy("cell")
        .agg(F.sum((F.col("v") - F.col("qv")) ** 2).alias("dist"))
        .orderBy("dist", "cell")
        .limit(2)
        .select(F.col("cell").alias("super_cell"))
    )
    cprobe = (
        cells.join(F.broadcast(sprobe), "super_cell")
        .join(F.broadcast(comp_q), "i")
        .groupBy("cell")
        .agg(F.sum((F.col("v") - F.col("qv")) ** 2).alias("dist"))
        .orderBy("dist", "cell")
        .limit(3)
        .select("cell")
    )
    members = (
        assign.join(F.broadcast(cprobe), "cell")
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qv")
    )
    return (
        emb.join(members, "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                cosine_expr(F.col("embedding"), F.col("__qv")), 4
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


def _ann36_sql() -> str:
    return f"""
    WITH {_two_level_search_ctes()},
    tree AS (
      SELECT d.vec_id
      FROM dots d, qn
      ORDER BY round(d.dot / (d.norm * qn.qnorm), 4) DESC, d.vec_id
      LIMIT 10
    ),
    exactf AS (
      SELECT c.vec_id, sum(c.v * qcomp.qv) AS dot,
             sqrt(sum(c.v * c.v)) AS norm
      FROM comp c JOIN qcomp ON c.i = qcomp.i
      WHERE c.vec_id <> 0
      GROUP BY 1
    ),
    bf AS (
      SELECT e.vec_id FROM exactf e, qn
      ORDER BY round(e.dot / (e.norm * qn.qnorm), 4) DESC, e.vec_id
      LIMIT 10
    ),
    inter AS (SELECT vec_id FROM bf INTERSECT SELECT vec_id FROM tree)
    SELECT cast(10 AS BIGINT) AS k, cast(count(*) AS BIGINT) AS n_hits,
           round(count(*) / 10.0, 4) AS recall_at_k
    FROM inter
    """


@register("ann36_two_level_recall", _ann36_sql(), first_round=15)
def ann36_two_level_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RECALL CONTRACT for the two-level tree search — every
    approximation in the engine carries a measured error certificate
    (ann6/ann17/ann21 for single-level IVF, dd17/dd26 for MinHash,
    ann32 for PQ), and the two-level tree is an approximation twice
    over (a vector's true nearest cell can live in an unprobed super
    AND an unprobed cell): recall@10 of ann35's (2-super, 3-cell)
    probe against the exact brute-force top-10, one row
    (k, n_hits, recall_at_k). Same cached persisted index ann35
    serves from; the oracle replays training, tree search, AND the
    brute-force side, so the number itself is oracle-verified. A
    production operator reads this exactly like ann21's
    probe-recall curve: if tree recall decays after a refresh or a
    corpus shift, widen the probes (or re-train) before trusting
    serve results."""
    from ..llm.similarity import cosine_expr

    emb = _t(spark, sf_dir, "embeddings")
    tree = ann35_two_level_topk(spark, sf_dir).select("vec_id")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qv")
    )
    bf = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                cosine_expr(F.col("embedding"), F.col("__qv")), 4
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id")
    )
    inter = bf.join(tree, "vec_id", "left_semi")
    return inter.agg(
        F.lit(10).cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.round(F.count(F.lit(1)) / 10.0, 4).alias("recall_at_k"),
    )


_TL_WARN_RATIO = 1.02  # gate-scale drift threshold (see ann37)


def _tl_drift_ctes() -> str:
    """Super-level drift algebra over the grown two-level index
    (engine twin: llm.similarity.ivf_cell_drift at super granularity,
    warn_ratio={_TL_WARN_RATIO}): per super, base vs grown member
    counts and corpus shares; ``flags`` holds the supers whose share
    grew past the ratio (or that were empty at build time)."""
    return f"""
    db AS (SELECT sc, count(*) AS n_before FROM sassign GROUP BY 1),
    da AS (
      SELECT sc, count(*) AS n_after FROM (
        SELECT sc FROM sassign UNION ALL SELECT sc FROM dsup
      ) GROUP BY 1
    ),
    dtb AS (SELECT sum(n_before) AS tb FROM db),
    dta AS (SELECT sum(n_after) AS ta FROM da),
    drift AS (
      SELECT coalesce(db.sc, da.sc) AS sc,
             coalesce(db.n_before, 0) AS n_before,
             coalesce(da.n_after, 0) AS n_after,
             coalesce(db.n_before, 0) * 1.0 / dtb.tb AS share_b,
             coalesce(da.n_after, 0) * 1.0 / dta.ta AS share_a
      FROM db FULL JOIN da ON db.sc = da.sc, dtb, dta
    ),
    flags AS MATERIALIZED (
      SELECT sc FROM drift
      WHERE n_before = 0 OR share_a > {_TL_WARN_RATIO} * share_b
    )"""


def _ann37_sql() -> str:
    return f"""
    WITH {_two_level_grow_ctes()},
    {_tl_drift_ctes()}
    SELECT sc AS super_cell, cast(n_before AS BIGINT) AS n_before,
           cast(n_after AS BIGINT) AS n_after,
           round(share_b, 6) AS share_before,
           round(share_a, 6) AS share_after,
           (n_before = 0 OR share_a > {_TL_WARN_RATIO} * share_b)
             AS retrain
    FROM drift
    ORDER BY sc
    """


@register("ann37_two_level_drift", _ann37_sql(), first_round=15)
def ann37_two_level_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift report for the GROWN two-level index — ann13's
    maintenance signal at the tree's actionable granularity, the
    SUPER: after stage-1-assigning the delta batch (vec_id % 5 == 4)
    against the frozen super table, report per super how the corpus
    share moved and whether that super's cells warrant re-training
    (llm.similarity.ivf_cell_drift applied to the super column). The
    two-level payoff is WHERE the flag points: a flagged super is
    refreshed LOCALLY (one applyInPandas task over its grown members
    — ann38), not via a global re-cluster, so maintenance cost scales
    with drift, not corpus. warn_ratio is 1.02 here (vs the 2.0
    production default) so both flag outcomes are exercised and
    oracle-checked at every gate SF (measured share-growth spread at
    sf0.001/0.01/0.1 is 0.95-1.08). Super-count-sized output; the
    only corpus-sized work is the stage-1 assignment ann34 already
    pays."""
    from ..llm.similarity import (
        _nearest_cell_blas,
        ivf_cell_drift,
        two_level_kmeans,
    )

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    sup_cent, assign = two_level_kmeans(
        base, per_super_vec=125, per_cell=25, super_floor=4,
        cell_floor=2, iters=2,
    )
    assign = assign.localCheckpoint(eager=True)
    before = assign.select(F.col("super_cell").alias("cell"))
    d1 = _nearest_cell_blas(delta, "vec_id", "embedding", sup_cent)
    after = before.unionAll(d1.select("cell"))
    return (
        ivf_cell_drift(before, after, warn_ratio=_TL_WARN_RATIO)
        .withColumnRenamed("cell", "super_cell")
        .orderBy("super_cell")
    )


def _ann38_sql() -> str:
    return f"""
    WITH {_two_level_grow_ctes()},
    {_tl_drift_ctes()},
    gsup AS MATERIALIZED (
      SELECT vec_id, sc FROM sassign WHERE sc IN (SELECT sc FROM flags)
      UNION ALL
      SELECT vec_id, sc FROM dsup WHERE sc IN (SELECT sc FROM flags)
    ),
    gszs AS (
      SELECT sc, least(count(*), greatest(2, ceil(count(*) / 25.0))) AS k2
      FROM gsup GROUP BY 1
    ),
    gseedrank AS (
      SELECT sc, vec_id,
             row_number() OVER (PARTITION BY sc ORDER BY vec_id) AS rnk
      FROM gsup
    ),
    gcent0 AS (
      SELECT s.sc, s.vec_id AS cell, comp.i, comp.v
      FROM gseedrank s
      JOIN gszs USING (sc)
      JOIN comp ON comp.vec_id = s.vec_id
      WHERE s.rnk <= gszs.k2
    ),
    {_tl_local_iter_sql('gcent0', 1, 'comp', 'gsup', 'g')},
    {_tl_local_iter_sql('gcent1', 2, 'comp', 'gsup', 'g')},
    {_tl_local_iter_sql('gcent2', 3, 'comp', 'gsup', 'g')},
    gfinal AS (
      SELECT sa.vec_id, sa.sc, a.cell
      FROM gassign3 a JOIN gsup sa USING (vec_id)
      WHERE a.rn = 1
    ),
    kept AS (
      SELECT vec_id, sc, cell FROM basemap
      WHERE sc NOT IN (SELECT sc FROM flags)
      UNION ALL
      SELECT vec_id, sc, cell FROM deltamap
      WHERE sc NOT IN (SELECT sc FROM flags)
    ),
    refreshed AS (
      SELECT * FROM kept UNION ALL SELECT * FROM gfinal
    ),
    cellagg AS (
      SELECT sc, cell, cast(count(*) AS BIGINT) AS n_members
      FROM refreshed GROUP BY 1, 2
    ),
    cents AS (
      SELECT r.sc, r.cell, comp.i, avg(comp.v) AS v
      FROM refreshed r JOIN comp ON comp.vec_id = r.vec_id
      GROUP BY 1, 2, 3
    ),
    norms AS (
      SELECT sc, cell, round(sqrt(sum(v * v)), 4) AS centroid_norm
      FROM cents GROUP BY 1, 2
    )
    SELECT c.sc AS super_cell, c.cell, c.n_members, n.centroid_norm
    FROM cellagg c JOIN norms n USING (sc, cell)
    ORDER BY 1, 2
    """


@register("ann38_two_level_partial_refresh", _ann38_sql(), first_round=15)
def ann38_two_level_partial_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTIAL refresh of the grown two-level index — the maintenance
    step ann37's drift flags trigger, and the operation that justifies
    the tree at 100 TB: only the FLAGGED supers' cells re-train (one
    local Lloyd per flagged super over its grown member set, re-seeded
    from the grown set's smallest ids — deterministic, so the oracle
    replays it), while every unflagged super keeps its stored cells
    and assignments byte-for-byte. Maintenance cost is
    O(drifted members), never O(corpus) — the single-level refresh
    (ann16) must warm-start over the WHOLE corpus because its cells
    have no locality to scope the re-train to. Output is ann16's
    report shape on the refreshed index: per (super, cell) member
    count + centroid norm over the union of kept and re-trained
    assignments. warn_ratio 1.02 as in ann37, so at every gate SF
    some supers re-train and some keep — both arms hash-checked."""
    from ..llm.similarity import (
        _local_lloyd_assign,
        _nearest_cell_blas,
        ivf_cell_drift,
        two_level_cells,
        two_level_kmeans,
        two_level_serve_assign,
    )

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    sup_cent, assign = two_level_kmeans(
        base, per_super_vec=125, per_cell=25, super_floor=4,
        cell_floor=2, iters=2,
    )
    assign = assign.localCheckpoint(eager=True)
    # every downstream arm re-reads these small frames several times
    # (d1 feeds drift + the grown union; d2 feeds the kept union;
    # cells feeds the cogroup) — checkpoint once, or each consumer
    # re-executes the whole training lineage (sup_cent needs no pin
    # since r15: kmeans_fit returns it as a local relation)
    cells = two_level_cells(assign, base).localCheckpoint(eager=True)
    d1 = (
        _nearest_cell_blas(delta, "vec_id", "embedding", sup_cent)
        .withColumnRenamed("cell", "super_cell")
        .localCheckpoint(eager=True)
    )
    # d1 IS the serve path's stage-1 assignment (same kernel, same
    # frozen super table) — pass it through so the delta batch is not
    # kernel-scanned twice (r15 optimization, guide §2.4)
    d2 = two_level_serve_assign(
        delta, sup_cent, cells, s1=d1
    ).localCheckpoint(eager=True)
    flagged = (
        ivf_cell_drift(
            assign.select(F.col("super_cell").alias("cell")),
            assign.select(F.col("super_cell").alias("cell")).unionAll(
                d1.select(F.col("super_cell").alias("cell"))
            ),
            warn_ratio=_TL_WARN_RATIO,
        )
        .filter("retrain")
        .select(F.col("cell").alias("super_cell"))
        .localCheckpoint(eager=True)
    )
    grown_sup = assign.select("vec_id", "super_cell").unionAll(d1)
    gmembers = (
        grown_sup.join(F.broadcast(flagged), "super_cell", "left_semi")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select("vec_id", "embedding", "super_cell")
    )
    retrained = _local_lloyd_assign(
        gmembers, "vec_id", "embedding", per_cell=25, cell_floor=2, iters=2
    )
    kept = (
        assign.select("vec_id", "super_cell", "cell")
        .unionAll(d2.select("vec_id", "super_cell", "cell"))
        .join(F.broadcast(flagged), "super_cell", "left_anti")
    )
    refreshed = kept.unionByName(
        retrained.select("vec_id", "super_cell", "cell")
    ).localCheckpoint(eager=True)
    counts = refreshed.groupBy("super_cell", "cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    norms = (
        two_level_cells(refreshed, emb)
        .groupBy("super_cell", "cell")
        .agg(
            F.round(F.sqrt(F.sum(F.col("v") * F.col("v"))), 4).alias(
                "centroid_norm"
            )
        )
    )
    return (
        counts.join(norms, ["super_cell", "cell"])
        .orderBy("super_cell", "cell")
    )
