"""Similarity search over embedding columns (array<float>).

Three paths:

* **brute force** — exact cosine top-k. Expressed as a posexplode +
  sum-of-products so the arithmetic (double accumulation) is
  transparent and oracle-checkable; the same computation via
  ``F.aggregate``/``zip_with`` is provided for single-pass scoring.
* **IVF (inverted file)** — coarse quantization: assign every vector
  to its nearest centroid, search only the query's cell. At 100 TB the
  assignment is one broadcast-join pass (centroids are tiny) and the
  search prunes to ~1/n_cells of the data. Centroid *training*
  (k-means) is out of scope here — any fixed centroid set works; the
  engine takes centroids as data.
* **hyperplane-LSH pair generation** — near-dup pair mining
  (:func:`cosine_pairs`): deterministic random-hyperplane band buckets
  prune the candidate space, exact cosine scores the survivors. No
  driver collect, no table broadcast — every stage is a keyed shuffle.

Vectors are cast to double before arithmetic: float32 dot products
accumulate error engine-dependently; double agrees to ~1e-13.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float/double> columns (one-pass,
    JVM-side higher-order functions)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def _components(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, i, v) long form — the oracle-friendly dot-product layout."""
    return df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("i", "v")
    ).withColumn("v", F.col("v").cast("double"))


# Hyperplane coefficients cover component indices up to this bound; the
# coefficient table is (MAX_DIM x n_planes) doubles (~1 MB broadcast at
# 16 planes) and vectors with MORE components than this are rejected —
# a silent drop would change buckets.
LSH_MAX_DIM = 8192


def _coef_pdf(n_planes: int):
    """Memoized (LSH_MAX_DIM x n_planes) hyperplane-coefficient pandas
    frame — pure md5-derived constants, identical to the oracle's SQL
    expression ``h32(md5('rp{p}|{i}')) / 2^31 - 1`` (i 1-based)."""
    import hashlib

    import numpy as np
    import pandas as pd

    cached = _COEF_CACHE.get(n_planes)
    if cached is None:
        data = {"i": np.arange(LSH_MAX_DIM, dtype=np.int32)}
        for p in range(n_planes):
            data[f"r{p}"] = np.array(
                [
                    int(hashlib.md5(f"rp{p}|{i + 1}".encode()).hexdigest()[:8], 16)
                    / 2147483648.0
                    - 1.0
                    for i in range(LSH_MAX_DIM)
                ]
            )
        cached = _COEF_CACHE[n_planes] = pd.DataFrame(data)
    return cached


_COEF_CACHE: dict = {}


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band, bh) — random-hyperplane (SimHash-for-cosine) LSH band
    assignment. Plane coefficients are md5-derived constants
    (``h32(md5('rp{p}|{i}')) / 2^31 - 1`` per (plane, 1-based component))
    computed driver-side with hashlib for all indices up to
    :data:`LSH_MAX_DIM` — pure constants, not data — and broadcast-joined
    to the exploded components, so a SQL oracle computing the same md5
    expression gets bit-identical buckets. The projection is one groupBy
    on the id (a single shuffle); no data ever reaches the driver.

    Each band packs ``n_planes // bands`` sign bits; two vectors at
    cosine c share one bit with probability 1 - arccos(c)/pi. 4 bands of
    4 bits: recall >99.9% at c=0.9, ~39% at c=0.25 (low thresholds are
    inherently hostile to LSH — use more bands or ``allow_all_pairs``).
    """
    assert n_planes % bands == 0
    rows_per_band = n_planes // bands
    spark = df.sparkSession
    coef = spark.createDataFrame(_coef_pdf(n_planes))  # Arrow fast path
    comp = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("i", "v")
    ).withColumn("v", F.col("v").cast("double"))
    joined = comp.join(F.broadcast(coef), "i", "left")
    # components beyond LSH_MAX_DIM have no coefficient row: fail loudly
    # (assert_true is woven into the value so Catalyst can't prune it;
    # it returns NULL when the condition holds, so `when(isNull, v)` = v)
    checked_v = F.when(
        F.assert_true(
            F.col("r0").isNotNull(),
            F.lit(f"vector dimension exceeds LSH_MAX_DIM={LSH_MAX_DIM}"),
        ).isNull(),
        F.col("v"),
    )
    joined = joined.withColumn("v", checked_v)
    proj = joined.groupBy(id_col).agg(
        *[F.sum(F.col("v") * F.col(f"r{p}")).alias(f"pr{p}") for p in range(n_planes)]
    )
    bits = proj.select(
        id_col,
        *[
            F.when(F.col(f"pr{p}") >= 0, 1).otherwise(0).alias(f"b{p}")
            for p in range(n_planes)
        ],
    )
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"b{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    return bits.select(F.col(id_col), F.posexplode(band_hashes).alias("band", "bh"))


def lsh_params_for(
    min_sim: float, target_recall: float = 0.9, max_planes: int = 64
) -> tuple[int, int]:
    """(n_planes, bands) achieving >= ``target_recall`` pair recall at
    cosine ``min_sim`` — the collision formula from the dd5 docstring
    solved for the band layout instead of hand-tuned.

    A pair at cosine c agrees on one hyperplane sign bit with
    probability p = 1 - arccos(c)/pi; a band of r bits matches with
    p^r; recall over b bands is 1 - (1 - p^r)^b. More, narrower bands
    raise recall at the cost of bigger buckets, so this picks the
    LARGEST rows-per-band r (most selective buckets) whose required
    band count still fits the ``max_planes`` projection budget.

    Examples: min_sim=0.9 -> (56, 7) (8-bit bands, recall ~0.92);
    min_sim=0.25 -> (33, 11) (3-bit bands, recall ~0.91 — the default
    4x4 layout is ~39% there). Cost scales linearly: n_planes
    projections per vector, bands bucket rows per vector.
    """
    import math

    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    p = 1.0 - math.acos(max(min(min_sim, 1.0), -1.0)) / math.pi
    for r in range(8, 0, -1):
        pr = p**r
        if pr >= 1.0:
            return (r, 1)
        b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pr))
        if b * r <= max_planes:
            return (b * r, b)
    raise ValueError(
        f"no band layout within {max_planes} planes reaches recall "
        f"{target_recall} at min_sim={min_sim}; raise max_planes or use "
        "allow_all_pairs"
    )


def _gram_pair_fn(min_sim: float):
    """applyInPandas kernel: one float64 BLAS gram matrix per group over
    rows carrying (__id, __v); emits (a, b, cosine) with a < b and
    cosine >= min_sim, zero-norm vectors excluded. Shared by the LSH
    bucket scorer (:func:`cosine_pairs`) and the semantic-dedup cell
    scorer (:func:`semantic_dedup`); extra grouping columns in the
    input frame are ignored."""
    import numpy as np
    import pandas as pd

    def pair_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        ids = pdf["__id"].to_numpy()
        m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        norms = np.linalg.norm(m, axis=1)
        ok = norms > 0
        ids, m, norms = ids[ok], m[ok], norms[ok]
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        mn = m / norms[:, None]
        sims = mn @ mn.T  # one BLAS gram matrix per group
        ii, jj = np.nonzero(np.triu(sims >= min_sim, k=1))
        pa, pb = ids[ii], ids[jj]
        swap = pa > pb
        pa2 = np.where(swap, pb, pa)
        pb2 = np.where(swap, pa, pb)
        return pd.DataFrame({"a": pa2, "b": pb2, "cosine": np.round(sims[ii, jj], 4)})

    return pair_fn


def _gram_topk_fn(m: int):
    """applyInPandas kernel: per group (an IVF cell), rank every OTHER
    member as a neighbor of every member by (4-dp-rounded cosine DESC,
    id ASC) and emit only each member's top ``m`` — (a, b, cosine,
    rnk). The cell IS the candidate set for the cell-local kNN graph,
    so ranking inside the gram kernel replaces the
    every-pair-then-window form, whose mirrored pair table is
    |cell|^2-sized: at the 100x corpus (400 derived cells x ~500
    members) that was a 200M-row shuffle + sort feeding a window that
    keeps 600k rows — this kernel emits the 600k rows directly
    (measured on ann5's build, SCALE.md r13). Tie-break matches the
    window form exactly: ranking on the ROUNDED cosine (the engines'
    shared contract — ranking raw values would let sub-rounding noise
    pick different top-m sets), ties to the smaller neighbor id via
    stable lexsort. Zero-norm vectors are excluded as neighbors AND
    as query rows, like :func:`_gram_pair_fn`."""
    import numpy as np
    import pandas as pd

    empty = {"a": [], "b": [], "cosine": [], "rnk": []}

    def topk_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(empty)
        ids = pdf["__id"].to_numpy()
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        norms = np.linalg.norm(mat, axis=1)
        ok = norms > 0
        ids, mat, norms = ids[ok], mat[ok], norms[ok]
        n = len(ids)
        if n < 2:
            return pd.DataFrame(empty)
        order = np.argsort(ids)  # neighbor-id ASC for the tie-break
        ids, mat, norms = ids[order], mat[order], norms[order]
        mn = mat / norms[:, None]
        sims = np.round(mn @ mn.T, 4)
        np.fill_diagonal(sims, -np.inf)  # self is not a neighbor
        kk = min(m, n - 1)
        # per row: indices of the top-kk columns by (cosine DESC,
        # id ASC). argsort(-sims, stable) keeps ascending column
        # (= ascending id) order among equal cosines.
        top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(n), kk)
        cols = top.ravel()
        return pd.DataFrame(
            {
                "a": ids[rows],
                "b": ids[cols],
                "cosine": sims[rows, cols],
                "rnk": np.tile(np.arange(1, kk + 1), n),
            }
        )

    return topk_fn


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    max_bucket_size: int | str | None = None,
    allow_all_pairs: bool = False,
    preset: str | None = None,
    cap_floor: int = 200,
    cap_hard_max: int = 5000,
    materialize: bool = False,
) -> DataFrame:
    """(a, b, cosine) pairs with cosine >= min_sim, a < b — embedding
    near-dup detection, fully distributed.

    ``preset="high_recall"`` derives (n_planes, bands) from ``min_sim``
    via :func:`lsh_params_for` (>=90% pair recall at the threshold)
    instead of the explicit n_planes/bands — the guard against silently
    running a low threshold at the default 4x4 layout's ~39% recall.

    Default path (the 100 TB shape): hyperplane-LSH band buckets
    (:func:`hyperplane_lsh_buckets`) -> candidate pairs via a self-join
    keyed on (band, bucket) -> exact cosine per candidate with an
    Arrow-batched numpy scorer. Nothing is ever collected to the driver
    and no table is broadcast; the only shuffles are the projection
    groupBy, the bucket join, and the two id-keyed joins that fetch the
    candidate vectors. ``max_bucket_size`` drops degenerate buckets
    (same guard as MinHash-LSH).

    ``allow_all_pairs=True`` is the explicit escape hatch that scores
    every pair (exact recall, O(N^2) work — still distributed, but only
    sane for bounded inputs such as a single IVF cell).

    Zero-norm vectors are excluded (cosine undefined); ids keep their
    native type. The cosine is computed in float64 and filtered on the
    raw value; output is rounded to 4 decimals.
    """
    import numpy as np
    import pandas as pd

    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"a {id_t}, b {id_t}, cosine double"

    if allow_all_pairs:
        # exact-recall escape hatch: score every pair via a candidate
        # cross-join + row-wise vectorized scorer (O(N^2), distributed)
        ids = df.select(F.col(id_col))
        cand = (
            ids.select(F.col(id_col).alias("a"))
            .crossJoin(ids.select(F.col(id_col).alias("b")))
            .filter(F.col("a") < F.col("b"))
        )
        va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__va"))
        vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"))
        paired = cand.join(va, "a").join(vb, "b").select("a", "b", "__va", "__vb")

        def score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ma = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__va"]])
                mb = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__vb"]])
                dots = np.einsum("ij,ij->i", ma, mb)
                denom = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(denom > 0, dots / denom, np.nan)
                keep = (denom > 0) & (cos >= min_sim)
                yield pd.DataFrame(
                    {
                        "a": pdf["a"][keep],
                        "b": pdf["b"][keep],
                        "cosine": np.round(cos[keep], 4),
                    }
                )

        return paired.mapInPandas(score, schema=out_schema)

    # Bucketed default: ship each vector to its (band, bucket) groups —
    # bands x |table| rows, far less traffic than materializing candidate
    # pairs with both vectors attached — and run one BLAS gram matrix per
    # bucket (applyInPandas); group size is bounded by the bucket
    # population (cap degenerate ones with max_bucket_size; "auto"
    # derives the cap from the bucket-size distribution — Tukey fence,
    # floor cap_floor, ceiling cap_hard_max = the gram kernel's task
    # memory bound; see llm.caps). A pair
    # sharing several buckets is scored in each; the final groupBy on
    # (a, b) dedups to one row (max over identical-input computations).
    if preset == "high_recall":
        n_planes, bands = lsh_params_for(min_sim)
    elif preset is not None:
        raise ValueError(f"unknown preset {preset!r}; use 'high_recall'")
    buckets = hyperplane_lsh_buckets(df, id_col, vec_col, n_planes, bands)
    if materialize:
        # the bucket table fans out to the cap branches + the vector
        # join; without this the n_planes-sum projection re-executes per
        # consumer. (id, band, bh) rows are tiny — cheap to pin.
        buckets = buckets.localCheckpoint(eager=True)
    if max_bucket_size == "auto":
        from .caps import filter_by_derived_cap

        buckets = filter_by_derived_cap(
            buckets, ["band", "bh"], floor=cap_floor, hard_max=cap_hard_max
        )
    elif max_bucket_size is not None:
        from pyspark.sql import Window

        wb = Window.partitionBy("band", "bh")
        buckets = (
            buckets.withColumn("__bsz", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    banded_vecs = buckets.join(
        df.select(F.col(id_col), F.col(vec_col)), id_col
    ).select(F.col(id_col).alias("__id"), "band", "bh", F.col(vec_col).alias("__v"))

    scored = banded_vecs.groupBy("band", "bh").applyInPandas(
        _gram_pair_fn(min_sim), schema=out_schema
    )
    # dedup across bands; max() of computations over identical inputs
    return scored.groupBy("a", "b").agg(F.max("cosine").alias("cosine"))


def _nearest_cell(comp: DataFrame, cent: DataFrame, id_col: str) -> DataFrame:
    """(id, cell): argmin squared-L2 assignment of every vector to a
    centroid, ties broken by cell id. Centroids are k x d rows —
    broadcast; the distance agg is one keyed shuffle. Since round 14
    this JOIN form has no production caller — every corpus-sized
    assignment site (Lloyd loops, PQ encode, index coarse assign,
    incremental assign) runs the map-only broadcast BLAS kernel
    (:func:`_nearest_cell_blas`) instead, because the join builds
    n x d x k intermediate rows. It stays as the kernel's executable
    A/B twin: test_similarity pins blas == join on the engine
    fixtures, the same explicit-(v-c)^2 arithmetic every DuckDB
    oracle replays."""
    from pyspark.sql import Window

    c = cent.select("cell", "i", F.col("v").alias("cv"))
    dists = (
        comp.join(F.broadcast(c), "i")
        .groupBy(id_col, "cell")
        .agg(F.sum((F.col("v") - F.col("cv")) ** 2).alias("dist"))
    )
    w = Window.partitionBy(id_col).orderBy("dist", "cell")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "cell")
    )


_INTEGRAL_SPARK_TYPES = ("tinyint", "smallint", "int", "bigint")

# Operating envelope for the broadcast-kernel centroid table (r14
# verdict #2). The kernels below collect k x d float64 centroids to
# the driver and broadcast them to every executor; with the derived-k
# rule k ~ N/500 that is N*d/500*8 bytes — ~1 byte per corpus vector
# at d=64, i.e. ~205 MB at N=2e8 and unboundedly past that. This
# ceiling fails the build LOUDLY at the collect site (instead of an
# executor OOM mid-broadcast) and names the bounded alternative: the
# two-level quantizer (:func:`two_level_kmeans`), whose stage-1
# broadcast is k1 x d with k1 ~ N/250k (~20 MB at N=1e10) and whose
# per-super cells never leave the cluster. Arithmetic in SCALE.md
# "Broadcast centroid envelope".
_BROADCAST_CENTROID_MAX_BYTES = 256 * 2**20


def _guard_centroid_rows(rows, kernel: str) -> None:
    """Fail loudly when a collected long-form centroid table exceeds
    the broadcast envelope. ``rows`` is the collect() result: one row
    per (cell, component), 8 value-bytes each once packed."""
    if len(rows) * 8 > _BROADCAST_CENTROID_MAX_BYTES:
        raise ValueError(
            f"{kernel}: centroid table is {len(rows)} (cell, i, v) "
            f"rows (~{len(rows) * 8 / 2**20:.0f} MB packed), past the "
            f"{_BROADCAST_CENTROID_MAX_BYTES / 2**20:.0f} MB broadcast "
            f"envelope — at derived k ~ N/500 this corpus has outgrown "
            f"a single-level coarse quantizer; build a two-level index "
            f"(two_level_kmeans: bounded k1 x d stage-1 broadcast, "
            f"per-super cells stay distributed) or raise per_cell"
        )


def _np_argmin_sq_l2(M, C):
    """Row-wise argmin_j ||m - C_j||^2 over a LOCAL numpy centroid
    matrix, ties to the SMALLEST j — the in-task twin of
    :func:`_nearest_cell_blas`'s arithmetic, shared by the per-super
    local Lloyd and the cogroup serve path (r15 review: both used the
    naive (n, k, d) broadcast cube, ~16x the documented per-task
    memory bound at production parameters). Same two-tier shape as
    the kernel: a blocked gemm-identity scan (an (n_block, k_block)
    DISTANCE matrix, never a d-cube) tracking best and second-best,
    then near-tie margins re-scored with the exact explicit sum in
    (256 x 256 x d) blocks with a strict running minimum (earlier =
    smaller index wins ties, argmin-first inside a block) — so the
    result matches the oracle's explicit ``ORDER BY dist, cell`` form
    everywhere the identity could misorder."""
    import numpy as np

    n = len(M)
    # SIZE-ADAPTIVE: for small centroid tables (per-super cell counts
    # at gate parameters are ~5-20) the explicit cube is both exact
    # and cheaper than the identity machinery — and by the tolerance
    # contract the two paths return identical argmins (anything the
    # identity could misorder is re-scored with this same explicit
    # arithmetic), so the switch is invisible to results. 128 MB cube
    # budget per 8192-row block.
    if 8192 * C.size * 8 <= 128 * 2**20:
        out = np.empty(n, dtype=np.int64)
        for r0 in range(0, n, 8192):
            Mb = M[r0 : r0 + 8192]
            D = ((Mb[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            out[r0 : r0 + 8192] = D.argmin(axis=1)
        return out
    cn2 = (C * C).sum(axis=1)
    cn2_max = float(cn2.max(initial=0.0))
    out = np.empty(n, dtype=np.int64)
    for r0 in range(0, n, 8192):
        Mb = M[r0 : r0 + 8192]
        tol = _near_tie_tol(cn2_max, Mb)
        nb = len(Mb)
        best_d = np.full(nb, np.inf)
        sec_d = np.full(nb, np.inf)
        best_j = np.zeros(nb, dtype=np.int64)
        rows_idx = np.arange(nb)
        for j0 in range(0, len(C), 8192):
            Cc = C[j0 : j0 + 8192]
            dist = cn2[j0 : j0 + 8192][None, :] - 2.0 * (Mb @ Cc.T)
            jmin = dist.argmin(axis=1)
            dmin = dist[rows_idx, jmin]
            if dist.shape[1] >= 2:
                d2b = np.partition(dist, 1, axis=1)[:, 1]
            else:
                d2b = np.full(nb, np.inf)
            take = dmin < best_d
            sec_d = np.where(
                take, np.minimum(best_d, d2b), np.minimum(sec_d, dmin)
            )
            best_j = np.where(take, jmin + j0, best_j)
            best_d = np.where(take, dmin, best_d)
        flagged = (sec_d - best_d) <= tol
        if flagged.any():
            fi = np.flatnonzero(flagged)
            best_j[fi] = _np_exact_argmin_blocked(Mb[fi], C)
        out[r0 : r0 + 8192] = best_j
    return out


def _np_exact_argmin_blocked(R, C):
    """Exact explicit-sum argmin for the near-tie re-score, blocked
    (256 rows x 256 centroids x d per cube, ~33 MB at d=64) with a
    STRICT running minimum so the first/smallest index wins ties —
    byte-equivalent to a full ``((R[:,None]-C[None])**2).sum(2)
    .argmin(1)`` without materializing (n_flagged, k, d)."""
    import numpy as np

    out = np.empty(len(R), dtype=np.int64)
    for r0 in range(0, len(R), 256):
        Rb = R[r0 : r0 + 256]
        bd = np.full(len(Rb), np.inf)
        bj = np.zeros(len(Rb), dtype=np.int64)
        rr = np.arange(len(Rb))
        for j0 in range(0, len(C), 256):
            Eb = ((Rb[:, None, :] - C[None, j0 : j0 + 256, :]) ** 2).sum(
                axis=2
            )
            jb = Eb.argmin(axis=1)
            db = Eb[rr, jb]
            take = db < bd
            bj = np.where(take, jb + j0, bj)
            bd = np.where(take, db, bd)
        out[r0 : r0 + 256] = bj
    return out


def _near_tie_tol(cn2_max: float, M) -> float:
    """Near-tie re-score margin for the gemm-identity kernel, PER
    Arrow batch. The identity ||c||^2 - 2 v.c carries absolute float64
    error ~eps*(||c||^2 + |v.c|), and |v.c| <= ||v||*||c|| <=
    max(||v||^2, ||c||^2) — so the margin must scale with BOTH operand
    magnitudes: a centroid-only scale under-flags when vector norms
    exceed centroid norms (r14 advice: a ~1e6x norm skew puts identity
    error above a centroid-only tolerance and skips the exact
    re-score). 1e-9x the joint scale sits ~4 orders above the true
    ~1e-13x error, so anything the identity could misorder is
    re-scored exactly while random-valued data flags nothing."""
    return 1e-9 * max(
        cn2_max, float((M * M).sum(axis=1).max(initial=0.0)), 1.0
    )


def _nearest_cell_blas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cent: DataFrame,
    rows: list | None = None,
) -> DataFrame:
    """(id, cell): argmin squared-L2 assignment via ONE broadcast
    (k x d) centroid matrix and a per-batch numpy distance kernel —
    the map-only form of :func:`_nearest_cell`. The join form builds
    n x d x k intermediate rows (a 1.28B-row shuffle at the 100x
    corpus: 200k vectors x 16 dims x 400 derived cells) where the
    same arithmetic is ~1 GFLOP of BLAS; this kernel reads the vector
    table once per call and shuffles nothing (SCALE.md "r13/r14 100x"
    carries the A/B). Semantics match the join + window form:
    squared-L2 argmin, ties to the SMALLEST cell id (within a block
    np.argmin returns the first minimum over ascending cell order;
    across blocks a strict ``<`` keeps the earlier, smaller cell) —
    the oracle's ``ORDER BY dist, cell`` replayed.

    Distances are computed float64 via the gemm identity
    ||c||^2 - 2 v.c (the per-row ||v||^2 constant cannot change an
    argmin). The identity form carries absolute error ~eps*||c||^2,
    so NEAR-equidistant cells — not just exact ties — could resolve
    differently than the oracle's explicit (v-c)^2 sum (r13 advice).
    Closed here with a two-tier pass: the blocked gemm tracks the
    best AND second-best distance per vector, and any vector whose
    margin is inside a conservative tolerance (1e-9 x the distance
    scale, ~4 orders above the identity's true float64 error) is
    re-scored against ALL centroids with the explicit (v-c)^2 sum —
    the join form's exact arithmetic, argmin-first = smallest cell.
    On real-valued data the flagged set is empty and the gemm path
    decides everything; the tolerance analysis lives in SCALE.md r14.

    SUBSPACE centroid tables are supported: the kernel reads the
    table's own component range [min(i), max(i)] and scores each
    vector on that SLICE of its array — :func:`pq_train` /
    :func:`pq_encode` pass full vectors against per-subspace
    codebooks with no component explode in the assignment path.

    Contracts, all loud: the id column must be an integral Spark type
    (the output schema reuses it verbatim; a string-keyed caller
    fails at plan-construction time, not via a silent Arrow cast —
    r13 advice); vectors must be finite on the scored slice (a null
    COMPONENT becomes NaN, whose all-NaN distance row would silently
    argmin to cell 0 — ValueError instead; fully-null vectors are
    dropped like the join form drops them) and long enough to cover
    the centroid range (ragged input fails loudly; the join form
    would silently score a truncated vector on its present
    components).

    The collected centroid table is bounded state, not corpus data:
    k x d rows with k ~ N/500 (tens of MB at 2e8 vectors), the same
    O(buckets) driver-fold contract as the sequence engine.

    ``rows`` (optional) is a PRE-COLLECTED centroid row list — callers
    that already executed ``cent.collect()`` for their own purposes
    (:func:`kmeans_fit` materializes the final centroid table once and
    feeds both the returned frame and this kernel from it) pass it so
    the centroid-update plan is not executed a second time; the kernel
    arithmetic is byte-identical either way."""
    import numpy as np

    id_t = df.schema[id_col].dataType.simpleString()
    if id_t not in _INTEGRAL_SPARK_TYPES:
        raise TypeError(
            f"_nearest_cell_blas: id column {id_col!r} must be an "
            f"integral type, got {id_t!r} — the assignment schema "
            f"reuses the input id type verbatim"
        )
    if rows is None:
        rows = cent.collect()
    _guard_centroid_rows(rows, "_nearest_cell_blas")
    cells = sorted({r["cell"] for r in rows})
    cidx = {c: j for j, c in enumerate(cells)}
    lo = min(r["i"] for r in rows)
    hi = max(r["i"] for r in rows)
    C = np.zeros((len(cells), hi - lo + 1))
    for r in rows:
        C[cidx[r["cell"]], r["i"] - lo] = r["v"]
    cells_arr = np.array(cells, dtype=np.int64)
    bc = df.sparkSession.sparkContext.broadcast((C, cells_arr, lo, hi))

    def assign_batches(it):
        import pandas as pd

        Cb, cb, lo_, hi_ = bc.value
        cn2 = (Cb * Cb).sum(axis=1)
        cn2_max = float(cn2.max(initial=0.0))
        for pdf in it:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            M = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if M.ndim != 2 or M.shape[1] <= hi_:
                raise ValueError(
                    f"_nearest_cell_blas: vectors must share one "
                    f"dimensionality covering the centroid component "
                    f"range [{lo_}, {hi_}] (got batch shape {M.shape})"
                )
            M = M[:, lo_ : hi_ + 1]
            if not np.isfinite(M).all():
                raise ValueError(
                    "_nearest_cell_blas: non-finite vector component "
                    "(null/NaN inside an embedding array) — an "
                    "all-NaN distance row would silently assign to "
                    "the first cell; clean or drop the vector instead"
                )
            n = len(M)
            tol = _near_tie_tol(cn2_max, M)
            best_d = np.full(n, np.inf)
            sec_d = np.full(n, np.inf)
            best_j = np.zeros(n, dtype=np.int64)
            rows_idx = np.arange(n)
            # squared-L2 via the matmul identity, dropping the
            # per-row-constant ||v||^2 (irrelevant to argmin):
            # a TRUE BLAS gemm — the naive (M[:,None]-C[None])**2
            # broadcast materializes an (n, k, d) cube (1.3 GB per
            # 10k-row Arrow batch at k=400, d=64) and runs
            # memory-bound, which is what it replaces
            for j0 in range(0, len(cb), 8192):  # bound (n, k) blocks
                Cc = Cb[j0 : j0 + 8192]
                dist = cn2[j0 : j0 + 8192][None, :] - 2.0 * (M @ Cc.T)
                jmin = dist.argmin(axis=1)
                dmin = dist[rows_idx, jmin]
                if dist.shape[1] >= 2:
                    d2b = np.partition(dist, 1, axis=1)[:, 1]
                else:
                    d2b = np.full(n, np.inf)
                take = dmin < best_d
                # overall second-best: when the block wins, the old
                # best competes with the block's own runner-up; when
                # it loses, the block's best competes with the
                # incumbent runner-up (d2b >= dmin >= best_d there)
                sec_d = np.where(
                    take,
                    np.minimum(best_d, d2b),
                    np.minimum(sec_d, dmin),
                )
                best_j = np.where(take, jmin + j0, best_j)
                best_d = np.where(take, dmin, best_d)
            flagged = (sec_d - best_d) <= tol
            if flagged.any():
                # exact explicit-sum re-score over ALL centroids for
                # the (rare) near-tied vectors — first-min rule =
                # smallest cell, the oracle's tie-break; BLOCKED so a
                # mass-tied batch never materializes (n_flagged, k, d)
                # (r15 review)
                fi = np.flatnonzero(flagged)
                best_j[fi] = _np_exact_argmin_blocked(M[fi], Cb)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "cell": cb[best_j]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign_batches, schema=f"{id_col} {id_t}, cell bigint"
    )


def _nearest_centroid_cos_blas(
    df: DataFrame, id_col: str, vec_col: str, cent: DataFrame
) -> DataFrame:
    """(id, centroid): argmax-COSINE assignment of every vector to one
    of the ``cent`` rows ((c, i, cv) long form) — the map-only twin of
    the join + window form that used to live inside
    :func:`_ivf_cluster_members`. That join built n x d x k
    intermediate rows for the corpus-wide coarse assignment (at 2e8
    vectors x 64 dims x 8 cells: ~1e11 joined rows) where the same
    arithmetic is one gemm over unit-normalized rows; this kernel
    reads the vector table once and shuffles nothing — the cosine
    sibling of :func:`_nearest_cell_blas` (round 14, closing the last
    corpus-sized assignment join in the module).

    Semantics match the window form exactly: score = cos(v, c),
    winner by (cos DESC, c ASC). Normalization happens on the
    BROADCAST side (centroid rows to unit length) and per vector row,
    so the gemm output IS the cosine; per-row ``||v||`` cannot change
    an argmax, but normalizing both sides keeps the near-tie scale
    absolute (cosines live in [-1, 1], float64 dot error ~d*eps ~
    1e-14 — the kernel's summation-order noise class is the same one
    the engine-vs-oracle comparison already carries, unlike the L2
    kernel's gemm IDENTITY which needed the exact re-score pass).
    Zero-norm vectors and centroids fail LOUDLY: cosine is undefined
    there, and the declarative form this kernel replaces raised
    Spark's ANSI divide-by-zero for them (verified in
    test_round14_kernel.py) — silently inventing an assignment would
    CHANGE semantics, the same contract call as the L2 kernel's NaN
    guard. Integral-id and finite-component contracts as in
    :func:`_nearest_cell_blas`."""
    import numpy as np

    id_t = df.schema[id_col].dataType.simpleString()
    if id_t not in _INTEGRAL_SPARK_TYPES:
        raise TypeError(
            f"_nearest_centroid_cos_blas: id column {id_col!r} must be "
            f"an integral type, got {id_t!r}"
        )
    rows = cent.collect()
    _guard_centroid_rows(rows, "_nearest_centroid_cos_blas")
    cs = sorted({r["c"] for r in rows})
    cidx = {c: j for j, c in enumerate(cs)}
    lo = min(r["i"] for r in rows)
    hi = max(r["i"] for r in rows)
    C = np.zeros((len(cs), hi - lo + 1))
    for r in rows:
        C[cidx[r["c"]], r["i"] - lo] = r["cv"]
    cn = np.sqrt((C * C).sum(axis=1))
    if (cn == 0).any():
        bad = [cs[j] for j in np.nonzero(cn == 0)[0]]
        raise ValueError(
            f"_nearest_centroid_cos_blas: zero-norm centroid(s) {bad} — "
            f"cosine is undefined (the declarative form raises ANSI "
            f"divide-by-zero here)"
        )
    cells_arr = np.array(cs, dtype=np.int64)
    Cn = C / cn[:, None]
    bc = df.sparkSession.sparkContext.broadcast((Cn, cells_arr, lo, hi))

    def assign_batches(it):
        import pandas as pd

        Cb, cb, lo_, hi_ = bc.value
        for pdf in it:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            M = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if M.ndim != 2 or M.shape[1] <= hi_:
                raise ValueError(
                    f"_nearest_centroid_cos_blas: vectors must share one "
                    f"dimensionality covering the centroid component "
                    f"range [{lo_}, {hi_}] (got batch shape {M.shape})"
                )
            M = M[:, lo_ : hi_ + 1]
            if not np.isfinite(M).all():
                raise ValueError(
                    "_nearest_centroid_cos_blas: non-finite vector "
                    "component (null/NaN inside an embedding array)"
                )
            n = len(M)
            vn = np.sqrt((M * M).sum(axis=1))
            if (vn == 0).any():
                raise ValueError(
                    "_nearest_centroid_cos_blas: zero-norm vector — "
                    "cosine is undefined (the declarative form raises "
                    "ANSI divide-by-zero here); filter zero-norm rows "
                    "before assignment"
                )
            Mn = M / vn[:, None]
            best_s = np.full(n, -np.inf)
            best_j = np.zeros(n, dtype=np.int64)
            rows_idx = np.arange(n)
            for j0 in range(0, len(cb), 8192):
                S = Mn @ Cb[j0 : j0 + 8192].T
                jmax = S.argmax(axis=1)
                smax = S[rows_idx, jmax]
                take = smax > best_s
                best_j = np.where(take, jmax + j0, best_j)
                best_s = np.where(take, smax, best_s)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "centroid": cb[best_j]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign_batches, schema=f"{id_col} {id_t}, centroid bigint"
    )


def derived_k_init(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    floor_k: int = 4,
    per_cell: int = 500,
    comp: DataFrame | None = None,
) -> DataFrame:
    """Long-form (cell, i, v) k-means seed with the corpus-DERIVED
    cell count k = greatest(floor_k, ceil(N / per_cell)) — the
    SemDeDup sizing rule (cells of ~``per_cell`` vectors at ANY corpus
    size) the r13 100x run forced on the cell-local graph ops: a fixed
    k grows quadratic per-cell gram/Lloyd work as the corpus grows
    (ann5 at 200k vectors built 50k-vector cells and effectively
    hung). Deterministic init = vectors with id < k, the exact seed
    the fixed-k path uses; k is computed DECLARATIVELY (one count agg
    broadcast into the seed filter, no driver action), and a DuckDB
    oracle replays the derivation as the kk CTE
    (``greatest(floor_k, ceil(count(DISTINCT id)/per_cell.0))``).
    N is the DISTINCT id count over the exploded components — the
    exact population the oracle kk CTEs measure (explode drops both
    null-embedding rows AND empty arrays; DISTINCT drops duplicated
    ids), so engine and oracle derive the same k even when the raw
    table carries null/empty embeddings or duplicate ids near a
    per_cell boundary (r14 advice; empty-array case r15 review).
    Shared by ann5/ann30/x51's graph builds and the IVF-PQ index
    build's coarse quantizer (round 14). Feed to
    :func:`kmeans_fit`'s ``init=``."""
    if comp is None:
        comp = _components(df, id_col, vec_col)
    # N = DISTINCT ids with a non-null, NON-EMPTY vector — byte-for-
    # byte the population the oracle kk CTEs count over the exploded
    # components (explode drops null embeddings AND empty arrays; a
    # bare isNotNull filter still counted [] rows the oracle
    # excludes). Counted on the RAW table, not comp: the exploded
    # form is d x the rows for the same answer (measured +46% on the
    # 100x ann33 wall when this agg briefly ran over comp).
    kk = df.filter(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    ).agg(
        F.greatest(
            F.lit(floor_k).cast("bigint"),
            F.ceil(F.count_distinct(F.col(id_col)) / float(per_cell)),
        ).alias("k")
    )
    return (
        comp.crossJoin(F.broadcast(kk))
        .filter(F.col(id_col) < F.col("k"))
        .select(F.col(id_col).alias("cell"), "i", "v")
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    iters: int = 2,
    materialize: bool = False,
    init: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignment) after ``iters`` Lloyd iterations with
    deterministic init (centroids = vectors with id < k).

    ``k=None`` (the DEFAULT since round 15 — r14 verdict #6) derives
    the cell count from corpus size (:func:`derived_k_init`, cells of
    ~500 vectors at any scale), so a production caller who just says
    ``kmeans_fit(corpus)`` can never train 4 cells over 2e8 vectors:
    a FIXED k has the growing-cell defect the r13 100x run caught in
    ann5 (cells grow linearly with the corpus and every per-cell pass
    stops bounding task work). Passing an integer ``k`` is the
    explicit opt-in for deterministic small-seed semantics — the gate
    queries whose oracles replay fixed k=4 (ann4/ann12/ann13/ann16/
    ann20/x48) all opt in; at N <= floor_k*500 the derived default
    IS 4, so small-corpus callers see identical results either way.

    No corpus
    vector ever reaches the driver — only the k x d centroid table
    (bounded model state) does, once per iteration, to feed the
    broadcast BLAS assignment kernel (:func:`_nearest_cell_blas`;
    the assignment is a map-only stage, and the per-(cell, dim)
    centroid update is the single keyed shuffle per iteration).
    Centroids come back in long form (cell, i, v); assignment is
    (id, cell) against the FINAL centroids.

    ``init`` warm-starts the loop from an existing long-form
    (cell, i, v) centroid table instead of the id<k seed — the REFRESH
    path when :func:`ivf_cell_drift` flags that a grown corpus has
    outrun its frozen centroids: a couple of warm iterations converge
    far faster than a from-scratch re-train because the stored
    centroids already describe most of the mass (``k`` is ignored when
    ``init`` is given; the cell count comes from the table).

    ``materialize=True`` checkpoints the exploded component table once.
    Since the BLAS kernel took over the assignment (r13), comp's only
    per-iteration consumer is the centroid-update join — ``iters``
    consumers (plus the init seed) that would otherwise each re-run
    the vector explode (measured 27% of training wall at sf0.1 under
    the old 2*iters+1 shape: 1.49 -> 1.09 s median; still a win at
    iters>=2 because each kernel collect executes the update chain).
    Caching the training set across iterations is the standard
    distributed-k-means shape. OFF by default — the checkpoint is an
    eager job at plan-construction time; executing callers (ann4,
    dd11) opt in."""
    comp = _components(df, id_col, vec_col)
    if materialize:
        comp = comp.localCheckpoint(eager=True)
    if init is not None:
        cent = init.select("cell", "i", "v")
    elif k is None:
        cent = derived_k_init(df, id_col, vec_col, comp=comp)
    else:
        cent = comp.filter(F.col(id_col) < k).select(
            F.col(id_col).alias("cell"), "i", "v"
        )
    # Assignment runs through the map-only BLAS kernel (the join form
    # is the 100x scale wall: n x d x k intermediate rows per Lloyd
    # pass — see _nearest_cell_blas). Each kernel call collects the
    # k x d centroid table, which also CUTS the iteration lineage: no
    # plan grows with iters, and the update join below is the only
    # shuffle per iteration.
    for _ in range(iters):
        assign = _nearest_cell_blas(df, id_col, vec_col, cent)
        cent = (
            comp.join(assign, id_col).groupBy("cell", "i").agg(F.avg("v").alias("v"))
        )
    # Materialize the FINAL k x d centroid table exactly once (bounded
    # model state — the same collect the assignment kernel was already
    # paying) and hand both consumers the result: the kernel gets the
    # row list, and the returned frame is a LOCAL RELATION built from
    # the same rows. Before this, the returned ``cent`` was a live
    # plan over the last update join, so EVERY downstream consumer
    # (serve-path probe ranking, index writes, drift reports — and the
    # kernel itself) re-executed that join + aggregation per use; now
    # the training subtree runs once per fit, values byte-identical
    # (r15 optimization, guide §1.2/§2.4: don't recompute what one
    # collect already produced).
    rows = cent.collect()
    _guard_centroid_rows(rows, "kmeans_fit")
    cent_local = df.sparkSession.createDataFrame(rows, schema=cent.schema)
    return cent_local, _nearest_cell_blas(df, id_col, vec_col, cent, rows=rows)


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    iters: int = 2,
    materialize: bool = False,
) -> DataFrame:
    """(id, cell): the assignment half of :func:`kmeans_fit`.
    ``k=None`` (default) derives the cell count from corpus size —
    see :func:`kmeans_fit`'s round-15 contract. ``materialize`` is
    passed through to the trainer (checkpoint the exploded component
    table the Lloyd loop re-consumes)."""
    return kmeans_fit(df, id_col, vec_col, k, iters, materialize=materialize)[1]


def two_level_kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    per_super_vec: int = 250_000,
    per_cell: int = 500,
    super_floor: int = 4,
    cell_floor: int = 2,
    iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Two-level (cells-of-cells) coarse quantizer — the FAISS
    IVF-with-coarse-HNSW shape, built so CENTROID STATE STAYS BOUNDED
    at any corpus size (r14 verdict #2). The single-level derived-k
    rule (k ~ N/500 cells) keeps per-cell work bounded but grows the
    k x d broadcast centroid table linearly with N — ~205 MB at 2e8
    vectors, d=64, and past :data:`_BROADCAST_CENTROID_MAX_BYTES`
    (which now fails loudly) soon after. Here:

    * **Level 1 (supers)**: :func:`kmeans_fit` over the corpus with
      k1 = greatest(super_floor, ceil(N / per_super_vec)) derived
      supers (:func:`derived_k_init`) — the only table any kernel
      ever broadcasts is k1 x d (~20 MB at N=1e10, d=64).
    * **Level 2 (cells)**: each super's ~per_super_vec members get
      their OWN local Lloyd run inside one ``applyInPandas`` task —
      k2_s = least(n_s, greatest(cell_floor, ceil(n_s / per_cell)))
      cells seeded from the super's k2_s smallest member ids (the
      same id-seed convention as level 1, so a DuckDB oracle replays
      it), ``iters`` (assign, update) passes with explicit squared-L2
      argmin (ties to the smallest cell id), then a final assignment
      against the trained cells. Cell ids are the seed members'
      vec_ids — globally unique and stable without any coordination.
      Per-task state is one super's members (~per_super_vec x d
      float64, ~128 MB at the defaults) — bounded by construction at
      ANY corpus size, and the full k x d cell-centroid table never
      exists in one place: it stays a distributed DataFrame
      (:func:`two_level_cells`).

    Returns ``(super_centroids, assign)``: the level-1 long-form
    (cell, i, v) table (serve path: stage-1 probe via
    :func:`_nearest_cell_blas`) and the per-vector
    (id, super_cell, cell) assignment. Total cells ~ N/per_cell as
    before — the structure changes WHERE the centroids live, not how
    many there are. Assignment is hierarchical (a vector's cell is
    the nearest within its super, not the global argmin) — the
    standard IVF-tree approximation, deterministic and
    oracle-replayable end-to-end."""
    id_t = df.schema[id_col].dataType.simpleString()
    if id_t not in _INTEGRAL_SPARK_TYPES:
        raise TypeError(
            f"two_level_kmeans: id column {id_col!r} must be an "
            f"integral type, got {id_t!r}"
        )
    sup_cent, sup_assign = kmeans_fit(
        df,
        id_col,
        vec_col,
        iters=iters,
        materialize=True,
        init=derived_k_init(
            df, id_col, vec_col, floor_k=super_floor, per_cell=per_super_vec
        ),
    )
    members = df.select(id_col, vec_col).join(
        sup_assign.withColumnRenamed("cell", "super_cell"), id_col
    )
    assign = _local_lloyd_assign(
        members, id_col, vec_col, per_cell, cell_floor, iters
    )
    return sup_cent, assign


def _local_lloyd_assign(
    members: DataFrame,
    id_col: str,
    vec_col: str,
    per_cell: int,
    cell_floor: int,
    iters: int,
) -> DataFrame:
    """Per-super local Lloyd over a (id, vec, super_cell) member frame
    — the level-2 trainer of :func:`two_level_kmeans`, factored out so
    the partial-refresh path (ann38) can re-run it over just the
    drifted supers' grown member sets. One ``applyInPandas`` task per
    super: k2_s = least(n_s, greatest(cell_floor, ceil(n_s/per_cell)))
    cells seeded from the group's smallest ids, ``iters``
    (assign, update) passes with explicit squared-L2 argmin (ties to
    the smallest cell), then a final assignment — the convention the
    DuckDB _tl_local_iter_sql chains replay."""
    import math

    import numpy as np

    id_t = members.schema[id_col].dataType.simpleString()

    def local_lloyd(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        M = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        if M.ndim != 2 or not np.isfinite(M).all():
            raise ValueError(
                "two_level_kmeans: vectors must be finite and share "
                "one dimensionality (null/NaN component or ragged "
                "batch in a super group)"
            )
        n = len(M)
        k2 = min(n, max(cell_floor, math.ceil(n / per_cell)))
        cells = ids[:k2].astype(np.int64)
        C = M[:k2].copy()

        # assignment via the memory-bounded identity+re-score helper
        # (cells stay sorted ascending, so smallest-index = smallest
        # cell, the oracle's ORDER BY dist, cell — see
        # _np_argmin_sq_l2; the naive (n, k2, d) cube this replaces
        # was ~16x the documented per-task bound at production
        # parameters, r15 review)
        for _ in range(iters):
            j = _np_argmin_sq_l2(M, C)
            keep = np.unique(j)  # empty cells drop, like the CTE form
            C = np.stack([M[j == jj].mean(axis=0) for jj in keep])
            cells = cells[keep]
        j = _np_argmin_sq_l2(M, C)
        return pd.DataFrame(
            {
                id_col: ids,
                "super_cell": pdf["super_cell"].to_numpy(),
                "cell": cells[j],
            }
        )

    return members.groupBy("super_cell").applyInPandas(
        local_lloyd,
        schema=f"{id_col} {id_t}, super_cell bigint, cell bigint",
    )


def two_level_cells(
    assign: DataFrame,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(super_cell, cell, i, v): the DISTRIBUTED cell-centroid table
    of a :func:`two_level_kmeans` clustering — member means per
    (cell, i), keyed by super so a serve path can cogroup new vectors
    against exactly their super's cells. Deliberately a DataFrame,
    never collected: this is the table whose single-level twin hits
    the broadcast envelope."""
    comp = _components(df, id_col, vec_col)
    return (
        assign.join(comp, id_col)
        .groupBy("super_cell", "cell", "i")
        .agg(F.avg("v").alias("v"))
    )


TWO_LEVEL_INDEX_TABLES = ("super_centroids", "cells", "assign")


def build_two_level_index(
    df: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kw,
) -> None:
    """Persist a :func:`two_level_kmeans` clustering as three parquet
    tables (:data:`TWO_LEVEL_INDEX_TABLES`): the k1 x d super-centroid
    table (the ONLY broadcast-sized state), the distributed
    per-(super, cell) centroid table (:func:`two_level_cells` — the
    table whose single-level twin trips the broadcast envelope), and
    the full (id, super_cell, cell) assignment. Train-once shape like
    :func:`build_ivfpq_index`: the assignment is checkpointed before
    its two consumers (the cells derivation + its own write) so the
    super training and the per-super local Lloyd execute exactly
    once."""
    sup_cent, assign = two_level_kmeans(df, id_col, vec_col, **kw)
    assign = assign.localCheckpoint(eager=True)
    sup_cent.write.mode("overwrite").parquet(f"{out_dir}/super_centroids")
    two_level_cells(assign, df, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/cells")
    assign.write.mode("overwrite").parquet(f"{out_dir}/assign")


def read_two_level_index(spark, out_dir: str) -> tuple[DataFrame, ...]:
    """(super_centroids, cells, assign) read back from
    :func:`build_two_level_index`'s layout."""
    return tuple(
        spark.read.parquet(f"{out_dir}/{name}")
        for name in TWO_LEVEL_INDEX_TABLES
    )


def two_level_serve_assign(
    df: DataFrame,
    sup_cent: DataFrame,
    cells: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    s1: DataFrame | None = None,
) -> DataFrame:
    """(id, super_cell, cell): assign NEW vectors against a stored
    two-level index — the serve/grow path that never materializes the
    full cell table anywhere. Stage 1 broadcasts only the k1 x d super
    table (:func:`_nearest_cell_blas` — squared-L2 argmin, ties to the
    smallest super). Stage 2 shuffles each new vector ONCE on its
    super and cogroups it with that super's ~per_cell-count cell
    centroids inside one ``applyInPandas`` task: explicit squared-L2
    over the shared component range, ties to the smallest cell —
    byte-for-byte the convention :func:`two_level_kmeans` trains
    with, so a DuckDB oracle replays the whole path (ann34). Vectors
    whose stage-1 super holds no cells (possible only when the final
    training assignment emptied a super) are DROPPED — inner-join
    semantics, matching the oracle's join. Per-task state: one
    super's delta vectors + its cells — bounded at any corpus size.

    ``s1`` (optional): a PRE-COMPUTED stage-1 assignment
    (id, super_cell) for ``df`` — a caller that already ran the super
    probe for its own purposes (ann38's drift report assigns the same
    delta batch against the same frozen super table) passes it so the
    delta is not kernel-scanned twice; it must be exactly
    ``_nearest_cell_blas(df, ..., sup_cent)`` renamed, which the
    partial-refresh path guarantees by construction."""
    import numpy as np

    id_t = df.schema[id_col].dataType.simpleString()
    if id_t not in _INTEGRAL_SPARK_TYPES:
        raise TypeError(
            f"two_level_serve_assign: id column {id_col!r} must be an "
            f"integral type, got {id_t!r}"
        )
    if s1 is None:
        s1 = _nearest_cell_blas(
            df, id_col, vec_col, sup_cent
        ).withColumnRenamed("cell", "super_cell")
    vec_sup = df.select(id_col, vec_col).join(s1, id_col)

    def within_super(key, vdf, cdf):
        import pandas as pd

        if not len(vdf) or not len(cdf):
            return pd.DataFrame(
                {id_col: [], "super_cell": [], "cell": []}
            ).astype({id_col: "int64", "super_cell": "int64", "cell": "int64"})
        piv = cdf.pivot(index="cell", columns="i", values="v").sort_index()
        C = piv.to_numpy(dtype=np.float64)
        cells_arr = piv.index.to_numpy(dtype=np.int64)
        lo, hi = int(piv.columns.min()), int(piv.columns.max())
        M = np.array(
            [np.asarray(v, dtype=np.float64) for v in vdf[vec_col]]
        )
        if M.ndim != 2 or M.shape[1] <= hi or not np.isfinite(M).all():
            raise ValueError(
                "two_level_serve_assign: vectors must be finite and "
                "cover the cell component range"
            )
        M = M[:, lo : hi + 1]
        out = _np_argmin_sq_l2(M, C)
        return pd.DataFrame(
            {
                id_col: vdf[id_col].to_numpy(),
                "super_cell": vdf["super_cell"].to_numpy(),
                "cell": cells_arr[out],
            }
        )

    return (
        vec_sup.groupBy("super_cell")
        .cogroup(cells.groupBy("super_cell"))
        .applyInPandas(
            within_super,
            schema=f"{id_col} {id_t}, super_cell bigint, cell bigint",
        )
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    iters: int = 2,
    min_sim: float = 0.3,
    max_cell_size: int | str | None = None,
    cap_floor: int = 200,
    cap_hard_max: int = 5000,
    materialize: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings into k cells with k-means,
    then mark every vector that has an in-cell neighbor above
    ``min_sim`` cosine with a LOWER id as a duplicate. Output:
    (id, cell, is_kept) for every input vector — keep-min-id inside
    each epsilon-ball, the deterministic variant of the paper's
    keep-farthest-from-centroid rule.

    Scale shape: the pairwise pass is per-cell (one BLAS gram matrix
    per cell via :func:`_gram_pair_fn`), so k is the knob that bounds
    task memory — ``k=None`` (default, round 15) DERIVES
    k ~ N/500 from the corpus (:func:`derived_k_init` via the
    trainer), the paper's own sizing (11k cells over LAION); an
    integer k is the explicit fixed-seed opt-in (dd11's oracle). Cells larger than ``max_cell_size`` (if set) are
    passed through un-scored (every member kept) rather than OOMing a
    task; at production k the cap should never trigger.
    ``max_cell_size="auto"`` derives the cap from the cell-size
    distribution (Tukey fence, floor ``cap_floor``, ceiling
    ``cap_hard_max`` = the gram kernel's memory bound; see
    :mod:`..llm.caps`) — balanced cells always pass, only a skew
    blow-out trips it, at any corpus size.

    The cluster step is :func:`kmeans_assign` (broadcast centroids);
    the only O(N) shuffles are the assignment agg and the cell-keyed
    gram pass. ``materialize=True`` checkpoints the (id, cell)
    assignment — it is consumed twice (gram input + final output join)
    and re-running it would repeat every Lloyd iteration."""
    assign = kmeans_assign(df, id_col, vec_col, k, iters, materialize=materialize)
    if materialize:
        assign = assign.localCheckpoint(eager=True)
    id_t = df.schema[id_col].dataType.simpleString()
    # The cap depends only on CELL SIZES, which the (id, cell)
    # assignment already carries — apply it there, before the vector
    # join, so the cap's two extra consumers (size agg + semi-join) run
    # over the checkpointed two-column assignment instead of re-joining
    # the full embedding vectors per consumer.
    scored = assign  # members of capped-out cells stay in `assign`
    # (they are passed through un-scored, every member kept) — only the
    # GRAM input is filtered.
    if max_cell_size == "auto":
        from .caps import filter_by_derived_cap

        scored = filter_by_derived_cap(
            scored, ["cell"], floor=cap_floor, hard_max=cap_hard_max
        )
    elif max_cell_size is not None:
        from pyspark.sql import Window

        wc = Window.partitionBy("cell")
        scored = (
            scored.withColumn("__csz", F.count(F.lit(1)).over(wc))
            .filter(F.col("__csz") <= max_cell_size)
            .drop("__csz")
        )
    vecs = scored.join(df.select(F.col(id_col), F.col(vec_col)), id_col).select(
        F.col(id_col).alias("__id"), "cell", F.col(vec_col).alias("__v")
    )
    pairs = vecs.groupBy("cell").applyInPandas(
        _gram_pair_fn(min_sim), schema=f"a {id_t}, b {id_t}, cosine double"
    )
    dropped = pairs.select(F.col("b").alias(id_col)).distinct()
    return (
        assign.join(dropped.withColumn("__dup", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cell",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("is_kept"),
        )
    )


def brute_force_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of one stored vector by cosine (excluding
    itself). Deterministic order: (cosine desc, id asc)."""
    comp = _components(df, id_col, vec_col)
    q = comp.filter(F.col(id_col) == query_id).select("i", F.col("v").alias("qv"))
    dots = (
        comp.join(F.broadcast(q), "i")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("v") * F.col("qv")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm"),
        )
    )
    qnorm = (
        comp.filter(F.col(id_col) == query_id)
        .agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("qnorm"))
    )
    scored = (
        dots.crossJoin(F.broadcast(qnorm))
        .filter(F.col(id_col) != query_id)
        .select(
            id_col,
            F.round(F.col("dot") / (F.col("norm") * F.col("qnorm")), 4).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def pq_approx_scores(
    df: DataFrame,
    query_id: int,
    n_codes: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = False,
) -> DataFrame:
    """(id, approx_cosine) for every vector except the query, scored by
    product-quantization asymmetric distance (Jégou et al. 2011): split
    each vector into 2 subspaces, k-means each subspace into
    ``n_codes`` centroids (deterministic init = first ``n_codes``
    vectors' halves), store each vector as a 2-code tuple, and score
    the query via a per-subspace lookup table of query-to-centroid dots
    (2 x n_codes scalars — broadcast), so approx_dot(x) =
    table0[code0(x)] + table1[code1(x)]. Approx cosine divides by the
    EXACT stored norms; scores come back 4-dp rounded so any downstream
    cut is engine-deterministic. Shared spine of :func:`pq_topk`,
    :func:`pq_rerank_topk`, and :func:`ivfpq_topk`.

    The 100 TB shape: codes are a pure projection once centroids are
    trained (the memory win — 2 bytes per vector instead of d floats),
    the lookup table is O(n_codes) per query, and scoring is a
    broadcast join — no full-vector arithmetic per candidate.
    Everything here is DataFrame ops on the long component form; the
    subspace split derives from max(i) declaratively (no driver
    collect)."""
    codes, cent_a, cent_b = pq_train(
        df, n_codes, iters, id_col, vec_col, materialize=materialize
    )
    return pq_scores_from_index(
        df, codes, cent_a, cent_b, query_id, id_col, vec_col
    )


def pq_train(
    df: DataFrame,
    n_codes: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The PQ index-BUILD half: (codes, cent_a, cent_b) where codes =
    (id, code0, code1, norm) — every vector compressed to its two
    subspace code ids plus its exact norm — and cent_a/cent_b are the
    trained per-subspace centroid tables (cell, i, v). These three
    frames ARE the persisted IVFPQ index a 100 TB vector store writes
    to parquet once (bytes per vector + 2 tiny centroid tables) and
    serves every query from (:func:`pq_scores_from_index`) — the Lloyd
    iterations over the full corpus never re-run per query. Training:
    2 subspaces from a declarative max(i) split, k-means each into
    ``n_codes`` cells with deterministic init (first ``n_codes``
    vectors' halves). ``materialize=True`` checkpoints the exploded
    component table once (each subspace's Lloyd loop consumes it
    2*iters+1 times plus codes and norms). Measured trade (SCALE.md):
    at sf0.1 it saves ~13% wall, but at 10x the vectors it COSTS 50%
    (8.3 -> 12.3 s) — materializing N*d component rows is dearer than
    re-running the explode, which is a cheap columnar scan. The
    registered queries therefore do NOT opt in (unlike kmeans_fit,
    whose loop runs more iterations over a k-times-smaller table);
    the knob exists for small-corpus interactive use."""
    comp = _components(df, id_col, vec_col)
    if materialize:
        comp = comp.localCheckpoint(eager=True)
    half = comp.agg(
        F.floor((F.max("i") + 1) / 2).cast("int").alias("__d2")
    )
    compj = comp.crossJoin(F.broadcast(half))
    subs = [compj.filter(F.col("i") < F.col("__d2")).drop("__d2"),
            compj.filter(F.col("i") >= F.col("__d2")).drop("__d2")]
    cents, codes = [], []
    # Each subspace's Lloyd assignment (and the final encode) runs
    # through the broadcast BLAS kernel against the FULL vector table
    # — the kernel slices each vector to the codebook's own component
    # range, so no per-subspace n x d x k join ever materializes (the
    # r13 verdict's remaining corpus-sized join-form sites). The
    # component form survives only where it is the right shape: the
    # deterministic init seed and the per-(cell, i) centroid update.
    for s, comp_s in enumerate(subs):
        cent = comp_s.filter(F.col(id_col) < n_codes).select(
            F.col(id_col).alias("cell"), "i", "v"
        )
        for _ in range(iters):
            assign = _nearest_cell_blas(df, id_col, vec_col, cent)
            cent = (
                comp_s.join(assign, id_col)
                .groupBy("cell", "i")
                .agg(F.avg("v").alias("v"))
            )
        cents.append(cent)
        codes.append(
            _nearest_cell_blas(df, id_col, vec_col, cent).withColumnRenamed(
                "cell", f"code{s}"
            )
        )
    norms = comp.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm")
    )
    code_tbl = codes[0].join(codes[1], id_col).join(norms, id_col)
    return code_tbl, cents[0], cents[1]


def pq_scores_from_index(
    df: DataFrame,
    codes: DataFrame,
    cent_a: DataFrame,
    cent_b: DataFrame,
    query_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The PQ query-SERVE half: (id, approx_cosine) for every coded
    vector except the query, from a PERSISTED index (:func:`pq_train`'s
    codes + centroid tables read back from parquet). Per query: the
    query vector's components split at the same max(i) boundary the
    centroid tables encode (each table carries its own i range), two
    O(n_codes) lookup tables of query-to-centroid dots are built and
    broadcast, and scoring is one broadcast join against the CODE table
    — bytes per candidate, no corpus vector is ever read. ``df`` is
    consulted ONLY for the query's own row."""
    qcomp = _components(
        df.filter(F.col(id_col) == query_id), id_col, vec_col
    ).select("i", F.col("v").alias("qv"))
    tables = []
    for s, cent in enumerate((cent_a, cent_b)):
        tables.append(
            cent.join(qcomp, "i")
            .groupBy("cell")
            .agg(F.sum(F.col("v") * F.col("qv")).alias(f"t{s}"))
            .withColumnRenamed("cell", f"code{s}")
        )
    qnorm = (
        codes.filter(F.col(id_col) == query_id)
        .select(F.col("norm").alias("qnorm"))
    )
    return (
        codes.join(F.broadcast(tables[0]), "code0")
        .join(F.broadcast(tables[1]), "code1")
        .crossJoin(F.broadcast(qnorm))
        .filter(F.col(id_col) != query_id)
        .select(
            id_col,
            F.round(
                (F.col("t0") + F.col("t1")) / (F.col("norm") * F.col("qnorm")), 4
            ).alias("approx_cosine"),
        )
    )


def pq_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_codes: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = False,
) -> DataFrame:
    """Top-k by PQ approximate cosine (:func:`pq_approx_scores`),
    ordered (approx cosine desc, id). Recall loss vs exact is the
    quantization error; ann1/ann6-style ground truth applies."""
    scored = pq_approx_scores(
        df, query_id, n_codes, iters, id_col, vec_col, materialize=materialize
    )
    return scored.orderBy(F.col("approx_cosine").desc(), F.col(id_col)).limit(k)


def pq_rerank_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    shortlist: int = 100,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = False,
) -> DataFrame:
    """The production PQ pipeline: :func:`pq_topk`'s asymmetric-distance
    scan shortlists ``shortlist`` candidates from compressed codes
    (cheap — table lookups, no vector arithmetic), then ONLY those
    candidates are rescored with exact cosine and the true top-k
    emitted. Quantization error is confined to the shortlist boundary:
    with a generous shortlist the output matches exact search on
    everything the shortlist caught (recall ~0.8 at shortlist=20% of
    the gate corpus vs ~0.2 for raw PQ ranking — random-ish vectors are
    PQ's worst case). The shortlist orders by the 4-dp ROUNDED approx
    score with id tie-break, so the cut is engine-deterministic."""
    short = pq_topk(
        df, query_id, k=shortlist, n_codes=n_codes, id_col=id_col,
        vec_col=vec_col, materialize=materialize,
    ).select(id_col)
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__qv"))
    return (
        df.join(short, id_col)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(cosine_expr(F.col(vec_col), F.col("__qv")), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _rerank_members(
    df: DataFrame,
    members: DataFrame,
    query_id: int,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared probe tail for the IVF paths: exact brute-force top-k over
    ``members`` (a one-column frame of candidate ids, query excluded)
    plus the query's own row. Kept in one place so the self-exclusion
    and tie-break rules cannot drift between the in-memory and
    persisted-index paths."""
    candidates = df.join(members, id_col, "left_semi")
    return brute_force_topk(
        candidates.unionByName(df.filter(F.col(id_col) == query_id)),
        query_id,
        k,
        id_col,
        vec_col,
    )


def ivf_query_from_index(
    df: DataFrame,
    centroids: DataFrame,
    assign: DataFrame,
    query_id: int,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a PERSISTED IVF index — the ANN analog of x21's stored
    signature index: ``centroids`` (cell, i, v) and ``assign``
    (id, cell) are :func:`kmeans_fit` outputs written to parquet at
    index-build time and read back here, so a query never re-clusters
    the corpus. Per query: one broadcast of the k x d centroid table to
    rank the probe cells, a semi-join of the stored assignment to the
    ``nprobe`` chosen cells, and an exact rerank over only those
    members (~nprobe/k of the corpus) — the index-build cost (Lloyd
    iterations over 100 TB of vectors) is paid once, queries pay
    cell-sized work.

    Probe metric = squared L2, the SAME metric :func:`kmeans_fit`'s
    ``_nearest_cell`` assigned members with. Ranking probe cells by a
    different metric (an earlier draft used cosine) can skip the
    query's OWN cell on unnormalized embeddings, excluding its co-cell
    neighbors from the rerank entirely. Deterministic: cells tie-break
    ascending, rerank orders (cosine desc, id asc)."""
    comp = _components(df, id_col, vec_col)
    q = comp.filter(F.col(id_col) == query_id).select("i", F.col("v").alias("qv"))
    cent = centroids.select("cell", "i", F.col("v").alias("cv"))
    cell_scores = (
        cent.join(F.broadcast(q), "i")
        .groupBy("cell")
        .agg(F.sum((F.col("cv") - F.col("qv")) ** 2).alias("dist"))
    )
    # TakeOrderedAndProject over the k-row cell table — no window
    probe = cell_scores.orderBy("dist", "cell").limit(nprobe).select("cell")
    members = (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col(id_col) != query_id)
        .select(id_col)
    )
    return _rerank_members(df, members, query_id, k, id_col, vec_col)


def ivf_filtered_query_from_index(
    df: DataFrame,
    centroids: DataFrame,
    assign: DataFrame,
    allowed: DataFrame,
    query_id: int,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Metadata-FILTERED ANN from a persisted IVF index: top-k among
    only the vectors whose ids appear in ``allowed`` (a one-column
    frame produced by an arbitrary metadata predicate — label, language,
    license, date range). The filter is applied at CANDIDATE GENERATION
    (a semi-join on the probed cells' member set, before any distance
    work), not as a post-filter of an unfiltered top-k — post-filtering
    returns fewer than ``k`` results whenever the predicate is
    selective, the classic filtered-search defect (the difference is
    pinned in test_similarity.py). Cost shape is unchanged from
    :func:`ivf_query_from_index`: probe the k-row centroid table,
    member semi-join, exact rerank over the (now filter-shrunk) member
    set — the predicate only ever REDUCES reranked candidates, and at
    100 TB the ``allowed`` side is a pushed-down parquet scan of the
    metadata columns, never the vectors."""
    comp = _components(df, id_col, vec_col)
    q = comp.filter(F.col(id_col) == query_id).select("i", F.col("v").alias("qv"))
    cent = centroids.select("cell", "i", F.col("v").alias("cv"))
    cell_scores = (
        cent.join(F.broadcast(q), "i")
        .groupBy("cell")
        .agg(F.sum((F.col("cv") - F.col("qv")) ** 2).alias("dist"))
    )
    probe = cell_scores.orderBy("dist", "cell").limit(nprobe).select("cell")
    members = (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col(id_col) != query_id)
        .join(allowed.select(id_col), id_col, "left_semi")
        .select(id_col)
    )
    return _rerank_members(df, members, query_id, k, id_col, vec_col)


def _ivf_cluster_members(
    df: DataFrame,
    query_id: int,
    n_centroids: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-column frame of the ids assigned to the query's ``nprobe``
    nearest coarse cells (query excluded) — coarse-assign every vector
    to its nearest of the first ``n_centroids`` stored vectors by
    cosine. Shared spine of :func:`ivf_topk` (exact rerank over
    members) and :func:`ivfpq_topk` (PQ-shortlist over members).

    The corpus-wide assignment runs the map-only cosine kernel
    (:func:`_nearest_centroid_cos_blas` — round 14; the join + window
    form it replaced built n x d x k rows, ~1e11 at 2e8 vectors, the
    last corpus-sized assignment join in the module). The QUERY's
    nprobe cell ranking is k x d-sized work and stays declarative:
    one broadcast join of the centroid rows against the query's
    components — same score, same (cos DESC, c ASC) order as before."""
    comp = _components(df, id_col, vec_col)
    cent = comp.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("c"), "i", F.col("v").alias("cv")
    )
    assign = _nearest_centroid_cos_blas(df, id_col, vec_col, cent)
    qcomp = comp.filter(F.col(id_col) == query_id).select(
        "i", F.col("v").alias("qv")
    )
    qnorm = qcomp.agg(F.sqrt(F.sum(F.col("qv") * F.col("qv"))).alias("qnorm"))
    cnorms = cent.groupBy("c").agg(
        F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cnorm")
    )
    # the query's nprobe nearest cells (nprobe=1 reduces to its own
    # cell) — a k-row TakeOrdered, no window over corpus rows
    q_centroid = (
        cent.join(F.broadcast(qcomp), "i")
        .groupBy("c")
        .agg(F.sum(F.col("cv") * F.col("qv")).alias("dot"))
        .join(F.broadcast(cnorms), "c")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "c",
            (F.col("dot") / (F.col("qnorm") * F.col("cnorm"))).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "c")
        .limit(nprobe)
        .select(F.col("c").alias("centroid"))
    )
    return (
        assign.join(F.broadcast(q_centroid), "centroid")
        .filter(F.col(id_col) != query_id)
        .select(id_col)
    )


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF-bucketed ANN: coarse-assign every vector to its nearest
    centroid (here: the first ``n_centroids`` stored vectors — the engine
    takes centroids as data; swap in k-means centroids at will), then
    search only the ``nprobe`` cells nearest the query.

    Scale path: the centroid table broadcasts; assignment is one
    map-side pass; the final search touches ~nprobe/n_centroids of rows.
    ``nprobe`` is the recall/cost dial — recall lost to the coarse
    quantizer (a true neighbor assigned to the second-nearest cell) is
    recovered linearly in probes; ann6/ann7 measure exactly this.
    """
    cluster = _ivf_cluster_members(
        df, query_id, n_centroids, nprobe, id_col, vec_col
    )
    return _rerank_members(df, cluster, query_id, k, id_col, vec_col)


IVFPQ_INDEX_TABLES = (
    "coarse_centroids",
    "coarse_assign",
    "pq_codes",
    "pq_cent_a",
    "pq_cent_b",
)


def pq_encode(
    df: DataFrame,
    cent_a: DataFrame,
    cent_b: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code0, code1, norm): encode vectors against STORED subspace
    codebooks — :func:`pq_train`'s code table derived from persisted
    centroid frames, so the Lloyd trainings never re-run to encode.
    Also the incremental-encode primitive: a new vector batch folds
    into a PQ index by encoding against the frozen codebooks, the PQ
    analog of :func:`ivf_incremental_assign`. Each codebook carries
    its own component range, which the broadcast BLAS kernel reads
    directly (:func:`_nearest_cell_blas` slices every vector to the
    codebook's [min(i), max(i)]), so the encode path is two map-only
    passes over the vector table — no component explode, no subspace
    boundary recovery, no n x d x k join (the r13 verdict's
    corpus-sized join-form site at the old line 1110). Same argmin
    metric and (distance, cell) tie-break as training —
    encode(corpus) == pq_train's own codes on the same centroids."""
    comp = _components(df, id_col, vec_col)
    codes = []
    for s, cent in enumerate((cent_a, cent_b)):
        codes.append(
            _nearest_cell_blas(df, id_col, vec_col, cent)
            .withColumnRenamed("cell", f"code{s}")
        )
    norms = comp.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm")
    )
    return codes[0].join(codes[1], id_col).join(norms, id_col)


def build_ivfpq_index(
    df: DataFrame,
    out_dir: str,
    coarse_k: int | None = None,
    coarse_iters: int = 2,
    n_codes: int = 16,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build the persisted IVF-PQ index ONCE: the coarse quantizer
    (:func:`kmeans_fit` — trained centroids + full assignment) and the
    product quantizer (:func:`pq_train` — per-vector 2-code tuples +
    two subspace centroid tables), written as five parquet tables
    under ``out_dir`` (:data:`IVFPQ_INDEX_TABLES`). This is the
    build-time half a 100 TB vector store pays once: Lloyd iterations
    over the corpus, then bytes-per-vector state on disk. Queries
    (:func:`ivfpq_query_from_index`) read only this state plus their
    own query row — see the cost split ann10 (build+query, in-plan)
    vs ann11 (query-only, from this index) in the bench.

    ``coarse_k=None`` (the default since round 14) DERIVES the coarse
    cell count from corpus size (:func:`derived_k_init` — cells of
    ~500 vectors at any scale): a fixed coarse_k has exactly the
    growing-cell defect the r13 100x run caught in ann5 — at 100x the
    vectors, k=4 cells hold 50k members each, so every probe reranks
    a quarter of the corpus and the cells never bound per-task work.
    ``n_codes`` stays FIXED by design: the PQ codebook is the
    compressed representation's alphabet (bytes per vector), not a
    partitioning — growing it with the corpus would change the code
    width, and per-subspace Lloyd work is linear in N at constant
    n_codes. An integer ``coarse_k`` keeps the fixed-size behavior
    for callers that train on deterministic small seeds (ann16's
    refresh base).

    Each training chain executes EXACTLY ONCE: the centroid tables
    (tiny, k x d) are written first, and the corpus-sized derivations
    — coarse assignment, PQ codes — are computed from the READ-BACK
    stored tables (:func:`pq_encode`, the same one-broadcast-pass
    shape a query pays). A naive write of all five lazy frames re-runs
    the coarse Lloyd chain twice and each subspace training up to
    three times through shared lineage — separate write ACTIONS get no
    exchange reuse. Measured trade (SCALE.md): the extra read-back job
    waves cost 65% at sf0.1 (12.0 vs 7.3 s, fixed-overhead regime) and
    are already a wash at 10x the vectors (14.2 vs 14.4 s); beyond
    that the redundant trainings scale with the corpus while the
    read-backs stay fixed, so train-once is the scale-correct shape
    for a build path that by definition targets large corpora."""
    spark = df.sparkSession
    # coarse_k=None -> kmeans_fit's own derived-k default (round 15:
    # the trainer derives the seed from its checkpointed comp, so the
    # two branches collapsed into one call)
    cent, _ = kmeans_fit(
        df, id_col, vec_col, coarse_k, coarse_iters, materialize=True
    )
    cent.write.mode("overwrite").parquet(f"{out_dir}/coarse_centroids")
    cent_r = spark.read.parquet(f"{out_dir}/coarse_centroids")
    _nearest_cell_blas(df, id_col, vec_col, cent_r).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/coarse_assign")
    _codes, ca, cb = pq_train(df, n_codes, pq_iters, id_col, vec_col)
    ca.write.mode("overwrite").parquet(f"{out_dir}/pq_cent_a")
    cb.write.mode("overwrite").parquet(f"{out_dir}/pq_cent_b")
    ca_r = spark.read.parquet(f"{out_dir}/pq_cent_a")
    cb_r = spark.read.parquet(f"{out_dir}/pq_cent_b")
    pq_encode(df, ca_r, cb_r, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/pq_codes")


def read_ivfpq_index(spark, out_dir: str) -> tuple[DataFrame, ...]:
    """(coarse_centroids, coarse_assign, pq_codes, pq_cent_a,
    pq_cent_b) read back from :func:`build_ivfpq_index`'s layout."""
    return tuple(
        spark.read.parquet(f"{out_dir}/{name}") for name in IVFPQ_INDEX_TABLES
    )


def ivfpq_query_from_index(
    df: DataFrame,
    centroids: DataFrame,
    assign: DataFrame,
    codes: DataFrame,
    cent_a: DataFrame,
    cent_b: DataFrame,
    query_id: int,
    k: int = 10,
    shortlist: int = 50,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve one ANN query from a PERSISTED IVF-PQ index — the number a
    100 TB vector store actually quotes as latency, with zero training
    in the plan. Per query: (1) coarse probe — squared-L2 rank of the
    stored k x d centroid table against the query's components (the
    SAME metric :func:`kmeans_fit` assigned members with, so the
    query's own cell is always probe #1), (2) the stored assignment
    semi-joined to the ``nprobe`` chosen cells gives the member set,
    (3) PQ asymmetric distance ranks only those members from the
    stored CODE table via two broadcast O(n_codes) lookup tables
    (:func:`pq_scores_from_index` — bytes per candidate), (4) the
    top-``shortlist`` survivors are rescored with exact cosine and the
    true top-k emitted. ``df`` supplies only the query's own row and
    the ``shortlist`` full vectors for the rerank. Both cuts order by
    4-dp-rounded score with id tie-break — engine-deterministic, so a
    DuckDB oracle replaying the (deterministic) index build from
    scratch gets the identical result."""
    comp_q = _components(
        df.filter(F.col(id_col) == query_id), id_col, vec_col
    ).select("i", F.col("v").alias("qv"))
    cent = centroids.select("cell", "i", F.col("v").alias("cv"))
    cell_scores = (
        cent.join(F.broadcast(comp_q), "i")
        .groupBy("cell")
        .agg(F.sum((F.col("cv") - F.col("qv")) ** 2).alias("dist"))
    )
    # TakeOrderedAndProject over the k-row cell table — no window
    probe = cell_scores.orderBy("dist", "cell").limit(nprobe).select("cell")
    members = (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col(id_col) != query_id)
        .select(id_col)
    )
    scores = pq_scores_from_index(
        df, codes, cent_a, cent_b, query_id, id_col, vec_col
    )
    short = (
        scores.join(members, id_col, "left_semi")
        .orderBy(F.col("approx_cosine").desc(), F.col(id_col))
        .limit(shortlist)
        .select(id_col)
    )
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__qv"))
    return (
        df.join(short, id_col, "left_semi")
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(cosine_expr(F.col(vec_col), F.col("__qv")), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_batch_query_from_index(
    df: DataFrame,
    centroids: DataFrame,
    assign: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve a BATCH of ANN queries from one shared persisted IVF index
    in a single plan — the read path a dedup pass or dataloader
    actually runs (thousands of lookups per micro-batch), where
    per-query job submission would dominate. Output: (query_id, id,
    cosine), top-k per query, (cosine desc, id) ordered within each.

    Every stage is batched, none is per-query: the probe ranks ALL
    queries' cells in one (qid, cell)-keyed agg over the broadcast
    centroid table; the member set is one join of the stored assignment
    against the probe table; the exact rerank is one (qid,
    candidate)-keyed dot-product agg with the queries' components
    broadcast (|Q| x d rows); the final cut is a row_number window
    PARTITIONED BY query id — parallel across queries, never a global
    sort. Work per query stays cell-scoped exactly as in the
    single-query path (:func:`ivf_query_from_index`, same L2 probe
    metric and tie-breaks — equality pinned in test_similarity.py)."""
    from pyspark.sql import Window

    comp = _components(df, id_col, vec_col)
    qcomp = (
        comp.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(F.col(id_col).alias("qid"), "i", F.col("v").alias("qv"))
    )
    cent = centroids.select("cell", "i", F.col("v").alias("cv"))
    cell_scores = (
        F.broadcast(qcomp)
        .join(cent, "i")
        .groupBy("qid", "cell")
        .agg(F.sum((F.col("cv") - F.col("qv")) ** 2).alias("dist"))
    )
    w_probe = Window.partitionBy("qid").orderBy("dist", "cell")
    probe = (
        cell_scores.withColumn("prn", F.row_number().over(w_probe))
        .filter(F.col("prn") <= nprobe)
        .select("qid", "cell")
    )
    members = (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col(id_col) != F.col("qid"))
        .select("qid", id_col)
    )
    norms = comp.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm")
    )
    qnorms = norms.filter(F.col(id_col).isin([int(q) for q in query_ids])).select(
        F.col(id_col).alias("qid"), F.col("norm").alias("qnorm")
    )
    dots = (
        members.join(comp, id_col)
        .join(F.broadcast(qcomp), ["qid", "i"])
        .groupBy("qid", id_col)
        .agg(F.sum(F.col("v") * F.col("qv")).alias("dot"))
    )
    scored = (
        dots.join(norms, id_col)
        .join(F.broadcast(qnorms), "qid")
        .select(
            F.col("qid").alias("query_id"),
            id_col,
            F.round(F.col("dot") / (F.col("norm") * F.col("qnorm")), 4).alias(
                "cosine"
            ),
        )
    )
    w_cut = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_cut))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_incremental_assign(
    new_df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fold a NEW vector batch into a persisted IVF index without
    re-clustering: one broadcast pass assigns each new vector to its
    nearest EXISTING centroid — the same squared-L2 metric and
    (distance, cell) tie-break as :func:`kmeans_fit`'s assignment, so
    incremental-assign over the delta equals the full re-assignment
    restricted to the delta (the property ann12's oracle verifies).
    Append the result to the stored assignment table; work scales with
    the batch, never the corpus — x21/x41's incremental pattern
    applied to the ANN index. Use :func:`ivf_cell_drift` on the
    before/after assignments to decide when re-training is warranted.
    Runs through the broadcast BLAS kernel like every other
    assignment site (r13 advice: one float path for train, encode,
    and incremental assign — a near-tie vector must land in the same
    cell at every stage)."""
    return _nearest_cell_blas(new_df, id_col, vec_col, centroids)


def ivf_cell_drift(
    assign_before: DataFrame,
    assign_after: DataFrame,
    warn_ratio: float = 2.0,
) -> DataFrame:
    """Per-cell drift report after incremental index growth: (cell,
    n_before, n_after, share_before, share_after, retrain). A cell
    whose corpus share grew by more than ``warn_ratio`` (or that was
    empty at build time) flags ``retrain=True`` — the signal that the
    frozen centroids no longer describe the data and a re-clustering
    pass is due. Cell-count-sized frames throughout: two counts, two
    1-row totals broadcast back, no corpus scan."""
    b = assign_before.groupBy("cell").agg(F.count("*").alias("n_before"))
    a = assign_after.groupBy("cell").agg(F.count("*").alias("n_after"))
    tb = b.agg(F.sum("n_before").alias("__tb"))
    ta = a.agg(F.sum("n_after").alias("__ta"))
    joined = (
        b.join(a, "cell", "full")
        .na.fill({"n_before": 0, "n_after": 0})
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(ta))
    )
    share_b = F.col("n_before") / F.col("__tb")
    share_a = F.col("n_after") / F.col("__ta")
    return joined.select(
        "cell",
        "n_before",
        "n_after",
        F.round(share_b, 6).alias("share_before"),
        F.round(share_a, 6).alias("share_after"),
        (
            (F.col("n_before") == 0)
            | (share_a > F.lit(warn_ratio) * share_b)
        ).alias("retrain"),
    )


def ivfpq_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    shortlist: int = 50,
    n_codes: int = 16,
    n_centroids: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = False,
) -> DataFrame:
    """Full IVF-PQ ANN (Jégou et al. 2011, the FAISS IVFPQ layout):
    the coarse quantizer restricts the search to the query's ``nprobe``
    cells (:func:`_ivf_cluster_members` — ~nprobe/n_centroids of the
    corpus), PQ asymmetric distance ranks ONLY those members from their
    compressed codes (:func:`pq_approx_scores` — table lookups, no
    vector arithmetic), the top-``shortlist`` survivors are rescored
    with exact cosine, and the true top-k is emitted.

    This is the shape a 100 TB vector store actually serves: per query
    the IO is one broadcast centroid table + the probed cells' CODE
    rows (bytes per vector) + ``shortlist`` full vectors for the exact
    rerank. PQ codes are trained on the FULL corpus (a pure projection
    once trained, exactly as a persisted index stores them), so cell
    membership only FILTERS the code scan — the same codes serve every
    query and every cell. Both cuts (shortlist and final top-k) order
    by 4-dp-rounded score with id tie-break, so the result is
    engine-deterministic and the DuckDB oracle replays coarse
    assignment, both subspace trainings, lookup tables, the in-cell
    shortlist, and the exact rerank."""
    members = _ivf_cluster_members(
        df, query_id, n_centroids, nprobe, id_col, vec_col
    )
    scores = pq_approx_scores(
        df, query_id, n_codes=n_codes, id_col=id_col, vec_col=vec_col,
        materialize=materialize,
    )
    short = (
        scores.join(members, id_col, "left_semi")
        .orderBy(F.col("approx_cosine").desc(), F.col(id_col))
        .limit(shortlist)
        .select(id_col)
    )
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__qv"))
    return (
        df.join(short, id_col, "left_semi")
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(cosine_expr(F.col(vec_col), F.col("__qv")), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivfpq_delete_tombstones(
    assign: DataFrame,
    codes: DataFrame,
    tombstones: DataFrame,
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """LOGICAL delete from a persisted IVF-PQ index: anti-join the
    stored assignment and PQ-code tables against a tombstone id set.
    Deleted vectors vanish from every serve path that flows through the
    membership tables — coarse probe members, PQ shortlist, exact
    rerank — without touching the centroid tables (deleting members
    does not move trained centroids; :func:`ivf_cell_drift` says when
    the shrinkage warrants re-training). Cost: two |index|-row
    anti-joins keyed on the id — the tombstone side broadcasts while
    deletes are batch-sized, which is the 100 TB shape (a vector
    store's delete batch is always tiny next to its corpus). This is
    the shrink half of the maintenance pair :func:`ivf_incremental_assign`
    opened (grow); :func:`compact_ivfpq_index` makes it physical."""
    t = tombstones.select(id_col)
    return (
        assign.join(t, id_col, "left_anti"),
        codes.join(t, id_col, "left_anti"),
    )


def compact_ivfpq_index(
    spark,
    out_dir: str,
    tombstones: DataFrame,
    id_col: str = "vec_id",
) -> None:
    """PHYSICAL compaction of tombstoned deletes: rewrite the
    assignment and PQ-code tables without the deleted ids and swap each
    into place atomically (the same checked two-rename swap the
    streaming state compactors use — crash between renames leaves a
    complete ``.trash`` copy, never a half-written index). Centroid
    tables are untouched: they are k x d training artifacts, not
    membership state. Run between serve windows; after compaction the
    tombstone set is no longer needed — serve-from-compacted equals
    serve-over-tombstones (pinned in tests/test_similarity.py)."""
    from ..streaming.file_stream import _swap_compacted

    t = tombstones.select(id_col).localCheckpoint(eager=True)
    for table in ("coarse_assign", "pq_codes"):
        root = f"{out_dir}/{table}"
        staging = f"{root}.compact"
        kept = spark.read.parquet(root).join(t, id_col, "left_anti")
        kept.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            staging
        )
        _swap_compacted(spark, root, staging)


def sq8_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized (SQ8) approximate search + exact rerank — the
    third serve mode next to IVF (cell pruning) and PQ (subspace
    codebooks): each dimension is quantized independently to 8 bits
    against its corpus [min, max] range, so the stored index is 1 byte
    per dimension (16x smaller than float64) with NO training step —
    the quantizer is one d-sized min/max aggregate, which is why real
    vector stores ship SQ8 as the cheap default before IVF/PQ tuning.

    Plan shape: one component scan -> d-sized min/max agg (broadcast
    back) -> codes; the approximate scan scores dequantized codes
    against the query (keyed agg on id), cuts a ``shortlist`` via
    TakeOrderedAndProject on the 4-dp ROUNDED approx score (the
    engine-stable cut, same convention as pq_topk), and only the
    shortlist pays exact-rerank cost. At 100 TB the code table is the
    only full-corpus artifact (1/16th the bytes); min/max per dim is a
    single mergeable agg, maintainable incrementally like the datacard
    monoids. Dequantization uses the mid-rise reconstruction
    mn + (code + 0.5) * (mx - mn) / 256 — all double arithmetic in a
    fixed association order so DuckDB replays it bit-for-bit."""
    comp = _components(df, id_col, vec_col)
    stats = comp.groupBy("i").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.least(
            F.lit(255),
            F.floor((F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 256),
        ),
    ).otherwise(F.lit(0))
    codes = comp.join(F.broadcast(stats), "i").select(
        id_col, "i", code.cast("bigint").alias("code")
    )
    q = comp.filter(F.col(id_col) == query_id).select("i", F.col("v").alias("qv"))
    dq = F.col("mn") + (F.col("code") + 0.5) * (F.col("mx") - F.col("mn")) / 256
    approx = (
        codes.join(F.broadcast(stats), "i")
        .join(F.broadcast(q), "i")
        .groupBy(id_col)
        .agg(F.round(F.sum(dq * F.col("qv")), 4).alias("sq8_score"))
        .filter(F.col(id_col) != query_id)
        .orderBy(F.col("sq8_score").desc(), F.col(id_col))
        .limit(shortlist)
    )
    exact = (
        comp.join(F.broadcast(approx.select(id_col, "sq8_score")), id_col)
        .join(F.broadcast(q), "i")
        .groupBy(id_col, "sq8_score")
        .agg(
            F.sum(F.col("v") * F.col("qv")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm"),
        )
    )
    qnorm = comp.filter(F.col(id_col) == query_id).agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("qnorm")
    )
    return (
        exact.crossJoin(F.broadcast(qnorm))
        .select(
            id_col,
            F.round(F.col("dot") / (F.col("norm") * F.col("qnorm")), 4).alias(
                "cosine"
            ),
            "sq8_score",
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_sq8_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 4,
    iters: int = 2,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF x SQ8 composition — the FAISS ``IVF<n>,SQ8`` index type:
    coarse cells prune the CANDIDATE SET (only the query's cell is
    scanned), scalar quantization shrinks the SCANNED BYTES (1
    byte/dim against corpus min/max), and the two savings multiply —
    the production shape this module's SQ8 docstring promises. The
    per-dim min/max stays corpus-global (one mergeable agg, shared by
    every cell), matching FAISS's default trained-on-all SQ.

    Plan: Lloyd assignment (broadcast centroids), a 1-row query-cell
    lookup broadcast into the member semi-join, SQ8 codes built for
    cell MEMBERS only, the 4-dp-rounded shortlist cut, then exact
    rerank — every stage either cell-scoped or d-sized."""
    comp = _components(df, id_col, vec_col)
    _, assign = kmeans_fit(df, id_col, vec_col, k=n_centroids, iters=iters)
    qcell = assign.filter(F.col(id_col) == query_id).select(
        F.col("cell").alias("qc")
    )
    members = (
        assign.crossJoin(F.broadcast(qcell))
        .filter((F.col("cell") == F.col("qc")) & (F.col(id_col) != query_id))
        .select(id_col)
    )
    stats = comp.groupBy("i").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    mcomp = comp.join(F.broadcast(members), id_col)
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.least(
            F.lit(255),
            F.floor((F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 256),
        ),
    ).otherwise(F.lit(0))
    codes = mcomp.join(F.broadcast(stats), "i").select(
        id_col, "i", code.cast("bigint").alias("code")
    )
    q = comp.filter(F.col(id_col) == query_id).select("i", F.col("v").alias("qv"))
    dq = F.col("mn") + (F.col("code") + 0.5) * (F.col("mx") - F.col("mn")) / 256
    approx = (
        codes.join(F.broadcast(stats), "i")
        .join(F.broadcast(q), "i")
        .groupBy(id_col)
        .agg(F.round(F.sum(dq * F.col("qv")), 4).alias("sq8_score"))
        .orderBy(F.col("sq8_score").desc(), F.col(id_col))
        .limit(shortlist)
    )
    exact = (
        comp.join(F.broadcast(approx.select(id_col, "sq8_score")), id_col)
        .join(F.broadcast(q), "i")
        .groupBy(id_col, "sq8_score")
        .agg(
            F.sum(F.col("v") * F.col("qv")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm"),
        )
    )
    qnorm = comp.filter(F.col(id_col) == query_id).agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("qnorm")
    )
    return (
        exact.crossJoin(F.broadcast(qnorm))
        .select(
            id_col,
            F.round(F.col("dot") / (F.col("norm") * F.col("qnorm")), 4).alias(
                "cosine"
            ),
            "sq8_score",
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def binary_codes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 48,
) -> DataFrame:
    """(id, code): pack ``n_planes`` random-hyperplane sign bits into
    ONE bigint per vector — binary quantization, the most compressed
    member of the quantization family (SQ8 = 1 byte/dim, PQ = codebook
    ids, this = n_planes BITS per vector regardless of dimension).
    Hamming distance between codes estimates angle (each agreeing bit
    is one hyperplane both vectors fall on the same side of), and a
    serve computes it as ``bit_count(code XOR qcode)`` — one CPU
    instruction per candidate. Plane coefficients are the same
    md5-derived constants as :func:`hyperplane_lsh_buckets`, so a
    DuckDB oracle packs bit-identical codes. n_planes <= 62 keeps the
    packed code inside a signed bigint."""
    assert n_planes <= 62
    spark = df.sparkSession
    coef = spark.createDataFrame(_coef_pdf(n_planes))
    comp = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("i", "v")
    ).withColumn("v", F.col("v").cast("double"))
    joined = comp.join(F.broadcast(coef), "i", "left")
    checked_v = F.when(
        F.assert_true(
            F.col("r0").isNotNull(),
            F.lit(f"vector dimension exceeds LSH_MAX_DIM={LSH_MAX_DIM}"),
        ).isNull(),
        F.col("v"),
    )
    joined = joined.withColumn("v", checked_v)
    proj = joined.groupBy(id_col).agg(
        *[
            F.sum(F.col("v") * F.col(f"r{p}")).alias(f"pr{p}")
            for p in range(n_planes)
        ]
    )
    code = F.lit(0).cast("bigint")
    for p in range(n_planes):
        code = code + F.when(
            F.col(f"pr{p}") >= 0, F.lit(1 << p).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return proj.select(F.col(id_col), code.alias("code"))


def binary_hamming_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    shortlist: int = 50,
    n_planes: int = 48,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized ANN serve: Hamming shortlist over packed codes
    (:func:`binary_codes`) -> exact cosine rerank of the survivors —
    ann19's SQ8 pattern at 48 BITS per vector instead of 1 byte per
    dimension. The code table broadcasts at almost any corpus size
    (8 bytes/vector); the Hamming cut is an integer heap; only
    ``shortlist`` vectors are ever read at full precision."""
    # the code table is THE stored index (8 bytes/vector) and its
    # build is the expensive stage (48 plane-projection sums over the
    # exploded corpus); un-pinned, the query-code filter and the
    # Hamming scan each re-ran that build (r15, guide §2.4)
    codes = binary_codes(df, id_col, vec_col, n_planes).localCheckpoint(
        eager=True
    )
    qcode = codes.filter(F.col(id_col) == query_id).select(
        F.col("code").alias("qcode")
    )
    ham = (
        codes.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(qcode))
        .select(
            id_col,
            F.bit_count(
                F.col("code").bitwiseXOR(F.col("qcode"))
            ).alias("hamming"),
        )
    )
    # 50 rows, two consumers (rerank member list + the hamming column
    # of the output) — pin so the n-row TakeOrdered runs once
    short = ham.orderBy("hamming", id_col).limit(shortlist).localCheckpoint(
        eager=True
    )
    return (
        _rerank_members(
            df, short.select(id_col), query_id, k, id_col, vec_col
        )
        .join(short, id_col)
        .select(
            id_col,
            "cosine",
            F.col("hamming").cast("bigint").alias("hamming"),
        )
    )
