"""Similarity search over embedding columns (array<float>).

Two paths:

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


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float = 0.9,
) -> DataFrame:
    """All (a, b) pairs with cosine >= min_sim, a < b — embedding near-dup
    detection. Long-form self-join on component index: the join is keyed
    on ``i`` only here (all-pairs semantics); at scale, compose with an
    LSH/IVF bucket key prepended to the join key so only candidate pairs
    meet."""
    import numpy as np
    import pandas as pd

    # The broadcast side: in a full-table call this is the whole vector
    # set (fine up to ~10M x small-dim); at 100 TB the caller buckets
    # first (IVF cell / LSH band) and this runs per bucket. Collecting
    # ids+vectors only — never document payloads.
    rows = df.select(F.col(id_col), F.col(vec_col)).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sc = df.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat)

    def block(batches):
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ b_mat.value.T  # BLAS: the whole batch in one matmul
            ai, bi = np.nonzero(sims >= min_sim)
            pa, pb = a_ids[ai], b_ids.value[bi]
            keep = pa < pb
            yield pd.DataFrame({
                "a": pa[keep],
                "b": pb[keep],
                "cosine": np.round(sims[ai, bi][keep], 4),
            })

    # Arrow-batched Pandas UDF: each partition computes a (batch x all)
    # similarity block with one BLAS matmul — the vectorized escape hatch
    # for arithmetic Catalyst can't fuse (higher-order-function dot
    # products are interpreted per element).
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        block, schema="a bigint, b bigint, cosine double"
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


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed ANN: coarse-assign every vector to its nearest
    centroid (here: the first ``n_centroids`` stored vectors — the engine
    takes centroids as data; swap in k-means centroids at will), then
    search only the query's cell.

    Scale path: the centroid table broadcasts; assignment is one
    map-side pass; the final search touches ~1/n_centroids of rows.
    """
    comp = _components(df, id_col, vec_col)
    cent = comp.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("c"), "i", F.col("v").alias("cv")
    )
    norms = comp.groupBy(id_col).agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("norm"))
    cnorms = norms.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("c"), F.col("norm").alias("cnorm")
    )
    scored = (
        comp.join(F.broadcast(cent), "i")
        .groupBy(id_col, "c")
        .agg(F.sum(F.col("v") * F.col("cv")).alias("dot"))
        .join(norms, id_col)
        .join(F.broadcast(cnorms), "c")
        .select(id_col, "c", (F.col("dot") / (F.col("norm") * F.col("cnorm"))).alias("cos"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("c"))
    assign = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("c").alias("centroid"))
    )
    q_centroid = assign.filter(F.col(id_col) == query_id).select("centroid")
    cluster = (
        assign.join(F.broadcast(q_centroid), "centroid")
        .filter(F.col(id_col) != query_id)
        .select(id_col)
    )
    members = df.join(cluster, id_col, "left_semi")
    return brute_force_topk(
        members.unionByName(df.filter(F.col(id_col) == query_id)),
        query_id,
        k,
        id_col,
        vec_col,
    )
