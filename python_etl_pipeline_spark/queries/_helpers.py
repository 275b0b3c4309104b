"""Cross-family helper builders shared by several query families:
DuckDB token/quality/embedding-component SQL fragments, the banded
MinHash CTE builder, k-means iteration SQL, and the BM25 scoring
pair (Spark expression + oracle CTE).
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _t, AS_OF, REGISTRY, register  # noqa: F401

# ===========================================================================
# LLM-training-data operators: text analysis / dedup / similarity search
# ===========================================================================

_DUCK_TOKS = "string_split_regex(trim(text), '\\s+')"


_EN = "['the','a','of','and','to','in','is','it']"


# The tx2 composite-quality expression, re-stated once for the curation
# selection oracles below (DuckDB dialect; byte-identical to tx2's).
_DUCK_QUALITY = f"""round(0.4 * least(length(text) / 500.0, 1.0)
           + 0.3 * (1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text))
           + 0.3 * least(len(list_filter({_DUCK_TOKS}, x -> list_contains({_EN}, x))) * 1.0
                         / len({_DUCK_TOKS}) * 5.0, 1.0), 10)"""


def _minhash_ctes(
    n_hashes: int = 16,
    bands: int = 4,
    rows: int = 4,
    max_bucket_size: int | str | None = None,
    cap_floor: int = 100,
    source: str = "documents",
    suffix: str = "",
) -> str:
    """The MinHash+LSH candidate-pair pipeline as a reusable CTE body
    (ends with ``mh_pairs{suffix}(a, b)``) — shared by dd2 and the
    curation composite so their oracles stay in lock-step.
    ``max_bucket_size="auto"`` emits the derived-cap CTE chain
    (llm.caps.tukey_cap_sql_ctes) instead of a literal QUALIFY.
    ``source``/``suffix`` let one oracle instantiate the chain over
    two corpus snapshots (dd22's cross-snapshot delta): ``source`` is
    any table expression, ``suffix`` disambiguates the CTE names."""
    from ..llm.caps import tukey_cap_sql_ctes
    from ..llm.dedup import MINHASH_AB, MINHASH_P, _h32_sql, shingles_sql

    assert not (suffix and max_bucket_size == "auto"), (
        "the derived-cap CTE chain is not suffix-aware; use a literal cap"
    )
    sig_exprs = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS s{j}"
        for j, (a, b) in enumerate(MINHASH_AB[:n_hashes])
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS bh FROM sig{sfx}".format(
            b=b,
            sfx=suffix,
            concat=" || '|' || ".join(
                f"cast(s{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    if max_bucket_size == "auto":
        cap = tukey_cap_sql_ctes("bands", "band, bh", floor=cap_floor).lstrip()
    elif max_bucket_size is not None:
        cap = (
            f"capped{suffix} AS (SELECT doc_id, band, bh FROM bands{suffix} "
            f"QUALIFY count(*) OVER (PARTITION BY band, bh) <= {max_bucket_size})"
        )
    else:
        cap = f"capped{suffix} AS (SELECT * FROM bands{suffix})"
    return f"""
    sh{suffix} AS (
      SELECT doc_id, unnest(list_distinct({shingles_sql('text')})) AS s FROM {source}
    ),
    hv{suffix} AS (SELECT doc_id, {_h32_sql('md5(s)')} AS h FROM sh{suffix}),
    sig{suffix} AS (SELECT doc_id, {sig_exprs} FROM hv{suffix} GROUP BY doc_id),
    bands{suffix} AS ({band_selects}),
    {cap},
    mh_pairs{suffix} AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM capped{suffix} a JOIN capped{suffix} b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    )"""


_DUCK_COMP = """
  SELECT vec_id, generate_subscripts(embedding, 1) AS i, cast(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
"""


def _kmeans_iter_sql(prev: str, it: int) -> str:
    """One Lloyd iteration as a CTE pair: assign each vector to the
    nearest centroid of ``prev``, then average members per (cell, i)."""
    return f"""
    assign{it} AS (
      SELECT comp.vec_id, {prev}.cell,
             sum((comp.v - {prev}.v) * (comp.v - {prev}.v)) AS dist,
             row_number() OVER (
               PARTITION BY comp.vec_id
               ORDER BY sum((comp.v - {prev}.v) * (comp.v - {prev}.v)), {prev}.cell
             ) AS rn
      FROM comp JOIN {prev} ON comp.i = {prev}.i
      GROUP BY comp.vec_id, {prev}.cell
    ),
    cent{it} AS (
      SELECT a.cell, comp.i, avg(comp.v) AS v
      FROM assign{it} a JOIN comp ON comp.vec_id = a.vec_id
      WHERE a.rn = 1
      GROUP BY 1, 2
    )"""


_KMEANS_CHAINS = (
    f"{_kmeans_iter_sql('cent0', 1)},\n"
    f"{_kmeans_iter_sql('cent1', 2)},\n"
    f"{_kmeans_iter_sql('cent2', 3)},"
)


_BM25_TERMS = ["hash", "join", "stream"]


_BM25_K1 = 1.2


_BM25_B = 0.75


def _bm25_scores_sql() -> str:
    """Shared CTE block: (doc_id, score) BM25 scores for the fixed
    query over every matching document."""
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks
      WHERE tok IN ({terms}) GROUP BY 1, 2
    ),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    bm25 AS (
      SELECT tf.doc_id,
             sum(ln((cast(stats.n AS DOUBLE) - df.df + 0.5e0)
                    / (df.df + 0.5e0) + 1)
                 * tf.tf * ({_BM25_K1}e0 + 1)
                 / (tf.tf + {_BM25_K1}e0
                    * (1 - {_BM25_B}e0
                       + {_BM25_B}e0 * dl.dl / stats.avgdl)))
               AS score
      FROM tf
      JOIN df ON df.tok = tf.tok
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY 1
    )"""


def _bm25_scores_spark(d: DataFrame) -> DataFrame:
    """(doc_id, score) BM25 scores for the fixed query — the Spark
    twin of _bm25_scores_sql, shared by x69 and ann23.

    One-pass token stream: dl and the per-term tfs come out of a
    SINGLE groupBy(doc_id) over the explode (count + one conditional
    sum per fixed query term), then unpivot the term columns back to
    (doc_id, tok, tf) rows. The naive dl/tf split diverges BEFORE its
    first exchange (dl keys on doc_id, tf on (doc_id, tok)), so
    exchange reuse cannot cover it and the corpus was tokenized twice;
    this form tokenizes once, carries dl on the row (no dl join), and
    every doc-keyed consumer shares the one doc_id exchange. tf rows
    and arithmetic are byte-identical: stack emits tf=0 rows for
    absent terms, and the tf > 0 filter restores exactly the pairs the
    old groupBy(doc_id, tok) materialized."""
    from ..llm.text import tokens

    tok = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(
                F.when(F.col("tok") == t, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"_tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    stack_args = ", ".join(
        f"'{t}', _tf{i}" for i, t in enumerate(_BM25_TERMS)
    )
    tf = (
        per_doc.select(
            "doc_id",
            "dl",
            F.expr(
                f"stack({len(_BM25_TERMS)}, {stack_args}) AS (tok, tf)"
            ),
        )
        .filter(F.col("tf") > 0)
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1
                )
                * F.col("tf")
                * (_BM25_K1 + 1)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1
                        - _BM25_B
                        + _BM25_B * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("c"),
        )
    )
    return contrib.groupBy("doc_id").agg(F.sum("c").alias("score"))
