"""Text analysis family (tx1-tx27): token stats, quality scoring, langid, LM scoring, DSIR, BM25 ranking, PMI, readability.

Mechanically split from the former flat queries.py (r10);
docstrings and within-family registration order unchanged.
"""

from ._shared import *  # noqa: F401,F403 — F, Window, scalar/op helpers, register
from ._shared import _t, AS_OF, REGISTRY, register  # noqa: F401
from ._helpers import (  # noqa: F401
    _DUCK_QUALITY,
    _DUCK_TOKS,
    _EN,
)

_DE = "['der','die','das','und','ist','ein','nicht']"


_ES = "['el','la','los','y','que','un','por']"


@register(
    "tx1_token_stats",
    f"""
    SELECT doc_id,
           cast(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
           cast(length(text) AS BIGINT) AS n_chars_actual,
           round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text), 4)
             AS punct_ratio
    FROM documents
    """,
)
def tx1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token/char counting + punctuation ratio — one
    projection, no shuffle, pipelined with the scan."""
    from ..llm import token_count, punct_ratio

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.round(punct_ratio(F.col("text")), 4).alias("punct_ratio"),
    )


@register(
    "tx2_quality_score",
    f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents
    )
    SELECT doc_id,
           round(0.4 * least(length(text) / 500.0, 1.0)
               + 0.3 * (1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text))
               + 0.3 * least(len(list_filter(toks, x -> list_contains({_EN}, x))) * 1.0
                             / len(toks) * 5.0, 1.0), 10) AS quality
    FROM t
    """,
)
def tx2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: composite quality score (length saturation, low
    punctuation noise, stopword naturalness)."""
    from ..llm import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


@register(
    "tx3_lang_id",
    f"""
    WITH t AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> list_contains({_EN}, x))) AS en,
             len(list_filter(toks, x -> list_contains({_DE}, x))) AS de,
             len(list_filter(toks, x -> list_contains({_ES}, x))) AS es
      FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN en >= de AND en >= es THEN 'en'
                WHEN de >= es THEN 'de'
                ELSE 'es' END AS pred_lang
    FROM s
    """,
)
def tx3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: stopword-overlap language-ID heuristic with
    deterministic tie-break."""
    from ..llm import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("pred_lang"),
    )


@register(
    "tx16_langid_confusion",
    f"""
    WITH t AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> list_contains({_EN}, x))) AS en,
             len(list_filter(toks, x -> list_contains({_DE}, x))) AS de,
             len(list_filter(toks, x -> list_contains({_ES}, x))) AS es
      FROM t
    ),
    p AS (
      SELECT lang AS labeled_lang,
             CASE WHEN en >= de AND en >= es THEN 'en'
                  WHEN de >= es THEN 'de'
                  ELSE 'es' END AS pred_lang
      FROM s
    ),
    m AS (SELECT labeled_lang, pred_lang, count(*) AS n_docs
          FROM p GROUP BY 1, 2)
    SELECT labeled_lang, pred_lang, n_docs,
           round(n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY labeled_lang), 4)
             AS frac_of_label
    FROM m
    """,
)
def tx16_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-metadata consistency check — the confusion matrix
    between the SOURCE-ASSIGNED language tag and the text-derived
    classifier prediction (tx3's heuristic). CCNet-style curation runs
    exactly this QA step: a source whose metadata disagrees with the
    classifier on most documents has broken tagging and its lang-based
    routing (corpus mix x27, per-lang budgets tx12) is garbage-in.
    Per (labeled, predicted) cell: document count and the row-relative
    fraction. One projection + one tiny (lang x lang) agg; the fraction
    window runs over the ~25-row matrix, never the corpus."""
    from ..llm import lang_id

    d = _t(spark, sf_dir, "documents")
    m = (
        d.select(
            F.col("lang").alias("labeled_lang"),
            lang_id(F.col("text")).alias("pred_lang"),
        )
        .groupBy("labeled_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )
    w = Window.partitionBy("labeled_lang")
    return m.select(
        "labeled_lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 4).alias(
            "frac_of_label"
        ),
    )


@register(
    "tx4_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def tx4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace/case-insensitive content fingerprint."""
    from ..llm import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "tx6_pii_redact",
    """
    WITH withpii AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or 9876543210 ssn 123-45-6789' AS t
      FROM documents
    )
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b\\d{10}\\b', '<PHONE>', 'g'),
                 '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g')) AS redacted_md5
    FROM withpii
    """,
)
def tx6_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: PII redaction pass (emails/phones/SSN-shaped ids ->
    typed placeholders). PII is planted deterministically so the scrub is
    observable; output is the md5 of the redacted text (keeps the compare
    payload small)."""
    from ..llm.text import redact_pii

    d = _t(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 9876543210 ssn 123-45-6789"),
    )
    return d.select("doc_id", F.md5(redact_pii(t)).alias("redacted_md5"))


@register(
    "tx7_repetition_ratio",
    f"""
    WITH sh AS (
      SELECT doc_id, {{SH}} AS s FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(s) > 0
                THEN round(1.0 - len(list_distinct(s)) * 1.0 / len(s), 10)
                ELSE 0.0 END AS rep_ratio
    FROM sh
    """,
)
def tx7_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: duplicated-n-gram fraction (Gopher-style repetition
    filter signal) — flags degenerate/looping text before training."""
    from ..llm.text import repetition_ratio

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", repetition_ratio(F.col("text")).alias("rep_ratio"))


def _finalize_tx7():
    from ..llm.dedup import shingles_sql

    REGISTRY["tx7_repetition_ratio"].sql = REGISTRY["tx7_repetition_ratio"].sql.replace(
        "{SH}", shingles_sql("text")
    )


_finalize_tx7()


@register(
    "tx5_top_tokens",
    f"""
    WITH toks AS (
      SELECT unnest({_DUCK_TOKS}) AS tok FROM documents
    )
    SELECT tok, count(*) AS n
    FROM toks GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def tx5_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: corpus token frequency top-k (vocabulary head) —
    explode + count + ordered limit with deterministic tie-break."""
    from ..llm import tokens

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "tx8_bpe_tokens",
    f"""
    SELECT doc_id,
           cast(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_tokens,
           cast(len(list_distinct(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT)
             AS n_unique
    FROM documents
    """,
)
def tx8_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counting: letter runs, digit runs, and
    single punctuation marks (the GPT-2 pre-tokenizer's coarse shape) via
    one regexp_extract_all — a pure projection, zero shuffles over a
    100 TB document scan."""
    d = _t(spark, sf_dir, "documents")
    toks = F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
    )


_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT cast(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(n.n / dfq.df) AS raw
  FROM tf JOIN dfq USING (term) CROSS JOIN n
)
SELECT doc_id, term, round(raw, 4) AS tfidf,
       cast(row_number() OVER (PARTITION BY doc_id ORDER BY raw DESC, term)
            AS BIGINT) AS rnk
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY raw DESC, term) <= 3
"""


@register("tx9_tfidf_keywords", _TFIDF_SQL)
def tx9_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    tf x ln(N/df). Two aggregations (term frequency per doc, document
    frequency per term — both map-side-combinable) + a broadcast of the
    tiny corpus-size scalar + one per-doc window. The df table is
    vocabulary-sized, not corpus-sized, so the join back to tf
    broadcast-hashes at any corpus scale once AQE sees its stats."""
    from ..llm.dedup import _spread
    from ..llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    tok = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("n"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("raw"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("raw").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            F.round("raw", 4).alias("tfidf"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def _bigram_lm_sql() -> str:
    from ..llm.dedup import shingles_sql

    bg = shingles_sql("text", 2)
    return f"""
    WITH inst AS (
      SELECT doc_id, unnest({bg}) AS bg FROM documents
    ),
    c12 AS (SELECT bg, count(*) AS c12 FROM inst GROUP BY 1),
    c1 AS (
      SELECT string_split(bg, ' ')[1] AS w1, sum(c12) AS c1
      FROM c12 GROUP BY 1
    )
    SELECT i.doc_id,
           round(avg(-ln(cast(c12.c12 AS DOUBLE) / c1.c1)), 4) AS avg_nll,
           count(*) AS n_bigrams
    FROM inst i
    JOIN c12 USING (bg)
    JOIN c1 ON string_split(i.bg, ' ')[1] = c1.w1
    GROUP BY 1
    """


@register("tx10_bigram_lm_score", None)  # sql attached below
def tx10_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring with a corpus bigram LM: each
    document's average negative log-likelihood -avg ln c(w1 w2)/c(w1 ·)
    under counts from the corpus itself (the cheap proxy for a
    perplexity filter a la CCNet/Gopher). Two count aggregations build
    the LM (bigram-vocabulary-sized, far smaller than the corpus); the
    instance table joins them back on the bigram string — a hash join
    keyed on vocabulary entries, then one groupBy(doc). Every bigram
    exists in its own LM so no smoothing term is needed; scores are
    deterministic and the DuckDB oracle replays the identical counts."""
    from ..llm.dedup import _spread, shingles

    d = _t(spark, sf_dir, "documents")
    inst = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(shingles(F.col("text"), 2)).alias("bg")
    )
    c12 = inst.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = (
        c12.select(F.split(F.col("bg"), " ")[0].alias("w1"), "c12")
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    # The per-bigram NLL depends on bg alone, so fold it into one
    # vocabulary-sized table BEFORE the corpus-sized instance stream
    # joins (r16, guide §1.2): one broadcast probe per instance
    # instead of two, and the per-instance split/cast/divide/ln
    # collapse to a lookup computed once per vocabulary entry. Same
    # join population and the identical per-instance float expression.
    nll = (
        c12.withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(c1, "w1")
        .select(
            "bg",
            (-F.log(F.col("c12").cast("double") / F.col("c1"))).alias("nll"),
        )
    )
    scored = inst.join(nll, "bg").select("doc_id", "nll")
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("nll"), 4).alias("avg_nll"),
        F.count("*").alias("n_bigrams"),
    )


REGISTRY["tx10_bigram_lm_score"].sql = _bigram_lm_sql()


def _tx17_sql() -> str:
    from ..llm.dedup import shingles_sql

    bg = shingles_sql("text", 2)
    return f"""
    WITH inst AS (
      SELECT doc_id, unnest({bg}) AS bg FROM documents
    ),
    c12 AS (SELECT bg, count(*) AS c12 FROM inst GROUP BY 1),
    c1 AS (
      SELECT string_split(bg, ' ')[1] AS w1, sum(c12) AS c1
      FROM c12 GROUP BY 1
    ),
    scored AS (
      SELECT i.doc_id,
             round(avg(-ln(cast(c12.c12 AS DOUBLE) / c1.c1)), 4) AS avg_nll
      FROM inst i
      JOIN c12 USING (bg)
      JOIN c1 ON string_split(i.bg, ' ')[1] = c1.w1
      GROUP BY 1
    ),
    ranked AS (
      SELECT doc_id, avg_nll,
             row_number() OVER (ORDER BY avg_nll, doc_id) AS rn,
             count(*) OVER () AS n
      FROM scored
    )
    SELECT doc_id, avg_nll,
           CASE WHEN rn <= ceil(n / 3.0) THEN 'head'
                WHEN rn <= ceil(2 * n / 3.0) THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """


@register("tx17_perplexity_buckets", None)  # sql attached below
def tx17_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): rank every document by its LM score (tx10's
    corpus bigram LM as the stand-in for the KenLM wiki model) and
    split the corpus into equal head/middle/tail terciles — head =
    lowest perplexity. CCNet trains on head+middle and drops or
    down-weights tail; the bucket column is the knob.

    Distributed shape: the LM scoring is tx10's plan (two
    vocabulary-sized count aggs + a hash join back); the doc-level
    score table is corpus-ROW-sized but tiny in bytes, checkpointed
    once, then the global tercile rank rides the partition-offset
    sequence engine — NOT a bare row_number()/ntile() over () — and the
    corpus count joins back as a 1-row broadcast. Scores are rounded to
    4 decimals BEFORE ranking on both sides so the rank (and thus every
    bucket boundary) is engine-stable: distinct rounded values differ
    by >= 1e-4, far above float noise, and exact ties break by doc_id."""
    from ..llm.dedup import _spread, shingles
    from ..operators.sequence import with_global_sequence

    d = _t(spark, sf_dir, "documents")
    inst = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(shingles(F.col("text"), 2)).alias("bg")
    )
    c12 = inst.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = (
        c12.select(F.split(F.col("bg"), " ")[0].alias("w1"), "c12")
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    # Per-bigram NLL folded to one vocabulary-sized table before the
    # instance stream joins — tx10's r16 rewrite (see there); one
    # broadcast probe per instance instead of two.
    nll = (
        c12.withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(c1, "w1")
        .select(
            "bg",
            (-F.log(F.col("c12").cast("double") / F.col("c1"))).alias(
                "__nll"
            ),
        )
    )
    scored = (
        inst.join(nll, "bg")
        .groupBy("doc_id")
        .agg(F.round(F.avg("__nll"), 4).alias("avg_nll"))
        # the LM join is the expensive stage and its doc-level output
        # feeds BOTH the rank and the corpus count — pin it once
        .localCheckpoint(eager=True)
    )
    ranked = with_global_sequence(scored, ["avg_nll", "doc_id"], name="rn")
    n = scored.agg(F.count("*").alias("__n"))
    return ranked.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "avg_nll",
        F.when(F.col("rn") <= F.ceil(F.col("__n") / 3.0), "head")
        .when(F.col("rn") <= F.ceil(2 * F.col("__n") / 3.0), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


REGISTRY["tx17_perplexity_buckets"].sql = _tx17_sql()


@register("tx19_incremental_lm_score", None)  # sql attached below
def tx19_incremental_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental bigram-LM maintenance: the LM behind the perplexity
    filter is two count tables, and counts are sum-monoids — so the
    state a growing corpus persists is the per-batch c12 partials
    (llm.lm, the same merge algebra as llm.datacard / i5), folded on
    arrival instead of rescanning history. Here the corpus arrives as
    three batches (doc_id % 3 stands in for arrival order), each
    batch's count state is built independently, the states are folded
    pairwise with plans.merge_agg_state, and every document is scored
    against the FOLDED counts. The oracle recomputes tx10 from scratch
    over the whole corpus — folded LM counts == full recompute, so the
    incremental path is exact, not approximate. Streaming twin:
    streaming.file_stream.stream_lm_state_available_now persists the
    same per-batch partials under batch_id=N with crash-redelivery
    idempotency. The bigram-instance table feeds all three batch
    states AND the scoring join, yet it is deliberately LAZY: the
    measured checkpoint trade (SCALE.md round-8 addendum) shows
    pinning this corpus-sized frame LOSES 26% at sf0.1 (3.33 vs
    2.64 s) and is a wash at 10x — re-running the explode is a cheap
    columnar scan, materializing N-bigram rows is not (the same
    inversion as the PQ-training checkpoint)."""
    from ..llm.lm import (
        bigram_instances,
        lm_count_state,
        lm_score_docs,
        merge_lm_states,
    )

    d = _t(spark, sf_dir, "documents")
    inst = bigram_instances(d)
    # Three per-batch aggs over the same instance table look like 3x
    # the shuffle, but AQE's exchange reuse amortizes them; a hand-
    # fused (batch, bg)-keyed single pass measured SLOWER (3.42 vs
    # 2.64 s at sf0.1 — it forces a second re-key shuffle into the
    # merge and loses the reuse), the same lesson as x43's ranking
    # (SCALE.md ledger). A real stream never faces the choice: each
    # batch is counted alone on arrival.
    states = [
        lm_count_state(inst.filter(F.col("doc_id") % 3 == k)) for k in range(3)
    ]
    c12 = merge_lm_states(merge_lm_states(states[0], states[1]), states[2])
    return lm_score_docs(inst, c12)


REGISTRY["tx19_incremental_lm_score"].sql = _bigram_lm_sql()


@register("tx20_incremental_tfidf", None)  # sql attached below (= tx9's)
def tx20_incremental_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental TF-IDF vocabulary state: tx9's IDF side needs only
    the per-term document frequency and the corpus size — both
    sum-monoids over a partition of the corpus into arrival batches
    (each document lives in exactly one batch, so per-batch df partials
    sum to the global df). The corpus arrives as three batches
    (doc_id % 3); each batch contributes its (term, df) partial and its
    doc count, the states fold via plans.merge_agg_state, and every
    document's top-3 keywords are scored against the FOLDED df table
    and count. The oracle recomputes tx9 from scratch — folded
    vocabulary state == full recompute, the third instance of the
    state-algebra pattern (datacard x41, LM counts tx19) and the one a
    keyword/search pipeline over a growing corpus actually persists:
    vocabulary-sized state, batch-sized arrival work, no history
    rescan. The tf side is batch-local by definition (a document's
    term counts never depend on other documents), so nothing else
    needs folding.

    Deliberately LAZY despite 4 consumers of the token explode — the
    checkpoint trade was measured three ways (SCALE.md round-8
    addendum): pinning the token-instance table is a wash at both
    scales; pinning the post-agg tf table wins 40% at sf0.1 but LOSES
    17% at 10x (1.27 vs 2.11 s, then 3.55 vs 3.03 s) — corpus-sized
    materializations grow linearly while the explode they save stays
    a near-free columnar scan, the same inversion as the PQ-training
    checkpoint. Lazy is the scale-safe default."""
    from ..plans import merge_agg_state
    from ..llm.dedup import _spread
    from ..llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    tok = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # three filtered per-batch aggs, NOT a hand-fused (batch, term)
    # pass: exchange reuse amortizes the repeats and the fused form
    # measured a wash (2.05 vs 2.11 s) while tx19's equivalent lost
    # 30% — see the ReusedExchange ledger entry in SCALE.md
    batch_dfs = [
        tf.filter(F.col("doc_id") % 3 == k)
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
        for k in range(3)
    ]
    dfq = merge_agg_state(
        merge_agg_state(batch_dfs[0], batch_dfs[1], ["term"], count_col="df"),
        batch_dfs[2],
        ["term"],
        count_col="df",
    )
    # corpus size folds the same way: one count per batch, summed
    n = d.groupBy((F.col("doc_id") % 3).alias("__b")).agg(
        F.count("*").alias("__c")
    ).agg(F.sum("__c").cast("double").alias("n"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("raw"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("raw").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            F.round("raw", 4).alias("tfidf"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


REGISTRY["tx20_incremental_tfidf"].sql = _TFIDF_SQL


_TX18_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, cast(ceil(len(t) / 16.0) AS INT)),
           i -> array_to_string(list_slice(t, i * 16 + 1, i * 16 + 16), ' ')
         )) AS chunk
  FROM toks
),
s AS (
  SELECT doc_id, string_split_regex(trim(chunk), '\\s+') AS ct FROM chunks
),
pred AS (
  SELECT doc_id,
         CASE WHEN len(list_filter(ct, x -> list_contains({_EN}, x)))
                   >= len(list_filter(ct, x -> list_contains({_DE}, x)))
               AND len(list_filter(ct, x -> list_contains({_EN}, x)))
                   >= len(list_filter(ct, x -> list_contains({_ES}, x)))
              THEN 'en'
              WHEN len(list_filter(ct, x -> list_contains({_DE}, x)))
                   >= len(list_filter(ct, x -> list_contains({_ES}, x)))
              THEN 'de'
              ELSE 'es' END AS cl
  FROM s
),
counts AS (SELECT doc_id, cl, count(*) AS c FROM pred GROUP BY 1, 2),
maj AS (
  SELECT doc_id, cl AS major_lang, c FROM counts
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, cl) = 1
),
tot AS (SELECT doc_id, sum(c) AS n_chunks FROM counts GROUP BY 1)
SELECT t.doc_id, m.major_lang, cast(t.n_chunks AS BIGINT) AS n_chunks,
       round(m.c * 1.0 / t.n_chunks, 4) AS major_frac,
       (m.c * 1.0 / t.n_chunks < 0.8) AS is_mixed
FROM tot t JOIN maj m USING (doc_id)
"""


@register("tx18_lang_consistency", _TX18_SQL)
def tx18_lang_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language document detection — the curation gate that
    catches concatenation artifacts (a crawler glues an English page to
    a German footer; a doc-level language ID happily labels the blend):
    language-ID every 16-token chunk (tx3's stopword heuristic, dd10's
    chunking), take the majority language per document, and flag docs
    whose majority covers <80% of chunks as mixed. Downstream either
    drops mixed docs or re-segments them.

    Distributed shape: chunking + per-chunk lang-ID is one explode +
    projection (no Python), then a (doc, lang) count agg — at most 3
    rows per doc — a doc-keyed majority window over those ≤3 rows, and
    a doc-keyed total join. All shuffles are doc-keyed; nothing scales
    with corpus size beyond the explode the chunker already pays."""
    from ..llm.text import lang_id

    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nchunks = F.ceil(F.size(toks) / F.lit(16.0)).cast("int")
    chunked = d.select(
        "doc_id",
        F.explode(
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
        ).alias("chunk"),
    )
    pred = chunked.select("doc_id", lang_id(F.col("chunk")).alias("cl"))
    counts = pred.groupBy("doc_id", "cl").agg(F.count("*").alias("c"))
    w = Window.partitionBy("doc_id").orderBy(F.col("c").desc(), "cl")
    maj = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cl").alias("major_lang"), "c")
    )
    tot = counts.groupBy("doc_id").agg(F.sum("c").alias("n_chunks"))
    return tot.join(maj, "doc_id").select(
        "doc_id",
        "major_lang",
        F.col("n_chunks").cast("bigint").alias("n_chunks"),
        F.round(F.col("c") / F.col("n_chunks"), 4).alias("major_frac"),
        (F.col("c") / F.col("n_chunks") < 0.8).alias("is_mixed"),
    )


_TX11_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F]', ' ', 'g'),
                               '\s+', ' ', 'g'))) AS norm_hash,
       length(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F]', ' ', 'g'),
                                  '\s+', ' ', 'g'))) AS norm_len
FROM documents
"""


@register("tx11_normalize_text", _TX11_SQL)
def tx11_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization pass (the cleanup every corpus gets before
    hashing/shingling so dedup keys aren't split by whitespace noise):
    control chars → space, whitespace runs collapsed, ends trimmed.
    Pure projection — fused into the scan, zero shuffles at any scale;
    output is the normalized md5 + length, i.e. exactly the dedup key
    dd1 would consume downstream."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "[\\x00-\\x1F]", " "), "\\s+", " "
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


@register(
    "tx12_token_budget",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             cast(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
             {_DUCK_QUALITY} AS quality
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang
                                 ORDER BY quality DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, n_tokens, cast(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= 8000
    """,
)
def tx12_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget corpus selection: within each language take
    documents best-first (quality desc, doc_id tiebreak) until the
    running token count exceeds the per-language budget — how a corpus
    is actually assembled against a token target rather than a doc
    count. Running sum over a (quality, doc_id) total order is
    deterministic on both engines; ROWS UNBOUNDED PRECEDING on each
    side. One shuffle keyed on lang; the sort is the same one the rank
    already needs, so the budget scan adds no extra exchange."""
    from ..llm import quality_score, token_count

    d = _t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select(
            "doc_id",
            "lang",
            token_count(F.col("text")).alias("n_tokens"),
            quality_score(F.col("text")).alias("quality"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= 8000)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


@register(
    "tx13_quality_topfrac",
    f"""
    WITH q AS (
      SELECT doc_id, lang, {_DUCK_QUALITY} AS quality FROM documents
    ),
    r AS (
      SELECT doc_id, lang, quality,
             row_number() OVER (PARTITION BY lang
                                ORDER BY quality DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM q
    )
    SELECT doc_id, lang, quality FROM r WHERE rk * 2 <= n + 1
    """,
)
def tx13_quality_topfrac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-fraction quality filter: keep the best
    ceil(n/2) documents of each language. Rank-based rather than
    threshold-based on purpose — a quantile *value* cutoff compares
    floats at the boundary where two engines' interpolation can differ
    by 1 ulp, while rank over a (quality, doc_id) total order is exact
    on both. Same single lang-keyed shuffle as tx12; rank and group
    count come out of one window sort."""
    from ..llm import quality_score

    d = _t(spark, sf_dir, "documents")
    wr = Window.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    wn = Window.partitionBy("lang")
    return (
        d.select("doc_id", "lang", quality_score(F.col("text")).alias("quality"))
        .withColumn("rk", F.row_number().over(wr))
        .withColumn("n", F.count("*").over(wn))
        .filter(F.col("rk") * 2 <= F.col("n") + 1)
        .select("doc_id", "lang", "quality")
    )


@register(
    "tx14_token_entropy",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ),
    cnt AS (
      SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
    )
    SELECT doc_id,
           cast(sum(c) AS BIGINT) AS n_tokens,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS token_entropy
    FROM cnt GROUP BY doc_id
    """,
)
def tx14_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the per-document token distribution — the
    gibberish/boilerplate signal: near-zero entropy is one token
    repeated (degenerate text), high entropy at low n is random noise.
    H = log2(n) - (Σ c·log2 c)/n, so one pass over (doc_id, tok) counts
    suffices — no per-token probability column, no second scan.

    Both groupBys key on doc_id (the second collapses the first's
    grouping), so Spark plans ONE exchange: partial map-side counts,
    then both final aggs colocated. Scales as a plain keyed agg."""
    d = _t(spark, sf_dir, "documents")
    from ..llm import tokens

    cnt = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 6
        ).alias("token_entropy"),
    )


@register(
    "tx15_gopher_rules",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CASE WHEN len(toks) > 0
                  THEN round(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                             * 1.0 / len(toks), 10) END AS mean_word_len,
             CASE WHEN len(toks) > 0
                  THEN round(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                             * 1.0 / len(toks), 10) END AS alpha_word_frac,
             len(list_distinct(list_filter(toks, x -> list_contains({_EN}, x))))
               AS stop_types
      FROM t
    )
    SELECT doc_id, cast(n_words AS BIGINT) AS n_words, mean_word_len,
           alpha_word_frac, cast(stop_types AS BIGINT) AS stop_types,
           (n_words BETWEEN 10 AND 100000
            AND mean_word_len BETWEEN 2.0 AND 12.0
            AND alpha_word_frac >= 0.8
            AND stop_types >= 2) AS keep
    FROM m
    """,
)
def tx15_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: the Gopher-style rule-based quality filter (Rae et
    al. 2021, arXiv:2112.11446 §A1.1 — the public rule set MassiveText
    filters with): word-count bounds, mean-word-length bounds, fraction
    of words containing an alphabetic character, and a minimum count of
    distinct stopword types. Emits every rule input plus the composite
    ``keep`` so downstream corpus builders can re-threshold without
    recomputing. One pure projection fused into the scan — zero
    shuffles, codegen'd end-to-end; ratios rounded at 10 dp (past every
    terminating decimal the int/int divisions produce, so no half-even
    vs half-up tie can split the engines)."""
    from ..llm import tokens
    from ..llm.text import EN_STOPWORDS

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    mean_word_len = F.when(n > 0, F.round(total_len / n, 10))
    alpha_frac = F.when(
        n > 0,
        F.round(F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n, 10),
    )
    stop_types = F.size(F.array_intersect(F.array_distinct(toks), stoplist))
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        stop_types.cast("bigint").alias("stop_types"),
        (
            n.between(10, 100000)
            & mean_word_len.between(2.0, 12.0)
            & (alpha_frac >= 0.8)
            & (stop_types >= 2)
        ).alias("keep"),
    )


_TX21_BUCKETS = 4096


def _tx21_sql() -> str:
    from ..llm.dedup import shingles_sql
    from ..operators.sampling import hash_bucket_sql

    bg = shingles_sql("text", 2)
    bk = hash_bucket_sql("bg", _TX21_BUCKETS)
    return f"""
    WITH inst AS (
      SELECT doc_id, lang, unnest({bg}) AS bg FROM documents
    ),
    b AS (SELECT doc_id, lang, {bk} AS bk FROM inst),
    ct AS (SELECT bk, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY 1),
    nt AS (SELECT count(*) AS nt FROM b WHERE lang = 'en'),
    cr AS (SELECT bk, count(*) AS cr FROM b GROUP BY 1),
    nr AS (SELECT count(*) AS nr FROM b),
    lam AS (
      SELECT cr.bk, cr.cr,
             ln((coalesce(ct.ct, 0) + 1.0) / (nt.nt + {_TX21_BUCKETS}))
             - ln((cr.cr + 1.0) / (nr.nr + {_TX21_BUCKETS})) AS lam
      FROM cr LEFT JOIN ct USING (bk), nt, nr
    ),
    g AS (SELECT sum(cr * lam) / sum(cr) AS g FROM lam),
    doc AS (
      SELECT b.doc_id, count(*) AS n_bigrams, sum(lam.lam) AS s
      FROM b JOIN lam USING (bk)
      GROUP BY 1
    )
    SELECT doc_id, n_bigrams, round(s, 4) AS log_weight,
           round(s / n_bigrams, 4) > round(g.g, 4) AS keep
    FROM doc, g
    """


@register("tx21_dsir_importance", None)  # sql attached below
def tx21_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023, arXiv:2302.03169 —
    Data Selection via Importance Resampling): score every raw document
    by how target-like its HASHED n-gram distribution is. Features are
    word bigrams hashed into a FIXED 4096-bucket table (the trick that
    makes the method 100 TB-feasible: model state is 2 x 4096 counts no
    matter the corpus size); the target here is the English slice, the
    raw distribution is the whole corpus; each doc's log importance
    weight is sum over its bigrams of ln p_target(bucket) -
    ln p_raw(bucket) with add-1 smoothing, and ``keep`` marks docs
    whose PER-BIGRAM average beats the corpus per-instance average
    (both sides 4-dp rounded, so the boolean is engine-deterministic;
    an absolute >0 cutoff would select nothing when heavy smoothing
    shifts all weights negative, while this relative form keeps its
    discriminative power at any corpus size). Plan: ONE fused
    bucket-keyed count agg (4096-row output, raw + target counts in the
    same pass, totals derived as sums over it), the lambda table
    BROADCAST back onto the instance stream, one doc-keyed agg — the
    corpus explode has exactly two consumers and never shuffles on
    anything wider than doc_id. The oracle replays the same hashed
    counts exactly."""
    from ..llm.dedup import _spread, shingles
    from ..operators.sampling import hash_bucket

    d = _t(spark, sf_dir, "documents")
    b = _spread(d.select("doc_id", "lang", "text")).select(
        "doc_id",
        "lang",
        F.explode(shingles(F.col("text"), 2)).alias("bg"),
    ).select(
        "doc_id", "lang", hash_bucket(F.col("bg"), _TX21_BUCKETS).alias("bk")
    )
    # ONE fused per-bucket pass: target (en) and raw counts come out of
    # the same 4096-row aggregate (count of a conditional vs count(*)),
    # and the totals nt/nr are SUMS over that table — so the bigram
    # explode has exactly two consumers (this agg + the doc join)
    # instead of five separate corpus-sized aggregations. Measured
    # 2.71 -> 2.40 s at sf0.1 and 9.36 -> 6.55 s at 10x (ratio 3.5x ->
    # 2.7x) with identical output (same algebra) — the residual cost
    # is the explode itself, which is the operator's data-sized floor.
    percell = b.groupBy("bk").agg(
        F.count("*").alias("cr"),
        F.count(F.when(F.col("lang") == "en", F.lit(1))).alias("ct"),
    )
    tot = percell.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    lam = (
        percell.crossJoin(F.broadcast(tot))
        .select(
            "bk",
            "cr",
            (
                F.log((F.col("ct") + 1.0) / (F.col("nt") + _TX21_BUCKETS))
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + _TX21_BUCKETS))
            ).alias("lam"),
        )
    )
    # corpus per-instance mean weight — the selection threshold ("more
    # target-like than the average raw bigram"); instance-weighted, so
    # it comes straight off the 4096-row lambda table, no second scan
    g = lam.agg((F.sum(F.col("cr") * F.col("lam")) / F.sum("cr")).alias("g"))
    doc = (
        b.join(F.broadcast(lam.select("bk", "lam")), "bk")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("lam").alias("s"))
    )
    return doc.crossJoin(F.broadcast(g)).select(
        "doc_id",
        "n_bigrams",
        F.round("s", 4).alias("log_weight"),
        (
            F.round(F.col("s") / F.col("n_bigrams"), 4) > F.round("g", 4)
        ).alias("keep"),
    )


REGISTRY["tx21_dsir_importance"].sql = _tx21_sql()


_TX22_K = 3  # k-gram length (tokens)


_TX22_W = 4  # winnowing window (k-gram hashes)


def _tx22_sql() -> str:
    from ..llm.dedup import _h32_sql, shingles_sql

    sh = shingles_sql("text", _TX22_K)
    return f"""
    WITH g0 AS (
      SELECT doc_id, generate_subscripts({sh}, 1) AS pos, unnest({sh}) AS gram
      FROM documents
    ),
    g AS (SELECT doc_id, pos, {_h32_sql("md5(gram)")} AS h FROM g0),
    cnt AS (SELECT doc_id, count(*) AS m FROM g GROUP BY 1),
    w AS (
      SELECT g.doc_id, g.pos, g.h, g.pos - off.o AS j
      FROM g JOIN cnt USING (doc_id),
           LATERAL unnest(range(0, {_TX22_W})) AS off(o)
      WHERE g.pos - off.o >= 1 AND g.pos - off.o <= cnt.m - {_TX22_W} + 1
    ),
    sel AS (
      SELECT doc_id, pos, h,
             row_number() OVER (
               PARTITION BY doc_id, j ORDER BY h, pos DESC
             ) AS rn
      FROM w
    ),
    fp AS (SELECT DISTINCT doc_id, pos, h FROM sel WHERE rn = 1),
    fph AS (SELECT DISTINCT doc_id, h FROM fp),
    shared AS (SELECT h FROM fph GROUP BY h HAVING count(*) >= 2),
    perdoc AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY 1),
    pershared AS (
      SELECT fph.doc_id, count(*) AS n_sh
      FROM fph JOIN shared USING (h) GROUP BY 1
    )
    SELECT d.doc_id,
           cast(coalesce(cnt.m, 0) AS BIGINT) AS n_grams,
           cast(coalesce(perdoc.n_fp, 0) AS BIGINT) AS n_fingerprints,
           cast(coalesce(pershared.n_sh, 0) AS BIGINT) AS n_shared
    FROM documents d
    LEFT JOIN cnt USING (doc_id)
    LEFT JOIN perdoc USING (doc_id)
    LEFT JOIN pershared USING (doc_id)
    """


@register("tx22_winnow_fingerprint", None)  # sql attached below
def tx22_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003, SIGMOD — the MOSS algorithm): hash every 3-token k-gram,
    slide a window of 4 hashes, select each window's minimum (ties to
    the RIGHTMOST position — the tie rule that gives winnowing its
    guarantee), and a position selected by ANY window is a
    fingerprint. The guarantee: any shared token run long enough to
    cover a window yields at least one IDENTICAL fingerprint in both
    docs — so `n_shared` (a doc's fingerprints that also occur in
    another doc) is a plagiarism/overlap signal with bounded density
    (~2/(w+1) of positions), the sampling-based middle ground between
    tx4's single whole-doc hash and dd3's full inverted index.
    Implementation: the window argmin is computed by exploding each
    hash into the <= 4 windows containing it and ranking (hash ASC,
    pos DESC) within (doc, window) — a 4x map-side fan-out plus one
    fine-grained window sort, no variable-length lookback, identical
    in both engines. At 100 TB the fan-out factor stays w (constant)
    and fingerprints are ~2/(w+1) of grams, so the cross-doc stage
    (the only corpus-wide shuffle) runs on a 40%-sampled hash table,
    not the corpus."""
    from ..llm.dedup import _h32, _spread, shingles

    d = _t(spark, sf_dir, "documents")
    inst = _spread(d.select("doc_id", "text")).select(
        "doc_id", F.posexplode(shingles(F.col("text"), _TX22_K)).alias("p0", "gram")
    )
    g = inst.select(
        "doc_id",
        (F.col("p0") + 1).alias("pos"),
        _h32(F.md5("gram")).alias("h"),
    )
    cnt = g.groupBy("doc_id").agg(F.count("*").alias("m"))
    w = (
        g.join(cnt, "doc_id")
        .select(
            "doc_id",
            "pos",
            "h",
            "m",
            F.explode(F.sequence(F.lit(0), F.lit(_TX22_W - 1))).alias("o"),
        )
        .withColumn("j", F.col("pos") - F.col("o"))
        .filter((F.col("j") >= 1) & (F.col("j") <= F.col("m") - _TX22_W + 1))
    )
    win = Window.partitionBy("doc_id", "j").orderBy(
        F.col("h").asc(), F.col("pos").desc()
    )
    fp = (
        w.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("doc_id", "pos", "h")
        .distinct()
        # three consumers (per-doc counts, the fingerprint-hash side,
        # the shared-hash side) each re-ran the 4x gram fan-out + the
        # fine-grained window sort — pin the selected fingerprints
        # (~2/(w+1) of gram rows, the table a production pipeline
        # persists as the winnowing index) once (r15 optimization,
        # guide §2.4)
        .localCheckpoint(eager=True)
    )
    fph = fp.select("doc_id", "h").distinct()
    shared = (
        fph.groupBy("h").agg(F.count("*").alias("nd")).filter(F.col("nd") >= 2)
    )
    perdoc = fp.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    pershared = (
        fph.join(shared.select("h"), "h").groupBy("doc_id").agg(
            F.count("*").alias("n_sh")
        )
    )
    z = F.lit(0).cast("bigint")
    return (
        d.select("doc_id")
        .join(cnt, "doc_id", "left")
        .join(perdoc, "doc_id", "left")
        .join(pershared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("m"), z).alias("n_grams"),
            F.coalesce(F.col("n_fp"), z).alias("n_fingerprints"),
            F.coalesce(F.col("n_sh"), z).alias("n_shared"),
        )
    )


REGISTRY["tx22_winnow_fingerprint"].sql = _tx22_sql()


def _tx23_sql() -> str:
    from ..llm.text import EN_STOPWORDS

    stop = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
    return f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id, toks, len(toks) AS n_words,
             CASE WHEN len(toks) > 0
                  THEN round(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                             * 1.0 / len(toks), 10) END AS mwl,
             CASE WHEN len(toks) > 0
                  THEN round(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                             * 1.0 / len(toks), 10) END AS af,
             len(list_distinct(list_filter(toks, x -> list_contains({stop}, x))))
               AS st
      FROM t
    ),
    lab AS (
      SELECT doc_id, toks,
             (n_words BETWEEN 10 AND 100000 AND mwl BETWEEN 2.0 AND 12.0
              AND af >= 0.8 AND st >= 2) AS keep
      FROM m
    ),
    inst AS (SELECT doc_id, keep, unnest(toks) AS tok FROM lab),
    ct AS (
      SELECT tok,
             sum(CASE WHEN keep THEN 1 ELSE 0 END) AS cg,
             sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS cb
      FROM inst GROUP BY 1
    ),
    tots AS (
      SELECT sum(cg) AS ng, sum(cb) AS nb, count(*) AS v FROM ct
    ),
    pri AS (
      SELECT ln(sum(CASE WHEN keep THEN 1.0 ELSE 0.0 END)
                / sum(CASE WHEN NOT keep THEN 1.0 ELSE 0.0 END)) AS prior
      FROM lab
    ),
    llr AS (
      SELECT tok,
             ln((cg + 1.0) / (ng + v)) - ln((cb + 1.0) / (nb + v)) AS llr
      FROM ct, tots
    ),
    dt AS (SELECT doc_id, tok, count(*) AS c FROM inst GROUP BY 1, 2),
    sc AS (
      SELECT dt.doc_id, sum(dt.c * llr.llr) AS s
      FROM dt JOIN llr USING (tok) GROUP BY 1
    )
    SELECT lab.doc_id, lab.keep AS heur_keep,
           round(pri.prior + sc.s, 4) AS nb_score,
           (pri.prior + sc.s > 0) AS nb_keep
    FROM sc JOIN lab USING (doc_id), pri
    """


@register("tx23_nb_quality_score", None)  # sql attached below
def tx23_nb_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering, the CCNet / fastText /
    FineWeb-Edu pattern: train a cheap linear classifier on heuristic
    labels, then score EVERY document with it — the smooth score
    generalizes past the hard rule edges and gives curators a
    re-thresholdable dial where tx15's boolean can only keep/drop.
    Here the heuristic teacher is tx15's Gopher rule composite and the
    student is multinomial naive Bayes with Laplace smoothing, trained
    IN-PLAN: per-class token counts -> per-token log-likelihood ratio
    llr(t) = ln((c_good+1)/(N_good+V)) - ln((c_bad+1)/(N_bad+V)), and
    score(d) = ln(P_good/P_bad) + sum_t c(d,t)*llr(t). Emits both the
    teacher label and the student's score/decision per doc, so the
    disagreement set (the docs worth human review) falls out of a
    filter.

    Plan shape, same economics as tx9/tx10: the model tables are
    VOCABULARY-sized (per-token class counts) plus three scalar
    broadcasts (class totals, vocab size, prior); the corpus-sized
    stages are the (doc, tok) count and one doc-keyed sum — no
    corpus-sized shuffle beyond what the token explode already pays,
    so at 100 TB the model is a dim-table join, not a second scan.
    Reference analog: the rule-based cleanse of src/transform.py
    lifted to a learned score."""
    from ..llm.text import EN_STOPWORDS, tokens

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    mwl = F.when(n > 0, F.round(total_len / n, 10))
    af = F.when(
        n > 0,
        F.round(F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n, 10),
    )
    st = F.size(F.array_intersect(F.array_distinct(toks), stoplist))
    lab = d.select(
        "doc_id",
        toks.alias("toks"),
        (
            n.between(10, 100000)
            & mwl.between(2.0, 12.0)
            & (af >= 0.8)
            & (st >= 2)
        ).alias("keep"),
    )
    inst = lab.select("doc_id", "keep", F.explode("toks").alias("tok"))
    ct = inst.groupBy("tok").agg(
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("cg"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("cb"),
    )
    tots = ct.agg(
        F.sum("cg").alias("ng"), F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    pri = lab.agg(
        F.log(
            F.sum(F.when(F.col("keep"), 1.0).otherwise(0.0))
            / F.sum(F.when(~F.col("keep"), 1.0).otherwise(0.0))
        ).alias("prior")
    )
    llr = ct.crossJoin(F.broadcast(tots)).select(
        "tok",
        (
            F.log((F.col("cg") + 1.0) / (F.col("ng") + F.col("v")))
            - F.log((F.col("cb") + 1.0) / (F.col("nb") + F.col("v")))
        ).alias("llr"),
    )
    dt = inst.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    sc = (
        dt.join(llr, "tok")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("llr")).alias("s"))
    )
    return (
        sc.join(lab.select("doc_id", "keep"), "doc_id")
        .crossJoin(F.broadcast(pri))
        .select(
            "doc_id",
            F.col("keep").alias("heur_keep"),
            F.round(F.col("prior") + F.col("s"), 4).alias("nb_score"),
            ((F.col("prior") + F.col("s")) > 0).alias("nb_keep"),
        )
    )


REGISTRY["tx23_nb_quality_score"].sql = _tx23_sql()


def _tx24_sql() -> str:
    from ..llm.dedup import shingles_sql

    sh = shingles_sql("text", 3)
    return f"""
    WITH ds AS (
      SELECT doc_id, unnest(list_distinct({sh})) AS s FROM documents
    ),
    dfq AS (SELECT s, count(*) AS df FROM ds GROUP BY 1)
    SELECT ds.doc_id,
           cast(count(*) AS BIGINT) AS n_shingles,
           cast(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS novelty
    FROM ds JOIN dfq USING (s)
    GROUP BY 1
    """


@register("tx24_novelty_score", None)  # sql attached below
def tx24_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-novelty scoring: the fraction of a document's distinct
    3-gram shingles that appear NOWHERE else in the corpus — dd3's
    inverted index read in the opposite direction. Near-dup detection
    asks "who shares my shingles"; a curation mixer asks the dual:
    "which documents bring shingles nobody else has" — the
    upweight-the-tail signal (high novelty = unique content worth
    keeping at full budget; near-zero novelty = template mass that
    x44/x55's caps should squeeze), and the cheap proxy for the
    memorization-risk audits that count how much of a document is
    corpus-unique before training.

    Plan shape: the (doc, shingle)-type explode feeds (a) the
    document-frequency table — VOCABULARY-sized, the same economics as
    tx9's df — and (b) a hash join back keyed on the shingle, then one
    doc-keyed agg. df=1 shingles dominate real corpora, so unlike
    dd3's candidate join (which caps posting lists to bound pair
    fan-out) this consumes the df table whole: a count, not a pair
    enumeration — no cap needed at any scale. Reference analog: the
    duplicate counters of src/transform.py (A6) inverted from "how
    many copies" to "how much is mine alone"."""
    from ..llm.dedup import _spread, shingles

    d = _t(spark, sf_dir, "documents")
    ds = _spread(d.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("s"),
    )
    dfq = ds.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        ds.join(dfq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias("novelty"),
        )
    )


REGISTRY["tx24_novelty_score"].sql = _tx24_sql()


_TX26_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
         greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g')))
           AS n_sentences
  FROM documents
),
m AS (
  SELECT doc_id, len(toks) AS n_words, n_sentences,
         list_aggregate(list_transform(toks, x ->
           greatest(1,
             length(regexp_replace(lower(x), '[aeiouy]+', 'V', 'g'))
             - length(replace(regexp_replace(lower(x), '[aeiouy]+', 'V', 'g'),
                              'V', '')))), 'sum') AS n_syllables
  FROM t WHERE len(toks) > 0
)
SELECT doc_id, cast(n_words AS BIGINT) AS n_words,
       cast(n_sentences AS BIGINT) AS n_sentences,
       cast(n_syllables AS BIGINT) AS n_syllables,
       -- flesch to 2 dp via EXACT integer half-up rounding of the
       -- rational (N/D)*? -- see the Spark twin for the tie story
       (((200 * (206835 * n_sentences * n_words
                 - 1015 * n_words * n_words
                 - 84600 * n_syllables * n_sentences
                 + 1000000 * n_sentences * n_words)
          + 1000 * n_sentences * n_words)
         // (2000 * n_sentences * n_words)) - 100000) / 100.0 AS flesch
FROM m
"""


@register("tx26_readability", _TX26_SQL)
def tx26_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    score (206.835 - 1.015*words/sentences - 84.6*syllables/word)
    with the standard cheap proxies: sentences = terminal-punctuation
    count (floored at 1), syllables = vowel GROUPS per word (floored
    at 1 — 'strength' has one group, 'audio' three). Readability is a
    curation axis orthogonal to tx15's structural rules and tx23's
    learned score: a kids-corpus mix target, a legal-text detector,
    or a curriculum key (x42 ordered by perplexity; reading ease is
    the human-facing analog). Both engines count groups by the same
    collapse-to-sentinel trick (regexp_replace group -> 'V', count
    the V's), so the score is engine-exact.

    Plan shape: the zero-shuffle ideal — every column is a map-side
    expression over the token array (F.aggregate/F.transform; no
    explode, no exchange of any kind), x53's economics applied to
    scoring. Reference analog: the per-row banding functions of
    src/transform.py (F6/F10), upgraded to a composite linguistic
    score."""
    from ..llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_words = F.size(toks)
    n_sentences = F.greatest(
        F.lit(1),
        F.length(F.regexp_replace(F.col("text"), r"[^.!?]", "")),
    )
    groups = lambda t: F.regexp_replace(F.lower(t), "[aeiouy]+", "V")  # noqa: E731
    syl = lambda t: F.greatest(  # noqa: E731
        F.lit(1),
        F.length(groups(t))
        - F.length(F.regexp_replace(groups(t), "V", "")),
    )
    n_syllables = F.aggregate(
        F.transform(toks, syl), F.lit(0), lambda a, x: a + x
    )
    out = d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sentences.cast("bigint").alias("n_sentences"),
        n_syllables.cast("bigint").alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    # flesch = N/D with N = 206835*s*w - 1015*w^2 - 84600*y*s and
    # D = 1000*s*w — an exact rational. Rounding THAT to 2 dp in
    # doubles hits engine-split ties (Spark rounds the shortest
    # decimal repr half-up, DuckDB rounds the double — 85.165 split
    # them in testing), so the half-up round happens in EXACT bigint
    # arithmetic: floor((200N + D) / (2D)) / 100 — computed on a
    # +1000-shifted value so the dividend is always positive
    # (truncating and flooring division agree, sidestepping the
    # engines' negative-division split observed in testing).
    w_, s_, y_ = F.col("n_words"), F.col("n_sentences"), F.col("n_syllables")
    n_num = (
        F.lit(206835) * s_ * w_ - F.lit(1015) * w_ * w_
        - F.lit(84600) * y_ * s_
        + F.lit(1000000) * s_ * w_  # +1000 flesch points, removed below
    )
    d_den = F.lit(1000) * s_ * w_
    # decimal (not double) division keeps the quotient exact past
    # 2^53 — a 10^6-token document would otherwise overflow double
    # integer precision and split the engines by one ulp at the cut
    flesch_c = (
        F.floor(
            (200 * n_num + d_den).cast("decimal(38,0)")
            / (2 * d_den).cast("decimal(38,0)")
        ).cast("bigint")
        - F.lit(100000)
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (flesch_c / 100.0).alias("flesch"),
    )


_TX27_SQL = """
WITH dtok AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(
           string_split_regex(trim(text), '\\s+'))) AS tok
  FROM documents
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM dtok),
df AS (SELECT tok, count(*) AS df FROM dtok GROUP BY 1),
pairs AS (
  SELECT a.tok AS ta, b.tok AS tb, count(*) AS c
  FROM dtok a JOIN dtok b
    ON b.doc_id = a.doc_id AND a.tok < b.tok
  GROUP BY 1, 2 HAVING count(*) >= 5
),
scored AS (
  SELECT ta, tb, c,
         ln(c * cast(n.n_docs AS DOUBLE) / (fa.df * fb.df)) AS pmi
  FROM pairs
  JOIN df fa ON fa.tok = pairs.ta
  JOIN df fb ON fb.tok = pairs.tb
  CROSS JOIN n
)
SELECT ta, tb, cast(c AS BIGINT) AS n_docs_together,
       round(pmi, 4) AS pmi,
       cast(row_number() OVER (ORDER BY pmi DESC, ta, tb) AS BIGINT)
         AS rnk
FROM scored
QUALIFY rnk <= 20
"""


@register("tx27_pmi_collocations", _TX27_SQL, first_round=9)
def tx27_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level PMI collocation mining: for every token pair
    co-occurring in >= 5 documents, the pointwise mutual information
    ln(P(a,b) / (P(a)P(b))) of their document co-occurrence — the
    classic collocation/phrase-mining signal (and the association
    matrix topic models start from). tx5 ranks tokens by frequency and
    tx9 ranks terms within a doc; this ranks PAIRS by how much more
    often they travel together than independence predicts.

    Plan shape: the pair build is a doc-keyed self-join over the
    DISTINCT (doc, token) table — fan-out per doc is the distinct-
    token count (bounded by document length, not corpus size, the
    same basket-bound argument as x68); df and the doc count are
    vocabulary-/single-row-sized broadcasts; the top-20 cut compiles
    to TakeOrderedAndProject."""
    from ..llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    dtok = d.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
    ).distinct()
    n = dtok.agg(F.countDistinct("doc_id").alias("n_docs"))
    df = dtok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    a, b = dtok.alias("pa"), dtok.alias("pb")
    pairs = (
        a.join(
            b,
            (F.col("pb.doc_id") == F.col("pa.doc_id"))
            & (F.col("pa.tok") < F.col("pb.tok")),
        )
        .groupBy(F.col("pa.tok").alias("ta"), F.col("pb.tok").alias("tb"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 5)
    )
    fa = df.select(F.col("tok").alias("ta"), F.col("df").alias("dfa"))
    fb = df.select(F.col("tok").alias("tb"), F.col("df").alias("dfb"))
    scored = (
        pairs.join(F.broadcast(fa), "ta")
        .join(F.broadcast(fb), "tb")
        .crossJoin(F.broadcast(n))
        .select(
            "ta", "tb", "c",
            F.log(
                F.col("c")
                * F.col("n_docs").cast("double")
                / (F.col("dfa") * F.col("dfb"))
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), "ta", "tb")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select(
            "ta", "tb",
            F.col("c").cast("bigint").alias("n_docs_together"),
            F.round("pmi", 4).alias("pmi"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_TX25_TOP = 50  # Zipf fit over the top-k token frequencies


_TX25_SQL = f"""
WITH toks AS (
  SELECT source, unnest({{toks}}) AS tok FROM documents
),
freq AS (SELECT tok, count(*) AS f FROM toks GROUP BY 1),
top AS (
  SELECT tok, f,
         row_number() OVER (ORDER BY f DESC, tok) AS r
  FROM freq ORDER BY f DESC, tok LIMIT {_TX25_TOP}
),
zipf AS (
  SELECT (sum(ln(r) * ln(f)) - sum(ln(r)) * sum(ln(f)) / count(*))
         / (sum(ln(r) * ln(r)) - sum(ln(r)) * sum(ln(r)) / count(*))
           AS slope
  FROM top
),
per_src AS (
  SELECT source, count(*) AS n, count(DISTINCT tok) AS v
  FROM toks GROUP BY 1
),
heaps AS (
  SELECT (sum(ln(n) * ln(v)) - sum(ln(n)) * sum(ln(v)) / count(*))
         / (sum(ln(n) * ln(n)) - sum(ln(n)) * sum(ln(n)) / count(*))
           AS beta
  FROM per_src
),
tot AS (
  SELECT sum(n) AS n_tokens,
         (SELECT count(*) FROM freq) AS vocab
  FROM per_src
)
SELECT cast(n_tokens AS BIGINT) AS n_tokens,
       cast(vocab AS BIGINT) AS vocab,
       round(zipf.slope, 4) AS zipf_slope,
       round(heaps.beta, 4) AS heaps_beta
FROM tot, zipf, heaps
"""


@register("tx25_zipf_heaps", None)  # sql attached below
def tx25_zipf_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics sanity panel: the Zipf slope (log-log
    regression of the top-50 token frequencies against rank — healthy
    natural text sits near -1) and the Heaps exponent (log-log
    regression of per-source vocabulary against token count — natural
    text grows vocabulary sub-linearly, beta in ~[0.4, 0.9]). These
    two numbers are the cheapest corpus-health fingerprints there
    are: machine-generated spam flattens the Zipf slope, boilerplate
    mass collapses Heaps growth, and a feed whose fingerprint MOVES
    between snapshots has changed generator — the corpus-level
    companion to x54's per-source drift. Both slopes are closed-form
    least squares computed as plain aggregates (no iteration, no ML
    library).

    Plan shape: one token explode feeds the frequency table
    (vocabulary-sized) and the per-source (N, V) table (catalog-
    sized); the Zipf fit runs on 50 rows cut by a heap
    (TakeOrderedAndProject), the Heaps fit on the source catalog —
    everything after the two keyed aggs is metadata-sized.
    Reference analog: src/load.py's summary statistics, upgraded
    from row counts to distribution-shape diagnostics."""
    from ..llm.text import tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    # NOT rewritten through a shared (source, token) count table (r15
    # A/B): that form measured 1.03 -> 1.83 s isolated — the
    # high-cardinality (source, tok) partial agg + pin costs more
    # than letting freq and per_src each re-run the cheap explode.
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    top = (
        freq.orderBy(F.col("f").desc(), "tok")
        .limit(_TX25_TOP)
        .select(
            "f",
            F.row_number()
            .over(Window.orderBy(F.col("f").desc(), "tok"))
            .alias("r"),
        )
    )

    def _slope(df, xc, yc):
        x, y = F.log(F.col(xc)), F.log(F.col(yc))
        n = F.count(F.lit(1))
        return df.agg(
            (
                (F.sum(x * y) - F.sum(x) * F.sum(y) / n)
                / (F.sum(x * x) - F.sum(x) * F.sum(x) / n)
            ).alias("slope")
        )

    zipf = _slope(top, "r", "f").withColumnRenamed("slope", "zslope")
    per_src = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("tok").alias("v")
    )
    heaps = _slope(per_src, "n", "v").withColumnRenamed("slope", "beta")
    tot = per_src.agg(F.sum("n").alias("n_tokens")).crossJoin(
        freq.agg(F.count(F.lit(1)).alias("vocab"))
    )
    return (
        tot.crossJoin(F.broadcast(zipf))
        .crossJoin(F.broadcast(heaps))
        .select(
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("vocab").cast("bigint").alias("vocab"),
            F.round("zslope", 4).alias("zipf_slope"),
            F.round("beta", 4).alias("heaps_beta"),
        )
    )


def _tx25_sql() -> str:
    return _TX25_SQL.format(toks=_DUCK_TOKS)


REGISTRY["tx25_zipf_heaps"].sql = _tx25_sql()


_TX28_K = 3  # keywords kept per document

_TX28_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
),
terms AS (
  SELECT doc_id, tok AS term, count(*) AS freq
  FROM toks
  WHERE tok <> '' AND NOT list_contains({_EN}, tok)
  GROUP BY 1, 2
),
ranked AS (
  SELECT doc_id, term, freq,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY freq DESC, term) AS rnk
  FROM terms
)
SELECT doc_id, term, cast(freq AS BIGINT) AS freq,
       cast(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_TX28_K}
"""


@register("tx28_rake_keywords", _TX28_SQL, first_round=10)
def tx28_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction (RAKE-style degree scoring, reduced to its
    unigram core on this whitespace corpus): the top-3 non-stopword
    terms per document by in-document frequency — the per-doc tag set
    a curation pipeline uses for topic bucketing and mixture audits,
    complementing tx24's corpus-level novelty with a document-level
    label.

    Plan shape: explode -> one (doc, term) hash agg -> doc-keyed
    row_number window with the rank<=k filter compiled as a window
    GROUP LIMIT (each task keeps only k rows per doc before the
    exchange). Everything is doc-partitioned; no global stage."""
    from ..llm.dedup import _spread
    from ..llm.text import EN_STOPWORDS

    d = _t(spark, sf_dir, "documents")
    toks = _spread(d.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    )
    terms = (
        toks.filter(
            (F.col("tok") != "") & ~F.col("tok").isin(EN_STOPWORDS)
        )
        .groupBy("doc_id", F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("freq").desc(), "term"
    )
    return (
        terms.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TX28_K)
        .select(
            "doc_id", "term", "freq",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_TX29_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
),
tf AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
),
agg AS (
  SELECT doc_id,
         sum(c) AS n,
         count(*) AS v,
         sum(-1e0 * c * ln(c)) AS sclogc
  FROM tf GROUP BY 1
)
SELECT doc_id,
       cast(n AS BIGINT) AS n_tokens,
       cast(v AS BIGINT) AS n_types,
       round(v / (1e0 * n), 4) AS ttr,
       round(CASE WHEN n = 1 THEN 0e0
                  ELSE (ln(n) + sclogc / n) / ln(2e0) END, 4)
         AS entropy_bits
FROM agg
"""


@register("tx29_lexical_diversity", _TX29_SQL, first_round=10)
def tx29_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity scoring per document: type-token ratio and
    unigram Shannon entropy (bits) — the low-diversity detector that
    catches template/boilerplate spam which length- and stopword-based
    quality gates (tx2, tx15) pass: a 500-token page of one repeated
    phrase has perfect length stats and near-zero entropy.

    Numeric design: entropy is folded as H = ln(n) + sum(-c ln c)/n
    (one pass over the (doc, term) counts; no per-term division), so
    the only floats are ln() of exact integers combined in one
    deterministic aggregation per doc, then round(4) on both engines.

    Plan shape: explode -> (doc, term) hash agg -> doc hash agg; both
    aggs are doc-keyed with map-side partials. The explode is the
    same one-pass token fan-out every tx operator pays; nothing is
    corpus-global."""
    from ..llm.dedup import _spread

    d = _t(spark, sf_dir, "documents")
    tf = (
        _spread(d.select("doc_id", "text"))
        .select(
            "doc_id",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("v"),
        F.sum(-F.col("c") * F.log("c")).alias("sclogc"),
    )
    n = F.col("n")
    return agg.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.col("v").cast("bigint").alias("n_types"),
        F.round(F.col("v") / n, 4).alias("ttr"),
        F.round(
            F.when(n == 1, F.lit(0.0)).otherwise(
                (F.log(n) + F.col("sclogc") / n) / F.log(F.lit(2.0))
            ),
            4,
        ).alias("entropy_bits"),
    )


_TX30_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_TX30_PHONE = r"\b\d{10}\b"
_TX30_SSN = r"\b\d{3}-\d{2}-\d{4}\b"

_TX30_SQL = f"""
WITH withpii AS (
  SELECT source,
         text || CASE WHEN doc_id % 3 = 0
                      THEN ' contact user' || doc_id ||
                           '@example.com or 9876543210 ssn 123-45-6789'
                      ELSE '' END AS t
  FROM documents
),
per_doc AS (
  SELECT source,
         len(string_split_regex(trim(t), '\\s+')) AS toks,
         len(regexp_extract_all(t, '{_TX30_EMAIL}')) AS emails,
         len(regexp_extract_all(t, '{_TX30_PHONE}')) AS phones,
         len(regexp_extract_all(t, '{_TX30_SSN}')) AS ssns
  FROM withpii
)
SELECT source,
       cast(sum(toks) AS BIGINT) AS n_tokens,
       cast(sum(emails) AS BIGINT) AS n_emails,
       cast(sum(phones) AS BIGINT) AS n_phones,
       cast(sum(ssns) AS BIGINT) AS n_ssns,
       round(1e4 * (sum(emails) + sum(phones) + sum(ssns))
             / sum(toks), 4) AS pii_per_10k_tokens
FROM per_doc GROUP BY source
"""


@register("tx30_pii_density_audit", _TX30_SQL, first_round=11)
def tx30_pii_density_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII density audit — the measurement side of tx6's
    redaction: occurrences of email/phone/SSN shapes per 10k tokens,
    by source. A training-data pipeline uses this to RANK sources for
    scrubbing priority and to verify a redaction pass actually drove
    the density to zero; tx6 transforms documents one by one, this
    aggregates the corpus-level exposure. PII is planted
    deterministically on every third document so the audit has known
    ground truth at any scale.

    Plan shape: all three regex counts are map-side JVM codegen
    (regexp_count — no UDF, no explode; the token count is a split
    length, not a token explode), folded by ONE source-keyed agg with
    map-side partials. Exact integer counts; only the final density
    divides."""
    d = _t(spark, sf_dir, "documents")
    t = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 9876543210 ssn 123-45-6789"),
        ),
    ).otherwise(F.col("text"))
    per_doc = d.select(
        "source",
        F.size(F.split(F.trim(t), r"\s+")).alias("toks"),
        F.regexp_count(t, F.lit(_TX30_EMAIL)).alias("emails"),
        F.regexp_count(t, F.lit(_TX30_PHONE)).alias("phones"),
        F.regexp_count(t, F.lit(_TX30_SSN)).alias("ssns"),
    )
    return per_doc.groupBy("source").agg(
        F.sum("toks").cast("bigint").alias("n_tokens"),
        F.sum("emails").cast("bigint").alias("n_emails"),
        F.sum("phones").cast("bigint").alias("n_phones"),
        F.sum("ssns").cast("bigint").alias("n_ssns"),
        F.round(
            F.lit(10000.0)
            * (F.sum("emails") + F.sum("phones") + F.sum("ssns"))
            / F.sum("toks"),
            4,
        ).alias("pii_per_10k_tokens"),
    )


def _tx31_sql() -> str:
    from ._helpers import _minhash_ctes

    return f"""
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
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1),
toks AS (
  SELECT doc_id, source, len({{TOKS}}) AS n_toks FROM documents
)
SELECT t.source,
       cast(sum(t.n_toks) AS BIGINT) AS raw_tokens,
       round(sum(t.n_toks * 1e0 / s.cluster_size), 2) AS effective_tokens,
       round(sum(t.n_toks)
             / sum(t.n_toks * 1e0 / s.cluster_size), 4)
         AS dup_inflation
FROM toks t
JOIN lab ON lab.doc_id = t.doc_id
JOIN sizes s ON s.cluster_id = lab.cluster_id
GROUP BY t.source
""".replace("{TOKS}", _DUCK_TOKS)


@register("tx31_effective_tokens", None, first_round=11)
def tx31_effective_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective (dedup-weighted) token counts per source — THE number
    a pretraining data plan quotes: raw token counts overstate a
    source whose documents repeat across mirrors, so each document's
    tokens are weighted by dd21's 1/cluster-size soft-dedup weight and
    the ratio raw/effective is the source's duplication inflation
    (1.0 = clean). Composes the dedup machinery with tx1's token
    counting — the cross-family join that decides mixture weights
    (x27/x55 allocate by corpus size; this is the size they SHOULD
    allocate by).

    Plan shape: dd2's LSH candidates + CC labels build cluster sizes
    (the corpus-heavy stages, shared verbatim with dd21); token counts
    are a map-side split length (no explode); the weight join is
    cluster-sized broadcast onto doc-level rows, folded by one source
    agg. Token counts are exact integers; only the weighted sum is
    floating point, display-rounded."""
    from ..llm.dedup import connected_components, minhash_lsh_pairs
    from ..llm.text import token_count

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", max_bucket_size=100, materialize=True
    ).localCheckpoint(eager=True)
    labels = connected_components(pairs)
    lab = (
        docs.select("doc_id")
        .join(labels, docs.doc_id == labels.node, "left")
        .select(
            "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
        )
        # PINNED as of r16: the r15 attempt was measured under the
        # ±50% single-shot protocol and read as noise; the
        # variance-gated median-of-9 (r15 verdict #6) resolves it —
        # 4.22 -> 2.94 s isolated at sf0.1 (mid-spread 2.7-3.6 vs
        # 3.7-5.0 unpinned). Both consumers (cluster-size agg + the
        # doc-keyed weight join) re-ran the docs-labels join without
        # it. dd21's sibling pin stays OUT: its regression was clear
        # (2.79 -> 5.34 s) and its consumers reach one shared exchange.
        .localCheckpoint(eager=True)
    )
    sizes = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    toks = docs.select(
        "doc_id", "source", token_count("text").alias("n_toks")
    )
    j = (
        toks.join(lab, "doc_id")
        .join(F.broadcast(sizes), "cluster_id")
    )
    eff = F.sum(
        F.col("n_toks") * F.lit(1.0) / F.col("cluster_size")
    )
    return j.groupBy("source").agg(
        F.sum("n_toks").cast("bigint").alias("raw_tokens"),
        F.round(eff, 2).alias("effective_tokens"),
        F.round(F.sum("n_toks") / eff, 4).alias("dup_inflation"),
    )


REGISTRY["tx31_effective_tokens"].sql = _tx31_sql()


_TX32_SQL = """
WITH tok AS (
  SELECT source, unnest({TOKS}) AS tok FROM documents
),
st AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
stot AS (
  SELECT source, sum(c) AS n_tokens, count(*) AS vocab FROM st GROUP BY 1
),
ct AS (SELECT tok, sum(c) AS cc FROM st GROUP BY 1),
n AS (SELECT sum(c) AS total FROM st)
SELECT st.source,
       cast(any_value(stot.n_tokens) AS BIGINT) AS n_tokens,
       cast(any_value(stot.vocab) AS BIGINT) AS vocab,
       round(sum((st.c * 1.0 / stot.n_tokens)
                 * ln((st.c * 1.0 / stot.n_tokens)
                      / (ct.cc * 1.0 / n.total))), 6) AS kl_nats
FROM st
JOIN stot ON stot.source = st.source
JOIN ct ON ct.tok = st.tok
CROSS JOIN n
GROUP BY st.source
""".replace("{TOKS}", _DUCK_TOKS)


@register("tx32_source_unigram_divergence", _TX32_SQL, first_round=13)
def tx32_source_unigram_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source unigram-distribution DIVERGENCE from the corpus —
    the source-fingerprinting statistic a mixture plan reads before
    deciding whether a source adds diversity or repeats the corpus:
    KL(source || corpus) in nats over whitespace unigrams. No
    smoothing is needed because every source token is by construction
    in the corpus distribution (support(source) is a subset of
    support(corpus)). Complements x54 (drift over TIME within a
    source) and tx18 (lang consistency): this ranks sources by how
    far their token mix sits from the corpus average. Output per
    source: token count, vocabulary size, KL in nats.

    Plan shape: one token explode feeds a (source, token) count; the
    corpus marginal is a SECOND aggregate of that same count table
    (token-keyed, vocabulary-sized — never a second corpus scan); the
    total is a 1-row agg joined by AQE broadcast. At 100 TB the only
    corpus-sized stage is the first count's shuffle; everything after
    is vocabulary-sized."""
    from ..llm.text import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    st = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    st = st.localCheckpoint(eager=True)  # consumed by three aggregates
    stot = st.groupBy("source").agg(
        F.sum("c").alias("n_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    ct = st.groupBy("tok").agg(F.sum("c").alias("cc"))
    total = st.agg(F.sum("c").alias("total"))
    p_s = F.col("c") / F.col("n_tokens")
    p_c = F.col("cc") / F.col("total")
    return (
        st.join(stot, "source")
        .join(ct, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("source")
        .agg(
            F.first("n_tokens").cast("bigint").alias("n_tokens"),
            F.first("vocab").cast("bigint").alias("vocab"),
            F.round(F.sum(p_s * F.log(p_s / p_c)), 6).alias("kl_nats"),
        )
    )


_ZIPF_HEAD = 100


@register(
    "tx33_zipf_slope",
    f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents
    ),
    freq AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    stot AS (
      SELECT source, cast(sum(c) AS BIGINT) AS n_tokens,
             count(*) AS n_types
      FROM freq GROUP BY 1
    ),
    head AS (
      SELECT source, c,
             row_number() OVER (
               PARTITION BY source ORDER BY c DESC, tok
             ) AS rnk
      FROM freq
      QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY c DESC, tok) <= {_ZIPF_HEAD}
    ),
    fit AS (
      SELECT source,
             round(covar_pop(ln(rnk), ln(c)) / var_pop(ln(rnk)), 4)
               AS zipf_slope
      FROM head GROUP BY 1
    )
    SELECT s.source, s.n_tokens, s.n_types, fit.zipf_slope
    FROM stot s JOIN fit USING (source)
    """,
    first_round=14,
)
def tx33_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: per-source Zipf exponent — the OLS slope of
    ln(frequency) on ln(rank) over each source's top-100
    (``_ZIPF_HEAD``) token ranks. Natural corpora track slope ~ -1 (Zipf's law);
    machine-generated, template, or boilerplate-heavy sources bend
    flat (head too uniform) or cliff steeply (a few tokens dominate),
    so the slope is a corpus-hygiene screen that catches what
    per-document quality scores (tx2) cannot: a source whose
    individual documents look fine but whose AGGREGATE vocabulary is
    degenerate. Reference-analog: the per-source profiling loop of
    src/transform.py applied to token statistics.

    Determinism: ranks tie-break on token text ascending, both
    engines fit the identical (ln rank, ln freq) pairs, and the slope
    is covar_pop/var_pop rounded to 4 dp — engine-exact. Output per
    source: total tokens, vocabulary size, fitted slope.

    Plan shape: ONE token explode feeds a (source, token) count
    (tx32's corpus-sized stage, the only one); the head cut is a
    window over the vocabulary-sized count table partitioned by
    source, and the fit is a 100-points-per-source aggregate — at
    100 TB everything after the first shuffle is vocabulary-sized,
    and the fit itself is |sources| x 100 rows."""
    from pyspark.sql import Window

    from ..llm.text import tokens

    docs = _t(spark, sf_dir, "documents")
    freq = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    freq = freq.localCheckpoint(eager=True)  # totals + head fit
    stot = freq.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "tok")
    head = (
        freq.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ZIPF_HEAD)
        .select("source", F.log("rnk").alias("lx"), F.log("c").alias("ly"))
    )
    fit = head.groupBy("source").agg(
        F.round(
            F.covar_pop(F.col("lx"), F.col("ly")) / F.var_pop(F.col("lx")), 4
        ).alias("zipf_slope")
    )
    return stot.join(fit, "source").select(
        "source", "n_tokens", "n_types", "zipf_slope"
    )
