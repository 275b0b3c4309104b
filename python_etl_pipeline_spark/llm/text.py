"""Text-analysis expressions for training-data pipelines.

All pure Column expressions over built-ins (split/filter/transform/
aggregate) — JVM-side, no Python UDFs in the hot path. Designed to run
inside one projection over a 100 TB document scan: no shuffles, no
joins, fully pipelined with the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def let_(col: Column, body) -> Column:
    """Evaluate ``col`` once per row and bind it as a lambda variable
    inside ``body(col)`` — a let-expression emulated via single-element
    array + ``transform``. Higher-order functions are interpreted (no
    whole-stage codegen, no common-subexpression elimination inside
    lambda bodies), so an expensive expression such as a regex
    ``split`` referenced from a lambda body is re-evaluated once per
    ELEMENT; binding it through ``let_`` restores once-per-row
    evaluation (measured 4-5x on the engine's shingle passes). Use for
    any non-trivial expression a HOF lambda body must reference."""
    return F.element_at(F.transform(F.array(col), body), 1)


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization -> array<string>."""
    return F.split(F.trim(_as_col(c)), r"\s+")


def token_count(c: Column | str) -> Column:
    """Token count (whitespace tokens) as BIGINT."""
    return F.size(tokens(c)).cast("bigint")


def punct_ratio(c: Column | str) -> Column:
    """Fraction of characters that are sentence punctuation."""
    col = _as_col(c)
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    return F.when(F.length(col) > 0, n_punct / F.length(col)).otherwise(F.lit(0.0))


# deterministic stopword lists shared with the DuckDB oracles
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "ein", "nicht"]
ES_STOPWORDS = ["el", "la", "los", "y", "que", "un", "por"]


def _count_in(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")


def stopword_ratio(c: Column | str, words: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    toks = tokens(c)
    n = F.size(toks)
    hits = _count_in(toks, words or EN_STOPWORDS)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(c: Column | str) -> Column:
    """Composite document quality in [0,1]: length saturation (40%),
    low punctuation noise (30%), stopword naturalness (30%).
    The exact weights are an engine policy; each term is deterministic."""
    col = _as_col(c)
    length_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    punct_term = 1.0 - punct_ratio(col)
    stop_term = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    # round(10): the terms are small-denominator (often dyadic) rationals
    # whose exact terminating decimals land on .5 ties at <=9 decimals,
    # where Spark (shortest-repr HALF_UP) and engines that multiply-then-
    # round disagree by 1 ulp; 10 decimals sits past every terminating
    # expansion this formula can produce, so no tie is ever cut.
    return F.round(0.4 * length_term + 0.3 * punct_term + 0.3 * stop_term, 10)


def lang_id(c: Column | str) -> Column:
    """Stopword-overlap language heuristic over {en,de,es}; deterministic
    tie-break prefers en > de > es. (An n-gram model would use the same
    shape: score per language inside one projection, argmax.)"""
    toks = tokens(_as_col(c))
    en = _count_in(toks, EN_STOPWORDS)
    de = _count_in(toks, DE_STOPWORDS)
    es = _count_in(toks, ES_STOPWORDS)
    return (
        F.when((en >= de) & (en >= es), "en")
        .when(de >= es, "de")
        .otherwise("es")
    )


# simple, cross-dialect-safe PII patterns (no lookaround/backrefs)
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{10}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(c: Column | str) -> Column:
    """Regex PII scrubbing (emails, 10-digit phones, SSN-shaped ids) —
    the redaction pass a training-data pipeline runs before tokenization.
    Chained regexp_replace stays inside whole-stage codegen; patterns
    avoid lookaround so they behave identically across regex dialects."""
    col = _as_col(c)
    for pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return col


def repetition_ratio(c: Column | str, n: int = 3) -> Column:
    """Fraction of duplicated word n-grams (1 - distinct/total) — the
    Gopher-style repetition signal for filtering degenerate/looping text.
    Pure array expressions; zero shuffles."""
    from .dedup import shingles

    # let-bind the shingle array: three references below would each
    # re-evaluate the tokenize+gram build (HOFs get no CSE)
    return let_(
        shingles(_as_col(c), n),
        lambda sh: F.when(
            F.size(sh) > 0,
            F.round(1.0 - F.size(F.array_distinct(sh)) / F.size(sh), 10),
        ).otherwise(F.lit(0.0)),
    )


def fingerprint(c: Column | str) -> Column:
    """Content fingerprint: md5 of the lower-cased, whitespace-normalized
    text — the exact-dedup key that survives formatting noise."""
    normalized = F.regexp_replace(F.lower(F.trim(_as_col(c))), r"\s+", " ")
    return F.md5(normalized)
