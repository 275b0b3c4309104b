"""PII redaction and repetition-ratio fixture semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_etl_pipeline_spark.llm.text import redact_pii, repetition_ratio


def test_redact_pii(spark):
    rows = [
        ("mail me at a.b+c@ex-ample.co.uk please", "mail me at <EMAIL> please"),
        ("call 9876543210 now", "call <PHONE> now"),
        ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
        ("phone inside x9876543210y stays", "phone inside x9876543210y stays"),
        ("clean text", "clean text"),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], ["t"])
    got = [r[0] for r in df.select(redact_pii(F.col("t"))).collect()]
    assert got == [r[1] for r in rows]


def test_repetition_ratio(spark):
    rows = [
        ("a b c a b c a b c", None),      # repeated trigrams -> high ratio
        ("one two three four five", 0.0),  # all distinct
        ("x y", 0.0),                      # too short for a trigram
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], ["t"])
    got = [r[0] for r in df.select(repetition_ratio(F.col("t"))).collect()]
    # 'a b c' x3: 7 trigrams, 3 distinct -> 1 - 3/7
    assert abs(got[0] - (1 - 3 / 7)) < 1e-9
    assert got[1] == 0.0 and got[2] == 0.0


def test_gopher_rules_flag_degenerate_docs(spark):
    """tx15's rule set on planted fixtures: normal prose keeps; a
    too-short doc, an all-symbol doc, and a stopword-free token soup
    are each caught by the rule built for them."""
    from python_etl_pipeline_spark.queries import REGISTRY
    import os, tempfile

    rows = [
        (1, "the quick brown fox jumps over a lazy dog and it is glad "
            "to be out in the sun today with friends around here"),
        (2, "too short"),
        (3, "%% ## @@ !! ^^ && ** (( )) __ ++ == ;; :: .. ,, ?? // \\\\ ||"),
        (4, "zx qv wj kp fm tn rb dl gs hy cz xw vq jt pk mf nt br ld sg yh"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id bigint, text string"
        ).withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("t")
        ).withColumn("n_chars", F.length("text").cast("bigint")).write.parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {r["doc_id"]: r for r in
               REGISTRY["tx15_gopher_rules"].spark(spark, d).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False          # word count below bound
    assert out[3]["alpha_word_frac"] == 0.0  # no alphabetic words
    assert out[3]["keep"] is False
    assert out[4]["stop_types"] == 0         # no stopword types
    assert out[4]["keep"] is False


def test_line_dedup_reassembles_undropped_docs_verbatim(spark, sf_dir):
    """dd15 invariant beyond the oracle: a document that loses no chunk
    must reassemble to exactly its whitespace-normalized text (order
    preserved, nothing duplicated or lost by the sort-inside-agg)."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.queries import REGISTRY

    out = REGISTRY["dd15_line_dedup"].spark(spark, sf_dir)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.regexp_replace(F.trim("text"), r"\s+", " ").alias("norm"),
    )
    joined = out.filter(F.col("n_dropped") == 0).join(d, "doc_id")
    total = joined.count()
    assert total > 0  # fixture has unique docs
    assert joined.filter(F.col("clean_text") != F.col("norm")).count() == 0


def test_mm4_block_dedup_matches_python_replay(spark, sf_dir):
    """mm4's per-source block accounting equals a byte-level Python
    replay: cut every payload into 32-byte blocks, hash, count
    total/distinct bytes per source."""
    import hashlib
    from collections import defaultdict

    from python_etl_pipeline_spark.queries import REGISTRY

    got = {
        r["source"]: (
            r["n_blocks"],
            r["n_uniq"],
            r["total_bytes"],
            r["uniq_bytes"],
        )
        for r in REGISTRY["mm4_block_dedup"].spark(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "text"
    ).collect()
    tot = defaultdict(lambda: [0, 0])
    uniq = defaultdict(dict)
    for r in docs:
        b = r["text"].encode("utf-8")
        for p in range(0, len(b), 32):
            blk = b[p : p + 32]
            h = hashlib.md5(blk).hexdigest()
            tot[r["source"]][0] += 1
            tot[r["source"]][1] += len(blk)
            uniq[r["source"]][h] = len(blk)
    want = {
        s: (tot[s][0], len(uniq[s]), tot[s][1], sum(uniq[s].values()))
        for s in tot
    }
    assert got == want
