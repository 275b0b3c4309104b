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


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """Schleimer et al.'s theorem: two documents sharing a token run of
    at least w + k - 1 tokens (one full window of k-grams) must share
    at least one fingerprint hash. Also: fingerprints exist for any doc
    with >= w k-grams, and selection density is well below 1."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.llm.dedup import _h32, _spread, shingles

    # Replicate the query's pipeline on a controlled corpus.
    shared_run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, f"one two three {shared_run} four five six"),
        (2, f"seven eight nine ten {shared_run} eleven twelve"),
        (3, "completely different words nowhere near the others at all ok"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")

    K, W = 3, 4
    inst = d.select(
        "doc_id", F.posexplode(shingles(F.col("text"), K)).alias("p0", "gram")
    )
    g = inst.select(
        "doc_id", (F.col("p0") + 1).alias("pos"), _h32(F.md5("gram")).alias("h")
    )
    cnt = g.groupBy("doc_id").agg(F.count("*").alias("m"))
    from pyspark.sql import Window

    w = (
        g.join(cnt, "doc_id")
        .select(
            "doc_id", "pos", "h", "m",
            F.explode(F.sequence(F.lit(0), F.lit(W - 1))).alias("o"),
        )
        .withColumn("j", F.col("pos") - F.col("o"))
        .filter((F.col("j") >= 1) & (F.col("j") <= F.col("m") - W + 1))
    )
    win = Window.partitionBy("doc_id", "j").orderBy(
        F.col("h").asc(), F.col("pos").desc()
    )
    fp = (
        w.withColumn("rn", F.row_number().over(win))
        .filter("rn = 1")
        .select("doc_id", "h")
        .distinct()
        .collect()
    )
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    # docs 1 and 2 share a 10-token run >= W + K - 1 = 6 tokens
    assert by_doc[1] & by_doc[2]
    # doc 3 shares nothing with either
    assert not (by_doc[3] & by_doc[1]) and not (by_doc[3] & by_doc[2])
    # density: far fewer fingerprints than grams
    m = {r["doc_id"]: r["m"] for r in cnt.collect()}
    for did, fps in by_doc.items():
        assert 0 < len(fps) < m[did]


def test_readability_bounds_and_syllable_proxy(spark, sf_dir):
    """tx26: syllable count >= word count (every word contributes at
    least 1); sentences >= 1; flesch well-defined for every non-empty
    doc; and the vowel-group proxy on hand words: 'strength' = 1,
    'audio' = 3, 'rhythm' = 1 (y counts), 'aaa' = 1 (one group)."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.queries import REGISTRY, _t

    rows = REGISTRY["tx26_readability"].spark(spark, sf_dir).collect()
    n_docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) >= 0)
        .count()
    )
    assert len(rows) == n_docs  # synthetic docs all have >= 1 token
    for r in rows:
        assert r["n_syllables"] >= r["n_words"] >= 1
        assert r["n_sentences"] >= 1
        assert r["flesch"] is not None

    groups = lambda t: F.regexp_replace(F.lower(t), "[aeiouy]+", "V")  # noqa: E731
    syl = F.greatest(
        F.lit(1),
        F.length(groups(F.col("w")))
        - F.length(F.regexp_replace(groups(F.col("w")), "V", "")),
    )
    got = {
        r["w"]: r["s"]
        for r in spark.createDataFrame(
            [("strength",), ("audio",), ("rhythm",), ("aaa",)], "w string"
        )
        .select("w", syl.alias("s"))
        .collect()
    }
    assert got == {"strength": 1, "audio": 2, "rhythm": 1, "aaa": 1}
