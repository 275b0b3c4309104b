"""Multimodal family (mm1-mm5): binary payloads, frame sampling, block dedup, perceptual near-dup.

Mechanically split from the former flat queries.py (r10);
docstrings and within-family registration order unchanged.
"""

from ._shared import *  # noqa: F401,F403 — F, Window, scalar/op helpers, register
from ._shared import _t, AS_OF, REGISTRY, register  # noqa: F401

@register(
    "mm1_media_features",
    """
    SELECT doc_id AS media_id,
           cast(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS digest
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def mm1_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing as a first-class query: wrap each document's
    content as an opaque binary payload + typed metadata struct, then run
    the Arrow-batched mapInPandas feature extractor (llm/multimodal.py) —
    the exact pipeline shape image/audio decode takes at scale, with the
    codec step a deterministic hash-derived stand-in."""
    from ..llm.multimodal import attach_binary_payload, extract_features

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    media = attach_binary_payload(d, "text", "doc_id")
    return extract_features(media).select("media_id", "byte_len", "digest")


@register(
    "mm2_frame_sample",
    """
    WITH f AS (
      SELECT doc_id AS media_id,
             cast(octet_length(encode(text)) AS BIGINT) AS blen, text
      FROM documents WHERE text IS NOT NULL
    ),
    idx AS (
      SELECT media_id, blen, text,
             unnest(generate_series(0, cast(floor((blen - 1) / 64) AS BIGINT))) AS frame_idx
      FROM f
    )
    SELECT media_id,
           cast(frame_idx AS BIGINT) AS frame_idx,
           cast(least(16, blen - frame_idx * 64) AS BIGINT) AS frame_len,
           md5(substr(text, cast(frame_idx * 64 + 1 AS BIGINT), 16)) AS frame_digest
    FROM idx
    """,
)
def mm2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling as a first-class query: every payload
    fans out to one row per sampled frame (stride 64, 16-byte window),
    fingerprinted inside the Arrow batch — payload bytes never shuffle.
    The oracle replays the byte slicing with substr/md5 (the fixture
    text is pure ASCII, so char offsets == byte offsets — asserted by
    octet_length in the oracle itself feeding the same windows)."""
    from ..llm.multimodal import attach_binary_payload, sample_frames

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return sample_frames(attach_binary_payload(d, "text", "doc_id"))


@register(
    "mm3_frame_dedup",
    """
    WITH f AS (
      SELECT doc_id AS media_id,
             cast(octet_length(encode(text)) AS BIGINT) AS blen, text
      FROM documents WHERE text IS NOT NULL
    ),
    idx AS (
      SELECT media_id, blen, text,
             unnest(generate_series(0, cast(floor((blen - 1) / 64) AS BIGINT))) AS frame_idx
      FROM f
    ),
    frames AS (
      SELECT media_id,
             md5(substr(text, cast(frame_idx * 64 + 1 AS BIGINT), 16)) AS frame_digest
      FROM idx
    ),
    owner AS (
      SELECT frame_digest, min(media_id) AS first_owner
      FROM frames GROUP BY 1
    ),
    per AS (
      SELECT media_id, count(*) AS n_frames,
             sum(CASE WHEN first_owner < media_id THEN 1 ELSE 0 END) AS n_dup_frames
      FROM frames JOIN owner USING (frame_digest)
      GROUP BY 1
    )
    SELECT media_id, cast(n_frames AS BIGINT) AS n_frames,
           cast(n_dup_frames AS BIGINT) AS n_dup_frames,
           (2 * n_dup_frames < n_frames) AS is_kept
    FROM per
    """,
)
def mm3_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal curation path composed END-TO-END — the
    video-dedup shape: mm2's per-payload frame sampler (1-to-N Arrow
    fan-out, payload bytes never shuffle) -> dd1's exact-dedup rule on
    the frame digests (hash-groupBy keep-min-id: the frame's first
    owner) -> per-media retention (drop media whose sampled frames are
    mostly duplicates of EARLIER media). Proves the fan-out output is
    join-ready: the only data crossing the exchanges after sampling is
    (media_id, 16-byte digest) rows — one digest-keyed shuffle for the
    ownership agg and one media-keyed agg for retention, both
    100 TB-safe. is_kept uses the integer form 2*n_dup < n_frames (no
    float ratio to race across engines)."""
    from ..llm.multimodal import attach_binary_payload, sample_frames

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    frames = sample_frames(attach_binary_payload(d, "text", "doc_id")).select(
        "media_id", "frame_digest"
    )
    owner = frames.groupBy("frame_digest").agg(
        F.min("media_id").alias("first_owner")
    )
    per = (
        frames.join(owner, "frame_digest")
        .groupBy("media_id")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.sum(
                F.when(F.col("first_owner") < F.col("media_id"), 1).otherwise(0)
            ).cast("bigint").alias("n_dup_frames"),
        )
    )
    return per.select(
        "media_id",
        "n_frames",
        "n_dup_frames",
        (2 * F.col("n_dup_frames") < F.col("n_frames")).alias("is_kept"),
    )


_MM4_BLOCK = 32


_MM4_SQL = f"""
WITH blocks AS (
  SELECT source, md5(substring(text, p, {_MM4_BLOCK})) AS h,
         length(substring(text, p, {_MM4_BLOCK})) AS blen
  FROM documents,
       LATERAL unnest(range(1, length(text) + 1, {_MM4_BLOCK})) AS t(p)
),
tot AS (
  SELECT source, count(*) AS n_blocks, sum(blen) AS total_bytes
  FROM blocks GROUP BY 1
),
u1 AS (SELECT source, h, max(blen) AS blen FROM blocks GROUP BY 1, 2),
uq AS (
  SELECT source, count(*) AS n_uniq, sum(blen) AS uniq_bytes
  FROM u1 GROUP BY 1
)
SELECT t.source, cast(n_blocks AS BIGINT) AS n_blocks,
       cast(n_uniq AS BIGINT) AS n_uniq,
       cast(total_bytes AS BIGINT) AS total_bytes,
       cast(uniq_bytes AS BIGINT) AS uniq_bytes,
       round(1.0 - uniq_bytes * 1.0 / total_bytes, 6) AS dedup_frac
FROM tot t JOIN uq USING (source)
"""


@register("mm4_block_dedup", _MM4_SQL)
def mm4_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed BLOCK dedup over opaque media payloads — the
    storage-layer question (what does a dedup store save us per
    source?) asked of the same binary column mm1-mm3 process: each
    payload is cut into fixed 32-byte blocks, every block is hashed,
    and per source the report compares total block bytes against the
    bytes one copy of each distinct block would occupy. Everything is
    JVM-side codegen — binary substring + md5 are native expressions,
    no Python worker touches the bytes (contrast mm1's Arrow path:
    feature extraction needs Python, block hashing does not). Plan:
    ONE scan -> generate (explode of the offset sequence) -> one
    (source, hash) agg whose partials carry count/sum/max, then a
    source-sized fold — totals are sums over the per-hash partials,
    uniques are the group rows, so no join and no second scan; blocks
    never carry the payload with them, only the 16-byte hash. The
    oracle hashes the identical byte slices (the corpus is ASCII, so
    DuckDB's text substring sees the same bytes the binary payload
    holds). At 100 TB: block size becomes 4-64 KiB, same plan, and the
    (source, hash) agg is the only data-sized shuffle — hash-sized
    rows, not payload-sized."""
    from ..llm.multimodal import attach_binary_payload, payload_blocks

    d = _t(spark, sf_dir, "documents")
    m = attach_binary_payload(d, "text", "doc_id", extra_cols=("source",))
    blocks = payload_blocks(m, block=_MM4_BLOCK, extra_cols=("source",))
    # both reports fold out of ONE (source, hash) aggregation: totals
    # are sums over the per-hash partials, uniques are the group rows
    # themselves — single scan, single data-sized shuffle, no join
    per_hash = blocks.groupBy("source", "h").agg(
        F.count("*").alias("cnt"),
        F.sum("blen").alias("sum_blen"),
        F.max("blen").alias("max_blen"),
    )
    return per_hash.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_blocks"),
        F.count("*").cast("bigint").alias("n_uniq"),
        F.sum("sum_blen").alias("total_bytes"),
        F.sum("max_blen").alias("uniq_bytes"),
    ).select(
        "source",
        "n_blocks",
        "n_uniq",
        "total_bytes",
        "uniq_bytes",
        F.round(1.0 - F.col("uniq_bytes") / F.col("total_bytes"), 6).alias(
            "dedup_frac"
        ),
    )


def _mm5_sig_sql() -> str:
    nib = ", ".join(
        f"substring(md5(substring(text, 1 + {i} * w, w)), 1, 1)"
        for i in range(16)
    )
    return f"""
    sized AS (
      SELECT doc_id, text,
             cast(ceil(length(text) / 16.0e0) AS INT) AS w
      FROM documents
    ),
    sig AS (
      SELECT doc_id, concat({nib}) AS sig FROM sized
    )"""


def _mm5_sql() -> str:
    ham = " + ".join(
        f"(CASE WHEN substring(a.sig, {i + 1}, 1)"
        f" <> substring(b.sig, {i + 1}, 1) THEN 1 ELSE 0 END)"
        for i in range(16)
    )
    return f"""
    WITH {_mm5_sig_sql()},
    bands AS (
      SELECT doc_id, i AS band, substring(sig, 1 + i * 2, 2) AS bv
      FROM sig, unnest(range(0, 8)) r(i)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y
        ON y.band = x.band AND y.bv = x.bv AND x.doc_id < y.doc_id
    ),
    scored AS (
      SELECT cand.a, cand.b, {ham} AS hamming
      FROM cand
      JOIN sig a ON a.doc_id = cand.a
      JOIN sig b ON b.doc_id = cand.b
    )
    SELECT a, b, cast(hamming AS BIGINT) AS hamming
    FROM scored WHERE hamming <= 4
    """


@register("mm5_perceptual_neardup", None, first_round=9)
def mm5_perceptual_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-signature near-dup over opaque media payloads — the
    pHash recipe transplanted to the binary column mm1-mm4 process:
    each payload is cut into a FIXED GRID of 16 tiles (variable tile
    width, like pHash's grid over variable-size images), each tile
    contributes one md5-derived nibble, and two payloads are near-dups
    when their 16-nibble signatures differ in at most 4 positions — a
    small local edit changes 1-2 tiles, so re-encoded/lightly-edited
    copies land inside the Hamming ball while distinct content falls
    far outside. Real codecs would replace the tile hash with DCT
    coefficients (llm/multimodal.py:73 documents the environment
    gate); every distribution property is identical.

    Plan shape: dd2's LSH economics on the signature — 8 bands of 2
    nibbles, candidates only on exact band match (bucket join, never
    all-pairs), then the 16-comparison exact Hamming verify on the
    candidate set. 8 bands make the hamming<=4 contract EXACT by
    pigeonhole: any pair differing in at most 7 of 16 positions leaves
    at least one of the 8 bands clean, so every qualifying pair is a
    candidate (the r9 4x4 banding only guaranteed recall for <=3
    mismatches — r9 advice fix). Coarser 2-nibble buckets cost more
    candidates, all killed by the exact verify. Signature construction is one map-side projection
    (16 tile md5s ~= one full-payload md5). Reference analog: the
    file-level md5 guard of src/extract.py:222-270, relaxed from
    exact identity to perceptual identity."""
    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "text",
        F.ceil(F.length("text") / F.lit(16.0)).cast("int").alias("w"),
    )
    sig = sized.select(
        "doc_id",
        F.concat(
            *[
                F.substring(
                    F.md5(F.expr(f"substring(text, 1 + {i} * w, w)")), 1, 1
                )
                for i in range(16)
            ]
        ).alias("sig"),
        # four consumers (both band-join legs + both verify sides)
        # re-ran the 16-tile-md5 projection over the full payloads;
        # the signature table (17 bytes/doc — the persisted pHash
        # index) is pinned once instead (r15, guide §2.4)
    ).localCheckpoint(eager=True)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(8)])).alias("band"),
        "sig",
    ).select(
        "doc_id", "band",
        F.expr("substring(sig, 1 + band * 2, 2)").alias("bv"),
    )
    x, y = bands.alias("bx"), bands.alias("by")
    cand = (
        x.join(
            y,
            (F.col("by.band") == F.col("bx.band"))
            & (F.col("by.bv") == F.col("bx.bv"))
            & (F.col("bx.doc_id") < F.col("by.doc_id")),
        )
        .select(
            F.col("bx.doc_id").alias("a"), F.col("by.doc_id").alias("b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("a"), F.col("sig").alias("siga"))
    sb = sig.select(F.col("doc_id").alias("b"), F.col("sig").alias("sigb"))
    ham = sum(
        F.when(
            F.substring("siga", i + 1, 1) != F.substring("sigb", i + 1, 1),
            1,
        ).otherwise(0)
        for i in range(16)
    )
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", ham.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= 4)
    )


REGISTRY["mm5_perceptual_neardup"].sql = _mm5_sql()


_MM6_W = 8  # rolling-hash window (chars)
_MM6_STRIDE = 8  # boundary-candidate stride

_MM6_SQL = f"""
WITH sized AS (
  SELECT doc_id, text, length(text) AS len FROM documents
  WHERE text IS NOT NULL
),
cand AS (
  SELECT doc_id, text, len,
         unnest(generate_series(
           0, greatest(cast(floor((len - {_MM6_W}) / {_MM6_STRIDE}e0)
                            AS BIGINT), 0))) AS k
  FROM sized
),
bnd AS (
  SELECT doc_id, text, len,
         CASE WHEN k = 0 THEN 1
              ELSE k * {_MM6_STRIDE} + 1 END AS pos
  FROM cand
  WHERE k = 0
     OR substring(md5(substr(text, cast(k * {_MM6_STRIDE} + 1 AS BIGINT),
                             {_MM6_W})), 1, 1) IN ('0', '1')
),
chunks AS (
  SELECT doc_id, text, len, pos AS chunk_start,
         coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                  len + 1) - pos AS chunk_len
  FROM bnd
)
SELECT doc_id,
       cast(chunk_start AS BIGINT) AS chunk_start,
       cast(chunk_len AS BIGINT) AS chunk_len,
       md5(substr(text, chunk_start, chunk_len)) AS chunk_digest
FROM chunks
"""


@register("mm6_cdc_chunks", _MM6_SQL, first_round=10)
def mm6_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over opaque payloads: boundaries fall
    where a rolling window's hash clears a threshold (here an 8-byte
    window sampled every 8 bytes, boundary when the md5 leads with
    nibble 0/1 -> ~1/8 of candidates, ~64-byte average chunks), so an
    INSERTION near the front only re-chunks up to the next boundary —
    unlike mm4's FIXED blocks, where one inserted byte shifts every
    later block and defeats dedup. This is the rsync/LBFS/storage-
    dedup primitive; with real codecs the window hash would be a
    Rabin/Buzhash rolling polynomial (llm/multimodal.py:73 documents
    the codec gate), with identical distribution properties.

    Plan shape: per-payload candidate fan-out (len/8 rows, one md5
    per candidate — same economics as mm2's frame explode), boundary
    filter, then a DOC-KEYED lead() window to turn the boundary list
    into (start, len) chunks and one md5 per chunk. Everything is
    partitioned by doc; no global stage, no all-pairs."""
    from ..llm.dedup import _spread

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sized = _spread(
        d.select("doc_id", "text", F.length("text").alias("len"))
    )
    kmax = F.greatest(
        F.floor((F.col("len") - _MM6_W) / F.lit(float(_MM6_STRIDE)))
        .cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    cand = sized.select(
        "doc_id", "text", "len",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), kmax)
        ).alias("k"),
    )
    win = F.expr(
        f"substring(md5(substring(text, cast(k * {_MM6_STRIDE} + 1 AS INT),"
        f" {_MM6_W})), 1, 1)"
    )
    bnd = cand.filter(
        (F.col("k") == 0) | win.isin("0", "1")
    ).select(
        "doc_id", "text", "len",
        F.when(F.col("k") == 0, 1)
        .otherwise(F.col("k") * _MM6_STRIDE + 1)
        .alias("pos"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    chunks = bnd.select(
        "doc_id", "text",
        F.col("pos").alias("chunk_start"),
        (
            F.coalesce(F.lead("pos").over(w), F.col("len") + 1)
            - F.col("pos")
        ).alias("chunk_len"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.col("chunk_len").cast("bigint").alias("chunk_len"),
        F.expr(
            "md5(substring(text, cast(chunk_start AS INT),"
            " cast(chunk_len AS INT)))"
        ).alias("chunk_digest"),
    )


_MM7_CUT_BITS = 16  # consecutive-frame signature hamming > 16/32 -> cut


def _mm7_sql() -> str:
    from ..llm.dedup import _hexint_sql

    sig = _hexint_sql(
        "md5(substr(text, cast(frame_idx * 64 + 1 AS BIGINT), 16))", 8
    )
    return f"""
WITH f AS (
  SELECT doc_id AS media_id,
         cast(octet_length(encode(text)) AS BIGINT) AS blen, text
  FROM documents WHERE text IS NOT NULL
),
idx AS (
  SELECT media_id, blen, text,
         unnest(generate_series(0,
                cast(floor((blen - 1) / 64) AS BIGINT))) AS frame_idx
  FROM f
),
sigs AS (SELECT media_id, frame_idx, {sig} AS sig FROM idx),
marked AS (
  SELECT media_id, frame_idx,
         CASE WHEN lag(sig) OVER w IS NULL THEN 0
              WHEN bit_count(xor(sig, lag(sig) OVER w)) > {_MM7_CUT_BITS}
              THEN 1 ELSE 0 END AS is_cut
  FROM sigs
  WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)
),
scenes AS (
  SELECT media_id, frame_idx,
         sum(is_cut) OVER (PARTITION BY media_id ORDER BY frame_idx
                           ROWS UNBOUNDED PRECEDING) AS scene_id
  FROM marked
),
per_scene AS (
  SELECT media_id, scene_id, count(*) AS scene_len
  FROM scenes GROUP BY 1, 2
)
SELECT media_id,
       cast(sum(scene_len) AS BIGINT) AS n_frames,
       cast(count(*) AS BIGINT) AS n_scenes,
       cast(count(*) - 1 AS BIGINT) AS n_cuts,
       cast(max(scene_len) AS BIGINT) AS longest_scene
FROM per_scene GROUP BY 1
"""


@register("mm7_scene_cuts", None, first_round=11)
def mm7_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over sampled frames — the video-segmentation
    primitive: mm2's per-payload frame sampler feeds a 32-bit frame
    signature (hash-derived stand-in for a perceptual frame hash, same
    codec-free contract as mm1/mm5), a cut fires where consecutive
    frames' signatures differ in more than 16 of 32 bits, and scenes
    are the cut-delimited runs. Output per media: frame/scene/cut
    counts and the longest scene — the shape a sampling stage uses to
    pick one representative frame per scene instead of per stride.

    Plan shape: the frame fan-out is mm2's Arrow stage (payload bytes
    never shuffle); everything downstream is (media_id, frame)-keyed —
    one media-keyed lag window for the cut flags, one cumulative
    window for scene ids (same exchange), a (media, scene) agg, a
    media agg. No global windows, no joins. The signature arithmetic
    (first 8 md5 hex chars, bit_count(xor)) replays identically in the
    oracle."""
    from ..llm.dedup import _hexint
    from ..llm.multimodal import attach_binary_payload, sample_frames

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    frames = sample_frames(attach_binary_payload(d, "text", "doc_id"))
    sigs = frames.select(
        "media_id", "frame_idx",
        _hexint(F.col("frame_digest"), 8).alias("sig"),
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    marked = sigs.select(
        "media_id", "frame_idx",
        F.when(F.lag("sig").over(w).isNull(), 0)
        .when(
            F.bit_count(
                F.col("sig").bitwiseXOR(F.lag("sig").over(w))
            )
            > _MM7_CUT_BITS,
            1,
        )
        .otherwise(0)
        .alias("is_cut"),
    )
    scenes = marked.withColumn(
        "scene_id",
        F.sum("is_cut").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_scene = scenes.groupBy("media_id", "scene_id").agg(
        F.count(F.lit(1)).alias("scene_len")
    )
    return per_scene.groupBy("media_id").agg(
        F.sum("scene_len").cast("bigint").alias("n_frames"),
        F.count(F.lit(1)).cast("bigint").alias("n_scenes"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_cuts"),
        F.max("scene_len").cast("bigint").alias("longest_scene"),
    )


REGISTRY["mm7_scene_cuts"].sql = _mm7_sql()

_MM8_SQL = f"""
WITH mm6 AS ({_MM6_SQL}),
ranked AS (
  SELECT doc_id, chunk_len, chunk_digest,
         row_number() OVER (PARTITION BY chunk_digest
                            ORDER BY doc_id, chunk_start) AS rn
  FROM mm6
),
j AS (
  SELECT r.*, d.source FROM ranked r JOIN documents d USING (doc_id)
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_chunks,
       cast(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique_chunks,
       cast(sum(chunk_len) AS BIGINT) AS total_bytes,
       cast(sum(CASE WHEN rn = 1 THEN chunk_len ELSE 0 END) AS BIGINT)
         AS unique_bytes,
       round(1e0 - sum(CASE WHEN rn = 1 THEN chunk_len ELSE 0 END) * 1e0
             / sum(chunk_len), 4) AS savings_pct
FROM j GROUP BY source
"""


@register("mm8_chunk_dedup_savings", _MM8_SQL, first_round=11)
def mm8_chunk_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup savings estimator — the storage readout on
    top of mm6's content-defined chunks: each chunk digest's FIRST
    occurrence (ordered by doc, then offset — deterministic) is the
    stored copy, every later occurrence is a pointer, and the
    per-source report (chunks, unique chunks, bytes, unique bytes,
    savings fraction) is what a backup/dedup store quotes before
    committing to a layout. CDC boundaries make the savings robust to
    insertions (mm6's whole point); this query turns that property
    into a measured number per source.

    Plan shape: mm6's doc-keyed chunk build (reused verbatim), one
    digest-keyed first-occurrence window (WindowGroupLimit-prunable
    rank), a broadcast doc->source join, one source agg. Byte counts
    are exact integers; only the savings fraction divides."""
    chunks = REGISTRY["mm6_cdc_chunks"].spark(spark, sf_dir)
    w = Window.partitionBy("chunk_digest").orderBy("doc_id", "chunk_start")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    j = ranked.join(F.broadcast(src), "doc_id")
    first = F.when(F.col("rn") == 1, 1).otherwise(0)
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(first).cast("bigint").alias("n_unique_chunks"),
        F.sum("chunk_len").cast("bigint").alias("total_bytes"),
        F.sum(F.when(F.col("rn") == 1, F.col("chunk_len")).otherwise(0))
        .cast("bigint")
        .alias("unique_bytes"),
        F.round(
            F.lit(1.0)
            - F.sum(
                F.when(F.col("rn") == 1, F.col("chunk_len")).otherwise(0)
            )
            / F.sum("chunk_len"),
            4,
        ).alias("savings_pct"),
    )
