"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` operators so the heavy per-item
work stays columnar-batched and parallel (one Python worker per
partition, Arrow transfer, no per-row pickling).

The actual codec step is STUBBED (image/audio libraries are not in this
container): ``decode_real`` raises NotImplementedError, and the default
feature extractor is a deterministic fake (hash-derived) so the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("byte_len", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("feat0", T.DoubleType(), True),
])


def attach_binary_payload(
    df: DataFrame,
    content_col: str,
    id_col: str,
    mime: str = "application/octet-stream",
    extra_cols: tuple = (),
) -> DataFrame:
    """Wrap a string column as a (payload: binary, meta: struct) media
    column — the boundary where real pipelines would carry image bytes.

    `extra_cols` names passthrough columns to keep alongside the media
    column. Keeping them here means a consumer that needs, say, the
    source label never has to join back to the original table — at
    100 TB a payload-sized self-join is the difference between one scan
    and a shuffle of every byte.
    """
    payload = F.encode(F.col(content_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("byte_len"),
            F.lit("inline").alias("source"),
        ).alias("meta"),
        *[F.col(c) for c in extra_cols],
    )


def decode_real(payload: bytes):
    """Placeholder for the real codec (PIL/av/librosa): NOT available in
    this environment."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; wire a decoder into extract_features(decoder=...)"
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in: md5-derived pseudo-features."""
    digest = hashlib.md5(payload).hexdigest()
    return {
        "byte_len": len(payload),
        "digest": digest,
        "feat0": int(digest[0], 16) / 15.0,
    }


def extract_features(df: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas feature extraction over media rows.

    Batches arrive as pandas DataFrames (Arrow transfer); each is
    processed vectorized-per-batch and emitted with FEATURE_SCHEMA. At
    scale: repartition upstream so batches are balanced; the operator is
    embarrassingly parallel.
    """
    decode = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "byte_len", "digest", "feat0"]]

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Row-level media sampling: keep every Nth media row (by id)."""
    return df.filter(F.col("media_id") % every_nth == 0)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.LongType(), False),
    T.StructField("frame_len", T.LongType(), True),
    T.StructField("frame_digest", T.StringType(), True),
])


def sample_frames(
    df: DataFrame,
    stride: int = 64,
    window: int = 16,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Per-payload frame sampling: one media row fans out to one row per
    sampled frame — the 1-to-N batch shape a video frame sampler has at
    scale (a container parser would seek keyframes; this deterministic
    stand-in slices the payload every ``stride`` bytes and fingerprints
    a ``window``-byte frame). The fan-out happens INSIDE the Arrow
    batch on the executor: payload bytes never shuffle, only the small
    (media_id, frame_idx, digest) rows come out, and the operator is
    embarrassingly parallel over media rows.

    Empty (or null) payloads emit ZERO frames — there is nothing to
    sample. This matches the arithmetic a SQL twin naturally writes
    (``generate_series(0, floor((byte_len - 1) / stride))`` is empty at
    byte_len = 0), so the operator and any oracle agree on the edge.

    ``passthrough`` names extra input columns replicated onto every
    emitted frame row (e.g. an event-time column so a STREAMING
    consumer can watermark the frame stream) — the fan-out stays inside
    the Arrow batch either way."""
    schema = T.StructType(
        list(FRAME_SCHEMA.fields)
        + [df.schema[c] for c in passthrough]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, digs = [], [], [], []
            extra: dict[str, list] = {c: [] for c in passthrough}
            for row_i, (mid, payload) in enumerate(
                zip(pdf["media_id"], pdf["payload"])
            ):
                b = b"" if payload is None else bytes(payload)
                if not b:
                    continue
                for k in range(0, ((len(b) - 1) // stride) + 1):
                    frame = b[k * stride: k * stride + window]
                    ids.append(mid)
                    idxs.append(k)
                    lens.append(len(frame))
                    digs.append(hashlib.md5(frame).hexdigest())
                    for c in passthrough:
                        extra[c].append(pdf[c].iloc[row_i])
            if not ids:
                continue  # avoid dtype-less empty Series for passthrough
            out = {
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_len": pd.Series(lens, dtype="int64"),
                "frame_digest": pd.Series(digs, dtype="object"),
            }
            for c in passthrough:
                out[c] = pd.Series(extra[c])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=schema)


BLOCK_BYTES = 32  # content-addressed block size at test scale (4-64 KiB real)


def payload_blocks(
    media: DataFrame,
    block: int = BLOCK_BYTES,
    extra_cols: tuple = (),
) -> DataFrame:
    """(h, blen, *extra_cols): fixed-size content-addressed blocks of a
    media frame's ``payload`` column — md5 per block, payload bytes
    never travel past the hash projection. Native binary substring +
    md5 (JVM codegen; no Python worker touches the bytes). Shared by
    mm4's batch savings report and the streaming block-index sink."""
    b = F.expr(f"substring(payload, p, {block})")
    return media.select(
        *extra_cols,
        "payload",
        F.explode(
            F.sequence(F.lit(1), F.length("payload"), F.lit(block))
        ).alias("p"),
    ).select(
        *extra_cols,
        F.md5(b).alias("h"),
        F.length(b).cast("bigint").alias("blen"),
    )
