"""Multimodal column plumbing: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed in Arrow-batched
``mapInPandas`` stages.

The sandbox has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features derived from the bytes, or
``NotImplementedError`` when a real decode is requested). Everything
Spark-side — schema, batch iteration, partitioning, UDF signatures — is
real and tested; swapping the stub for Pillow/librosa is a one-function
change inside the pandas batch.

Scale notes: binary payloads never shuffle (all stages are map-only);
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory when
payloads are large (tune down for video frames).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest_md5", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table: (media_id, payload binary, format).
    Payload = utf-8 bytes of the text (stand-in for image bytes); format
    cycles deterministically. Purely a fixture builder — real pipelines
    read (id, payload, format) from the lake."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("wav")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("format"),
    ).where(F.col(text_col).isNotNull())


def _fake_decode(payload: bytes, fmt: str) -> tuple[int, int]:
    """STUB for the codec step (no image/audio libs in this container).
    Deterministic pseudo-dimensions from the digest — replace with
    Pillow/librosa decode in production."""
    d = hashlib.md5(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192


def decode_media_meta(
    df: DataFrame, real_decode: bool = False, batch_hint: int | None = None
) -> DataFrame:
    """mapInPandas stage: binary payload → typed metadata row per media.

    The Arrow batch iterator shape (Iterator[pd.DataFrame] →
    Iterator[pd.DataFrame]) is the production contract; only the per-row
    decode inside is stubbed."""
    if real_decode:
        raise NotImplementedError(
            "real media decode requires codec libraries not present in this "
            "environment; the Spark plumbing is identical either way"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            widths, heights, digests, sizes = [], [], [], []
            for p in payloads:
                b = bytes(p) if p is not None else b""
                w, h = _fake_decode(b, "")
                widths.append(w)
                heights.append(h)
                digests.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": sizes,
                    "digest_md5": digests,
                    "format": pdf["format"],
                    "width": widths,
                    "height": heights,
                }
            )

    return df.mapInPandas(batches, MEDIA_META_SCHEMA)


FRAME_CHARS = 256  # "frame" = fixed-size window of the decoded payload


def sample_frames(
    df: DataFrame,
    frame_chars: int = FRAME_CHARS,
    every_n: int = 2,
    strategy: str = "udf",
) -> DataFrame:
    """Frame-sampling plumbing: ONE media row → N sampled frame rows
    (media_id, frame_idx, n_chars, frame_md5) — every `every_n`-th
    fixed-size window of the decoded payload. This is the 1→N mapInPandas
    contract a real video frame extractor uses (payload → decoded frames →
    per-frame rows); the codec is the stub (windows of the decoded text
    stand in for decoded frames — the sandbox ships no video libs).

    strategy='udf' (default): Arrow mapInPandas — the production shape.
    strategy='native': pure Catalyst sequence+explode twin (pinned equal)."""
    if strategy == "native":
        s = F.decode(F.col("payload"), "UTF-8")
        n_frames = F.ceil(F.length(s) / F.lit(frame_chars)).cast("int")
        idxs = F.when(
            F.length(s) > 0,
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)),
        ).otherwise(F.expr("CAST(array() AS array<int>)"))
        ex = df.select(
            "media_id", s.alias("__s"), F.explode(idxs).alias("frame_idx")
        )
        frame = F.substring(
            F.col("__s"), F.col("frame_idx") * frame_chars + 1, frame_chars
        )
        return ex.select(
            "media_id",
            "frame_idx",
            F.length(frame).alias("n_chars"),
            F.md5(frame).alias("frame_md5"),
        )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("n_chars", IntegerType()),
            StructField("frame_md5", StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens, digs = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                s = bytes(p).decode("utf-8") if p is not None else ""
                n = (len(s) + frame_chars - 1) // frame_chars
                for i in range(0, n, every_n):
                    fr = s[i * frame_chars : (i + 1) * frame_chars]
                    ids.append(mid)
                    idxs.append(i)
                    lens.append(len(fr))
                    digs.append(hashlib.md5(fr.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "n_chars": lens,
                 "frame_md5": digs}
            )

    return df.mapInPandas(batches, out_schema)


def resize_media(
    df: DataFrame, target_w: int, target_h: int, strategy: str = "udf"
) -> DataFrame:
    """Resize plumbing: payload → (media_id, payload, width, height, format)
    with the payload "resampled" to the target size. The resample is the
    stub (deterministic truncate-to-budget of the decoded payload, budget =
    w·h/16 chars — a real implementation decodes, resizes with
    Pillow/ffmpeg, re-encodes inside the same batch loop); the schema,
    batching, and map-only plan shape are the production contract."""
    budget = max(1, (target_w * target_h) // 16)
    if strategy == "native":
        s = F.decode(F.col("payload"), "UTF-8")
        return df.select(
            "media_id",
            F.encode(F.substring(s, 1, budget), "UTF-8").alias("payload"),
            F.lit(target_w).alias("width"),
            F.lit(target_h).alias("height"),
            "format",
        )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("format", StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                if p is None:
                    out.append(None)  # NULL in → NULL out, like the native twin
                else:
                    s = bytes(p).decode("utf-8")
                    out.append(s[:budget].encode("utf-8"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": target_w,
                    "height": target_h,
                    "format": pdf["format"],
                }
            )

    return df.mapInPandas(batches, out_schema)


def media_meta_native(df: DataFrame) -> DataFrame:
    """Native-expression twin of decode_media_meta minus the stub decode:
    byte length + md5 digest via JVM functions (no Python at all). Used as
    the oracle-checkable projection and the fast path when only
    size/digest metadata is needed."""
    return df.select(
        F.col("media_id"),
        F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("payload")).alias("digest_md5"),
        F.col("format"),
    )
