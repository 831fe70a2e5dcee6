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
