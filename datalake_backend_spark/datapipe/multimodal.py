"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side contract is real and tested — schemas, partition-aware
``mapInPandas`` plumbing, Arrow batch shapes; only the byte-level codec
is stubbed (decode libraries are not in this environment) behind
``DETERMINISTIC_FAKE`` so the pipeline is executable end-to-end.

Scale notes: media bytes stay in a ``binary`` column co-located with
metadata (one table, no URI-chasing joins); feature extraction is an
Arrow-batched map stage — no shuffle; frame sampling explodes only the
sampled offsets, not the media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media metadata struct carried next to every binary payload
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

IMAGE_FEATURE_DIM = 16

#: Flip to plug a real decoder (PIL/ffmpeg) in deployments that have one.
DETERMINISTIC_FAKE = True


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector: bytes
    of sha256(payload) scaled to [0,1). Stable across runs/executors."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i % 32] / 256.0 for i in range(dim)]


def decode_image(payload: bytes) -> object:
    """Byte-level image decode — requires an image library (PIL/opencv)
    that this environment does not ship."""
    if DETERMINISTIC_FAKE:
        raise NotImplementedError(
            "image decode stubbed: no codec libraries in this environment; "
            "extract_image_features uses the deterministic fake instead"
        )
    raise NotImplementedError


def media_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mime: str = "image/png",
) -> DataFrame:
    """Deterministic media table from a documents frame: payload is the
    UTF-8 bytes of the text (an opaque stand-in for real image bytes),
    metadata derived from its length — the MEDIA_SCHEMA contract used by
    every multimodal operator, reproducible in any engine."""
    n = F.octet_length(F.col(text_col).cast("binary"))
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.pmod(n, F.lit(1920)).cast("int").alias("width"),
            F.pmod(n, F.lit(1080)).cast("int").alias("height"),
            (n * 10).cast("long").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def media_fingerprint(
    df: DataFrame, payload_col: str = "payload", out_col: str = "content_sha"
) -> DataFrame:
    """Exact media dedup key: sha256 of the payload bytes + byte count
    (the multimodal twin of text exact_dedup — one map stage)."""
    return df.withColumns(
        {
            out_col: F.sha2(F.col(payload_col), 256),
            "n_bytes": F.octet_length(F.col(payload_col)).cast("long"),
        }
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = IMAGE_FEATURE_DIM,
) -> DataFrame:
    """Arrow-batched feature extraction: binary → array<float>.

    ``mapInPandas`` so each task processes whole record batches; the
    stub hashes bytes, a real impl decodes + pools pixels — the Spark
    plumbing (schema, batching, partitioning) is identical either way.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _fake_feature(p, dim) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def resize_stub(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Resize plumbing: passes bytes through a mapInPandas stage and
    rewrites metadata dims (a real impl re-encodes the pixels)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (payload NOT duplicated — a real decoder seeks)."""
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return df.select(
        id_col, F.explode(offsets).alias("frame_ms"), F.col("meta")
    )
