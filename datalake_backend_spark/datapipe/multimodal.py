"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side contract — schemas, partition-aware ``mapInPandas``
plumbing, Arrow batch shapes — is real and tested, and so is the image
codec: :func:`decode_image` is a dependency-free byte-level PPM (P6)
parser (header tokenizer + ``numpy.frombuffer``), with
:func:`encode_ppm` as its inverse. Payloads that are not a supported
image format (e.g. video containers, or the opaque stand-in payloads
the dedup flow fingerprints) fall back to content-hash features —
decode never silently fakes pixel data.

Scale notes: media bytes stay in a ``binary`` column co-located with
metadata (one table, no URI-chasing joins); feature extraction is an
Arrow-batched map stage — no shuffle; frame sampling explodes only the
sampled offsets, not the media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import numpy as np
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


def _hash_feature(payload: bytes, dim: int) -> list[float]:
    """Content-fingerprint feature vector for payloads that are NOT a
    decodable image (video containers, opaque dedup stand-ins): bytes
    of sha256(payload) scaled to [0,1). Stable across runs/executors;
    the q49 oracle reproduces element 0 from the hex digest."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i % 32] / 256.0 for i in range(dim)]


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255) encoder: ``(h, w, 3)`` uint8 array →
    header + raw interleaved RGB bytes. Inverse of :func:`decode_image`."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_ppm expects an (h, w, 3) array")
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Dependency-free byte-level image decode → ``(h, w, 3)`` uint8.

    Supports binary PPM (P6): '#' comments and arbitrary whitespace in
    the header, exactly one whitespace byte after maxval, then raw
    ``w*h*3`` samples. Raises ``ValueError`` for any other format —
    callers that can tolerate undecodable payloads (feature extraction
    over mixed media) catch it and fall back to hash features."""
    if not payload or payload[:2] != b"P6":
        raise ValueError("unsupported image format (supported: PPM P6)")
    pos, vals = 2, []
    while len(vals) < 3:
        ch = payload[pos : pos + 1]
        if ch.isspace():
            pos += 1
        elif ch == b"#":
            pos = payload.index(b"\n", pos) + 1
        else:
            end = pos
            while payload[end : end + 1].isdigit():
                end += 1
            if end == pos:
                raise ValueError("malformed PPM header")
            vals.append(int(payload[pos:end]))
            pos = end
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only 8-bit PPM (maxval 255) supported")
    pos += 1  # the single whitespace byte separating header and raster
    data = payload[pos : pos + w * h * 3]
    if len(data) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(data, np.uint8).reshape(h, w, 3)


def _pooled_feature(img: np.ndarray, dim: int) -> list[float]:
    """Decoded-image feature vector in [0,1): 2×2 grid × 3 channel
    means, 3 global channel means, and a size bucket — all integer
    sums divided by exact counts, so bit-stable everywhere."""
    h, w, _ = img.shape
    feats: list[float] = []
    for gr in range(2):
        r0, r1 = (gr * h) // 2, max((gr * h) // 2 + 1, ((gr + 1) * h) // 2)
        for gc in range(2):
            c0, c1 = (gc * w) // 2, max((gc * w) // 2 + 1, ((gc + 1) * w) // 2)
            cell = img[r0:r1, c0:c1].reshape(-1, 3)
            sums = cell.sum(axis=0, dtype=np.int64)
            feats.extend(float(s) / (len(cell) * 256.0) for s in sums)
    glob = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    feats.extend(float(s) / (h * w * 256.0) for s in glob)
    feats.append((h * w % 4096) / 4096.0)
    return feats[:dim] + [0.0] * max(0, dim - len(feats))


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

    ``mapInPandas`` so each task processes whole record batches.
    Decodable images (PPM) get real pooled-pixel features; anything
    else gets content-hash features — mixed media tables work without
    a per-format pipeline split."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def one(p) -> list[float]:
        b = bytes(p) if p is not None else b""
        try:
            return _pooled_feature(decode_image(b), dim)
        except ValueError:
            return _hash_feature(b, dim)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [one(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def synthetic_ppm_table(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL image table: each row becomes a binary P6 PPM
    whose dims and pixels are closed-form functions of the id —
    ``w = 4 + id%5``, ``h = 3 + id%4``, ``pixel(r,c,ch) = (id*31 + r*7
    + c*3 + ch*11) % 256`` — so a SQL oracle can recompute any decoded
    statistic without an image library. Encoding runs in the Arrow
    batch (mapInPandas), the same path a real ingest would use."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["media_id"].to_numpy()
            payloads, metas = [], []
            for i in ids:
                i = int(i)
                w, h = 4 + i % 5, 3 + i % 4
                r = np.arange(h).reshape(h, 1, 1)
                c = np.arange(w).reshape(1, w, 1)
                ch = np.arange(3).reshape(1, 1, 3)
                img = ((i * 31 + r * 7 + c * 3 + ch * 11) % 256).astype(np.uint8)
                payloads.append(encode_ppm(img))
                metas.append(
                    {
                        "mime": "image/x-portable-pixmap",
                        "width": w,
                        "height": h,
                        "duration_ms": None,
                        "codec": "ppm",
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    return docs.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        gen, MEDIA_SCHEMA
    )


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def image_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL decode path: parse every payload with :func:`decode_image`
    and emit per-image dimensions + exact per-channel sums/means.
    Integer sums divided by exact pixel counts → bit-identical doubles
    in any engine. Map-only (one Arrow stage, no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(p))
                h, w, ch = img.shape
                s = img.reshape(-1, ch).sum(axis=0, dtype=np.int64)
                n = h * w
                recs.append(
                    {
                        "media_id": int(i),
                        "width": w,
                        "height": h,
                        "channels": ch,
                        "n_pixels": n,
                        "sum_r": int(s[0]),
                        "sum_g": int(s[1]),
                        "sum_b": int(s[2]),
                        "mean_r": int(s[0]) / n,
                        "mean_g": int(s[1]) / n,
                        "mean_b": int(s[2]) / n,
                    }
                )
            yield pd.DataFrame(recs)

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_STATS_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Real image resize over the Arrow batch: decodable payloads (PPM)
    are decoded, nearest-neighbor resampled to ``(height, width)``, and
    re-encoded; non-decodable payloads pass through unchanged (only
    their metadata dims update, mirroring a downstream contract).
    Map-only — one ``mapInPandas`` stage, no shuffle."""

    def one(p):
        b = bytes(p) if p is not None else b""
        try:
            img = decode_image(b)
        except ValueError:
            return b
        h, w, _ = img.shape
        rows = (np.arange(height) * h) // height
        cols = (np.arange(width) * w) // width
        return encode_ppm(img[rows][:, cols])

    cols_out = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[payload_col] = [one(p) for p in pdf[payload_col]]
            yield pdf[cols_out]

    resized = df.mapInPandas(batches, df.schema)
    return resized.withColumn(
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
