"""MJPEG-in-AVI container + decode tests (datapipe/avi.py; r259).

Pins the RIFF mechanics the closed-form oracle can't see: WORD
padding of odd-size chunks, idx1 offset convention, seek-vs-scan
equivalence, and malformed-input refusal. The decoded-pixel exactness
on the block-constant fixture family is the r259 oracle's job; here
we check it once end-to-end on Spark.
"""

from __future__ import annotations

import numpy as np
import pytest

from datalake_backend_spark.datapipe.avi import (
    avi_frame_jpeg,
    encode_avi_mjpeg,
    mjpeg_frame_stats,
    parse_avi_meta,
    synthetic_mjpeg_avi_table,
)
from datalake_backend_spark.datapipe.jpeg import decode_jpeg, encode_jpeg


def _fixture_frames(i: int):
    w, h = 8 * (1 + i % 3), 8 * (1 + i % 2)
    n, fps = 2 + i % 3, 5 + i % 3
    br = np.arange(h // 8).reshape(-1, 1)
    bc = np.arange(w // 8).reshape(1, -1)
    raws, jpegs = [], []
    for fi in range(n):
        vals = ((i * 37 + fi * 13 + br * 17 + bc * 29) % 256).astype(np.uint8)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        raws.append(img)
        jpegs.append(encode_jpeg(img, quality=75))
    return w, h, n, fps, raws, jpegs


def test_avi_header_and_seek_roundtrip():
    """Every header field survives the round trip and every frame's
    seek-extracted JPEG decodes to the exact source pixels (the
    quality-75 block-constant family is lossless)."""
    for i in (0, 1, 5, 7):
        w, h, n, fps, raws, jpegs = _fixture_frames(i)
        avi = encode_avi_mjpeg(jpegs, w, h, fps)
        meta = parse_avi_meta(avi)
        assert (meta["n_frames"], meta["width"], meta["height"], meta["fps"]) == (
            n,
            w,
            h,
            fps,
        )
        for fi in range(n):
            jb = avi_frame_jpeg(avi, fi, meta)
            assert jb == jpegs[fi]
            dec = decode_jpeg(jb)
            assert (dec == np.repeat(raws[fi][:, :, None], 3, axis=2)).all()


def test_avi_word_padding_odd_chunks():
    """Odd-size 00dc payloads get a pad byte that must NOT leak into
    the extracted frame, and must not desync later chunk offsets —
    the classic RIFF off-by-one."""
    frames = [b"\xff\xd8odd", b"\xff\xd8even!", b"\xff\xd8x"]  # 5, 8, 3 bytes
    avi = encode_avi_mjpeg(frames, 8, 8, 5)
    meta = parse_avi_meta(avi)
    assert meta["n_frames"] == 3
    for fi, f in enumerate(frames):
        assert avi_frame_jpeg(avi, fi, meta) == f


def test_avi_malformed_inputs_raise():
    w, h, n, fps, _, jpegs = _fixture_frames(3)
    avi = encode_avi_mjpeg(jpegs, w, h, fps)
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi_meta(b"JUNK" + avi[4:])
    with pytest.raises(ValueError):
        parse_avi_meta(avi[: len(avi) // 2])  # truncated mid-chunk
    # a non-MJPG vids handler must be refused, not silently decoded
    bad = avi.replace(b"MJPG", b"H264", 1)
    with pytest.raises(ValueError, match="MJPEG"):
        parse_avi_meta(bad)
    with pytest.raises(IndexError):
        avi_frame_jpeg(avi, n)
    # idx1 size disagreeing with the chunk header is corruption
    meta = parse_avi_meta(avi)
    pos, csize = meta["index"][0]
    corrupt = bytearray(avi)
    corrupt[pos + 4 : pos + 8] = (csize + 2).to_bytes(4, "little")
    with pytest.raises(ValueError, match="disagrees"):
        avi_frame_jpeg(bytes(corrupt), 0)


def test_mjpeg_frame_stats_spark_exact(spark):
    """End-to-end on Spark: the Arrow demux+decode stage reproduces
    the closed-form block sums (3 channels × 64 pixels × block value)
    for every (media, frame)."""
    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    got = {
        (r.media_id, r.frame_idx): (r.n_frames, r.fps, r.sum_rgb, r.mean_rgb)
        for r in mjpeg_frame_stats(
            synthetic_mjpeg_avi_table(docs), every_n=1
        ).collect()
    }
    for i in range(8):
        w, h, n, fps, raws, _ = _fixture_frames(i)
        for fi in range(n):
            s = 3 * int(raws[fi].sum(dtype=np.int64))
            assert got[(i, fi)] == (n, fps, s, s / (w * h * 3))
    assert len(got) == sum(2 + i % 3 for i in range(8))


def test_mjpeg_sampling_skips_frames(spark):
    """every_n=2 must emit only even frame indices — the idx1 seek
    path, not a decode-all-then-filter."""
    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    rows = mjpeg_frame_stats(
        synthetic_mjpeg_avi_table(docs), every_n=2
    ).collect()
    assert rows and all(r.frame_idx % 2 == 0 for r in rows)
