"""Baseline JPEG codec tests (datapipe/jpeg.py).

The r127 oracle row only certifies the EXACT family (block-constant
grayscale at quality 75); these tests pin the lossy general case —
reconstruction tolerances, subsampling layouts, restart markers,
malformed input — which is decoder-defined and not SQL-expressible.
"""

from __future__ import annotations

import numpy as np
import pytest

from datalake_backend_spark.datapipe.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    scaled_quant_tables,
)


def _block_constant(h_blocks: int, w_blocks: int, seed: int = 37) -> np.ndarray:
    img = np.zeros((8 * h_blocks, 8 * w_blocks, 3), np.uint8)
    for br in range(h_blocks):
        for bc in range(w_blocks):
            img[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8, :] = (
                seed + br * 17 + bc * 29
            ) % 256
    return img


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # first diagonal walk of T.81 Figure 5
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]


def test_quality_scaling():
    qy50, _ = scaled_quant_tables(50)
    qy75, qc75 = scaled_quant_tables(75)
    qy100, _ = scaled_quant_tables(100)
    assert qy50[0] == 16  # scale 100 keeps Annex K
    assert qy75[0] == 8  # the r127 exactness hinge
    assert (qy100 == 1).all()  # quality 100 -> all ones
    assert qc75[0] == 9
    with pytest.raises(ValueError):
        scaled_quant_tables(0)


def test_block_constant_roundtrip_is_exact():
    """Pure-DC blocks + DC quant step 8 + chroma identically 128 ->
    bit-exact round trip (the r127 oracle's contract)."""
    img = _block_constant(2, 3)
    enc = encode_jpeg(img, quality=75)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert np.array_equal(decode_jpeg(enc), img)


def test_lossy_tolerance_by_quality():
    rng = np.random.default_rng(7)
    # smooth content: high quality must be near-lossless
    x = np.linspace(0, 255, 40)
    grad = np.stack(np.meshgrid(x, x), axis=-1).mean(axis=-1)
    smooth = np.repeat(grad[:, :, None], 3, axis=2).astype(np.uint8)
    err90 = np.abs(
        decode_jpeg(encode_jpeg(smooth, 90)).astype(int) - smooth.astype(int)
    )
    assert err90.max() <= 3
    # noise: bounded mean error, better at higher quality
    noise = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    m95 = np.abs(
        decode_jpeg(encode_jpeg(noise, 95)).astype(int) - noise.astype(int)
    ).mean()
    m50 = np.abs(
        decode_jpeg(encode_jpeg(noise, 50)).astype(int) - noise.astype(int)
    ).mean()
    assert m95 < m50  # rate-distortion sanity
    assert m95 < 10


@pytest.mark.parametrize("ss", ["4:2:0", "4:2:2"])
def test_subsampled_roundtrip(ss):
    rng = np.random.default_rng(11)
    base = rng.integers(40, 216, (4, 5, 3))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, 90, subsampling=ss))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 8
    # on SMOOTH chroma-rich content the subsampled stream is smaller
    # (on blocky content chroma blocks straddle color edges and can
    # cost MORE AC bits than 4:4:4 — that's real JPEG behavior)
    x = np.linspace(0, 255, 64)
    smooth = np.stack(
        [np.tile(x, (64, 1)), np.tile(x[::-1], (64, 1)), np.full((64, 64), 128.0)],
        axis=-1,
    ).astype(np.uint8)
    assert len(encode_jpeg(smooth, 90, subsampling=ss)) < len(
        encode_jpeg(smooth, 90, subsampling="4:4:4")
    )


def test_odd_dimensions_and_grayscale_promotion():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    for ss in ("4:4:4", "4:2:0"):
        dec = decode_jpeg(encode_jpeg(img, 85, subsampling=ss))
        assert dec.shape == (19, 21, 3)
    gray = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(gray, 85))
    assert dec.shape == (9, 11, 3)
    # channels stay equal through the gray path (Cb=Cr=128 exactly)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert np.array_equal(dec[:, :, 1], dec[:, :, 2])


def test_restart_markers_roundtrip():
    img = _block_constant(2, 3)
    for ri in (1, 2, 5):
        enc = encode_jpeg(img, 75, restart_interval=ri)
        assert np.array_equal(decode_jpeg(enc), img)
    # restart layout decodes identically to the plain layout
    rng = np.random.default_rng(17)
    img2 = rng.integers(0, 256, (24, 33, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img2, 90, restart_interval=2)),
        decode_jpeg(encode_jpeg(img2, 90)),
    )
    assert b"\xff\xdd" in encode_jpeg(img2, 90, restart_interval=2)  # DRI


def test_dc_dpcm_spans_blocks():
    """A gradient of block DC values exercises the DPCM chain — a
    decoder that forgets the predictor produces wildly wrong planes."""
    img = np.zeros((8, 64, 3), np.uint8)
    for bc in range(8):
        img[:, bc * 8 : bc * 8 + 8, :] = 32 * bc
    dec = decode_jpeg(encode_jpeg(img, 75))
    assert np.array_equal(dec, img)  # constant blocks: exact again


def test_byte_stuffing_survives():
    """Content tuned to emit 0xFF bytes in the entropy stream: the
    encoder must stuff 0x00 and the decoder must unstuff."""
    rng = np.random.default_rng(19)
    for trial in range(5):
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        enc = encode_jpeg(img, 95)
        dec = decode_jpeg(enc)  # any unstuffing bug breaks the parse
        assert dec.shape == img.shape


def test_malformed_inputs_raise():
    img = _block_constant(1, 1)
    enc = bytearray(encode_jpeg(img, 75))
    with pytest.raises(ValueError):
        decode_jpeg(b"NOTAJPEG")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc[:40]))  # truncated before SOS
    # progressive SOF2 is honestly unsupported
    sof0 = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:sof0]) + b"\xff\xc2" + bytes(enc[sof0 + 2 :])
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(img, subsampling="4:1:1")


def test_decode_image_dispatches_jpeg():
    from datalake_backend_spark.datapipe.multimodal import decode_image

    img = _block_constant(1, 2)
    assert np.array_equal(decode_image(encode_jpeg(img, 75)), img)


def test_synthetic_jpeg_table_stats_match_closed_form(spark):
    from datalake_backend_spark.datapipe.multimodal import (
        image_stats,
        synthetic_jpeg_table,
    )

    docs = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = image_stats(synthetic_jpeg_table(docs)).orderBy("media_id").collect()
    assert len(out) == 24
    for r in out:
        i = r.media_id
        w, h = 8 * (1 + i % 3), 8 * (1 + i % 2)
        s = sum(
            64 * ((i * 37 + br * 17 + bc * 29) % 256)
            for br in range(h // 8)
            for bc in range(w // 8)
        )
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert r.sum_r == r.sum_g == r.sum_b == s
        assert r.mean_r == s / (w * h)
