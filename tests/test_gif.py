"""GIF codec tests (datapipe/multimodal.py: encode_gif / _decode_gif /
_lzw_encode / _lzw_decode).

GIF is lossless, so unlike JPEG the whole general case is pinned by
exact round trips; the r131 oracle row certifies decoded statistics of
real bitstreams against the closed-form pixel formula. These tests pin
the codec mechanics the oracle can't see from statistics alone: LZW
code-width growth, the 4096-entry dictionary reset, the KwKwK case,
sub-block fragmentation, extension skipping, and malformed input.
"""

from __future__ import annotations

import numpy as np
import pytest

from datalake_backend_spark.datapipe.multimodal import (
    _decode_gif,
    _lzw_decode,
    _lzw_encode,
    decode_image,
    encode_gif,
)


def _palette_image(rng, h, w, ncolors) -> np.ndarray:
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncolors, (h, w))]


def test_roundtrip_random_palettes():
    rng = np.random.default_rng(11)
    for _ in range(60):
        h, w = int(rng.integers(1, 33)), int(rng.integers(1, 33))
        img = _palette_image(rng, h, w, int(rng.integers(1, 257)))
        back = decode_image(encode_gif(img))
        assert np.array_equal(back, img)


def test_roundtrip_single_color_and_single_pixel():
    img = np.full((5, 7, 3), 200, np.uint8)
    assert np.array_equal(decode_image(encode_gif(img)), img)
    img1 = np.array([[[1, 2, 3]]], np.uint8)
    assert np.array_equal(decode_image(encode_gif(img1)), img1)


def test_dictionary_reset_at_4096_codes():
    """200x200 of 256 random colors forces code width to 12 bits and a
    mid-stream Clear; the round trip proves encoder and decoder agree
    on both the growth rule and the reset."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (200, 200, 1), dtype=np.uint8).repeat(3, axis=2)
    payload = encode_gif(img)
    assert len(payload) > 255 + 14  # must span multiple sub-blocks
    assert np.array_equal(decode_image(payload), img)


def test_lzw_kwkwk_case():
    """aaa... emits the code-just-added pattern (code == next free
    entry) immediately; the decoder's KwKwK branch must reconstruct."""
    for mcs in (2, 4, 8):
        idx = np.zeros(50, np.int64)
        assert _lzw_decode(_lzw_encode(idx, mcs), mcs) == b"\x00" * 50


def test_lzw_fuzz_all_widths():
    rng = np.random.default_rng(5)
    for mcs in range(2, 9):
        for n in (0, 1, 2, 300, 7000):
            idx = rng.integers(0, 1 << mcs, n, dtype=np.int64)
            out = _lzw_decode(_lzw_encode(idx, mcs), mcs)
            assert out == bytes(idx.astype(np.uint8))


def test_extensions_are_skipped():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    g = encode_gif(img)
    idesc = g.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control
    comment = b"\x21\xfe\x05hello\x00"
    spliced = g[:idesc] + gce + comment + g[idesc:]
    assert np.array_equal(decode_image(spliced), img)


def test_gif87a_signature_accepted():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    g = encode_gif(img)
    assert np.array_equal(decode_image(b"GIF87a" + g[6:]), img)


def test_interlace_raises():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    g = bytearray(encode_gif(img))
    g[g.index(b"\x2c") + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        _decode_gif(bytes(g))


def test_malformed_input_raises():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    g = encode_gif(img)
    with pytest.raises(ValueError):
        _decode_gif(g[: len(g) // 2])  # truncated
    with pytest.raises(ValueError):
        _decode_gif(b"GIF89a")  # header only
    with pytest.raises(ValueError):
        decode_image(b"NOTGIF" + g[6:])
    # >256 distinct colors refuses to encode
    rng = np.random.default_rng(0)
    big = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(big.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="256"):
        encode_gif(big)


def test_palette_is_deterministic():
    """np.unique sorts the palette, so the same pixels encode to the
    same bytes regardless of row order of discovery — the property the
    r131 oracle's bitstream determinism rests on."""
    rng = np.random.default_rng(9)
    img = _palette_image(rng, 10, 10, 30)
    assert encode_gif(img) == encode_gif(img.copy())
