"""Perceptual-hash image near-dup tests (datapipe/phash.py).

The r132 oracle row certifies the exact-match path (max_hamming=0) on
grid-multiple images; these tests pin the general mechanics: ragged
block boundaries, invariances, NULL handling for undecodable/too-small
payloads, and the Hamming-banded candidate join (max_hamming 1..3)
against a brute-force reference.
"""

from __future__ import annotations

import numpy as np
import pytest

from datalake_backend_spark.datapipe.multimodal import (
    encode_bmp,
    encode_gif,
    encode_png,
    encode_ppm,
)
from datalake_backend_spark.datapipe.phash import (
    dhash64,
    image_near_dups,
    perceptual_hashes,
)



def _rand_img(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_dhash_container_invariance():
    rng = np.random.default_rng(2)
    img = _rand_img(rng, 16, 18)
    ref = dhash64(img)
    from datalake_backend_spark.datapipe.multimodal import decode_image

    for enc in (encode_ppm, encode_bmp, encode_png):
        assert dhash64(decode_image(enc(img))) == ref
    # GIF needs <= 256 colors: quantize to a palette first
    pal = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    pimg = pal[rng.integers(0, 200, (16, 18))]
    assert dhash64(decode_image(encode_gif(pimg))) == dhash64(pimg)


def test_dhash_integer_rescale_invariance():
    rng = np.random.default_rng(4)
    img = _rand_img(rng, 8, 9)
    up = img.repeat(4, axis=0).repeat(2, axis=1)
    assert dhash64(img) == dhash64(up)


def test_dhash_ragged_blocks_match_bruteforce():
    """Non-multiple dims exercise the cross-multiplied comparison:
    verify against a float-mean brute force (floats are safe as a test
    reference; the production path stays integer)."""
    rng = np.random.default_rng(6)
    for h, w in [(8, 9), (11, 13), (30, 17), (100, 33)]:
        img = _rand_img(rng, h, w)
        hi, lo = dhash64(img)
        luma = img.astype(np.float64).sum(axis=2)
        rb = [(br * h) // 8 for br in range(9)]
        cb = [(bc * w) // 9 for bc in range(10)]
        means = np.array(
            [
                [
                    luma[rb[i] : rb[i + 1], cb[j] : cb[j + 1]].mean()
                    for j in range(9)
                ]
                for i in range(8)
            ]
        )
        exp_hi = exp_lo = 0
        for i in range(8):
            for j in range(8):
                if means[i, j] < means[i, j + 1]:
                    idx = i * 8 + j
                    if idx < 32:
                        exp_lo |= 1 << idx
                    else:
                        exp_hi |= 1 << (idx - 32)
        assert (hi, lo) == (exp_hi, exp_lo), (h, w)


def test_dhash_too_small_raises():
    with pytest.raises(ValueError, match="smaller"):
        dhash64(np.zeros((7, 20, 3), np.uint8))
    with pytest.raises(ValueError, match="smaller"):
        dhash64(np.zeros((20, 8, 3), np.uint8))


def test_perceptual_hashes_null_for_undecodable(spark):
    rng = np.random.default_rng(8)
    img = _rand_img(rng, 12, 14)
    rows = [
        (1, bytearray(encode_ppm(img))),
        (2, bytearray(b"not an image")),
        (3, bytearray(encode_ppm(_rand_img(rng, 4, 4)))),  # below grid
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in perceptual_hashes(df).collect()}
    hi, lo = dhash64(img)
    assert (out[1]["dhash_hi"], out[1]["dhash_lo"]) == (hi, lo)
    assert out[2]["dhash_hi"] is None and out[3]["dhash_hi"] is None


def _hamming(a, b):
    return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")


def test_banded_near_dup_matches_bruteforce(spark):
    """max_hamming=3 via the 4×16-bit pigeonhole join finds EXACTLY the
    brute-force pair set (the bands guarantee completeness for k ≤ 3;
    the popcount verify guarantees precision)."""
    rng = np.random.default_rng(10)
    base = _rand_img(rng, 16, 18)
    variants = []
    for i in range(12):
        img = base.copy()
        # perturb a few random pixels: small Hamming distances
        for _ in range(i):
            r, c = rng.integers(0, 16), rng.integers(0, 18)
            img[r, c] = rng.integers(0, 256, 3)
        variants.append((i, img))
    variants.append((50, _rand_img(rng, 16, 18)))  # unrelated
    hashes = {i: dhash64(im) for i, im in variants}
    expected = {
        (a, b)
        for a in hashes
        for b in hashes
        if a < b and _hamming(hashes[a], hashes[b]) <= 3
    }
    rows = [(i, bytearray(encode_ppm(im))) for i, im in variants]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dups(df, max_hamming=3).collect()
    }
    assert set(got) == expected
    for (a, b), ham in got.items():
        assert ham == _hamming(hashes[a], hashes[b])


def test_exact_match_catches_reencoded_copy(spark):
    """The r132 story in miniature: same pixels, different container →
    different sha256, same dHash, paired at max_hamming=0."""
    rng = np.random.default_rng(12)
    img = _rand_img(rng, 16, 18)
    rows = [
        (1, bytearray(encode_ppm(img))),
        (2, bytearray(encode_png(img))),
        (3, bytearray(encode_ppm(_rand_img(rng, 16, 18)))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = [
        (r["id_a"], r["id_b"]) for r in image_near_dups(df, max_hamming=0).collect()
    ]
    assert pairs == [(1, 2)]


def test_max_hamming_bounds(spark):
    df = spark.createDataFrame([(1, bytearray(b""))], "media_id long, payload binary")
    with pytest.raises(ValueError, match="0..3"):
        image_near_dups(df, max_hamming=4)


# ------------------------------------------------- audio fingerprint


def test_audio_fingerprint_channel_invariance():
    from datalake_backend_spark.datapipe.phash import audio_fingerprint64

    rng = np.random.default_rng(14)
    mono = rng.integers(-2048, 2048, (200, 1)).astype(np.int16)
    stereo = np.repeat(mono, 2, axis=1)
    quad = np.repeat(mono, 4, axis=1)
    ref = audio_fingerprint64(mono)
    assert audio_fingerprint64(stereo) == ref
    assert audio_fingerprint64(quad) == ref


def test_audio_fingerprint_too_short_raises():
    from datalake_backend_spark.datapipe.phash import audio_fingerprint64

    with pytest.raises(ValueError, match="shorter"):
        audio_fingerprint64(np.zeros((64, 1), np.int16))


def test_audio_fingerprint_ragged_windows():
    """Frame counts that are NOT multiples of 65 exercise the
    cross-multiplied comparison; check against a float-mean brute
    force."""
    from datalake_backend_spark.datapipe.phash import audio_fingerprint64

    rng = np.random.default_rng(16)
    for frames in (65, 66, 131, 997):
        mono = rng.integers(-2048, 2048, (frames, 1)).astype(np.int16)
        hi, lo = audio_fingerprint64(mono)
        a = np.abs(mono[:, 0].astype(np.float64))
        bounds = [(w * frames) // 65 for w in range(66)]
        means = np.array(
            [a[bounds[w] : bounds[w + 1]].mean() for w in range(65)]
        )
        exp_hi = exp_lo = 0
        for w in range(64):
            if means[w] < means[w + 1]:
                if w < 32:
                    exp_lo |= 1 << w
                else:
                    exp_hi |= 1 << (w - 32)
        assert (hi, lo) == (exp_hi, exp_lo), frames


def test_audio_near_dup_catches_channel_relayout(spark):
    """The r136 story in miniature: same waveform, mono vs stereo →
    different bytes, same fingerprint, paired at Hamming 0."""
    from datalake_backend_spark.datapipe.multimodal import encode_wav
    from datalake_backend_spark.datapipe.phash import audio_near_dups

    rng = np.random.default_rng(18)
    mono = rng.integers(-2048, 2048, (300, 1)).astype(np.int16)
    other = rng.integers(-2048, 2048, (300, 1)).astype(np.int16)
    rows = [
        (1, bytearray(encode_wav(mono, 8000))),
        (2, bytearray(encode_wav(np.repeat(mono, 2, axis=1), 8000))),
        (3, bytearray(encode_wav(other, 8000))),
        (4, bytearray(b"not audio")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = [
        (r["id_a"], r["id_b"]) for r in audio_near_dups(df, max_hamming=0).collect()
    ]
    assert pairs == [(1, 2)]


# ------------------------------------------------- video signature


def test_video_signature_fps_invariance(spark):
    """Same frames, different declared fps → different bytes, same
    signature (the r138 story)."""
    from datalake_backend_spark.datapipe.multimodal import encode_rawvideo
    from datalake_backend_spark.datapipe.phash import video_near_dups

    rng = np.random.default_rng(20)
    frames = rng.integers(0, 255, (4, 16, 18, 3), dtype=np.uint8)
    other = rng.integers(0, 255, (4, 16, 18, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_rawvideo(frames, 5))),
        (2, bytearray(encode_rawvideo(frames, 30))),
        (3, bytearray(encode_rawvideo(other, 5))),
        (4, bytearray(b"not video")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = [(r["id_a"], r["id_b"]) for r in video_near_dups(df).collect()]
    assert pairs == [(1, 2)]


def test_video_signature_frame_order_and_sampling(spark):
    from datalake_backend_spark.datapipe.multimodal import encode_rawvideo
    from datalake_backend_spark.datapipe.phash import (
        dhash64,
        video_phash_signature,
    )

    rng = np.random.default_rng(22)
    frames = rng.integers(0, 255, (5, 16, 18, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_rawvideo(frames, 10)))],
        "media_id long, payload binary",
    )
    sig = video_phash_signature(df).collect()[0]["signature"]
    exp = ",".join(
        "%d:%d" % dhash64(frames[f]) for f in range(5)
    )
    assert sig == exp
    # every=2 samples frames 0, 2, 4 only
    sig2 = video_phash_signature(df, every=2).collect()[0]["signature"]
    assert sig2 == ",".join("%d:%d" % dhash64(frames[f]) for f in (0, 2, 4))
    # reordered frames change the signature
    df2 = spark.createDataFrame(
        [(1, bytearray(encode_rawvideo(frames[::-1], 10)))],
        "media_id long, payload binary",
    )
    assert video_phash_signature(df2).collect()[0]["signature"] != sig


def test_hot_group_cap(spark):
    """max_group bounds the quadratic hazard of a hot perceptual key
    (site-logo images): the hot group is dropped, cold pairs survive
    (the cap_hot_buckets contract for the perceptual tier)."""
    from datalake_backend_spark.datapipe.phash import image_near_dups

    rng = np.random.default_rng(30)
    logo = _rand_img(rng, 16, 18)
    pair = _rand_img(rng, 16, 18)
    rows = [(i, bytearray(encode_ppm(logo))) for i in range(10)]
    rows += [(20, bytearray(encode_ppm(pair))), (21, bytearray(encode_png(pair)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    from datalake_backend_spark.datapipe.phash import (
        hash_near_dups,
        perceptual_hashes,
    )

    hashes = perceptual_hashes(df)
    capped = hash_near_dups(hashes, max_group=5).collect()
    assert [(r["id_a"], r["id_b"]) for r in capped] == [(20, 21)]
    # uncapped: all 45 logo pairs + the cold pair, answers unchanged
    assert len(hash_near_dups(hashes).collect()) == 46
    # banded path honors the cap too
    assert (20, 21) in {
        (r["id_a"], r["id_b"])
        for r in hash_near_dups(hashes, max_hamming=3, max_group=5).collect()
    }
