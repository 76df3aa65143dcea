"""MP4/ISO-BMFF metadata demuxer (datapipe/mp4.py; oracle twin r184).

The parser must handle every container shape the writer can emit —
mdat before or after moov, 32-bit and 64-bit (largesize) boxes,
version-0 and version-1 movie/media headers, unknown boxes — and
fail LOUDLY on corrupt or truncated structure instead of returning
partial nonsense.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datalake_backend_spark.datapipe.mp4 import (
    encode_mp4_meta,
    parse_mp4_meta,
)


def _tracks(i: int) -> list[dict]:
    nv = 2 + i % 5
    stts_v = [(nv - 1, 1001), (1, 2002)] if nv >= 4 else [(nv, 1001)]
    tracks = [
        {
            "track_id": 1, "handler": "vide", "codec": "avc1",
            "width": 16 * (1 + i % 4), "height": 16 * (1 + i % 3),
            "media_timescale": 30000, "stts": stts_v,
        }
    ]
    if i % 2 == 0:
        na = 3 + i % 4
        stts_a = [(na - 1, 1024), (1, 2048)] if na >= 4 else [(na, 1024)]
        tracks.append(
            {
                "track_id": 2, "handler": "soun", "codec": "mp4a",
                "width": 0, "height": 0, "media_timescale": 48000,
                "stts": stts_a,
            }
        )
    return tracks


@settings(deadline=None, max_examples=60)
@given(
    i=st.integers(min_value=0, max_value=10_000),
    mdat_len=st.integers(min_value=0, max_value=64),
    mdat_first=st.booleans(),
    largesize=st.booleans(),
    v1=st.booleans(),
)
def test_roundtrip_all_variant_combinations(
    i, mdat_len, mdat_first, largesize, v1
):
    """parse(encode(params)) == params for EVERY combination of the
    structural variants — the writer and parser are independent code
    paths over the public box layout, so agreement pins both."""
    tracks = _tracks(i)
    buf = encode_mp4_meta(
        b"isom",
        movie_timescale=600 * (1 + i % 3),
        movie_duration=123 + i % 1000,
        tracks=tracks,
        mdat_payload=bytes(range(256))[:mdat_len],
        mdat_first=mdat_first,
        mdat_largesize=largesize,
        v1_headers=v1,
    )
    m = parse_mp4_meta(buf)
    assert m["brand"] == "isom"
    assert m["timescale"] == 600 * (1 + i % 3)
    assert m["duration"] == 123 + i % 1000
    assert len(m["tracks"]) == len(tracks)
    for got, want in zip(m["tracks"], tracks):
        assert got["track_id"] == want["track_id"]
        assert got["handler"] == want["handler"]
        assert got["codec"] == want["codec"]
        assert got["width"] == want["width"]
        assert got["height"] == want["height"]
        assert got["media_timescale"] == want["media_timescale"]
        assert got["n_samples"] == sum(c for c, _ in want["stts"])
        assert got["sample_dur_sum"] == sum(
            c * d for c, d in want["stts"]
        )
        assert got["media_duration"] == got["sample_dur_sum"]


def test_unknown_top_level_boxes_are_skipped():
    buf = encode_mp4_meta(b"isom", 1000, 42, _tracks(1))
    # splice an unknown box (valid size + fourcc) between ftyp and the rest
    ftyp_size = struct.unpack(">I", buf[:4])[0]
    junk = struct.pack(">I", 16) + b"wxyz" + b"\xde\xad\xbe\xef" * 2
    spliced = buf[:ftyp_size] + junk + buf[ftyp_size:]
    assert parse_mp4_meta(spliced)["duration"] == 42


def test_not_bmff_raises():
    with pytest.raises(ValueError, match="ISO-BMFF"):
        parse_mp4_meta(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(ValueError, match="ISO-BMFF"):
        parse_mp4_meta(b"")


def test_truncated_and_corrupt_sizes_raise():
    buf = encode_mp4_meta(b"isom", 1000, 42, _tracks(2))
    with pytest.raises(ValueError):
        parse_mp4_meta(buf[: len(buf) // 2])  # mid-box truncation
    # size field smaller than a box header
    bad = bytearray(buf)
    bad[0:4] = struct.pack(">I", 4)
    with pytest.raises(ValueError, match="corrupt|trailing"):
        parse_mp4_meta(bytes(bad))


def test_missing_moov_raises():
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    with pytest.raises(ValueError, match="moov"):
        parse_mp4_meta(ftyp)


def test_mdat_bytes_are_never_parsed():
    """The mdat body may contain arbitrary bytes — including fake box
    headers — and must be skipped purely by its size field."""
    evil = struct.pack(">I", 8) + b"moov" + b"\xff" * 8  # fake nested moov
    a = parse_mp4_meta(
        encode_mp4_meta(b"isom", 1000, 7, _tracks(3), mdat_payload=evil)
    )
    b = parse_mp4_meta(
        encode_mp4_meta(b"isom", 1000, 7, _tracks(3), mdat_payload=b"")
    )
    assert a == b


def test_spark_operator_rows_match_fixture_formula(spark):
    """mp4_track_stats over the synthetic table equals the closed-form
    metadata (the r184 oracle shape) on a small id range."""
    from datalake_backend_spark.datapipe.mp4 import (
        mp4_track_stats,
        synthetic_mp4_table,
    )

    docs = spark.range(40).selectExpr("id AS doc_id")
    rows = mp4_track_stats(synthetic_mp4_table(docs)).collect()
    by_key = {(r.media_id, r.track_id): r for r in rows}
    assert len(rows) == 40 + 20  # one video per doc + audio for evens
    for i in range(40):
        v = by_key[(i, 1)]
        assert v.handler == "vide" and v.codec == "avc1"
        assert v.width == 16 * (1 + i % 4) and v.height == 16 * (1 + i % 3)
        nv = 2 + i % 5
        assert v.n_samples == nv
        assert v.sample_dur_sum == ((nv + 1) if nv >= 4 else nv) * 1001
        assert v.movie_dur_ms == (123 + i % 1000) * 1000 // (
            600 * (1 + i % 3)
        )
        assert ((i, 2) in by_key) == (i % 2 == 0)
