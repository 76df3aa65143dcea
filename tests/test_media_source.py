"""Custom Python DataSource tests (sources/media_source.py).

The r137 oracle row certifies payload fidelity end-to-end (decode
stats of real GIF bytes read through the source); these tests pin the
planning mechanics the oracle can't see: header probing per container,
filename-based listing rules, size-balanced bin packing, and
planning-time filter pushdown.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from datalake_backend_spark.datapipe.multimodal import (
    encode_bmp,
    encode_gif,
    encode_png,
    encode_ppm,
    encode_rawvideo,
    encode_wav,
)
from datalake_backend_spark.sources.media_source import (
    MediaFileReader,
    probe_media,
    register_media_source,
)


def _write_corpus(d):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 200, (12, 15, 3), dtype=np.uint8)
    files = {
        "1.ppm": encode_ppm(img),
        "2.bmp": encode_bmp(img),
        "3.png": encode_png(img),
        "4.gif": encode_gif(img),
        "5.wav": encode_wav(np.zeros((1600, 2), np.int16), 8000),
        "6.rawv": encode_rawvideo(
            rng.integers(0, 255, (3, 4, 5, 3), dtype=np.uint8), 10
        ),
    }
    for name, payload in files.items():
        with open(os.path.join(d, name), "wb") as fh:
            fh.write(payload)
    return files


def test_probe_dims_and_duration(tmp_path):
    files = _write_corpus(str(tmp_path))
    assert probe_media(files["1.ppm"], "ppm") == (15, 12, None)
    assert probe_media(files["2.bmp"], "bmp") == (15, 12, None)
    assert probe_media(files["3.png"], "png") == (15, 12, None)
    assert probe_media(files["4.gif"], "gif") == (15, 12, None)
    assert probe_media(files["5.wav"], "pcm_s16le") == (None, None, 200)
    assert probe_media(files["6.rawv"], "rawv") == (5, 4, 300)
    # corrupt headers degrade to NULLs, never raise
    assert probe_media(b"garbage", "png") == (None, None, None)


def test_probe_jpeg_sof(tmp_path):
    from datalake_backend_spark.datapipe.multimodal import encode_jpeg

    img = np.zeros((16, 24, 3), np.uint8)
    assert probe_media(encode_jpeg(img), "jpeg") == (24, 16, None)


def test_listing_rules(tmp_path):
    d = str(tmp_path)
    _write_corpus(d)
    open(os.path.join(d, "notes.txt"), "w").write("x")
    open(os.path.join(d, "thumb.png"), "wb").write(b"")  # non-numeric stem
    reader = MediaFileReader({"path": d})
    files = reader._list_files()
    assert [f[0] for f in files] == [1, 2, 3, 4, 5, 6]
    assert all(os.path.basename(p)[0].isdigit() for _, p, _ in files)


def test_bin_packing_balances_bytes(tmp_path):
    d = str(tmp_path)
    # one big file + many small ones
    rng = np.random.default_rng(7)
    big = rng.integers(0, 255, (50, 120, 160, 3), dtype=np.uint8)
    open(os.path.join(d, "0.rawv"), "wb").write(encode_rawvideo(big, 10))
    for i in range(1, 9):
        img = rng.integers(0, 200, (10, 10, 3), dtype=np.uint8)
        open(os.path.join(d, f"{i}.ppm"), "wb").write(encode_ppm(img))
    reader = MediaFileReader({"path": d, "numPartitions": "3"})
    parts = reader.partitions()
    assert len(parts) == 3
    # the video gets a bin of its own; small files share the others
    sizes = [sum(os.path.getsize(p) for _, p, _ in part.files) for part in parts]
    big_bin = [part for part in parts if any(m == 0 for m, _, _ in part.files)]
    assert len(big_bin) == 1 and len(big_bin[0].files) == 1
    assert sum(len(p.files) for p in parts) == 9
    assert max(sizes) >= os.path.getsize(os.path.join(d, "0.rawv"))


def test_pushdown_prunes_at_planning(tmp_path):
    from pyspark.sql.datasource import EqualTo

    d = str(tmp_path)
    _write_corpus(d)
    reader = MediaFileReader({"path": d})
    rest = reader.pushFilters(
        [EqualTo(("media_id",), 3), EqualTo(("path",), "x")]
    )
    assert [type(f).__name__ for f in rest] == ["EqualTo"]  # path unsupported
    files = reader._list_files()
    assert [f[0] for f in files] == [3]
    r2 = MediaFileReader({"path": d})
    r2.pushFilters([EqualTo(("codec",), "pcm_s16le")])
    assert [f[0] for f in r2._list_files()] == [5]


def test_end_to_end_rows_and_payload_fidelity(spark, tmp_path):
    d = str(tmp_path)
    files = _write_corpus(d)
    register_media_source(spark)
    df = (
        spark.read.format("mediafile")
        .option("path", d)
        .option("numPartitions", "2")
        .load()
    )
    rows = {r["media_id"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    assert bytes(rows[4]["payload"]) == files["4.gif"]  # exact bytes
    assert rows[4]["meta"]["codec"] == "gif"
    assert rows[5]["meta"]["duration_ms"] == 200
    assert rows[6]["meta"]["width"] == 5 and rows[6]["meta"]["height"] == 4


def test_filtered_query_through_spark(spark, tmp_path):
    """Filter pushdown wired through the engine conf: the query answers
    correctly whether or not planning-time pruning fired, and with the
    conf on it must also prune the listing (observed via the recorded
    filters)."""
    d = str(tmp_path)
    _write_corpus(d)
    register_media_source(spark)
    df = spark.read.format("mediafile").option("path", d).load()
    got = df.where("media_id = 2").collect()
    assert len(got) == 1 and got[0]["meta"]["codec"] == "bmp"
    assert df.where("codec = 'gif'").count() == 1


def test_missing_path_raises(spark):
    register_media_source(spark)
    with pytest.raises(Exception):
        spark.read.format("mediafile").load().collect()


def test_streaming_directory_watch_exactly_once(spark, tmp_path):
    """readStream over the directory: each file exactly once across
    two availableNow drains sharing a checkpoint; a file landing AT or
    BELOW the id watermark is ignored (the documented monotonic-stem
    contract), O(1) offset state."""
    rng = np.random.default_rng(9)
    d, ckpt, out = (
        str(tmp_path / "media"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    os.makedirs(d)

    def put(i):
        with open(os.path.join(d, f"{i}.ppm"), "wb") as fh:
            fh.write(
                encode_ppm(rng.integers(0, 255, (10, 12, 3), dtype=np.uint8))
            )

    register_media_source(spark)

    def drain():
        q = (
            spark.readStream.format("mediafile")
            .option("path", d)
            .load()
            .selectExpr("media_id", "codec")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for i in range(5):
        put(i)
    drain()
    assert sorted(
        r.media_id for r in spark.read.parquet(out).collect()
    ) == list(range(5))
    for i in range(5, 8):
        put(i)
    put(2)  # below the watermark: already processed, must not re-emit
    drain()
    assert sorted(
        r.media_id for r in spark.read.parquet(out).collect()
    ) == list(range(8))
