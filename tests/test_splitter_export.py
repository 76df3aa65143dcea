"""Feature splitter (A13) + bulk index export (S11) tests."""

from __future__ import annotations

import json

from datalake_backend_spark.pipelines import get_pipeline
from datalake_backend_spark.pipelines.splitter import SPLIT_SPECS, run_splitter
from datalake_backend_spark.serving.export import bulk_index_lines, write_bulk_export
from datalake_backend_spark.sources.readers import read_raw_json
from tests.fixtures import write_fixture


def _gold(spark, tmp_path, domain):
    path = write_fixture(tmp_path, domain)
    raw = read_raw_json(spark, path, domain=domain)
    pipe = get_pipeline(domain)
    return pipe.gold(pipe.silver(raw))


def test_vehicle_splitter(spark, tmp_path):
    gold = _gold(spark, tmp_path, "vehicle")
    outputs = run_splitter(gold, "vehicle")
    assert set(outputs) >= {
        "identity", "movement", "lanes", "violations", "presence",
        "dist_vehicle_type", "summary",
    }
    ident = outputs["identity"].collect()[0]
    assert ident.tracker_id == 1 and ident.vehicle_type == "car"
    lanes = outputs["lanes"].collect()[0]
    assert lanes.lane_changes == 1
    dist = {r.value: r.n for r in outputs["dist_vehicle_type"].collect()}
    assert dist == {"car": 1}
    summary = outputs["summary"].collect()[0]
    assert summary.n_rows == 1 and summary.avg_avg_speed == 20.0


def test_parking_splitter(spark, tmp_path):
    gold = _gold(spark, tmp_path, "parking")
    outputs = run_splitter(gold, "parking")
    occ = {r.slot_id: r.slot_status for r in outputs["occupancy"].collect()}
    assert occ == {"A": "free", "B": "occupied", "C": "free"}
    dist = {r.value: r.n for r in outputs["dist_slot_status"].collect()}
    assert dist == {"free": 2, "occupied": 1}


def test_all_split_specs_run(spark, tmp_path):
    for domain in SPLIT_SPECS:
        outputs = run_splitter(_gold(spark, tmp_path, domain), domain)
        for name, df in outputs.items():
            assert df.count() >= 1, f"{domain}/{name}"


def test_bulk_export_format(spark, tmp_path):
    gold = _gold(spark, tmp_path, "vehicle")
    lines = bulk_index_lines(
        gold.select("tracker_id", "vehicle_type", "max_speed"),
        index="datalake-vehicle-data",
        id_col="tracker_id",
    ).collect()
    action, source = lines[0].value.split("\n")
    a = json.loads(action)
    assert a["index"]["_index"] == "datalake-vehicle-data"
    assert a["index"]["_id"] == "1"
    s = json.loads(source)
    assert s["vehicle_type"] == "car" and "@timestamp" in s

    out = str(tmp_path / "bulk")
    write_bulk_export(
        gold.select("tracker_id", "vehicle_type"), out, "idx", "tracker_id"
    )
    text = [r.value for r in spark.read.text(out).collect()]
    # text source splits the embedded \n: action and source alternate
    assert json.loads(text[0])["index"]["_id"] == "1"
    assert json.loads(text[1])["vehicle_type"] == "car"


def test_mix_to_proportions(spark):
    """Largest no-upsample total: bottleneck source keeps all rows;
    other sources downsample toward the target ratio; unlisted sources
    drop; absent sources raise."""
    import pytest as _pytest

    from datalake_backend_spark.datapipe.sampling import mix_to_proportions
    from pyspark.sql import functions as F

    rows = (
        [(i, "a") for i in range(400)]
        + [(1000 + i, "b") for i in range(100)]
        + [(2000 + i, "c") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # target 1:1 of a and b → T = min(400/0.5, 100/0.5) = 200
    # → f_a = 0.25, f_b = 1.0; c unlisted → dropped
    kept = mix_to_proportions(df, "source", {"a": 0.5, "b": 0.5}, "doc_id")
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["b"] == 100  # bottleneck keeps everything
    assert "c" not in counts
    assert 60 <= counts["a"] <= 140  # ~100 expected, binomial spread
    # deterministic: second run identical
    again = {r.source: r.n for r in mix_to_proportions(df, "source", {"a": 0.5, "b": 0.5}, "doc_id").groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert again == counts
    with _pytest.raises(ValueError, match="absent"):
        mix_to_proportions(df, "source", {"a": 0.5, "zzz": 0.5}, "doc_id")


def test_mix_with_temperature(spark):
    """α-sampling semantics: α=1 keeps every row of every source
    (p_s ∝ n_s is already the corpus mix); α=0.5 keeps the smallest
    source intact and downsamples larger ones toward p_s ∝ √n_s;
    deterministic across runs and partitionings."""
    import math

    from pyspark.sql import functions as F

    from datalake_backend_spark.datapipe.sampling import mix_with_temperature

    rows = (
        [(i, "big") for i in range(900)]
        + [(1000 + i, "mid") for i in range(100)]
        + [(2000 + i, "small") for i in range(25)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # α=1 → p_s ∝ n_s → T = min(n/n)=1 → f_s = 1 for every source
    full = mix_with_temperature(df, "source", "doc_id", alpha=1.0)
    assert full.count() == len(rows)
    # α=0.5: smallest source is the bottleneck (keeps all), larger
    # sources keep ≈ sqrt(n_s/n_min)·n_min rows
    kept = mix_with_temperature(df, "source", "doc_id", alpha=0.5)
    counts = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["small"] == 25
    exp_big = math.sqrt(900 * 25)  # 150
    exp_mid = math.sqrt(100 * 25)  # 50
    assert abs(counts["big"] - exp_big) < 4 * math.sqrt(exp_big)
    assert abs(counts["mid"] - exp_mid) < 4 * math.sqrt(exp_mid)
    # deterministic under a different partitioning
    again = {
        r.source: r.n
        for r in mix_with_temperature(df.repartition(7), "source", "doc_id", alpha=0.5)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert again == counts


def test_index_mapping_from_schema(spark, tmp_path):
    """Mapping derives from the schema: scalars native, strings
    keyword (text only when named), timestamps date, structs nested,
    arrays element-typed."""
    from pyspark.sql import functions as F

    from datalake_backend_spark.serving.export import (
        index_mapping,
        write_index_template,
    )

    df = spark.createDataFrame(
        [(1, "car", "long words here", 1.5, True, [1, 2], ("a", 2))],
        "id long, kind string, text string, score double, ok boolean, "
        "xs array<int>, nest struct<s:string,n:int>",
    ).withColumn("ts", F.current_timestamp())
    m = index_mapping(df)["mappings"]["properties"]
    assert m["id"] == {"type": "long"}
    assert m["kind"] == {"type": "keyword"}
    assert m["text"]["type"] == "text" and "raw" in m["text"]["fields"]
    assert m["score"] == {"type": "double"}
    assert m["ok"] == {"type": "boolean"}
    assert m["xs"] == {"type": "integer"}  # ES arrays are implicit
    assert m["nest"]["properties"]["s"] == {"type": "keyword"}
    assert m["ts"] == {"type": "date"}

    out = tmp_path / "template.json"
    body = write_index_template(df, str(out), "datalake-test")
    import json as _json

    assert _json.load(open(out)) == _json.loads(_json.dumps(body))
    assert body["index"] == "datalake-test"


def test_incremental_index_sync(spark, tmp_path):
    """sync_index_incremental ships only the delta per span: first sync
    = full snapshot as index actions; after a merge+delete, one more
    sync ships exactly the changed ids (update/insert as index actions,
    delete as delete actions); caught-up returns None."""
    import glob
    import json

    from pyspark.sql import functions as F

    from datalake_backend_spark.serving.export import sync_index_incremental
    from datalake_backend_spark.sources.versioned import VersionedTable

    tbl = VersionedTable(str(tmp_path / "gold"))
    mk = lambda rows: spark.createDataFrame(rows, "key int, val string")
    tbl.commit(mk([(1, "a"), (2, "b")]))
    cursor = str(tmp_path / "cursor.json")
    out = str(tmp_path / "idx")

    span = sync_index_incremental(
        spark, tbl, cursor, out, "gold-idx", ["key"], ["val"]
    )
    assert span == (0, 1)

    def lines(span):
        files = glob.glob(f"{out}/span_{span[0]}_{span[1]}/part-*")
        raw = []
        for f in files:
            raw += [ln for ln in open(f).read().splitlines() if ln]
        return raw

    first = lines(span)
    acts = [json.loads(ln) for ln in first if '"index"' in ln or '"delete"' in ln]
    assert {a["index"]["_id"] for a in acts if "index" in a} == {"1", "2"}

    # no changes -> caught up
    assert (
        sync_index_incremental(spark, tbl, cursor, out, "gold-idx", ["key"], ["val"])
        is None
    )

    tbl.merge(spark, mk([(2, "b2"), (3, "c")]), ["key"])
    tbl.delete_where(spark, F.col("key") == 1)
    span2 = sync_index_incremental(
        spark, tbl, cursor, out, "gold-idx", ["key"], ["val"]
    )
    assert span2 == (1, 3)
    second = lines(span2)
    parsed = [json.loads(ln) for ln in second if ln.startswith("{\"")]
    idx_ids = {a["index"]["_id"] for a in parsed if "index" in a}
    del_ids = {a["delete"]["_id"] for a in parsed if "delete" in a}
    assert idx_ids == {"2", "3"} and del_ids == {"1"}
