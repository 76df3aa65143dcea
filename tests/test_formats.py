"""Format-agnostic IO: ORC/CSV/JSON round-trips + ORC pushdown."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from datalake_backend_spark.sources.formats import read_table_fmt, write_table
from datalake_backend_spark.sources.readers import table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    ev = table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    p = str(tmp_path / "ev_orc")
    write_table(ev, p, fmt="orc")
    back = read_table_fmt(spark, p, fmt="orc")
    assert back.count() == ev.count()
    filtered = back.where(F.col("user_id") == 3).select("event_id")
    plan = _plan(filtered)
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters")[1][:120]
    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert "value" not in m.group(1)  # column pruned


def test_csv_roundtrip_requires_schema(spark, tmp_path):
    import pytest

    ev = table(spark, SF_DIR, "events").select("event_id", "user_id", "event_type")
    p = str(tmp_path / "ev_csv")
    write_table(ev, p, fmt="csv")
    with pytest.raises(ValueError):
        read_table_fmt(spark, p, fmt="csv")
    back = read_table_fmt(spark, p, fmt="csv", schema=ev.schema)
    assert back.count() == ev.count()
    assert {r.event_id for r in back.where("user_id = 1").collect()} == {
        r.event_id for r in ev.where("user_id = 1").collect()
    }


def test_jsonl_roundtrip_quarantines_bad_rows(spark, tmp_path):
    ev = table(spark, SF_DIR, "events").select("event_id", "event_type")
    p = str(tmp_path / "ev_json")
    write_table(ev, p, fmt="json")
    back = read_table_fmt(spark, p, fmt="json", schema=ev.schema)
    assert back.count() == ev.count()
    # malformed line quarantines, doesn't fail the scan
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-0.json").write_text('{"event_id": 1, "event_type": "x"}\n{broken\n')
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    got = read_table_fmt(spark, str(bad), fmt="json", schema=schema)
    rows = got.collect()
    assert len(rows) == 2
    assert sum(r._corrupt_record is not None for r in rows) == 1
