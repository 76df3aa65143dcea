"""Live-Elasticsearch seam smoke (round-11 VERDICT ask #4): when a
real `elasticsearch` client package AND a reachable server exist, the
bulk NDJSON export must round-trip through an actual index — create
the index from our generated mapping, bulk-load one domain's export,
and assert a terms aggregation matches the Spark gold (the reference's
dashboards are terms/date-histogram aggs over these indices,
`Documentations/create_vehicle_dashboard_steps.md`).

In this environment (no `elasticsearch` package, no server) the live
test skips cleanly — same pattern as `tests/test_lakehouse_seam.py` —
and the offline halves of the contract stay pinned by
`test_es_mapping_parity.py` (field/type parity) and
`test_serving_all_domains.py` (NDJSON well-formedness).

Server discovery: `DATALAKE_ES_URL` env var, default
`http://localhost:9200` — point it at any dev container to activate.
"""

from __future__ import annotations

import json
import os

import pytest


def _live_es():
    """An Elasticsearch client iff the package imports AND the server
    answers a ping within 5 s; None otherwise (→ skip)."""
    try:
        from elasticsearch import Elasticsearch
    except ImportError:
        return None
    url = os.environ.get("DATALAKE_ES_URL", "http://localhost:9200")
    try:
        es = Elasticsearch(url, request_timeout=5)
        return es if es.ping() else None
    except Exception:  # noqa: BLE001 — any transport failure = not live
        return None


_ES = _live_es()


@pytest.mark.skipif(
    _ES is None,
    reason="no elasticsearch package / reachable server in this "
    "environment (verified absent in round 12; set DATALAKE_ES_URL "
    "to a dev container to activate this test)",
)
def test_es_live_bulk_roundtrip_vehicle(spark, tmp_path):
    """With a live server: index the vehicle gold export end-to-end
    and assert (1) every exported doc landed, (2) a terms agg over
    vehicle_type returns exactly the Spark-side per-type counts —
    the dashboard-facing contract."""
    from datalake_backend_spark.pipelines import get_pipeline
    from datalake_backend_spark.serving.export import (
        ES_INDEX_NAMES,
        bulk_index_lines,
        es_export_frame,
        index_mapping,
    )
    from datalake_backend_spark.sources.readers import read_raw_json
    from tests.fixtures import write_fixture

    path = write_fixture(tmp_path, "vehicle")
    pipe = get_pipeline("vehicle")
    gold = pipe.gold(pipe.silver(read_raw_json(spark, path, domain="vehicle")))
    frame = es_export_frame("vehicle", gold)

    index = ES_INDEX_NAMES["vehicle"] + "-seamtest"
    if _ES.indices.exists(index=index):
        _ES.indices.delete(index=index)
    _ES.indices.create(index=index, body=index_mapping(frame, text_cols=()))

    # the exact bytes write_bulk_export would land, POSTed as one bulk
    payload = "\n".join(
        r.value for r in bulk_index_lines(frame, index, id_col="vehicle_id").collect()
    )
    resp = _ES.bulk(operations=payload, refresh="wait_for")
    assert not resp["errors"], json.dumps(resp)[:500]

    expected = {
        r.vehicle_type: r.n
        for r in frame.groupBy("vehicle_type").count().withColumnRenamed("count", "n").collect()
    }
    assert _ES.count(index=index)["count"] == sum(expected.values())
    agg = _ES.search(
        index=index,
        size=0,
        aggs={"by_type": {"terms": {"field": "vehicle_type", "size": 100}}},
    )
    got = {
        b["key"]: b["doc_count"]
        for b in agg["aggregations"]["by_type"]["buckets"]
    }
    assert got == expected
    _ES.indices.delete(index=index)


def test_es_seam_detection_is_consistent():
    """The availability probe must agree with the package import — a
    live client without the package (or vice versa) means the gate
    itself is broken. In a bare environment both sides are absent and
    this pins the skip path."""
    try:
        import elasticsearch  # noqa: F401

        has_pkg = True
    except ImportError:
        has_pkg = False
    if not has_pkg:
        assert _ES is None
