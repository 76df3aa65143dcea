"""Every domain's serving views run over its gold output."""

from __future__ import annotations

from datalake_backend_spark.pipelines import PIPELINES, get_pipeline
from datalake_backend_spark.serving.views import (
    DASHBOARD_VIEWS,
    VIEW_SOURCES,
    register_gold,
    register_serving_views,
)
from datalake_backend_spark.sources.readers import read_raw_json
from tests.fixtures import write_fixture


def test_all_domain_views_run(spark, tmp_path):
    for domain in PIPELINES:
        path = write_fixture(tmp_path, domain)
        raw = read_raw_json(spark, path, domain=domain)
        pipe = get_pipeline(domain)
        register_gold(spark, domain, pipe.gold(pipe.silver(raw)))
    created = register_serving_views(spark)
    assert set(created) == set(DASHBOARD_VIEWS)
    for name in created:
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        assert rows is not None, name
    # spot values for the newly covered domains
    school = {r.term: r.n_events for r in spark.sql(
        "SELECT * FROM serving_school_alerts").collect()}
    assert school == {"high": 1, "low": 1}
    retail = {r.term: r.picked for r in spark.sql(
        "SELECT * FROM serving_retail_categories").collect()}
    assert retail == {"dairy": 1}
    tracking = spark.sql("SELECT * FROM serving_tracking_presence").collect()[0]
    assert tracking.n_tracks == 2


def test_view_sources_mapping_complete():
    assert set(VIEW_SOURCES) == set(DASHBOARD_VIEWS)
