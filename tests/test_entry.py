"""Driver-contract smoke tests: entry() and registry coherence."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_oracle_has_query():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 19


def test_queries_run_on_smoke_sf(spark):
    qs = entrymod.queries()
    for name in ("q05_track_rollup_events", "q10_sessionize", "q13_orders_left_join"):
        df = qs[name](spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name
