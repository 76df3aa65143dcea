"""Hierarchical time-rollup: fold-up equals direct aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_backend_spark.operators.timeseries import (
    hierarchical_rollup,
    rollup_level,
)


def _events(spark):
    rows = [
        ("2024-01-01 10:05:00", "a", 1.0),
        ("2024-01-01 10:55:00", "a", 2.0),
        ("2024-01-01 11:05:00", "a", 4.0),
        ("2024-01-02 09:00:00", "b", 8.0),
    ]
    return spark.createDataFrame(rows, ["ts", "k", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_fold_up_equals_direct(spark):
    ev = _events(spark)
    levels = hierarchical_rollup(ev, ("minute", "hour", "day"), key_cols=["k"])
    direct_day = rollup_level(ev, "day", key_cols=["k"])
    folded = sorted(map(tuple, levels["day"].collect()))
    direct = sorted(map(tuple, direct_day.collect()))
    assert folded == direct


def test_level_values(spark):
    ev = _events(spark)
    levels = hierarchical_rollup(ev, ("hour", "day"), key_cols=["k"])
    hours = {
        (str(r.bucket), r.k): (r.n, r.sum_value) for r in levels["hour"].collect()
    }
    assert hours[("2024-01-01 10:00:00", "a")] == (2, 3.0)
    assert hours[("2024-01-01 11:00:00", "a")] == (1, 4.0)
    days = {
        (str(r.bucket), r.k): (r.n, r.sum_value, r.max_value)
        for r in levels["day"].collect()
    }
    assert days[("2024-01-01 00:00:00", "a")] == (3, 7.0, 4.0)
    assert days[("2024-01-02 00:00:00", "b")] == (1, 8.0, 8.0)


def test_levels_must_be_ordered(spark):
    with pytest.raises(ValueError):
        hierarchical_rollup(_events(spark), ("day", "hour"))


def test_month_not_folded_from_week(spark):
    """ISO weeks straddle month boundaries: the week of 2024-01-29 spans
    Jan 29 – Feb 4, so folding month from week would book Feb 1-2 events
    into January. The chain must fold month from day instead."""
    rows = [
        ("2024-01-30 10:00:00", "a", 1.0),  # week of Jan 29
        ("2024-02-01 10:00:00", "a", 2.0),  # same ISO week, next month
        ("2024-02-02 10:00:00", "a", 4.0),
    ]
    ev = spark.createDataFrame(rows, ["ts", "k", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    levels = hierarchical_rollup(ev, ("day", "week", "month"), key_cols=["k"])
    months = {str(r.bucket): (r.n, r.sum_value) for r in levels["month"].collect()}
    assert months["2024-01-01 00:00:00"] == (1, 1.0)
    assert months["2024-02-01 00:00:00"] == (2, 6.0)
    # week-only chain cannot produce a month level
    with pytest.raises(ValueError):
        hierarchical_rollup(ev, ("week", "month"), key_cols=["k"])


def test_gap_fill_forward_fills_and_flags(spark):
    from pyspark.sql import functions as F

    from datalake_backend_spark.operators.timeseries import gap_fill

    rows = [
        # key a: ticks 0 and 30 observed; 10,20 filled from 0
        ("a", 5, 1.5), ("a", 7, 9.0), ("a", 33, 4.0),
        # key b: single tick
        ("b", 12, 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        (r.k, r.tick): (r.value, r.was_observed)
        for r in gap_fill(df, ["k"], "t", 10, "v").collect()
    }
    assert got == {
        ("a", 0): (9.0, True),   # max(1.5, 9.0) in bucket 0
        ("a", 10): (9.0, False),
        ("a", 20): (9.0, False),
        ("a", 30): (4.0, True),
        ("b", 10): (7.0, True),
    }
    # alternative aggregate: min instead of max
    got_min = {
        (r.k, r.tick): r.value
        for r in gap_fill(df, ["k"], "t", 10, "v", agg=F.min).collect()
    }
    assert got_min[("a", 0)] == 1.5 and got_min[("a", 20)] == 1.5


def test_gap_fill_linear_interpolation(spark):
    """Misses interpolate between neighbors; observed rows pass
    through; invalid mode raises."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datalake_backend_spark.operators.timeseries import gap_fill

    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 30, 40.0), ("a", 40, 0.0)],
        "k string, t long, value double",
    )
    out = {
        r.tick: (r.value, r.was_observed)
        for r in gap_fill(df, ["k"], "t", 10, "value", mode="linear").collect()
    }
    assert out == {
        0: (10.0, True),
        10: (20.0, False),   # 10 + 30*(1/3)
        20: (30.0, False),
        30: (40.0, True),
        40: (0.0, True),
    }
    with _pytest.raises(ValueError):
        gap_fill(df, ["k"], "t", 10, "value", mode="spline")


def test_rolling_robust_anomaly(spark):
    """Hampel filter (timeseries.rolling_robust_anomaly; oracle twin
    r149): a flat series with one spike — the spike flags, its
    neighbors don't (median resists the contamination), cold-start
    rows stay NULL."""
    from pyspark.sql import functions as F

    from datalake_backend_spark.operators.timeseries import (
        rolling_robust_anomaly,
    )

    # steady 4-value cycle (MAD=200 — NOT an alternating series, whose
    # MAD degenerates to 0 and flags everything), then a spike
    base = [9.7, 9.9, 10.1, 10.3]
    vals = [base[i % 4] for i in range(10)]
    vals += [50.0] + [base[i % 4] for i in range(11, 15)]
    rows = [(i, 1, float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, t double, value double")
    out = {
        r.event_id: r
        for r in rolling_robust_anomaly(
            df, ["user_id"], "t", "value", order_tiebreak="event_id",
            window=8, k=5, min_periods=6,
        ).collect()
    }
    # cold start: first 6 rows have < 6 preceding points
    for i in range(6):
        assert out[i].med is None and out[i].is_anomaly is None
    # steady rows after warmup: not anomalous
    assert out[8].is_anomaly is False
    # the spike: |50000 - ~10000| >> 5 * MAD(=200)
    assert out[10].is_anomaly is True
    assert out[10].v_scaled == 50000
    # row after the spike: the spike sits IN the window but the
    # median/MAD shrug it off — no masking
    assert out[11].is_anomaly is False
    # determinism under repartition
    again = {
        r.event_id: r.is_anomaly
        for r in rolling_robust_anomaly(
            df.repartition(5), ["user_id"], "t", "value",
            order_tiebreak="event_id", window=8, k=5, min_periods=6,
        ).collect()
    }
    assert again == {k: v.is_anomaly for k, v in out.items()}


def test_seasonal_index_exact_ratios_and_iso_dow(spark):
    """Seasonal indices (operators/timeseries.py:seasonal_index;
    oracle twin r185): bucket means and indices equal the driver-side
    truncating-integer arithmetic, the dow convention is ISO
    (2024-01-01 is a Monday -> season 1), and a 'hour' period
    buckets by hour."""
    import datetime as dt

    from datalake_backend_spark.operators.timeseries import seasonal_index

    mon = dt.datetime(2024, 1, 1, 10)   # Monday
    sun = dt.datetime(2024, 1, 7, 22)   # Sunday
    rows = [
        ("a", mon, 10.5), ("a", mon, 20.5),      # Mon mean 15.5
        ("a", sun, 31.0),                        # Sun mean 31.0
        ("b", mon, 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        (r.k, r.season): r
        for r in seasonal_index(df, "ts", "v", keys=["k"]).collect()
    }
    a_mon = got[("a", 1)]
    assert a_mon.n_obs == 2
    # floor-scaled sums: (105000 + 205000) div 2 = 155000
    assert a_mon.bucket_mean_scaled == 155000
    # grand mean a: 620000 div 3 = 206666; index = 155000*1e6 div 206666
    assert a_mon.index_scaled == 155000 * 1000000 // 206666
    a_sun = got[("a", 7)]
    assert a_sun.bucket_mean_scaled == 310000
    assert got[("b", 1)].index_scaled == 1000000  # single bucket == grand
    hours = {
        r.season
        for r in seasonal_index(df, "ts", "v", keys=["k"], period="hour")
        .collect()
    }
    assert hours == {10, 22}
    import pytest

    with pytest.raises(ValueError, match="period"):
        seasonal_index(df, "ts", "v", period="month")


def test_decayed_sum_shift_exact(spark):
    """Exponential decay (operators/timeseries.py:decayed_sum; oracle
    twin r193): contribution = floor-scaled value >> age-in-days,
    clamped to [0, max]; anchor pins 'now'."""
    import datetime as dt

    from datalake_backend_spark.operators.timeseries import decayed_sum

    anchor = dt.datetime(2024, 2, 1)
    rows = [
        ("a", anchor, 10.0),                       # age 0: 100000
        ("a", anchor - dt.timedelta(days=1), 10.0),  # age 1: 50000
        ("a", anchor - dt.timedelta(days=3), 10.0),  # age 3: 12500
        ("a", anchor + dt.timedelta(days=5), 8.0),   # future -> age 0: 80000
        ("b", anchor - dt.timedelta(days=100), 10.0),  # clamped to 62 -> ~0
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r.k: (r.n_obs, r.decayed_scaled)
        for r in decayed_sum(df, "ts", "v", keys=["k"]).collect()
    }
    assert got["a"] == (4, 100000 + 50000 + 12500 + 80000)
    assert got["b"] == (1, 100000 >> 62)
