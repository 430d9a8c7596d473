"""gap_fill: dense per-key hourly grids from sparse events."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.operators.timeseries import gap_fill


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, value DOUBLE")


def test_fills_interior_gaps_with_zero(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 15)
    t3 = dt.datetime(2024, 1, 1, 13, 5)
    out = gap_fill(
        _ev(spark, [(1, t0, 2.0), (1, t3, 3.0)]), "user_id", "ts"
    ).orderBy("bucket_ts").collect()
    assert len(out) == 4  # 10:00 11:00 12:00 13:00
    assert [r["n_events"] for r in out] == [1, 0, 0, 1]


def test_single_event_single_bucket(spark):
    out = gap_fill(
        _ev(spark, [(1, dt.datetime(2024, 1, 1, 5, 59), 1.0)]), "user_id", "ts"
    ).collect()
    assert len(out) == 1 and out[0]["n_events"] == 1


def test_keys_do_not_leak(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1.0),
        (1, dt.datetime(2024, 1, 1, 2, 0), 1.0),
        (2, dt.datetime(2024, 1, 2, 0, 0), 1.0),
    ]
    out = gap_fill(_ev(spark, rows), "user_id", "ts").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 3  # 00,01,02
    assert len(by_user[2]) == 1  # its own single hour, not user 1's range


def test_custom_agg_zero_filled(spark):
    rows = [(1, dt.datetime(2024, 1, 1, 0, 30), 2.5),
            (1, dt.datetime(2024, 1, 1, 2, 0), 1.5)]
    out = gap_fill(
        _ev(spark, rows), "user_id", "ts",
        agg={"total": F.sum("value")},
    ).orderBy("bucket_ts").collect()
    assert [r["total"] for r in out] == [2.5, 0.0, 1.5]


def test_arbitrary_step_15min(spark):
    """Generalized step: 15-minute epoch-aligned buckets, gaps filled."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 7), 2.0),   # 00:00 bucket
        (1, dt.datetime(2024, 1, 1, 0, 50), 3.0),  # 00:45 bucket
    ]
    out = gap_fill(
        _ev(spark, rows), "user_id", "ts", step="15 minutes"
    ).orderBy("bucket_ts").collect()
    buckets = [r["bucket_ts"].minute for r in out]
    assert buckets == [0, 15, 30, 45]  # contiguous grid incl. empty buckets
    assert [r["n_events"] for r in out] == [1, 0, 0, 1]


def test_variable_unit_steps_parse(spark):
    from metadata_driven_data_pipeline_spark.operators.timeseries import (
        step_seconds,
    )

    assert step_seconds("15 minutes") == 900
    assert step_seconds("1 hour") == 3600
    assert step_seconds("2 days") == 172800
    assert step_seconds("hour") == 3600
    with pytest.raises(ValueError):
        step_seconds("1 month")  # variable-length units have no fixed grid
    with pytest.raises(ValueError):
        step_seconds("0 hours")


def test_span_cap_degrades_to_observed_only(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1.0),
        (1, dt.datetime(2024, 1, 1, 5, 0), 1.0),     # normal key: filled
        (2, dt.datetime(1970, 1, 1, 0, 0), 1.0),      # corrupt epoch-0 ts
        (2, dt.datetime(2024, 1, 1, 0, 0), 1.0),      # 54-year span
    ]
    out = gap_fill(
        _ev(spark, rows), "user_id", "ts", max_buckets_per_key=1000
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 6            # 00..05 filled
    assert len(by_user[2]) == 2            # observed buckets only, no fill
    assert all(r["n_events"] == 1 for r in by_user[2])


def test_span_cap_disabled(spark):
    rows = [(1, dt.datetime(2024, 1, 1, 0, 0), 1.0),
            (1, dt.datetime(2024, 3, 1, 0, 0), 1.0)]
    out = gap_fill(_ev(spark, rows), "user_id", "ts",
                   max_buckets_per_key=None).count()
    assert out == 60 * 24 + 1  # Jan 1 00:00 .. Mar 1 00:00 (2024 is a leap year)
