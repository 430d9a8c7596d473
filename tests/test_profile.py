"""table_profile / profile_drift: exact per-column stats + drift report."""

import pytest
from pyspark.sql import Row

from metadata_driven_data_pipeline_spark.operators import profile as P


@pytest.fixture()
def snap_old(spark):
    return spark.createDataFrame(
        [
            Row(id=1, val=10.0, tag="a"),
            Row(id=2, val=None, tag="a"),
            Row(id=3, val=30.0, tag="b"),
            Row(id=4, val=40.0, tag="b"),
        ],
        "id long, val double, tag string",
    )


def test_table_profile_exact_stats(spark, snap_old):
    out = {r.column: r for r in P.table_profile(snap_old).collect()}
    assert set(out) == {"id", "val", "tag"}
    assert all(r.n_rows == 4 for r in out.values())
    assert out["val"].n_nulls == 1 and out["val"].n_distinct == 3
    assert out["tag"].n_nulls == 0 and out["tag"].n_distinct == 2
    assert out["id"].min_value == "1" and out["id"].max_value == "4"
    assert out["val"].min_value == "10.0" and out["val"].max_value == "40.0"


def test_table_profile_unknown_column_raises(spark, snap_old):
    with pytest.raises(ValueError, match="not in DataFrame"):
        P.table_profile(snap_old, ["nope"])


def test_profile_drift_statuses(spark, snap_old):
    snap_new = spark.createDataFrame(
        [
            # val now 50% null (drift), tag collapses to one value
            # (distinct drift), `extra` appears, `id` stays healthy
            Row(id=1, val=None, tag="a", extra=1),
            Row(id=2, val=None, tag="a", extra=2),
            Row(id=3, val=30.0, tag="a", extra=3),
            Row(id=4, val=40.0, tag="a", extra=4),
        ],
        "id long, val double, tag string, extra long",
    )
    drift = {
        r.column: r
        for r in P.profile_drift(
            P.table_profile(snap_old), P.table_profile(snap_new),
            # tag drops 2 -> 1 distinct = exactly 0.5 relative; the gate
            # is strict-greater, so use a tighter tolerance here
            distinct_ratio_tolerance=0.4,
        ).collect()
    }
    assert drift["extra"].status == "column_added"
    assert drift["val"].status == "null_rate_drift"
    assert drift["tag"].status == "distinct_drift"
    assert drift["id"].status == "ok"
    assert drift["id"].range_changed is False
    # removed column from the other direction
    back = {
        r.column: r
        for r in P.profile_drift(
            P.table_profile(snap_new), P.table_profile(snap_old)
        ).collect()
    }
    assert back["extra"].status == "column_removed"


def test_profile_single_aggregate_plan(spark, snap_old):
    """Profile must be one aggregate over the table — no joins, no
    windows (the per-batch observability op cannot cost more than a
    scan)."""
    plan = P.table_profile(snap_old)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
