"""add_fields transform parity (reference pipeline/transformer.py:10-52)."""

import datetime

import pytest
from pyspark.sql import Row

from metadata_driven_data_pipeline_spark.operators.add_fields import apply_add_fields


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([Row(a=1), Row(a=2)])


def test_batch_id_literal(spark, df):
    out = apply_add_fields(df, [{"name": "source_batch", "function": "batch_id"}], batch_id="2025-12-01")
    assert out.collect()[0]["source_batch"] == "2025-12-01"


def test_batch_date_is_date_typed(spark, df):
    out = apply_add_fields(df, [{"name": "batch_date", "function": "batch_date"}], batch_id="2025-12-01")
    v = out.collect()[0]["batch_date"]
    assert v == datetime.date(2025, 12, 1)
    assert dict(out.dtypes)["batch_date"] == "date"


def test_run_id_literal(spark, df):
    out = apply_add_fields(df, [{"name": "processed_run_id", "function": "run_id"}], run_id="r-42")
    assert out.collect()[0]["processed_run_id"] == "r-42"


def test_missing_context_yields_null(spark, df):
    """transformer.py:15-17: no batch_id/run_id → NULL."""
    out = apply_add_fields(
        df,
        [
            {"name": "b", "function": "batch_id"},
            {"name": "bd", "function": "batch_date"},
            {"name": "r", "function": "run_id"},
        ],
    )
    row = out.collect()[0]
    assert row["b"] is None and row["bd"] is None and row["r"] is None


def test_current_timestamp(spark, df):
    out = apply_add_fields(df, [{"name": "ingestion_dt", "function": "current_timestamp"}])
    assert dict(out.dtypes)["ingestion_dt"].startswith("timestamp")
    assert out.filter("ingestion_dt IS NULL").count() == 0


def test_unknown_function_raises(spark, df):
    with pytest.raises(ValueError, match="Unsupported function"):
        apply_add_fields(df, [{"name": "x", "function": "bogus"}])


def test_expr_extension(spark, df):
    out = apply_add_fields(df, [{"name": "a2", "function": "expr", "params": "a * 2"}])
    assert [r["a2"] for r in out.orderBy("a").collect()] == [2, 4]


def test_literal_extension(spark, df):
    out = apply_add_fields(df, [{"name": "tag", "function": "literal", "params": "v1"}])
    assert out.collect()[0]["tag"] == "v1"


def test_multiple_fields_single_projection(spark, df):
    out = apply_add_fields(
        df,
        [
            {"name": "source_batch", "function": "batch_id"},
            {"name": "batch_date", "function": "batch_date"},
            {"name": "processed_run_id", "function": "run_id"},
        ],
        batch_id="2025-12-02",
        run_id="r1",
    )
    assert set(out.columns) == {"a", "source_batch", "batch_date", "processed_run_id"}


def test_expr_field_can_reference_earlier_added_field(spark, df):
    """Declaration-order dependency: a later expr field reads a field added
    earlier in the same addFields list (sequential-application contract)."""
    out = apply_add_fields(
        df,
        [
            {"name": "a2", "function": "expr", "params": "a * 2"},
            {"name": "a4", "function": "expr", "params": "a2 * 2"},
        ],
    )
    assert [r["a4"] for r in out.orderBy("a").collect()] == [4, 8]
