"""Source/sink format parity (SURVEY §2.1 S9): format is metadata-driven;
json, parquet, csv, and orc must all round-trip through the reader/writer
layer with schema enforcement."""

import pytest

from metadata_driven_data_pipeline_spark.sinks.writer import write_sink
from metadata_driven_data_pipeline_spark.sources.reader import read_source

SCHEMA = {
    "type": "struct",
    "fields": [
        {"name": "id", "type": "long", "nullable": False},
        {"name": "name", "type": "string", "nullable": True},
        {"name": "score", "type": "double", "nullable": True},
    ],
}

ROWS = [(1, "a", 1.5), (2, "b", None), (3, None, -2.0)]


@pytest.mark.parametrize("fmt,extra", [
    ("json", {}),
    ("parquet", {}),
    ("csv", {"header": "true"}),
    ("orc", {}),
])
def test_roundtrip(spark, tmp_path, fmt, extra):
    df = spark.createDataFrame(ROWS, "id long, name string, score double")
    out = str(tmp_path / f"out_{fmt}")
    rec = write_sink(df, {"name": "s", "path": out, "format": fmt, "saveMode": "overwrite",
                          "options": extra})
    assert rec["records_written"] == 3

    src = {
        "name": "back",
        "path": out,
        "format": fmt,
        "schema": SCHEMA,
        "schema_enforcement": {"enabled": True},
        "options": extra,
    }
    res = read_source(spark, src)
    assert res.status == "success" and res.schema_enforced
    got = {tuple(r) for r in res.df.collect()}
    assert got == set(ROWS)
    assert [f.name for f in res.df.schema.fields] == ["id", "name", "score"]


class TestCompaction:
    def test_compact_small_files(self, spark, tmp_path):
        """Many tiny files -> few files, identical rows, same live path."""
        from metadata_driven_data_pipeline_spark.operators.partitioning import (
            _list_data_files,
            compact_files,
        )

        out = str(tmp_path / "accreted")
        df = spark.range(10000).withColumnRenamed("id", "v")
        df.repartition(40).write.mode("overwrite").parquet(out)
        before = _list_data_files(spark, out)
        assert len(before) == 40
        total = sum(sz for _, sz in before)

        stats = compact_files(spark, out, target_file_bytes=total)
        assert stats["files_before"] == 40
        assert stats["files_after"] <= 2
        back = spark.read.parquet(out)
        assert back.count() == 10000
        assert back.agg({"v": "sum"}).first()[0] == sum(range(10000))

    def test_compact_respects_target_size(self, spark, tmp_path):
        from metadata_driven_data_pipeline_spark.operators.partitioning import (
            _list_data_files,
            compact_files,
        )

        out = str(tmp_path / "sized")
        spark.range(20000).repartition(30).write.mode("overwrite").parquet(out)
        total = sum(sz for _, sz in _list_data_files(spark, out))
        stats = compact_files(spark, out, target_file_bytes=total // 4 + 1)
        assert 3 <= stats["files_after"] <= 5


def test_permissive_corrupt_rows_survive_and_route_ko(spark, tmp_path):
    """S2 parity (runner.py:268-291): PERMISSIVE reads don't fail on
    malformed lines; with an enforced schema the corrupt line becomes an
    all-null row, which the notNull validation rule then routes to KO —
    corrupt input degrades to rejected records, never a pipeline failure."""
    import json

    from pyspark.sql import types as T

    from metadata_driven_data_pipeline_spark.operators.validate import split_ok_ko
    from metadata_driven_data_pipeline_spark.sources.reader import read_source

    p = tmp_path / "in.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"policy_number": "P1", "driver_age": 30}) + "\n")
        f.write("{this is not json\n")
        f.write(json.dumps({"policy_number": "P2", "driver_age": 41}) + "\n")

    schema = {
        "type": "struct",
        "fields": [
            {"name": "policy_number", "type": "string", "nullable": True},
            {"name": "driver_age", "type": "integer", "nullable": True},
        ],
    }
    res = read_source(
        spark,
        {"name": "s", "path": str(p), "format": "json",
         "schema": schema, "schema_enforcement": {"enabled": True}},
    )
    assert res.status == "success"
    df = res.df
    rows = df.collect()
    assert len(rows) == 3  # corrupt line kept as all-null row, not dropped
    assert sum(1 for r in rows if r["policy_number"] is None) == 1

    result = split_ok_ko(df, [{"field": "policy_number", "rules": ["notNull"]}])
    assert result.ok.count() == 2
    ko = result.ko.collect()
    assert len(ko) == 1
    assert "notNull" in ko[0]["validation_errors"]["policy_number"]
