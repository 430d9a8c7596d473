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
