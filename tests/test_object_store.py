"""S8: object-store connector configuration and URI-scheme routing.

No MinIO/S3 exists in the harness, so these tests verify the two halves
the engine controls: (1) ``configure_object_store`` lands every
``fs.s3a.*`` key in the live Hadoop configuration — the exact channel the
s3a filesystem client is built from (reference passes the same five keys
via spark-submit --conf, airflow/dags/motor_policy_pipeline_dag.py:103-108)
— and (2) reads/writes routed through an explicit URI scheme (file://)
resolve through the Hadoop FileSystem machinery end-to-end, so an s3a://
path differs only by the scheme the conf above configures."""

from __future__ import annotations

import json
import os

from metadata_driven_data_pipeline_spark.session import configure_object_store
from metadata_driven_data_pipeline_spark.sinks.writer import write_sink
from metadata_driven_data_pipeline_spark.sources.reader import read_source


def _hconf(spark):
    return spark.sparkContext._jsc.hadoopConfiguration()


def test_configure_object_store_sets_hadoop_conf(spark):
    configure_object_store(
        spark,
        endpoint="http://localhost:9000",
        access_key="minio_user",
        secret_key="minio_pass",
        path_style_access=True,
        ssl_enabled=False,
    )
    h = _hconf(spark)
    assert h.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert h.get("fs.s3a.access.key") == "minio_user"
    assert h.get("fs.s3a.secret.key") == "minio_pass"
    assert h.get("fs.s3a.path.style.access") == "true"
    assert h.get("fs.s3a.connection.ssl.enabled") == "false"


def test_configure_object_store_flag_variants(spark):
    configure_object_store(
        spark,
        endpoint="https://s3.example.com",
        access_key="a",
        secret_key="b",
        path_style_access=False,
        ssl_enabled=True,
    )
    h = _hconf(spark)
    assert h.get("fs.s3a.path.style.access") == "false"
    assert h.get("fs.s3a.connection.ssl.enabled") == "true"


def test_uri_scheme_routing_through_reader_and_writer(spark, tmp_path):
    """file:// URIs exercise the same Hadoop FileSystem resolution an
    s3a:// bucket would — the engine source/sink must pass schemes
    through untouched."""
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "rows.jsonl", "w") as f:
        for i in range(10):
            f.write(json.dumps({"id": i, "v": f"r{i}"}) + "\n")

    res = read_source(
        spark,
        {"name": "uri_src", "path": f"file://{src}/rows.jsonl",
         "format": "json", "required": True},
    )
    assert res.status == "success"
    df = res.df
    assert df is not None and df.count() == 10

    out_uri = f"file://{tmp_path}/out"
    write_sink(
        df,
        {"name": "uri_sink", "input": "uri_src", "path": out_uri,
         "format": "json", "saveMode": "overwrite"},
    )
    assert os.path.isdir(f"{tmp_path}/out")
    back = spark.read.json(out_uri)
    assert back.count() == 10
    assert {r["id"] for r in back.collect()} == set(range(10))
