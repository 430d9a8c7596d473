"""SparkSession construction tuned for the engine.

The reference builds its session at ``pipeline/runner.py:125-136`` (master URL
from YAML + s3a Hadoop conf). We centralize session construction and pin the
settings that matter for correctness (UTC session timezone — duckdb-oracle
comparison) and scale (AQE, Arrow, sane shuffle partitions).

At 100 TB on a real cluster the same builder applies — only ``master``,
memory, and ``spark.sql.shuffle.partitions`` change (shuffle partitions
should target ~128-256 MB of shuffle data per partition; AQE coalescing
corrects the residual).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "metadata_driven_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    Defaults honor ``SPARK_GRAFT_CPUS`` for local parallelism. AQE is on
    (runtime re-plan, skew-join split, partition coalescing), Arrow is on
    (pandas UDF hot path), and session timezone is pinned to UTC so
    timestamp semantics match a UTC-naive oracle (duckdb).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Python DataSource filter pushdown (txlog source stats pruning)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # testdata events.parquet uses TIMESTAMP(NANOS); read as long +
        # convert (see tables.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Engine-provided Python data sources (registration is per-session
    # and idempotent — re-registering the same name just replaces it).
    from metadata_driven_data_pipeline_spark.sources.txlog_datasource import (
        register as _register_txlog,
    )

    _register_txlog(spark)
    return spark


def configure_object_store(
    spark: SparkSession,
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style_access: bool = True,
    ssl_enabled: bool = False,
) -> None:
    """Programmatic s3a connector config (parity: pipeline/runner.py:131-136).

    Sets the Hadoop-level ``fs.s3a.*`` keys the reference passes via
    spark-submit ``--conf`` (airflow/dags/motor_policy_pipeline_dag.py:
    103-108). No object store exists in the test harness, so tests verify
    the conf lands in the live Hadoop configuration (the exact mechanism
    spark uses to build the s3a filesystem client) and that URI-scheme
    routing through the engine's reader/writer works via ``file://``.
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", endpoint)
    hconf.set("fs.s3a.access.key", access_key)
    hconf.set("fs.s3a.secret.key", secret_key)
    hconf.set("fs.s3a.path.style.access", str(path_style_access).lower())
    hconf.set("fs.s3a.connection.ssl.enabled", str(ssl_enabled).lower())
