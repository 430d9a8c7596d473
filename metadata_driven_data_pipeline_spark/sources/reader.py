"""Source layer: schema-enforced and inferred file scans.

Reference semantics (``pipeline/runner.py:184-331``):

- ``{date}`` placeholder substitution in paths (runner.py:191);
- schema + ``schema_enforcement.enabled`` → read with explicit StructType
  (S1, runner.py:199-228); otherwise PERMISSIVE inferred read (S2,
  runner.py:268-291);
- ``required: true`` (default) → any failure re-raises and fails the
  pipeline (S3, runner.py:250,314); ``required: false`` → the result is
  marked skipped and the relation is not registered (runner.py:251-266).

Scale notes: an enforced schema skips Spark's inference pass entirely (for
JSON, inference is a full extra scan of the data — at 100 TB that is the
difference between one pass and two). Parquet scans get predicate pushdown
and column pruning from Catalyst for free; glob patterns (S4) distribute
file listing across the driver's Hadoop FS client.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from metadata_driven_data_pipeline_spark.schema import build_struct_type


@dataclass
class SourceReadResult:
    name: str
    df: DataFrame | None
    status: str  # "success" | "skipped"
    path: str
    schema_enforced: bool
    required: bool
    skip_reason: str | None = None
    enforced_fields: list[str] = field(default_factory=list)


def substitute_date(path: str, batch_date: str | None) -> str:
    """``{date}`` templating (parity: runner.py:191,413)."""
    if batch_date is None:
        return path
    return path.replace("{date}", batch_date)


def read_source(
    spark: SparkSession,
    source: dict[str, Any],
    batch_date: str | None = None,
) -> SourceReadResult:
    """Read one metadata-declared source.

    Raises on failure when ``required`` (default true); returns a skipped
    result otherwise. Mirrors runner.py:184-331's control flow with the
    logging concerns separated out (the engine logs from the result).
    """
    name = source["name"]
    required = source.get("required", True)
    path = substitute_date(source["path"], batch_date)
    fmt = source.get("format", "json")
    options = source.get("options", {}) or {}

    schema_def = source.get("schema")
    enforcement = source.get("schema_enforcement", {}) or {}
    enforce = bool(schema_def) and bool(enforcement.get("enabled", False))

    try:
        if source.get("table") == "txlog":
            # transaction-log table source (sinks/txlog.py): snapshot-
            # isolated read, optional time travel (`version`) and
            # stats-pruned predicates (`where`: [[col, op, value], ...])
            # — file skipping happens at the log-metadata layer, before
            # any parquet footer is opened
            from metadata_driven_data_pipeline_spark.sinks import txlog

            version = source.get("version")
            if source.get("where"):
                df, _ = txlog.scan(
                    spark,
                    path,
                    where=[tuple(w) for w in source["where"]],
                    version=version,
                )
            else:
                df = txlog.read_table(spark, path, version=version)
            return SourceReadResult(
                name=name,
                df=df,
                status="success",
                path=path,
                schema_enforced=False,
                required=required,
            )
        if enforce:
            expected_schema = build_struct_type(schema_def)
            reader = spark.read.schema(expected_schema).format(fmt).options(**options)
            df = reader.load(path)
            # Force analysis so schema/path errors surface here, not at the
            # first downstream action (Spark reads are lazy; the reference
            # surfaces errors via its count() action).
            df.schema
            return SourceReadResult(
                name=name,
                df=df,
                status="success",
                path=path,
                schema_enforced=True,
                required=required,
                enforced_fields=[f["name"] for f in schema_def["fields"]],
            )
        reader = (
            spark.read.format(fmt).option("mode", "PERMISSIVE").options(**options)
        )
        df = reader.load(path)
        df.schema
        return SourceReadResult(
            name=name,
            df=df,
            status="success",
            path=path,
            schema_enforced=False,
            required=required,
        )
    except Exception as e:
        if required:
            raise
        return SourceReadResult(
            name=name,
            df=None,
            status="skipped",
            path=path,
            schema_enforced=enforce,
            required=False,
            skip_reason=str(e),
        )
