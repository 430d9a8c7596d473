"""File sink layer.

Reference semantics (``pipeline/sink.py:8-12`` + ``pipeline/runner.py:406-459``):
``df.write.format(fmt).mode(mode).save(path)`` with metadata-driven format/
saveMode and ``{date}`` path templating; a sink whose input relation is
missing, or whose write fails, fails the pipeline.

Rebuild differences:
- record counts come from an ``observe()`` metric attached to the written
  DataFrame — the write action itself materializes the count, instead of the
  reference's extra ``count()`` job that re-executes the lineage
  (runner.py:421 then 423-428);
- optional ``partitionBy`` for partitioned layouts (the 100 TB path: date-
  partitioned parquet, so downstream reads partition-prune).
"""

from __future__ import annotations

import uuid
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.sources.reader import substitute_date


def write_df(
    df: DataFrame,
    path: str,
    fmt: str = "json",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict[str, Any] | None = None,
) -> None:
    """Minimal writer (parity: sink.py:8-12; per-sink options mirror the
    per-source options dict, e.g. csv header/delimiter)."""
    writer = df.write.format(fmt).mode(mode)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_sink(
    df: DataFrame,
    sink: dict[str, Any],
    batch_date: str | None = None,
) -> dict[str, Any]:
    """Write one metadata-declared sink; returns a log record including the
    observed row count (single job: observe piggybacks on the write)."""
    path_template = sink["path"] if "path" in sink else sink["paths"][0]
    path = substitute_date(path_template, batch_date)
    fmt = sink.get("format", "json")
    mode = sink.get("saveMode", "overwrite")
    partition_by = sink.get("partitionBy")
    zorder_by = sink.get("zorderBy")

    if sink.get("table") == "txlog":
        # ACID tier: every write is one atomic commit in the table's
        # transaction log (sinks/txlog.py) — snapshot-isolated readers,
        # optimistic concurrency, time travel. Row counts come from the
        # commit record itself (footer-derived), not an observe() pass.
        from metadata_driven_data_pipeline_spark.sinks import txlog

        spark = df.sparkSession
        if sink.get("merge"):
            m = sink["merge"]
            info = txlog.merge(
                spark,
                df,
                path,
                list(m["keys"]),
                m["orderBy"],
                # WHEN MATCHED ... THEN DELETE: SQL predicate over the
                # update row — rows satisfying it are delete tombstones
                when_matched_delete=m.get("whenMatchedDelete"),
                # WHEN NOT MATCHED BY SOURCE THEN DELETE: true for full
                # snapshot sync, or a SQL predicate over the target row
                when_not_matched_by_source_delete=m.get(
                    "whenNotMatchedBySourceDelete"
                ),
            )
        elif mode == "append":
            info = txlog.append(
                spark, df, path, merge_schema=bool(sink.get("mergeSchema"))
            )
        else:
            info = txlog.overwrite(spark, df, path)
        return {
            "records_written": int(info.get("rows_written", 0)),
            "sink_path": path,
            "format": "txlog",
            "table_version": info["version"],
        }
    obs = Observation(f"sink_{uuid.uuid4().hex[:8]}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("records_written"))
    if sink.get("upsert"):
        # MERGE semantics: keep-latest per upsertKeys, rewriting only the
        # partitions the batch touches (sinks/maintenance.py merge_upsert)
        from metadata_driven_data_pipeline_spark.sinks.maintenance import (
            merge_upsert,
        )

        up = sink["upsert"]
        info = merge_upsert(
            df.sparkSession, path, observed,
            key_cols=list(up["keys"]),
            order_col=up["orderBy"],
            partition_col=up["partitionBy"],
            fmt=fmt,
        )
        # records_written = rows merge_upsert actually landed in the
        # table (post-dedup; 0 on the empty-batch no-op), NOT the
        # incoming batch size — that is reported separately.
        # empty batch: merge_upsert no-ops without ever materializing
        # the observed plan, so obs.get would block/assert — report 0
        return {
            "records_written": int(info["rows_written"]),
            "records_in": (
                int(obs.get["records_written"])
                if info["partitions_rewritten"]
                else 0
            ),
            "sink_path": path,
            "format": fmt,
            "partitions_rewritten": info["partitions_rewritten"],
        }
    if zorder_by:
        # Z-order-clustered layout (sinks/layout.py): every output file a
        # tight hyper-rectangle on the listed integer columns, so file
        # min/max stats prune scans on ANY of them
        from metadata_driven_data_pipeline_spark.sinks.layout import (
            write_zordered,
        )

        write_zordered(
            observed, path, list(zorder_by),
            bits=int(sink.get("zorderBits", 16)),
            num_files=int(sink.get("zorderFiles", 16)),
            fmt=fmt,
        )
    else:
        write_df(observed, path, fmt, mode, partition_by, sink.get("options"))
    return {
        "records_written": int(obs.get["records_written"]),
        "sink_path": path,
        "format": fmt,
    }
