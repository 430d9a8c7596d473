"""Streaming state-scale probe (r3 verdict item 8): the batch side has
10x/50x/100x probes; this replays a replicated event stream through
`Trigger.AvailableNow` in CHRONOLOGICAL micro-batches and records what a
production stream is judged on — state-store growth and batch latency —
from the engine's own StreamingQueryProgress (stateOperators metrics).

Two stateful queries:
1. `streaming_dedup` (dropDuplicatesWithinWatermark, 1h horizon): state
   must track keys-in-horizon, NOT total keys seen — the whole point of
   the watermark bound. The probe asserts max state rows << total rows.
2. `windowed_counts` (1h tumbling windows, 2h watermark): state tracks
   open windows x keys, again horizon-bounded.

The stream is time-sliced into files (one micro-batch each via
maxFilesPerTrigger) so the watermark actually advances batch-over-batch
and eviction is exercised — a single AvailableNow batch would hide state
growth entirely.

Usage: python tools/probe_streaming_state.py [sf_dir] [mult] [n_slices]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.streaming import incremental as st


def build_stream_dir(spark, sf_dir: str, mult: int, n_slices: int) -> str:
    """Replicated events, written as n_slices chronological parquet files."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    reps = spark.range(mult).withColumnRenamed("id", "rep")
    big = st.ensure_event_time(
        ev.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * n * 10)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 100_000)
        .drop("rep"),
        "ts",
    )
    lo, hi = big.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span = (hi - lo).total_seconds() + 1
    root = tempfile.mkdtemp(prefix=f"stream_state_{mult}x_")
    sliced = big.withColumn(
        "__slice",
        F.least(
            F.lit(n_slices - 1),
            ((F.col("ts").cast("double") - F.lit(lo.timestamp()))
             / F.lit(span / n_slices)).cast("int"),
        ),
    )
    for i in range(n_slices):
        # one file per slice: coalesce(1) so maxFilesPerTrigger=1 maps
        # slice -> micro-batch and the watermark advances chronologically
        (sliced.filter(F.col("__slice") == i).drop("__slice")
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(root, f"slice={i:03d}")))
    return root


def run_query(spark, stream_dir: str, schema, shape: str):
    chk = tempfile.mkdtemp(prefix="chk_")
    out_name = f"probe_state_{shape}_{int(time.time()*1000)}"
    src = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(os.path.join(stream_dir, "slice=*"))
    )
    if shape == "dedup":
        df = st.streaming_dedup(src, ["event_id"], watermark="1 hour")
        df = df.select("event_id")
    else:
        df = st.windowed_counts(
            src, window_duration="1 hour", watermark="2 hours"
        )
    t0 = time.time()
    q = (
        df.writeStream.format("memory").queryName(out_name)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    batches = []
    for p in q.recentProgress:
        if not p.get("stateOperators"):
            continue
        so = p["stateOperators"][0]
        batches.append({
            "rows": p.get("numInputRows", 0),
            "state_rows": so.get("numRowsTotal", 0),
            "state_mb": round(so.get("memoryUsedBytes", 0) / 1e6, 1),
            "batch_ms": p.get("batchDuration", 0),
        })
    out_rows = spark.table(out_name).count()
    spark.catalog.dropTempView(out_name)
    shutil.rmtree(chk, ignore_errors=True)
    return wall, out_rows, batches


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_slices = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="probe-streaming-state",
                      shuffle_partitions=32)

    for m in (1, mult):
        d = build_stream_dir(spark, sf_dir, m, n_slices)
        written = spark.read.parquet(os.path.join(d, "slice=*"))
        schema, total = written.schema, written.count()
        for shape in ("dedup", "window"):
            wall, out_rows, batches = run_query(spark, d, schema, shape)
            max_state = max((b["state_rows"] for b in batches), default=0)
            max_mb = max((b["state_mb"] for b in batches), default=0)
            mean_ms = (sum(b["batch_ms"] for b in batches) / len(batches)
                       if batches else 0)
            max_ms = max((b["batch_ms"] for b in batches), default=0)
            print(json.dumps({
                "mult": m, "shape": shape, "input_rows": total,
                "out_rows": out_rows, "batches": len(batches),
                "max_state_rows": max_state, "max_state_mb": max_mb,
                "mean_batch_ms": round(mean_ms), "max_batch_ms": max_ms,
                "wall_sec": round(wall, 1),
            }))
            if shape == "dedup" and batches:
                # the watermark bound in action: peak state is a fraction
                # of total keys, not the whole history
                assert max_state < total, (max_state, total)
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
