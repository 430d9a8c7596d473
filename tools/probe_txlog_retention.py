"""Commit-log retention probe (r5 verdict item 1): drive a txlog table
through ~1k commits and measure snapshot-load latency + log-directory
size WITH and WITHOUT cleanup_log.

The structural claim (sinks/txlog.py): checkpoints bound JSON *parsing*
at O(files + K), but the directory *listing* is O(total commits ever) —
so without log retention, load_snapshot degrades linearly in table AGE
even though the table's live state is constant. cleanup_log expires
commit records below the checkpoint horizon; with it run periodically
(e.g. from the vacuum maintenance spec) the log directory holds
O(CHECKPOINT_INTERVAL + retained) files and snapshot-load time is FLAT
however many commits the table has ever seen — the difference between a
streaming sink that works for a week and one that works for years.

Pure-metadata lane (commit_staged(spark=None), pyarrow staged files) —
no Spark session, so the numbers isolate the metadata plane.

Usage: python tools/probe_txlog_retention.py [n_commits] [cleanup_every]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metadata_driven_data_pipeline_spark.sinks import txlog


def _schema():
    from pyspark.sql.types import IntegerType, StructField, StructType

    return StructType([StructField("k", IntegerType())])


def _drive(root: str, n_commits: int, cleanup_every: int | None,
           checkpoints: list[int]) -> dict[int, dict]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _schema()
    data_dir = os.path.join(root, txlog.DATA_DIR)
    os.makedirs(data_dir, exist_ok=True)
    marks: dict[int, dict] = {}
    for i in range(1, n_commits + 1):
        p = os.path.join(data_dir, f"c{i:06d}.parquet")
        pq.write_table(pa.table({"k": pa.array([i], type=pa.int32())}), p)
        # overwrite commits keep LIVE state constant (1 file), so the
        # measurement isolates log growth from legitimate O(live files)
        # snapshot state — the steady-state shape of a compact streaming
        # sink (upserts/optimize keep file counts flat while commit
        # history grows without bound)
        txlog.commit_staged(None, root, [p], schema, overwrite=True)
        if cleanup_every and i % cleanup_every == 0:
            txlog.cleanup_log(root, keep_versions=2)
        if i in checkpoints:
            log_files = len(os.listdir(os.path.join(root, txlog.LOG_DIR)))
            t0 = time.time()
            reps = 20
            for _ in range(reps):
                snap = txlog.load_snapshot(root)
            dt = (time.time() - t0) / reps
            marks[i] = {
                "log_files": log_files,
                "snapshot_load_ms": round(dt * 1000, 2),
                "live_files": len(snap.files),
            }
    return marks


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    # always mark n itself so a small n still produces a report instead
    # of an IndexError on an empty mark list (review r6 #6)
    checkpoints = sorted({c for c in (100, 250, 500, 1000, 2000) if c < n} | {n})
    base = tempfile.mkdtemp(prefix="txlog_retention_probe_")
    try:
        grow = _drive(os.path.join(base, "grow"), n, None, checkpoints)
        flat = _drive(os.path.join(base, "flat"), n, every, checkpoints)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(f"{'commits':>8} | {'no-cleanup files':>16} {'load ms':>8} | "
          f"{'cleanup files':>13} {'load ms':>8}")
    for c in checkpoints:
        g, f = grow[c], flat[c]
        print(f"{c:>8} | {g['log_files']:>16} {g['snapshot_load_ms']:>8} | "
              f"{f['log_files']:>13} {f['snapshot_load_ms']:>8}")
    g_ratio = grow[checkpoints[-1]]["snapshot_load_ms"] / max(
        grow[checkpoints[0]]["snapshot_load_ms"], 1e-9
    )
    f_ratio = flat[checkpoints[-1]]["snapshot_load_ms"] / max(
        flat[checkpoints[0]]["snapshot_load_ms"], 1e-9
    )
    print(f"\nload-time growth {checkpoints[0]}→{checkpoints[-1]} commits: "
          f"no-cleanup {g_ratio:.1f}x, with-cleanup {f_ratio:.1f}x")


if __name__ == "__main__":
    main()
