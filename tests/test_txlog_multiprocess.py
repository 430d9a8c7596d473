"""OS-level commit-race stress for the txlog ``link(2)`` claim protocol
(VERDICT r6 #3): the in-process interleaving tests pin the optimistic
retry logic, but the protocol's whole value is CROSS-PROCESS atomicity —
N independent OS processes racing put-if-absent claims on one table must
serialize into contiguous versions with every commit landing exactly
once, while a concurrent reader never observes a broken snapshot.

The workers use the pure-metadata lane (pyarrow staged files +
``commit_staged(spark=None, ...)``) so no child process touches the JVM;
this is exactly the executor-task + driver-commit path the Python
DataSource writer exercises, minus Spark."""

from __future__ import annotations

import multiprocessing
import os

from metadata_driven_data_pipeline_spark.sinks import txlog

N_WRITERS = 8
COMMITS_PER_WRITER = 12


def _schema():
    from pyspark.sql.types import (
        IntegerType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("k", IntegerType()),
            StructField("writer", IntegerType()),
        ]
    )


def _writer_proc(args) -> list[int]:
    """One OS process: stage a 1-row parquet file, commit it, repeat.
    Returns the commit versions it won."""
    root, wid, n_commits = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _schema()
    data_dir = os.path.join(root, txlog.DATA_DIR)
    os.makedirs(data_dir, exist_ok=True)
    won = []
    for i in range(n_commits):
        path = os.path.join(data_dir, f"mp-{wid}-{i:03d}.parquet")
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([wid * 1000 + i], type=pa.int32()),
                    "writer": pa.array([wid], type=pa.int32()),
                }
            ),
            path,
        )
        res = txlog.commit_staged(None, root, [path], schema)
        assert not res.get("skipped")
        won.append(res["version"])
    return won


def _reader_proc(args) -> str:
    """Concurrent reader: repeatedly folds the log and opens every file
    the pinned snapshot references — must NEVER error mid-race (files
    are immutable and only unlinked by vacuum, which doesn't run here),
    and row count must equal the snapshot's recorded total."""
    (root,) = args
    import pyarrow.parquet as pq

    for _ in range(300):
        snap = txlog.load_snapshot(root)
        total = 0
        for p in snap.file_paths():
            total += pq.read_table(p).num_rows
        expected = sum(e["rows"] for e in snap.files.values())
        assert total == expected, f"snapshot v{snap.version}: {total} != {expected}"
    return "ok"


def test_multiprocess_commit_race_all_land_contiguously(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, txlog.DATA_DIR), exist_ok=True)
    ctx = multiprocessing.get_context("spawn")  # no forked JVM state
    jobs = [(root, wid, COMMITS_PER_WRITER) for wid in range(N_WRITERS)]
    with ctx.Pool(N_WRITERS + 1) as pool:
        reader = pool.apply_async(_reader_proc, [(root,)])
        results = pool.map(_writer_proc, jobs)
        assert reader.get(timeout=300) == "ok"

    total = N_WRITERS * COMMITS_PER_WRITER
    all_versions = sorted(v for won in results for v in won)
    # every commit landed exactly once, versions contiguous from 1
    assert all_versions == list(range(1, total + 1))
    snap = txlog.load_snapshot(root)
    assert snap.version == total
    assert sum(e["rows"] for e in snap.files.values()) == total
    assert len(snap.files) == total
    # commit records are well-formed and checkpoints exist on schedule
    hist = txlog.history(root)
    assert [h["version"] for h in hist] == list(range(1, total + 1))
    assert all(h["op"] == "append" and h["ts"] for h in hist)
