"""Streaming backlog admission control for the txlog source
(VERDICT r6 #1): ``maxVersionsPerTrigger`` / ``maxBytesPerTrigger``
bound each micro-batch so a stream resuming after an outage drains the
backlog in bounded batches instead of one OOM-shaped batch — the txlog
twin of the maxFilesPerTrigger/maxBytesPerTrigger knob every production
source (files, Delta, Kafka) exposes.

The Python DataSource offset API gives ``latestOffset()`` no
committed-offset input, so the cap is applied relative to the highest
version the reader instance observed through any channel; the restart
safety of that scheme rests on Spark re-planning the write-ahead-logged
batch (a ``partitions(start, end)`` call) BEFORE the first new
``latestOffset`` — pinned here by ``test_restart_call_order_invariant``.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.sinks import txlog
from metadata_driven_data_pipeline_spark.sources.txlog_datasource import (
    TxlogStreamReader,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _drain_batches(spark, root, ckpt, reader_opts):
    """Run a processingTime-triggered query until the backlog drains;
    return (per-non-empty-micro-batch row counts, all drained rows)."""
    batches: list[tuple[int, int]] = []
    _drained: list[tuple] = []

    def record(df, batch_id):
        rows = df.collect()
        if rows:
            batches.append((batch_id, len(rows)))
            _drained.extend(tuple(r) for r in rows)

    reader = spark.readStream.format("txlog")
    for k, v in reader_opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(root)
        .writeStream.foreachBatch(record)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(120)
    return batches, sorted(_drained)


def test_max_versions_per_trigger_bounds_each_batch(spark, tmp_path):
    """A 10-version backlog under maxVersionsPerTrigger=3 drains in
    exactly ceil(10/3)=4 non-empty micro-batches whose union equals the
    unbounded read — bounded admission, identical contents."""
    root = str(tmp_path / "t")
    for i in range(10):
        txlog.append(spark, _mk(spark, [(i, f"v{i}"), (100 + i, "x")]), root)

    batches, drained = _drain_batches(
        spark,
        root,
        str(tmp_path / "ckpt"),
        {"maxVersionsPerTrigger": "3"},
    )
    assert len(batches) == 4
    # 3 versions × 2 rows per batch, last batch 1 version
    assert [n for _, n in batches] == [6, 6, 6, 2]
    assert drained == _rows(txlog.read_table(spark, root))


def test_capped_drain_is_checkpoint_resumable(spark, tmp_path):
    """Stopping mid-drain and restarting from the same checkpoint
    continues the capped cadence with no duplicates and no gaps."""
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    for i in range(6):
        txlog.append(spark, _mk(spark, [(i, f"v{i}")]), root)

    # keyed by batchId, not a flat list: foreachBatch is AT-LEAST-ONCE —
    # stopping between a batch's execution and its checkpoint commit
    # replays it on restart UNDER THE SAME batchId (offsets are WAL'd),
    # so overwrite-by-id is the idempotent accumulator the contract
    # expects of sinks (the txlog stream writer gets this via txn dedup)
    seen: dict[int, list[tuple]] = {}

    def run_once():
        def record(df, bid):
            seen[bid] = [tuple(r) for r in df.collect()]

        q = (
            spark.readStream.format("txlog")
            .option("maxVersionsPerTrigger", 2)
            .load(root)
            .writeStream.foreachBatch(record)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        return q

    q = run_once()
    try:
        # wait for the first capped batch only, then stop mid-backlog
        import time

        deadline = time.time() + 60
        while not seen and time.time() < deadline:
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination(120)
    assert seen, "first capped batch never arrived"
    assert sum(len(v) for v in seen.values()) < 6  # stopped mid-drain

    q = run_once()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(120)
    drained = sorted(r for rows in seen.values() for r in rows)
    assert drained == _rows(txlog.read_table(spark, root))


def test_max_bytes_per_trigger_bounds_by_commit_bytes(spark, tmp_path):
    """A byte budget below one commit's size degrades to one version per
    batch (≥1 version always advances — an oversized commit can't stall
    the stream)."""
    root = str(tmp_path / "t")
    for i in range(4):
        txlog.append(spark, _mk(spark, [(i, "a" * 50)]), root)

    batches, drained = _drain_batches(
        spark,
        root,
        str(tmp_path / "ckpt"),
        {"maxBytesPerTrigger": "1"},
    )
    assert len(batches) == 4  # one commit per micro-batch
    assert drained == _rows(txlog.read_table(spark, root))


def test_uncapped_default_unchanged(spark, tmp_path):
    """Without the options the whole backlog still lands in one batch —
    the default contract (and txlog_stream_feed's certificate) holds."""
    root = str(tmp_path / "t")
    for i in range(5):
        txlog.append(spark, _mk(spark, [(i, "x")]), root)
    batches, drained = _drain_batches(
        spark, root, str(tmp_path / "ckpt"), {}
    )
    assert len(batches) == 1
    assert drained == _rows(txlog.read_table(spark, root))


def test_restart_call_order_invariant(spark, tmp_path):
    """The admission cap's restart safety rests on Spark re-planning the
    write-ahead-logged batch (a partitions() call carrying the
    checkpointed range) BEFORE the first new latestOffset of a restarted
    query. A capped restart over a backlog only drains correctly when
    that order holds — if a Spark upgrade broke it, the first capped
    latestOffset would resolve below the checkpoint, partitions() would
    see an inverted range and raise, and this test fails loudly instead
    of shipping silent duplicates."""
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    for i in range(2):
        txlog.append(spark, _mk(spark, [(i, "x")]), root)
    batches, _ = _drain_batches(
        spark, root, ckpt, {"maxVersionsPerTrigger": "1"}
    )
    assert len(batches) == 2
    # 8-version backlog lands while the query is down
    for i in range(8):
        txlog.append(spark, _mk(spark, [(10 + i, "y")]), root)
    # restart from the same checkpoint with the cap still on: if the
    # first latestOffset of the fresh reader instance capped from
    # sinceVersion=0 (floor not re-learned), the planned range would
    # invert and partitions() raises — the drain below only succeeds
    # when the WAL re-plan taught the reader its floor first.
    batches2, drained2 = _drain_batches(
        spark, root, ckpt, {"maxVersionsPerTrigger": "1"}
    )
    assert len(batches2) == 8  # one per backlog version — capped drain
    assert drained2 == _rows(
        txlog.read_table(spark, root).filter(F.col("k") >= 10)
    )


def test_admit_unit_floor_and_budget(tmp_path, spark):
    """Unit-level: _admit caps at floor+N, byte budget keeps at least
    one version, and observed offsets ratchet the floor monotonically."""
    root = str(tmp_path / "t")
    for i in range(6):
        txlog.append(spark, _mk(spark, [(i, "x")]), root)
    schema = txlog.load_snapshot(root).schema
    r = TxlogStreamReader(root, schema, 0, max_versions=2)
    assert r.latestOffset() == {"version": 2}
    # Spark plans (0,2]; the next window starts after it
    assert r.latestOffset() == {"version": 4}
    r.commit({"version": 4})
    assert r.latestOffset() == {"version": 6}
    assert r.latestOffset() == {"version": 6}  # drained: stays put

    # restart simulation: fresh instance, WAL re-plan teaches the floor
    r2 = TxlogStreamReader(root, schema, 0, max_versions=2)
    r2.partitions({"version": 3}, {"version": 5})  # WAL replay
    assert r2.latestOffset() == {"version": 6}  # capped from 5, not 0

    # inverted range guard (defense in depth): fail SOFT (ADVICE r7 #4)
    # — an inverted range contains no unprocessed commits, so the
    # recovery is an empty batch + floor re-learned from the start
    # offset; the capped stream self-heals instead of dying on restart
    r3 = TxlogStreamReader(root, schema, 0, max_versions=1)
    with pytest.warns(RuntimeWarning, match="inverted"):
        parts = r3.partitions({"version": 5}, {"version": 1})
    assert [p.path for p in parts] == [""]  # no-op sentinel slice
    assert r3.latestOffset() == {"version": 6}  # capped from floor 5


def test_invalid_cap_values_rejected(spark, tmp_path):
    from metadata_driven_data_pipeline_spark.sources.txlog_datasource import (
        TxlogDataSource,
    )

    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "x")]), root)
    schema = txlog.load_snapshot(root).schema
    with pytest.raises(ValueError, match="maxVersionsPerTrigger"):
        TxlogDataSource(
            options={"path": root, "maxversionspertrigger": "0"}
        ).streamReader(schema)
    with pytest.raises(ValueError, match="maxBytesPerTrigger"):
        TxlogDataSource(
            options={"path": root, "maxbytespertrigger": "-5"}
        ).streamReader(schema)
