"""Python DataSource over txlog tables (sources/txlog_datasource.py):
format("txlog") batch snapshot / time travel / change feed, pushed-filter
file pruning, and the micro-batch streaming source with checkpoint resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from metadata_driven_data_pipeline_spark.sinks import txlog
from metadata_driven_data_pipeline_spark.sources import txlog_datasource as tds


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, pairs):
    return spark.createDataFrame(pairs, "k int, v string").coalesce(1)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a"), (2, "b")]), root)
    txlog.append(spark, _mk(spark, [(3, "c"), (4, "d")]), root)
    return root


def test_batch_read_matches_read_table(spark, table):
    got = spark.read.format("txlog").load(table)
    assert _rows(got) == _rows(txlog.read_table(spark, table))
    assert got.schema == txlog.load_snapshot(table).schema


def test_time_travel_option(spark, table):
    v1 = spark.read.format("txlog").option("version", 1).load(table)
    assert _rows(v1) == [(1, "a"), (2, "b")]


def test_filter_applied_and_results_exact(spark, table):
    got = spark.read.format("txlog").load(table).filter(F.col("k") >= 3)
    assert _rows(got) == [(3, "c"), (4, "d")]


def test_pushed_filters_prune_files_before_open(spark, table):
    """Unit-level: the reader's partitions() drops files whose footer
    [min,max] cannot match the pushed predicate — commit 1 holds k∈[1,2],
    commit 2 k∈[3,4], so k>=3 plans exactly one file slice."""
    from pyspark.sql.datasource import GreaterThanOrEqual

    snap = txlog.load_snapshot(table)
    reader = tds.TxlogBatchReader(table, snap.schema, None)
    unsupported = reader.pushFilters([GreaterThanOrEqual(("k",), 3)])
    # every filter is returned unsupported (Spark re-applies post-scan)
    assert len(list(unsupported)) == 1
    parts = reader.partitions()
    assert len(parts) == 1 and len(snap.files) == 2


def test_fully_pruned_scan_returns_empty_not_error(spark, table):
    got = spark.read.format("txlog").load(table).filter(F.col("k") > 99)
    assert got.count() == 0


def test_subset_schema_prunes_columns_at_file_read(spark, table):
    one = StructType([txlog.load_snapshot(table).schema["k"]])
    got = spark.read.format("txlog").schema(one).load(table)
    assert _rows(got) == [(1,), (2,), (3,), (4,)]


def test_batch_change_feed_since_to_and_cdf_columns(spark, table):
    cf = (
        spark.read.format("txlog")
        .option("sinceVersion", 1)
        .option("cdf", "true")
        .load(table)
    )
    assert _rows(cf) == [(3, "c", 2, "append"), (4, "d", 2, "append")]
    none = (
        spark.read.format("txlog").option("sinceVersion", 2).load(table)
    )
    assert none.count() == 0


def test_not_a_table_raises(spark, tmp_path):
    with pytest.raises(Exception, match="not a txlog table"):
        spark.read.format("txlog").load(str(tmp_path / "missing")).count()


def test_streaming_source_incremental_with_checkpoint_resume(
    spark, tmp_path
):
    """availableNow drains all commits; a third commit + restart from the
    SAME checkpoint reads ONLY the new commit — offsets are commit
    versions, so resume is exact, never a rescan."""
    root = str(tmp_path / "t")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    txlog.append(spark, _mk(spark, [(1, "a"), (2, "b")]), root)
    txlog.append(spark, _mk(spark, [(3, "c")]), root)

    def drain():
        q = (
            spark.readStream.format("txlog")
            .option("cdf", "true")
            .load(root)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = spark.read.parquet(sink)
    assert got.count() == 3
    assert _rows(got.select("k", "_commit_version")) == [
        (1, 1),
        (2, 1),
        (3, 2),
    ]

    txlog.append(spark, _mk(spark, [(4, "d")]), root)
    drain()
    got2 = spark.read.parquet(sink)
    # exactly one new row — commits 1-2 were NOT re-read
    assert _rows(got2.select("k", "_commit_version")) == [
        (1, 1),
        (2, 1),
        (3, 2),
        (4, 3),
    ]


def test_streaming_since_version_skips_history(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)
    txlog.append(spark, _mk(spark, [(2, "b")]), root)
    q = (
        spark.readStream.format("txlog")
        .option("sinceVersion", 1)
        .load(root)
        .writeStream.format("memory")
        .queryName("txlog_since")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(spark.sql("select * from txlog_since")) == [(2, "b")]


def test_evolved_table_reads_through_datasource(spark, tmp_path):
    """A file written before a column was added lacks it physically; the
    per-file Arrow read fills NULLs instead of erroring."""
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)
    wider = spark.createDataFrame(
        [(2, "b", 5.0)], "k int, v string, score double"
    ).coalesce(1)
    txlog.append(spark, wider, root, merge_schema=True)
    got = spark.read.format("txlog").load(root)
    rows = {r["k"]: r["score"] for r in got.collect()}
    assert rows == {1: None, 2: 5.0}


# ------------------------------------------------------------- writers


def test_batch_write_append_and_overwrite(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    ).repartition(2)
    df.write.format("txlog").mode("append").save(root)
    assert _rows(txlog.read_table(spark, root)) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    hist = txlog.history(root)
    assert [h["op"] for h in hist] == ["append"] and hist[0]["rows_added"] == 3
    _mk(spark, [(9, "z")]).write.format("txlog").mode("overwrite").save(root)
    assert _rows(txlog.read_table(spark, root)) == [(9, "z")]
    # pre-overwrite snapshot still time-travels
    assert txlog.read_table(spark, root, version=1).count() == 3


def test_batch_write_schema_evolution_option(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, [(1, "a")]).write.format("txlog").mode("append").save(root)
    wider = spark.createDataFrame([(2, "b", 1.5)], "k int, v string, s double")
    with pytest.raises(Exception, match="schema mismatch"):
        wider.write.format("txlog").mode("append").save(root)
    wider.write.format("txlog").mode("append").option(
        "mergeSchema", "true"
    ).save(root)
    rows = {r["k"]: r["s"] for r in txlog.read_table(spark, root).collect()}
    assert rows == {1: None, 2: 1.5}


def test_empty_write_still_establishes_table_schema(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, []).write.format("txlog").mode("append").save(root)
    got = txlog.read_table(spark, root)
    assert got.count() == 0 and got.columns == ["k", "v"]


def test_stream_writer_microbatch_commit_is_exactly_once(spark, tmp_path):
    """The replay mechanism itself: committing the SAME (appId, batchId)
    twice folds the staged files once — the second commit is a metadata
    no-op, so foreachBatch-style at-least-once re-delivery cannot
    double-append."""
    import pyarrow as pa

    root = str(tmp_path / "t")
    schema = txlog.StructType.fromDDL("k int, v string")
    w = tds.TxlogStreamWriter(root, schema, False, False, "app1")
    batch = pa.RecordBatch.from_pydict({"k": [1, 2], "v": ["a", "b"]})
    msg = w.write(iter([batch]))
    w.commit([msg], batchId=0)
    assert txlog.read_table(spark, root).count() == 2
    # replay of batch 0: new staged file, same txn → skipped (orphan
    # swept by vacuum), table unchanged
    msg2 = w.write(iter([batch]))
    w.commit([msg2], batchId=0)
    assert txlog.read_table(spark, root).count() == 2
    assert txlog.load_snapshot(root).version == 1
    # the NEXT batch commits normally
    msg3 = w.write(iter([batch]))
    w.commit([msg3], batchId=1)
    assert txlog.read_table(spark, root).count() == 4


def test_abort_unlinks_staged_files(spark, tmp_path):
    import pyarrow as pa

    root = str(tmp_path / "t")
    schema = txlog.StructType.fromDDL("k int, v string")
    w = tds.TxlogBatchWriter(root, schema, False, False)
    msg = w.write(iter([pa.RecordBatch.from_pydict({"k": [1], "v": ["a"]})]))
    assert msg.path and txlog.os.path.exists(msg.path)
    w.abort([msg, None])
    assert not txlog.os.path.exists(msg.path)


def test_stream_txlog_to_txlog_pipeline_resumes(spark, tmp_path):
    """readStream(txlog) -> writeStream(txlog): an incremental table-to-
    table pipeline through the standard streaming API. After a restart,
    only the new source commit lands in the sink (reader offsets) and
    the sink's txn watermark advances (writer exactly-once)."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    txlog.append(spark, _mk(spark, [(1, "a"), (2, "b")]), src)

    def run():
        q = (
            spark.readStream.format("txlog")
            .load(src)
            .writeStream.format("txlog")
            .option("path", dst)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert _rows(txlog.read_table(spark, dst)) == [(1, "a"), (2, "b")]
    txlog.append(spark, _mk(spark, [(3, "c")]), src)
    run()
    assert _rows(txlog.read_table(spark, dst)) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    # each drained micro-batch is one sink commit
    assert [h["op"] for h in txlog.history(dst)] == ["append", "append"]


def test_cdf_only_projection_keeps_row_counts(spark, tmp_path):
    """A user schema naming ONLY the commit columns reads a column-less
    slice of each file — row counts must come from the footer, one
    tagged row per source row."""
    from pyspark.sql.types import IntegerType, StringType

    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a"), (2, "b")]), root)
    only = (
        StructType()
        .add("_commit_version", IntegerType())
        .add("_commit_op", StringType())
    )
    got = (
        spark.read.format("txlog")
        .schema(only)
        .option("sinceVersion", 0)
        .option("cdf", "true")
        .load(root)
    )
    assert [tuple(r) for r in got.collect()] == [
        (1, "append"),
        (1, "append"),
    ]


def test_stream_writer_without_txn_appid_never_drops_batches(spark, tmp_path):
    """Review fix: txn dedup is opt-in. Without txnAppId, a second query
    (or a restarted checkpoint) whose batchIds restart at 0 appends
    normally instead of being silently skipped."""
    import pyarrow as pa

    root = str(tmp_path / "t")
    schema = txlog.StructType.fromDDL("k int, v string")
    batch = pa.RecordBatch.from_pydict({"k": [1, 2], "v": ["a", "b"]})
    w1 = tds.TxlogStreamWriter(root, schema, False, False, None)
    w1.commit([w1.write(iter([batch]))], batchId=0)
    w2 = tds.TxlogStreamWriter(root, schema, False, False, None)
    w2.commit([w2.write(iter([batch]))], batchId=0)  # fresh query, batch 0
    assert txlog.read_table(spark, root).count() == 4  # nothing dropped
    assert txlog.load_snapshot(root).txns == {}


def test_batch_cdf_without_since_version_errors(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)
    with pytest.raises(Exception, match="requires sinceVersion"):
        spark.read.format("txlog").option("cdf", "true").load(root).count()


def test_stream_or_cdf_read_of_vacuumed_file_is_actionable(spark, tmp_path):
    """VERDICT r6 #6: a change-feed (or streaming) partition referencing
    a commit whose data file vacuum() reclaimed must fail with an
    actionable message, not an empty batch or a bare FileNotFoundError
    executor trace."""
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)
    txlog.overwrite(spark, _mk(spark, [(2, "b")]), root)
    txlog.vacuum(root, keep_versions=1, min_age_seconds=0)  # v1's file gone
    df = (
        spark.read.format("txlog")
        .option("sinceVersion", 0)
        .load(root)
    )
    with pytest.raises(Exception, match="vacuum"):
        df.collect()


def test_version_option_rejects_nonexistent_version(spark, table):
    with pytest.raises(Exception, match="no snapshot v99"):
        spark.read.format("txlog").option("version", 99).load(table).collect()


def test_timestamp_as_of_option(spark, table):
    """.option('timestampAsOf', ...) resolves through the recorded
    commit ts — same contract as read_table(timestamp=...)."""
    ts_v1 = txlog.history(table)[0]["ts"]
    got = (
        spark.read.format("txlog")
        .option("timestampAsOf", ts_v1)
        .load(table)
    )
    assert _rows(got) == [(1, "a"), (2, "b")]
    with pytest.raises(Exception, match="not both"):
        (
            spark.read.format("txlog")
            .option("timestampAsOf", ts_v1)
            .option("version", 1)
            .load(table)
            .collect()
        )
    with pytest.raises(Exception, match="no commit at or before"):
        (
            spark.read.format("txlog")
            .option("timestampAsOf", "1999-01-01")
            .load(table)
            .collect()
        )
