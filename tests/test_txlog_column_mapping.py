"""Column mapping for transaction-log tables (r7, VERDICT r6 #5):
``rename_column`` / ``drop_column`` as metadata-only commits over
PHYSICAL column names frozen at column birth (the Delta column-mapping
shape). The contract pinned here:

- rename: historic files read their data under the NEW name immediately
  (never the silent drop+add-with-NULL-history the verdict flagged);
- time travel resolves each snapshot under its OWN mapping;
- drop retires the physical name — re-adding it raises loudly instead
  of resurrecting old files' bytes under the new column;
- stats pruning, merge/delete/optimize, the Python DataSource (read,
  pushed-filter pruning, stream, write) and checkpointed folds all
  translate logical↔physical consistently.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.sinks import txlog


def _mk(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rename_reads_historic_data_under_new_name(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a"), (2, "b")]), root)
    res = txlog.rename_column(root, "v", "value")
    assert res["renamed"] == ["v", "value"]
    got = txlog.read_table(spark, root)
    assert got.columns == ["k", "value"]
    # the old files' data is THERE under the new name — not NULL
    assert _rows(got) == [(1, "a"), (2, "b")]
    # history records the metadata-only commit
    assert txlog.history(root)[-1]["op"] == "rename_column"
    assert txlog.history(root)[-1]["files_added"] == 0


def test_rename_time_travel_resolves_per_snapshot(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)  # v1
    txlog.rename_column(root, "v", "value")  # v2
    txlog.append(
        spark, _mk(spark, [(2, "b")], "k int, value string"), root
    )  # v3
    # pre-rename snapshot: old name, old data
    v1 = txlog.read_table(spark, root, version=1)
    assert v1.columns == ["k", "v"] and _rows(v1) == [(1, "a")]
    # post-rename: both files (old physical layout + new) under new name
    v3 = txlog.read_table(spark, root, version=3)
    assert v3.columns == ["k", "value"]
    assert _rows(v3) == [(1, "a"), (2, "b")]


def test_new_files_store_physical_names(spark, tmp_path):
    """Appends after a rename keep writing the PHYSICAL (birth) name —
    one footer keyspace forever, which is what keeps stats pruning and
    old-reader compatibility intact."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)
    txlog.rename_column(root, "v", "value")
    txlog.append(spark, _mk(spark, [(2, "b")], "k int, value string"), root)
    snap = txlog.load_snapshot(root)
    for rel in snap.files:
        names = pq.ParquetFile(os.path.join(root, rel)).schema_arrow.names
        assert names == ["k", "v"]  # physical, in every file
    assert _rows(txlog.read_table(spark, root)) == [(1, "a"), (2, "b")]


def test_rename_errors(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)
    with pytest.raises(ValueError, match="no column"):
        txlog.rename_column(root, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        txlog.rename_column(root, "v", "k")


def test_add_column_shadowing_renamed_physical_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)
    txlog.rename_column(root, "v", "value")
    # historic files carry data under physical 'v' — a NEW column 'v'
    # would leak it; loud actionable error instead
    with pytest.raises(ValueError, match="used physically"):
        txlog.append(
            spark,
            _mk(spark, [(2, "b", "X")], "k int, value string, v string"),
            root,
            merge_schema=True,
        )


def test_drop_column_and_retired_name_guard(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a"), (2, "b")]), root)  # v1
    res = txlog.drop_column(root, "v")  # v2
    assert res["dropped"] == "v"
    got = txlog.read_table(spark, root)
    assert got.columns == ["k"] and _rows(got) == [(1,), (2,)]
    # time travel pre-drop still reads the column
    v1 = txlog.read_table(spark, root, version=1)
    assert _rows(v1) == [(1, "a"), (2, "b")]
    # re-adding the retired name raises (old bytes must not resurrect)
    with pytest.raises(ValueError, match="used physically"):
        txlog.append(
            spark, _mk(spark, [(3, "ghost")]), root, merge_schema=True
        )
    # a fresh name is fine
    txlog.append(
        spark, _mk(spark, [(3, "w3")], "k int, w string"), root,
        merge_schema=True,
    )
    assert _rows(txlog.read_table(spark, root)) == [
        (1, None),
        (2, None),
        (3, "w3"),
    ]
    with pytest.raises(ValueError, match="only column"):
        t2 = str(tmp_path / "t2")
        txlog.append(spark, spark.createDataFrame([(1,)], "k int"), t2)
        txlog.drop_column(t2, "k")


def test_stats_pruning_translates_renamed_columns(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k int, v string"
    ).repartitionByRange(4, "k")
    txlog.append(spark, df, root)
    txlog.rename_column(root, "k", "key")
    got, report = txlog.scan(spark, root, where=[("key", "==", 7)])
    assert report["files_scanned"] < report["files_total"]
    assert _rows(got.select("key")) == [(7,)]


def test_merge_delete_optimize_after_rename(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(
        spark,
        _mk(spark, [(1, "a", 1), (2, "b", 1)], "k int, v string, seq int"),
        root,
    )
    txlog.rename_column(root, "k", "key")
    txlog.rename_column(root, "v", "val")
    # merge on the renamed key
    txlog.merge(
        spark,
        _mk(spark, [(2, "B", 2), (3, "c", 2)], "key int, val string, seq int"),
        root,
        ["key"],
        "seq",
    )
    assert _rows(txlog.read_table(spark, root)) == [
        (1, "a", 1),
        (2, "B", 2),
        (3, "c", 2),
    ]
    # delete on the renamed column
    txlog.delete(spark, root, [("key", "==", 1)])
    assert _rows(txlog.read_table(spark, root)) == [(2, "B", 2), (3, "c", 2)]
    # optimize (zorder on renamed cols) keeps contents
    txlog.optimize(
        spark, root, target_bytes=1 << 30, zorder_by=["key", "seq"]
    )
    assert _rows(txlog.read_table(spark, root)) == [(2, "B", 2), (3, "c", 2)]


def test_datasource_read_write_stream_after_rename(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k int, v string"
    ).repartitionByRange(4, "k")
    txlog.append(spark, df, root)
    txlog.rename_column(root, "k", "key")
    # batch read: logical names, full data
    got = spark.read.format("txlog").load(root)
    assert got.columns == ["key", "v"]
    assert got.count() == 40
    # pushed filter on the renamed column prunes files AND stays exact
    point = spark.read.format("txlog").load(root).filter(F.col("key") == 7)
    assert _rows(point.select("v")) == [("v7",)]
    # DataSource write after rename: appended batch lands under the
    # physical name and reads back logically
    (
        spark.createDataFrame([(100, "new")], "key int, v string")
        .write.format("txlog")
        .mode("append")
        .save(root)
    )
    assert (
        spark.read.format("txlog").load(root).filter("key = 100").count()
        == 1
    )
    # change feed injects logical names too
    feed = txlog.read_changes(spark, root, since_version=0)
    assert set(feed.columns) == {"key", "v", "_commit_version", "_commit_op"}
    assert feed.count() == 41
    # streaming source
    sink = str(tmp_path / "sink")
    q = (
        spark.readStream.format("txlog")
        .load(root)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.columns == ["key", "v"] and out.count() == 41


def test_mapping_survives_checkpointed_fold(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)
    txlog.rename_column(root, "v", "value")
    txlog.drop_column(root, "value")
    for i in range(2, 12):  # cross CHECKPOINT_INTERVAL
        txlog.append(spark, spark.createDataFrame([(i,)], "k int"), root)
    snap = txlog.load_snapshot(root)
    assert snap.version >= 13 and snap.retired == {"v"}
    assert snap.schema.fieldNames() == ["k"]
    assert len(_rows(txlog.read_table(spark, root))) == 11
    # the guard holds after the fold came from a checkpoint
    with pytest.raises(ValueError, match="used physically"):
        txlog.append(
            spark, _mk(spark, [(99, "x")]), root, merge_schema=True
        )


def test_rename_partition_column_of_converted_table(spark, tmp_path):
    """Adopted Hive-partitioned files store partition values under the
    adoption-time (physical) key — renaming the partition column
    translates injection and pruning."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "eu" if i % 2 else "us") for i in range(20)],
        "k int, region string",
    )
    df.write.partitionBy("region").mode("overwrite").parquet(root)
    txlog.convert_to_txlog(spark, root)
    txlog.rename_column(root, "region", "zone")
    got = txlog.read_table(spark, root)
    assert got.columns == ["k", "zone"]
    assert got.filter("zone = 'eu'").count() == 10
    _, report = txlog.scan(spark, root, where=[("zone", "==", "eu")])
    assert report["files_scanned"] < report["files_total"]
    # python DataSource injects under the new logical name too
    ds = spark.read.format("txlog").load(root)
    assert ds.filter("zone = 'eu'").count() == 10
