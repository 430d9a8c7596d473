"""DataSource-writer partitionBy (r8, VERDICT r7 'what's missing' #4):
``df.write.format("txlog").option("partitionBy", "col")`` routes the
per-task Arrow staging through the same Hive ``key=value`` layout (and
metadata: injection dict, min==max stats) as the programmatic
``txlog.append(partition_by=...)`` lane. Pinned here:

- entries carry the ``partition`` dict and per-partition row totals
  match the programmatic lane;
- the table reads back with JVM PartitionFilters and scan() prunes on
  the partition predicate;
- NULL and special-character partition values round-trip (the encoder
  is the exact inverse of the discovery parser);
- hidden-prefixed / missing partition columns fail on the DRIVER
  before any task stages a file;
- the stream writer honors the same option.
"""

from __future__ import annotations

import collections

import pytest

from metadata_driven_data_pipeline_spark.sinks import txlog


def _totals(snap):
    t = collections.Counter()
    for e in snap.files.values():
        t[tuple(sorted((e.get("partition") or {}).items()))] += e["rows"]
    return dict(t)


def _df(spark):
    return spark.createDataFrame(
        [(i, "a" if i < 50 else "b") for i in range(100)], "id int, p string"
    )


def test_ds_partitionby_matches_programmatic_metadata(spark, tmp_path):
    root = str(tmp_path / "ds")
    _df(spark).repartition("p").write.format("txlog").option(
        "partitionBy", "p"
    ).mode("append").save(root)
    snap = txlog.load_snapshot(root)
    assert all(e.get("partition") for e in snap.files.values())

    root2 = str(tmp_path / "prog")
    txlog.append(spark, _df(spark), root2, partition_by=["p"])
    assert _totals(snap) == _totals(txlog.load_snapshot(root2))

    out = txlog.read_table(spark, root)
    assert out.count() == 100
    assert out.filter("p = 'a'").count() == 50


def test_ds_partitionby_prunes(spark, tmp_path):
    root = str(tmp_path / "t")
    _df(spark).repartition("p").write.format("txlog").option(
        "partitionBy", "p"
    ).mode("append").save(root)
    df, rep = txlog.scan(spark, root, [("p", "==", "b")])
    assert rep["files_scanned"] < rep["files_total"]
    assert df.count() == 50
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_ds_partitionby_value_roundtrip(spark, tmp_path):
    root = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, None), (2, "x=1/y 2%"), (3, "plain")], "id int, p string"
    ).write.format("txlog").option("partitionBy", "p").mode("append").save(
        root
    )
    got = sorted(
        (r["id"], r["p"]) for r in txlog.read_table(spark, root).collect()
    )
    assert got == [(1, None), (2, "x=1/y 2%"), (3, "plain")]
    # the DataSource read lane injects the same values
    ds = sorted(
        (r["id"], r["p"])
        for r in spark.read.format("txlog").load(root).collect()
    )
    assert ds == got


def test_ds_partitionby_validates_on_driver(spark, tmp_path):
    root = str(tmp_path / "t")
    with pytest.raises(Exception, match="partitionBy"):
        _df(spark).write.format("txlog").option(
            "partitionBy", "nope"
        ).mode("append").save(root)
    with pytest.raises(Exception, match="partitionBy"):
        spark.createDataFrame([(1, "a")], "`_h` string, p string").write.format(
            "txlog"
        ).option("partitionBy", "_h").mode("append").save(root)


def test_ds_partitionby_stream_writer(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "t")
    _df(spark).write.parquet(src)
    q = (
        spark.readStream.schema("id int, p string")
        .parquet(src)
        .writeStream.format("txlog")
        .option("partitionBy", "p")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start(root)
    )
    q.awaitTermination(120)
    snap = txlog.load_snapshot(root)
    assert all(e.get("partition") for e in snap.files.values())
    assert txlog.read_table(spark, root).count() == 100
