"""skipChangeCommits (r8, VERDICT r7 'what's missing' #1): the change
feed and the streaming source can exclude file-REMOVING commits
(merge/delete/optimize/restore/overwrite/replace_where), so an additive
downstream consumer (sums, counters, append-only replication) never
sees a rewritten file's rows twice. Pinned here:

- read_changes(skip_change_commits=True) over an append/merge/optimize/
  delete interleave equals the union of the appended batches;
- a stream with the option drains an optimize-interleaved table to the
  append-only total (the default stream double-counts — both pinned);
- offsets advance THROUGH skipped versions (no stall on maintenance);
- bootstrap merge (removes nothing) still flows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.sinks import txlog
from metadata_driven_data_pipeline_spark.sources import txlog_datasource


def _mk(spark, rows, schema="k int, v int, seq int"):
    return spark.createDataFrame(rows, schema).coalesce(1)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _build_interleaved(spark, root):
    """appends interleaved with rewrite commits; returns the rows the
    append-shaped commits carried."""
    appended = []
    txlog.append(spark, _mk(spark, [(1, 10, 1), (2, 20, 1)]), root)  # v1
    appended += [(1, 10, 1), (2, 20, 1)]
    txlog.append(spark, _mk(spark, [(3, 30, 1)]), root)  # v2
    appended += [(3, 30, 1)]
    txlog.optimize(spark, root, target_bytes=1 << 30)  # v3: rewrite all
    txlog.append(spark, _mk(spark, [(4, 40, 1)]), root)  # v4
    appended += [(4, 40, 1)]
    # merge upsert rewrites the overlapping file(s)
    txlog.merge(spark, _mk(spark, [(2, 99, 2)]), root, ["k"], "seq")  # v5
    txlog.delete(spark, root, [("k", "==", 1)])  # v6: boundary rewrite
    txlog.append(spark, _mk(spark, [(5, 50, 1)]), root)  # v7
    appended += [(5, 50, 1)]
    return appended


def test_read_changes_skip_change_commits(spark, tmp_path):
    root = str(tmp_path / "t")
    appended = _build_interleaved(spark, root)
    # merge carries a 'seq' column into the schema; project it away
    feed = txlog.read_changes(
        spark, root, 0, skip_change_commits=True
    ).select("k", "v", "seq")
    assert _rows(feed) == sorted(appended)
    # ops seen are exclusively append-shaped
    ops = {
        r["_commit_op"]
        for r in txlog.read_changes(
            spark, root, 0, skip_change_commits=True
        ).select("_commit_op").distinct().collect()
    }
    assert ops == {"append"}
    # the default feed re-emits rewritten rows (documented ignoreChanges
    # semantics) — strictly more rows
    dflt = txlog.read_changes(spark, root, 0).count()
    assert dflt > len(appended)


def test_stream_skip_change_commits_additive_consumer(spark, tmp_path):
    """The additive-consumer certificate: summing a streamed feed over
    an optimize/merge-interleaved table double-counts by default and is
    exact with skipChangeCommits."""
    root = str(tmp_path / "t")
    appended = _build_interleaved(spark, root)

    def drain(opts, ckpt):
        rows = []

        def record(df, _bid):
            rows.extend(
                tuple(r) for r in df.select("k", "v", "seq").collect()
            )

        reader = spark.readStream.format("txlog")
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load(root)
            .writeStream.foreachBatch(record)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(rows)

    skip = drain({"skipChangeCommits": "true"}, "ckpt_skip")
    assert skip == sorted(appended)
    dflt = drain({}, "ckpt_dflt")
    assert len(dflt) > len(appended)  # default re-emits rewrites


def test_stream_offsets_advance_through_skipped_versions(spark, tmp_path):
    """A maintenance burst (optimize after optimize) must not stall a
    capped skipChangeCommits stream: versions are planned as empty
    ranges and the checkpointed offset still reaches the head."""
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, 10, 1)]), root)  # v1
    txlog.append(spark, _mk(spark, [(2, 20, 1)]), root)  # v2
    txlog.optimize(spark, root, target_bytes=1 << 30)  # v3
    snap = txlog.load_snapshot(root)
    r = txlog_datasource.TxlogStreamReader(
        root, snap.schema, 0, max_versions=1, skip_changes=True
    )
    seen = []
    off = r.initialOffset()
    for _ in range(5):
        nxt = r.latestOffset()
        if nxt == off:
            break
        parts = r.partitions(off, nxt)
        seen.extend(p.path for p in parts if p.path)
        r.commit(nxt)
        off = nxt
    assert off == {"version": 3}  # advanced through the skipped rewrite
    # only the two append files were ever planned
    assert len(seen) == 2


def test_batch_change_feed_datasource_option(spark, tmp_path):
    root = str(tmp_path / "t")
    appended = _build_interleaved(spark, root)
    txlog_datasource.register(spark)
    got = (
        spark.read.format("txlog")
        .option("sinceVersion", "0")
        .option("skipChangeCommits", "true")
        .load(root)
        .select("k", "v", "seq")
    )
    assert _rows(got) == sorted(appended)


def test_bootstrap_merge_flows_as_append_shaped(spark, tmp_path):
    root = str(tmp_path / "t")
    # first-ever merge creates the table: removes nothing → flows
    txlog.merge(spark, _mk(spark, [(1, 10, 1)]), root, ["k"], "seq")
    feed = txlog.read_changes(spark, root, 0, skip_change_commits=True)
    assert feed.count() == 1
