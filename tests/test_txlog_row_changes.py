"""Row-level CDC diff feed (sinks/txlog.py:read_row_changes — r8): each
commit's NET row changes as _change_type ∈ {insert, delete}, computed as
a per-commit EXCEPT ALL snapshot diff over the commit's touched files
(immutable data files make the diff exact; no CDC sidecars, no
write-time cost). Pinned here:

- the replication contract: base snapshot + applied diff == any later
  snapshot, row-for-row including duplicates;
- pure appends take the no-diff fast path and emit every row as insert;
- OPTIMIZE (contents-preserving rewrite) emits ZERO rows;
- MERGE emits delete+insert pairs for changed keys ONLY — untouched
  rows of rewritten files cancel;
- a deletion-vector delete emits exactly the newly-masked rows; a
  rewrite-mode delete emits the same rows (mode-independent feed);
- duplicate rows keep multiset semantics (EXCEPT ALL, not EXCEPT);
- rows are emitted under the `to`-snapshot schema (later-added columns
  NULL for old rows);
- expired history raises instead of emitting a short feed.
"""

from __future__ import annotations

import pytest

from metadata_driven_data_pipeline_spark.sinks import txlog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _base(spark, root):
    df = spark.range(0, 100).selectExpr(
        "id", "cast(id as double) as v", "cast(1 as long) as seq"
    )
    txlog.append(spark, df.coalesce(2), root)  # v1
    return df


def test_replication_contract(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root)
    upd = spark.range(10, 20).selectExpr(
        "id", "cast(id*10 as double) as v", "cast(2 as long) as seq"
    )
    ins = spark.range(100, 110).selectExpr(
        "id", "cast(id as double) as v", "cast(2 as long) as seq"
    )
    txlog.merge(spark, upd.union(ins), root, ["id"], "seq")  # v2
    txlog.optimize(spark, root)  # v3
    txlog.delete(
        spark, root, [("id", ">=", 30), ("id", "<", 35)],
        deletion_vectors=True,
    )  # v4

    base = txlog.read_table(spark, root, version=1)
    diff = txlog.read_row_changes(spark, root, 1)
    cols = ["id", "v", "seq"]
    replica = (
        base.exceptAll(diff.filter("_change_type='delete'").select(*cols))
        .unionAll(diff.filter("_change_type='insert'").select(*cols))
    )
    final = txlog.read_table(spark, root)
    assert replica.exceptAll(final).count() == 0
    assert final.exceptAll(replica).count() == 0


def test_append_fast_path_and_optimize_emits_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root)
    txlog.append(
        spark,
        spark.range(100, 120).selectExpr(
            "id", "cast(0 as double) as v", "cast(1 as long) as seq"
        ),
        root,
    )  # v2
    txlog.optimize(spark, root)  # v3: pure rewrite
    cdc = txlog.read_row_changes(spark, root, 1)
    got = {
        (r["_commit_version"], r["_change_type"]): r["count"]
        for r in cdc.groupBy("_commit_version", "_change_type")
        .count()
        .collect()
    }
    assert got == {(2, "insert"): 20}, got


def test_merge_emits_only_changed_keys(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root)
    upd = spark.range(40, 43).selectExpr(
        "id", "cast(-1 as double) as v", "cast(2 as long) as seq"
    )
    txlog.merge(spark, upd, root, ["id"], "seq")  # v2 rewrites file(s)
    cdc = txlog.read_row_changes(spark, root, 1)
    dels = cdc.filter("_change_type='delete'")
    ins = cdc.filter("_change_type='insert'")
    assert _rows(dels.select("id", "v")) == [
        (40, 40.0), (41, 41.0), (42, 42.0)
    ]
    assert _rows(ins.select("id", "v")) == [
        (40, -1.0), (41, -1.0), (42, -1.0)
    ]


def test_delete_modes_emit_identical_feeds(spark, tmp_path):
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    _base(spark, ra)
    _base(spark, rb)
    where = [("id", ">=", 10), ("id", "<", 17)]
    txlog.delete(spark, ra, where, deletion_vectors=True)
    txlog.delete(spark, rb, where)
    fa = txlog.read_row_changes(spark, ra, 1).drop("_commit_op")
    fb = txlog.read_row_changes(spark, rb, 1).drop("_commit_op")
    assert _rows(fa) == _rows(fb)
    assert fa.filter("_change_type='insert'").count() == 0
    assert fa.filter("_change_type='delete'").count() == 7


def test_duplicate_rows_keep_multiplicity(spark, tmp_path):
    root = str(tmp_path / "t")
    dup = spark.createDataFrame([(1, "x")] * 3 + [(2, "y")], "k int, s string")
    txlog.append(spark, dup.coalesce(1), root)  # v1
    txlog.delete(spark, root, [("k", "==", 1)])  # v2 rewrites: drops 3 dups
    cdc = txlog.read_row_changes(spark, root, 1)
    assert (
        cdc.filter("_change_type='delete' and k = 1").count() == 3
    )


def test_schema_evolution_reads_under_to_schema(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append(
        spark, spark.createDataFrame([(1,), (2,)], "k int"), root
    )  # v1
    txlog.append(
        spark,
        spark.createDataFrame([(3, "c")], "k int, s string"),
        root,
        merge_schema=True,
    )  # v2
    cdc = txlog.read_row_changes(spark, root, 0)
    assert set(cdc.columns) == {
        "k", "s", "_change_type", "_commit_version", "_commit_op"
    }
    got = _rows(cdc.select("k", "s", "_change_type"))
    assert got == [
        (1, None, "insert"), (2, None, "insert"), (3, "c", "insert")
    ]


def test_expired_history_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(12):
        txlog.append(
            spark,
            spark.createDataFrame([(i,)], "k int"),
            root,
        )
    txlog.cleanup_log(root, keep_versions=2)
    with pytest.raises(ValueError, match="expired by log retention"):
        txlog.read_row_changes(spark, root, 0)
