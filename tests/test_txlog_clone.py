"""Shallow / deep CLONE of txlog tables (Delta `CREATE TABLE ... CLONE`
parity; extension beyond the reference's surface — the reference
pipeline has no table format at all).

Contract under test:
- shallow clone is metadata-only: the clone commit references the
  source snapshot's files in place (absolute-path keys + ``base``),
  zero data bytes copied, and reads equal the source snapshot —
  including deletion-vector masks (sidecars rel-translated into the
  clone's own ``_dv/``) and ``key=value`` partitioned layouts;
- the two tables evolve independently afterwards (writes, DV deletes,
  vacuum on either side never corrupt the other);
- carried: schema + column mapping, retired names, CHECK constraints,
  per-file stats (pruning bites immediately); NOT carried: txns;
- OPTIMIZE on the clone rewrites external files into local ones
  (the un-shallow escape hatch); deep clone is self-contained from
  the start.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from metadata_driven_data_pipeline_spark.sinks import txlog


def _mk(tmp_path, name):
    return os.path.join(str(tmp_path), name)


def _rows(spark, root, version=None):
    return sorted(
        map(tuple, txlog.read_table(spark, root, version=version).collect())
    )


def _build_src(spark, root):
    """3-commit source: two appends + a rewrite delete."""
    txlog.append(
        spark,
        spark.createDataFrame(
            [(i, f"a{i}", i * 10) for i in range(8)],
            "id int, s string, v int",
        ).coalesce(1),
        root,
    )
    txlog.append(
        spark,
        spark.createDataFrame(
            [(i, f"b{i}", i * 10) for i in range(8, 14)],
            "id int, s string, v int",
        ).coalesce(1),
        root,
    )
    txlog.delete(spark, root, [("id", ">=", 12)])
    return txlog.load_snapshot(root)


def test_shallow_clone_reads_equal_and_is_metadata_only(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c1")
    _build_src(spark, src)
    rep = txlog.clone_table(spark, src, dst)
    assert rep["mode"] == "shallow" and rep["rows"] == 12
    assert _rows(spark, dst) == _rows(spark, src)
    # metadata-only: no data files under the clone's own data/
    assert not os.path.isdir(os.path.join(dst, txlog.DATA_DIR))
    ops = [h["op"] for h in txlog.history(dst)]
    assert ops[0] == "clone"
    # every entry is external: keyed by absolute path with a base
    snap = txlog.load_snapshot(dst)
    assert all(os.path.isabs(p) for p in snap.files)
    assert all(e["base"] == os.path.abspath(src) for e in snap.files.values())


def test_shallow_clone_version_and_timestamp_pinned(spark, tmp_path):
    src, d2, d3 = _mk(tmp_path, "src"), _mk(tmp_path, "v2"), _mk(tmp_path, "t")
    _build_src(spark, src)  # v1 append, v2 append, v3 delete
    txlog.clone_table(spark, src, d2, version=2)
    assert _rows(spark, d2) == _rows(spark, src, version=2)
    ts2 = [h for h in txlog.history(src) if h["version"] == 2][0]["ts"]
    txlog.clone_table(spark, src, d3, timestamp=ts2)
    assert _rows(spark, d3) == _rows(spark, src, version=2)


def test_clone_independence_both_directions(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    before = _rows(spark, src)
    txlog.clone_table(spark, src, dst)
    # clone-side writes: append + rewrite delete land under the clone
    txlog.append(
        spark,
        spark.createDataFrame([(100, "x", 1)], "id int, s string, v int"),
        dst,
    )
    txlog.delete(spark, dst, [("id", "<", 3)])
    assert _rows(spark, src) == before
    got = _rows(spark, dst)
    assert (100, "x", 1) in got and all(t[0] >= 3 for t in got)
    # source-side writes never reach the clone
    txlog.append(
        spark,
        spark.createDataFrame([(200, "y", 2)], "id int, s string, v int"),
        src,
    )
    assert (200, "y", 2) not in _rows(spark, dst)


def test_shallow_clone_carries_and_retranslates_deletion_vectors(
    spark, tmp_path
):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    # DV-mask two rows in place on the source
    r = txlog.delete(spark, src, [("id", "=", 5)], deletion_vectors=True)
    assert r["files_masked"] == 1
    txlog.clone_table(spark, src, dst)
    assert _rows(spark, dst) == _rows(spark, src)
    assert all(t[0] != 5 for t in _rows(spark, dst))
    # the clone's sidecar is its OWN copy under dst/_dv
    snap = txlog.load_snapshot(dst)
    dvs = {e["dv"]["path"] for e in snap.files.values() if e.get("dv")}
    assert dvs and all(
        os.path.isdir(os.path.join(dst, p)) for p in dvs
    )
    # a DV delete on the CLONE's external file masks there, not at src
    r2 = txlog.delete(spark, dst, [("id", "=", 6)], deletion_vectors=True)
    assert r2["rows_deleted"] == 1
    assert all(t[0] != 6 for t in _rows(spark, dst))
    assert any(t[0] == 6 for t in _rows(spark, src))


def test_shallow_clone_partitioned_layout_and_pruning(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(30)], "id int, part int, s string"
    )
    txlog.append(spark, df, src, partition_by=["part"])
    txlog.clone_table(spark, src, dst)
    assert _rows(spark, dst) == _rows(spark, src)
    got, rep = txlog.scan(spark, dst, where=[("part", "==", 1)])
    assert sorted(t["id"] for t in got.collect()) == [
        i for i in range(30) if i % 3 == 1
    ]
    # partition stats carried over: non-matching files never opened
    assert rep["files_scanned"] < rep["files_total"]


def test_clone_carries_constraints_without_revalidation_scan(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    txlog.add_constraint(spark, src, "v_nonneg", "v >= 0")
    rep = txlog.clone_table(spark, src, dst)
    assert rep["constraints"] == 1
    assert txlog.load_snapshot(dst).constraints == {"v_nonneg": "v >= 0"}
    with pytest.raises(Exception, match="v_nonneg"):
        txlog.append(
            spark,
            spark.createDataFrame(
                [(999, "bad", -1)], "id int, s string, v int"
            ),
            dst,
        )


def test_clone_carries_column_mapping_and_retired(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    txlog.rename_column(src, "s", "label")
    txlog.drop_column(src, "v")
    txlog.clone_table(spark, src, dst)
    assert _rows(spark, dst) == _rows(spark, src)
    assert txlog.load_snapshot(dst).retired == txlog.load_snapshot(src).retired
    # appends to the clone write under the frozen physical names and
    # read back merged with the external (renamed-era) files
    txlog.append(
        spark,
        spark.createDataFrame([(300, "z")], "id int, label string"),
        dst,
    )
    assert (300, "z") in _rows(spark, dst)


def test_clone_does_not_carry_txns(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    df = spark.createDataFrame([(1, "a", 1)], "id int, s string, v int")
    txlog.append(spark, df, src, txn=("app1", 7))
    assert txlog.load_snapshot(src).txns == {"app1": 7}
    txlog.clone_table(spark, src, dst)
    assert txlog.load_snapshot(dst).txns == {}


def test_deep_clone_is_self_contained(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    txlog.delete(spark, src, [("id", "=", 5)], deletion_vectors=True)
    expect = _rows(spark, src)
    rep = txlog.clone_table(spark, src, dst, deep=True)
    assert rep["mode"] == "deep"
    snap = txlog.load_snapshot(dst)
    assert all(not e.get("base") for e in snap.files.values())
    shutil.rmtree(src)  # the source vanishes entirely
    assert _rows(spark, dst) == expect


def test_chained_shallow_clone_keeps_original_base(spark, tmp_path):
    src, c1, c2 = _mk(tmp_path, "src"), _mk(tmp_path, "c1"), _mk(tmp_path, "c2")
    _build_src(spark, src)
    txlog.clone_table(spark, src, c1)
    txlog.clone_table(spark, c1, c2)
    assert _rows(spark, c2) == _rows(spark, src)
    snap = txlog.load_snapshot(c2)
    # files still point at the ORIGINAL root, not the middle clone
    assert all(e["base"] == os.path.abspath(src) for e in snap.files.values())


def test_clone_destination_must_be_new(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    txlog.clone_table(spark, src, dst)
    with pytest.raises(ValueError, match="already a txlog table"):
        txlog.clone_table(spark, src, dst)
    with pytest.raises(ValueError, match="same table"):
        txlog.clone_table(spark, src, src)


def test_vacuum_on_clone_never_touches_source(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    txlog.clone_table(spark, src, dst)
    # age out everything the clone itself could reclaim
    rep = txlog.vacuum(dst, keep_versions=1, min_age_seconds=0.0)
    assert rep["deleted"] == 0
    assert _rows(spark, dst) == _rows(spark, src)


def test_optimize_unshallows_the_clone(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    txlog.delete(spark, src, [("id", "=", 5)], deletion_vectors=True)
    txlog.clone_table(spark, src, dst)
    expect = _rows(spark, dst)
    txlog.optimize(spark, dst)
    snap = txlog.load_snapshot(dst)
    assert all(not e.get("base") for e in snap.files.values())
    assert all(not e.get("dv") for e in snap.files.values())  # masks folded
    shutil.rmtree(src)
    assert _rows(spark, dst) == expect


def test_clone_cdc_feed_emits_cloned_rows_as_inserts(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    df = spark.createDataFrame(
        [(i, i % 2, f"r{i}") for i in range(10)], "id int, part int, s string"
    )
    txlog.append(spark, df, src, partition_by=["part"])
    txlog.delete(spark, src, [("id", "=", 3)], deletion_vectors=True)
    txlog.clone_table(spark, src, dst)
    feed = txlog.read_row_changes(spark, dst, since_version=0)
    got = sorted(
        (t["id"], t["_change_type"]) for t in feed.collect()
    )
    assert got == [(i, "insert") for i in range(10) if i != 3]


def test_declarative_clone_verb(spark, tmp_path):
    from metadata_driven_data_pipeline_spark import orchestrate

    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    reports = orchestrate.run_table_maintenance(
        spark,
        [
            {
                "table": dst,
                "clone": {"source": src, "version": 2},
                "optimize": {},
            }
        ],
    )
    assert reports[0]["clone"]["mode"] == "shallow"
    assert _rows(spark, dst) == _rows(spark, src, version=2)
    # the same spec's optimize already un-shallowed the new table
    snap = txlog.load_snapshot(dst)
    assert all(not e.get("base") for e in snap.files.values())


def test_restore_on_clone_across_clone_commit(spark, tmp_path):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    txlog.clone_table(spark, src, dst)
    at_clone = _rows(spark, dst)
    txlog.delete(spark, dst, [("id", "<", 8)])
    assert _rows(spark, dst) != at_clone
    txlog.restore(spark, dst, 1)
    assert _rows(spark, dst) == at_clone


def test_clone_refuses_vacuumed_snapshot(spark, tmp_path):
    """A version-pinned clone past the source's vacuum horizon must
    raise instead of committing references to deleted files (the same
    guard restore() has)."""
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    txlog.append(
        spark, spark.createDataFrame([(1, "a", 1)], "id int, s string, v int"),
        src,
    )
    txlog.overwrite(
        spark, spark.createDataFrame([(2, "b", 2)], "id int, s string, v int"),
        src,
    )
    txlog.vacuum(src, keep_versions=1, min_age_seconds=0.0)
    with pytest.raises(ValueError, match="vacuumed"):
        txlog.clone_table(spark, src, dst, version=1)
    assert not os.path.isdir(os.path.join(dst, txlog.LOG_DIR))


def test_deep_clone_refuses_occupied_destination_before_copying(
    spark, tmp_path
):
    src, dst = _mk(tmp_path, "src"), _mk(tmp_path, "c")
    _build_src(spark, src)
    txlog.append(
        spark, spark.createDataFrame([(9, "z", 9)], "id int, s string, v int"),
        dst,
    )
    n_before = sum(len(fs) for _, _, fs in os.walk(dst))
    with pytest.raises(ValueError, match="already a txlog table"):
        txlog.clone_table(spark, src, dst, deep=True)
    # nothing was copied into the existing table's tree
    assert sum(len(fs) for _, _, fs in os.walk(dst)) == n_before
