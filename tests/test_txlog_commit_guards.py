"""Commit-time guards for transaction-log tables (r8, ADVICE r7):

- append() detects column-mapping drift between staging and commit (a
  concurrent overwrite resets mapping history) and RE-STAGES instead of
  committing files whose in-file names read back as NULL;
- commit_staged() (the DataSource-writer path — executor files cannot
  be re-staged) RAISES on the same drift;
- restore() restores the target snapshot's RETIRED set (replace, not
  union), closing the drop→overwrite→restore physical-name leak;
- partition_by validates the PHYSICAL directory names, not just the
  logical ones (a column born '_x' renamed to 'x' must still refuse).
"""

from __future__ import annotations

import os

import pytest

from metadata_driven_data_pipeline_spark.sinks import txlog


def _mk(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_restages_on_concurrent_overwrite_mapping_reset(
    spark, tmp_path, monkeypatch
):
    """overwrite() landing between append's staging and its claim resets
    column-mapping history; the append must detect the drift and
    re-stage under the new (identity) mapping — without the guard the
    renamed column reads back as silent NULLs from the appended files
    (ADVICE r7 #1, medium)."""
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)  # v1: cols k, v
    txlog.rename_column(root, "v", "value")  # v2: mapping value→v

    real_claim = txlog._try_claim
    fired = {}

    def claim_with_race(r, version, payload):
        if not fired and payload.get("op") == "append":
            fired["x"] = True
            # the concurrent overwrite wins this version: new generation
            # under logical names, mapping history reset
            txlog.overwrite(
                spark, _mk(spark, [(9, "z")], "k int, value string"), root
            )
            return False  # our claim lost the race
        return real_claim(r, version, payload)

    monkeypatch.setattr(txlog, "_try_claim", claim_with_race)
    txlog.append(spark, _mk(spark, [(2, "b")], "k int, value string"), root)
    monkeypatch.undo()

    got = txlog.read_table(spark, root)
    assert _rows(got) == [(2, "b"), (9, "z")]  # 'value' is NOT NULL
    # the re-staged file stores the column under its post-reset physical
    # name ('value', identity), matching the table's mapping
    snap = txlog.load_snapshot(root)
    import pyarrow.parquet as pq

    newest = [p for p in snap.file_paths()]
    names = {
        n for p in newest for n in pq.ParquetFile(p).schema_arrow.names
    }
    assert names == {"k", "value"}


def test_commit_staged_raises_on_mapping_drift(spark, tmp_path):
    """The DataSource writer stages executor files under the mapping it
    saw at job start; a concurrent overwrite resetting that mapping
    before the driver-side commit must RAISE (tasks are done — no
    re-stage possible), never commit wrong-named files."""
    root = str(tmp_path / "t")
    txlog.append(spark, _mk(spark, [(1, "a")]), root)
    txlog.rename_column(root, "v", "value")  # mapping value→v
    staged_phys = {"value": "v"}  # what a writer would stage under now

    # stage one file under the OLD physical names, the writer-task way
    import pyarrow as pa
    import pyarrow.parquet as pq

    data_dir = os.path.join(root, txlog.DATA_DIR)
    staged = os.path.join(data_dir, "deadbeef0000-w.parquet")
    pq.write_table(
        pa.table({"k": pa.array([2], pa.int32()), "v": ["b"]}), staged
    )

    # concurrent overwrite resets column-mapping history
    txlog.overwrite(spark, _mk(spark, [(9, "z")], "k int, value string"), root)

    schema = txlog.load_snapshot(root).schema
    with pytest.raises(ValueError, match="column-mapping changed"):
        txlog.commit_staged(
            spark, root, [staged], schema, staged_phys=staged_phys
        )


def test_restore_restores_retired_set(spark, tmp_path):
    """drop_column retires a physical name; overwrite resets the retired
    set; restore BELOW the overwrite brings the dropped column's files
    back to life, so the retired set must come back with them — or a
    merge_schema append could mint a column over historic bytes
    (ADVICE r7 #2, medium)."""
    root = str(tmp_path / "t")
    txlog.append(
        spark, _mk(spark, [(1, "a", "W")], "k int, v string, w string"), root
    )  # v1
    txlog.drop_column(root, "w")  # v2: retires 'w'
    assert txlog.load_snapshot(root).retired == {"w"}
    txlog.overwrite(spark, _mk(spark, [(9, "z")]), root)  # v3: reset
    assert txlog.load_snapshot(root).retired == set()

    txlog.restore(spark, root, 2)  # v4: v1's file live again, w dropped
    snap = txlog.load_snapshot(root)
    assert snap.retired == {"w"}, "restore must carry the target's retired set"
    with pytest.raises(ValueError, match="physically"):
        txlog.append(
            spark,
            _mk(spark, [(3, "c", "X")], "k int, v string, w string"),
            root,
            merge_schema=True,
        )

    # the inverse: restoring ABOVE the drop (w back in the schema)
    # un-retires it
    txlog.restore(spark, root, 1)
    snap = txlog.load_snapshot(root)
    assert snap.retired == set()
    assert "w" in snap.schema.fieldNames()
    assert _rows(txlog.read_table(spark, root)) == [(1, "a", "W")]


def test_partition_by_validates_physical_names(spark, tmp_path):
    """A column born '_x' (hidden-prefix physical name frozen at birth)
    then renamed to 'x' would stage _x=... directories Spark's own path
    listing skips — the validation must check the PHYSICAL name and
    name the logical→physical pair in the error (ADVICE r7 #3)."""
    root = str(tmp_path / "t")
    txlog.append(
        spark, _mk(spark, [(1, 2)], "k int, `_x` int"), root
    )
    txlog.rename_column(root, "_x", "x")
    with pytest.raises(ValueError, match=r"'x'.*physical.*'_x'"):
        txlog.append(
            spark,
            _mk(spark, [(2, 3)], "k int, x int"),
            root,
            partition_by=["x"],
        )
