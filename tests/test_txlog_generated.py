"""GENERATED columns (r11, the public Delta ``GENERATED ALWAYS AS``
shape; extension beyond the reference's surface).

Contract under test:
- ``create_table(generated={col: expr})`` records the recipes; a write
  batch that OMITS a generated column gets it computed in-plan (cast
  to the declared type) on append / overwrite / replace_where / merge;
- a batch that PROVIDES the column is enforced: creation auto-registers
  a ``gen_<col>`` CHECK constraint ``col <=> (expr)``, so a wrong
  explicit value fails the write loudly;
- the recipes survive checkpointing + log retention, overwrite, and
  ride along with clones;
- schema surgery on a referenced column is rejected (through the
  existing constraint-reference guard).
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from metadata_driven_data_pipeline_spark.sinks import txlog

DDL = "id INT, ts TIMESTAMP, event_date DATE"
GEN = {"event_date": "CAST(ts AS DATE)"}


def _mk(tmp_path, name):
    return os.path.join(str(tmp_path), name)


def _batch(spark, lo, hi, with_date=False, wrong=False):
    df = spark.createDataFrame(
        [(i, f"2024-06-{(i % 28) + 1:02d} 10:0{i % 6}:00") for i in range(lo, hi)],
        "id int, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    if with_date:
        d = F.to_date("ts") if not wrong else F.lit("1999-01-01").cast("date")
        df = df.withColumn("event_date", d)
    return df


def _create(root):
    return txlog.create_table(root, StructType.fromDDL(DDL), generated=GEN)


def test_generated_computed_when_omitted(spark, tmp_path):
    root = _mk(tmp_path, "t")
    _create(root)
    txlog.append(spark, _batch(spark, 0, 10), root)
    got = txlog.read_table(spark, root)
    assert got.columns == ["id", "ts", "event_date"]
    bad = got.filter(F.col("event_date") != F.to_date("ts")).count()
    assert bad == 0 and got.count() == 10


def test_generated_enforced_when_provided(spark, tmp_path):
    root = _mk(tmp_path, "t")
    _create(root)
    # correct explicit values pass
    txlog.append(spark, _batch(spark, 0, 5, with_date=True), root)
    assert txlog.read_table(spark, root).count() == 5
    # wrong explicit values violate gen_event_date in-plan
    with pytest.raises(Exception, match="gen_event_date"):
        txlog.append(
            spark, _batch(spark, 5, 8, with_date=True, wrong=True), root
        )
    assert txlog.read_table(spark, root).count() == 5


def test_generated_in_merge_and_replace_where(spark, tmp_path):
    root = _mk(tmp_path, "t")
    _create(root)
    txlog.merge(spark, _batch(spark, 0, 6), root, ["id"], order_col=None)
    got = txlog.read_table(spark, root)
    assert got.filter(F.col("event_date").isNull()).count() == 0
    # scoped backfill keyed on the GENERATED column, batch omits it
    day = got.select(F.min("event_date")).first()[0]
    repl = (
        txlog.read_table(spark, root)
        .filter(F.col("event_date") == F.lit(day))
        .select("id", "ts")
    )
    rep = txlog.replace_where(
        spark, repl, root, [("event_date", "==", str(day))]
    )
    assert rep["version"] > 0
    after = txlog.read_table(spark, root)
    assert after.count() == 6
    assert after.filter(F.col("event_date").isNull()).count() == 0


def test_generated_survives_checkpoint_and_retention(spark, tmp_path):
    root = _mk(tmp_path, "t")
    _create(root)
    for i in range(13):  # push past the checkpoint interval
        txlog.append(spark, _batch(spark, i, i + 1), root)
    txlog.cleanup_log(root, keep_versions=2)
    assert txlog.load_snapshot(root).generated == GEN
    txlog.append(spark, _batch(spark, 100, 102), root)
    got = txlog.read_table(spark, root)
    assert got.filter(F.col("event_date").isNull()).count() == 0


def test_generated_rides_clones(spark, tmp_path):
    root, c = _mk(tmp_path, "t"), _mk(tmp_path, "c")
    _create(root)
    txlog.append(spark, _batch(spark, 0, 4), root)
    txlog.clone_table(spark, root, c)
    assert txlog.load_snapshot(c).generated == GEN
    txlog.append(spark, _batch(spark, 4, 8), c)
    got = txlog.read_table(spark, c)
    assert got.count() == 8
    assert got.filter(F.col("event_date").isNull()).count() == 0


def test_generated_schema_surgery_rejected(spark, tmp_path):
    root = _mk(tmp_path, "t")
    _create(root)
    txlog.append(spark, _batch(spark, 0, 3), root)
    with pytest.raises(ValueError, match="gen_event_date"):
        txlog.rename_column(root, "ts", "stamp")
    with pytest.raises(ValueError, match="gen_event_date"):
        txlog.drop_column(root, "event_date")


def test_generated_unknown_column_raises(spark, tmp_path):
    root = _mk(tmp_path, "t")
    with pytest.raises(ValueError, match="not in schema"):
        txlog.create_table(
            root, StructType.fromDDL(DDL), generated={"nope": "id + 1"}
        )


def test_generated_survives_overwrite(spark, tmp_path):
    root = _mk(tmp_path, "t")
    _create(root)
    txlog.append(spark, _batch(spark, 0, 4), root)
    txlog.overwrite(spark, _batch(spark, 10, 14), root)
    assert txlog.load_snapshot(root).generated == GEN
    got = txlog.read_table(spark, root)
    assert sorted(t["id"] for t in got.collect()) == [10, 11, 12, 13]
    assert got.filter(F.col("event_date").isNull()).count() == 0


def test_commit_staged_validates_constraints_with_session(spark, tmp_path):
    """commit_staged (the writer-task protocol, called WITH a session)
    validates the staged files against the table's CHECK constraints
    before committing — a violation raises by constraint name and
    commits nothing."""
    import uuid

    root = _mk(tmp_path, "t")
    txlog.append(spark, spark.createDataFrame([(1, 5)], "id int, v int"), root)
    txlog.add_constraint(spark, root, "v_pos", "v > 0")

    def _stage(rows):
        data_dir = os.path.join(root, txlog.DATA_DIR)
        staging = os.path.join(str(tmp_path), f"stg-{uuid.uuid4().hex[:8]}")
        spark.createDataFrame(rows, "id int, v int").coalesce(1).write.parquet(
            staging
        )
        out = []
        for n in os.listdir(staging):
            if n.endswith(".parquet"):
                dst = os.path.join(data_dir, f"{uuid.uuid4().hex[:12]}-w.parquet")
                os.replace(os.path.join(staging, n), dst)
                out.append(dst)
        return out

    schema = txlog.load_snapshot(root).schema
    txlog.commit_staged(spark, root, _stage([(2, 7)]), schema)
    assert txlog.read_table(spark, root).count() == 2
    with pytest.raises(ValueError, match="v_pos"):
        txlog.commit_staged(spark, root, _stage([(3, -1)]), schema)
    assert txlog.read_table(spark, root).count() == 2


def test_datasource_writer_refuses_unvalidatable_constraints(spark, tmp_path):
    """The df.write.format('txlog') commit hook runs in a session-less
    Python worker where the staged files CANNOT be validated — on a
    table with CHECK constraints it must refuse loudly (the old
    behavior silently committed unvalidated rows), pointing writers at
    append()."""
    root = _mk(tmp_path, "t")
    txlog.append(spark, spark.createDataFrame([(1, 5)], "id int, v int"), root)
    txlog.add_constraint(spark, root, "v_pos", "v > 0")
    with pytest.raises(Exception, match="CHECK constraints"):
        spark.createDataFrame([(2, 7)], "id int, v int").write.format(
            "txlog"
        ).mode("append").save(root)
    assert txlog.read_table(spark, root).count() == 1
    # append() remains the enforced ingest path
    txlog.append(spark, spark.createDataFrame([(2, 7)], "id int, v int"), root)
    assert txlog.read_table(spark, root).count() == 2


def test_datasource_writer_generated_guard(spark, tmp_path):
    root = _mk(tmp_path, "t")
    _create(root)
    # omitting a generated column cannot be fixed post-staging: refused
    # before any constraint logic runs
    with pytest.raises(Exception, match="generated column"):
        _batch(spark, 0, 3).write.format("txlog").mode("append").save(root)
    assert txlog.read_table(spark, root).count() == 0
    txlog.append(spark, _batch(spark, 0, 3), root)
    assert txlog.read_table(spark, root).count() == 3


def test_declarative_create_table_with_generated(spark, tmp_path):
    from metadata_driven_data_pipeline_spark import orchestrate

    root = _mk(tmp_path, "t")
    reports = orchestrate.run_table_maintenance(
        spark,
        [{"table": root, "createTable": {"schema": DDL, "generated": GEN}}],
    )
    assert reports[0]["createTable"]["version"] == 1
    txlog.append(spark, _batch(spark, 0, 3), root)
    got = txlog.read_table(spark, root)
    assert got.filter(F.col("event_date").isNull()).count() == 0


def test_generated_lossy_cast_recipe(spark, tmp_path):
    """The auto-registered gen_<col> constraint compares under the
    DECLARED type's cast (the same cast _apply_generated writes with) —
    a recipe whose natural type differs lossily from the column type
    (an INT bucket from a division) must not fail its own constraint."""
    from pyspark.sql.types import StructType

    root = _mk(tmp_path, "lossy")
    txlog.create_table(
        root,
        StructType.fromDDL("k BIGINT, bucket INT"),
        generated={"bucket": "k / 7"},
    )
    txlog.append(
        spark, spark.createDataFrame([(i,) for i in range(20)], "k bigint"),
        root,
    )
    got = txlog.read_table(spark, root)
    assert got.count() == 20
    assert got.filter(
        F.col("bucket") != (F.col("k") / 7).cast("int")
    ).count() == 0


def test_commit_staged_txn_replay_skips_before_validation(spark, tmp_path):
    """An at-least-once replay of an already-committed txn batch must
    no-op BEFORE constraint validation — in particular, a session-less
    replay into a constrained table skips instead of refusing."""
    import uuid

    root = _mk(tmp_path, "replay")
    txlog.append(spark, spark.createDataFrame([(1, 5)], "id int, v int"), root)
    txlog.add_constraint(spark, root, "v_pos", "v > 0")
    schema = txlog.load_snapshot(root).schema

    def _stage(rows):
        data_dir = os.path.join(root, txlog.DATA_DIR)
        staging = os.path.join(str(tmp_path), f"stg-{uuid.uuid4().hex[:8]}")
        spark.createDataFrame(rows, "id int, v int").coalesce(1).write.parquet(
            staging
        )
        out = []
        for n in os.listdir(staging):
            if n.endswith(".parquet"):
                dst = os.path.join(
                    data_dir, f"{uuid.uuid4().hex[:12]}-w.parquet"
                )
                os.replace(os.path.join(staging, n), dst)
                out.append(dst)
        return out

    txlog.commit_staged(spark, root, _stage([(2, 7)]), schema, txn=("app", 1))
    assert txlog.read_table(spark, root).count() == 2
    # replay with NO session: must skip, not refuse on the constraints
    rep = txlog.commit_staged(
        None, root, _stage([(2, 7)]), schema, txn=("app", 1)
    )
    assert rep["skipped"] is True
    assert txlog.read_table(spark, root).count() == 2
