"""DAG-shaped orchestration (L4): gate ordering, gate failure blocking the
engine, shared run-log threading, and pytest-gate run-log hooks — the
rebuilt analog of the reference's Airflow DAG contract
(airflow/dags/motor_policy_pipeline_dag.py:154-162 chain;
tests/conftest.py:72-136 test-stage logging)."""

from __future__ import annotations

import json
import os
import textwrap

import pytest

from metadata_driven_data_pipeline_spark.orchestrate import (
    GateFailure,
    pytest_gate,
    run_dag,
)

from test_pipeline_e2e import generate_batches, motor_metadata


def _stages(doc):
    return [s["stage"] for s in doc["stages"]]


def test_dag_success_threads_one_log(spark, tmp_path):
    root = str(tmp_path)
    log_path = f"{root}/run_log.json"
    generate_batches(root, num_batches=1, records_per_batch=50)
    meta = motor_metadata(root)

    seen = []
    doc = run_dag(
        spark,
        meta,
        run_id="dagrun1",
        log_path=log_path,
        setup=lambda: seen.append("setup") or {"batches": 1},
        pre_gates=[
            ("input_exists",
             lambda: seen.append("pre") or os.path.isdir(f"{root}/input")),
        ],
        post_gates=[
            ("output_exists",
             lambda: seen.append("post") or {"ok_dirs": len(os.listdir(root))}),
        ],
    )
    # stage chain mirrors the reference DAG order
    assert _stages(doc) == [
        "init_run", "generate_data", "pre_pipeline_tests",
        "spark_pipeline", "post_pipeline_tests",
    ]
    assert doc["status"] == "success"
    assert doc["run_id"] == "dagrun1"
    assert seen == ["setup", "pre", "post"]  # gates ran in DAG order
    # persisted log equals the returned document
    with open(log_path) as f:
        assert json.load(f)["status"] == "success"


def test_failing_pre_gate_blocks_engine(spark, tmp_path):
    root = str(tmp_path)
    log_path = f"{root}/run_log.json"
    generate_batches(root, num_batches=1, records_per_batch=50)
    meta = motor_metadata(root)

    with pytest.raises(GateFailure) as exc:
        run_dag(
            spark,
            meta,
            run_id="dagrun2",
            log_path=log_path,
            pre_gates=[("always_red", lambda: False)],
        )
    assert exc.value.stage == "pre_pipeline_tests"

    with open(log_path) as f:
        doc = json.load(f)
    # engine never ran: no spark_pipeline stage, no sink output
    assert "spark_pipeline" not in _stages(doc)
    assert doc["status"] == "failed"
    assert not os.path.exists(f"{root}/output")
    red = doc["stages"][-1]
    assert red["stage"] == "pre_pipeline_tests"
    assert red["status"] == "failed"
    assert red["sub_stages"][-1]["status"] == "failed"


def test_failing_post_gate_marks_run_failed(spark, tmp_path):
    root = str(tmp_path)
    log_path = f"{root}/run_log.json"
    generate_batches(root, num_batches=1, records_per_batch=50)
    meta = motor_metadata(root)

    with pytest.raises(GateFailure):
        run_dag(
            spark,
            meta,
            run_id="dagrun3",
            log_path=log_path,
            post_gates=[("row_floor", lambda: False)],
        )
    with open(log_path) as f:
        doc = json.load(f)
    # the engine DID run (outputs exist) but the run is failed overall
    assert "spark_pipeline" in _stages(doc)
    assert doc["status"] == "failed"


def test_crashing_gate_is_failing_gate(spark, tmp_path):
    root = str(tmp_path)
    generate_batches(root, num_batches=1, records_per_batch=50)

    def boom():
        raise RuntimeError("gate exploded")

    with pytest.raises(GateFailure) as exc:
        run_dag(
            spark,
            motor_metadata(root),
            run_id="dagrun4",
            log_path=f"{root}/run_log.json",
            pre_gates=[("boom", boom)],
        )
    assert "gate exploded" in str(exc.value)


def test_pytest_gate_appends_test_stage(tmp_path):
    """A pytest subprocess gate appends its stage to the shared log via the
    conftest session hooks and finalizes on FINALIZE_LOG (reference
    conftest.py:125-136)."""
    root = str(tmp_path)
    log_path = f"{root}/run_log.json"
    # seed a log document as init_run would
    from metadata_driven_data_pipeline_spark.runlog import RunLog

    log = RunLog("gaterun")
    s = log.start_stage("init_run")
    log.end_stage(s, "success")
    log.save(log_path)

    # a tiny spark-free test tree whose conftest delegates to the hooks
    testdir = tmp_path / "gate_tests"
    testdir.mkdir()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    (testdir / "conftest.py").write_text(textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {repo_root!r})
        from metadata_driven_data_pipeline_spark.orchestrate import (
            runlog_sessionstart, runlog_sessionfinish,
        )

        def pytest_sessionstart(session):
            runlog_sessionstart(session)

        def pytest_sessionfinish(session, exitstatus):
            runlog_sessionfinish(session, exitstatus)
    """))
    (testdir / "test_green.py").write_text("def test_ok():\n    assert True\n")

    gate = pytest_gate(
        [str(testdir / "test_green.py")],
        run_id="gaterun",
        log_path=log_path,
        stage_name="post_pipeline_tests",
        finalize=True,
    )
    result = gate()
    assert result["pytest_exit"] == 0

    with open(log_path) as f:
        doc = json.load(f)
    assert [st["stage"] for st in doc["stages"]] == [
        "init_run", "post_pipeline_tests"
    ]
    assert doc["stages"][-1]["status"] == "success"
    assert doc["stages"][-1]["sub_stages"][-1]["test_result"] == "all_passed"
    assert doc["status"] == "success"  # FINALIZE_LOG finalized the whole log


def test_pytest_gate_red_suite_fails_and_finalizes_failed(tmp_path):
    root = str(tmp_path)
    log_path = f"{root}/run_log.json"
    from metadata_driven_data_pipeline_spark.runlog import RunLog

    log = RunLog("gaterun2")
    s = log.start_stage("init_run")
    log.end_stage(s, "success")
    log.save(log_path)

    testdir = tmp_path / "gate_tests"
    testdir.mkdir()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    (testdir / "conftest.py").write_text(textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {repo_root!r})
        from metadata_driven_data_pipeline_spark.orchestrate import (
            runlog_sessionstart, runlog_sessionfinish,
        )

        def pytest_sessionstart(session):
            runlog_sessionstart(session)

        def pytest_sessionfinish(session, exitstatus):
            runlog_sessionfinish(session, exitstatus)
    """))
    (testdir / "test_red.py").write_text("def test_no():\n    assert False\n")

    gate = pytest_gate(
        [str(testdir / "test_red.py")],
        run_id="gaterun2",
        log_path=log_path,
        stage_name="post_pipeline_tests",
        finalize=True,
    )
    with pytest.raises(GateFailure):
        gate()
    with open(log_path) as f:
        doc = json.load(f)
    assert doc["stages"][-1]["status"] == "failed"
    assert doc["status"] == "failed"


def _gate_testdir(tmp_path, name, body):
    testdir = tmp_path / name
    testdir.mkdir()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    (testdir / "conftest.py").write_text(textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {repo_root!r})
        from metadata_driven_data_pipeline_spark.orchestrate import (
            runlog_sessionstart, runlog_sessionfinish,
        )

        def pytest_sessionstart(session):
            runlog_sessionstart(session)

        def pytest_sessionfinish(session, exitstatus):
            runlog_sessionfinish(session, exitstatus)
    """))
    (testdir / "test_gate.py").write_text(body)
    return testdir


def test_pytest_gate_stage_survives_run_dag_flushes(spark, tmp_path):
    """ADVICE r2 (orchestrate.py run_dag/_flush): a stage the pytest-gate
    SUBPROCESS appends to the shared log file must not be clobbered by
    run_dag's next in-memory flush — _adopt_external_stages folds it back
    into the DAG document."""
    root = str(tmp_path)
    log_path = f"{root}/run_log.json"
    generate_batches(root, num_batches=1, records_per_batch=50)
    meta = motor_metadata(root)
    testdir = _gate_testdir(
        tmp_path, "gate_tests", "def test_ok():\n    assert True\n"
    )

    doc = run_dag(
        spark,
        meta,
        run_id="dagrun5",
        log_path=log_path,
        pre_gates=[
            (
                "pre_suite",
                pytest_gate(
                    [str(testdir / "test_gate.py")],
                    run_id="dagrun5",
                    log_path=log_path,
                    stage_name="pre_pipeline_tests.pytest",
                ),
            ),
        ],
    )
    with open(log_path) as f:
        persisted = json.load(f)
    # the subprocess-appended stage survived every later flush, in both the
    # returned document and the persisted file
    for d in (doc, persisted):
        assert "pre_pipeline_tests.pytest" in _stages(d)
        assert "spark_pipeline" in _stages(d)
        assert d["status"] == "success"
    sub = [
        s for s in persisted["stages"]
        if s["stage"] == "pre_pipeline_tests.pytest"
    ][0]
    assert sub["sub_stages"][-1]["test_result"] == "all_passed"
    # stages remain chronologically ordered after the merge
    starts = [s["started_at"] for s in persisted["stages"]]
    assert starts == sorted(starts)


def test_failed_gate_stage_records_sub_stage(spark, tmp_path):
    """ADVICE r2: when a gate raises GateFailure the failed stage must not
    be empty — the failing gate is recorded as a sub_stage."""
    root = str(tmp_path)
    log_path = f"{root}/run_log.json"
    generate_batches(root, num_batches=1, records_per_batch=50)
    testdir = _gate_testdir(
        tmp_path, "gate_tests_red", "def test_no():\n    assert False\n"
    )

    with pytest.raises(GateFailure):
        run_dag(
            spark,
            motor_metadata(root),
            run_id="dagrun6",
            log_path=log_path,
            pre_gates=[
                (
                    "pre_suite",
                    pytest_gate(
                        [str(testdir / "test_gate.py")],
                        run_id="dagrun6",
                        log_path=log_path,
                        stage_name="pre_pipeline_tests.pytest",
                    ),
                ),
            ],
        )
    with open(log_path) as f:
        doc = json.load(f)
    dag_stage = [
        s for s in doc["stages"] if s["stage"] == "pre_pipeline_tests"
    ][0]
    assert dag_stage["status"] == "failed"
    assert dag_stage["sub_stages"], "failed gate stage must record the gate"
    assert dag_stage["sub_stages"][-1]["name"] == "pre_suite"
    assert dag_stage["sub_stages"][-1]["status"] == "failed"
    # the subprocess's own failed test stage also survived the final flush
    assert "pre_pipeline_tests.pytest" in _stages(doc)


def test_dag_cli_runbook_end_to_end(tmp_path):
    """The examples/dag_motor.json runbook drives the full gated lifecycle
    from the CLI (subprocess, own SparkSession): a red pre-gate (missing
    input dir) blocks the engine with exit 1; after generating input, the
    run succeeds with the full stage chain in the shared run log."""
    import subprocess
    import sys as _sys

    root = str(tmp_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, DATA_ROOT=root)

    def run_cli():
        return subprocess.run(
            [_sys.executable, "-m", "metadata_driven_data_pipeline_spark",
             "--dag", "examples/dag_motor.json"],
            cwd=repo, env=env, capture_output=True, text=True,
        )

    # 1. no input yet -> pre-gate red, engine blocked
    proc = run_cli()
    assert proc.returncode == 1, proc.stdout + proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["status"] == "failed"
    assert out["failed_stage"] == "pre_pipeline_tests"
    assert out["failed_gate"] == "input_exists"
    with open(f"{root}/run_log.json") as f:
        doc = json.load(f)
    assert "spark_pipeline" not in _stages(doc)
    assert not os.path.exists(f"{root}/ok-consolidated")

    # 2. generate batches -> green end-to-end with post-gate satisfied
    generate_batches(root, num_batches=1, records_per_batch=50)
    proc = run_cli()
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["status"] == "success"
    assert "spark_pipeline" in out["stages"]
    with open(f"{root}/run_log.json") as f:
        doc = json.load(f)
    assert _stages(doc) == [
        "init_run", "pre_pipeline_tests", "spark_pipeline",
        "post_pipeline_tests",
    ]
    assert doc["status"] == "success"


def test_dag_table_maintenance_stage(spark, tmp_path):
    """Declarative txlog maintenance as the final DAG stage: retention
    delete -> optimize compaction -> vacuum, each an atomic commit, all
    reported into one table_maintenance run-log stage."""
    from metadata_driven_data_pipeline_spark.sinks import txlog

    root = str(tmp_path)
    log_path = f"{root}/run_log.json"
    generate_batches(root, num_batches=1, records_per_batch=50)
    meta = motor_metadata(root)

    table = f"{root}/events_table"
    for lo in (0, 100, 200):
        txlog.append(
            spark,
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(lo, lo + 100)], "k int, v string"
            ).coalesce(1),
            table,
        )

    doc = run_dag(
        spark,
        meta,
        run_id="dagmaint1",
        log_path=log_path,
        maintenance=[
            {
                "table": table,
                "delete": {"where": [["k", "<", 100]]},
                "optimize": {"targetBytes": 1 << 30},
                "vacuum": {"keepVersions": 1, "minAgeSeconds": 0},
            }
        ],
    )
    assert doc["status"] == "success"
    assert _stages(doc)[-1] == "table_maintenance"
    stage = doc["stages"][-1]
    sub = stage["sub_stages"][0]
    assert sub["name"] == table and sub["status"] == "success"
    assert sub["delete"]["rows_deleted"] == 100
    assert sub["delete"]["files_dropped"] == 1
    assert sub["optimize"]["files_before"] == 2
    assert sub["vacuum"]["deleted"] >= 2  # pre-optimize files reclaimed
    got = txlog.read_table(spark, table)
    assert got.count() == 200
    assert [h["op"] for h in txlog.history(table)] == [
        "append", "append", "append", "delete", "optimize",
    ]


def test_dag_maintenance_failure_fails_the_run(spark, tmp_path):
    """A failing spec fails the run, names the failing table, and keeps
    the reports of specs that already ran (vacuum is irreversible — the
    audit trail must survive the error)."""
    from metadata_driven_data_pipeline_spark.orchestrate import (
        MaintenanceFailure,
    )
    from metadata_driven_data_pipeline_spark.sinks import txlog

    root = str(tmp_path)
    generate_batches(root, num_batches=1, records_per_batch=50)
    meta = motor_metadata(root)
    good = f"{root}/good_table"
    txlog.append(
        spark,
        spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1),
        good,
    )
    with pytest.raises(MaintenanceFailure, match="not a txlog table"):
        run_dag(
            spark,
            meta,
            run_id="dagmaint2",
            log_path=f"{root}/run_log.json",
            maintenance=[
                {"table": good, "optimize": {"targetBytes": 1 << 30}},
                {"table": f"{root}/missing", "delete": {"where": [["k", "<", 1]]}},
            ],
        )
    with open(f"{root}/run_log.json") as f:
        doc = json.load(f)
    assert doc["status"] == "failed"
    assert _stages(doc)[-1] == "table_maintenance"
    subs = doc["stages"][-1]["sub_stages"]
    # completed spec's report survives; failed sub names the bad table
    assert subs[0]["name"] == good and subs[0]["status"] == "success"
    assert subs[0]["optimize"]["files_before"] == 1
    assert subs[1]["name"] == f"{root}/missing" and subs[1]["status"] == "failed"


def test_dag_maintenance_restore_spec(spark, tmp_path):
    from metadata_driven_data_pipeline_spark.orchestrate import (
        run_table_maintenance,
    )
    from metadata_driven_data_pipeline_spark.sinks import txlog

    table = str(tmp_path / "t")
    txlog.append(
        spark,
        spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1),
        table,
    )
    txlog.overwrite(
        spark,
        spark.createDataFrame([(9, "bad")], "k int, v string").coalesce(1),
        table,
    )
    reports = run_table_maintenance(
        spark, [{"table": table, "restore": {"version": 1}}]
    )
    assert reports[0]["restore"]["restored_to"] == 1
    assert [tuple(r) for r in txlog.read_table(spark, table).collect()] == [
        (1, "a")
    ]


def test_dag_maintenance_deletion_vectors_spec(spark, tmp_path):
    """r8: the declarative delete spec's deletionVectors flag routes the
    purge through the mask lane — zero data files rewritten."""
    import os

    from metadata_driven_data_pipeline_spark.orchestrate import (
        run_table_maintenance,
    )
    from metadata_driven_data_pipeline_spark.sinks import txlog

    table = str(tmp_path / "t")
    txlog.append(
        spark,
        spark.range(0, 100).selectExpr("id", "id % 3 as k").coalesce(1),
        table,
    )
    mt0 = {
        p: os.path.getmtime(os.path.join(table, p))
        for p in txlog.load_snapshot(table).files
    }
    reports = run_table_maintenance(
        spark,
        [
            {
                "table": table,
                "delete": {
                    "where": [["id", ">=", 10], ["id", "<", 13]],
                    "deletionVectors": True,
                },
            }
        ],
    )
    rep = reports[0]["delete"]
    assert rep["rows_deleted"] == 3
    assert rep["files_rewritten"] == 0 and rep["files_masked"] == 1
    mt1 = {
        p: os.path.getmtime(os.path.join(table, p))
        for p in txlog.load_snapshot(table).files
    }
    assert mt1 == mt0
    assert txlog.read_table(spark, table).count() == 97
