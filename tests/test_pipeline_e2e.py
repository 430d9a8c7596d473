"""End-to-end pipeline contract tests: a reproduction of the reference's
motor-policy workload (FIXTURES.md §A; reference generate_sample_data.py +
config/metadata_motor.json) run through the rebuilt engine on local files,
asserting the §5 invariants: conservation OK+KO=input, OK⊨rules / KO⊭rules
with error provenance, schema contract of the split, watermark idempotency,
key-uniqueness after consolidation."""

import json
import os
import random

import pytest

from metadata_driven_data_pipeline_spark.engine import Engine


def generate_batches(root: str, num_batches=3, records_per_batch=500, seed=42):
    """Seeded generator mirroring the reference's edge-case mix
    (generate_sample_data.py:20-114): ~5%% missing driver_age, ~5%% empty
    plate, ages 17-80 (17 ⇒ minValue KO), batch 3 reuses 20%% of batch-1
    valid records (cross-batch duplicates)."""
    rng = random.Random(seed)
    dates = [f"2025-12-{d:02d}" for d in range(1, num_batches + 1)]
    batch1_valid = []
    seq = 0
    for bi, date in enumerate(dates):
        records = []
        if bi == 2 and batch1_valid:
            reuse = batch1_valid[: int(0.2 * records_per_batch)]
            records.extend(reuse)
        while len(records) < records_per_batch:
            seq += 1
            rec = {"policy_number": f"{seq:05d}"}
            if rng.random() >= 0.05:
                rec["driver_age"] = rng.randint(17, 80)
            plate = (
                ""
                if rng.random() < 0.05
                else "".join(rng.choices("ABCDEFGHIJKLMNOPQRSTUVWXYZ", k=3))
                + "-"
                + "".join(rng.choices("0123456789", k=3))
            )
            rec["plate_number"] = plate
            records.append(rec)
            if bi == 0 and rec.get("driver_age", 0) >= 18 and plate:
                batch1_valid.append(rec)
        os.makedirs(f"{root}/input/batch-{date}", exist_ok=True)
        with open(f"{root}/input/batch-{date}/input_1.jsonl", "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
    return dates


def motor_metadata(root: str) -> dict:
    """The reference's dataflow (config/metadata_motor.json) on local paths."""
    return {
        "processing_mode": "incremental",
        "batch_config": {
            "input_pattern": f"{root}/input/batch-{{date}}/input*.jsonl",
            "date_format": "%Y-%m-%d",
        },
        "dataflows": [
            {
                "name": "motor-ingestion",
                "sources": [
                    {
                        "name": "policy_inputs",
                        "path": f"{root}/input/batch-{{date}}/input*.jsonl",
                        "format": "json",
                        "required": True,
                        "schema": {
                            "type": "struct",
                            "fields": [
                                {"name": "policy_number", "type": "string", "nullable": False},
                                {"name": "driver_age", "type": "integer", "nullable": True},
                                {"name": "plate_number", "type": "string", "nullable": False},
                            ],
                        },
                        "schema_enforcement": {"enabled": True},
                        "options": {"multiLine": False},
                    }
                ],
                "transformations": [
                    {
                        "name": "add_batch_metadata",
                        "type": "add_fields",
                        "params": {
                            "input": "policy_inputs",
                            "addFields": [
                                {"name": "source_batch", "function": "batch_id"},
                                {"name": "batch_date", "function": "batch_date"},
                                {"name": "processed_run_id", "function": "run_id"},
                            ],
                        },
                    },
                    {
                        "name": "validation",
                        "type": "validate_fields",
                        "params": {
                            "input": "add_batch_metadata",
                            "validations": [
                                {
                                    "field": "plate_number",
                                    "rules": [
                                        "notNull",
                                        "notEmpty",
                                        {"name": "regex", "params": "^[A-Z0-9-]+$"},
                                    ],
                                },
                                {
                                    "field": "driver_age",
                                    "rules": ["notNull", {"name": "minValue", "params": 18}],
                                },
                                {"field": "policy_number", "rules": ["notNull"]},
                            ],
                        },
                    },
                    {
                        "name": "add_ingestion_dt_ok",
                        "type": "add_fields",
                        "params": {
                            "input": "validation_ok",
                            "addFields": [{"name": "ingestion_dt", "function": "current_timestamp"}],
                        },
                    },
                    {
                        "name": "add_ingestion_dt_ko",
                        "type": "add_fields",
                        "params": {
                            "input": "validation_ko",
                            "addFields": [{"name": "ingestion_dt", "function": "current_timestamp"}],
                        },
                    },
                ],
                "sinks": [
                    {
                        "input": "add_ingestion_dt_ok",
                        "name": "raw-ok",
                        "path": f"{root}/ok/batch-{{date}}/output",
                        "format": "json",
                        "saveMode": "overwrite",
                    },
                    {
                        "input": "add_ingestion_dt_ko",
                        "name": "raw-ko",
                        "path": f"{root}/ko/batch-{{date}}/output",
                        "format": "json",
                        "saveMode": "overwrite",
                    },
                ],
            }
        ],
        "consolidation": {
            "enabled": True,
            "ok_records": {
                "input_pattern": f"{root}/ok/batch-*/output/*.json",
                "output_path": f"{root}/ok-consolidated/output",
                "deduplication": {
                    "enabled": True,
                    "key_column": "policy_number",
                    "order_by": "batch_date",
                    "order_direction": "DESC",
                },
            },
        },
    }


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    dates = generate_batches(root)
    metadata = motor_metadata(root)
    manifest_path = f"{root}/state/manifest.json"
    engine = Engine(
        spark, metadata, run_id="test-run-1", manifest_path=manifest_path,
        pipeline_name="motor-policy",
    )
    log = engine.run()
    return {"root": root, "dates": dates, "metadata": metadata,
            "manifest_path": manifest_path, "log": log}


def read_out(spark, root, kind):
    return spark.read.json(f"{root}/{kind}/batch-*/output/*.json")


class TestOutputCompleteness:
    """Parity: tests/test_post_pipeline_outputs.py."""

    def test_ok_and_ko_nonempty(self, spark, pipeline_run):
        root = pipeline_run["root"]
        assert read_out(spark, root, "ok").count() > 0
        assert read_out(spark, root, "ko").count() > 0

    def test_conservation_input_equals_ok_plus_ko(self, spark, pipeline_run):
        root = pipeline_run["root"]
        inputs = spark.read.json(f"{root}/input/batch-*/input*.jsonl")
        ok = read_out(spark, root, "ok")
        ko = read_out(spark, root, "ko")
        assert inputs.count() == ok.count() + ko.count()

    def test_schema_contract(self, spark, pipeline_run):
        root = pipeline_run["root"]
        ok, ko = read_out(spark, root, "ok"), read_out(spark, root, "ko")
        assert "validation_errors" not in ok.columns
        assert "validation_errors" in ko.columns
        for col in ("policy_number", "ingestion_dt", "source_batch", "batch_date", "processed_run_id"):
            assert col in ok.columns and col in ko.columns

    def test_consolidated_key_distinct(self, spark, pipeline_run):
        root = pipeline_run["root"]
        cons = spark.read.json(f"{root}/ok-consolidated/output/*.json")
        assert cons.count() == cons.select("policy_number").distinct().count()
        assert cons.count() > 0

    def test_consolidation_removed_cross_batch_dups(self, spark, pipeline_run):
        root = pipeline_run["root"]
        ok = read_out(spark, root, "ok")
        cons = spark.read.json(f"{root}/ok-consolidated/output/*.json")
        assert cons.count() == ok.select("policy_number").distinct().count()
        assert cons.count() < ok.count()  # batch-3 reuse created dups


class TestDataIntegrity:
    """Parity: tests/test_post_pipeline_data_integrity.py."""

    def test_ok_rows_satisfy_all_rules(self, spark, pipeline_run):
        ok = read_out(spark, pipeline_run["root"], "ok")
        assert ok.filter("policy_number IS NULL").count() == 0
        assert ok.filter("driver_age IS NULL OR driver_age < 18").count() == 0
        assert ok.filter(
            "plate_number IS NULL OR trim(plate_number) = '' "
            "OR NOT regexp_like(plate_number, '^[A-Z0-9-]+$')"
        ).count() == 0

    def test_ok_batch_columns_valid(self, spark, pipeline_run):
        ok = read_out(spark, pipeline_run["root"], "ok")
        assert ok.filter("source_batch IS NULL OR batch_date IS NULL OR processed_run_id IS NULL").count() == 0
        assert ok.filter("CAST(batch_date AS date) IS NULL").count() == 0
        assert ok.filter("CAST(ingestion_dt AS timestamp) IS NULL").count() == 0

    def test_ko_rows_carry_error_provenance(self, spark, pipeline_run):
        ko = read_out(spark, pipeline_run["root"], "ko")
        assert ko.filter("validation_errors IS NULL").count() == 0
        # error fields ⊆ validated fields (post-JSON round trip: struct)
        err_fields = {
            f.name for f in ko.schema["validation_errors"].dataType.fields
        }
        assert err_fields <= {"plate_number", "driver_age", "policy_number"}


class TestIncrementalSemantics:
    def test_manifest_watermark(self, pipeline_run):
        with open(pipeline_run["manifest_path"]) as f:
            manifest = json.load(f)
        assert manifest["last_processed_batch"] == pipeline_run["dates"][-1]
        assert manifest["total_batches_processed"] == len(pipeline_run["dates"])

    def test_rerun_is_idempotent(self, spark, pipeline_run):
        """Strictly-greater-than watermark rejects already-processed batches
        (runner.py:80-93)."""
        engine = Engine(
            spark,
            pipeline_run["metadata"],
            run_id="test-run-2",
            manifest_path=pipeline_run["manifest_path"],
            pipeline_name="motor-policy",
        )
        engine.run()
        with open(pipeline_run["manifest_path"]) as f:
            manifest = json.load(f)
        # unchanged: no batch re-processed
        assert manifest["last_success_run_id"] == "test-run-1"
        assert manifest["total_batches_processed"] == len(pipeline_run["dates"])

    def test_run_log_structure(self, pipeline_run):
        log = pipeline_run["log"]
        assert log["status"] == "success"
        stage = log["stages"][0]
        types = {s["stage_type"] for s in stage["sub_stages"]}
        assert {"source", "transformation", "sink", "consolidation"} <= types
        sinks = [s for s in stage["sub_stages"] if s["stage_type"] == "sink"]
        assert all(s["records_written"] >= 0 for s in sinks)
        assert sum(s["records_written"] for s in sinks) == 1500


class TestSourceSemantics:
    def test_optional_source_skip(self, spark, tmp_path):
        """required:false + missing path → skipped, pipeline continues
        (runner.py:251-266)."""
        root = str(tmp_path)
        meta = {
            "processing_mode": "full",
            "dataflows": [
                {
                    "name": "opt",
                    "sources": [
                        {
                            "name": "missing_src",
                            "path": f"{root}/nope/*.json",
                            "format": "json",
                            "required": False,
                        }
                    ],
                    "transformations": [],
                    "sinks": [],
                }
            ],
        }
        log = Engine(spark, meta, run_id="r").run()
        sub = log["stages"][0]["sub_stages"][0]
        assert sub["status"] == "skipped"

    def test_required_source_fails_pipeline(self, spark, tmp_path):
        meta = {
            "processing_mode": "full",
            "dataflows": [
                {
                    "name": "req",
                    "sources": [
                        {
                            "name": "missing_src",
                            "path": f"{tmp_path}/nope/*.json",
                            "format": "json",
                            "required": True,
                        }
                    ],
                    "transformations": [],
                    "sinks": [],
                }
            ],
        }
        with pytest.raises(Exception):
            Engine(spark, meta, run_id="r").run()


class TestCompileTimeValidation:
    def test_missing_input_ref_is_compile_error(self, spark):
        meta = {
            "processing_mode": "full",
            "dataflows": [
                {
                    "name": "bad",
                    "sources": [{"name": "s", "path": "/tmp/x.json"}],
                    "transformations": [
                        {
                            "name": "t",
                            "type": "filter",
                            "params": {"input": "does_not_exist", "condition": "1=1"},
                        }
                    ],
                    "sinks": [],
                }
            ],
        }
        with pytest.raises(ValueError, match="unknown input"):
            Engine(spark, meta)

    def test_unsupported_transform_type(self, spark):
        meta = {
            "processing_mode": "full",
            "dataflows": [
                {
                    "name": "bad",
                    "sources": [{"name": "s", "path": "/tmp/x.json"}],
                    "transformations": [
                        {"name": "t", "type": "teleport", "params": {"input": "s"}}
                    ],
                    "sinks": [],
                }
            ],
        }
        with pytest.raises(ValueError, match="unsupported transformation type"):
            Engine(spark, meta)
