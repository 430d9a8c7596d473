"""Reproduction benchmark of the reference's own workload (BASELINE.md
envelope): 100,000 3-field jsonl records in 3 serial batches with the
reference's error mix (~5% missing driver_age, ~5% empty plate, ages 17-80,
batch 3 re-ingesting 20% of batch-1 valid records), run end-to-end through
the rebuilt engine — schema-enforced read → add_fields → validate_fields
OK/KO split → json sinks → keep-latest consolidation — then re-run to
measure the idempotent no-op (watermark rejects all batches).

Prints ONE JSON line: {"metric": "motor_workload_e2e", "records": N,
"pipeline_sec": ..., "rerun_sec": ..., "ok": N, "ko": N, "consolidated": N}.

Usage: python tools/bench_motor.py [records_per_batch=33334]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from metadata_driven_data_pipeline_spark import get_spark
from metadata_driven_data_pipeline_spark.engine import Engine

from test_pipeline_e2e import generate_batches, motor_metadata


def main() -> None:
    per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 33334
    root = tempfile.mkdtemp(prefix="bench_motor_")
    try:
        t0 = time.time()
        dates = generate_batches(root, num_batches=3, records_per_batch=per_batch)
        gen_sec = round(time.time() - t0, 3)

        spark = get_spark()
        metadata = motor_metadata(root)
        manifest = f"{root}/state/manifest.json"

        t0 = time.time()
        Engine(
            spark, metadata, run_id="bench-run-1", manifest_path=manifest,
            pipeline_name="motor-policy",
        ).run()
        pipeline_sec = round(time.time() - t0, 3)

        t0 = time.time()
        Engine(
            spark, metadata, run_id="bench-run-2", manifest_path=manifest,
            pipeline_name="motor-policy",
        ).run()
        rerun_sec = round(time.time() - t0, 3)

        ok = spark.read.json(f"{root}/ok/batch-*/output/*.json").count()
        ko = spark.read.json(f"{root}/ko/batch-*/output/*.json").count()
        cons = spark.read.json(f"{root}/ok-consolidated/output/*.json").count()

        print(
            json.dumps(
                {
                    "metric": "motor_workload_e2e",
                    "records": 3 * per_batch,
                    "generate_sec": gen_sec,
                    "pipeline_sec": pipeline_sec,
                    "rerun_noop_sec": rerun_sec,
                    "ok": ok,
                    "ko": ko,
                    "consolidated": cons,
                }
            )
        )
        assert ok + ko == 3 * per_batch, "conservation violated"
        spark.stop()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
