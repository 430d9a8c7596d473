"""CLI entry point: run a metadata document end-to-end.

Mirrors the reference's spark-submit invocation
(``airflow/dags/motor_policy_pipeline_dag.py:99-126`` builds
``spark-submit ... run_pipeline.py`` with RUN_ID in the environment):

    python -m metadata_driven_data_pipeline_spark \
        --metadata config/metadata.json \
        [--run-id RUN] [--manifest state/manifest.json] \
        [--pipeline-name NAME] [--log-out run_log.json]

Exit code 0 on success; non-zero with the failure recorded in the run log.
"""

from __future__ import annotations

import argparse
import json
import sys

from metadata_driven_data_pipeline_spark.config import load_metadata
from metadata_driven_data_pipeline_spark.engine import Engine
from metadata_driven_data_pipeline_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="metadata_driven_data_pipeline_spark")
    p.add_argument("--metadata", required=True, help="metadata JSON path")
    p.add_argument("--run-id", default=None)
    p.add_argument("--manifest", default=None, help="manifest JSON path (high watermark)")
    p.add_argument("--pipeline-name", default="pipeline")
    p.add_argument("--log-out", default=None, help="write the structured run log here")
    args = p.parse_args(argv)

    # load_metadata applies ${VAR} environment substitution (parity:
    # config_loader.py's expandvars), so paths can be parameterized.
    metadata = load_metadata(args.metadata)

    spark = get_spark(app_name=args.pipeline_name)
    try:
        engine = Engine(
            spark,
            metadata,
            run_id=args.run_id,
            manifest_path=args.manifest,
            pipeline_name=args.pipeline_name,
        )
        try:
            log = engine.run()
            status = 0
        except Exception:
            log = engine.log.doc  # finalized as failed by Engine.run
            status = 1
        if args.log_out:
            with open(args.log_out, "w") as f:
                json.dump(log, f, indent=2, default=str)
        print(json.dumps({"run_id": engine.run_id, "status": log.get("status")}))
        return status
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
