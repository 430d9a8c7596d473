"""CLI entry point: run a metadata document end-to-end.

Mirrors the reference's spark-submit invocation
(``airflow/dags/motor_policy_pipeline_dag.py:99-126`` builds
``spark-submit ... run_pipeline.py`` with RUN_ID in the environment):

    python -m metadata_driven_data_pipeline_spark \
        --metadata config/metadata.json \
        [--run-id RUN] [--manifest state/manifest.json] \
        [--pipeline-name NAME] [--log-out run_log.json]

Or run one of the named analytics queries directly (the driver-contract
surface in ``__spark_entry__.py``) and print JSON-lines rows:

    python -m metadata_driven_data_pipeline_spark \
        --query pricing_summary [--sf-dir /root/testdata/sf0.01] [--limit 20]

Exit code 0 on success; non-zero with the failure recorded in the run log.
"""

from __future__ import annotations

import argparse
import json
import sys

from metadata_driven_data_pipeline_spark.config import load_metadata
from metadata_driven_data_pipeline_spark.engine import Engine
from metadata_driven_data_pipeline_spark.session import get_spark


def run_query(args) -> int:
    """Run one named driver-contract query and print rows as JSON lines."""
    import importlib
    import os
    import sys as _sys

    _sys.path.insert(0, os.getcwd())
    entry = importlib.import_module("__spark_entry__")
    qs = entry.queries()
    if args.query not in qs:
        print(json.dumps({"error": "unknown query",
                          "available": sorted(qs)}), file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"query-{args.query}")
    try:
        df = qs[args.query](spark, args.sf_dir)
        rows = df.collect() if args.limit == 0 else df.limit(args.limit).collect()
        for r in rows:
            print(json.dumps(r.asDict(recursive=True), default=str))
        return 0
    finally:
        spark.stop()


def dry_run(metadata) -> int:
    """Compile-time check: metadata structure, transform types, reference
    resolution, and cycle detection — prints the execution plan as JSON.
    No SparkSession is created; a bad document fails here in milliseconds
    instead of mid-pipeline."""
    from metadata_driven_data_pipeline_spark.plans import (
        compile_dataflow,
        validate_metadata,
    )

    try:
        validate_metadata(metadata)
        plan = {}
        for flow in metadata["dataflows"]:
            compiled = compile_dataflow(flow)
            plan[flow["name"]] = {
                "sources": [s["name"] for s in flow.get("sources", [])],
                "transform_order": [
                    t["name"] for t in compiled.transforms_in_order
                ],
                "sinks": {
                    sk["name"]: sk["input"] for sk in flow.get("sinks", [])
                },
            }
    except Exception as e:
        print(json.dumps({"status": "invalid", "error": str(e)}))
        return 1
    print(json.dumps({"status": "valid", "plan": plan}, indent=2))
    return 0


def run_dag_cli(args) -> int:
    """Run the gated DAG lifecycle from a declarative document (the CLI
    analog of the reference's Airflow chain, motor_policy_pipeline_dag.py:
    154-162). Exit 0 on success, 1 with the red gate reported on failure;
    either way the shared run log lands at the document's log_path."""
    from metadata_driven_data_pipeline_spark.orchestrate import (
        GateFailure,
        run_dag_config,
    )

    # same ${VAR} environment substitution as metadata documents, so the
    # DAG's own paths (manifest, log_path, gate paths) are parameterizable
    from metadata_driven_data_pipeline_spark.config import load_config

    dag = load_config(args.dag)
    spark = get_spark(app_name=dag.get("pipeline_name", "dag"))
    try:
        try:
            log = run_dag_config(spark, dag, run_id=args.run_id)
            print(json.dumps({
                "run_id": log["run_id"], "status": log["status"],
                "stages": [s["stage"] for s in log["stages"]],
            }))
            return 0
        except GateFailure as e:
            print(json.dumps({
                "status": "failed", "failed_stage": e.stage,
                "failed_gate": e.gate_name,
            }))
            return 1
    finally:
        spark.stop()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="metadata_driven_data_pipeline_spark")
    p.add_argument("--metadata", default=None, help="metadata JSON path")
    p.add_argument("--query", default=None,
                   help="run a named query from __spark_entry__ instead of a pipeline")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="testdata scale-factor dir for --query")
    p.add_argument("--limit", type=int, default=20,
                   help="max rows printed by --query (0 = all)")
    p.add_argument("--dry-run", action="store_true",
                   help="validate + compile the metadata and print the plan "
                        "(topological transform order, sink wiring) without "
                        "starting Spark or executing anything")
    p.add_argument("--dag", default=None,
                   help="run the full gated lifecycle (init -> pre-gates -> "
                        "engine -> post-gates -> finalize) from a DAG JSON "
                        "document; see examples/dag_motor.json")
    p.add_argument("--run-id", default=None)
    p.add_argument("--manifest", default=None, help="manifest JSON path (high watermark)")
    p.add_argument("--pipeline-name", default="pipeline")
    p.add_argument("--log-out", default=None, help="write the structured run log here")
    args = p.parse_args(argv)

    if args.query:
        return run_query(args)
    if args.dag:
        return run_dag_cli(args)
    if not args.metadata:
        p.error("--metadata is required unless --query or --dag is given")

    # load_metadata applies ${VAR} environment substitution (parity:
    # config_loader.py's expandvars), so paths can be parameterized.
    metadata = load_metadata(args.metadata)

    if args.dry_run:
        return dry_run(metadata)

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
