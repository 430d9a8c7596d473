"""Per-query profiler: run one registry entry with the bench session
shape, then break its wall-clock down by Spark job via the UI REST API.

Usage:
    python tools/profile_query.py <query> [query ...] [--sf DIR] [--reps N]
    python tools/profile_query.py txlog_scd2 --jobs   # per-job table

For each query it reports: wall seconds (per rep after one warm-up),
number of Spark jobs/stages/tasks the rep launched, total task time,
and (with --jobs) the per-job duration/description table sorted by
duration — the local stand-in for "open the Stages tab" (guide §1/§7).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}", timeout=30) as r:
        return json.load(r)


def build_session(cpus: str | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedStages", "50000")
        .config("spark.ui.retainedJobs", "50000")
        .appName("profile_query")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--jobs", action="store_true", help="print per-job table")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    spark = build_session()
    qs = entrymod.queries()
    for name in args.queries:
        fn = qs[name]
        if not args.no_warmup:
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        for rep in range(args.reps):
            jobs_before = {j["jobId"] for j in _rest(spark, "jobs")}
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            spark.catalog.clearCache()
            jobs = [j for j in _rest(spark, "jobs") if j["jobId"] not in jobs_before]
            njobs = len(jobs)
            ntasks = sum(j.get("numTasks", 0) for j in jobs)
            nstages = sum(len(j.get("stageIds", [])) for j in jobs)
            durs = []
            for j in jobs:
                try:
                    t_sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                    t_cmp = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                    ms = (time.mktime(t_cmp) - time.mktime(t_sub))
                    frac = (
                        float(j["completionTime"][20:23]) - float(j["submissionTime"][20:23])
                    ) / 1000.0 if len(j["completionTime"]) > 22 else 0.0
                    durs.append((ms + frac, j))
                except Exception:
                    durs.append((0.0, j))
            job_total = sum(d for d, _ in durs)
            print(
                f"{name}: wall={wall:.3f}s jobs={njobs} stages={nstages} "
                f"tasks={ntasks} sum_job_time={job_total:.3f}s "
                f"gap={wall - job_total:.3f}s"
            )
            if args.jobs:
                for d, j in sorted(durs, key=lambda x: -x[0])[:40]:
                    desc = (j.get("description") or j.get("name") or "")[:110]
                    print(f"  {d:7.3f}s  tasks={j.get('numTasks', 0):4d}  {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
