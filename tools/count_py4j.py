#!/usr/bin/env python3
"""Count py4j round trips (and wall) for registry entries — a
LOAD-INDEPENDENT driver-overhead metric (r11): every `send_command` is
one Python→JVM round trip (~1 ms each on this class of host), so the
count measures plan-construction + driver-protocol chatter without the
host-noise that makes wall-clock A/Bs unreadable. Actions also appear
as one call each (blocking while the job runs), so compare counts, not
count×latency.

Usage: python tools/count_py4j.py <query> [query ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import py4j.clientserver
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

COUNT = {"n": 0}
_orig = py4j.clientserver.ClientServerConnection.send_command


def _counted(self, command):
    COUNT["n"] += 1
    return _orig(self, command)


py4j.clientserver.ClientServerConnection.send_command = _counted


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("count_py4j")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in args:
        fn = qs[name]
        fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
        spark.catalog.clearCache()
        before = COUNT["n"]
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.catalog.clearCache()
        print(f"{name}: py4j_calls={COUNT['n'] - before} wall={wall:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
