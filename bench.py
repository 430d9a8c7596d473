"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is materialized with the `noop` sink — full distributed
execution (scan → shuffle → sink) with zero driver-side collection, so
the number measures the plan, not the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

# Representative of the full surface: relational (scan/filter/agg, multi-join,
# window ranking), event-series, metadata-engine ops (validate, dedup-latest),
# and the LLM-pipeline extensions (exact + MinHash-LSH + SimHash dedup, text
# profiling, embedding near-dup + ANN search).
HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "region_revenue",
    "top_customers_per_nation",
    "big_orders_having",
    "events_sessionize",
    "asof_view_before_purchase",
    "range_clicks_in_error_window",
    "word_topk",
    "dedup_keep_latest",
    "validate_ko_errors",
    "dedup_exact",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "simhash_pairs",
    "text_profile",
    "corpus_clean",
    "embedding_neardup",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "streaming_hourly_counts",
    "nation_trade_flows",
    "returned_item_customers",
    "doc_chunks",
    "kmeans_assign",
    "semdedup_pairs",
    "hourly_gap_fill",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .appName("bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()

    # Warm-up: JIT + parquet footer caches, not measured.
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
