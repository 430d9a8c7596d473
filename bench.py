"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is materialized with the `noop` sink — full distributed
execution (scan → shuffle → sink) with zero driver-side collection, so
the number measures the plan, not the driver.

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3) and reports the
per-query MEDIAN, so a transient load spike on the host doesn't read as a
regression (round-1's 50.7 s vs the 34.2 s machine-quiet baseline was
load noise; medians make that distinction measurable). `value` is the sum
of medians; `reps` and per-query min/max spread are included for audit.
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
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    # Warm-up: JIT + parquet footer caches, not measured.
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    rep_totals: list[float] = []
    for _ in range(reps):
        t_rep = time.time()
        for name in HEADLINE:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)
        # operators that persist() self-join intermediates (minhash, semdedup)
        # would otherwise accumulate cached blocks across reps
        spark.catalog.clearCache()
        rep_totals.append(round(time.time() - t_rep, 3))

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    timings = {name: round(median(xs), 3) for name, xs in samples.items()}
    spread = {
        name: [round(min(xs), 3), round(max(xs), 3)]
        for name, xs in samples.items()
    }
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "spread": spread,
                "rep_totals": rep_totals,
                "value_min_sum": round(
                    sum(min(xs) for xs in samples.values()), 3
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
