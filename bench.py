"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>, ...,
   "curation": {...}, "curation_total": <sec>}

Each query is materialized with the `noop` sink — full distributed
execution (scan → shuffle → sink) with zero driver-side collection, so
the number measures the plan, not the driver.

Methodology (round-4 revision, per the r3 verdict: the recorded headline
swung 29% on cold-start + machine load while value_min_sum stayed flat):
- ONE full UNTIMED warm-up rep over every measured query first (JIT,
  parquet footer caches, codegen) — cold-start no longer lands in rep 1's
  samples.
- then $SPARK_GRAFT_BENCH_REPS timed reps (default 3); per-query MEDIAN
  is reported, min/max spread + per-rep totals included for audit, and
  `value_min_sum` (sum of per-query minima) is the load-insensitive
  lower envelope.

Two series:
- HEADLINE: the round-1 27-query set, unchanged for round-over-round
  comparability (BASELINE.md series).
- CURATION: the round-3 curation/search/PQ surface, previously untracked
  round-over-round (r3 verdict item 3). Reported under "curation"/
  "curation_total" in the same JSON line.
- SELECTION / TABLES: the round-5 DSIR and transaction-log-table
  surfaces, tracked the same way ("selection"/"tables" keys).

Output contract (round-5 revision, per the r4 verdict: BENCH_r04.json
recorded "parsed": null because progress bars + the full spread payload
overflowed the driver's tail capture):
- Spark's console progress bars are disabled; stdout carries EXACTLY ONE
  compact JSON line (metric/value/unit/queries/sf + rep totals — no
  per-query spreads), printed last.
- The FULL payload (including spreads) is also written to
  BENCH_RESULT.json next to this script, so the complete record survives
  any capture-window truncation.

`python bench.py --curation` runs only the curation series (for quick
iteration); the default run emits both.
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

# Round-3 curation/search/quantization surface — deliberately outside
# HEADLINE (series comparability) but tracked per-round from round 4 on.
CURATION = [
    "span_dedup",
    "gopher_filter",
    "quality_classifier",
    "vocab_encode",
    "keyword_search",
    "pq_adc_topk",
    "ivf_pq_topk",
]

# Round-5 data-selection surface (DSIR), its own series for the same
# comparability reason.
SELECTION = [
    "dsir_weights",
    "dsir_topk",
]

# Round-5 transaction-log table surface (sinks/txlog.py) — each query
# builds its table from scratch (appends + merge/overwrite commits) and
# reads it back, so the number is commit+snapshot+scan cost end to end.
TABLES = [
    "txlog_merge_state",
    "txlog_time_travel",
    "txlog_skipping_scan",
    "txlog_change_feed",
    "txlog_stream_feed",
    "txlog_delete_purge",
    "txlog_schema_evolution",
]

# Round-6 additions (kept OUT of TABLES/SELECTION so those series stay
# round-over-round comparable): MERGE matched-delete, timestamp travel,
# zero-copy convert, DSIR stored-model scoring.
ROUND6 = [
    "txlog_merge_delete",
    "txlog_optimize_compact",
    "txlog_timestamp_travel",
    "txlog_convert",
    "txlog_merge_sync",
    "dsir_incremental_weights",
]

# Round-7 additions (same comparability rule): Hive-partitioned
# zero-copy convert, column-mapping rename/drop, and the capped
# (admission-controlled) streaming backlog drain.
ROUND7 = [
    "txlog_partitioned_convert",
    "txlog_column_mapping",
    "txlog_stream_backpressure",
]


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def run_series(
    spark: SparkSession, names: list[str], sf_dir: str, reps: int
) -> dict:
    qs = entrymod.queries()

    def one_rep(measure: bool) -> float:
        # machine-load marker (r5 verdict item 8): the 1-minute loadavg
        # BEFORE each rep makes a driver-side inflated run self-explaining
        # in the artifact (r5's +12% was uniform machine load, which took
        # a same-HEAD quiet re-run to prove; now the marker says it)
        loadavgs.append(round(os.getloadavg()[0], 2))
        t_rep = time.time()
        for name in names:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            if measure:
                samples[name].append(time.time() - t0)
        # operators that persist() self-join intermediates (minhash,
        # semdedup) would otherwise accumulate cached blocks across reps
        spark.catalog.clearCache()
        return round(time.time() - t_rep, 3)

    samples: dict[str, list[float]] = {name: [] for name in names}
    loadavgs: list[float] = []
    warmup_total = one_rep(measure=False)
    rep_totals = [one_rep(measure=True) for _ in range(reps)]

    timings = {name: round(_median(xs), 3) for name, xs in samples.items()}
    spread = {
        name: [round(min(xs), 3), round(max(xs), 3)]
        for name, xs in samples.items()
    }
    return {
        "queries": timings,
        "total": round(sum(timings.values()), 3),
        "spread": spread,
        "rep_totals": rep_totals,
        "warmup_total": warmup_total,
        "min_sum": round(sum(min(xs) for xs in samples.values()), 3),
        "loadavg": loadavgs,  # 1-min loadavg before warmup + each rep
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    curation_only = "--curation" in sys.argv
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
        .config("spark.ui.showConsoleProgress", "false")
        .appName("bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    if curation_only:
        cur = run_series(spark, CURATION, sf_dir, reps)
        full = {
            "metric": "curation_queries_total_wall_clock",
            "value": cur["total"],
            "unit": "sec",
            "queries": cur["queries"],
            "sf": sf,
            "reps": reps,
            "spread": cur["spread"],
            "rep_totals": cur["rep_totals"],
            "value_min_sum": cur["min_sum"],
            "loadavg": cur["loadavg"],
        }
        _emit(full, drop=("spread",))
        spark.stop()
        return

    head = run_series(spark, HEADLINE, sf_dir, reps)
    cur = run_series(spark, CURATION, sf_dir, reps)
    sel = run_series(spark, SELECTION, sf_dir, reps)
    tab = run_series(spark, TABLES, sf_dir, reps)
    r6 = run_series(spark, ROUND6, sf_dir, reps)
    r7 = run_series(spark, ROUND7, sf_dir, reps)
    full = {
        "metric": "headline_queries_total_wall_clock",
        "value": head["total"],
        "unit": "sec",
        "queries": head["queries"],
        "sf": sf,
        "reps": reps,
        "spread": head["spread"],
        "rep_totals": head["rep_totals"],
        "warmup_total": head["warmup_total"],
        "value_min_sum": head["min_sum"],
        "loadavg": head["loadavg"],
        "curation": cur["queries"],
        "curation_total": cur["total"],
        "curation_spread": cur["spread"],
        "curation_min_sum": cur["min_sum"],
        "curation_loadavg": cur["loadavg"],
        "selection": sel["queries"],
        "selection_total": sel["total"],
        "selection_spread": sel["spread"],
        "selection_min_sum": sel["min_sum"],
        "selection_loadavg": sel["loadavg"],
        "tables": tab["queries"],
        "tables_total": tab["total"],
        "tables_spread": tab["spread"],
        "tables_min_sum": tab["min_sum"],
        "tables_loadavg": tab["loadavg"],
        "round6": r6["queries"],
        "round6_total": r6["total"],
        "round6_spread": r6["spread"],
        "round6_min_sum": r6["min_sum"],
        "round6_loadavg": r6["loadavg"],
        "round7": r7["queries"],
        "round7_total": r7["total"],
        "round7_spread": r7["spread"],
        "round7_min_sum": r7["min_sum"],
        "round7_loadavg": r7["loadavg"],
    }
    _emit(
        full,
        drop=(
            "spread",
            "curation_spread",
            "selection_spread",
            "tables_spread",
            "round6_spread",
            "round7_spread",
        ),
    )
    spark.stop()


def _emit(full: dict, drop: tuple = ()) -> None:
    """Full payload → BENCH_RESULT.json (survives capture truncation);
    ONE compact line (spreads dropped) → stdout, last thing printed."""
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_RESULT.json"
    )
    with open(out, "w") as f:
        json.dump(full, f)
        f.write("\n")
    slim = {k: v for k, v in full.items() if k not in drop}
    sys.stdout.flush()
    print(json.dumps(slim), flush=True)


if __name__ == "__main__":
    main()
