"""Physical-plan audit: evidence that the headline queries compile to the
plans we want at scale.

For each audited query this extracts from ``explain("formatted")``:

- scans: pushed filters + read schema (predicate pushdown, column pruning);
- join strategies (BroadcastHashJoin vs SortMergeJoin vs ShuffledHashJoin);
- number of Exchanges (shuffles) and reused exchanges/subtrees;
- WholeStageCodegen span count (JVM codegen coverage).

Writes a markdown report (default ``PLANS.md`` at the repo root) so the
evidence is reviewable without re-running Spark.

Usage: python tools/audit_plans.py [sf_dir] [out_md]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from metadata_driven_data_pipeline_spark import get_spark

AUDITED = [
    "pricing_summary",
    "shipping_priority",
    "region_revenue",
    "top_orders",
    "top_customers_per_nation",
    "customer_order_counts",
    "big_orders_having",
    "rich_idle_customers",
    "events_sessionize",
    "asof_view_before_purchase",
    "range_clicks_in_error_window",
    "word_topk",
    "dedup_keep_latest",
    "salted_join_revenue",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_neardup",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "text_profile",
    "corpus_clean",
    "hash_sample",
    "stratified_sample",
    "train_test_split",
    "pack_sequences",
    "unpivot_metrics",
    "order_percent_rank",
    "corr_stats",
    "pii_redact",
    "repetition_profile",
    "tfidf_topterms",
    "nation_trade_flows",
    "market_share",
    "profit_by_nation_year",
    "promo_revenue_share",
    "top_supplier_revenue",
    "returned_item_customers",
    "order_count_distribution",
    "small_qty_order_revenue",
    "dominant_part_suppliers",
    "doc_chunks",
    "kmeans_assign",
    "kmeans_step",
    "semdedup_pairs",
    "hourly_gap_fill",
    "gap_fill_15min",
    "important_part_volumes",
    "brand_filter_revenue",
    "user_first_last_events",
    "priority_late_ship_counts",
    "split_contamination",
    "containment_pairs",
    "cohort_retention",
    "price_band_histogram",
    "top_parts_per_brand",
    "click_minus_purchase_users",
    "click_purchase_common_users",
    "neardup_keep_best",
    "bigram_entropy",
    "semdedup_auto",
    "suppliers_kept_waiting",
    "domain_mix",
    "gopher_filter",
    "span_dedup",
    "quality_classifier",
    "incremental_dedup",
    "corpus_diff",
    "lm_cross_entropy",
    "quantize_embeddings",
    "pq_encode",
    "pq_adc_topk",
    "ivf_pq_topk",
    "token_kl_divergence",
    "hard_negatives",
    "vocab_encode",
    "keyword_search",
    "pq_adc_rerank",
    "incremental_minhash_dedup",
    "zorder_key",
    "table_profile",
    "profile_drift",
    "cms_frequencies",
    "sample_per_group",
    "epoch_shuffle",
    "dup_histogram",
    "bloom_index_words",
    "bloom_incremental_dedup",
    "quantile_sketch",
    "token_budget_sample",
    "hybrid_search",
    "dsir_weights",
    "dsir_topk",
    "txlog_merge_state",
    "txlog_time_travel",
    "txlog_skipping_scan",
    "txlog_change_feed",
    "txlog_delete_purge",
    "txlog_schema_evolution",
    "txlog_merge_delete",
    "txlog_timestamp_travel",
    "txlog_convert",
    "txlog_optimize_compact",
    "txlog_merge_sync",
    "dsir_incremental_weights",
    "txlog_partitioned_convert",
    "txlog_column_mapping",
    # r8: deletion-vector masked scan (BroadcastHashJoin LeftAnti vs the
    # sidecar), scoped overwrite, rewrite-skipping feed, row-level CDC
    # (per-commit EXCEPT ALL diff)
    "txlog_deletion_vectors",
    "txlog_replace_where",
    "txlog_skip_rewrites",
    "txlog_row_changes",
    "txlog_update",
    "txlog_cdc_update_pairs",
    "txlog_row_changes_batched",
    "txlog_hot_partition_optimize",
    "txlog_mask_debt_fold",
    "txlog_dv_odd_root",
    "txlog_s3_claim_commits",
    "txlog_replicate",
    # r11: MIN/MAX + FILTER-clause MV maintenance, snapshot-diff CDC
    # lanes, incremental IVF index maintenance
    "txlog_mv_minmax",
    "txlog_mv_filtered",
    "txlog_replicate_snapshot",
    "txlog_snapshot_scd2",
    "ivf_index_maintain",
    # r11 late additions: table clone, generated + identity columns
    "txlog_clone",
    "txlog_generated",
    "txlog_identity",
]


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> dict:
    scans = []
    for m in re.finditer(
        r"\(\d+\) Scan parquet.*?(?=\n\(|\Z)", plan, flags=re.S
    ):
        block = m.group(0)
        loc = re.search(r"Location:.*?([a-z_]+)\.parquet", block)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: struct<(.*?)>", block, flags=re.S)
        ncols = len(schema.group(1).split(",")) if schema and schema.group(1).strip() else 0
        scans.append(
            {
                "table": loc.group(1) if loc else "?",
                "pushed": (pushed.group(1)[:120] if pushed and pushed.group(1) else ""),
                "n_cols": ncols,
            }
        )
    return {
        "scans": scans,
        "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "shj": len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
        "cart": len(re.findall(r"\(\d+\) CartesianProduct", plan)),
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "reused": len(re.findall(r"ReusedExchange|ReusedSubquery", plan)),
        "wsc": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    spark = get_spark()
    # Audit the static Catalyst plan: with AQE on, the pre-execution plan is
    # an AdaptiveSparkPlan placeholder (no codegen ids, runtime re-planning
    # pending). AQE stays ON for every correctness/bench run — it only
    # improves on the static plan (skew splits, SMJ→BHJ conversions).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = entrymod.queries()

    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `python tools/audit_plans.py {sf_dir}`. For each query:",
        "join strategies chosen by Catalyst/AQE, shuffle (Exchange) count,",
        "reused exchanges/subqueries, WholeStageCodegen span count, and every",
        "parquet scan's pushed filters + read-schema width (column pruning).",
        "`bnlj`/`cartesian` columns exist to prove the expensive strategies",
        "stay at zero except where a brute-force verifier is explicit.",
        "",
        "| query | bhj | smj | shj | bnlj | cart | exchanges | reused | codegen spans |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    details = ["", "## Scan details (pushdown / pruning)", ""]
    for name in AUDITED:
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        a = audit(formatted_plan(df))
        lines.append(
            f"| {name} | {a['bhj']} | {a['smj']} | {a['shj']} | {a['bnlj']} | "
            f"{a['cart']} | {a['exchanges']} | {a['reused']} | {a['wsc']} |"
        )
        details.append(f"### {name}")
        if not a["scans"]:
            details.append("- (no parquet scan — derived input)")
        for s in a["scans"]:
            pushed = s["pushed"] or "none"
            details.append(
                f"- scan `{s['table']}`: {s['n_cols']} cols read; pushed: {pushed}"
            )
        details.append("")
        print(f"audited {name}")

    # hand-maintained sections (e.g. the driver-window rotation policy)
    # live below this marker in the existing file — carry them over
    carry = ""
    marker = "## Driver-window rotation"
    if os.path.exists(out_md):
        prev = open(out_md).read()
        if marker in prev:
            carry = "\n" + prev[prev.index(marker):]
    with open(out_md, "w") as f:
        f.write("\n".join(lines + details) + "\n" + carry)
    print(f"wrote {out_md}")
    spark.stop()


if __name__ == "__main__":
    main()
