"""Physical-plan quality regression guard (scale contract).

Locks in the plan properties audited in PLANS.md: headline queries must
keep compiling to the plans we'd want on a 1000-executor cluster —
no cartesian products anywhere, broadcast-nested-loop joins only for the
whitelisted 1-row scalar-subquery broadcast (the O(n^2) brute-force
verifier left the public embedding path in round 3, so it is no longer
whitelisted), pruned parquet scans, and pushed-down filters.
Static (AQE-off) plans are asserted: AQE only improves on them at runtime.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audit_plans import audit, formatted_plan

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# BNLJ whitelist: rich_idle_customers broadcasts a single-row aggregate
# (scalar subquery). embedding_neardup is deliberately NOT whitelisted any
# more: its public path is candidates->verify (equi joins only) and a BNLJ
# reappearing there is exactly the regression this guard exists to catch.
BNLJ_OK = {"rich_idle_customers"}

AUDITED = [
    "pricing_summary",
    "shipping_priority",
    "region_revenue",
    "top_customers_per_nation",
    "big_orders_having",
    "rich_idle_customers",
    "word_topk",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_neardup",
    "ann_topk_lsh",
    "corpus_clean",
    "forecast_revenue_change",
    "min_cost_supplier",
    "returnflag_priority_mix",
]


@pytest.fixture(scope="module")
def plans(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = entrymod.queries()
    out = {name: audit(formatted_plan(qs[name](spark, SF_DIR))) for name in AUDITED}
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return out


def test_no_cartesian_products(plans):
    bad = [n for n, a in plans.items() if a["cart"] > 0]
    assert not bad, f"cartesian product appeared in: {bad}"


def test_bnlj_only_whitelisted(plans):
    bad = [n for n, a in plans.items() if a["bnlj"] > 0 and n not in BNLJ_OK]
    assert not bad, f"broadcast-nested-loop join appeared in: {bad}"


def test_star_joins_broadcast(plans):
    # dim joins must be broadcast, not shuffled
    assert plans["region_revenue"]["bhj"] >= 2
    assert plans["top_customers_per_nation"]["bhj"] == 1
    assert plans["shipping_priority"]["bhj"] >= 1


def test_sketch_self_joins_share_shuffle(plans):
    # the SMJ hint makes both sides identical shuffles → ReusedExchange
    assert plans["minhash_lsh_pairs"]["smj"] >= 1
    assert plans["minhash_lsh_pairs"]["reused"] >= 1
    assert plans["simhash_pairs"]["smj"] >= 1
    assert plans["simhash_pairs"]["reused"] >= 1


def test_column_pruning_reaches_scans(plans):
    # lineitem is 16 cols; Q1 must read only what it uses
    scan = next(s for s in plans["pricing_summary"]["scans"] if s["table"] == "lineitem")
    assert scan["n_cols"] <= 6
    # Q3's customer scan: segment + key only
    cscan = next(s for s in plans["shipping_priority"]["scans"] if s["table"] == "customer")
    assert cscan["n_cols"] <= 2


def test_filters_pushed_to_scans(plans):
    scan = next(s for s in plans["pricing_summary"]["scans"] if s["table"] == "lineitem")
    assert "l_shipdate" in scan["pushed"]
    cscan = next(s for s in plans["shipping_priority"]["scans"] if s["table"] == "customer")
    assert "c_mktsegment" in cscan["pushed"]


def test_q6_fully_pushed_down(plans):
    """Q6 is the pushdown benchmark: every predicate must reach the scan
    and the read schema must carry only the 4 referenced columns."""
    scan = next(
        s for s in plans["forecast_revenue_change"]["scans"]
        if s["table"] == "lineitem"
    )
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan["pushed"]
    assert scan["n_cols"] <= 4


def test_q2_dims_broadcast_single_shuffle(plans):
    """Q2 shape: part + supplier×nation×region chain must broadcast onto
    the lineitem scan; the only wide exchange is the window over
    l_partkey (the correlated-MIN rewrite)."""
    a = plans["min_cost_supplier"]
    assert a["bhj"] >= 3
    assert a["smj"] == 0


def test_q12_window_pushed_and_pruned(plans):
    """Q12 shape: the ship-year window must reach the lineitem scan and
    the read schema must carry only the 3 referenced columns."""
    scan = next(
        s for s in plans["returnflag_priority_mix"]["scans"]
        if s["table"] == "lineitem"
    )
    assert "l_shipdate" in scan["pushed"]
    assert scan["n_cols"] <= 3


def test_codegen_covers_plans(plans):
    uncovered = [n for n, a in plans.items() if a["wsc"] == 0]
    assert not uncovered, f"no WholeStageCodegen span in: {uncovered}"
