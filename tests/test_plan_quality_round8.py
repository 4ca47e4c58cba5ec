"""Plan-quality freezes for the round-8 heavyweight operators — the
.explain-and-iterate discipline captured as tests (the
test_plan_quality_round7.py convention): a future edit that silently
degrades a plan (a broadcast lost to a cartesian, a WindowGroupLimit
collapsing to a global sort) fails loudly.

Notes on coverage choices: q297/q302/q305/q307 run their training
aggregates during query construction and return tiny literal-carrying
frames, so the cartesian sweep still audits their data-sized final
plan; the streaming monitors (q308/q309) execute a stream inside the
query body and are pinned by their state ≡ batch laws instead.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


#: Round-8 queries whose operators compose joins that must never plan
#: as a plain CartesianProduct (BroadcastNestedLoopJoin — the 1-row /
#: broadcast-side cross join — is fine).
_NO_CARTESIAN = [
    "q296_incremental_lsh_dedup",
    "q298_order_hbos_outliers",
    "q299_part_name_snm_pairs",
    "q300_trade_katz_centrality",
    "q301_priority_aipw_ate",
    "q302_price_quantile_regression",
    "q303_incremental_ivf_knn",
    "q304_trade_mutual_best_match",
    "q305_shipping_cox_ph",
    "q306_churned_buyers_kmv_diff",
    "q307_price_huber_line",
    "q310_copurchase_betweenness",
    "q311_incremental_dup_components",
    "q312_sq8_quantized_knn",
    "q313_lineitem_mi_matrix",
    "q314_domain_importance_weights",
    "q315_brand_label_propagation",
    "q316_customer_order_overdispersion",
    "q317_priority_group_sequential",
    "q318_hilbert_locality",
    "q319_lineitem_neyman_allocation",
]


@pytest.mark.parametrize("name", _NO_CARTESIAN)
def test_no_plain_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, (
        f"{name}: a non-broadcast cartesian appeared — a broadcast hint "
        "or headroom guard was lost"
    )


def test_hbos_frequency_tables_are_broadcast(spark):
    # the f x bins frequency tables must ride broadcast joins back to
    # the rows — a shuffle join here would move the corpus per feature
    plan = _plan(spark, "q298_order_hbos_outliers")
    assert "BroadcastExchange" in plan


def test_mutual_best_match_plans_window_group_limit(spark):
    # both argmax passes must plan as top-1 WindowGroupLimit, never a
    # full per-key sort materialization
    plan = _plan(spark, "q304_trade_mutual_best_match")
    assert "WindowGroupLimit" in plan


def test_sq8_queries_ride_broadcast_cross_join(spark):
    # the (small) quantized query side broadcasts against the corpus —
    # the brute_force_knn shape
    plan = _plan(spark, "q312_sq8_quantized_knn")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_mi_matrix_totals_ride_broadcast(spark):
    # per-pair totals are 1-row broadcast cross joins; marginal joins
    # are cell-sized. No row-sized side may shuffle for the totals.
    plan = _plan(spark, "q313_lineitem_mi_matrix")
    assert "BroadcastNestedLoopJoin" in plan


def test_group_sequential_single_row_pass(spark):
    # ONE data-sized aggregate (look, group); the cumulative window and
    # the A/B self-join run on the K x 2-row frame only
    plan = _plan(spark, "q317_priority_group_sequential")
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_hilbert_is_pure_expression_plus_aggregate(spark):
    # the rotate recurrence must stay whole-stage codegen column math:
    # no join, no Python evaluation anywhere in the plan
    plan = _plan(spark, "q318_hilbert_locality")
    assert "Join" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
