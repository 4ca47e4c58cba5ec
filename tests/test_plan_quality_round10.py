"""Plan-quality freezes for the round-10 wave-5/6 queries (the
test_plan_quality_round7/8/9 convention): k-sample inference
(q334-q338) and rank aggregation / decile lift (q339/q340).

The contracts these pin:
- nothing in the wave plans a plain cartesian or a Python UDF — every
  statistic is built-in expressions over exact BIGINT moments;
- the inference queries collapse to group/stratum/distinct-value
  cardinality BEFORE any window or join touches them;
- the FDR screen's group-stats frames join back as BROADCASTs (the
  hypothesis frame is m rows — a shuffle join there would be a bug);
- Borda/Copeland's pairwise step self-joins the candidate-cardinality
  rank frame on ranker equality (a hash/sort-merge join, never a
  cartesian).
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

_WAVE = [
    "q334_value_anova_by_event_type",
    "q335_value_kruskal_wallis",
    "q336_value_variance_homogeneity",
    "q337_cohort_fdr_screen",
    "q338_priority_stratified_cmh",
    "q339_brand_rank_fusion",
    "q340_balance_decile_lift",
    "q341_event_type_tukey_contrasts",
    "q342_purchase_trend_mann_kendall",
    "q343_quality_gate_mcnemar",
    "q344_source_lang_raking",
    "q345_doc_repetition_profile",
    "q346_value_welch_anova",
    "q347_priority_ordered_trend",
    "q348_quality_gates_cochran_q",
    "q349_revenue_page_hinkley",
    "q350_quality_gates_fleiss_kappa",
    "q351_balance_matched_att",
    "q352_balance_discontinuity",
    "q353_user_lifetime_rmst",
    "q354_balance_qini_curve",
    "q355_lifetime_concordance_index",
    "q356_event_rate_wilson",
    "q357_segment_balance_table",
]


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", _WAVE)
def test_no_plain_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, (
        f"{name}: a non-broadcast cartesian appeared"
    )


@pytest.mark.parametrize("name", _WAVE)
def test_no_python_udf_in_plan(spark, name):
    plan = _plan(spark, name)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name


def test_fdr_screen_group_stats_join_is_broadcast(spark):
    # both joins of the m-row group-stats frame back onto row volumes
    # must be broadcasts; a shuffle join of a 5-row frame is the exact
    # anti-pattern the operator documents against
    plan = _plan(spark, "q337_cohort_fdr_screen")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "group-stats join fell back to a shuffle join"
    )


def test_brown_forsythe_median_frame_joins_as_broadcast(spark):
    # the k-row doubled-median frame must broadcast back onto the rows
    plan = _plan(spark, "q336_value_variance_homogeneity")
    assert "BroadcastHashJoin" in plan


def test_borda_pairwise_is_an_equi_join_on_ranker(spark):
    # the candidate-pair step must key on ranker equality (hash or
    # sort-merge) — never a cartesian with a post-filter
    plan = _plan(spark, "q339_brand_rank_fusion")
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_anova_is_two_aggregates_no_join(spark):
    # q334's whole plan: scan -> (group) aggregate -> global aggregate.
    # Any join appearing means the decomposition stopped being
    # moment-based
    plan = _plan(spark, "q334_value_anova_by_event_type")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_mcnemar_is_single_aggregate_no_shuffle_join(spark):
    plan = _plan(spark, "q343_quality_gate_mcnemar")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 1


def test_raking_grid_joins_stay_broadcast(spark):
    # the globals frame (1 row) must broadcast onto the cells frame;
    # the iterations are windows over the grid — no shuffle join of
    # row volumes anywhere
    plan = _plan(spark, "q344_source_lang_raking")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_jonckheere_pair_join_keys_on_value(spark):
    # the grid pair step joins on value equality (+ group inequality):
    # must plan as a hash/sort-merge join, never a cartesian
    plan = _plan(spark, "q347_priority_ordered_trend")
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_repetition_profile_joins_stay_doc_keyed(spark):
    # per-doc metric joins key on the doc id; no cartesian, no Python
    plan = _plan(spark, "q345_doc_repetition_profile")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # two gram orders x 2 phases


def test_matching_is_window_pass_not_pairwise(spark):
    # matching must plan as sort windows over the union, never a
    # treated-x-control join
    plan = _plan(spark, "q351_balance_matched_att")
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_rd_is_one_aggregate_after_fk_join(spark):
    plan = _plan(spark, "q352_balance_discontinuity")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2
