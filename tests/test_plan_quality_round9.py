"""Plan-quality freezes for the round-9 queries (the
test_plan_quality_round7/8 convention): the capstone monthly-drop
pipeline, the LSH calibration curve, and drop lexical novelty.

q324/q325 materialize their heavy middles eagerly inside the query
body (signature store, pair expansion) — the audited plan here is the
data-sized tail the gate actually collects, plus targeted shape pins
on the stages that must stay broadcast/anti-join shaped.
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


_NO_CARTESIAN = [
    "q324_monthly_drop_pipeline",
    "q325_lsh_calibration",
    "q326_drop_lexical_novelty",
    "q327_drop_length_psi",
]


@pytest.mark.parametrize("name", _NO_CARTESIAN)
def test_no_plain_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, (
        f"{name}: a non-broadcast cartesian appeared — a broadcast hint "
        "or headroom guard was lost"
    )


@pytest.mark.parametrize("name", _NO_CARTESIAN)
def test_no_python_udf_in_plan(spark, name):
    # every stage is built-in expressions; Python must never appear
    plan = _plan(spark, name)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name


def test_monthly_drop_exact_stage_plans_anti_join_and_top1_window(spark):
    # the store-fingerprint exclusion must stay a LEFT ANTI hash join
    # (never a NOT IN subquery materialization) and the min-id survivor
    # must plan as top-1 WindowGroupLimit, never a global sort
    plan = _plan(spark, "q324_monthly_drop_pipeline")
    assert "LeftAnti" in plan, "fp exclusion lost its anti-join shape"
    assert "WindowGroupLimit" in plan, "min-per-fp survivor lost WindowGroupLimit"


def test_calibration_tail_is_checkpoint_scan_plus_agg(spark):
    # q325 returns a groupBy over the eagerly-materialized scored
    # frame: the collected plan must be scan -> aggregate with no join
    # left (they all ran inside the body, under the partition pin)
    plan = _plan(spark, "q325_lsh_calibration")
    assert "Join" not in plan, "scored frame stopped being materialized"
    assert "HashAggregate" in plan


def test_novelty_store_side_deduplicates_before_join(spark):
    # the store must collapse to DISTINCT vocabulary before joining the
    # drop's occurrences: the plan needs an aggregate on BOTH sides of
    # the token join (vocab dedup + the final per-source rollup)
    plan = _plan(spark, "q326_drop_lexical_novelty")
    assert plan.count("HashAggregate") >= 3, (
        "vocabulary dedup aggregate disappeared — the join would "
        "multiply drop occurrences by store occurrences"
    )
