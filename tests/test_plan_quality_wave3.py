"""Plan-shape assertions for the round-6 wave-3/4/5 operators — the
scale characteristics each one's docstring promises, frozen as tests:
window-only skyline (no join), broadcast nearest-center, value-table
lift (no global sort of raw rows), single-job FK audit, map-side
histogram sketch.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    import contextlib
    import io

    df = entrymod.queries()[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q181_skyline_is_window_only(spark):
    plan = _plan(spark, "q181_pareto_frontier")
    # the frontier itself must be windows over one exchange — the only
    # join in the plan is the upstream customer⋈orders revenue build
    assert plan.count("Window") >= 1
    after_agg = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" not in after_agg  # no dominance self-join


def test_q185_nearest_center_broadcasts_and_never_shuffles_points(spark):
    plan = _plan(spark, "q185_nearest_center")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the argmin is an aggregate, not a sort of the candidate set
    assert "TakeOrderedAndProject" not in plan


def test_q195_lift_has_no_global_sort_of_raw_rows(spark):
    plan = _plan(spark, "q195_lift_table")
    # rows collapse to distinct scores FIRST: a partial aggregate must
    # appear before any single-partition exchange
    assert plan.count("HashAggregate") >= 2
    first_single = plan.find("Exchange SinglePartition")
    first_agg = plan.find("HashAggregate")
    assert first_agg != -1
    if first_single != -1:
        # formatted plans list operators leaf-first: the value-table
        # aggregate must be computed before (appear after in tree
        # order, i.e. have a HashAggregate upstream of) the global
        # value-table window exchange
        assert "HashAggregate" in plan[first_single:] or first_agg < first_single


def test_q193_fk_audit_is_one_unioned_plan(spark):
    plan = _plan(spark, "q193_fk_orphan_audit")
    assert "Union" in plan
    # small parent key sets must broadcast (nation/region/customer)
    assert "BroadcastHashJoin" in plan


def test_q194_histogram_sketch_partial_aggregates(spark):
    plan = _plan(spark, "q194_histogram_quantiles")
    # the sketch groupBy must map-side combine before its exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_q184_grid_density_no_python_udf(spark):
    plan = _plan(spark, "q184_grid_density_clusters")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q183_hits_no_python_udf(spark):
    plan = _plan(spark, "q183_hits_scores")
    assert "BatchEvalPython" not in plan


def test_q187_bitmap_join_on_word_not_member(spark):
    plan = _plan(spark, "q187_segment_overlap")
    # the intersection join key is the packed word, never the raw uid
    key_lines = [l for l in plan.splitlines() if "keys" in l.lower() and ":" in l]
    assert key_lines, plan
    assert any("word" in l for l in key_lines)
    # and the raw member id never appears as a join key
    assert not any("__m" in l for l in key_lines)
