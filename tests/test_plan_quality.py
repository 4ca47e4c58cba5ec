"""Plan-quality assertions: the physical plans Catalyst produces for
the headline queries must have the shape we would want at 100 TB —
filters pushed to the parquet scan, pruned read schemas, broadcast
joins on dimensions, partial aggregation before the shuffle, and no
Python row-UDFs in relational paths.

These tests freeze the *scale characteristics*, not the exact plan
text — they fail loudly if a refactor accidentally de-optimizes
(e.g. a cast that blocks pushdown, or a join that flips to
sort-merge-with-shuffle on a 25-row dimension).
"""

from __future__ import annotations

import pytest

# r13 test tiering (VERDICT r12 #2): this suite runs in the FULL tier
# (tools/round_close.py --full-tests); the default time-boxed tier
# excludes it so the driver's verification window completes.
pytestmark = pytest.mark.full

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


def test_q06_filters_pushed_to_scan(spark):
    plan = _plan(spark, "q06_revenue_forecast")
    assert "PushedFilters:" in plan
    # discount/quantity predicates must reach the reader
    assert "GreaterThanOrEqual(l_discount" in plan
    assert "LessThan(l_quantity" in plan


def test_q01_column_pruning(spark):
    plan = _plan(spark, "q01_pricing_summary")
    # ReadSchema must not include unused columns like l_comment/l_partkey
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" not in read_schema
    assert "l_suppkey" not in read_schema
    assert "l_returnflag" in read_schema


def test_q01_partial_aggregation(spark):
    plan = _plan(spark, "q01_pricing_summary")
    # partial (map-side) agg before the exchange, final after
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_q05_broadcasts_dimensions(spark):
    plan = _plan(spark, "q05_region_revenue")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_q07_single_shuffle_window(spark):
    import re

    plan = _plan(spark, "q07_latest_order_per_customer")
    # one exchange for the window partitioning; no extra shuffles
    # (count node headers, not tree-section mentions)
    exchanges = re.findall(r"^\(\d+\) (ReusedExchange|Exchange)", plan, re.M)
    assert exchanges.count("Exchange") <= 1, plan
    assert "Window" in plan
    # rn=1 is planned as a group-limit BEFORE the shuffle (map-side
    # partial top-k) — the property that makes W1 scale
    assert "WindowGroupLimit" in plan


#: the ONLY queries allowed a Python boundary: multimodal decode is
#: inherently Python (mapInPandas over binary payloads, Arrow-batched)
#: — q329's perceptual fingerprint is the same declared boundary
#: (q330, its pair finder, checkpoints the fingerprint scan eagerly,
#: so its returned plan is pure JVM like q251's) — and q112 exists to
#: gate the declared pandas-UDF fuzzy scorers (difflib/LCS reference
#: parity — Arrow-batched, broadcast-side-only by documented
#: contract).
_PYTHON_ALLOWED = {
    "q35_multimodal_mixed_media",
    "q48_multimodal_features",
    "q329_perceptual_fingerprints",
    # round-12 media codecs: synthesis + full byte-level decode are
    # inherently Python (Arrow-batched mapInPandas over binary
    # payloads) — the same declared boundary as q35/q48/q329.
    "q359_jpeg_entropy_decode",
    "q360_wav_audio_decode",
    "q361_gif_frame_sample",
    "q363_mixed_media_full_dispatch",
}
_PANDAS_ALLOWED = {"q112_fuzzy_scorers"}
#: applyInPandas by design: the DTW / NW-SW dynamic programs are
#: inherently sequential per pair (operators/dtw.py, operators/
#: align.py docheaders) — the declared Arrow-batched Python boundary,
#: rows-gated + reference-pinned. The greedy packing walk
#: (operators/packing.py) is the same boundary — a resetting
#: accumulator no window expresses — but HASH-gated: DuckDB replays
#: the recurrence as a recursive CTE (q331/q332).
_GROUPED_PANDAS_ALLOWED = {
    "q227_event_series_dtw",
    "q250_sequence_alignment",
    "q331_greedy_doc_packing",
    "q332_packing_efficiency",
}
#: (q251's KLL sketch runs its mapInPandas fold EAGERLY while the
#: query is being built — the returned verification plan is pure JVM,
#: so it needs no allowlist entry.)


def test_no_python_udf_in_any_query(spark):
    """Every driver-contract query except the declared multimodal pair
    must plan 100% JVM-side — no row-Python fallback, no pandas UDF,
    no mapInPandas. This freezes the codegen boundary for the whole
    surface, not a sample."""
    for name in entrymod.queries():
        plan = _plan(spark, name)
        if name in _PYTHON_ALLOWED:
            assert "MapInPandas" in plan, f"{name} should be mapInPandas by design"
            continue
        if name in _PANDAS_ALLOWED:
            assert "ArrowEvalPython" in plan, f"{name} should use pandas UDFs by design"
            assert "BatchEvalPython" not in plan, f"{name} fell back to row-Python"
            continue
        if name in _GROUPED_PANDAS_ALLOWED:
            assert "FlatMapGroupsInPandas" in plan, (
                f"{name} should be applyInPandas by design"
            )
            assert "BatchEvalPython" not in plan, f"{name} fell back to row-Python"
            continue
        for tag in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert tag not in plan, f"{name} has a Python boundary: {tag}"


def test_wholestage_codegen_active(spark):
    import contextlib
    import io

    df = entrymod.queries()["q01_pricing_summary"](spark, SF_SMOKE)
    df.collect()  # AQE finalizes the plan only after execution
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()  # simple mode shows codegen stage markers *(n)
    assert "*(1)" in buf.getvalue()


def test_q78_stratified_sample_group_limit(spark):
    """Hash-order stratified sampling must plan as WindowGroupLimit so
    map tasks keep only k rows per stratum before the shuffle."""
    plan = _plan(spark, "q78_stratified_sample")
    assert "WindowGroupLimit" in plan


def test_q81_edit_distance_join_is_hash_join(spark):
    """The blocked similarity join must be an equi hash join on the
    block key — never a cartesian/nested-loop product."""
    plan = _plan(spark, "q81_edit_distance_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan  # broadcast or shuffled, either is fine


def test_q73_hash_split_single_exchange(spark):
    """Split assignment is a pure row expression: the only exchange in
    the plan is the final summary aggregation's."""
    plan = _plan(spark, "q73_hash_split")
    assert plan.count("Exchange") <= 2  # partial->final agg exchange (+AQE read)


def test_q82_chunking_no_exchange(spark):
    """Intra-row chunking + posexplode must not shuffle at all."""
    plan = _plan(spark, "q82_chunk_documents")
    assert "Exchange" not in plan


def test_q92_cdc_apply_group_limit(spark):
    """The CDC apply's latest-change-per-key window must plan as
    WindowGroupLimit (map-side partial top-1 before the exchange) —
    same property as q07; the delete filter must not defeat it."""
    plan = _plan(spark, "q92_cdc_apply")
    assert "WindowGroupLimit" in plan


def test_q94_constraint_row_checks_single_pass(spark):
    """All row-level constraint checks fold into ONE aggregate over the
    table: orders is scanned once for the three row checks (plus one
    scan each for uniqueness and FK — 3 total), never once per check."""
    plan = _plan(spark, "q94_constraint_report")
    import re

    scans = re.findall(r"Scan parquet.*orders", plan)
    assert len(scans) <= 3, plan


def test_q115_weighted_sample_no_shuffle(spark):
    """A-ES sampling must plan as pure row expressions +
    TakeOrderedAndProject: zero exchanges — a 100 TB corpus is never
    globally sorted or shuffled to draw k rows."""
    import re

    plan = _plan(spark, "q115_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan


def test_q113_cms_probe_broadcasts(spark):
    """CMS estimation probes the <=depth*width-row sketch via a
    broadcast join — the candidate side must never shuffle against it."""
    plan = _plan(spark, "q113_cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q118_ivfpq_single_exchange_group_limit(spark):
    """IVF-PQ search: encode and LUT build are map-only (literal
    broadcast), candidates join the broadcast query side on the
    cluster key, and the only exchange is the final per-query top-k
    window — which must plan as WindowGroupLimit."""
    import re

    plan = _plan(spark, "q118_ivfpq_knn")
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) <= 1, plan


def test_q116_mad_single_shuffle(spark):
    """median + MAD + flags ride ONE shuffle on the group key (two
    percentile window passes over co-partitioned data)."""
    import re

    plan = _plan(spark, "q116_mad_outliers")
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) <= 1, plan


def test_q138_ewma_single_window_no_joins(spark):
    """The truncated EWMA is ONE window pass over ONE key shuffle —
    16 lag columns must not multiply windows, joins, or exchanges."""
    import re

    plan = _plan(spark, "q138_ewma_smoothing")
    assert "Join" not in plan
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1, plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_q139_twap_window_and_agg_share_partitioning(spark):
    """TWAP's lead() window and the final per-key aggregate must reuse
    ONE hash partitioning on the group keys — two exchanges would mean
    the co-partitioning was lost between the window and the groupBy."""
    import re

    plan = _plan(spark, "q139_time_weighted_avg")
    assert "Join" not in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_q135_kmv_bottom_k_take_ordered(spark):
    """Both KMV half-sketches and their merge must plan bottom-k as
    TakeOrderedAndProject (size-k heap per partition), never a global
    Sort of the hash column."""
    plan = _plan(spark, "q135_kmv_distinct_estimate")
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan, plan


def test_q160_basket_no_cross_or_nested_loop_join(spark):
    """Association rules must never plan the transactions self-join:
    pair expansion is an array explode, and the only joins are
    broadcast hash joins against the frequent-item dimension."""
    plan = _plan(spark, "q160_association_rules")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan, plan  # item dims must broadcast


def test_q169_rolling_median_single_window_shuffle(spark):
    """The rolling-order-statistics pass is ONE window over ONE key
    exchange — the sorted-array trick must not add joins or extra
    shuffles."""
    import re

    plan = _plan(spark, "q169_rolling_median")
    assert "Join" not in plan
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1, plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_q163_gini_window_and_agg_share_partitioning(spark):
    """Rank window, count window, and the final aggregate all ride ONE
    hash partitioning on the group key."""
    import re

    plan = _plan(spark, "q163_revenue_concentration")
    assert "Join" not in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_q166_zorder_interleave_is_map_side(spark):
    """The Morton interleave adds NO exchange of its own: the query's
    only shuffles are the per-z-range aggregate's (the distinct-count
    rewrite makes that two hash exchanges; the interleave would add a
    third if it ever stopped being a map expression)."""
    import re

    plan = _plan(spark, "q166_zorder_locality")
    assert "Join" not in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 2, plan
