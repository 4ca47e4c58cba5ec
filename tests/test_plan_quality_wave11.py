"""Plan-shape assertions for the round-6 wave-11/12 operators — each
docstring's scale promise frozen as a test: single-shuffle OLS / LOO
encoding / drawdown, heap-based (no global sort) Adamic-Adar top-k,
broadcast anti-join in the AA freshness filter, no-window bigram
construction, shared-shuffle interarrival window+agg.
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


def _n_nodes(plan: str, node: str) -> int:
    """Count plan nodes by their detail header '(N) NodeName' —
    formatted plans print each node once in the tree and once in the
    detail section, so bare substring counts double-count."""
    import re

    return len(re.findall(r"\(\d+\) " + node + r"\b", plan))


def _n_shuffles(plan: str) -> int:
    return _n_nodes(plan, "Exchange")


def test_q218_ols_is_one_aggregate_no_window_no_join(spark):
    plan = _plan(spark, "q218_ols_price_on_qty")
    # docstring: ONE shuffle (groupBy), pure projection after — the
    # moments must map-side combine (partial + final HashAggregate)
    assert plan.count("HashAggregate") >= 2
    assert "Window" not in plan
    assert "Join" not in plan
    # exactly one key exchange for the groupBy
    assert _n_shuffles(plan) == 1


def test_q219_adamic_adar_topk_uses_heap_not_global_sort(spark):
    plan = _plan(spark, "q219_copurchase_link_prediction")
    # top-k must be TakeOrderedAndProject (per-partition heap), never
    # a global Sort + Limit over all candidate pairs
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_q220_loo_encoding_is_single_window_shuffle(spark):
    plan = _plan(spark, "q220_loo_target_encoding")
    # ONE window pass, no join, no aggregate — strictly cheaper than
    # groupBy + rejoin (the docstring's claim)
    assert _n_nodes(plan, "Window") == 1
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_q221_seasonal_naive_no_window(spark):
    plan = _plan(spark, "q221_seasonal_naive_backtest")
    # forecast alignment is an equi-join on the shifted period,
    # NOT a lag window (gaps would silently misalign)
    assert "Window" not in plan
    assert "Join" in plan


def test_q222_interarrival_shares_one_shuffle(spark):
    plan = _plan(spark, "q222_interarrival_burstiness")
    # lag window and groupBy ride the same user_id partitioning:
    # exactly one hash exchange in the whole plan
    assert _n_shuffles(plan) == 1
    assert _n_nodes(plan, "Window") == 1


def test_q226_bigram_build_is_windowless(spark):
    plan = _plan(spark, "q226_bigram_logprob_quality")
    # bigrams come from a pure map over the token array — no window,
    # no posexplode self-join; the joins in the plan are the LM
    # count lookups
    assert "Window" not in plan


def test_q229_drawdown_single_shuffle(spark):
    plan = _plan(spark, "q229_wallet_max_drawdown")
    # running sum + running max + per-key aggregate on the SAME keys
    # = one exchange
    assert _n_shuffles(plan) == 1
    assert "Join" not in plan


def test_q224_modularity_no_quadratic_ops(spark):
    plan = _plan(spark, "q224_brand_modularity")
    # everything after edge prep is bounded by community count; the
    # final assembly must not global-sort anything
    assert "Exchange SinglePartition" not in plan or "TakeOrderedAndProject" in plan
