"""Gradient-boosted decision stumps — engine-exact boosting on
DataFrame aggregates.

The smallest real gradient-boosting machine: K rounds of a one-split
regression stump fit to the running residual under squared loss. What
makes it a natural ENGINE operator (rather than a driver-side ML
library call) is that each round is ONE map-side-combined global
aggregate: for every candidate threshold t the split statistics
(n_left, sum_left) are conditional sums over the residual column, so
a round costs a single scan with 2·|T| partial aggregates — no
shuffle of row volumes, no per-row model state, and the model (the
chosen threshold and two leaf values) is a handful of driver scalars,
exactly the pagerank/logreg driver-iteration shape
(``operators/logreg.py``).

Why it's REPRODUCIBLE (the same discipline as
``logistic_regression_fit``): labels are integer-scaled by the caller
(e.g. cents), so residuals, split sums, and counts are exact BIGINTs
in any partition order. The split criterion — variance reduction,
equivalently maximizing S_L²/n_L + S_R²/n_R over candidate t — is
computed in DOUBLE *from those exact integers*, and IEEE multiply/
divide/add on identical inputs is bit-deterministic on every engine
(only libm functions and float SUM order are not; neither appears
here). Leaf values snap to integers via SQL-style half-away rounding,
so the whole K-round trajectory — thresholds, leaves, residuals — is
bit-identical across engines; the DuckDB oracle for q297 replays it
round by round with unrolled materialized CTEs and hash-matches.

At 100 TB: K+1 scans of a 2-column integer projection (cache it);
per scan one tree-reduced global aggregate of ~2·|T| BIGINTs; driver
state is 4 scalars per round. Candidate thresholds are caller-fixed
(domain knowledge or a prior quantile pass), not data-adaptive per
round — that is what keeps a round at one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from owl_etl_spark.operators.logreg import _round_half_away


def gbm_stump_fit(
    df: DataFrame,
    y_col: str,
    x_col: str,
    thresholds: list[int],
    rounds: int = 3,
) -> list[dict]:
    """Fit ``rounds`` boosted stumps on exact-integer labels.

    ``y_col`` must already be integer-scaled (cents, micro-units, …)
    and ``x_col`` integer-valued; both are cast to long. Returns one
    dict per round: ``{round, threshold, left_leaf, right_leaf,
    mae}`` — all exact integers in the label's scale; ``mae`` is the
    half-away-rounded mean |residual| AFTER applying that round's
    stump. Round 0 is the base prediction (global mean) reported as
    ``threshold=None`` with both leaves equal.

    Candidates where a split would be empty on either side are
    skipped; ties on the gain break toward the SMALLEST threshold.
    Raises if no candidate ever splits the data.
    """
    if not thresholds:
        raise ValueError("gbm_stump_fit: need at least one candidate threshold")
    ts = sorted(int(t) for t in thresholds)
    work = df.select(
        F.col(y_col).cast("long").alias("__y"),
        F.col(x_col).cast("long").alias("__x"),
    ).localCheckpoint(eager=True)

    # r12 restructure (guide §2.3 "aggregate before you shuffle",
    # applied to iteration): every SPLIT statistic is linear in y
    # within an x-group — Σ_{x≤t} resid_k = Σ_{x≤t} y − Σ_{x≤t} n_x ·
    # pred_k(x), exact BIGINT — so the per-round candidate scan runs
    # over the per-x collapsed frame (bounded by the covariate's
    # cardinality; bucketed covariates are the engine convention),
    # not the data. Only the MAE terms Σ|y − pred_k(x)| need rows, and
    # the whole trajectory's predictions are known before they are
    # computed — ONE final scan evaluates every round's MAE. Old
    # shape: rounds+2 full-data scans; new: 1 collapse + rounds tiny
    # aggregates + 1 full-data scan. Every reported integer
    # (thresholds, leaves, maes) is bit-identical.
    xstats = (
        work.groupBy("__x")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__nx"),
            F.sum("__y").cast("long").alias("__sy"),
        )
        .localCheckpoint(eager=True)
    )
    first = xstats.agg(
        F.sum("__nx").cast("long").alias("n"),
        F.sum("__sy").cast("long").alias("s"),
    ).collect()[0]
    n_total, s_total = first["n"], first["s"]
    if not n_total:
        raise ValueError("gbm_stump_fit: empty input")
    base = _round_half_away(s_total / n_total)

    out = [
        {
            "round": 0,
            "threshold": None,
            "left_leaf": base,
            "right_leaf": base,
            "mae": None,  # all maes filled by the single final scan
        }
    ]
    # pred_k(x) as an exact-integer column expression over __x; starts
    # at the base prediction and gains one stump per round
    def _pred_plus(pred_col, t, left, right):
        return pred_col + F.when(
            F.col("__x") <= F.lit(t), F.lit(left)
        ).otherwise(F.lit(right))

    pred = F.lit(base).cast("long")
    preds = [pred]  # pred_k per round, for the final MAE scan
    for k in range(1, int(rounds) + 1):
        # candidate stats over the COLLAPSED frame: resid sums derive
        # from (n_x, sy_x) and the current prediction, exactly
        spred = F.col("__nx") * pred
        aggs = [
            F.sum(F.col("__sy") - spred).cast("long").alias("s"),
        ]
        for t in ts:
            cond = F.col("__x") <= F.lit(t)
            aggs.append(
                F.sum(F.when(cond, F.col("__sy") - spred)).cast("long").alias(f"sl_{t}")
            )
            aggs.append(
                F.sum(F.when(cond, F.col("__nx"))).cast("long").alias(f"nl_{t}")
            )
        row = xstats.agg(*aggs).collect()[0]
        s_resid = row["s"]
        best = None  # (gain, -t) max; i.e. ties -> smallest t
        for t in ts:
            nl = row[f"nl_{t}"] or 0
            if nl == 0 or nl == n_total:
                continue
            sl = row[f"sl_{t}"] or 0
            sr = s_resid - sl
            nr = n_total - nl
            # exact ints -> IEEE double ops: bit-identical on any engine
            gain = (float(sl) * float(sl)) / nl + (float(sr) * float(sr)) / nr
            if best is None or (gain, -t) > (best[0], -best[1]):
                best = (gain, t, sl, nl, sr, nr)
        if best is None:
            raise ValueError(
                "gbm_stump_fit: no candidate threshold splits the data — "
                "widen `thresholds`"
            )
        _, t, sl, nl, sr, nr = best
        left = _round_half_away(sl / nl)
        right = _round_half_away(sr / nr)
        pred = _pred_plus(pred, t, left, right)
        preds.append(pred)
        out.append(
            {"round": k, "threshold": t, "left_leaf": left, "right_leaf": right,
             "mae": None}
        )
    # ONE data scan evaluates every round's Σ|y − pred_k(x)|
    final = work.agg(
        *[
            F.sum(F.abs(F.col("__y") - preds[k])).cast("long").alias(f"a{k}")
            for k in range(len(preds))
        ]
    ).collect()[0]
    for k in range(len(preds)):
        out[k]["mae"] = _round_half_away(final[f"a{k}"] / n_total)
    return out


def gbm_stump_model_df(spark, fitted: list[dict]) -> DataFrame:
    """The fitted trajectory as a tiny driver-built DataFrame (one row
    per round) — the model artifact a pipeline persists next to the
    data it scores."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("boost_round", LongType()),
            StructField("threshold", LongType(), nullable=True),
            StructField("left_leaf", LongType()),
            StructField("right_leaf", LongType()),
            StructField("mae", LongType()),
        ]
    )
    rows = [
        (d["round"], d["threshold"], d["left_leaf"], d["right_leaf"], d["mae"])
        for d in fitted
    ]
    return spark.createDataFrame(rows, schema)
