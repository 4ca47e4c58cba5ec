"""Ranking-quality metrics: NDCG@k and MRR, exactly.

The retrieval/recsys scorecard on the shelf next to the
classification metrics (operators/evalmetrics.py: AUC, lift,
calibration): given each key's ranked list and a 0/1 relevance
column, how good is the ORDER? NDCG@k discounts relevance by
position (1/log₂(i+1)); MRR is the reciprocal rank of the first
relevant item — the two numbers every ranking experiment quotes.

Exactness: positions are small integers, so the discount table
1/log₂(i+1) for i = 1..k is computed ONCE driver-side as integer
micro literals (the sprt/fs-weights device) and woven in as a CASE
ladder — DCG@k then is an exact BIGINT sum of per-position integer
terms, IDCG@k the same sum over the ideal (relevance-sorted) order,
and the final NDCG = DCG/IDCG is one rounded double. MRR's
reciprocal-rank table is the same trick. No logs at runtime, no
float accumulation anywhere.

Plan: two windows over the SAME key shuffle (the given order and the
ideal order) + one per-key aggregate — a single shuffle end-to-end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _discount_micro(k: int) -> list[int]:
    return [round(1_000_000 / math.log2(i + 1)) for i in range(1, k + 1)]


def ndcg_report(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-key NDCG@k and MRR@k for ranked rows ordered by
    (``order_col`` DESC, ``tiebreak_col`` ASC) — the scoring order —
    with 0/1 ``rel_col`` (nulls raise; an unjudged item is a labeling
    decision, not a silent 0). Returns ``(*keys, n, n_rel,
    dcg_micro, idcg_micro, ndcg, mrr)``; ndcg/mrr are null when the
    key has no relevant item in its whole list (nothing to find ⇒
    undefined, not zero)."""
    if not 1 <= int(k) <= 100:
        raise ValueError(f"ndcg_report: k must be in [1, 100], got {k}")
    disc = _discount_micro(int(k))
    r0 = F.col(rel_col).cast("long")
    rel = F.when(
        r0.isNull() | ~r0.isin(0, 1),
        F.raise_error(
            F.lit(
                f"ndcg_report: {rel_col} must be 0/1 non-null — judge or drop "
                "unlabeled items explicitly"
            )
        ).cast("long"),
    ).otherwise(r0)
    w_rank = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc()
    )
    w_ideal = Window.partitionBy(*keys).orderBy(
        F.col("__r").desc(), F.col(order_col).desc(), F.col(tiebreak_col).asc()
    )
    staged = (
        df.select(*keys, F.col(order_col), F.col(tiebreak_col), rel.alias("__r"))
        .withColumn("__pos", F.row_number().over(w_rank))
        .withColumn("__ipos", F.row_number().over(w_ideal))
    )

    def ladder(pos_col: str) -> F.Column:
        # CASE ladder over the k literal discounts
        whens = None
        for i, d in enumerate(disc, start=1):
            cond = F.col(pos_col) == i
            whens = F.when(cond, F.lit(d)) if whens is None else whens.when(cond, F.lit(d))
        return whens.otherwise(F.lit(0)).cast("long")

    dcg_t = F.when(F.col("__r") == 1, ladder("__pos")).otherwise(F.lit(0))
    idcg_t = F.when(F.col("__r") == 1, ladder("__ipos")).otherwise(F.lit(0))
    rr_t = F.when(
        (F.col("__r") == 1) & (F.col("__pos") <= int(k)),
        F.expr("1000000 div __pos"),
    ).otherwise(F.lit(0))
    agg = staged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__r").cast("long").alias("n_rel"),
        F.sum(dcg_t).cast("long").alias("dcg_micro"),
        F.sum(idcg_t).cast("long").alias("idcg_micro"),
        F.max(rr_t).cast("long").alias("__best_rr"),
    )
    ndcg = F.when(
        F.col("idcg_micro") > 0,
        F.round(
            F.col("dcg_micro").cast("double") / F.col("idcg_micro").cast("double"), 6
        ),
    )
    mrr = F.when(
        F.col("n_rel") > 0,
        F.round(F.col("__best_rr").cast("double") / 1_000_000.0, 6),
    )
    return agg.select(
        *keys, "n", "n_rel", "dcg_micro", "idcg_micro",
        ndcg.alias("ndcg"), mrr.alias("mrr"),
    )
