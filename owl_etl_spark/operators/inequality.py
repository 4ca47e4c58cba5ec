"""Concentration / inequality measures: exact Gini and top-decile
share per group.

The revenue-concentration readout every commercial warehouse wants
("how dependent are we on the top accounts"), computed EXACTLY: the
rank-formula Gini

    G = (2·Σ i·x_(i) − (n+1)·Σ x) / (n·Σ x)

over ascending-ranked non-negative integer units, plus the share held
by the top ⌈n/10⌉ rows. All accumulations are BIGINT sums of integer
products; the single double is the final Gini division, round(·, 6).
The formula is tie-invariant (equal values swap ranks without moving
Σ i·x), so no tiebreak can change the answer — one is still taken for
a total order, keeping the rank column itself deterministic.

Caller contract: values must be NON-NEGATIVE integers (a negative
value makes the Lorenz curve non-monotone and the measure
meaningless — it raises); Σ i·x needs n·max_rank·max(x) headroom:
n²·max(x) < 2^63, i.e. ~3e6 rows per group at $10k cents — rescale
units above that.

Scale shape: ONE shuffle on the keys; the rank window and the final
aggregate share the partitioning (one exchange, Window + HashAggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def abc_classes(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    value_col: str,
    a_pct: int = 70,
    b_pct: int = 90,
) -> DataFrame:
    """Pareto/ABC classification: rank rows within each key group by
    value descending and label each row A while the group's running
    cumulative share is ≤ ``a_pct``%, B while ≤ ``b_pct``%, else C —
    the inventory/account-tiering readout that pairs with
    ``gini_report``. Output: ``(keys..., id, value, rank, cum_value,
    abc_class)``.

    The boundary test is exact integer cross-multiplication
    (``cum·100 <= total·pct`` in BIGINT) — no share division ever
    happens, so no float boundary can flip a class. The row that
    crosses a boundary keeps the lower class (its cum includes
    itself), the textbook convention. Values must be non-negative
    integers (cents/units) — negatives raise, same contract as
    gini_report. Ties order by ``id_col`` ascending for a total order.

    Scale shape: ONE shuffle on the keys; rank, running sum, and the
    group total all ride the same partitioning (two window specs, one
    exchange). BIGINT headroom: cum·100 needs Σvalue < 9·10¹⁶ per
    group.
    """
    from pyspark.sql import Window

    if not (0 < a_pct < b_pct <= 100):
        raise ValueError(
            f"abc_classes: need 0 < a_pct < b_pct <= 100, got {a_pct}, {b_pct}"
        )
    v0 = F.col(value_col).cast("long")
    v = F.when(
        v0.isNull() | (v0 < 0),
        F.raise_error(
            F.concat(
                F.lit(
                    f"abc_classes: {value_col} must be a non-negative "
                    "integer, got "
                ),
                F.coalesce(v0.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(v0)
    w = Window.partitionBy(*keys).orderBy(
        F.col("value").desc(), F.col("id").asc()
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(*keys)
    staged = df.select(
        *keys,
        F.col(id_col).alias("id"),
        v.alias("value"),
    ).select(
        *keys,
        "id",
        "value",
        F.row_number().over(w).cast("long").alias("rank"),
    ).select(
        *keys,
        "id",
        "value",
        "rank",
        F.sum("value").over(w_run).cast("long").alias("cum_value"),
        F.sum("value").over(w_all).cast("long").alias("__total"),
    )
    cls = (
        F.when(F.col("cum_value") * 100 <= F.col("__total") * a_pct, F.lit("A"))
        .when(F.col("cum_value") * 100 <= F.col("__total") * b_pct, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return staged.select(*keys, "id", "value", "rank", "cum_value", cls.alias("abc_class"))


def gini_report(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per key group: ``(keys..., n, total, gini,
    top_decile_share_micro)`` — ``gini`` in [0, 1] rounded at 6,
    ``top_decile_share_micro`` = (Σ of the largest ⌈n/10⌉ values)·10⁶
    div total. Groups with zero total emit null gini/share."""
    from pyspark.sql import Window

    v0 = F.col(value_col).cast("long")
    v = F.when(
        v0.isNull() | (v0 < 0),
        F.raise_error(
            F.concat(
                F.lit(
                    f"gini_report: {value_col} must be a non-negative "
                    "integer, got "
                ),
                F.coalesce(v0.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(v0)
    order = [F.col(value_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    ranked = df.select(
        *keys, v.alias("__v"), F.row_number().over(w).cast("long").alias("__r")
    )
    n = F.count(F.lit(1)).cast("long")
    sx = F.sum("__v").cast("long")
    six = F.sum(F.col("__r") * F.col("__v")).cast("long")
    # two-phase: the per-group n is needed inside the top-decile
    # predicate, so attach it via the same window (no second shuffle)
    w_all = Window.partitionBy(*keys)
    staged = ranked.withColumn("__n", F.count(F.lit(1)).over(w_all)).withColumn(
        "__topn", F.expr("(__n + 9) div 10")
    )
    return staged.groupBy(*keys).agg(
        n.alias("n"),
        sx.alias("total"),
        F.when(
            sx > 0,
            F.round(
                (F.lit(2) * six - (n + 1) * sx).cast("double") / (n * sx).cast("double"),
                6,
            ),
        ).alias("gini"),
        F.when(
            sx > 0,
            F.expr(
                "coalesce(sum(CASE WHEN __r > __n - __topn THEN __v END), 0) "
                "* 1000000 div sum(__v)"
            ),
        ).alias("top_decile_share_micro"),
    )


def theil_index(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Theil T inequality index per group — the DECOMPOSABLE member of
    the inequality family next to the rank-formula Gini (q163): Theil
    is additively separable into within/between components (Gini is
    not), which is why resource-concentration audits that need to say
    WHERE the inequality lives use it.

        T = (1/n) Σ (xᵢ/μ) ln(xᵢ/μ)
          = [ Σ xᵢ·round(ln(xᵢ·n / Σx)·1e6) ] / (Σx)   in micro-nats

    — the second form is the engine's discipline: each row's log
    argument is the exact rational xᵢ·n/Σx, the micro-nat snap happens
    per row before the exact BIGINT weighted sum, and ONE floor
    division by the total normalizes (algebra: (1/n)·(x/μ) = x/Σx).
    Zero values contribute 0 (the x·ln x → 0 limit); negatives raise
    (Theil is defined on non-negative quantities — stated). Headroom:
    Σ x·|lnterm| ≤ Σx · ln(n)·1e6 — totals to ~10¹² cents at n ≤ 10⁹.

    Returns ``(group, n, total, theil_micro_nats)`` — 0 means perfect
    equality, ln(n)·1e6 is the max (one row owns everything). One
    groupBy for totals + one broadcast-joined weighted sum."""
    d = df.select(
        F.col(group_col).cast("string").alias("__g"),
        F.col(value_col).cast("long").alias("__x"),
    ).filter(F.col("__g").isNotNull() & F.col("__x").isNotNull())
    d = d.withColumn(
        "__x",
        F.when(
            F.col("__x") < 0,
            F.raise_error(
                F.lit("theil_index: negative values — Theil needs x >= 0")
            ).cast("long"),
        ).otherwise(F.col("__x")),
    )
    tot = d.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("long").alias("total"),
    )
    j = d.join(
        F.broadcast(tot.select(F.col("__g").alias("__g2"), "n", "total")),
        d["__g"] == F.col("__g2"),
    )
    term = F.when(
        (F.col("__x") > 0) & (F.col("total") > 0),
        F.col("__x")
        * F.round(
            F.log(
                F.col("__x").cast("double")
                * F.col("n").cast("double")
                / F.col("total").cast("double")
            )
            * 1e6
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        j.groupBy(F.col("__g").alias("group"))
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("total").cast("long").alias("total"),
            F.sum(term).cast("long").alias("__s"),
        )
        .select(
            "group",
            "n",
            "total",
            F.expr(
                "((__s) - ((((__s) % greatest(total, 1)) + greatest(total, 1))"
                " % greatest(total, 1))) div greatest(total, 1)"
            )
            .cast("long")
            .alias("theil_micro_nats"),
        )
        .orderBy("group")
    )
