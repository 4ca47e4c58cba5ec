"""Market-basket association rules: support / confidence / lift over
co-purchased items.

The classic retail-analytics operator (apriori's useful core): which
item pairs co-occur in transactions more than independence predicts.
The reference has no basket surface (SURVEY §2.5 "not present"); this
extends the co-occurrence family (cooccur.py's PMI is the text-corpus
cousin — PMI is log-lift; here retail wants the raw ratio plus
confidence, and the transaction grain replaces the document grain).

Scale shape (the part hand-rolled SQL gets wrong): the naive
transactions-self-join explodes each basket into |basket|² rows AT
SHUFFLE TIME with no bound — one bot order with 10^5 items is 10^10
pairs in one task (the q29 hot-key shape again). Here each basket
becomes ONE row (collect_set → sorted array, bounded by
``max_basket_items``; an oversized basket fails loudly rather than
silently detonating a task), pairs explode from the array
map-side (i<j combinations via indexed transform — each pair emitted
once, no dedup pass), and the only shuffles are the groupBys on txn
and on (item_a, item_b). Frequent-item pruning (``min_item_count``)
runs BEFORE pair expansion — apriori's monotonicity: a pair can't be
frequent if either item isn't — shrinking baskets before the
quadratic step.

Determinism: all counts exact BIGINTs; support/confidence ride as
integer micro-units via integer division (non-negative, so truncate ==
floor on every engine); lift is the one double, round(·, 6), computed
from exact counts ≤ 2^53 so both engines divide identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    txn_col: str,
    item_col: str,
    min_item_count: int = 2,
    min_pair_count: int = 2,
    max_basket_items: int = 4096,
) -> DataFrame:
    """Association rules over (transaction, item) rows.

    Returns one row per DIRECTED rule a→b (both directions of each
    frequent unordered pair): ``(antecedent, consequent, n_pair,
    n_antecedent, n_consequent, n_txn, support_micro,
    confidence_micro, lift)`` where counts are transaction counts
    (duplicates within a transaction collapse), ``support_micro`` =
    n_pair·10⁶ div n_txn, ``confidence_micro`` = n_pair·10⁶ div
    n_antecedent, and ``lift`` = round(n_pair·n_txn /
    (n_antecedent·n_consequent), 6) — >1 means the pair co-occurs
    more than independence predicts.

    ``min_item_count`` prunes infrequent items BEFORE pair expansion
    (apriori monotonicity); ``min_pair_count`` prunes the output.
    A basket still exceeding ``max_basket_items`` distinct frequent
    items raises (quadratic-expansion contract, q29-style: loud >
    dead-executor).
    """
    base = df.select(
        F.col(txn_col).alias("__t"), F.col(item_col).alias("__i")
    ).filter(F.col("__i").isNotNull() & F.col("__t").isNotNull())
    n_txn_row = base.agg(F.countDistinct("__t").alias("n")).collect()[0]
    n_txn = int(n_txn_row["n"])
    if n_txn == 0:
        raise ValueError("association_rules: no transactions")

    items = (
        base.distinct()
        .groupBy("__i")
        .agg(F.count(F.lit(1)).cast("long").alias("__ni"))
        .filter(F.col("__ni") >= int(min_item_count))
    )
    frequent = base.distinct().join(F.broadcast(items.select("__i")), "__i")

    baskets = frequent.groupBy("__t").agg(
        F.array_sort(F.collect_set("__i")).alias("__arr")
    )
    guard = F.when(
        F.size("__arr") > int(max_basket_items),
        F.raise_error(
            F.concat(
                F.lit(
                    f"association_rules: basket exceeds max_basket_items="
                    f"{int(max_basket_items)} distinct frequent items for "
                    f"{txn_col} "
                ),
                F.col("__t").cast("string"),
            )
        ).cast(dict(baskets.dtypes)["__arr"]),
    ).otherwise(F.col("__arr"))
    # i<j combinations, emitted once each, map-side
    pairs = (
        baskets.withColumn("__arr", guard)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(__arr, (x, i) -> "
                    "transform(slice(__arr, i + 2, size(__arr)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("__p")
        )
        .groupBy(F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= int(min_pair_count))
    )
    na = items.select(F.col("__i").alias("__a"), F.col("__ni").alias("__na"))
    nb = items.select(F.col("__i").alias("__b"), F.col("__ni").alias("__nb"))
    sized = (
        pairs.join(F.broadcast(na), "__a")
        .join(F.broadcast(nb), "__b")
    )
    # Round 12 (guide §1.2): both directions of each rule explode from
    # ONE sized row (a 2-element struct array, the small-star trick)
    # instead of a self-union — the union form re-ran the ENTIRE
    # upstream pipeline (distinct, baskets, pair expansion, both
    # groupBys) once per direction: 32 parquet scans and zero
    # ReusedExchange in q160's before-plan, halved by this change.
    # Row values are identical; only the duplication is gone.
    directed = sized.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("__a").alias("antecedent"),
                    F.col("__b").alias("consequent"),
                    F.col("n_pair"),
                    F.col("__na").alias("n_antecedent"),
                    F.col("__nb").alias("n_consequent"),
                ),
                F.struct(
                    F.col("__b").alias("antecedent"),
                    F.col("__a").alias("consequent"),
                    F.col("n_pair"),
                    F.col("__nb").alias("n_antecedent"),
                    F.col("__na").alias("n_consequent"),
                ),
            )
        ).alias("__r")
    ).select(
        F.col("__r.antecedent").alias("antecedent"),
        F.col("__r.consequent").alias("consequent"),
        F.col("__r.n_pair").alias("n_pair"),
        F.col("__r.n_antecedent").alias("n_antecedent"),
        F.col("__r.n_consequent").alias("n_consequent"),
    )
    return directed.select(
        "antecedent",
        "consequent",
        "n_pair",
        "n_antecedent",
        "n_consequent",
        F.lit(n_txn).cast("long").alias("n_txn"),
        F.expr("n_pair * 1000000 div " + str(n_txn)).alias("support_micro"),
        F.expr("n_pair * 1000000 div n_antecedent").alias("confidence_micro"),
        F.round(
            F.col("n_pair").cast("double")
            * F.lit(float(n_txn))
            / (F.col("n_antecedent").cast("double") * F.col("n_consequent").cast("double")),
            6,
        ).alias("lift"),
    )
