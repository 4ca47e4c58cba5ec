"""Exact 1-D Wasserstein (earth-mover) distance between keyed
integer distributions — the drift metric that sees what PSI and KS
miss: PSI (q139's family) needs binning and KS (q230) only reads the
single worst CDF gap, while W₁ integrates the WHOLE CDF difference in
the units of the value itself ("average cents you must move a unit of
mass"), so it ranks drifts by economic size, not by bin luck.

For 1-D distributions W₁ has a closed form — no optimal-transport
solver needed:

    W₁(A, B) = ∫ |F_A(x) − F_B(x)| dx
             = Σ_gaps |cumA·nB − cumB·nA| · gap_width / (nA·nB)

computed EXACTLY over the merged support: one full-outer join of the
two value histograms, running integer sums, and per-gap products —
every term a BIGINT (the cross-multiplied form avoids dividing per
gap; ONE floor division at the end scales to micro value-units).

Overflow headroom: |cumA·nB| ≤ nA·nB and the gap sum multiplies by
the value RANGE, so the bound is nA·nB·range ≤ 2⁶³ — raise-guarded
via the documented ``max_product`` (e.g. 10⁶ rows × 10⁶ rows × 10⁶
cents range needs the guard; shard by key first).

Scale shape: one histogram aggregate per side (the only data-sized
shuffles), then support-sized joins and windows per key pair. The
all-pairs form takes a small key list (distribution drift is
monitored over dozens of segments, not millions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def wasserstein_1d_pairs(
    df: DataFrame,
    key_col: str,
    value_col: str,
    max_product: int = 10**12,
) -> DataFrame:
    """Exact W₁ between every pair of key groups' value distributions:
    ``(key_a, key_b, n_a, n_b, w1_micro)`` for key_a < key_b, distance
    in micro value-units. Values must be exact integers (cents).

    Per pair: merge the two per-key histograms on value (full outer on
    the union support), carry running counts, and sum
    |cumA·nB − cumB·nA|·gap over consecutive support points — exact
    BIGINTs, one floor division at the end. ``max_product`` raises
    before nA·nB·range can threaten the BIGINT bound."""
    d = df.select(
        F.col(key_col).cast("string").alias("__k"),
        F.col(value_col).cast("long").alias("__v"),
    ).filter(F.col("__k").isNotNull() & F.col("__v").isNotNull())
    hist = d.groupBy("__k", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    tot = hist.groupBy("__k").agg(
        F.sum("__c").cast("long").alias("__n"),
        (F.max("__v") - F.min("__v")).cast("long").alias("__range"),
    )
    keys = tot.select("__k", "__n", "__range")
    pairs = (
        keys.select(
            F.col("__k").alias("key_a"),
            F.col("__n").alias("n_a"),
            F.col("__range").alias("__ra"),
        )
        .join(
            keys.select(
                F.col("__k").alias("key_b"),
                F.col("__n").alias("n_b"),
                F.col("__range").alias("__rb"),
            ),
            F.col("key_a") < F.col("key_b"),
        )
        .withColumn(
            "n_a",
            F.when(
                F.col("n_a") * F.col("n_b") * F.greatest("__ra", "__rb")
                > F.lit(int(max_product)),
                F.raise_error(
                    F.lit(
                        "wasserstein_1d_pairs: nA*nB*range exceeds the "
                        "BIGINT headroom guard — shard by key or rescale "
                        "values first"
                    )
                ).cast("long"),
            ).otherwise(F.col("n_a")),
        )
        .select("key_a", "key_b", "n_a", "n_b")
    )
    # per (pair, support value): counts from each side. The union
    # support per pair is built from a union of tagged rows — cheaper
    # to reason about (and to replay in SQL) than a per-pair
    # full-outer join: each (pair, value) row carries (ca, cb) with
    # zeros filled by the aggregation.
    ha = hist.select(F.col("__k").alias("key_a"), "__v", F.col("__c").alias("__ca"))
    hb = hist.select(F.col("__k").alias("key_b"), "__v", F.col("__c").alias("__cb"))
    left = pairs.join(ha, "key_a").select(
        "key_a", "key_b", "n_a", "n_b", "__v", F.col("__ca").alias("ca"),
        F.lit(0).cast("long").alias("cb"),
    )
    right = pairs.join(hb, "key_b").select(
        "key_a", "key_b", "n_a", "n_b", "__v", F.lit(0).cast("long").alias("ca"),
        F.col("__cb").alias("cb"),
    )
    sup = (
        left.unionByName(right)
        .groupBy("key_a", "key_b", "n_a", "n_b", "__v")
        .agg(F.sum("ca").cast("long").alias("ca"), F.sum("cb").cast("long").alias("cb"))
    )
    w = Window.partitionBy("key_a", "key_b").orderBy(F.col("__v").asc())
    stepped = (
        sup.withColumn("cuma", F.sum("ca").over(w).cast("long"))
        .withColumn("cumb", F.sum("cb").over(w).cast("long"))
        .withColumn("nextv", F.lead("__v").over(w))
    )
    terms = stepped.filter(F.col("nextv").isNotNull()).select(
        "key_a",
        "key_b",
        "n_a",
        "n_b",
        (
            F.abs(F.col("cuma") * F.col("n_b") - F.col("cumb") * F.col("n_a"))
            * (F.col("nextv") - F.col("__v"))
        )
        .cast("long")
        .alias("__t"),
    )
    return (
        terms.groupBy("key_a", "key_b", "n_a", "n_b")
        .agg(F.sum("__t").cast("long").alias("__area"))
        .select(
            "key_a",
            "key_b",
            "n_a",
            "n_b",
            F.expr(
                f"(__area * {MICRO} - ((((__area * {MICRO}) % (n_a * n_b))"
                " + (n_a * n_b)) % (n_a * n_b))) div (n_a * n_b)"
            )
            .cast("long")
            .alias("w1_micro"),
        )
        .orderBy("key_a", "key_b")
    )


def cramer_von_mises_pairs(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Cramér-von Mises statistic between every pair of
    key groups — the QUADRATIC companion to this module's W₁: where
    Wasserstein integrates |F_A − F_B| in value units (economic size
    of drift), CvM integrates (F_A − F_B)² over the pooled empirical
    measure, which weights the body of the distribution and feeds the
    classical test. Reported as the integral over the merged support
    with pooled-mass weights:

        T = Σ_points (cumA·nB − cumB·nA)² · (a_i + b_i)
            / (nA²·nB²·(nA + nB))   — in micro units

    — exactly the W₁ plan (one histogram per side, union support,
    running counts) with a squared cross-multiplied integrand; the
    numerator stays an exact BIGINT — per-point terms reach
    (nA·nB)²·point_mass, so the woven guard refuses nA·nB > 2·10⁷
    (≥ 100× slack for point masses up to ~2·10³; subsample bigger
    groups first — squaring is CvM's price) — and ONE floor division
    scales out. Returns ``(key_a, key_b, n_a, n_b, cvm_micro)``."""
    d = df.select(
        F.col(key_col).cast("string").alias("__k"),
        F.col(value_col).cast("long").alias("__v"),
    ).filter(F.col("__k").isNotNull() & F.col("__v").isNotNull())
    hist = d.groupBy("__k", "__v").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    tot = hist.groupBy("__k").agg(F.sum("__c").cast("long").alias("__n"))
    pairs = (
        tot.select(F.col("__k").alias("key_a"), F.col("__n").alias("n_a"))
        .join(
            tot.select(F.col("__k").alias("key_b"), F.col("__n").alias("n_b")),
            F.col("key_a") < F.col("key_b"),
        )
        # (nA·nB)²·(a+b) per point must fit BIGINT: nA·nB ≤ ~2·10⁷
        .withColumn(
            "n_a",
            F.when(
                F.col("n_a") * F.col("n_b") > 20_000_000,
                F.raise_error(
                    F.lit(
                        "cramer_von_mises_pairs: nA*nB exceeds the squared-"
                        "integrand BIGINT headroom — subsample groups first"
                    )
                ).cast("long"),
            ).otherwise(F.col("n_a")),
        )
    )
    ha = hist.select(F.col("__k").alias("key_a"), "__v", F.col("__c").alias("__ca"))
    hb = hist.select(F.col("__k").alias("key_b"), "__v", F.col("__c").alias("__cb"))
    left = pairs.join(ha, "key_a").select(
        "key_a", "key_b", "n_a", "n_b", "__v",
        F.col("__ca").alias("ca"), F.lit(0).cast("long").alias("cb"),
    )
    right = pairs.join(hb, "key_b").select(
        "key_a", "key_b", "n_a", "n_b", "__v",
        F.lit(0).cast("long").alias("ca"), F.col("__cb").alias("cb"),
    )
    sup = (
        left.unionByName(right)
        .groupBy("key_a", "key_b", "n_a", "n_b", "__v")
        .agg(F.sum("ca").cast("long").alias("ca"), F.sum("cb").cast("long").alias("cb"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("key_a", "key_b").orderBy(F.col("__v").asc())
    stepped = sup.withColumn("cuma", F.sum("ca").over(w).cast("long")).withColumn(
        "cumb", F.sum("cb").over(w).cast("long")
    )
    terms = stepped.select(
        "key_a",
        "key_b",
        "n_a",
        "n_b",
        (
            (F.col("cuma") * F.col("n_b") - F.col("cumb") * F.col("n_a"))
            * (F.col("cuma") * F.col("n_b") - F.col("cumb") * F.col("n_a"))
            * (F.col("ca") + F.col("cb"))
        )
        .cast("long")
        .alias("__t"),
    )
    return (
        terms.groupBy("key_a", "key_b", "n_a", "n_b")
        .agg(F.sum("__t").cast("long").alias("__s"))
        .select(
            "key_a",
            "key_b",
            "n_a",
            "n_b",
            F.expr(
                "((__s * 1000000) - ((((__s * 1000000) % (n_a * n_a * n_b * n_b"
                " * (n_a + n_b))) + (n_a * n_a * n_b * n_b * (n_a + n_b)))"
                " % (n_a * n_a * n_b * n_b * (n_a + n_b))))"
                " div (n_a * n_a * n_b * n_b * (n_a + n_b))"
            )
            .cast("long")
            .alias("cvm_micro"),
        )
        .orderBy("key_a", "key_b")
    )
