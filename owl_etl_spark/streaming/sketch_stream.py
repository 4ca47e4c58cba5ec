"""Streaming mergeable-sketch maintenance.

The point of a mergeable sketch (``operators/histo.py``: add counts =
merge) is that a STREAM can maintain it incrementally: each
micro-batch's partial histogram folds into state by the same
count-addition the batch merge test pins, so the final state of a
bounded run is bit-identical to the batch sketch over the same data —
which is exactly how the gate checks it (q199: availableNow →
memory sink → quantile extraction vs the batch SQL oracle).

State size is keys × n_bins rows — CONSTANT in the stream length,
the whole reason to sketch: a 100 TB replay and a 1 GB replay hold
the same state. Contrast with exact quantiles, whose streaming form
would have to retain every distinct value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_histogram(
    events: DataFrame,
    keys: list[str],
    value_col: str,
    lo: int,
    hi: int,
    n_bins: int,
) -> DataFrame:
    """Continuously-maintained equi-width histogram: a streaming
    groupBy on (keys, bin) whose running counts ARE the mergeable
    sketch (update/complete output modes both work — the aggregation
    state is the sketch). Bin rule identical to
    ``operators.histo.histogram_sketch`` (clamped edges, integral
    width enforced); null values excluded."""
    if n_bins < 1:
        raise ValueError(f"streaming_histogram: n_bins must be >= 1, got {n_bins}")
    if hi <= lo:
        raise ValueError(f"streaming_histogram: need hi > lo, got [{lo}, {hi})")
    if (hi - lo) % n_bins != 0:
        raise ValueError(
            f"streaming_histogram: bin width must be integral — "
            f"(hi - lo) = {hi - lo} is not divisible by n_bins = {n_bins}"
        )
    width = (hi - lo) // n_bins
    v = F.col(value_col).cast("long")
    bin_id = F.least(
        F.lit(n_bins - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"), F.expr(f"({value_col} - {lo}) div {width}")
        ),
    )
    return (
        events.where(v.isNotNull())
        .groupBy(*keys, bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def streaming_cms(
    events: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Continuously-maintained count-min sketch: the stream's
    aggregation state IS the ``(row, cell) → count`` table of
    ``operators.sketches.cms_build`` — at most depth×width rows, a
    CONSTANT in stream length and in key cardinality (the whole point:
    per-key streaming counts hold vocabulary-sized state; this holds
    KBs forever). Cell hashing is identical to the batch builder
    (md5-portable, seed base 7000), counts are integer sums — ORDER-
    INDEPENDENT, so on bounded input the final state equals the batch
    sketch bit-for-bit and the q308 gate hash-checks probes against
    DuckDB's batch replay. Update and complete output modes both work;
    merging per-shard states is the same cell-wise sum that builds
    them."""
    from owl_etl_spark.functions.hashing import md5_long_seeded
    from owl_etl_spark.operators.sketches import _CMS_SEED_BASE

    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(
                        md5_long_seeded(
                            F.col(key_col).cast("string"), _CMS_SEED_BASE + i
                        ),
                        F.lit(width),
                    ).alias("cell"),
                )
                for i in range(depth)
            ]
        )
    )
    return (
        events.where(F.col(key_col).isNotNull())
        .select(cells.alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


#: HLL register geometry shared by the streaming builder and the
#: estimator: 60-bit md5 hash → p register bits, the rest feed rho.
_HLL_HASH_BITS = 60
#: Harmonic-sum terms are 2^(50-rho), truncated to 0 beyond rho=50 —
#: an explicitly quantized estimator (error < 2^-50·m, far inside HLL
#: noise) that keeps the register fold an exact BIGINT in any order.
_HLL_SUM_SCALE_POW = 50


def hll_register_exprs(key_col: str, p: int) -> tuple[F.Column, F.Column]:
    """(register, rho) columns of the PORTABLE HLL construction: the
    60-bit md5 hash's low p bits pick the register, and rho = 1 +
    trailing zeros of the remaining bits (0 remaining bits → max rho).
    Trailing zeros come from log2(h & -h) — log2 of an exact power of
    two is exact in every correctly-rounded libm, so unlike a float
    estimate this never wobbles. Identical SQL replays in DuckDB."""
    m = 1 << p
    max_rho = _HLL_HASH_BITS - p + 1
    from owl_etl_spark.functions.hashing import md5_long

    h = md5_long(F.col(key_col).cast("string"))
    reg = F.pmod(h, F.lit(m))
    # exact integer h div 2^p: float division would lose low bits of a
    # 60-bit value (> 2^53); shiftright is exact and replays as // in SQL
    h2 = F.shiftright(h, p)
    rho = (
        F.when(h2 == F.lit(0), F.lit(max_rho))
        .otherwise(F.round(F.log2(h2.bitwiseAND(-h2))).cast("long") + F.lit(1))
        .cast("long")
    )
    return reg.alias("register"), rho.alias("rho")


def streaming_hll(
    events: DataFrame,
    keys: list[str],
    key_col: str,
    p: int = 8,
) -> DataFrame:
    """Continuously-maintained HyperLogLog registers per group: state =
    (keys…, register) → max(rho), at most 2^p rows per group FOREVER —
    the distinct-count monitor a 100 TB stream can afford (exact
    streaming distinct keeps every key in state). max() is an
    order-independent fold, so the final state on bounded input equals
    the batch registers exactly and the q309 gate hash-checks the
    estimates against DuckDB's replay of the same construction
    (:func:`hll_register_exprs` — md5-portable, no DataSketches bytes
    across engines). Merge of two states = same groupBy-max."""
    reg, rho = hll_register_exprs(key_col, p)
    return (
        events.where(F.col(key_col).isNotNull())
        .select(*keys, reg, rho)
        .groupBy(*keys, "register")
        .agg(F.max("rho").cast("long").alias("max_rho"))
    )


def hll_registers_estimate(
    registers: DataFrame, keys: list[str], p: int = 8
) -> DataFrame:
    """Distinct-count estimate from a (keys…, register, max_rho) frame
    (:func:`streaming_hll`'s state): the standard HLL dual estimator —
    linear counting m·ln(m/V) only in the small-cardinality regime
    (empty registers remain, V = m − #present, AND the rounded raw
    estimate is ≤ 2.5·m — the Flajolet et al. cutoff; beyond it the
    bias-corrected harmonic estimate is the more accurate of the two
    even while a few registers are still empty), else the raw harmonic
    estimate α_m·m²/Σ2^-rho. The harmonic sum runs over ALL m
    registers — each of the V absent rows contributes its empty-register
    term 2^-0 = 1 (folded in as V·2^50; omitting them would inflate the
    estimate exactly in the mid-band where raw now applies) — as exact
    BIGINTs in 2^50 units (terms beyond rho=50 truncate to 0: a
    documented quantization far below sketch noise) so the estimate is
    engine-exact. Returns (keys…, n_registers, est_distinct)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # SQL-level shiftleft: the PySpark wrapper takes only a literal
    # bit count, the SQL function accepts a column
    term = F.when(
        F.col("max_rho") <= _HLL_SUM_SCALE_POW,
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_SUM_SCALE_POW} - max_rho AS INT))"
        ),
    ).otherwise(F.lit(0))
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(term).cast("long").alias("__s"),
    )
    v = F.lit(m) - F.col("n_registers")
    scale = float(1 << _HLL_SUM_SCALE_POW)
    # full harmonic sum: present-register terms (__s) plus one 2^-0 = 1
    # term (2^50 units) per empty register
    s_full = (F.col("__s") + v.cast("long") * F.lit(1 << _HLL_SUM_SCALE_POW)).cast(
        "double"
    )
    raw = F.round(
        F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) * F.lit(scale) / s_full
    ).cast("long")
    linear = F.round(
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    ).cast("long")
    return agg.select(
        *keys,
        "n_registers",
        # dual-estimator cutoff: LC needs V > 0 to be defined at all,
        # and is only preferred while raw ≤ 2.5·m (rounded raw on both
        # engine and oracle sides, so the boundary is engine-exact)
        F.when((v > 0) & (raw <= F.lit(int(2.5 * m))), linear)
        .otherwise(raw)
        .alias("est_distinct"),
    )
