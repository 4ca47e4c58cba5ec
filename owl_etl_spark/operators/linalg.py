"""Distributed linear algebra over embedding columns: exact Gram
matrix / column sums — the one-pass inputs PCA and covariance need.

The covariance of an embedding corpus is C = (G − n·μμᵀ)/(n−1) with
G = Σ x xᵀ — so the distributed work is exactly "sum outer products",
a dim×dim accumulator that fits anywhere, while the eigen-solve on
the d×d result is a driver/consumer step (deliberately NOT here:
eigenvector sign/order is solver-dependent and can't be oracle-gated;
the Gram matrix can).

Determinism: embeddings quantize to integer units first
(round(v·scale)), so every product and sum is exact BIGINT
arithmetic — order-independent, engine-identical. Overflow contract:
n · (dim? no — per-cell) n · max|x|² < 2^63: at micro units
(scale=1e6) and |v| ≤ 3 that is ~1e6 rows; at milli units (1e3) it is
~1e12. Pick ``scale`` for your corpus size; the gate uses milli.

Scale shape: ONE posexplode (dim× row expansion — the honest
distributed layout: (i, x_i, whole-vector) rows), then a dim-group
aggregate of dim per-group sums: dim² cells move through the
shuffle as 64 rows × 64-wide arrays, never the data. No pandas, no
driver loops; whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    df: DataFrame,
    vec_col: str,
    dim: int,
    scale: int = 1000,
) -> DataFrame:
    """Upper-triangle Gram matrix of the quantized embeddings: one row
    per (i, j), 1-based, i ≤ j — ``(i, j, n, s)`` with
    ``s = Σ_rows round(v_i·scale)·round(v_j·scale)`` (exact BIGINT)
    and ``n`` the row count (same for every cell; carried per row so
    the frame is self-describing for the covariance step). Null
    vectors and vectors of the wrong length raise (a silently skipped
    row would corrupt every cell)."""
    d = int(dim)
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == d)
    checked = df.select(
        F.when(
            ~ok,
            F.raise_error(
                F.lit(
                    f"gram_matrix: {vec_col} must be a non-null array of "
                    f"length {d}"
                )
            ).cast(dict(df.dtypes)[vec_col]),
        )
        .otherwise(F.col(vec_col))
        .alias("__v")
    )
    q = checked.select(
        F.expr(
            f"transform(__v, v -> CAST(round(CAST(v AS DOUBLE) * {int(scale)}) AS BIGINT))"
        ).alias("__q")
    )
    rows = q.select(F.posexplode("__q").alias("__i0", "__xi"), F.col("__q"))
    per_i = rows.groupBy("__i0").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.array(
            *[
                F.sum(F.col("__xi") * F.element_at("__q", j + 1)).cast("long")
                for j in range(d)
            ]
        ).alias("__sums"),
    )
    out = per_i.select(
        (F.col("__i0") + 1).cast("int").alias("i"),
        "n",
        F.posexplode("__sums").alias("__j0", "s"),
    ).select("i", (F.col("__j0") + 1).cast("int").alias("j"), "n", "s")
    return out.filter(F.col("j") >= F.col("i"))


def column_sums(
    df: DataFrame,
    vec_col: str,
    dim: int,
    scale: int = 1000,
) -> DataFrame:
    """Companion 1-row frame for the mean/covariance step: ``n`` and
    ``sums`` (array of per-dimension Σ round(v·scale), exact BIGINT).
    μ = sums/(n·scale); C = (G/scale² − n μμᵀ)/(n−1) — consumer-side
    arithmetic on a config-sized result."""
    d = int(dim)
    q = df.select(
        F.expr(
            f"transform({vec_col}, v -> CAST(round(CAST(v AS DOUBLE) * {int(scale)}) AS BIGINT))"
        ).alias("__q")
    )
    return q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.array(
            *[F.sum(F.element_at("__q", j + 1)).cast("long") for j in range(d)]
        ).alias("sums"),
    )
