"""Dynamic time warping distance over keyed integer series.

DTW is the classic elastic similarity for time series — two series
that trace the same shape at different speeds (a demand curve shifted
by a lagging market, the same user journey at different paces) get a
small distance where Euclidean/correlation see nothing. Spark has no
built-in: the DP recurrence

    D[i][j] = |a_i − b_j| + min(D[i−1][j], D[i][j−1], D[i−1][j−1])

is inherently sequential per PAIR — exactly the "custom operator"
case for an Arrow-batched ``applyInPandas`` boundary: the CROSS-pair
parallelism is Spark's (one task per pair, shuffle on the pair id),
the within-pair O(n·band) loop is vectorized numpy per anti-diagonal.

Determinism: values must be exact integers (cents, counts — caller
scales); |a−b| and all DP cells are int64, so the distance is an
exact BIGINT — no float anywhere, bit-identical on any executor
count or partitioning. (This operator is NOT SQL-expressible — it is
gated by a rows-level driver check plus unit pinning against an
independent pure-Python reference, the documented weaker-oracle
path.)

Scale contract: per-pair cost is O(len_a · band) time and memory;
``max_len`` guards the per-task bound (a 10⁶-point series would be a
10⁶×band DP in one task — refuse loudly, downsample first). The
Sakoe-Chiba ``band`` caps warping (and cost); band ≥ |len_a − len_b|
is required for a path to exist, else the pair errors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _dtw_band(a: np.ndarray, b: np.ndarray, band: int) -> int:
    """Banded DTW on int64 arrays — anti-diagonal-free two-row DP,
    vectorized over j within the band; exact integer arithmetic."""
    n, m = len(a), len(b)
    if abs(n - m) > band:
        raise ValueError(
            f"dtw: band {band} < length difference {abs(n - m)} — no warping "
            "path exists; widen band or align lengths"
        )
    BIG = np.int64(2**62)
    prev = np.full(m + 1, BIG, dtype=np.int64)
    prev[0] = 0
    for i in range(1, n + 1):
        lo, hi = max(1, i - band), min(m, i + band)
        cur = np.full(m + 1, BIG, dtype=np.int64)
        cost = np.abs(a[i - 1] - b[lo - 1 : hi])
        # cur[j] = cost + min(prev[j], prev[j-1], cur[j-1]); the cur[j-1]
        # term is a sequential prefix — handled with a scan over the
        # bounded band (band is small by contract), numpy for the rest.
        base = np.minimum(prev[lo : hi + 1], prev[lo - 1 : hi])
        run = BIG
        for k in range(hi - lo + 1):
            run = min(base[k], run)
            run = cost[k] + run
            cur[lo + k] = run
        prev = cur
    return int(prev[m])


def dtw_pairs(
    series: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pos_col: str,
    value_col: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
    band: int = 64,
    max_len: int = 100_000,
) -> DataFrame:
    """DTW distance for each requested pair of series. ``series`` has
    one row per (series id, integer position, integer value);
    ``pairs`` lists (id_a, id_b). Returns ``(id_a, id_b, len_a,
    len_b, dtw_dist)`` — all BIGINT, exact.

    Series are assembled per id (sorted by ``pos_col`` — ties broken
    by value for total order), length-guarded by ``max_len``, then
    each pair's DP runs in one Arrow batch. Plan: two joins fan the
    (small) pair list against the series rows, ONE shuffle on the
    pair id groups both sides' points into the pair's task, and the
    pandas stage is the only Python — the documented intentional
    boundary."""
    sid, pos, val = F.col(id_col), F.col(pos_col).cast("long"), F.col(value_col).cast("long")
    pts = series.select(
        sid.alias("__sid"), pos.alias("__pos"), val.alias("__val")
    ).filter(F.col("__pos").isNotNull() & F.col("__val").isNotNull())
    pr = pairs.select(
        F.col(a_col).cast("string").alias("__a"), F.col(b_col).cast("string").alias("__b")
    )
    left = pr.join(
        pts.select(
            F.col("__sid").cast("string").alias("__a"), "__pos", "__val", F.lit(0).alias("__side")
        ),
        "__a",
    )
    right = pr.join(
        pts.select(
            F.col("__sid").cast("string").alias("__b"), "__pos", "__val", F.lit(1).alias("__side")
        ),
        "__b",
    )
    both = left.select("__a", "__b", "__side", "__pos", "__val").unionAll(
        right.select("__a", "__b", "__side", "__pos", "__val")
    )
    schema = StructType(
        [
            StructField("id_a", StringType()),
            StructField("id_b", StringType()),
            StructField("len_a", LongType()),
            StructField("len_b", LongType()),
            StructField("dtw_dist", LongType()),
        ]
    )
    band_i, max_len_i = int(band), int(max_len)

    def _one(key, pdf):  # (key, pdf) signature — eval type by position
        a_rows = pdf[pdf["__side"] == 0].sort_values(["__pos", "__val"])
        b_rows = pdf[pdf["__side"] == 1].sort_values(["__pos", "__val"])
        a = a_rows["__val"].to_numpy(dtype=np.int64)
        b = b_rows["__val"].to_numpy(dtype=np.int64)
        if len(a) > max_len_i or len(b) > max_len_i:
            raise ValueError(
                f"dtw_pairs: series longer than max_len={max_len_i} in pair "
                f"{key} — downsample or raise the guard deliberately"
            )
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame(
                {"id_a": [key[0]], "id_b": [key[1]], "len_a": [len(a)],
                 "len_b": [len(b)], "dtw_dist": [None]}
            )
        d = _dtw_band(a, b, band_i)
        return pd.DataFrame(
            {"id_a": [key[0]], "id_b": [key[1]], "len_a": [len(a)],
             "len_b": [len(b)], "dtw_dist": [d]}
        )

    return both.groupBy("__a", "__b").applyInPandas(_one, schema)
