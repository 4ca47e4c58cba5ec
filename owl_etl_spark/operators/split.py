"""Deterministic dataset splitting for training pipelines.

A training-data engine must assign every record to train/val/test
*stably*: the assignment may not change when the data is
repartitioned, re-read, or grown (new rows get fresh assignments;
old rows keep theirs). Random sampling (``df.sample``) fails all
three at 100 TB — it is seed-and-partitioning dependent. Hashing the
record key is the standard fix: pure per-row arithmetic, zero
shuffles, reproducible on any engine (md5 prefix ints — see
``functions.hashing`` for the portability rationale).

The reference (Jave-OWL/owl-ETL) has no sampling/splitting surface;
this extends its pipeline toward the LLM-training-data use case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from owl_etl_spark.functions.hashing import md5_long


def hash_bucket(key: Column, num_buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket id in ``[0, num_buckets)`` from a key column.

    ``salt`` derives an independent bucketing from the same key (e.g.
    one split for language balance, another for train/test).
    """
    text = F.concat(key.cast("string"), F.lit(f"|{salt}")) if salt else key.cast("string")
    return F.pmod(md5_long(text), F.lit(num_buckets))


def hash_split(
    df: DataFrame,
    key: str | Column,
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hashed key.

    ``fractions`` maps split name → fraction (must sum to ~1.0); rows
    land in splits by cumulative ranges over a 1e6-bucket hash space,
    so fractions as fine as 0.0001 % are honored. Per-row expression
    only — no shuffle, survives any repartitioning, and a row's split
    never changes as the dataset grows.
    """
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    space = 1_000_000
    bucket = hash_bucket(F.col(key) if isinstance(key, str) else key, space, salt)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(round(cum * space))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, last)


def sample_by_hash(
    df: DataFrame, key: str | Column, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hashed key — unlike
    ``df.sample`` the decision is a pure row function: reproducible
    across runs/engines/partitionings, and consistent across tables
    sharing the key (sampling users samples all their events)."""
    space = 1_000_000
    bucket = hash_bucket(F.col(key) if isinstance(key, str) else key, space, salt)
    return df.filter(bucket < int(round(fraction * space)))


def weighted_mixture(
    df: DataFrame,
    key: str | Column,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Curriculum-style source mixing: keep each stratum (source,
    language, quality tier, ...) at its own sampling rate. Per-row
    hash test — zero shuffles, deterministic, and up/down-weighting a
    stratum never changes *which* rows of the others are kept (each
    stratum's keep set is a prefix of the same hash order)."""
    space = 1_000_000
    bucket = hash_bucket(F.col(key) if isinstance(key, str) else key, space, salt)
    thr = None
    for name, rate in rates.items():
        cut = int(round(rate * space))
        thr = (
            F.when(F.col(stratum_col) == name, cut)
            if thr is None
            else thr.when(F.col(stratum_col) == name, cut)
        )
    thr = F.lit(int(round(default_rate * space))) if thr is None else thr.otherwise(
        int(round(default_rate * space))
    )
    return df.filter(bucket < thr)


def stratified_sample_exact(
    df: DataFrame,
    strata: list[str],
    k: int,
    key: str | Column,
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, picked by hash
    order (uniform, deterministic, engine-portable; key tiebreak for
    full determinism). One window shuffle on the strata — top-k per
    group plans as WindowGroupLimit, so each map task keeps only k
    rows per stratum before the exchange."""
    from pyspark.sql import Window

    kc = F.col(key) if isinstance(key, str) else key
    space = 1_000_000_000
    w = Window.partitionBy(*strata).orderBy(hash_bucket(kc, space, salt).asc(), kc.asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
