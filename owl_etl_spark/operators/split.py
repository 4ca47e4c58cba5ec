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
