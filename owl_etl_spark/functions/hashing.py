"""Portable hashing primitives: md5-derived integer hashes, MinHash
signatures, SimHash fingerprints.

Why md5 and not ``xxhash64``/``hash``: engine-portable determinism.
An md5 hex prefix parsed as an integer gives the same value in Spark,
DuckDB, Trino, and plain Python — which makes every hash-based
operator here independently verifiable by an external oracle. At
scale the cost difference vs xxhash64 is dwarfed by shuffle I/O, and
``xxhash64`` variants are provided where only Spark-side consistency
is needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 15 hex chars = 60 bits — always fits a signed BIGINT in every engine.
_HEX_CHARS = 15


def md5_long(col: Column) -> Column:
    """Text → unsigned 60-bit integer via md5 hex prefix."""
    return F.conv(F.substring(F.md5(col), 1, _HEX_CHARS), 16, 10).cast("bigint")


def md5_long_seeded(col: Column, seed: int) -> Column:
    """Seeded variant: the seed is mixed into the hashed text. Gives a
    family of independent hash functions for MinHash."""
    return md5_long(F.concat(col, F.lit(f"#{seed}")))


def minhash_signature_sql(shingles_sql: str, num_hashes: int = 16) -> Column:
    """MinHash signature as ``array<bigint>`` over a shingle array.

    For each seed i: min over shingles of md5_long(shingle + '#i').
    Entirely intra-row (``transform`` + ``aggregate``) — signatures for
    a billion docs need zero shuffles; only the LSH band join shuffles.
    """
    sigs = ", ".join(
        f"""aggregate({shingles_sql},
                      CAST(9223372036854775807 AS BIGINT),
                      (acc, s) -> least(acc, CAST(conv(substring(md5(concat(s, '#{i}')), 1, {_HEX_CHARS}), 16, 10) AS BIGINT)))"""
        for i in range(num_hashes)
    )
    return F.expr(f"array({sigs})")


def simhash_sql(tokens_sql: str, bits: int = 16) -> Column:
    """SimHash fingerprint (bigint) over a token array.

    Per bit position b: sign of Σ_tokens (bit b of md5_long(token) ? +1 : -1);
    fingerprint = Σ_b sign_b · 2^b. Intra-row, shuffle-free.
    ``bits`` ≤ 60 (md5_long width). 16 bits is enough for
    bucketing-style near-dup candidate generation; use 64-bit xxhash
    variants when oracle portability is not needed.
    """
    terms = []
    for b in range(bits):
        vote = (
            f"aggregate({tokens_sql}, 0L, (acc, t) -> acc + "
            f"(CASE WHEN (CAST(conv(substring(md5(t), 1, {_HEX_CHARS}), 16, 10) AS BIGINT) >> {b}) % 2 = 1 "
            f"THEN 1L ELSE -1L END))"
        )
        terms.append(f"(CASE WHEN ({vote}) > 0 THEN CAST({2**b} AS BIGINT) ELSE 0L END)")
    return F.expr(" + ".join(terms))


def xxhash_bucket(col: Column, num_buckets: int) -> Column:
    """Spark-native fast bucket id (not oracle-portable): xxhash64 mod n."""
    return F.pmod(F.xxhash64(col), F.lit(num_buckets))
