"""Numeric normalization expressions (SURVEY.md §2.2 P4-P7).

All pure ``Column`` expressions — JVM-side, codegen-friendly, no UDFs.
Higher-order array functions are built as SQL expression strings
(the lambda forms are only reachable via ``F.expr``/``selectExpr``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_numero(col: Column) -> Column:
    """Lenient string→double parse (P7).

    Strips everything but digits, dot, minus; comma decimal → dot;
    null on failure (reference: src/etl/transform.py:787-802 uses
    ``float()`` with exception→None; ``try_cast`` is the declarative
    equivalent).

    Values that already cast cleanly pass through untouched — the
    regex path must only see true strings, because a double rendered
    as ``2.3E13`` would have its exponent marker stripped.

    INTENTIONAL DIVERGENCE from the reference: ``"1,5"`` parses here
    as 1.5 (comma = Spanish decimal separator). The reference strips
    commas BEFORE its ``replace(',', '.')`` can act
    (src/etl/transform.py:787-802), so it yields 15.0 — a locale bug
    this engine does not reproduce. Golden parity is unaffected (the
    fixtures carry no comma-decimal numerics).
    """
    direct = col.try_cast("double")
    cleaned = F.regexp_replace(F.translate(col.cast("string"), ",", "."), r"[^\d.\-]", "")
    return F.coalesce(direct, cleaned.try_cast("double"))


def parse_percent(col: Column) -> Column:
    """Percent parse. Clean casts pass through directly — the
    reference's numeric branch, and the only safe path for scientific
    notation ("5e-05"), whose exponent marker the regex would strip.
    The regex clean (keep digits/dot/comma/minus/%, comma→dot, drop %)
    is the string branch (reference: src/etl/transform.py:569-605)."""
    direct = col.try_cast("double")
    cleaned = F.regexp_replace(col.cast("string"), r"[^\d.,\-%]", "")
    cleaned = F.translate(cleaned, ",", ".")
    cleaned = F.regexp_replace(cleaned, "%", "")
    return F.coalesce(direct, cleaned.try_cast("double"))


def descale_monetary(col: Column, max_iters: int = 10, scale: int = 2) -> Column:
    """Monetary de-scaling with exact while-loop semantics (P4).

    The reference repeatedly divides by 1000 while the value exceeds
    1e6, then rounds to 2 dp (src/etl/transform.py:70-86) — result in
    (1000, 1e6] for inputs > 1e6. A bounded CASE-chain unrolls the
    loop deterministically (``max_iters`` of 10 covers values up to
    1e36); each step is the same IEEE double division the reference
    performs, so results are bit-identical — unlike a log10-based
    closed form, which can disagree on boundaries.

    Implementation note: a naive ``when(v>1e6, v/1000)`` chain triples
    the expression tree per iteration (3^max_iters nodes — measured
    codegen blowup); instead, one CASE picks the first k for which k
    repeated divisions land ≤ 1e6, with each candidate spelled as the
    same exact division sequence — O(max_iters²) tiny tree, identical
    IEEE results.
    """
    v = col.cast("double")
    candidates = [v]
    for _ in range(max_iters):
        candidates.append(candidates[-1] / 1000.0)
    expr = None
    for k in range(max_iters):
        cond = candidates[k] <= 1_000_000.0
        expr = F.when(cond, candidates[k]) if expr is None else expr.when(cond, candidates[k])
    return F.round(expr.otherwise(candidates[max_iters]), scale)


def convert_if_needed(col: Column, scale: int = 6) -> Column:
    """Return/volatility normalization (P6): values with |v| > 1 are
    percentages → divide by 100; always round (reference:
    src/etl/transform.py:631-658)."""
    v = col.cast("double")
    return F.when(F.abs(v) > 1.0, F.round(v / 100.0, scale)).otherwise(F.round(v, scale))


def parse_percent_sql(path: str) -> str:
    """SQL-text form of :func:`parse_percent` for use inside
    higher-order lambdas. Direct cast first (scientific notation must
    not hit the regex, which would strip the exponent marker)."""
    return (
        f"coalesce(try_cast({path} AS DOUBLE), "
        f"try_cast(replace(translate(regexp_replace(CAST({path} AS STRING), "
        f"'[^0-9.,%-]', ''), ',', '.'), '%', '') AS DOUBLE))"
    )


def parsed_participation_sql(arr_sql: str, key_field: str) -> str:
    """Lenient-parse every ``participacion`` in a participation array
    (string → double via :func:`parse_percent_sql`), preserving the
    array-of-struct shape. Composes in front of
    :func:`smart_percent_array_sql` so string percents like
    ``"66,96%"`` survive the typed read (the raw schema keeps
    participacion as STRING for exactly this reason — see
    schemas._part_array)."""
    return (
        f"transform({arr_sql}, x -> named_struct("
        f"'{key_field}', x.{key_field}, "
        f"'participacion', {parse_percent_sql('x.participacion')}))"
    )


def _format_vote_sql(arr_sql: str) -> str:
    """SQL CASE classifying an array's percentage format (P5 vote,
    reference: src/etl/transform.py:534-566): 'x100' (66.96-style →
    /100), 'frac' (0.6696-style → keep), or 'unknown'. Majority range
    vote first, then the sum heuristic (90-110 → x100, 0.9-1.1 → frac).
    """
    nonnull = f"filter({arr_sql}, x -> x.participacion IS NOT NULL)"
    total = f"size({nonnull})"
    s = f"aggregate({nonnull}, 0D, (a, x) -> a + x.participacion)"
    gt1 = f"size(filter({nonnull}, x -> x.participacion > 1.0D))"
    return f"""CASE
        WHEN {total} = 0 THEN 'unknown'
        WHEN {gt1} * 2 > {total} AND {s} BETWEEN 90.0D AND 110.0D THEN 'x100'
        WHEN ({total} - {gt1}) * 2 > {total} AND {s} BETWEEN 0.9D AND 1.1D THEN 'frac'
        WHEN {s} BETWEEN 90.0D AND 110.0D THEN 'x100'
        WHEN {s} BETWEEN 0.9D AND 1.1D THEN 'frac'
        ELSE 'unknown' END"""


def convert_if_needed_sql(path: str, scale: int = 6) -> str:
    """SQL-text form of :func:`convert_if_needed` for composition inside
    higher-order lambdas (Column trees don't re-serialize to parseable
    SQL)."""
    v = f"CAST({path} AS DOUBLE)"
    return (
        f"CASE WHEN abs({v}) > 1.0D THEN round({v} / 100.0D, {scale}) "
        f"ELSE round({v}, {scale}) END"
    )


def smart_percent_array_sql(arr_sql: str, key_field: str, scale: int = 6) -> str:
    """SQL-text form of :func:`smart_percent_array`.

    The 'unknown' vote falls back to PER-VALUE conversion, exactly like
    the reference's ``_convertir_porcentaje_individual``
    (src/etl/transform.py:608-628): values in [0.9, 1.1] kept, in
    [90, 110] or > 1.1 divided by 100, else kept.

    The format vote (an O(n) aggregate over the array) is bound ONCE
    per row via an outer single-element ``transform`` lambda — naming
    it ``__fmt`` and referencing the lambda variable inside the
    per-element CASE. Inlining the vote into the element lambda would
    re-evaluate it per element (O(n²) per row) — the same lambda
    re-evaluation hazard fixed in ``dedup.with_minhash``; a temp
    column is no defense either, since CollapseProject inlines it
    straight back into each use site.
    """
    fmt = _format_vote_sql(arr_sql)
    v = "x.participacion"
    individual = f"""CASE
        WHEN abs({v}) BETWEEN 0.9D AND 1.1D THEN round({v}, {scale})
        WHEN abs({v}) BETWEEN 90.0D AND 110.0D THEN round({v} / 100.0D, {scale})
        WHEN abs({v}) > 1.1D THEN round({v} / 100.0D, {scale})
        ELSE round({v}, {scale}) END"""
    return f"""element_at(transform(array({fmt}), __fmt ->
              transform({arr_sql}, x -> named_struct(
              '{key_field}', x.{key_field},
              'participacion',
              CASE WHEN {v} IS NULL THEN CAST(NULL AS DOUBLE)
                   WHEN __fmt = 'x100' THEN round({v} / 100.0D, {scale})
                   WHEN __fmt = 'frac' THEN round({v}, {scale})
                   ELSE ({individual}) END))), 1)"""


def smart_percent_array(arr_sql: str, key_field: str, scale: int = 6) -> Column:
    """Two-pass percentage normalization over an array of structs (P5).

    Pass 1 (intra-row ``aggregate``): sum + count of >1 values; pass 2
    (intra-row ``transform``): convert each element per the detected
    format. Mirrors the reference's per-category two-pass
    (src/etl/transform.py:426-605) with zero shuffle — each category
    is one array inside one row, so higher-order functions do the
    whole job inside WholeStageCodegen.

    ``arr_sql`` is the SQL path of an
    ``array<struct{<key_field>: string, participacion: double}>``
    column; returns the same shape, participacion normalized to
    fractional scale and rounded.
    """
    return F.expr(smart_percent_array_sql(arr_sql, key_field, scale))


def participation_sum(arr_sql: str) -> Column:
    """Intra-row participation sum (A1): ``aggregate`` over the array,
    null participacion treated as 0 (reference gathers then sums,
    src/etl/transform.py:439-460)."""
    return F.expr(f"aggregate({arr_sql}, 0D, (a, x) -> a + coalesce(x.participacion, 0D))")


def range_bucket_counts(arr_sql: str, threshold: float = 1.0) -> Column:
    """Count of array values above/below a threshold (A2,
    reference: src/etl/transform.py:549-551) as a
    ``struct{gt, le}``."""
    nonnull = f"filter({arr_sql}, x -> x.participacion IS NOT NULL)"
    return F.expr(
        f"""named_struct(
            'gt', size(filter({nonnull}, x -> x.participacion > {threshold}D)),
            'le', size(filter({nonnull}, x -> x.participacion <= {threshold}D)))"""
    )
