"""Text-analysis expressions: tokenization, n-grams, language ID,
quality scoring, fingerprinting, keyword classification.

Generalizes the reference's keyword-classifier (P2,
src/etl/transform.py:109-168) and normalization helpers (§2.9) into
the text operators a large-scale training-data pipeline needs. All
pure Column expressions (JVM-side); nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace, strip — the canonical form used
    by dedup/fingerprint operators."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank)."""
    t = F.split(F.trim(col), r"\s+")
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(t)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def shingle_chain_sql(toks: str, n: int) -> str:
    """SQL for the array of space-joined ``n``-token windows of the
    token-array expression ``toks`` (which must have ≥ ``n`` elements
    — callers guard the short case).

    Round 12 (guide §4.2's interpreted-lambda trap): the old form
    ``transform(sequence(1, m), i -> array_join(slice(toks, i, n)))``
    re-evaluates everything inside the lambda body — including
    ``toks`` and a per-element slice copy — once per window position
    on the INTERPRETED higher-order path (no codegen, no
    subexpression reuse; measured 7.5× on q345's sibling builder).
    This form zips ``n`` aligned slices instead: the token array is
    referenced only OUTSIDE the lambdas, and each lambda is a bare
    two-argument concat. Output strings are byte-identical."""
    if n < 1:
        raise ValueError(f"shingle_chain_sql: n must be >= 1, got {n}")
    m = f"(size({toks}) - {n} + 1)"
    acc = f"slice({toks}, 1, {m})"
    for j in range(2, n + 1):
        acc = (
            f"zip_with({acc}, slice({toks}, {j}, {m}), "
            f"(a, b) -> concat(a, ' ', b))"
        )
    return acc


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    Built with zipped slices over the token array (see
    ``shingle_chain_sql``) — intra-row, no explode, no shuffle.
    Documents shorter than ``n`` tokens yield a single shingle of the
    whole text.
    """
    toks = f"split(trim({_sql(col)}), '\\\\s+')"
    return F.expr(
        f"""CASE
              WHEN size({toks}) < {n} THEN array(array_join({toks}, ' '))
              ELSE {shingle_chain_sql(toks, n)}
            END"""
    )


def char_ngrams(col: Column, n: int = 5) -> Column:
    """Character n-grams of the normalized text (for fuzzy dedup)."""
    s = normalize_text(col)
    return F.expr(
        f"""CASE WHEN length({_sql(s)}) <= {n} THEN array({_sql(s)})
             ELSE transform(sequence(1, length({_sql(s)}) - {n} + 1),
                            i -> substring({_sql(s)}, i, {n})) END"""
    )


def _sql(col: Column) -> str:
    # Column → SQL text for embedding inside higher-order expressions.
    from pyspark.sql.classic.column import Column as ClassicColumn

    if isinstance(col, ClassicColumn):
        return col._jc.toString()
    raise TypeError("expected a classic Column")


def keyword_class_score(col: Column, keywords: list[str]) -> Column:
    """Count how many of ``keywords`` appear in the lowercased text —
    the reference's per-class score (src/etl/transform.py:144-156)."""
    low = F.lower(col)
    score = F.lit(0)
    for kw in keywords:
        score = score + F.when(low.contains(kw.lower()), 1).otherwise(0)
    return score


def classify_keywords(col: Column, class_keywords: dict[str, list[str]], default: str = "Desconocido") -> Column:
    """Keyword-count argmax classifier (P2 generalized).

    Ties and zero-match fall to ``default`` unless exactly one class
    attains the max (the reference tie-breaks by insertion order of a
    dict + fallback rules; we use first-declared-class-wins on ties,
    matching Python's ``max`` over dict items).
    """
    scores = {name: keyword_class_score(col, kws) for name, kws in class_keywords.items()}
    best = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    out = F.lit(default)
    # Python max() returns the FIRST maximal item → check in declaration
    # order, first match wins.
    expr = None
    for name in class_keywords:
        cond = scores[name] == best
        expr = F.when((best > 0) & cond, name) if expr is None else expr.when((best > 0) & cond, name)
    return expr.otherwise(out) if expr is not None else out


#: The reference's four keyword classes, verbatim facts from
#: src/etl/transform.py:120-142 (substring containment over the
#: lowercased investment policy; first-declared class wins ties).
FIC_CLASS_KEYWORDS = {
    "Renta Fija": [
        "renta fija", "bonos", "cdt", "certificado de depósito", "tes",
        "títulos de deuda", "deuda pública", "tasa fija", "fixed income",
        "instrumentos de deuda", "papeles comerciales", "obligaciones",
    ],
    "Renta Variable": [
        "renta variable", "acciones", "equity", "bolsa de valores",
        "mercado accionario", "stocks", "índices accionarios",
        "participaciones", "capitalización bursátil",
    ],
    "Mixta": [
        "mixta", "balanced", "balanceado", "combinado",
        "renta fija y variable", "fija y variable", "diversificado",
        "multiactivo", "multi-activo",
    ],
    "Alternativa": [
        "alternativa", "alternative", "hedge fund", "fondos de cobertura",
        "private equity", "capital privado", "inmobiliario", "real estate",
        "commodities", "materias primas", "infraestructura", "derivados",
        "divisas", "forex", "opciones", "futuros",
    ],
}


def lang_stopword_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (language-ID heuristic).

    A tiny n-gram/stopword heuristic: count occurrences of
    high-frequency function words per language in the lowercased,
    space-padded text. Deterministic and SQL-expressible — the scale
    path for a real pipeline would swap in a trained model via a
    Pandas UDF with identical signature.
    """
    probes = {
        "en": [" the ", " and ", " of ", " is "],
        "es": [" el ", " la ", " de ", " que "],
        "de": [" der ", " die ", " und ", " ist "],
        "fr": [" le ", " la ", " et ", " est "],
        "zh": ["的", "是", "了"],
    }
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    out = {}
    for lang, words in probes.items():
        score = F.lit(0)
        for w in words:
            # occurrence count = (len - len(remove(w))) / len(w)
            score = score + (
                (F.length(padded) - F.length(F.replace(padded, F.lit(w), F.lit("")))) / len(w)
            ).cast("int")
        out[lang] = score
    return out


def lang_id(col: Column, default: str = "und") -> Column:
    """Argmax over lang_stopword_scores; 'und' when nothing matches."""
    scores = lang_stopword_scores(col)
    best = F.greatest(*scores.values())
    expr = None
    for lang in scores:
        cond = scores[lang] == best
        expr = F.when((best > 0) & cond, lang) if expr is None else expr.when((best > 0) & cond, lang)
    return expr.otherwise(F.lit(default))


def quality_features(col: Column) -> Column:
    """Document quality features as a struct:
    n_chars, n_tokens, avg_token_len, distinct_token_ratio,
    punct_ratio, digit_ratio — the standard cheap pre-filters of a
    training-data pipeline. All rounded to 6 dp for stable comparison.
    """
    s = _sql(col)
    toks = f"split(trim({s}), '\\\\s+')"
    return F.expr(
        f"""named_struct(
          'n_chars', length({s}),
          'n_tokens', size({toks}),
          'avg_token_len', round(length(regexp_replace({s}, '\\\\s+', '')) / size({toks}), 6),
          'distinct_token_ratio', round(size(array_distinct({toks})) / size({toks}), 6),
          'punct_ratio', round((length({s}) - length(regexp_replace({s}, '[.,;:!?]', ''))) / length({s}), 6),
          'digit_ratio', round((length({s}) - length(regexp_replace({s}, '[0-9]', ''))) / length({s}), 6)
        )"""
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 (not xxhash64) so independent engines agree on the value —
    this is the key for exact dedup clusters.
    """
    return F.md5(normalize_text(col))


#: Redaction patterns for common PII-ish spans (training-data hygiene).
#: Engine-portable regex subset (no lookbehind — works in Java regex
#: and RE2 alike).
REDACTION_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
}


def redact(col: Column, patterns: dict[str, str] | None = None, token: str = "[REDACTED]") -> Column:
    """Replace PII-ish spans with a token — the standard scrubbing pass
    before corpus publication. Chained regexp_replace (JVM-side)."""
    out = col
    for pat in (patterns or REDACTION_PATTERNS).values():
        out = F.regexp_replace(out, pat, token)
    return out


def redaction_counts(col: Column, patterns: dict[str, str] | None = None) -> Column:
    """struct of per-pattern match counts (audit metric for the scrub)."""
    pats = patterns or REDACTION_PATTERNS
    fields = []
    for name, pat in pats.items():
        fields.append(F.regexp_count(col, F.lit(pat)).cast("long").alias(name))
    return F.struct(*fields)


def clean_text(col: Column) -> Column:
    """Canonical corpus cleaning: strip simple markup tags, collapse
    entities and whitespace, trim. Deliberately conservative — cleaning
    that alters token content belongs in explicit operators."""
    out = F.regexp_replace(col, r"<[^>]{1,200}>", " ")     # tags
    out = F.regexp_replace(out, r"&[a-z]{2,6};", " ")      # entities
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def chunk_tokens(tokens_col: Column, size: int = 50, overlap: int = 10) -> Column:
    """Split a token array into overlapping fixed-size windows
    (``array<string>`` of space-joined chunks) — the standard
    pre-tokenization pass that turns long documents into training-
    window-sized pieces. Stride = ``size - overlap``; the last chunk
    may be short; a doc shorter than ``size`` yields one chunk.
    Intra-row higher-order functions — zero shuffle at any corpus
    size; pair with ``posexplode`` for (doc, chunk_idx, chunk) rows.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    n = F.size(tokens_col)
    nchunks = F.when(n <= size, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(size)).cast("double") / stride).cast("int")
    )
    idx = F.sequence(F.lit(0), nchunks - 1)
    return F.transform(
        idx, lambda i: F.array_join(F.slice(tokens_col, i * stride + 1, size), " ")
    )
