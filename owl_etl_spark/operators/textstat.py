"""Readability statistics: Flesch reading ease in exact integer
micro-units.

Complements the text-quality family (functions/text.py: Gopher gates,
quality ratios, token estimates) with the classic readability score a
training-data pipeline uses as a document-quality signal:

    FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

Counting heuristics (deterministic, regex-only): words = maximal
[a-z]+ runs of the lowercased text; syllables = maximal vowel-group
[aeiouy]+ runs (the standard cheap syllable proxy); sentences =
[.!?]+ runs, clamped to ≥1 so unpunctuated text scores as one long
sentence instead of dividing by zero.

Determinism: counts are exact ints from regexp_count; the two ratio
terms scale to micro-units with integer division (non-negative, so
truncate == floor on every engine); no doubles anywhere. Map-only —
zero shuffles, whole-stage codegen, the per-row shape that runs at
scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def readability_report(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """One row per document: ``(id, n_words, n_sentences,
    n_syllables, flesch_micro)`` — flesch_micro = 206835000 −
    (1015000·words div sentences) − (84600000·syllables div words);
    null when the text has no words (nothing to score). Scores can be
    far below the human-calibrated 0–100 band on degenerate text
    (one-sentence word soup) — that's the formula speaking, and
    exactly the signal a quality gate thresholds on."""
    # null text counts as empty (0 words -> null score), not as
    # null-propagated counts — a count column should never be null
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    words = F.regexp_count(low, F.lit(r"[a-z]+")).cast("long")
    sents = F.greatest(
        F.regexp_count(low, F.lit(r"[.!?]+")).cast("long"), F.lit(1).cast("long")
    )
    syls = F.regexp_count(low, F.lit(r"[aeiouy]+")).cast("long")
    counts = df.select(
        F.col(id_col),
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syls.alias("n_syllables"),
    )
    return counts.withColumn(
        "flesch_micro",
        F.when(
            F.col("n_words") > 0,
            F.lit(206835000).cast("long")
            - F.expr("1015000 * n_words div n_sentences")
            - F.expr("84600000 * n_syllables div n_words"),
        ),
    )
