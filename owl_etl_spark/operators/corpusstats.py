"""Corpus-level statistics for training-data curation: vocabulary
growth (Heaps' law) and per-document token novelty.

Why an engine ships this: the vocabulary growth curve V(n) ≈ K·n^β is
the standard corpus health readout — a β collapsing toward 0 means
the crawl has gone stale (new documents add no new vocabulary, i.e.
dedup upstream is failing or the source is exhausted), a β near 1
means the corpus is still unsaturated (or the tokenizer is shattering
text into noise). Curation pipelines plot it per source before
deciding mixture weights.

Everything reduces to FIRST OCCURRENCE: a token contributes to the
vocabulary at the position of the first document containing it. One
explode + one min-aggregate per token (a single corpus-sized shuffle)
replaces the naive "count distinct over an expanding window" (which
is O(milestones) full scans); milestones then join against the tiny
(token, first_doc) spine — exact, deterministic, pure SQL both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vocabulary_growth(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_milestones: int = 10,
) -> DataFrame:
    """Heaps-law curve at ``n_milestones`` equal-count document
    milestones (documents ordered by ``id_col``): one row per
    milestone — ``(milestone, docs_cum, tokens_cum, vocab_cum)``, all
    exact BIGINTs. Tokens are lowercase whitespace splits (the q254
    tokenization); empty docs still count toward ``docs_cum``.

    Plan: one explode feeds BOTH the (token → first doc-rank)
    min-aggregate and the per-doc token counts; the ≤-milestone
    rollups are non-equi joins against an ``n_milestones``-row
    broadcast — fan-out is rows × milestones on the SMALL aggregated
    spines (vocab-sized / doc-sized), never on raw token instances.
    Document rank comes from a dense_rank over doc ids, so milestone
    boundaries are deterministic even with gaps in the id space."""
    if n_milestones < 1:
        raise ValueError(
            f"vocabulary_growth: n_milestones must be >= 1, got {n_milestones}"
        )
    from pyspark.sql import Window

    d = docs.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t")).filter(
        F.col("__id").isNotNull()
    )
    ranked = d.withColumn(
        "__rk", F.dense_rank().over(Window.orderBy(F.col("__id").asc()))
    )
    n_docs = ranked.agg(F.max("__rk").alias("__n"))
    # milestone doc-rank thresholds: ceil(m * n / M), m = 1..M
    spark = docs.sparkSession
    ms = spark.range(1, int(n_milestones) + 1).select(
        F.col("id").cast("long").alias("milestone")
    )
    ms = ms.crossJoin(F.broadcast(n_docs)).select(
        "milestone",
        F.expr(f"cast(ceil(milestone * __n / {int(n_milestones)}.0) as bigint)").alias(
            "__thr"
        ),
        F.col("__n"),
    )
    toks = ranked.select(
        "__rk",
        F.explode(F.split(F.lower(F.col("__t")), r"\s+")).alias("__tok"),
    ).filter(F.col("__tok") != "")
    first = toks.groupBy("__tok").agg(F.min("__rk").alias("__first"))
    per_doc = toks.groupBy("__rk").agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    # broadcast the MILESTONES (tiny), not the spines
    bms = F.broadcast(ms)
    vocab = (
        first.join(bms, F.col("__first") <= F.col("__thr"))
        .groupBy("milestone")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab_cum"))
    )
    tok_cum = (
        per_doc.join(bms, F.col("__rk") <= F.col("__thr"))
        .groupBy("milestone")
        .agg(F.sum("__cnt").cast("long").alias("tokens_cum"))
    )
    return (
        ms.join(vocab, "milestone", "left")
        .join(tok_cum, "milestone", "left")
        .select(
            "milestone",
            F.col("__thr").alias("docs_cum"),
            F.coalesce(F.col("tokens_cum"), F.lit(0)).cast("long").alias("tokens_cum"),
            F.coalesce(F.col("vocab_cum"), F.lit(0)).cast("long").alias("vocab_cum"),
        )
        .orderBy("milestone")
    )


def zipf_slope(
    docs: DataFrame,
    text_col: str,
    top_vocab: int = 1000,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus — the companion
    readout to ``vocabulary_growth``: token frequencies are ranked,
    and the log-log slope is fitted by OLS over the ``top_vocab``
    head. Natural language sits near slope −1; a much flatter slope
    says the tokenizer is shattering text (or the corpus is
    synthetic/templated), a much steeper one says boilerplate
    domination — both upstream-pipeline smells.

    Integer discipline: ranks and frequencies are exact BIGINTs;
    x = round(ln(rank)·1e3), y = round(ln(freq)·1e3) — MILLI-nats,
    deliberately coarser than the engine's usual micro, because the
    OLS cross-terms square the sums: at milli scale n·Σxy and ΣxΣy
    stay ≤ ~4·10¹⁴ for any top_vocab ≤ 10⁶ (BIGINT-safe, argued not
    hoped). The slope divides two exact BIGINTs once, rounded at 6.

    Returns ONE row: ``(n_tokens, vocab, fitted, slope, intercept_mnat)``
    with ``fitted`` = the head size actually used. Plan: one token
    aggregate (corpus-sized shuffle), one rank window over the
    VOCAB-sized counts, one scalar aggregate."""
    from pyspark.sql import Window

    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("__tok")
    ).filter(F.col("__tok") != "")
    cnt = toks.groupBy("__tok").agg(F.count(F.lit(1)).cast("long").alias("__f"))
    tot = cnt.agg(
        F.sum("__f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    ranked = (
        cnt.withColumn(
            "__r",
            F.row_number().over(
                Window.orderBy(F.col("__f").desc(), F.col("__tok").asc())
            ),
        )
        .filter(F.col("__r") <= int(top_vocab))
        .select(
            F.round(F.log(F.col("__r").cast("double")) * 1e3).cast("long").alias("__x"),
            F.round(F.log(F.col("__f").cast("double")) * 1e3).cast("long").alias("__y"),
        )
    )
    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").cast("long").alias("__sx"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("long").alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__sxx"),
    )
    return (
        tot.crossJoin(F.broadcast(sums))
        .select(
            "n_tokens",
            "vocab",
            F.col("__n").alias("fitted"),
            F.when(
                F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx") != 0,
                F.round(
                    (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
                    / (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")),
                    6,
                ),
            ).alias("slope"),
            F.when(
                F.col("__n") > 0,
                F.expr(
                    "(__sy - cast(round((cast(__n * __sxy - __sx * __sy as double)"
                    " / cast(__n * __sxx - __sx * __sx as double)) * __sx) as bigint))"
                    " div __n"
                ),
            )
            .cast("long")
            .alias("intercept_mnat"),
        )
    )
