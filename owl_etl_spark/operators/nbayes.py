"""Multinomial Naive Bayes — classification as pure aggregates.

The workhorse text classifier (spam gates, language/domain routing,
weak-label bootstrapping) is, unlike almost every other ML model,
EXACTLY a pair of groupBys: training is counting — class priors and
per-(class, token) counts — and scoring is one join + one sum. No
iterations, no gradients, no driver state: the whole model lives in
two vocabulary-sized DataFrames, which makes it the rare classifier
that trains in a single pass over 100 TB with nothing but map-side
combines. (Contrast operators/logreg.py, whose K iterations each
rescan; NB is the one-pass baseline it must beat to earn its keep.)

Exactness (the engine's micro-nat discipline): with add-one
smoothing,

    score(d, c) = ln P(c) + Σ_t n_d(t) · ln((cnt(t,c) + 1)/(mass_c + V))

every log factor is snapped to an integer micro-nat PER (token,
class) — one double ln of an exact integer ratio — so each document
score is an exact BIGINT dot product (token counts × integer
weights) plus an integer prior, and the argmax (score DESC, class
ASC) is a total order: reproducible on any engine/partitioning.

Unseen (token, class) pairs matter: their smoothed weight
ln(1/(mass_c + V)) is NOT zero, so scoring builds the token×class
grid (vocabulary-bounded, never row-bounded) and coalesces missing
counts to 0 — the naive join-only form silently favors classes that
HAVE seen a token, a real and classic NB bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nb_train_predict(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
) -> DataFrame:
    """Train multinomial NB with add-one smoothing on the corpus and
    score every document against every class (a training-accuracy /
    routing readout — hold out upstream for generalization numbers).
    Returns one row per document: ``(id, label, predicted,
    score_micro, correct)`` — predicted = argmax class, score its
    exact micro-nat log-joint. Documents with zero tokens emit the
    prior-only argmax. Null labels raise (woven guard)."""
    from owl_etl_spark.functions.text import normalize_text, tokens

    lab0 = F.col(label_col)
    lab = F.when(
        lab0.isNull(),
        F.raise_error(
            F.lit(
                f"nb_train_predict: {label_col} is NULL — drop or impute "
                "unlabeled rows before training"
            )
        ).cast("string"),
    ).otherwise(lab0.cast("string"))
    docs = df.select(
        F.col(id_col).alias("__id"),
        lab.alias("__y"),
        tokens(normalize_text(F.col(text_col))).alias("__a"),
    )
    toks = docs.select("__id", "__y", F.explode("__a").alias("tok"))
    # ----- training counts (all vocabulary-bounded after the groupBys)
    doc_counts = docs.groupBy("__y").agg(F.count(F.lit(1)).cast("long").alias("__dc"))
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).cast("long").alias("__nd"))
    tc = toks.groupBy("__y", "tok").agg(F.count(F.lit(1)).cast("long").alias("__tc"))
    mass = tc.groupBy("__y").agg(F.sum("__tc").cast("long").alias("__mass"))
    vocab = tc.select("tok").distinct()
    v_cnt = vocab.groupBy().agg(F.count(F.lit(1)).cast("long").alias("__v"))
    prior = (
        doc_counts.crossJoin(F.broadcast(n_docs))
        .select(
            "__y",
            F.round(
                F.log(F.col("__dc").cast("double") / F.col("__nd").cast("double"))
                * 1_000_000
            )
            .cast("long")
            .alias("__prior"),
        )
    )
    # token x class grid with smoothed micro-nat weights (unseen pairs
    # get ln(1/(mass+V)) — coalesce, don't drop)
    grid = (
        vocab.crossJoin(mass)
        .join(tc, ["tok", "__y"], "left")
        .crossJoin(F.broadcast(v_cnt))
        .select(
            "tok",
            "__y",
            F.round(
                F.log(
                    (F.coalesce(F.col("__tc"), F.lit(0)) + 1).cast("double")
                    / (F.col("__mass") + F.col("__v")).cast("double")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("__w"),
        )
    )
    # ----- scoring: per-doc token counts x grid weights, one sum per
    # (doc, class); docs join the grid on token only (class fan-out =
    # #classes, a constant)
    dtok = toks.groupBy("__id", "tok").agg(F.count(F.lit(1)).cast("long").alias("__n"))
    scored = (
        dtok.join(grid, "tok")
        .groupBy("__id", "__y")
        .agg(F.sum(F.col("__n") * F.col("__w")).cast("long").alias("__dot"))
    )
    # every doc x every class (zero-token docs keep prior-only rows)
    doc_class = docs.select("__id").crossJoin(prior.select("__y", "__prior"))
    full = (
        doc_class.join(scored, ["__id", "__y"], "left")
        .select(
            "__id",
            "__y",
            (F.coalesce(F.col("__dot"), F.lit(0)) + F.col("__prior"))
            .cast("long")
            .alias("__score"),
        )
    )
    w = Window.partitionBy("__id").orderBy(F.col("__score").desc(), F.col("__y").asc())
    best = full.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    truth = docs.select("__id", F.col("__y").alias("label"))
    return (
        best.join(truth, "__id")
        .select(
            F.col("__id").alias(id_col),
            "label",
            F.col("__y").alias("predicted"),
            F.col("__score").alias("score_micro"),
            (F.col("__y") == F.col("label")).alias("correct"),
        )
    )
