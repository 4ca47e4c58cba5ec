"""Distinctive terms per group via Dunning's log-likelihood ratio (G²).

"Which words characterize THIS slice of the corpus vs the rest?" —
the corpus-comparison primitive behind domain tagging, topic drift
inspection and keyword labeling. Raw frequency surfaces stopwords;
TF-IDF ignores the contrast corpus' counts. Dunning's G² (Dunning
1993, "Accurate Methods for the Statistics of Surprise and
Coincidence") scores each (group, term) by the log-likelihood ratio
of the 2×2 contingency table

        a = count(term, group)     b = count(term, rest)
        c = tokens(group) − a      d = tokens(rest) − b

    G² = 2·Σ_cell O·ln(O/E),  E_cell = row_total·col_total / N

which is robust for rare terms where chi-square's normal
approximation fails.

Plan shape: one (group, term) count (map-side combined, shuffle
volume tracks vocabulary — not corpus — size), one term-margin
aggregate joined back broadcast-style, per-row G² arithmetic, one
top-k window per group. At 100 TB the only data-sized stage is the
token count; everything after runs on the vocabulary.

Determinism: all table cells are exact BIGINTs; each row's G² is a
single per-row double expression over those integers (identical on
any engine — the q124/q155 discipline) rounded to integer micro-units
before the rank, and ranking ties break on the term string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinctive_terms(
    counts: DataFrame,
    group_col: str,
    term_col: str,
    count_col: str,
    top_k: int = 10,
) -> DataFrame:
    """From per-(group, term) BIGINT ``counts``, the ``top_k`` terms
    of each group by G² — restricted to terms OVER-represented in the
    group (a·d > b·c), since under-representation also inflates G²
    but answers a different question.

    Returns ``(group, term, n_term_group, n_term_rest,
    g2_micro, rk)`` with rk 1..top_k by (G² desc, term asc).
    """
    g, t = F.col(group_col), F.col(term_col)
    base = counts.select(
        g.alias("__g"), t.alias("__t"), F.col(count_col).cast("long").alias("__a")
    ).where(g.isNotNull() & t.isNotNull() & (F.col(count_col) > 0))
    term_tot = base.groupBy("__t").agg(F.sum("__a").cast("long").alias("__ct"))
    grp_tot = base.groupBy("__g").agg(F.sum("__a").cast("long").alias("__cg"))
    n_tot = base.agg(F.sum("__a").cast("long").alias("__N"))
    j = (
        base.join(term_tot, "__t")
        .join(F.broadcast(grp_tot), "__g")
        .crossJoin(F.broadcast(n_tot))
        .withColumn("__b", (F.col("__ct") - F.col("__a")).cast("long"))
        .withColumn("__c", (F.col("__cg") - F.col("__a")).cast("long"))
        .withColumn(
            "__d",
            (F.col("__N") - F.col("__ct") - F.col("__cg") + F.col("__a")).cast("long"),
        )
    )

    def cell(o: str, row_tot, col_tot):
        # O·ln(O/E) with E = row_tot·col_tot/N; O = 0 contributes 0.
        # ln arguments are ratios of exact BIGINTs -> per-row doubles
        # identical across engines.
        oc = F.col(o).cast("double")
        return F.when(
            F.col(o) > 0,
            oc
            * (
                F.log(oc)
                + F.log(F.col("__N").cast("double"))
                - F.log(row_tot.cast("double"))
                - F.log(col_tot.cast("double"))
            ),
        ).otherwise(F.lit(0.0))

    ct, cg = F.col("__ct"), F.col("__cg")
    rest_t = F.col("__N") - ct  # col totals: term / not-term
    rest_g = F.col("__N") - cg  # row totals: group / rest
    g2 = 2.0 * (
        cell("__a", cg, ct)
        + cell("__b", rest_g, ct)
        + cell("__c", cg, rest_t)
        + cell("__d", rest_g, rest_t)
    )
    # Over-representation a·d > b·c simplifies algebraically to
    # a·N > ct·cg; computed in decimal(38,0) so the product is exact
    # with no BIGINT bound (N up to ~10^19 — beyond any corpus).
    over = (
        F.col("__a").cast("decimal(38,0)") * F.col("__N").cast("decimal(19,0)")
        > F.col("__ct").cast("decimal(38,0)") * F.col("__cg").cast("decimal(19,0)")
    )
    scored = j.where(over).withColumn("__g2", F.round(g2 * 1_000_000).cast("long"))
    w = Window.partitionBy("__g").orderBy(F.col("__g2").desc(), F.col("__t").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= int(top_k))
        .select(
            F.col("__g").alias(group_col),
            F.col("__t").alias(term_col),
            F.col("__a").alias("n_term_group"),
            F.col("__b").alias("n_term_rest"),
            F.col("__g2").alias("g2_micro"),
            "rk",
        )
    )


def ctfidf_terms(
    counts: DataFrame,
    group_col: str,
    term_col: str,
    count_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Class-based TF-IDF (the BERTopic labeling formula): score each
    (class, term) by tf_{t,c} · ln(1 + A/f_t), where f_t is the
    term's corpus frequency and A the average class token mass — the
    topic/cluster LABELER, complementing ``distinctive_terms``: G²
    asks "is this term statistically surprising here", c-TF-IDF asks
    "does this term describe this class", which tolerates terms that
    are common in several large classes.

    Input is pre-aggregated (class, term, count) rows (same contract
    as ``distinctive_terms`` — tokenize upstream). Determinism: tf is
    exact BIGINT; the idf factor round(1e6·ln(1 + A/f_t)) is snapped
    PER TERM (one double ln of exact-integer-derived values — the
    module's micro discipline), so score_micro = tf · idf_micro is an
    exact BIGINT product and ranking (score DESC, term ASC) is total.

    Returns ``(group, term, tf, score_micro, rank)`` with
    rank ≤ ``top_k``. Plan: one term-margin aggregate (vocabulary-
    sized) joined back, one top-k window per class — nothing scales
    with corpus rows past the input counts.
    """
    if top_k < 1:
        raise ValueError(f"ctfidf_terms: top_k must be >= 1, got {top_k}")
    tf = F.col(count_col).cast("long")
    base = counts.select(
        F.col(group_col).alias("__g"), F.col(term_col).alias("__t"), tf.alias("__tf")
    ).filter(F.col("__tf") > 0)
    f_t = base.groupBy("__t").agg(F.sum("__tf").cast("long").alias("__ft"))
    mass = base.groupBy("__g").agg(F.sum("__tf").cast("long").alias("__m"))
    a_row = mass.groupBy().agg(
        (F.sum("__m").cast("double") / F.count(F.lit(1)).cast("double")).alias("__A")
    )
    idf = F.round(
        F.log(
            F.lit(1.0) + F.col("__A") / F.col("__ft").cast("double")
        )
        * 1_000_000
    ).cast("long")
    scored = (
        base.join(f_t, "__t")
        .crossJoin(F.broadcast(a_row))
        .select(
            "__g", "__t", "__tf", (F.col("__tf") * idf).cast("long").alias("__score")
        )
    )
    w = Window.partitionBy("__g").orderBy(F.col("__score").desc(), F.col("__t").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(top_k))
        .select(
            F.col("__g").alias(group_col),
            F.col("__t").alias(term_col),
            F.col("__tf").alias("tf"),
            F.col("__score").alias("score_micro"),
            "rank",
        )
    )
