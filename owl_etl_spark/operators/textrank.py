"""TextRank keyword extraction — per-document PageRank over word
co-occurrence graphs, distributed across ALL documents at once.

The classic unsupervised keyworder (Mihalcea & Tarau): tokens that
co-occur within a sliding window vote for each other; the stationary
scores surface the terms that hold the document together. Spark has
no per-group graph iteration — the engine's shape is to run the power
iteration for EVERY document simultaneously: node and edge tables
keyed by (doc, token), each iteration two hash joins + one aggregate
on the same key prefix, K fixed iterations unrolled by the driver
loop. A million documents iterate together in the same K passes —
per-doc loops would be a million jobs.

INTEGER power iteration (the q233 discipline — no float anywhere):
scores live in micro-units, and the damped update

    s_t(w) = 150000 + (85 · Σ_{v∈N(w)} (s_{t-1}(v) div deg(v))) div 100

is exact BIGINT arithmetic — per-edge contributions use integer
division (each node donates floor(s/deg) to every neighbor), the
damping 0.85 is the exact rational 85/100 applied to an integer. The
whole K-iteration trajectory is reproducible bit-for-bit on any
engine and any partitioning, and q239's DuckDB oracle replays all K
iterations as unrolled CTEs.

Graph semantics (declared, matched by the oracle): window-2
co-occurrence (adjacent + distance-2 token pairs), undirected,
DEDUPLICATED (binary edges — repeated co-occurrence does not add
weight; the standard binary-TextRank variant), self-pairs dropped.
Isolated tokens (no neighbor) keep the base score 150000·…/… — they
simply never receive contributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def textrank_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    iterations: int = 5,
    top_k: int = 5,
) -> DataFrame:
    """Top-``top_k`` keywords per document by ``iterations`` rounds of
    integer TextRank. Returns ``(id, token, score_micro, rank)``
    ordered within each doc by (score DESC, token ASC) — total order,
    deterministic. Documents whose graph is empty (< 2 distinct
    non-adjacent... i.e. no co-occurrence pair) emit no rows.
    """
    if iterations < 1 or top_k < 1:
        raise ValueError(
            f"textrank_keywords: iterations/top_k must be >= 1, got "
            f"{iterations}/{top_k}"
        )
    from owl_etl_spark.functions.text import normalize_text, tokens

    toked = df.select(
        F.col(id_col).alias("__id"), tokens(normalize_text(F.col(text_col))).alias("__a")
    )

    def pair_expr(dist: int) -> F.Column:
        return F.expr(
            f"CASE WHEN size(__a) > {dist} THEN "
            f"transform(sequence(1, size(__a) - {dist}), "
            f"i -> struct(element_at(__a, i) AS w1, "
            f"element_at(__a, i + {dist}) AS w2)) "
            "ELSE array() END"
        )

    raw = toked.select(
        "__id", F.explode(F.concat(pair_expr(1), pair_expr(2))).alias("__p")
    ).select(
        "__id",
        F.least(F.col("__p.w1"), F.col("__p.w2")).alias("a"),
        F.greatest(F.col("__p.w1"), F.col("__p.w2")).alias("b"),
    )
    und = raw.filter(F.col("a") != F.col("b")).distinct()
    adj = und.select("__id", F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select("__id", F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = adj.groupBy("__id", "src").agg(F.count(F.lit(1)).cast("long").alias("__deg"))
    nodes = deg.select("__id", F.col("src").alias("tok"), "__deg")
    scores = nodes.select("__id", "tok", F.lit(1_000_000).cast("long").alias("__s"))
    for _ in range(int(iterations)):
        contrib = (
            adj.join(
                scores.select(
                    "__id", F.col("tok").alias("src"), F.col("__s")
                ),
                ["__id", "src"],
            )
            .join(deg, ["__id", "src"])
            .select(
                "__id",
                F.col("dst").alias("tok"),
                F.expr("__s div __deg").alias("__c"),
            )
            .groupBy("__id", "tok")
            .agg(F.sum("__c").cast("long").alias("__in"))
        )
        scores = (
            nodes.select("__id", "tok")
            .join(contrib, ["__id", "tok"], "left")
            .select(
                "__id",
                "tok",
                F.expr(
                    "CAST(150000 + (85 * coalesce(__in, 0)) div 100 AS BIGINT)"
                ).alias("__s"),
            )
        )
    w = Window.partitionBy("__id").orderBy(F.col("__s").desc(), F.col("tok").asc())
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(top_k))
        .select(
            F.col("__id").alias(id_col),
            F.col("tok").alias("token"),
            F.col("__s").alias("score_micro"),
            "rank",
        )
    )
