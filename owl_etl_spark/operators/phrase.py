"""Positional-index phrase search — exact multi-word matching the way
a search engine does it, as ONE aggregate instead of a k-way join.

``bm25_topk`` (operators/ranking.py) ranks by bag-of-words relevance;
phrase queries ("table scan" as a unit, not table…scan anywhere) need
token POSITIONS. The textbook plan self-joins the positional index
k−1 times (P₀ ⋈ P₁ on pos+1 ⋈ …) — k−1 shuffles and a skew hazard on
common words. This operator uses the ANCHOR trick instead: a token
matching word j of the phrase at position p votes for anchor p − j,
and a phrase occurrence is an anchor with ALL k distinct votes — so
the whole search is tokenize → filter to the phrase's words (tiny
fraction of the index) → ONE groupBy (doc, anchor) with a distinct
count. One shuffle, volumes bounded by occurrences of the phrase's
own words, no join at all.

Exact semantics: token-level adjacency under the library's shared
normalizer (functions/text.py — same tokens as q46/q104/q226/q235,
so the phrase index and every other text gate agree on what a word
is); overlapping occurrences all count; repeated words in the phrase
handled correctly (votes are per (j, anchor), and a position can
vote for several j's independently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phrase_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
) -> DataFrame:
    """Documents containing ``phrase`` as consecutive tokens:
    ``(id, n_matches, first_pos)`` — occurrence count and the 1-based
    token position of the earliest match; non-matching docs emit no
    row. The phrase is normalized with the same tokenizer as the
    corpus; a phrase of fewer than 2 tokens raises (single-token
    lookup is a plain filter, not a phrase problem)."""
    words = phrase.strip().lower().split()
    if len(words) < 2:
        raise ValueError(
            f"phrase_search: need >= 2 tokens, got {phrase!r} — use a plain "
            "filter for single-word lookup"
        )
    from owl_etl_spark.functions.text import normalize_text, tokens

    k = len(words)
    pos = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens(normalize_text(F.col(text_col)))).alias("__p0", "tok"),
    ).select("__id", (F.col("__p0") + 1).alias("__pos"), "tok")
    # votes: word j at position p -> anchor p - j  (duplicated phrase
    # words vote once per matching j)
    votes = None
    for j, wd in enumerate(words):
        v = pos.filter(F.col("tok") == wd).select(
            "__id", (F.col("__pos") - j).alias("__anchor"), F.lit(j).alias("__j")
        )
        votes = v if votes is None else votes.unionAll(v)
    hits = (
        votes.groupBy("__id", "__anchor")
        .agg(F.count_distinct("__j").alias("__k"))
        .filter((F.col("__k") == k) & (F.col("__anchor") >= 1))
    )
    return (
        hits.groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min("__anchor").cast("long").alias("first_pos"),
        )
        .select(F.col("__id").alias(id_col), "n_matches", "first_pos")
    )
