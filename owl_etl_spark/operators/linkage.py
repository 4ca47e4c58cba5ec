"""Entity resolution (record linkage): blocking → pairwise similarity
→ transitive clustering into entity ids.

The reference resolves entities by hand-maintained alias tables and
tiered fuzzy string matching against a reference list
(src/etl/transform.py's gestor/custodio canonicalization — the J1/J2
operators). This module is the GENERAL form a warehouse needs when
there is no reference list: discover which records ARE the same
entity. Classic three-stage shape (Fellegi–Sunter pipelines,
dedupe.io, Splink all share it):

1. **Blocking** — a cheap deterministic key (here: the name's last
   token) so only same-block records are compared. Pair space drops
   from n² to Σ block². Known limit of ANY single blocking key: a typo
   in the key token hides the pair (production linkage unions edges
   from several blocking passes — first token, soundex, LSH — before
   clustering; ``similarity_edges`` composes with union for that). For
   adversarial/heavy blocks swap in the LSH banding of
   ``dedup.minhash_lsh_pairs`` — same edges contract, scale guards
   included.
2. **Scoring** — Jaccard over distinct character trigrams of the
   normalized name, computed as integer intersect/union counts via an
   equi-join on md5 trigram hashes (engine-portable, no UDF).
3. **Clustering** — similarity edges at ``threshold`` feed
   ``dedup.connected_components``; entity_id = min member id, so
   labels are stable under any partitioning and re-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from owl_etl_spark.functions.hashing import md5_long
from owl_etl_spark.operators.dedup import connected_components


def _norm(name_col: str):
    return F.lower(F.trim(F.col(name_col)))


def name_trigrams(df: DataFrame, id_col: str, name_col: str) -> DataFrame:
    """(id, block, h): one row per DISTINCT character trigram of the
    normalized name, hashed to a compact portable int. Names shorter
    than 3 chars contribute themselves as a single token. Intra-row →
    zero shuffles."""
    norm = _norm(name_col)
    tri = F.expr(
        f"CASE WHEN length(lower(trim({name_col}))) < 3 "
        f"THEN array(lower(trim({name_col}))) "
        f"ELSE array_distinct(transform(sequence(1, length(lower(trim({name_col}))) - 2), "
        f"i -> substring(lower(trim({name_col})), i, 3))) END"
    )
    return df.select(
        F.col(id_col),
        F.element_at(F.split(norm, " "), -1).alias("block"),
        F.explode(tri).alias("__t"),
    ).select(id_col, "block", md5_long(F.col("__t")).alias("h"))


def similarity_edges(
    df: DataFrame,
    id_col: str,
    name_col: str,
    threshold: float = 0.6,
) -> DataFrame:
    """(id_a, id_b, jaccard) for same-block pairs with trigram-Jaccard
    >= threshold. Intersections come from ONE self-equi-join on
    (block, trigram-hash) — per-task fan-out is bounded by each
    trigram's in-block df (the q29 hot-key caveat applies; LSH
    blocking is the documented heavy-block path). Jaccard =
    inter / (|A| + |B| - inter) over exact integers, rounded at 6 for
    engine portability."""
    tri = name_trigrams(df, id_col, name_col)
    sizes = tri.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    a = tri.select(F.col(id_col).alias("id_a"), "block", "h")
    b = tri.select(F.col(id_col).alias("id_b"), "block", "h")
    inter = (
        a.join(b, ["block", "h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    threshold: float = 0.6,
    max_iters: int = 10,
) -> DataFrame:
    """Full entity resolution: every input row labeled with its
    ``entity_id`` (= min id in its similarity component; singletons
    label themselves). Deterministic end to end — the whole pipeline
    is oracle-replayable in SQL (q123)."""
    edges = similarity_edges(df, id_col, name_col, threshold)
    return connected_components(
        edges, df.select(id_col), id_col, max_iters=max_iters
    ).withColumnRenamed("component", "entity_id")


def select_canonical(
    df: DataFrame,
    labels: DataFrame,
    id_col: str,
    cluster_col: str = "entity_id",
    order_exprs: list | None = None,
) -> DataFrame:
    """Pick ONE canonical record per cluster — the step every
    dedup/linkage pipeline ends with (C4 keeps the longest member of a
    dup cluster; master-data systems keep the most complete record).

    ``order_exprs``: descending-priority ordering columns (first by
    these, ties by ``id_col`` ascending — always total, so the
    survivor set is deterministic under any partitioning). Returns the
    full surviving rows plus ``cluster_col`` and ``n_members``.

    Plan: one join to attach labels; the rank-1 window stands ALONE so
    it plans as WindowGroupLimit (map-side partial top-1, the q07/W1
    property — a count-over-cluster window in the same pass would
    defeat it by needing every row); ``n_members`` comes from a
    map-side-combined aggregate over the skinny labels frame instead.
    At 100 TB the window shuffle carries one partial survivor per
    cluster per map task, never the corpus.
    """
    from pyspark.sql import Window

    order_exprs = order_exprs or []
    counts = labels.groupBy(cluster_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    labeled = df.join(labels, id_col)
    w = Window.partitionBy(cluster_col).orderBy(
        *order_exprs, F.col(id_col).asc()
    )
    return (
        labeled.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
        .join(counts, cluster_col)
    )
