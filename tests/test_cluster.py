"""K-means + IVF ANN tests on the synthetic embeddings (10 labeled
clusters by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from owl_etl_spark.sources.readers import read_table


def test_kmeans_and_ivf_recall(spark):
    from owl_etl_spark.operators.cluster import assign_clusters, ivf_knn, kmeans_fit
    from owl_etl_spark.operators.knn import brute_force_knn

    em = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    centroids = kmeans_fit(em, k=8, max_iters=3)
    assert centroids.shape == (8, 64)

    clustered = assign_clusters(em, centroids)
    sizes = clustered.groupBy("cluster_id").count().collect()
    # clustering must be non-degenerate: several populated clusters
    assert len(sizes) >= 4
    assert max(r["count"] for r in sizes) < 500

    q = em.filter(F.col("vec_id") < 5)
    bf = {(r.query_id, r.neighbor_id) for r in brute_force_knn(q, em, k=5).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in ivf_knn(q, em, centroids, k=5, n_probes=3).collect()}
    recall = len(bf & ivf) / len(bf)
    # embeddings are label-clustered by construction; 3-probe IVF should
    # recover most exact neighbors
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_kmeans_deterministic(spark):
    from owl_etl_spark.operators.cluster import kmeans_fit

    em = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    c1 = kmeans_fit(em, k=4, max_iters=2)
    c2 = kmeans_fit(em, k=4, max_iters=2)
    assert (c1 == c2).all()
