"""kNN-graph scale shape: candidate volume is n·avg_list_size·n_probe,
not n², and a dense hot cluster (skewed inverted list) still completes
through the shuffled join."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.similarity import knn_graph


def _bulk_vectors(spark, n, dim=16, n_hot=0):
    """n deterministic spread vectors + n_hot near-identical ones (one
    dense semantic cluster → one hot inverted list)."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.cos(F.col("id") * (d + 1) / 97.0),
        ).alias("embedding"),
    )
    if n_hot:
        hot = spark.range(n, n + n_hot).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: (d + 1) * 1.0 + F.col("id") / 1e9,
            ).alias("embedding"),
        )
        base = base.unionByName(hot)
    return base


def test_knn_graph_bulk_with_hot_cluster(spark):
    """5k spread vectors + a 1k near-identical cluster: every source
    gets exactly k neighbors, wall-clock stays sane, and the hot list
    flows through the shuffled merge join rather than one broadcast."""
    emb = _bulk_vectors(spark, 5_000, n_hot=1_000)
    t0 = time.time()
    out = knn_graph(emb, k=3, n_centroids=16, n_probe=2)
    n = out.count()
    secs = time.time() - t0
    assert n == 6_000 * 3
    # dense-cluster members must find their own cluster (cosine ~1)
    hot_top = (
        out.filter((F.col("src_id") >= 5_000) & (F.col("rank") == 1))
        .agg(F.min("cosine"))
        .collect()[0][0]
    )
    assert hot_top > 0.999
    assert secs < 120, f"knn_graph 6k took {secs:.1f}s"
