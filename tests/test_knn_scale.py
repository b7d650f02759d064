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


def test_knn_classify_majority_and_tiebreak(spark):
    """Majority label wins; a 2-2 vote tie breaks toward the label with
    the closest member; the IVF variant plugs in unchanged."""
    from datalake_indexes_spark.operators.similarity import ivf_topk, knn_classify

    # query 100 at origin-ish; 3 label-1 vectors very close, 2 label-2
    # further away -> majority 1.  query 200 equidistant-ish 2-2 split:
    # label-3's best member is closer than label-4's -> 3 wins.
    rows = [
        (100, [1.0, 0.0, 0.0, 0.0], 9),
        (1, [0.99, 0.1, 0.0, 0.0], 1),
        (2, [0.99, 0.0, 0.1, 0.0], 1),
        (3, [0.99, 0.0, 0.0, 0.1], 1),
        (4, [0.5, 0.8, 0.0, 0.0], 2),
        (5, [0.5, 0.0, 0.8, 0.0], 2),
        (200, [0.0, 1.0, 0.0, 0.0], 9),
        (6, [0.1, 0.99, 0.0, 0.0], 3),
        (7, [0.0, 0.7, 0.7, 0.0], 3),
        (8, [0.05, 0.9, 0.3, 0.0], 4),
        (9, [0.0, 0.6, 0.8, 0.0], 4),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    corpus = emb.filter(F.col("vec_id") < 100)
    queries = emb.filter(F.col("vec_id") >= 100)
    out = {r["query_id"]: r for r in
           knn_classify(corpus, queries, k=5).collect()}
    assert out[100]["pred_label"] == 1 and out[100]["votes"] == 3
    assert out[200]["pred_label"] == 3 and out[200]["votes"] == 2
    # IVF path: centroid seeds are ids < n_centroids, and this corpus
    # starts at id 1, so n_centroids=2 seeds exactly ONE centroid —
    # the single-list case that degrades to exact search
    ivf1 = lambda c, q, k, vec_col, id_col: ivf_topk(
        c, q, k=k, vec_col=vec_col, id_col=id_col, n_centroids=2
    )
    out_ivf = {r["query_id"]: r["pred_label"] for r in
               knn_classify(corpus, queries, k=5, topk_fn=ivf1).collect()}
    assert out_ivf == {100: 1, 200: 3}


def test_cluster_purity_report_semantics(spark):
    """Two well-separated clusters with one intruder each way: purity
    and entropy come out exactly; singleton-label cluster has entropy 0."""
    from datalake_indexes_spark.operators.similarity import cluster_purity_report

    rows = [
        # centroid seeds: ids 0 and 1 (n_centroids=2)
        (0, [1.0, 0.0, 0.0, 0.0], 1),
        (1, [0.0, 1.0, 0.0, 0.0], 2),
        # cluster 0: three more label-1 members + one mislabeled
        (2, [0.99, 0.05, 0.0, 0.0], 1),
        (3, [0.98, 0.0, 0.05, 0.0], 1),
        (4, [0.97, 0.0, 0.0, 0.05], 1),
        (5, [0.96, 0.1, 0.0, 0.0], 2),
        # cluster 1: pure label-2
        (6, [0.05, 0.99, 0.0, 0.0], 2),
        (7, [0.0, 0.98, 0.05, 0.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["centroid"]: r for r in
           cluster_purity_report(emb, n_centroids=2).collect()}
    c0, c1 = out[0], out[1]
    assert c0["n_members"] == 5 and c0["top_label"] == 1
    assert c0["purity"] == 0.8
    # H = -(0.8 log2 0.8 + 0.2 log2 0.2) = 0.7219
    assert abs(c0["label_entropy"] - 0.7219) < 1e-4
    assert c1["n_members"] == 3 and c1["top_label"] == 2
    assert c1["purity"] == 1.0 and c1["label_entropy"] == 0.0


def test_recall_report_pluggable_search(spark):
    """search_fn swap: gauging the exact search itself reports recall 1;
    the LSH strategy plugs in through the same hook."""
    import math

    from datalake_indexes_spark.operators.similarity import (
        ann_recall_report,
        cosine_topk,
        hyperplane_lsh_topk,
    )

    rows = [
        (i, [math.sin(0.3 * (i % 6 + 1) * (d + 1)) + 0.01 * i for d in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    q = emb.filter(F.col("vec_id") < 4)
    exact_r = ann_recall_report(emb, q, k=3, search_fn=cosine_topk).collect()[0]
    assert exact_r["recall"] == 1.0 and exact_r["n_truth"] == 12
    lsh = lambda c, qq, k, vec_col, id_col: hyperplane_lsh_topk(
        c, qq, k=k, vec_col=vec_col, id_col=id_col, dim=8
    )
    lsh_r = ann_recall_report(emb, q, k=3, search_fn=lsh).collect()[0]
    assert 0.0 <= lsh_r["recall"] <= 1.0 and lsh_r["n_hits"] <= lsh_r["n_truth"]


def test_lsh_multiprobe_topk_recall_dominates_single(spark):
    """OR over tables: every query recalls at least as many true
    neighbors as the single-table bucket search; soundness — reported
    pairs always carry their exact cosine."""
    import math

    from datalake_indexes_spark.operators.similarity import (
        ann_recall_report,
        hyperplane_lsh_topk,
        hyperplane_lsh_topk_multiprobe,
    )

    rows = []
    for i in range(120):
        arch = i % 10
        rows.append(
            (i, [math.sin(0.4 * (arch + 1) * (d + 1)) + 0.02 *
                 math.cos(1.3 * i * (d + 2)) for d in range(16)])
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    q = emb.filter(F.col("vec_id") < 6)
    single = lambda c, qq, k, vec_col, id_col: hyperplane_lsh_topk(
        c, qq, k=k, vec_col=vec_col, id_col=id_col, dim=16
    )
    multi = lambda c, qq, k, vec_col, id_col: hyperplane_lsh_topk_multiprobe(
        c, qq, k=k, vec_col=vec_col, id_col=id_col, dim=16, n_tables=4
    )
    r_single = ann_recall_report(emb, q, k=3, search_fn=single).collect()[0]
    r_multi = ann_recall_report(emb, q, k=3, search_fn=multi).collect()[0]
    assert r_multi["n_hits"] >= r_single["n_hits"]
    assert r_multi["recall"] > 0.5  # 4 tables on a clustered fixture


def test_hard_negatives_excludes_pairs_before_rank(spark):
    """Exclusion happens pre-rank: dropping the top neighbor promotes the
    next one into rank 1 and k rows still come back."""
    from pyspark.sql import functions as F

    from datalake_indexes_spark.operators.similarity import cosine_topk, hard_negatives

    import math
    rows = []
    for i in range(20):
        ang = i * 0.1
        rows.append((i, [math.cos(ang), math.sin(ang)] + [0.0] * 2))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0)

    base = cosine_topk(emb, q, k=3).collect()
    top1 = [r.neighbor_id for r in base if r.rank == 1][0]
    ex = spark.createDataFrame([(0, top1)], "a long, b long")
    out = hard_negatives(emb, q, ex, k=3).collect()
    assert len(out) == 3
    assert top1 not in {r.neighbor_id for r in out}
    # old rank-2 neighbor is the new rank 1
    old2 = [r.neighbor_id for r in base if r.rank == 2][0]
    assert [r.neighbor_id for r in out if r.rank == 1] == [old2]
    # symmetric orientation also excluded
    ex_rev = spark.createDataFrame([(top1, 0)], "a long, b long")
    out_rev = hard_negatives(emb, q, ex_rev, k=3).collect()
    assert top1 not in {r.neighbor_id for r in out_rev}
