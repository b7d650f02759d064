"""IVF Lloyd refinement: on clustered data, refined centroids raise
recall@k at the same n_probe vs the first-N seed centroids."""

from __future__ import annotations

import math
import random


def _clustered_vectors(n_clusters=4, per_cluster=60, dim=8, seed=3):
    rng = random.Random(seed)
    centers = []
    for c in range(n_clusters):
        centers.append([10.0 if d == 2 * c else 0.0 for d in range(dim)])
    rows = []
    vid = 0
    for c, center in enumerate(centers):
        for _ in range(per_cluster):
            vec = [x + rng.gauss(0, 0.5) for x in center]
            rows.append((vid, vec))
            vid += 1
    # shuffle ids so the first-N seed centroids all come from ONE cluster
    # (the adversarial seed case Lloyd must fix)
    rows.sort(key=lambda r: r[0] % 3)
    return [(i, v) for i, (_, v) in enumerate(rows)]


def _cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def _true_topk(rows, qid, k=5):
    qv = dict(rows)[qid]
    scored = [
        (vid, _cosine(qv, v)) for vid, v in rows if vid != qid
    ]
    scored.sort(key=lambda t: (-t[1], t[0]))
    return {vid for vid, _ in scored[:k]}


def test_lloyd_refinement_raises_recall(spark):
    from datalake_indexes_spark.operators.similarity import ivf_topk

    rows = _clustered_vectors()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id long, embedding array<float>"
    )
    queries = df.filter(df.vec_id < 12)

    def recall(kmeans_iterations):
        got = ivf_topk(
            df, queries, k=5, n_centroids=4, n_probe=1,
            kmeans_iterations=kmeans_iterations,
        ).collect()
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = total = 0
        for q in range(12):
            truth = _true_topk(rows, q)
            hits += len(truth & by_q.get(q, set()))
            total += len(truth)
        return hits / total

    r0 = recall(0)
    r3 = recall(3)
    assert r3 >= r0
    # 4 refined centroids ≈ the 4 true cluster centers → near-total recall
    assert r3 >= 0.9, (r0, r3)


def test_indexed_ivf_matches_inline_and_prunes_partitions(spark, tmp_path):
    """build_ivf_index + ivf_topk_indexed == ivf_topk on the same params,
    and the probe scan reads only the probed centroid partitions
    (PartitionFilters on `centroid`)."""
    import shutil

    from datalake_indexes_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
    )

    rows = _clustered_vectors(per_cluster=30)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(1000 + i, [float(x) for x in v]) for i, v in rows[:6]],
        "vec_id long, embedding array<float>",
    )
    inline = sorted(
        map(tuple, ivf_topk(corpus, queries, k=3, n_centroids=8, n_probe=2).collect())
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(corpus, path, n_centroids=8)
    try:
        indexed = ivf_topk_indexed(spark, path, queries, k=3, n_probe=2)
        assert sorted(map(tuple, indexed.collect())) == inline
        plan = indexed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        frag = plan.split("PartitionFilters")[1][:200]
        assert "centroid" in frag
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_knn_graph_single_list_matches_brute_force(spark):
    """With one inverted list and one probe the kNN graph degrades to the
    exact graph: every (src, neighbor, rank) must equal brute-force
    cosine_topk run with the whole corpus as the query set."""
    from datalake_indexes_spark.operators.similarity import cosine_topk, knn_graph

    rows = _clustered_vectors(n_clusters=3, per_cluster=10)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    graph = {
        (r.src_id, r.rank): r.neighbor_id
        for r in knn_graph(emb, k=3, n_centroids=1, n_probe=1).collect()
    }
    brute = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb, emb, k=3).collect()
    }
    assert graph == brute and len(graph) == 30 * 3


def test_knn_graph_pairs_unique_and_probe_bounded(spark):
    """Each (src, neighbor) pair at most once (members live in exactly one
    inverted list), and every source still gets k rows when probing a
    strict subset of lists."""
    from datalake_indexes_spark.operators.similarity import knn_graph

    rows = _clustered_vectors(n_clusters=4, per_cluster=15)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_graph(emb, k=2, n_centroids=6, n_probe=2).collect()
    pairs = [(r.src_id, r.neighbor_id) for r in out]
    assert len(pairs) == len(set(pairs))
    by_src = {}
    for r in out:
        by_src.setdefault(r.src_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_src.values())


def test_auto_centroid_default_matches_explicit_sqrt_n(spark, sf_dir):
    # r7 verdict task #4: n_centroids=None must auto-size to
    # ceil(sqrt(n)) — the sizing rule the 10x exercise proved necessary
    # (fixed counts make per-cluster work quadratic) — and produce
    # EXACTLY the result of passing that count explicitly.
    import math

    from pyspark.sql import functions as F

    from datalake_indexes_spark.operators.similarity import (
        auto_centroid_count,
        ivf_topk,
        knn_graph,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 300
    )
    n = emb.count()
    want = max(1, math.ceil(math.sqrt(n)))
    assert auto_centroid_count(emb) == want

    q = emb.filter(F.col("vec_id") < 5)
    auto = sorted(map(tuple, ivf_topk(emb, q, k=3).collect()))
    explicit = sorted(map(tuple, ivf_topk(emb, q, k=3, n_centroids=want).collect()))
    assert auto == explicit and auto

    g_auto = sorted(map(tuple, knn_graph(emb, k=3).collect()))
    g_exp = sorted(map(tuple, knn_graph(emb, k=3, n_centroids=want).collect()))
    assert g_auto == g_exp and g_auto
