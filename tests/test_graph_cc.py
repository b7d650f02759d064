"""Distributed connected components (operators/graph.py) — parity with
driver-side union-find, log-round convergence on chains, and a
DataFrame-scale edge set generated with no driver collect."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_cc_matches_union_find_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(3000), rng.randrange(3000)) for _ in range(5000)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["representative"]
        for r in connected_components(df).collect()
    }
    assert got == expected


def test_cc_long_chain_converges(spark):
    """A 400-node path is the adversarial case for label propagation
    (O(diameter) rounds); star contraction must finish in O(log n) —
    well inside the 50-round cap — with everything mapped to node 0."""
    n = 400
    df = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    out = connected_components(df).collect()
    assert len(out) == n
    assert all(r["representative"] == 0 for r in out)


def test_cc_dataframe_scale_no_collect(spark):
    """Edge set built entirely from spark.range (never on the driver):
    100k nodes in blocks of 20 (a chain per block) plus ring closures.
    Every node must map to its block minimum."""
    n, block = 100_000, 20
    ids = spark.range(n)
    chain = ids.where((F.col("id") + 1) % block != 0).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    out = connected_components(chain)
    bad = out.where(
        F.col("representative") != (F.col("node") - F.col("node") % block)
    ).count()
    assert bad == 0
    assert out.count() == n


def test_duplicate_groups_distributed_path_matches_driver(spark):
    """The same relation set resolved via both paths (threshold forcing)
    gives identical groups — including transitive chains."""
    from datalake_indexes_spark.operators.duplicates import DuplicateDetection

    rels = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "table_id_1 long, table_id_2 long",
    )
    driver = {
        (r["table_id"], r["representative"])
        for r in DuplicateDetection.duplicate_groups(rels, distributed_threshold=10**6).collect()
    }
    dist = {
        (r["table_id"], r["representative"])
        for r in DuplicateDetection.duplicate_groups(rels, distributed_threshold=0).collect()
    }
    assert driver == dist
    assert (3, 1) in dist and (23, 20) in dist


def test_triangles_planted_k4_star_and_orientation(spark):
    """K4 contributes exactly its 4 triangles, a star hub contributes
    none (wedges never close), duplicate/reversed edges don't double
    count, and each triangle appears once as a sorted triple."""
    from datalake_indexes_spark.operators.graph import triangles

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    star = [(100, i) for i in range(200, 215)]
    noisy = k4 + star + [(b, a) for a, b in k4] + k4  # reversed + dup
    edges = spark.createDataFrame(noisy, "src long, dst long")
    out = sorted(
        (r.node_a, r.node_b, r.node_c) for r in triangles(edges).collect()
    )
    assert out == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]


def test_clustering_coefficients_hand_graph(spark):
    """Triangle 0-1-2 plus pendant 3 off node 0: cc(1)=cc(2)=1,
    cc(0)=1/3 (deg 3, one triangle), cc(3)=0 (deg 1)."""
    from datalake_indexes_spark.operators.graph import clustering_coefficients

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (0, 3)], "src long, dst long"
    )
    out = {r.node: r for r in clustering_coefficients(edges).collect()}
    assert out[1].local_cc == 1.0 and out[2].local_cc == 1.0
    assert out[0].degree == 3 and out[0].n_triangles == 1
    assert out[0].local_cc == pytest.approx(1 / 3, abs=1e-6)
    assert out[3].local_cc == 0.0 and out[3].n_triangles == 0
