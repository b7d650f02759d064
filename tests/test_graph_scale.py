"""Scale shape of the graph family (operators/graph.py) on a planted
60k-node / ~160k-edge structure: 10k 6-cliques chained by bridge edges
into ONE connected component.  Label propagation must recover exactly
the cliques (communities finer than the component), k-core must sit
exactly at the clique degree threshold, and link prediction must emit
exactly the bridge-wedge census — all with no nested-loop joins and no
global windows in the plans."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.graph import (
    k_core,
    label_propagation,
    link_prediction,
)
from datalake_indexes_spark.plans.audit import plan_report

N_CLIQUES = 10_000
K = 6  # clique size


def _edges(spark):
    template = [
        F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
        for i in range(K)
        for j in range(i + 1, K)
    ]
    cliques = (
        spark.range(N_CLIQUES)
        .select(F.col("id").alias("g"), F.explode(F.array(*template)).alias("p"))
        .select(
            (F.col("g") * K + F.col("p.i")).alias("src"),
            (F.col("g") * K + F.col("p.j")).alias("dst"),
        )
    )
    bridges = spark.range(N_CLIQUES - 1).select(
        (F.col("id") * K).alias("src"), ((F.col("id") + 1) * K).alias("dst")
    )
    return cliques.unionByName(bridges)


def test_lpa_recovers_cliques_through_bridges(spark):
    """One component, 10k planted communities: 5 fixed rounds label every
    node with its own clique minimum (the bridge endpoints' transient
    drift settles by round 2-3)."""
    labels = label_propagation(_edges(spark), rounds=5)
    wrong = labels.filter(
        F.col("community") != (F.col("node") - F.pmod("node", F.lit(K)))
    ).count()
    assert wrong == 0
    assert labels.count() == N_CLIQUES * K


def test_kcore_sits_at_clique_degree(spark):
    edges = _edges(spark)
    # every clique node has degree >= K-1 = 5: the 5-core is the whole graph
    assert k_core(edges, k=K - 1).count() == N_CLIQUES * K
    # degree-6 support exists only on bridge endpoints; once the plain
    # clique nodes peel, the bridges collapse too -> empty 6-core
    assert k_core(edges, k=K).count() == 0


def test_link_prediction_bridge_census(spark):
    """Cliques are complete (nothing to predict inside); every predicted
    pair is a bridge wedge with exactly one common neighbor, and the
    total is the closed-form census: interior clique-min pivots
    contribute 11 pairs (5 right, 5 left, 1 across), the two chain ends
    contribute 5 each."""
    pred = link_prediction(_edges(spark))
    rep = plan_report(pred)
    assert rep["n_nested_loop_joins"] == 0, rep
    assert rep["n_global_windows"] == 0, rep

    rows = pred.collect()
    assert len(rows) == (N_CLIQUES - 2) * 11 + 2 * 5
    assert all(r.common_neighbors == 1 for r in rows)
    # no intra-clique predictions
    assert all(r.node_a // K != r.node_b // K for r in rows)
    # spot-check scores on an interior bridge pivot x = 6g:
    # (x-6, x+1): deg(x-6)=7 (clique 5 + two bridges), deg(x+1)=5,
    # jaccard = 1/(7+5-1); adamic_adar = 1/ln(deg(x)) = 1/ln(7)
    x = 6 * 500
    by_pair = {(r.node_a, r.node_b): r for r in rows}
    r = by_pair[(x - 6, x + 1)]
    assert abs(r.jaccard - 1 / 11) < 1e-6
    assert abs(r.adamic_adar - 1 / math.log(7)) < 1e-6
    r = by_pair[(x - 6, x + 6)]  # across the pivot: both endpoints deg 7
    assert abs(r.jaccard - 1 / 13) < 1e-6


def test_hub_cap_prunes_bridge_pivots(spark):
    """max_pivot_degree below the bridge-endpoint degree removes every
    wedge whose pivot is a bridge node — and with complete cliques that
    is ALL of them."""
    assert link_prediction(_edges(spark), max_pivot_degree=5).count() == 0
