"""PageRank (operators/graph.py): parity against a pure-Python power
iteration on hand-built graphs, conservation of total rank, dangling-node
redistribution, and ordering sanity on a hub graph."""

from __future__ import annotations

import pytest


def _python_pagerank(edges, damping=0.85, iters=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        contrib = {x: 0.0 for x in nodes}
        for u, vs in out.items():
            share = rank[u] / len(vs)
            for v in vs:
                contrib[v] += share
        dangling = sum(rank[x] for x in nodes if x not in out)
        base = (1 - damping) / n + damping * dangling / n
        rank = {x: base + damping * contrib[x] for x in nodes}
    return rank


@pytest.mark.spark
class TestPageRank:
    def _run(self, spark, edges, **kw):
        from datalake_indexes_spark.operators.graph import pagerank

        df = spark.createDataFrame(edges, "src long, dst long")
        return {r.node: r.rank for r in pagerank(df, **kw).collect()}

    def test_matches_reference_power_iteration(self, spark):
        edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (2, 4)]
        got = self._run(spark, edges)
        want = _python_pagerank(edges)
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12

    def test_rank_conserved_with_dangling_nodes(self, spark):
        # node 5 has no out-edges: its mass must be redistributed
        edges = [(1, 5), (2, 5), (3, 5), (4, 5), (1, 2)]
        got = self._run(spark, edges)
        assert abs(sum(got.values()) - 1.0) < 1e-9
        want = _python_pagerank(edges)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12

    def test_hub_ranks_highest(self, spark):
        # star: everyone links to 0
        edges = [(i, 0) for i in range(1, 8)]
        got = self._run(spark, edges)
        assert got[0] == max(got.values())
        # spokes all equal by symmetry
        spoke = {round(got[i], 12) for i in range(1, 8)}
        assert len(spoke) == 1

    def test_empty_graph(self, spark):
        assert self._run(spark, [], iters=2) == {}
