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


@pytest.mark.spark
class TestHits:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    def test_matches_reference_power_iteration(self, spark):
        """Hand-run HITS (L1-normalized, auth-then-hub per round) on a
        small digraph and compare every score."""
        from datalake_indexes_spark.operators.graph import hits

        pairs = [("a", "c"), ("b", "c"), ("c", "d"), ("a", "d"), ("d", "a")]
        out = {r.node: (r.hub, r.authority) for r in
               hits(self._edges(spark, pairs), iters=5).collect()}

        # NumPy-free reference
        nodes = sorted({x for p in pairs for x in p})
        hub = {n: 1.0 for n in nodes}
        for _ in range(5):
            auth = {n: sum(hub[s] for s, d in pairs if d == n) for n in nodes}
            t = sum(auth.values())
            auth = {n: v / t for n, v in auth.items()}
            h = {n: sum(auth[d] for s, d in pairs if s == n) for n in nodes}
            t = sum(h.values())
            hub = {n: v / t for n, v in h.items()}
        for n in nodes:
            assert out[n][0] == pytest.approx(hub[n], abs=1e-12), n
            assert out[n][1] == pytest.approx(auth[n], abs=1e-12), n

    def test_bipartite_separation(self, spark):
        """Pure hubs (only out-edges) carry authority 0; pure
        authorities (only in-edges) carry hub 0; both normalize to 1."""
        from datalake_indexes_spark.operators.graph import hits

        pairs = [("h1", "a1"), ("h1", "a2"), ("h2", "a1")]
        rows = hits(self._edges(spark, pairs), iters=3).collect()
        out = {r.node: r for r in rows}
        assert out["h1"].authority == 0.0 and out["h2"].authority == 0.0
        assert out["a1"].hub == 0.0 and out["a2"].hub == 0.0
        assert sum(r.hub for r in rows) == pytest.approx(1.0)
        assert sum(r.authority for r in rows) == pytest.approx(1.0)
        # h1 links to both authorities -> the better hub; a1 has two
        # in-links -> the better authority
        assert out["h1"].hub > out["h2"].hub
        assert out["a1"].authority > out["a2"].authority

    def test_duplicate_edges_collapse(self, spark):
        from datalake_indexes_spark.operators.graph import hits

        once = hits(self._edges(spark, [("a", "b"), ("b", "c")]), iters=3).collect()
        dup = hits(
            self._edges(spark, [("a", "b"), ("a", "b"), ("b", "c")]), iters=3
        ).collect()
        assert sorted(map(tuple, once)) == sorted(map(tuple, dup))


@pytest.mark.spark
class TestPersonalizedPageRank:
    def test_mass_conserved_and_seed_proximity(self, spark):
        """Σ rank = 1; nodes near the seed outrank equally-connected
        nodes far from it."""
        from datalake_indexes_spark.operators.graph import personalized_pagerank

        # chain 0-1-2-3-4-5 (symmetrized): seed (mod 10) is node 0
        pairs = [(i, i + 1) for i in range(5)]
        edges = spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs], "src long, dst long"
        )
        out = {r.node: r.rank for r in
               personalized_pagerank(edges, seed_modulus=10, iters=20).collect()}
        assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)
        # hand reference: r = (1-d)·p0 + d·(contrib + dm·p0), dm = 0 here
        d = 0.85
        deg = {0: 1, 1: 2, 2: 2, 3: 2, 4: 2, 5: 1}
        nbrs = {0: [1], 1: [0, 2], 2: [1, 3], 3: [2, 4], 4: [3, 5], 5: [4]}
        r = {n: (1.0 if n == 0 else 0.0) for n in deg}
        for _ in range(20):
            r = {
                n: (0.15 if n == 0 else 0.0)
                + d * sum(r[m] / deg[m] for m in nbrs[n])
                for n in deg
            }
        for n in deg:
            assert out[n] == pytest.approx(r[n], abs=1e-9), n
        # proximity: the seed end of the chain dominates the far end
        assert out[0] > out[5] and out[1] > out[4]

    def test_dangling_mass_returns_to_seeds(self, spark):
        """Directed edge into a sink: the sink's rank mass teleports back
        to the seed set, total still 1."""
        from datalake_indexes_spark.operators.graph import personalized_pagerank

        edges = spark.createDataFrame([(0, 7)], "src long, dst long")
        out = {r.node: r.rank for r in
               personalized_pagerank(edges, seed_modulus=10, iters=15).collect()}
        assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)
        assert out[0] > out[7] > 0.0

    def test_no_seeds_raises(self, spark):
        from datalake_indexes_spark.operators.graph import personalized_pagerank

        edges = spark.createDataFrame([(1, 3)], "src long, dst long")
        with pytest.raises(ValueError, match="no seed"):
            personalized_pagerank(edges, seed_modulus=10)
