"""Unit semantics for the OLAP rollup/cube aggregate, per-column heavy
hitters, and hybrid RRF retrieval fusion.  Hand-built frames with known
ground truth; the DuckDB oracle gate covers the corpus-scale versions
(`events_rollup`, `column_top_values`, `hybrid_rrf`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
class TestRollupCube:
    def _ev(self, spark):
        return spark.createDataFrame(
            [
                ("click", "h1", 1.0),
                ("click", "h1", 2.0),
                ("click", "h2", 3.0),
                ("view", "h1", 5.0),
            ],
            "event_type string, window_start string, value double",
        )

    def test_rollup_levels(self, spark):
        from datalake_indexes_spark.operators.events import rollup_cube_agg

        out = rollup_cube_agg(self._ev(spark), ["event_type", "window_start"])
        rows = {(r.event_type, r.window_start, r.grouping_id): r for r in out.collect()}
        # leaf level
        assert rows[("click", "h1", 0)].n_events == 2
        assert rows[("click", "h1", 0)].sum_value == 3.0
        # per-type level (window rolled up -> bit 0 set)
        assert rows[("click", None, 1)].n_events == 3
        assert rows[("click", None, 1)].sum_value == 6.0
        # grand total (both rolled -> 3)
        assert rows[(None, None, 3)].n_events == 4
        assert rows[(None, None, 3)].sum_value == 11.0
        # rollup emits NO (None, window) level — that's cube territory
        assert not any(gid == 2 for (_, _, gid) in rows)

    def test_cube_adds_cross_level(self, spark):
        from datalake_indexes_spark.operators.events import rollup_cube_agg

        out = rollup_cube_agg(
            self._ev(spark), ["event_type", "window_start"], mode="cube"
        )
        rows = {(r.event_type, r.window_start, r.grouping_id): r for r in out.collect()}
        assert rows[(None, "h1", 2)].n_events == 3  # h1 across types
        assert rows[(None, None, 3)].n_events == 4

    def test_each_level_sums_to_total(self, spark):
        """Invariant: every rollup level partitions the input."""
        from datalake_indexes_spark.operators.events import rollup_cube_agg

        out = rollup_cube_agg(self._ev(spark), ["event_type", "window_start"]).collect()
        for gid in (0, 1, 3):
            assert sum(r.n_events for r in out if r.grouping_id == gid) == 4

    def test_single_expand_plan(self, spark):
        """The rollup is ONE Expand + aggregate — not a union of N scans."""
        from datalake_indexes_spark.operators.events import rollup_cube_agg

        plan = rollup_cube_agg(
            self._ev(spark), ["event_type", "window_start"]
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Expand") == 1
        assert "Union" not in plan


@pytest.mark.spark
class TestColumnTopValues:
    def test_rank_and_prune(self, spark):
        from datalake_indexes_spark.index.lake_index import LakeIndex
        from datalake_indexes_spark.operators.cocoa import column_top_values

        cells = spark.createDataFrame(
            # col 0: a x3, b x2, c x1 (pruned at min_count=2)
            [(1, 0, i, t) for i, t in enumerate(["a", "a", "a", "b", "b", "c"])]
            # col 1: all singletons -> no output rows at min_count=2
            + [(1, 1, i, t) for i, t in enumerate(["x", "y", "z"])]
            # tie on count: token asc breaks it
            + [(2, 0, i, t) for i, t in enumerate(["q", "q", "p", "p"])],
            "table_id int, col_id int, row_id int, tokenized string",
        )
        idx = LakeIndex(
            cells=cells, row_keys=None, column_headers=None, table_info=None
        )
        out = column_top_values(idx, k=2, min_count=2).collect()
        got = {(r.table_id, r.col_id, r.rank): (r.token, r.cnt) for r in out}
        assert got[(1, 0, 1)] == ("a", 3)
        assert got[(1, 0, 2)] == ("b", 2)
        assert (1, 1, 1) not in got  # singleton column fully pruned
        assert got[(2, 0, 1)] == ("p", 2)  # tie -> lexicographically first
        assert got[(2, 0, 2)] == ("q", 2)
        assert len(out) == 4


@pytest.mark.spark
class TestHybridRRF:
    def _fixture(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "spark join window spark"),  # strong keyword hit
                (1, "spark nothing else"),
                (2, "unrelated text entirely"),
                (3, "join window join"),
            ],
            "doc_id long, text string",
        )
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0]),
                (1, [0.9, 0.1]),  # closest to query 0
                (2, [0.0, 1.0]),  # orthogonal
                (3, [0.7, 0.3]),
            ],
            "vec_id long, embedding array<double>",
        )
        return docs, emb

    def test_fusion_combines_both_lists(self, spark):
        from datalake_indexes_spark.operators.search import hybrid_rrf_topk

        docs, emb = self._fixture(spark)
        out = hybrid_rrf_topk(
            docs, emb, ["spark", "join", "window"], query_vec_id=0, k=4, k_each=3
        ).collect()
        by_id = {r.doc_id: r for r in out}
        # doc 1: present in BOTH lists -> two contributions
        # doc 2: keyword miss AND weakest vector -> lowest score
        assert by_id[1].rrf_score > by_id[2].rrf_score
        # ranks are dense from 1
        assert sorted(r.rank for r in out) == list(range(1, len(out) + 1))

    def test_keyword_only_doc_still_ranked(self, spark):
        """Doc 0 is the query vector (self-excluded from the vector list)
        but tops the keyword list — fusion must keep it."""
        from datalake_indexes_spark.operators.search import hybrid_rrf_topk

        docs, emb = self._fixture(spark)
        out = hybrid_rrf_topk(
            docs, emb, ["spark", "join", "window"], query_vec_id=0, k=4, k_each=3
        ).collect()
        assert 0 in {r.doc_id for r in out}

    def test_rrf_score_formula(self, spark):
        from datalake_indexes_spark.operators.search import bm25_topk, hybrid_rrf_topk
        from datalake_indexes_spark.operators.similarity import cosine_topk

        docs, emb = self._fixture(spark)
        kw = {r.doc_id: r.rank for r in bm25_topk(docs, ["spark", "join", "window"], k=3).collect()}
        vec = {
            r.neighbor_id: r.rank
            for r in cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
        }
        out = hybrid_rrf_topk(
            docs, emb, ["spark", "join", "window"], query_vec_id=0, k=4, k_each=3
        ).collect()
        for r in out:
            expect = (1.0 / (60 + kw[r.doc_id]) if r.doc_id in kw else 0.0) + (
                1.0 / (60 + vec[r.doc_id]) if r.doc_id in vec else 0.0
            )
            assert abs(r.rrf_score - expect) < 1e-6


class TestSCD2History:
    def test_runs_merge_and_intervals_chain(self, spark):
        """a,a,b,a per key → 3 intervals chained [t1,t3),[t3,t4),[t4,NULL);
        a second key with one observation is a single open interval."""
        from datalake_indexes_spark.operators.events import scd2_history

        rows = [
            (1, "a", 10, 0), (1, "a", 20, 1), (1, "b", 30, 2), (1, "a", 40, 3),
            (2, "x", 15, 4),
        ]
        df = spark.createDataFrame(
            rows, "k long, attr string, ts_us long, seq long"
        )
        out = sorted(
            (r["k"], r["version"], r["attr"], r["valid_from"], r["valid_to"])
            for r in scd2_history(df, ["k"], ["attr"], seq_col="seq").collect()
        )
        assert out == [
            (1, 1, "a", 10, 30),
            (1, 2, "b", 30, 40),
            (1, 3, "a", 40, None),
            (2, 1, "x", 15, None),
        ]

    def test_null_attr_and_ts_ties(self, spark):
        """NULL attrs merge null-safely; same-ts rows order by seq."""
        from datalake_indexes_spark.operators.events import scd2_history

        rows = [(1, None, 10, 0), (1, None, 10, 1), (1, "a", 10, 2)]
        df = spark.createDataFrame(
            rows, "k long, attr string, ts_us long, seq long"
        )
        out = sorted(
            (r["version"], r["attr"], r["valid_to"])
            for r in scd2_history(df, ["k"], ["attr"], seq_col="seq").collect()
        )
        assert out == [(1, None, 10), (2, "a", None)]

    def test_single_shuffle_plan(self, spark):
        """Both window passes share one (key) exchange — the dimension
        build is a single shuffle."""
        from datalake_indexes_spark.operators.events import scd2_history

        df = spark.createDataFrame(
            [(1, "a", 10, 0)], "k long, attr string, ts_us long, seq long"
        )
        plan = scd2_history(df, ["k"], ["attr"], seq_col="seq")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1


class TestEventTransitions:
    def test_counts_and_probabilities(self, spark):
        """a→b,b→a,a→b per key 1 plus a→a for key 2; probabilities are
        per-from_type conditionals summing to 1."""
        from datalake_indexes_spark.operators.events import event_transitions

        rows = [
            (1, "a", 10, 0), (1, "b", 20, 1), (1, "a", 30, 2), (1, "b", 40, 3),
            (2, "a", 5, 4), (2, "a", 6, 5),
        ]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long, event_id long")
        out = {
            (r["from_type"], r["to_type"]): (r["n"], r["p"])
            for r in event_transitions(df, seq_col="event_id").collect()
        }
        assert out[("a", "b")] == (2, round(2 / 3, 6))
        assert out[("a", "a")] == (1, round(1 / 3, 6))
        assert out[("b", "a")] == (1, 1.0)
        # no cross-key pair: key 2's first event never links to key 1
        assert ("b", "b") not in out


class TestConcurrencyCurve:
    def test_known_intervals(self, spark):
        """[1,5],[3,8],[10,10]: curve 1@1, 2@3, 1@6, 0@9, 1@10, 0@11."""
        from datalake_indexes_spark.operators.events import concurrency_curve

        iv = spark.createDataFrame(
            [(1, 5), (3, 8), (10, 10)], "start_us long, end_us long"
        )
        got = sorted(
            (r["ts_us"], r["concurrent"]) for r in concurrency_curve(iv).collect()
        )
        assert got == [(1, 1), (3, 2), (6, 1), (9, 0), (10, 1), (11, 0)]

    def test_matches_single_window(self, spark):
        """The two-level prefix sum must equal a plain global window on a
        sparse random interval set."""
        import random

        from pyspark.sql import Window
        from datalake_indexes_spark.operators.events import concurrency_curve

        rng = random.Random(3)
        rows = []
        for _ in range(300):
            s = rng.randint(0, 10_000)
            rows.append((s, s + rng.randint(0, 500)))
        iv = spark.createDataFrame(rows, "start_us long, end_us long")
        got = sorted(
            (r["ts_us"], r["concurrent"]) for r in concurrency_curve(iv).collect()
        )
        deltas = (
            iv.selectExpr("start_us as ts_us", "1 as d")
            .unionByName(iv.selectExpr("end_us + 1 as ts_us", "-1 as d"))
            .groupBy("ts_us").agg(F.sum("d").alias("d"))
        )
        w = Window.orderBy("ts_us").rowsBetween(Window.unboundedPreceding, 0)
        want = sorted(
            (r["ts_us"], r["c"])
            for r in deltas.withColumn("c", F.sum("d").over(w)).collect()
        )
        assert got == want


class TestTimeWeightedAvg:
    def test_interval_weighting(self, spark):
        """values 10 (held 1us), 20 (held 3us), final 99 (no interval):
        twap = (10*1 + 20*3)/4 = 17.5; singleton key falls back to its
        value."""
        from datalake_indexes_spark.operators.events import time_weighted_avg

        rows = [
            (1, 10.0, 0, 0), (1, 20.0, 1, 1), (1, 99.0, 4, 2),
            (2, 7.0, 5, 3),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, value double, ts_us long, event_id long"
        )
        got = {r["user_id"]: (r["twap"], r["n_obs"])
               for r in time_weighted_avg(df, seq_col="event_id").collect()}
        assert got[1] == (17.5, 3)
        assert got[2] == (7.0, 1)


def test_frequent_event_pairs_hand_example(spark):
    """3 baskets: u1{a,b,c} u2{a,b} u3{a,c}; min_support=2.
    Pairs: (a,b)=2 conf=2/3 lift=2*3/(3*2)=1; (a,c)=2 conf=2/3 lift=1;
    (b,c)=1 pruned by support."""
    from datalake_indexes_spark.operators.events import frequent_event_pairs

    rows = [
        ("u1", "a"), ("u1", "b"), ("u1", "c"), ("u1", "a"),  # dup event
        ("u2", "a"), ("u2", "b"),
        ("u3", "a"), ("u3", "c"),
    ]
    ev = spark.createDataFrame(rows, "user_id string, event_type string")
    got = {
        (r["item_1"], r["item_2"]): r
        for r in frequent_event_pairs(ev, min_support=2).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c")}
    for pair in got.values():
        assert pair["n_baskets"] == 2
        assert pair["confidence"] == 0.666667
        assert pair["lift"] == 1.0


def test_frequent_event_pairs_plan_shape(spark):
    """Pair join is a basket-keyed equi-join; the only nested-loop is the
    sanctioned 1-row total broadcast; A-priori prune joins are broadcast."""
    from datalake_indexes_spark.operators.events import frequent_event_pairs

    ev = spark.createDataFrame(
        [("u1", "a"), ("u2", "a")], "user_id string, event_type string"
    )
    plan = (
        frequent_event_pairs(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
