"""NN-descent refinement round — rank-wise cosine dominance over the
base kNN graph, recall-vs-truth improvement on the fixture, and plan
pins (no cartesian beyond the sanctioned centroid broadcasts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.similarity import (
    cosine_topk,
    knn_graph,
    nn_descent_round,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )


def test_rankwise_cosine_dominance(spark, sf_dir):
    # The base edges are inside the candidate set and the rescore is
    # exact, so at every (src, rank) the refined cosine >= base cosine.
    emb = _emb(spark, sf_dir)
    base = {(r["src_id"], r["rank"]): r["cosine"] for r in knn_graph(emb, k=5).collect()}
    ref = {(r["src_id"], r["rank"]): r["cosine"] for r in nn_descent_round(emb, k=5).collect()}
    assert set(base) == set(ref)
    assert all(ref[key] >= base[key] for key in base)
    assert any(ref[key] > base[key] for key in base)  # it actually refines


def test_recall_vs_truth_improves(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, emb, k=5).collect()
    }
    base = {
        (r["src_id"], r["neighbor_id"]) for r in knn_graph(emb, k=5).collect()
    }
    ref = {
        (r["src_id"], r["neighbor_id"])
        for r in nn_descent_round(emb, k=5).collect()
    }
    r_base = len(truth & base) / len(truth)
    r_ref = len(truth & ref) / len(truth)
    # one round lifts fixture recall 0.341 -> 0.49 (NN-descent converges
    # over multiple rounds; a single round must buy a real step, not
    # epsilon)
    assert r_ref >= r_base + 0.1


def test_plan_no_unsanctioned_nested_loop(spark, sf_dir):
    # The base graph materializes once (localCheckpoint), so the refined
    # plan's joins are ONLY what nn_descent adds — 2-hop expansion,
    # vector attach, rescore — and every one must be an equi-join; the
    # sanctioned centroid-broadcast cross joins live behind the
    # checkpoint, not in this plan.
    plan = (
        nn_descent_round(_emb(spark, sf_dir), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_iterated_rounds_recall_monotone(spark, sf_dir):
    from datalake_indexes_spark.operators.similarity import nn_descent

    emb = _emb(spark, sf_dir)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, emb, k=5).collect()
    }

    def recall(df):
        got = {(r["src_id"], r["neighbor_id"]) for r in df.collect()}
        return len(truth & got) / len(truth)

    r1 = recall(nn_descent(emb, k=5, rounds=1))
    r2 = recall(nn_descent(emb, k=5, rounds=2))
    assert r2 >= r1  # per-round dominance compounds (measured 0.49 -> 0.541)
    # rounds=1 must equal the single-round public entry point
    one = {
        (r["src_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in nn_descent_round(emb, k=5).collect()
    }
    it1 = {
        (r["src_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in nn_descent(emb, k=5, rounds=1).collect()
    }
    assert one == it1


def test_rounds_zero_returns_seed_graph(spark, sf_dir):
    # ADVICE r7: rounds=0 used to silently run one refinement round; it
    # must return the UNREFINED seed graph (the docstring's recall-table
    # base case) with the same schema as the refined output.
    from datalake_indexes_spark.operators.similarity import nn_descent

    emb = _emb(spark, sf_dir)
    seed = {
        (r["src_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in knn_graph(emb, k=5).collect()
    }
    zero = nn_descent(emb, k=5, rounds=0)
    assert zero.columns == ["src_id", "neighbor_id", "rank", "cosine"]
    got = {
        (r["src_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in zero.collect()
    }
    assert got == seed


def test_negative_rounds_rejected(spark, sf_dir):
    import pytest

    from datalake_indexes_spark.operators.similarity import nn_descent

    with pytest.raises(ValueError, match="rounds"):
        nn_descent(_emb(spark, sf_dir), k=5, rounds=-1)
