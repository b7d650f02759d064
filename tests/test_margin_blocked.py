"""IVF-blocked margin mining — cosine agreement with the brute variant
on shared candidates, recall gauge vs brute at fixture scale, and plan
pins (no cartesian; the bipartite match is a merge join on centroid)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.similarity import (
    margin_mining,
    margin_mining_blocked,
)


def _halves(spark, sf_dir, n=300):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < n
    )
    return emb.filter(F.col("vec_id") % 2 == 0), emb.filter(F.col("vec_id") % 2 == 1)


def test_cosines_agree_with_brute_on_shared_pairs(spark, sf_dir):
    src, tgt = _halves(spark, sf_dir)
    brute = {
        (r["src_id"], r["tgt_id"]): r["cosine"]
        for r in margin_mining(src, tgt, k=4, threshold=0.0).collect()
    }
    blocked = {
        (r["src_id"], r["tgt_id"]): r["cosine"]
        for r in margin_mining_blocked(src, tgt, k=4, threshold=0.0).collect()
    }
    shared = set(brute) & set(blocked)
    assert shared  # the probe lists do find real candidates
    assert all(brute[p] == blocked[p] for p in shared)


def test_recall_vs_brute_monotone_in_n_probe(spark, sf_dir):
    # The blocked rule inherits the IVF recall trade AND inflates some
    # margins (restricted neighborhoods -> lower averages), so this
    # gauge pins both: recall of the brute-mined pairs rises with
    # n_probe, and the measured floor at n_probe=2 stays honest.
    src, tgt = _halves(spark, sf_dir)
    brute = {
        (r["src_id"], r["tgt_id"])
        for r in margin_mining(src, tgt, k=4, threshold=1.1).collect()
    }
    assert brute

    def recall(n_probe):
        blocked = {
            (r["src_id"], r["tgt_id"])
            for r in margin_mining_blocked(
                src, tgt, k=4, threshold=1.1, n_probe=n_probe
            ).collect()
        }
        return len(brute & blocked) / len(brute)

    r2, r6 = recall(2), recall(6)
    assert r2 >= 0.25  # measured 0.286 on the fixture
    assert r6 > r2  # probing more lists buys recall (measured 0.541)


def test_plan_no_cartesian(spark, sf_dir):
    src, tgt = _halves(spark, sf_dir)
    plan = (
        margin_mining_blocked(src, tgt, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the bipartite candidate match is a centroid-keyed merge join, not
    # a broadcast that only looks safe at fixture scale
    assert "SortMergeJoin" in plan


def test_rescore_exact_equals_brute_intersect_blocked(spark, sf_dir):
    # r7 verdict task #5: rescore_exact=True must reproduce EXACTLY the
    # brute-mined subset of the blocked candidates — identical cosine,
    # margin and mutual values (the rescore theorem: a survivor point's
    # exact neighborhood average does not depend on the blocking).
    src, tgt = _halves(spark, sf_dir)
    kw = dict(k=4, threshold=1.1, n_centroids=16, n_probe=2)
    brute = {
        (r["src_id"], r["tgt_id"]): (r["cosine"], r["margin"], r["mutual"])
        for r in margin_mining(src, tgt, k=4, threshold=1.1).collect()
    }
    blocked_pairs = {
        (r["src_id"], r["tgt_id"])
        for r in margin_mining_blocked(src, tgt, **kw).collect()
    }
    rescored = {
        (r["src_id"], r["tgt_id"]): (r["cosine"], r["margin"], r["mutual"])
        for r in margin_mining_blocked(src, tgt, rescore_exact=True, **kw).collect()
    }
    assert set(rescored) == set(brute) & blocked_pairs
    assert rescored  # non-vacuous on the fixture
    for pair, vals in rescored.items():
        assert vals == brute[pair]


def test_rescore_report_gauges_the_theorem(spark, sf_dir):
    from datalake_indexes_spark.operators.similarity import margin_rescore_report

    src, tgt = _halves(spark, sf_dir)
    row = margin_rescore_report(
        src, tgt, k=4, threshold=1.1, n_centroids=16, n_probe=2
    ).collect()[0]
    assert row["precision_rescored"] == 1.0
    assert row["n_rescored"] == row["n_rescored_true"] > 0
    assert row["recall_rescored"] <= row["recall_blocked"] + 1e-12
    assert row["precision_blocked"] <= 1.0
