"""Embedding isotropy gauge — closed-form geometries and an explicit
all-pairs cross-check of the sum-vector identity."""

from __future__ import annotations

import itertools
import math

import numpy as np
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.similarity import embedding_isotropy_report


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_identical_vectors(spark):
    r = embedding_isotropy_report(_emb(spark, [(3.0, 4.0)] * 4)).collect()[0]
    assert (r["n"], r["dim"]) == (4, 2)
    assert abs(r["avg_norm"] - 5.0) < 1e-5
    assert abs(r["mean_vec_norm"] - 1.0) < 1e-5
    assert abs(r["avg_pairwise_cosine"] - 1.0) < 1e-5


def test_orthonormal_basis(spark):
    vecs = [tuple(1.0 if j == i else 0.0 for j in range(4)) for i in range(4)]
    r = embedding_isotropy_report(_emb(spark, vecs)).collect()[0]
    assert abs(r["avg_pairwise_cosine"]) < 1e-5
    assert abs(r["mean_vec_norm"] - math.sqrt(4) / 4) < 1e-5


def test_identity_matches_allpairs(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 8)
    units = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    expect = np.mean(
        [units[i] @ units[j] for i, j in itertools.permutations(range(30), 2)]
    )
    r = embedding_isotropy_report(_emb(spark, [tuple(v) for v in vecs])).collect()[0]
    assert abs(r["avg_pairwise_cosine"] - expect) < 1e-4
    assert abs(r["avg_norm"] - np.linalg.norm(vecs, axis=1).mean()) < 1e-4
    assert abs(r["mean_vec_norm"] - np.linalg.norm(units.mean(axis=0))) < 1e-4


def test_plan_single_pass_no_pairwise_join(spark):
    rng = np.random.RandomState(1)
    df = _emb(spark, [tuple(v) for v in rng.randn(50, 8)])
    plan = (
        embedding_isotropy_report(df)._jdf.queryExecution().executedPlan().toString()
    )
    # the only join is the scalar crossJoin of two 1-row aggregates
    assert plan.count("Join") <= 1
    assert "SortMergeJoin" not in plan
