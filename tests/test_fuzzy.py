"""Fuzzy edit-distance join + entity resolution (operators/fuzzy.py):
recall-completeness of the rare-gram prefix blocking vs the naive
cross-join, short-string block coverage, and closure semantics."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.fuzzy import entity_resolution, fuzzy_join


def _naive(spark_a, spark_b, d):
    return (
        spark_a.crossJoin(spark_b)
        .filter(F.levenshtein("a_v", "b_v") <= d)
        .select("a_id", "b_id")
    )


def _pairs(df):
    return {(r["a_id"], r["b_id"]) for r in df.collect()}


def test_fuzzy_join_matches_naive_on_planted_cases(spark):
    """Substitution, insertion, deletion, identical, far-apart, and
    short strings (below the q-gram bound) — all against the naive join."""
    left = [
        (0, "kitten"),
        (1, "sitting"),
        (2, "abc"),
        (3, "ab"),
        (4, "a"),
        (5, "zzzzzz"),
        (6, "data lake"),
    ]
    right = [
        (10, "mitten"),      # kitten sub
        (11, "kitte"),       # kitten deletion
        (12, "kittens"),     # kitten insertion
        (13, "abd"),         # abc sub (short-ish)
        (14, "b"),           # 'a' sub / 'ab' deletion
        (15, "data lakes"),  # insertion
        (16, "unrelated"),
    ]
    a = spark.createDataFrame(left, "a_id long, a_v string")
    b = spark.createDataFrame(right, "b_id long, b_v string")
    got = {
        (r["a_id"], r["b_id"])
        for r in fuzzy_join(a, b, "a_v", "b_v", "a_id", "b_id", max_distance=1).collect()
    }
    want = _pairs(_naive(a, b, 1))
    assert got == want
    assert (0, 10) in got and (0, 11) in got and (0, 12) in got
    assert (4, 14) in got and (3, 14) in got  # short-string block
    assert (6, 15) in got


def test_fuzzy_join_randomized_parity(spark):
    """Seeded random strings over a tiny alphabet (maximally hot grams —
    the worst case for blocking): blocked output == naive output."""
    rng = random.Random(7)
    mk = lambda: "".join(rng.choice("ab0") for _ in range(rng.randint(1, 9)))
    rows = [(i, mk()) for i in range(120)]
    a = spark.createDataFrame(rows, "a_id long, a_v string")
    b = spark.createDataFrame(
        [(i + 1000, v) for i, v in rows] + [(2000 + i, mk()) for i in range(40)],
        "b_id long, b_v string",
    )
    for d in (1, 2):
        got = {
            (r["a_id"], r["b_id"])
            for r in fuzzy_join(
                a, b, "a_v", "b_v", "a_id", "b_id", max_distance=d
            ).collect()
        }
        assert got == _pairs(_naive(a, b, d)), f"mismatch at d={d}"


def test_fuzzy_join_reports_distance(spark):
    a = spark.createDataFrame([(0, "abcd")], "a_id long, a_v string")
    b = spark.createDataFrame(
        [(1, "abcd"), (2, "abed"), (3, "ab")], "b_id long, b_v string"
    )
    rows = {
        r["b_id"]: r["distance"]
        for r in fuzzy_join(a, b, "a_v", "b_v", "a_id", "b_id", max_distance=2).collect()
    }
    assert rows == {1: 0, 2: 1, 3: 2}


def test_entity_resolution_chains_and_singletons(spark):
    """aaaa~aaab~aabb chain collapses to one entity (min id), the far
    string stays a singleton; every input row appears."""
    df = spark.createDataFrame(
        [(5, "aaaa"), (9, "aaab"), (7, "aabb"), (3, "zzzz")],
        "rid long, name string",
    )
    out = {r["rid"]: r["entity_id"] for r in
           entity_resolution(df, "name", "rid", max_distance=1).collect()}
    assert out == {5: 5, 9: 5, 7: 5, 3: 3}


def test_blocking_candidate_volume_on_hot_ids(spark):
    """20k zero-padded sequential ids — the low-entropy worst case
    (constant "Customer#000..." prefix) that degenerates gram/segment
    blocking.  Deletion-neighborhood candidates must stay within a small
    factor of the TRUE pair count (~820k ordered incl. self), nowhere
    near the 400M cross product; and the verified output must equal
    direct levenshtein semantics for a probe row."""
    from datalake_indexes_spark.operators.fuzzy import fuzzy_candidates

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("a_id"),
        F.format_string("Customer#%09d", F.col("id")).alias("a_v"),
    )
    rdf = df.selectExpr("a_id as b_id", "a_v as b_v")
    n_cand = fuzzy_candidates(
        df, rdf, "a_v", "b_v", "a_id", "b_id", max_distance=1
    ).count()
    assert n_cand < 4_000_000, f"blocking degenerated: {n_cand} candidates"

    fz = fuzzy_join(df, rdf, "a_v", "b_v", "a_id", "b_id", max_distance=1)
    got = sorted(r["b_id"] for r in fz.filter(F.col("a_id") == 12345).collect())
    want = sorted({
        int(str(12345).zfill(9)[:i] + str(x) + str(12345).zfill(9)[i + 1:])
        for i in range(9)
        for x in range(10)
        if int(str(12345).zfill(9)[:i] + str(x) + str(12345).zfill(9)[i + 1:]) < n
    })
    assert got == want


def test_max_distance_cap(spark):
    import pytest

    from datalake_indexes_spark.operators.fuzzy import fuzzy_candidates

    df = spark.createDataFrame([(0, "abc")], "a_id long, a_v string")
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_candidates(df, df, "a_v", "a_v", "a_id", "a_id", max_distance=3)
