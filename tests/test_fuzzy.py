"""Fuzzy edit-distance join + entity resolution (operators/fuzzy.py):
recall-completeness of the rare-gram prefix blocking vs the naive
cross-join, short-string block coverage, and closure semantics."""

from __future__ import annotations

import random

import pytest
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


@pytest.mark.spark
class TestFellegiSunter:
    def _ab(self, spark):
        a = spark.createDataFrame(
            [(1, 0, "ann", "x1", "A"), (2, 0, "bob", "x2", "A"),
             (3, 1, "cat", "x3", "B"), (4, 1, "dan", "x4", "B")],
            "a_id long, blk int, name string, code string, seg string",
        )
        b = spark.createDataFrame(
            [(11, 0, "ann", "x1", "A"), (12, 0, "BOB", "x2", "A"),
             (13, 1, "cat", None, "B"), (14, 1, "eve", "x9", "B")],
            "b_id long, blk int, name string, code string, seg string",
        )
        return a, b

    def test_u_probabilities_hand_computed(self, spark):
        from datalake_indexes_spark.operators.fuzzy import fs_field_u_probabilities

        a, b = self._ab(spark)
        u = {r.field: r.u for r in fs_field_u_probabilities(a, b, ["name", "seg"]).collect()}
        # name: shared values ann(1·1) + cat(1·1) over 4·4 pairs
        assert u["name"] == pytest.approx(2 / 16)
        # seg: A(2·2) + B(2·2) over 16
        assert u["seg"] == pytest.approx(8 / 16)

    def test_u_excludes_nulls_from_margins(self, spark):
        from datalake_indexes_spark.operators.fuzzy import fs_field_u_probabilities

        a, b = self._ab(spark)
        u = {r.field: r.u for r in fs_field_u_probabilities(a, b, ["code"]).collect()}
        # b has 3 non-null codes; shared x1(1·1) + x2(1·1) over 4·3
        assert u["code"] == pytest.approx(2 / 12)

    def test_weights_rank_true_pairs_first(self, spark):
        import math

        from datalake_indexes_spark.operators.fuzzy import fs_record_linkage

        a, b = self._ab(spark)
        out = {
            (r.a_id, r.b_id): r
            for r in fs_record_linkage(
                a, b, ["name", "code", "seg"], "blk", m=0.9, threshold=-1e9
            ).collect()
        }
        # blocked: only same-blk pairs exist
        assert set(out) == {(1, 11), (1, 12), (2, 11), (2, 12),
                            (3, 13), (3, 14), (4, 13), (4, 14)}
        # (1,11) agrees on all three; (1,12) only on seg
        assert out[(1, 11)].n_agree == 3 and out[(1, 12)].n_agree == 1
        assert out[(1, 11)].weight > out[(1, 12)].weight
        # hand-check (1,11): ln(.9/u_name)+ln(.9/u_code)+ln(.9/u_seg)
        w = (math.log(0.9 / (2 / 16)) + math.log(0.9 / (2 / 12))
             + math.log(0.9 / 0.5))
        assert out[(1, 11)].weight == pytest.approx(w, abs=1e-5)
        # NULL code on (3,13): compared 2, agreed 2 (name+seg), code adds 0
        assert out[(3, 13)].n_compared == 2 and out[(3, 13)].n_agree == 2

    def test_threshold_filters_post_rounding(self, spark):
        from datalake_indexes_spark.operators.fuzzy import fs_record_linkage

        a, b = self._ab(spark)
        kept = fs_record_linkage(a, b, ["name", "code", "seg"], "blk", m=0.9,
                                 threshold=0.0).collect()
        assert all(r.weight >= 0.0 for r in kept)
        assert {(r.a_id, r.b_id) for r in kept} >= {(1, 11), (3, 13)}

    def test_invalid_m_raises(self, spark):
        from datalake_indexes_spark.operators.fuzzy import fs_record_linkage

        a, b = self._ab(spark)
        with pytest.raises(ValueError, match="must be in"):
            fs_record_linkage(a, b, ["name"], "blk", m=1.0)

    def test_no_udf_no_cartesian(self, spark):
        from datalake_indexes_spark.operators.fuzzy import fs_record_linkage

        a, b = self._ab(spark)
        plan = fs_record_linkage(
            a, b, ["name", "code", "seg"], "blk"
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_multi_rule_blocking_unions_and_dedups(self, spark):
        """A second blocking rule recovers pairs whose first block key is
        dirty; pairs caught by both rules score once."""
        from datalake_indexes_spark.operators.fuzzy import fs_record_linkage

        a = spark.createDataFrame(
            [(1, 0, "x", "ann", "p1"), (2, 0, "y", "bob", "p2")],
            "a_id long, blk int, blk2 string, name string, code string",
        )
        b = spark.createDataFrame(
            # 11 matches 1 on both rules; 12 matches 2 only via blk2
            [(11, 0, "x", "ann", "p1"), (12, 9, "y", "bob", "p2")],
            "b_id long, blk int, blk2 string, name string, code string",
        )
        single = fs_record_linkage(a, b, ["name", "code"], "blk",
                                   m=0.9, threshold=-1e9).collect()
        multi = fs_record_linkage(a, b, ["name", "code"], ["blk", "blk2"],
                                  m=0.9, threshold=-1e9).collect()
        assert {(r.a_id, r.b_id) for r in single} == {(1, 11), (2, 11)}
        out = {(r.a_id, r.b_id): r for r in multi}
        # blk2 recovers (2, 12), whose blk key is dirty (0 vs 9)
        assert set(out) == {(1, 11), (2, 11), (2, 12)}
        # pairs caught by both rules appear exactly once
        assert len(multi) == 3


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fs_linkage_scale_200k_blocked(spark):
    """200k × 200k records under 2k-way blocking: the candidate space is
    ~20M pairs, never the 4·10¹⁰ cross product — completes in seconds
    with the true matches' invariants intact, and the plan holds no
    cartesian product or Python eval."""
    from datalake_indexes_spark.operators.fuzzy import fs_record_linkage

    n = 200_000
    a = spark.range(n).selectExpr(
        "id as a_id",
        "id % 2000 as blk",
        "concat('name', id) as name",
        "cast(id % 9973 as string) as code",
    )
    # perturbed copy: 20% of names dirtied
    b = spark.range(n).selectExpr(
        "id + 10000000 as b_id",
        "id % 2000 as blk",
        "CASE WHEN id % 5 = 0 THEN concat('NAME', id) ELSE concat('name', id) END as name",
        "cast(id % 9973 as string) as code",
    )
    out = fs_record_linkage(a, b, ["name", "code"], "blk", m=0.9, threshold=0.0)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # clean true pairs agree on both fields and survive; sample-check one
    sample = out.filter(F.col("a_id") == 7).collect()
    assert len(sample) >= 1
    top = [r for r in sample if r.b_id == 10000007]
    assert top and top[0].n_agree == 2
    # dirty-name true pairs still agree on code; a full count stays
    # candidate-bounded (every a matches its twin at minimum)
    assert out.count() >= n * 0.99


def test_fs_linkage_hot_block_completes(spark):
    """One block holds 10% of both sides (the skewed-city case): the pair
    space concentrates but AQE's skew split keeps the join balanced — the
    run completes and true-pair invariants hold inside the hot block."""
    from datalake_indexes_spark.operators.fuzzy import fs_record_linkage

    n = 50_000
    a = spark.range(n).selectExpr(
        "id as a_id",
        "CASE WHEN id % 10 = 0 THEN 0 ELSE id % 500 END as blk",
        "concat('n', id) as name",
    )
    b = spark.range(n).selectExpr(
        "id + 10000000 as b_id",
        "CASE WHEN id % 10 = 0 THEN 0 ELSE id % 500 END as blk",
        "concat('n', id) as name",
    )
    out = fs_record_linkage(a, b, ["name"], "blk", m=0.9, threshold=0.0)
    # hot-block member keeps its twin as a positive-weight match
    hit = out.filter(F.col("a_id") == 100).collect()  # 100 % 10 == 0 -> hot block
    assert any(r.b_id == 10000100 and r.n_agree == 1 for r in hit)
    # names are unique, so positives are exactly the n true pairs
    assert out.count() == n
