"""Round-7 depth operators: stratified CV folds (operators/ml.py),
corpus snapshot diff (operators/text_analysis.py), and cosine range
search (operators/similarity.py).

Each test pins the operator's CONTRACT, not just its output shape:
- cv_folds: per-stratum fold sizes differ by at most one, assignment is
  deterministic, the hash tier stays scan-level (balanced in
  expectation) and covers all k folds;
- snapshot_diff: every status class on a planted fixture, including the
  NULL-text-on-both-sides row that must grade "unchanged" (presence
  flags, not hash nullness, drive added/removed);
- range_search: agrees with the exact brute-force reference, honors the
  threshold, and the k_cap bound engages closest-first.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.ml import cv_folds
from datalake_indexes_spark.operators.similarity import cosine_topk, range_search
from datalake_indexes_spark.operators.text_analysis import snapshot_diff


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"text {i % 7} body", "en" if i % 3 else "de") for i in range(103)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestCvFolds:
    def test_balanced_within_stratum(self, docs):
        out = cv_folds(docs, k=5, stratum_col="lang").toPandas()
        assert len(out) == 103
        for _, g in out.groupby("stratum"):
            sizes = g.groupby("fold").size()
            assert set(sizes.index) == set(range(5))
            assert sizes.max() - sizes.min() <= 1

    def test_deterministic(self, docs):
        a = cv_folds(docs, k=4, stratum_col="lang").toPandas().sort_values("doc_id")
        b = cv_folds(docs, k=4, stratum_col="lang").toPandas().sort_values("doc_id")
        assert (a["fold"].values == b["fold"].values).all()

    def test_no_stratum_means_single(self, docs):
        out = cv_folds(docs, k=3).toPandas()
        assert (out["stratum"] == "__all__").all()
        sizes = out.groupby("fold").size()
        assert sizes.max() - sizes.min() <= 1

    def test_hash_tier_covers_all_folds(self, docs):
        out = cv_folds(docs, k=5, stratum_col="lang", exact=False)
        folds = {r["fold"] for r in out.select("fold").distinct().collect()}
        assert folds == set(range(5))
        # scan-level: no Exchange in the hash tier's plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_k_validation(self, docs):
        with pytest.raises(ValueError):
            cv_folds(docs, k=1)


class TestSnapshotDiff:
    def test_all_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "same"), (2, "old text"), (3, "gone"), (5, None)],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "same"), (2, "new text"), (4, "fresh"), (5, None)],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["status"]
            for r in snapshot_diff(old, new).collect()
        }
        assert out == {
            1: "unchanged",
            2: "changed",
            3: "removed",
            4: "added",
            5: "unchanged",  # NULL text on both sides is NOT "added"
        }

    def test_null_vs_text_is_changed(self, spark):
        old = spark.createDataFrame([(1, None)], "doc_id long, text string")
        new = spark.createDataFrame([(1, "now set")], "doc_id long, text string")
        (row,) = snapshot_diff(old, new).collect()
        assert row["status"] == "changed"

    def test_hash_only_shuffles(self, spark):
        old = spark.createDataFrame([(1, "a" * 1000)], "doc_id long, text string")
        new = spark.createDataFrame([(1, "a" * 1000)], "doc_id long, text string")
        plan = (
            snapshot_diff(old, new)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        # the text column must be projected away BEFORE the join: only
        # doc_id + md5 hash may appear in the join inputs
        assert "md5" in plan.lower()


class TestRangeSearch:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        rows = [
            (i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)])
            for i in range(40)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_matches_bruteforce(self, emb):
        th = 0.3
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in range_search(emb, emb.filter(F.col("vec_id") < 5), th).collect()
        }
        want = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=40).collect()
            if r["cosine"] >= th
        }
        assert got == want

    def test_threshold_honored(self, emb):
        out = range_search(emb, emb.filter(F.col("vec_id") < 5), 0.5).toPandas()
        assert (out["cosine"] >= 0.5).all()

    def test_k_cap_closest_first(self, emb):
        capped = range_search(
            emb, emb.filter(F.col("vec_id") == 0), threshold=-1.0, k_cap=3
        ).toPandas()
        full = range_search(
            emb, emb.filter(F.col("vec_id") == 0), threshold=-1.0, k_cap=100
        ).toPandas()
        assert len(capped) == 3
        top3 = full.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(3)
        assert set(capped["neighbor_id"]) == set(top3["neighbor_id"])


def test_snapshot_diff_matches_set_algebra_property(spark):
    """Against an independent dict-based reference: status must equal
    pure set algebra over (ids, texts) for randomized snapshot pairs —
    including id-only overlaps, text collisions, and None texts."""
    from hypothesis import given, settings, strategies as st

    texts = st.one_of(st.none(), st.text(alphabet="abc", max_size=3))
    snap = st.dictionaries(st.integers(0, 12), texts, max_size=10)

    @settings(max_examples=12, deadline=None)
    @given(old=snap, new=snap)
    def check(old, new):
        odf = spark.createDataFrame(
            list(old.items()) or [(None, None)], "doc_id long, text string"
        ).filter(F.col("doc_id").isNotNull())
        ndf = spark.createDataFrame(
            list(new.items()) or [(None, None)], "doc_id long, text string"
        ).filter(F.col("doc_id").isNotNull())
        got = {
            r["doc_id"]: r["status"] for r in snapshot_diff(odf, ndf).collect()
        }
        want = {}
        for i in set(old) | set(new):
            if i not in old:
                want[i] = "added"
            elif i not in new:
                want[i] = "removed"
            else:
                want[i] = "unchanged" if old[i] == new[i] else "changed"
        assert got == want

    check()


def test_cv_folds_balance_property(spark):
    """For randomized corpora and k: within every stratum the fold sizes
    differ by at most 1 and every doc appears exactly once."""
    from hypothesis import given, settings, strategies as st

    corpus = st.lists(
        st.tuples(st.integers(0, 1000), st.sampled_from(["en", "de", "fr"])),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )

    @settings(max_examples=10, deadline=None)
    @given(rows=corpus, k=st.integers(2, 7))
    def check(rows, k):
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = cv_folds(df, k=k, stratum_col="lang").toPandas()
        assert sorted(out["doc_id"]) == sorted(r[0] for r in rows)
        for _, g in out.groupby("stratum"):
            sizes = g.groupby("fold").size()
            assert sizes.max() - sizes.min() <= 1
            assert (g["fold"] < k).all() and (g["fold"] >= 0).all()

    check()


def test_range_search_blocked_is_sound_subset(spark):
    """The LSH-blocked range search may MISS neighbors (recall < 1 is
    the contract) but must never invent one: every returned pair must
    appear in the exact range search at the same threshold, with the
    same cosine."""
    from datalake_indexes_spark.operators.similarity import (
        range_search_blocked,
    )

    rows = [
        (i, [float((i * 13 + d * 5) % 17) - 8.0 for d in range(16)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 6)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in range_search(emb, q, threshold=0.3, k_cap=1000).collect()
    }
    blocked = range_search_blocked(
        emb, q, threshold=0.3, k_cap=1000, dim=16
    ).collect()
    assert blocked  # non-vacuous: same-bucket neighbors exist
    for r in blocked:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact and exact[key] == r["cosine"]
