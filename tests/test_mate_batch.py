"""Batched multi-query MATE (join_search_batch): per-query parity with
the single-query join_search, degree enforcement, and one-scan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.mate import MATE


def _norm(rows):
    return sorted((r.score, r.table_id, r.column_combination) for r in rows)


@pytest.mark.spark
class TestJoinSearchBatch:
    def test_batch_matches_single_query_results(self, planted):
        mate = MATE(planted["index"])
        inp = planted["input"]
        # two degree-2 queries over the same lake: the full two-column
        # probe, and a reversed-column variant (different hit columns)
        batch = mate.join_search_batch(
            {
                "fwd": (inp, ["director_name", "movie_title"], None),
                "rev": (inp, ["movie_title", "director_name"], None),
            },
            k=5,
        ).collect()
        for qid, qcols in (
            ("fwd", ["director_name", "movie_title"]),
            ("rev", ["movie_title", "director_name"]),
        ):
            single = mate.join_search(inp, qcols, k=5).top_k.collect()
            got = _norm([r for r in batch if r.query_id == qid])
            assert got == _norm(single), qid

    def test_degree_one_batch_parity(self, planted):
        mate = MATE(planted["index"])
        inp = planted["input"]
        batch = mate.join_search_batch(
            {"d1": (inp, ["director_name"], None)}, k=5
        ).collect()
        single = mate.join_search(inp, ["director_name"], k=5).top_k.collect()
        assert _norm(batch) == _norm(single)

    def test_mixed_degrees_rejected(self, planted):
        mate = MATE(planted["index"])
        inp = planted["input"]
        with pytest.raises(ValueError, match="mixed"):
            mate.join_search_batch(
                {
                    "a": (inp, ["director_name"], None),
                    "b": (inp, ["director_name", "movie_title"], None),
                }
            )

    def test_per_query_candidate_caps_are_independent(self, planted):
        """A tiny k_c must cap each query separately, not the union."""
        mate = MATE(planted["index"])
        inp = planted["input"]
        batch = mate.join_search_batch(
            {
                "a": (inp, ["director_name"], None),
                "b": (inp, ["movie_title"], None),
            },
            k=5,
            k_c=1,
        ).collect()
        # each query still returns its own best table
        assert {r.query_id for r in batch} == {"a", "b"}
