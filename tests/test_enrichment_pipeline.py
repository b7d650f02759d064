"""End-to-end dataset enrichment (demo parity): the planted lake's feature
column must land on the input with correct values and coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.pipelines.enrichment import enrich_dataset


@pytest.mark.spark
def test_enrich_dataset_end_to_end(planted):
    res = enrich_dataset(
        planted["index"],
        planted["input"],
        query_columns=["director_name", "movie_title"],
        target_column="imdb_score",
        k=3,
        k_features=3,
        input_order_by=["director_name", "movie_title"],
    )
    assert res.stats["joinable_tables"] >= 1
    assert res.stats["evaluated_features"] >= 2
    assert res.stats["mate_runtime"] > 0

    enriched = res.enriched
    # the planted numeric feature arrives as ext_0_2 = str(2 * i) for the
    # 32 covered input rows, NULL for the 8 uncovered ones
    assert "ext_0_2" in enriched.columns
    rows = enriched.select("movie_title", "ext_0_2").collect()
    covered = [r for r in rows if r["ext_0_2"] is not None]
    assert len(covered) == 32
    for r in covered:
        i = int(r["movie_title"].rsplit(" ", 1)[1])
        assert r["ext_0_2"] == str(2 * i)


@pytest.mark.spark
def test_mate_stats_path_reuses_verification_join(planted):
    """Requesting stats persists the prefilter/verification intermediates,
    so the top_k / join_pairs actions that follow read the cache
    (InMemoryTableScan in the executed plan) instead of re-running the
    verification join."""
    from datalake_indexes_spark.operators.mate import MATE

    stats: dict = {}
    res = MATE(planted["index"]).join_search(
        planted["input"],
        ["director_name", "movie_title"],
        k=3,
        input_order_by=["director_name", "movie_title"],
        stats=stats,
    )
    # stats themselves were computed (forcing the join once)
    assert stats["matching_rows"] > 0
    assert stats["total_approved"] >= stats["matching_rows"]
    # downstream actions hit the persisted intermediates
    plan = res.top_k._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    pair_plan = res.join_pairs._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in pair_plan
    assert res.top_k.count() > 0
