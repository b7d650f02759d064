"""Hash-quality sweep invariants: every sound prefilter yields the same
verified matches; precision only improves over the unfiltered baseline."""

from __future__ import annotations

import pytest

from datalake_indexes_spark.pipelines.hash_analysis import analyze_hash_alternatives


@pytest.mark.spark
def test_hash_sweep_invariants(planted):
    out = analyze_hash_alternatives(
        planted["index"],
        planted["input"],
        ["director_name", "movie_title"],
        k=5,
        input_order_by=["director_name", "movie_title"],
    ).collect()
    by_config = {r["config"]: r for r in out}
    assert set(by_config) == {
        "xash_64_rot", "xash_64", "xash_128_rot", "xash_128", "bloom_128", "linear",
    }
    # soundness: the verified match count and top score are invariant under
    # any prefilter — filters may only remove rows that verification would
    # reject anyway
    matches = {r["matches"] for r in out}
    scores = {r["top_score"] for r in out}
    assert len(matches) == 1, by_config
    assert len(scores) == 1, by_config
    # the unfiltered baseline approves the most rows; every hash filter's
    # precision is >= the baseline's
    linear = by_config["linear"]
    for name, r in by_config.items():
        assert r["approved"] <= linear["approved"], name
        assert r["precision"] >= linear["precision"], name
        assert 0 < r["precision"] <= 1
