"""Unit semantics for the round-4 tail additions: burst dedup (chained
gap rule), per-group OLS trend, domain quota cap, equi-depth histograms,
and chi-square categorical association."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.cocoa import equi_depth_histograms
from datalake_indexes_spark.operators.discovery import categorical_association
from datalake_indexes_spark.operators.events import dedup_bursts, value_trend
from datalake_indexes_spark.operators.web import domain_quota_cap


def test_dedup_bursts_chained_gap(spark):
    """t=0,5,9,20 with tolerance 5: 9 chains off 5 (gap 4) even though it
    is 9 away from the kept first event; 20 starts a new burst."""
    ev = spark.createDataFrame(
        [(i, 1, "c", t) for i, t in enumerate([0, 5, 9, 20])],
        "event_id long, user_id long, event_type string, ts_us long",
    )
    out = {
        r["ts_us"]: r
        for r in dedup_bursts(
            ev, tolerance_us=5, key_cols=["user_id", "event_type"]
        ).collect()
    }
    assert sorted(out) == [0, 20]
    assert out[0]["burst_size"] == 3 and out[0]["burst_span_us"] == 9
    assert out[20]["burst_size"] == 1 and out[20]["burst_span_us"] == 0


def test_dedup_bursts_tie_and_key_isolation(spark):
    """Equal timestamps keep the lowest event_id; other keys are
    untouched even at identical times."""
    ev = spark.createDataFrame(
        [(7, 1, "c", 100), (3, 1, "c", 100), (9, 2, "c", 100)],
        "event_id long, user_id long, event_type string, ts_us long",
    )
    out = dedup_bursts(ev, tolerance_us=10).collect()
    kept = {(r["user_id"], r["event_id"]) for r in out}
    assert kept == {(1, 3), (2, 9)}


def test_value_trend_planted_slope(spark):
    """y = 2x + 1 exactly -> slope 2/day, intercept 1 at origin, r2 = 1;
    a constant-y group gets slope 0 with r2 0; a 1-point group gets
    NULLs."""
    day = 86_400_000_000
    rows = [(0, "lin", i * day, 2.0 * i + 1.0) for i in range(10)]
    rows += [(0, "flat", i * day, 5.0) for i in range(10)]
    rows += [(0, "one", 0, 3.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_us long, value double"
    )
    out = {r["event_type"]: r for r in value_trend(ev).collect()}
    assert math.isclose(out["lin"]["slope_per_day"], 2.0, abs_tol=1e-6)
    assert math.isclose(out["lin"]["intercept"], 1.0, abs_tol=1e-6)
    assert math.isclose(out["lin"]["r2"], 1.0, abs_tol=1e-6)
    assert out["flat"]["slope_per_day"] == 0.0 and out["flat"]["r2"] == 0.0
    assert out["one"]["slope_per_day"] is None and out["one"]["r2"] is None


def test_domain_quota_cap_priority(spark):
    """cap=2 with a quality priority keeps the 2 best per domain."""
    docs = spark.createDataFrame(
        [
            (i, f"https://www.site-a.example.com/{i}", float(i))
            for i in range(5)
        ]
        + [(10, "https://site-b.example.net/x", 9.0)],
        "doc_id long, url string, quality double",
    )
    out = domain_quota_cap(docs, cap=2, priority_col="quality").collect()
    by_dom: dict[str, set] = {}
    for r in out:
        by_dom.setdefault(r["registered_domain"], set()).add(r["doc_id"])
    assert by_dom["example.com"] == {3, 4}  # two highest-quality
    assert by_dom["example.net"] == {10}
    assert all(r["domain_rank"] <= 2 for r in out)


def test_equi_depth_buckets_skewed_column(spark):
    """A heavily skewed column still splits into ~equal-count buckets
    (the property equi-WIDTH bins lack), and boundaries are ordered."""
    from datalake_indexes_spark.index.lake_index import LakeIndex

    vals = [1.0] * 50 + [2.0] * 30 + [1000.0] * 20
    cells = spark.createDataFrame(
        [(1, 0, i, str(v)) for i, v in enumerate(vals)],
        "table_id int, col_id int, row_id long, tokenized string",
    )
    idx = LakeIndex(
        cells=cells, row_keys=None, column_headers=None, table_info=None
    )
    out = sorted(
        equi_depth_histograms(idx, nbuckets=4).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["n"] for r in out] == [25, 25, 25, 25]
    assert all(out[i]["hi"] <= out[i + 1]["lo"] for i in range(3))
    # the skewed mass lands in multiple buckets instead of one giant bin
    assert out[0]["lo"] == 1.0 and out[3]["hi"] == 1000.0


def test_chi2_independent_vs_dependent(spark):
    """A perfectly independent 2x2 grid scores chi2 = 0; a perfectly
    dependent one scores chi2 = n (Cramér's V = 1)."""
    indep = spark.createDataFrame(
        [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(10)],
        "a string, b string",
    )
    r = categorical_association(indep, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0
    assert r["n"] == 40 and r["dof"] == 1

    dep = spark.createDataFrame(
        [("x", "u")] * 10 + [("y", "v")] * 10, "a string, b string"
    )
    r = categorical_association(dep, "a", "b").collect()[0]
    assert r["chi2"] == 20.0 and r["cramers_v"] == 1.0


def test_chi2_null_is_a_level(spark):
    """NULLs count as their own category, not dropped rows."""
    df = spark.createDataFrame(
        [("x", None)] * 5 + [("y", "v")] * 5, "a string, b string"
    )
    r = categorical_association(df, "a", "b").collect()[0]
    assert r["n"] == 10 and r["chi2"] == 10.0


def test_group_split_no_leakage(spark):
    """All docs of a group share one split; a per-doc hash split does
    not have that property on the same data (sanity contrast)."""
    from datalake_indexes_spark.operators.text_analysis import (
        group_split,
        hash_split,
    )

    docs = spark.createDataFrame(
        [(i, f"dom{i % 7}") for i in range(200)], "doc_id long, source string"
    )
    out = group_split(docs, group_col="source").collect()
    per_group = {}
    for r in out:
        per_group.setdefault(r["group_key"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_group.values())
    assert len(out) == 200
    # contrast: the doc-level split scatters most groups across splits
    doc_splits = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    scattered = {}
    for i in range(200):
        scattered.setdefault(f"dom{i % 7}", set()).add(doc_splits[i])
    assert any(len(s) > 1 for s in scattered.values())


def test_chi2_cardinality_guard(spark):
    """Pointing the association test at a free-text-cardinality column
    raises before anything is collected; raising max_levels readmits it."""
    import pytest

    wide = spark.range(300).selectExpr(
        "concat('t', id) AS a", "CAST(id % 3 AS STRING) AS b"
    )
    with pytest.raises(ValueError, match="max_levels"):
        categorical_association(wide, "a", "b", max_levels=100)
    # same data under an explicit higher cap still computes
    r = categorical_association(wide, "a", "b", max_levels=1000).collect()[0]
    assert r["n"] == 300
