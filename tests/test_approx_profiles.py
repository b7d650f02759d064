"""Sketch-based lake profiling: the approximate variant must honor its
error contracts against the exact profiler on the real testdata index."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_approx_profiles_error_bounds(spark, sf_dir):
    from datalake_indexes_spark.operators.cocoa import (
        column_profiles,
        column_profiles_approx,
    )
    from datalake_indexes_spark.plans.queries import testdata_index

    idx = testdata_index(spark, sf_dir, with_super_keys=False)
    exact = {
        (r["table_id"], r["col_id"]): r
        for r in column_profiles(idx).collect()
    }
    approx = {
        (r["table_id"], r["col_id"]): r
        for r in column_profiles_approx(idx, rsd=0.05).collect()
    }
    assert exact.keys() == approx.keys() and exact
    for key, e in exact.items():
        a = approx[key]
        # exact aggregates unchanged
        assert a["n_cells"] == e["n_cells"] and a["n_null"] == e["n_null"]
        assert a["min_val"] == e["min_val"] or (
            math.isnan(a["min_val"]) and math.isnan(e["min_val"])
        )
        # HLL++: allow 5 sigma of the 5% rsd
        assert abs(a["n_distinct_approx"] - e["n_distinct"]) <= max(
            5, 0.25 * e["n_distinct"]
        ), key
        # GK median: must lie within the column's [min, max], and for the
        # uniform-ish TPC-H key columns within 10% rank error of exact
        if not math.isnan(e["median_val"]):
            assert a["min_val"] <= a["median_approx"] <= a["max_val"], key
            span = e["max_val"] - e["min_val"]
            if span > 0:
                assert abs(a["median_approx"] - e["median_val"]) <= 0.1 * span + 1e-6, key


@pytest.mark.spark
class TestProfileDrift:
    def _idx(self, spark, vals, table=1, col=0):
        from datalake_indexes_spark.index.lake_index import LakeIndex

        cells = spark.createDataFrame(
            [(table, col, i, str(v)) for i, v in enumerate(vals)],
            "table_id int, col_id int, row_id int, tokenized string",
        )
        return LakeIndex(
            cells=cells, row_keys=None, column_headers=None, table_info=None
        )

    def test_identical_snapshots_have_zero_drift(self, spark):
        from datalake_indexes_spark.operators.cocoa import profile_drift

        a = self._idx(spark, list(range(100)))
        b = self._idx(spark, list(range(100)))
        row = profile_drift(a, b).collect()[0]
        assert row.tv_distance == 0.0
        assert row.n_a == row.n_b == 100

    def test_shifted_distribution_drifts(self, spark):
        from datalake_indexes_spark.operators.cocoa import profile_drift

        a = self._idx(spark, list(range(100)))          # uniform 0..99
        b = self._idx(spark, [0] * 100)                 # collapsed to one value
        row = profile_drift(a, b).collect()[0]
        # shared grid spans 0..99; b's mass sits in one bucket -> heavy drift
        assert row.tv_distance > 0.8

    def test_mild_shift_is_mild(self, spark):
        from datalake_indexes_spark.operators.cocoa import profile_drift

        a = self._idx(spark, list(range(100)))
        b = self._idx(spark, list(range(10, 110)))      # 10% shift
        row = profile_drift(a, b).collect()[0]
        assert 0.0 < row.tv_distance < 0.4
