"""J6 fingerprint-count formulation: duplicate-pair counts via
Σ cnt1·cnt2, so massively repeated rows multiply instead of exploding."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_indexes_spark.index.builder import build_index
from datalake_indexes_spark.operators.duplicates import DuplicateDetection
from datalake_indexes_spark.sources.catalog import LakeTableSpec


def test_relations_with_hot_duplicate_rows(spark):
    """Two tables of 2000 rows each where 1990 rows are the SAME value:
    the old pair-level join would materialize ~4M intermediate rows; the
    fingerprint formulation counts them as one multiplication.  The pair
    count must still clear the min(rows) threshold exactly."""
    rows_a = [("same", "row")] * 1990 + [(f"ua{i}", "x") for i in range(10)]
    rows_b = [("same", "row")] * 1990 + [(f"ua{i}", "x") for i in range(10)]
    ta = spark.createDataFrame(rows_a, "c1 string, c2 string")
    tb = spark.createDataFrame(rows_b, "c1 string, c2 string")
    specs = {
        "hot_a": LakeTableSpec("hot_a", 0, ("c1", "c2"), ("c1", "c2")),
        "hot_b": LakeTableSpec("hot_b", 1, ("c1", "c2"), ("c1", "c2")),
    }
    idx = build_index(spark, {"hot_a": ta, "hot_b": tb}, specs)
    rels = DuplicateDetection(idx).get_relations().collect()
    # 1990*1990 shared-row pairs + 10 unique matches >= min(2000, 2000)
    assert {(r["table_id_1"], r["table_id_2"]) for r in rels} == {(0, 1)}


def test_relations_below_threshold_not_reported(spark):
    ta = spark.createDataFrame([(f"a{i}", "x") for i in range(50)], "c1 string, c2 string")
    tb = spark.createDataFrame(
        [("a0", "x"), ("a1", "x")] + [(f"b{i}", "y") for i in range(48)],
        "c1 string, c2 string",
    )
    specs = {
        "small_a": LakeTableSpec("small_a", 0, ("c1", "c2"), ("c1", "c2")),
        "small_b": LakeTableSpec("small_b", 1, ("c1", "c2"), ("c1", "c2")),
    }
    idx = build_index(spark, {"small_a": ta, "small_b": tb}, specs)
    assert DuplicateDetection(idx).get_relations().count() == 0
