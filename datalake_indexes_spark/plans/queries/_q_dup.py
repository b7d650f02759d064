"""XASH duplicate-detection pipelines.

Split from the former plans/queries.py (round 9) — pure rearrangement,
every definition verbatim; registry order pinned in ``_registry``.
"""

from __future__ import annotations
import os
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from datalake_indexes_spark.index.builder import build_index, with_global_row_number
from datalake_indexes_spark.index.lake_index import LakeIndex
from datalake_indexes_spark.operators.cocoa import COCOA, is_numeric_flags
from datalake_indexes_spark.operators.duplicates import DuplicateDetection
from datalake_indexes_spark.operators.mate import MATE
from datalake_indexes_spark.plans import oracle
from datalake_indexes_spark.functions.text import tokenize_col
from datalake_indexes_spark.sources.catalog import ALL_TABLE_NAMES, TESTDATA_LAKE_SPEC

from datalake_indexes_spark.plans.queries._base import _planted_dup_index, testdata_index

def q_dup_row_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 (set view) — exact duplicate-row groups across the lake."""
    idx = testdata_index(spark, sf_dir, with_super_keys=False)
    dd = DuplicateDetection(idx)
    out = dd.duplicate_row_groups()
    return out.select(
        "table_id",
        F.array_join("row_values", "|").alias("row_values"),
        "group_size",
        "min_row_id",
    )


def q_dup_table_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — duplicate table relations (super-key prefilter + verification)."""
    idx = testdata_index(spark, sf_dir)
    return DuplicateDetection(idx).get_relations()


def q_dup_rows_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 pair view on the planted lake — super-key equality prefilter +
    sorted-multiset verification, non-empty by construction."""
    idx = _planted_dup_index(spark, sf_dir)
    return DuplicateDetection(idx).duplicate_rows()


def q_dup_row_groups_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _planted_dup_index(spark, sf_dir)
    out = DuplicateDetection(idx).duplicate_row_groups()
    return out.select(
        "table_id",
        F.array_join("row_values", "|").alias("row_values"),
        "group_size",
        "min_row_id",
    )


def q_dup_table_relations_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _planted_dup_index(spark, sf_dir)
    return DuplicateDetection(idx).get_relations()


def q_dup_groups_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — connected components of the planted duplicate-relation graph
    (the grouping step of duplicate-table removal), graded non-vacuously:
    {nation, nation_dup, nation_doubled} collapse to representative 1 and
    {region, region_dup} to 0."""
    idx = _planted_dup_index(spark, sf_dir)
    dd = DuplicateDetection(idx)
    return dd.duplicate_groups(dd.get_relations())


