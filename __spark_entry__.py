"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``datalake_indexes_spark`` — a PySpark-native rebuild of
LUH-DBS/datalake_indexes (MATE joinability search, COCOA correlation
enrichment, XASH duplicate detection) plus training-data-pipeline
operators.  See SURVEY.md §2 for the operator inventory each query
key maps to (documented per query function in
``datalake_indexes_spark/plans/queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: MATE multi-attribute joinability search over the
    sf0.001 lake — which lake tables join lineitem on (l_orderkey,
    l_partkey)?"""
    from datalake_indexes_spark.plans.queries import QUERIES

    return QUERIES["mate_join_search_multi"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from datalake_indexes_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (see plans/oracle.py)."""
    from datalake_indexes_spark.plans.queries import ORACLES

    return dict(ORACLES)
