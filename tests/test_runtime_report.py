"""Runtime profiler (plans/runtime.py): measured shuffle bytes appear for
a real shuffle and stay zero for a map-only plan; a planted hot key shows
up in the task-skew ratio; job-group scoping isolates concurrent work."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.plans.runtime import runtime_report


@pytest.mark.spark
class TestRuntimeReport:
    def test_shuffle_is_measured(self, spark):
        df = (
            spark.range(500_000)
            .selectExpr("id % 1000 as k", "id as v")
            .groupBy("k")
            .agg(F.sum("v"))
        )
        rep = runtime_report(df)
        assert rep["n_jobs"] >= 1 and rep["n_stages"] >= 2
        assert rep["shuffle_write_mb"] > 0
        assert rep["shuffle_read_mb"] > 0
        assert rep["wall_s"] > 0

    def test_map_only_plan_has_zero_shuffle(self, spark):
        df = spark.range(200_000).selectExpr("id * 2 as x", "id % 7 as y")
        rep = runtime_report(df)
        assert rep["shuffle_write_mb"] == 0.0
        assert rep["shuffle_read_mb"] == 0.0

    def test_scoping_excludes_other_jobs(self, spark):
        # run unrelated work first; its stages must not leak into the report
        spark.range(300_000).selectExpr("id % 50 as k").groupBy("k").count().collect()
        rep = runtime_report(spark.range(1000).selectExpr("id as x"))
        assert rep["shuffle_write_mb"] == 0.0

    def test_planted_hot_key_skew_visible(self, spark):
        """90% of rows on one key, ranked per key: a WINDOW cannot
        map-side-combine (unlike groupBy aggregates, whose partials
        flatten skew before the shuffle), so the hot key's reducer runs
        far longer than the median — the straggler ratio the profiler
        exists to surface."""
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy("payload")
        df = (
            spark.range(1_500_000)
            .selectExpr(
                "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 64 END as k",
                "cast(id as string) as payload",
            )
            # explicit repartition pins 32 reduce tasks (AQE coalescing
            # would otherwise fold this small shuffle into one task and
            # hide the straggler); the window reuses the partitioning
            .repartition(32, "k")
            .withColumn("rn", F.row_number().over(w))
            .groupBy("k")
            .agg(F.max("rn"))
        )
        rep = runtime_report(df, min_stage_ms=100)
        assert rep["max_task_skew"] is not None
        assert rep["max_task_skew"] > 2.0
