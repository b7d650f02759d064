"""plan_report / assert_scalable_plan (plans/audit.py): the plan facts
match known shapes, and the guard trips on genuine scale smells."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.plans.audit import assert_scalable_plan, plan_report


def test_report_counts_known_shapes(spark):
    a = spark.range(1000).selectExpr("id", "id % 7 as k")
    b = spark.range(50).selectExpr("id as k2", "id * 2 as v")

    # map-only projection: no exchange, no join
    rep = plan_report(a.select("id"))
    assert rep["n_exchanges"] == 0 and rep["n_nested_loop_joins"] == 0

    # groupBy: exactly one exchange
    rep = plan_report(a.groupBy("k").count())
    assert rep["n_exchanges"] == 1

    # broadcast equi-join: a broadcast exchange, a BroadcastHashJoin —
    # and ZERO shuffle exchanges (the metric must not count the
    # BroadcastExchange as a shuffle)
    rep = plan_report(a.join(F.broadcast(b), a["k"] == b["k2"]))
    assert rep["n_broadcast_joins"] == 1 and rep["n_nested_loop_joins"] == 0
    assert rep["n_exchanges"] == 0 and rep["n_broadcast_exchanges"] == 1

    # codegen-region counting is deliberately absent (invisible pre-
    # execution under AQE) — the report must not carry a dead metric
    rep = plan_report(a.groupBy("k").count())
    assert "n_codegen_spans" not in rep

    # cross join: flagged as nested loop
    rep = plan_report(a.crossJoin(b))
    assert rep["n_nested_loop_joins"] == 1


def test_guard_trips_on_cartesian_and_budget(spark):
    a = spark.range(100)
    b = spark.range(100)
    with pytest.raises(AssertionError, match="nested-loop"):
        assert_scalable_plan(a.crossJoin(b))
    # allowed when declared (the sanctioned 1-row broadcast pattern)
    rep = assert_scalable_plan(a.crossJoin(b), allow_nested_loop=True)
    assert rep["n_nested_loop_joins"] == 1
    with pytest.raises(AssertionError, match="exchanges"):
        assert_scalable_plan(
            a.selectExpr("id % 3 as k").groupBy("k").count(), max_exchanges=0
        )


def test_pushed_filters_detected(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr("id", "id % 5 as k").write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("k") == 3)
    rep = plan_report(df)
    assert rep["n_scans"] == 1 and rep["has_pushed_filters"]


def test_engine_queries_pass_the_guard(spark, sf_dir):
    """Spot-check: flagship engine plans clear the no-nested-loop guard
    (chi2's margin cross product is the one declared exception)."""
    from datalake_indexes_spark.operators.events import interval_join_pairs
    from datalake_indexes_spark.operators.text_analysis import group_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert_scalable_plan(group_split(docs), max_exchanges=0)
    ev = spark.range(100).selectExpr(
        "id as event_id", "id % 5 as user_id", "id * 3 as ts_us"
    )
    assert_scalable_plan(interval_join_pairs(ev, ev, lookback_us=10))


def test_global_window_detection(spark):
    """A window with no partitionBy funnels every row through one task;
    the report counts exactly those, never the partitioned ones, and the
    guard trips when a zero budget is declared."""
    from pyspark.sql.window import Window

    df = spark.range(1000).selectExpr("id", "id % 7 as k")

    rep = plan_report(df.withColumn("r", F.row_number().over(Window.orderBy("id"))))
    assert rep["n_global_windows"] == 1

    rep = plan_report(
        df.withColumn(
            "r", F.row_number().over(Window.partitionBy("k").orderBy("id"))
        )
    )
    assert rep["n_global_windows"] == 0

    # running-sum frame over a global order is still global
    rep = plan_report(
        df.withColumn(
            "s",
            F.sum("id").over(
                Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    assert rep["n_global_windows"] == 1

    # partition-only window (no ordering) prints two bracket groups too
    # but is NOT global — the second group has no ASC/DESC order marker
    rep = plan_report(
        df.withColumn("c", F.count(F.lit(1)).over(Window.partitionBy("k")))
    )
    assert rep["n_global_windows"] == 0

    # no partition AND no order (frame-only aggregate over everything):
    # Spark omits both empty specs — one bracket group, still global
    rep = plan_report(
        df.withColumn("c", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    assert rep["n_global_windows"] == 1

    with pytest.raises(AssertionError, match="single-partition window"):
        assert_scalable_plan(
            df.withColumn("r", F.row_number().over(Window.orderBy("id"))),
            max_global_windows=0,
        )
    # sanctioned k-bounded rank pass clears a budget of 1
    topk = df.orderBy(F.desc("id")).limit(5)
    rep = assert_scalable_plan(
        topk.withColumn("r", F.row_number().over(Window.orderBy(F.desc("id")))),
        max_global_windows=1,
    )
    assert rep["n_global_windows"] == 1
