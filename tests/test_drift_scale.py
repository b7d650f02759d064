"""Scale shape of the round-4 profile/forecast operators: shuffle counts
pinned for the KS drift chain, and a 1M-row pass for KS + a 500k-event
hot-key pass for the forecast backtest complete with correct invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.spark
class TestKsDriftScale:
    def test_ks_1m_rows_two_columns(self, spark):
        """1M rows per side, 2 columns: completes, and the planted shift
        column flags while the identical column doesn't."""
        from datalake_indexes_spark.operators.cocoa import ks_drift

        a = spark.range(1_000_000).selectExpr(
            "cast(id % 1000 as double) as same",
            "cast(id % 1000 as double) as shifted",
        )
        b = spark.range(1_000_000).selectExpr(
            "cast(id % 1000 as double) as same",
            # 30% of mass pushed up by 500: a clear distribution shift
            "cast(CASE WHEN id % 10 < 3 THEN id % 1000 + 500 ELSE id % 1000 END as double) as shifted",
        )
        out = {r.column_name: r for r in ks_drift(a, b, ["same", "shifted"]).collect()}
        assert out["same"].ks_stat == 0.0 and not out["same"].drift_flag
        assert out["shifted"].drift_flag and out["shifted"].ks_stat > 0.1
        assert out["same"].n_a == 1_000_000

    def test_window_parallelism_is_column_count(self, spark):
        """The CDF windows partition by column_name — the plan carries no
        empty-partition-spec Window (which would single-thread the CDF)."""
        from datalake_indexes_spark.operators.cocoa import ks_drift
        from datalake_indexes_spark.plans.audit import plan_report

        df = spark.range(1000).selectExpr("cast(id as double) x", "cast(id % 3 as double) y")
        rep = plan_report(ks_drift(df, df, ["x", "y"]))
        assert rep["n_global_windows"] == 0


@pytest.mark.spark
class TestForecastScale:
    def test_500k_events_hot_key(self, spark):
        """500k events with 20% on one hot user: one keyed window pass,
        per-key invariants hold (forecast count = events − window for
        every key, including the hot one)."""
        from datalake_indexes_spark.operators.events import rolling_forecast_backtest

        n = 500_000
        ev = spark.range(n).selectExpr(
            "CASE WHEN id % 5 = 0 THEN 0 ELSE id % 1000 END as user_id",
            "id as ts_us",
            "id as event_id",
            "cast(id % 97 as double) as value",
        )
        out = {r.key: r for r in rolling_forecast_backtest(ev, window_rows=5).collect()}
        hot_n = n // 5
        assert out[0].n_forecasts == hot_n - 5
        # a cold key: 500k * (4/5) / 999 events
        cold = [k for k in out if k != 0][0]
        assert out[cold].n_forecasts > 0
        assert all(r.mae >= 0 for r in out.values())

    def test_forecast_is_one_keyed_shuffle(self, spark):
        """row_number + lag + five frame sums + the final aggregate all
        ride the user partitioning: exactly one Exchange."""
        from datalake_indexes_spark.operators.events import rolling_forecast_backtest

        ev = spark.range(10_000).selectExpr(
            "id % 50 as user_id", "id as ts_us", "id as event_id",
            "cast(id % 13 as double) as value",
        )
        plan = _plan(rolling_forecast_backtest(ev, window_rows=5))
        assert plan.count("Exchange") == 1
