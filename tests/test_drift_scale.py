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


@pytest.mark.spark
class TestMonitoringScale:
    def test_cusum_1m_events_planted_shift(self, spark):
        """1M events, 5 types, 100 periods; one type's rate drops 80% at
        period 60 — detected there (±2), others stay honest-null, and
        the dense grid is types × periods, never event-sized."""
        from datalake_indexes_spark.operators.events import cusum_changepoints

        n = 1_000_000
        ev = spark.range(n).selectExpr(
            "concat('t', id % 5) as event_type",
            # type t0 thinned 5x for ids landing past period 60
            "CASE WHEN id % 5 = 0 AND (id % 100000) >= 60000 AND id % 5000 != 0 "
            "THEN NULL ELSE (id % 100000) * 10 END as ts_us",
        ).filter("ts_us is not null")
        out = {r.event_type: r for r in cusum_changepoints(
            ev, period_us=10_000
        ).collect()}
        assert out["t0"].change_flag
        assert abs(out["t0"].change_period - 59) <= 2
        for t in ("t1", "t2", "t3", "t4"):
            assert not out[t].change_flag

    def test_survival_100k_users(self, spark):
        """100k users with varied span lengths: the duration-count frame
        stays calendar-bounded and the curve is monotone non-increasing."""
        from datalake_indexes_spark.operators.events import survival_curve

        ev = spark.range(200_000).selectExpr(
            "id % 100000 as user_id",
            # each user: one event at 0, one at (uid % 50) periods
            "CASE WHEN id < 100000 THEN 0 ELSE ((id % 100000) % 50) * 100 END as ts_us",
        )
        curve = survival_curve(ev, period_us=100, censor_horizon_periods=2).collect()
        assert len(curve) <= 50  # calendar-bounded rows
        ordered = sorted(curve, key=lambda r: r.duration)
        survs = [r.survival for r in ordered]
        assert all(a >= b - 1e-9 for a, b in zip(survs, survs[1:]))
        assert ordered[0].n_at_risk == 100_000


@pytest.mark.spark
class TestRfmPlanShape:
    def test_no_global_window(self, spark):
        """The distributed-rank rewrite removes every unpartitioned
        window from the RFM plan (the offset tables' bucket windows ride
        a partitioning-by-construction... the bucket-offset cumulation is
        over bucket-cardinality rows and IS order-global — assert the
        only global windows left are those tiny offset scans by bounding
        the count, not the per-key frame)."""
        from datalake_indexes_spark.operators.events import rfm_segments
        from datalake_indexes_spark.plans.audit import plan_report

        ev = spark.range(5000).selectExpr(
            "id % 500 as user_id", "'purchase' as event_type",
            "id as ts_us", "cast(id % 37 as double) as value",
        )
        rep = plan_report(rfm_segments(ev))
        # 3 ranks × 1 bucket-offset window each — all over ≤~2100-row
        # bucket tables, never the key frame
        assert rep["n_global_windows"] <= 3
