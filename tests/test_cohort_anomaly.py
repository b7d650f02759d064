"""Unit semantics for cohort retention and z-score anomaly screening
(operators/events.py); the `events_cohort`/`events_anomaly` oracle keys
cover the corpus-scale versions."""

from __future__ import annotations

import math

import pytest

DAY = 86_400_000_000


@pytest.mark.spark
class TestCohortRetention:
    def test_retention_triangle(self, spark):
        from datalake_indexes_spark.operators.events import cohort_retention

        rows = [
            # user 1: first seen day 0, returns day 1 and day 2
            (1, 0 * DAY + 5), (1, 1 * DAY + 9), (1, 2 * DAY),
            # user 2: cohort day 0, returns day 2 only
            (2, 0 * DAY), (2, 2 * DAY + 100),
            # user 3: cohort day 1, never returns
            (3, 1 * DAY + 50),
            # user 1 twice in one day -> still one active mark
            (1, 0 * DAY + 700),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts_us long")
        got = {
            (r.cohort_period, r.period_offset): r.n_active
            for r in cohort_retention(ev).collect()
        }
        assert got == {
            (0, 0): 2,  # users 1,2 on their cohort day
            (0, 1): 1,  # user 1 back next day
            (0, 2): 2,  # users 1,2 back on day 2
            (1, 0): 1,  # user 3's cohort day
        }

    def test_offset_never_negative(self, spark):
        from datalake_indexes_spark.operators.events import cohort_retention

        ev = spark.createDataFrame(
            [(u, d * DAY) for u in range(5) for d in range(u, 5)],
            "user_id long, ts_us long",
        )
        assert all(r.period_offset >= 0 for r in cohort_retention(ev).collect())


@pytest.mark.spark
class TestValueAnomalies:
    def test_flags_only_the_outlier(self, spark):
        from datalake_indexes_spark.operators.events import value_anomalies

        vals = [10.0] * 20 + [10.5] * 20 + [100.0]  # one wild point
        ev = spark.createDataFrame(
            [(i, "a", v) for i, v in enumerate(vals)]
            + [(100 + i, "b", 5.0) for i in range(10)],  # zero-variance group
            "event_id long, event_type string, value double",
        )
        out = value_anomalies(ev).collect()
        assert [r.event_id for r in out] == [40]
        # z matches the closed-form population moments
        n = len(vals)
        m = sum(vals) / n
        sd = math.sqrt(sum(v * v for v in vals) / n - m * m)
        assert abs(out[0].z - round((100.0 - m) / sd, 3)) < 1e-9

    def test_no_shuffle_of_events(self, spark):
        """The events side is scanned, never exchanged: the only shuffle
        feeds the broadcast stats aggregate."""
        from datalake_indexes_spark.operators.events import value_anomalies

        ev = spark.range(1000).selectExpr(
            "id AS event_id",
            "CAST(id % 3 AS STRING) AS event_type",
            "CAST(id % 97 AS DOUBLE) AS value",
        )
        plan = value_anomalies(ev)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


@pytest.mark.spark
class TestGrowthAccounting:
    def test_active_new_cumulative(self, spark):
        from datalake_indexes_spark.operators.events import growth_accounting

        rows = [
            (1, 0 * DAY), (2, 0 * DAY),           # day 0: 2 new
            (1, 1 * DAY), (3, 1 * DAY),           # day 1: 1 returning, 1 new
            (1, 3 * DAY),                          # day 3: returning only
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts_us long")
        got = {r.period: r for r in growth_accounting(ev).collect()}
        assert (got[0].n_active, got[0].n_new, got[0].cum_users) == (2, 2, 2)
        assert (got[1].n_active, got[1].n_new, got[1].cum_users) == (2, 1, 3)
        assert (got[3].n_active, got[3].n_new, got[3].cum_users) == (1, 0, 3)
        assert 2 not in got  # no activity, no row (resample fills gaps, not this)


@pytest.mark.spark
class TestResampleForwardFill:
    def test_gap_fill_and_grid(self, spark):
        from datalake_indexes_spark.operators.events import resample_forward_fill

        rows = [
            (1, 0 * DAY, 5.0), (1, 0 * DAY + 9, 1.0),  # day 0 sum 6
            (1, 2 * DAY, 2.0),                          # day 1 is a gap
            (2, 3 * DAY, 7.0),                          # user 2 starts late
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
        got = {(r.key, r.period): r for r in resample_forward_fill(ev).collect()}
        # user 1: dense grid day 0..3 (global max)
        assert got[(1, 0)].value == 6.0 and got[(1, 0)].observed
        assert got[(1, 1)].value == 6.0 and not got[(1, 1)].observed  # filled
        assert got[(1, 2)].value == 2.0 and got[(1, 2)].observed
        assert got[(1, 3)].value == 2.0 and not got[(1, 3)].observed
        # user 2: grid starts at ITS first period, not the global min
        assert (2, 0) not in got and got[(2, 3)].value == 7.0
        assert len(got) == 5
