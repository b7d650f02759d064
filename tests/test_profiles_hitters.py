"""column_percentiles vs numpy, Misra-Gries heavy hitters vs brute-force
counts (including the superset guarantee under adversarial partitioning),
inter-arrival stats vs a pandas reference."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest


@pytest.mark.spark
class TestColumnPercentiles:
    def _idx(self, spark, vals):
        from datalake_indexes_spark.index.lake_index import LakeIndex

        cells = [(1, 0, i, str(v)) for i, v in enumerate(vals)]
        return LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )

    def test_matches_numpy_linear_interpolation(self, spark):
        from datalake_indexes_spark.operators.cocoa import column_percentiles

        vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5.5]
        row = column_percentiles(self._idx(spark, vals)).collect()[0]
        a = np.array(vals, dtype=float)
        assert row.n_values == len(vals)
        for p, col in [(25, "p25"), (50, "p50"), (75, "p75"), (90, "p90"), (99, "p99")]:
            assert abs(getattr(row, col) - np.percentile(a, p)) < 1e-6, col

    def test_single_value_column(self, spark):
        from datalake_indexes_spark.operators.cocoa import column_percentiles

        row = column_percentiles(self._idx(spark, [7])).collect()[0]
        assert (row.p25, row.p50, row.p99) == (7.0, 7.0, 7.0)


@pytest.mark.spark
class TestHeavyHitters:
    def _docs(self, spark, texts, parts=8):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        ).repartition(parts)

    def test_exact_vs_brute_force(self, spark):
        from datalake_indexes_spark.operators.text_analysis import heavy_hitters

        # zipf-ish corpus: a few hot words + a long unique tail
        texts = []
        for i in range(60):
            texts.append("hot " * 20 + f"warm{i % 5} " * 4 + f"tail{i}a tail{i}b")
        m = 10
        counts = Counter(w for t in texts for w in t.split(" "))
        n = sum(counts.values())
        expected = {
            w: (c, round(c / n, 6)) for w, c in counts.items() if c * m > n
        }
        got = {
            r.word: (r.total_count, r.share)
            for r in heavy_hitters(self._docs(spark, texts), m=m).collect()
        }
        assert got == expected
        assert "hot" in got  # non-vacuous

    def test_superset_guarantee_small_m(self, spark):
        """m barely above the hitter count: the per-partition sketch must
        still not lose a true hitter under random partitioning."""
        from datalake_indexes_spark.operators.text_analysis import heavy_hitters

        texts = ["a a a a b b b c c d"] * 40  # a:160 b:120 c:80 d:40, N=400
        got = {
            r.word: r.total_count
            for r in heavy_hitters(self._docs(spark, texts, parts=16), m=3).collect()
        }
        # threshold N/m = 133.33 -> only 'a' strictly exceeds
        assert got == {"a": 160}

    def test_no_hitters_is_empty(self, spark):
        from datalake_indexes_spark.operators.text_analysis import heavy_hitters

        texts = ["x y z"] * 30  # each word is exactly N/3; m=3 needs strict >
        assert heavy_hitters(self._docs(spark, texts), m=3).count() == 0


@pytest.mark.spark
class TestInterArrival:
    def test_matches_pandas_reference(self, spark):
        from datalake_indexes_spark.operators.events import inter_arrival_stats

        rows = []
        eid = 0
        for uid, gaps_s in [(1, [10, 10, 40]), (2, [0.5, 2.5]), (3, [])]:
            ts = 1_000_000_000
            rows.append((eid, uid, ts)); eid += 1
            for g in gaps_s:
                ts += int(g * 1e6)
                rows.append((eid, uid, ts)); eid += 1
        ev = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")
        got = {r.user_id: r for r in inter_arrival_stats(ev).collect()}
        assert set(got) == {1, 2}  # user 3 has one event, no gaps
        r1 = got[1]
        assert (r1.n_gaps, r1.mean_gap_us, r1.max_gap_us) == (3, 20e6, 40e6)
        assert r1.p50_gap_us == 10e6
        assert abs(r1.p95_gap_us - np.percentile([10e6, 10e6, 40e6], 95)) < 1e-3
        r2 = got[2]
        assert (r2.n_gaps, r2.mean_gap_us) == (2, 1.5e6)

    def test_tie_break_is_total_order(self, spark):
        """Two events at the same ts: the gap sequence follows event_id."""
        from datalake_indexes_spark.operators.events import inter_arrival_stats

        ev = spark.createDataFrame(
            [(2, 1, 100), (1, 1, 100), (3, 1, 300)],
            "event_id long, user_id long, ts_us long",
        )
        r = inter_arrival_stats(ev).collect()[0]
        assert r.n_gaps == 2 and r.mean_gap_us == 100.0  # gaps 0 and 200us


@pytest.mark.spark
class TestApproxPercentiles:
    def test_approx_tracks_exact_on_lake_index(self, spark, sf_dir):
        """The GK drop-in (approx=True) stays within a small relative
        error of the exact profile on every numeric lake column."""
        from datalake_indexes_spark.operators.cocoa import column_percentiles
        from datalake_indexes_spark.plans.queries import testdata_index

        idx = testdata_index(spark, sf_dir, with_super_keys=False)
        # GK returns an actual element (no interpolation), so on short
        # columns the cut can differ from the interpolated exact value by
        # a whole step — the portable invariants here are plumbing ones:
        # same groups, same counts, cuts inside [min, max] and monotone.
        pcts = (0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
        exact = {
            (r.table_id, r.col_id): r
            for r in column_percentiles(idx, percentiles=pcts).collect()
        }
        approx = {
            (r.table_id, r.col_id): r
            for r in column_percentiles(idx, approx=True).collect()
        }
        assert set(exact) == set(approx)
        for key, a in approx.items():
            e = exact[key]
            assert a.n_values == e.n_values
            cuts = [a.p25, a.p50, a.p75, a.p90, a.p99]
            assert cuts == sorted(cuts), key
            assert e.p0 <= cuts[0] and cuts[-1] <= e.p100, key

    def test_approx_accuracy_on_tall_column(self, spark):
        """Where the sketch claim is meaningful (n >> 1): rank error
        <= n/accuracy makes every cut land within a fraction of a
        percentile of the true one."""
        from datalake_indexes_spark.index.lake_index import LakeIndex
        from datalake_indexes_spark.operators.cocoa import column_percentiles

        n = 10_000
        vals = [((i * 7919) % n) / 10.0 for i in range(n)]  # permutation of 0..999.9
        cells = [(1, 0, i, str(v)) for i, v in enumerate(vals)]
        idx = LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )
        row = column_percentiles(idx, approx=True).collect()[0]
        a = np.array(vals)
        for p, col in [(25, "p25"), (50, "p50"), (75, "p75"), (90, "p90"), (99, "p99")]:
            true = np.percentile(a, p)
            # accuracy=10000 on n=10000 -> rank error <= 1 -> value error
            # bounded by one step of the 0.1-spaced grid (plus interpolation)
            assert abs(getattr(row, col) - true) <= 0.2, (col, getattr(row, col), true)


@pytest.mark.spark
class TestRollingActiveUsers:
    def test_matches_python_reference(self, spark):
        from datalake_indexes_spark.operators.events import rolling_active_users

        day = 86_400_000_000
        # (user, day): gaps, repeats within a day, a quiet mid-range day
        activity = [(1, 0), (1, 0), (2, 0), (1, 1), (3, 3), (1, 4), (2, 4)]
        ev = spark.createDataFrame(
            [(i, u, d * day + 1000 * i) for i, (u, d) in enumerate(activity)],
            "event_id long, user_id long, ts_us long",
        )
        got = {r.period: r for r in rolling_active_users(ev, window_periods=3).collect()}
        acts = {(u, d) for u, d in activity}
        days = range(0, 5)  # through the last observed day
        for d in days:
            users = {u for (u, ad) in acts if d - 2 <= ad <= d}
            today = len({u for (u, ad) in acts if ad == d})
            r = got[d]
            assert (r.n_active, r.rolling_active) == (today, len(users)), d
            assert abs(r.stickiness - today / len(users)) < 1e-6
        assert set(got) == set(days)
        # day 2 has no events but the window still covers day 0-1 actives
        assert got[2].n_active == 0 and got[2].rolling_active == 2

    def test_window_one_is_daily_actives(self, spark):
        from datalake_indexes_spark.operators.events import rolling_active_users

        day = 86_400_000_000
        ev = spark.createDataFrame(
            [(1, 1, 0), (2, 2, 0), (3, 1, day)],
            "event_id long, user_id long, ts_us long",
        )
        rows = {r.period: r for r in rolling_active_users(ev, window_periods=1).collect()}
        assert rows[0].rolling_active == 2 and rows[1].rolling_active == 1
        assert all(r.stickiness == 1.0 for r in rows.values())
