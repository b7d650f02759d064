"""Benford audit vs scipy-free closed-form chi2, exact two-sample KS vs a
brute-force numpy reference, rolling-OLS forecast backtest vs a pandas
reference, unicode normalization invariants."""

from __future__ import annotations

import math
import random
import unicodedata

import numpy as np
import pytest


@pytest.mark.spark
class TestBenfordAudit:
    def _idx(self, spark, vals):
        from datalake_indexes_spark.index.lake_index import LakeIndex

        cells = [(1, 0, i, str(v)) for i, v in enumerate(vals)]
        return LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )

    def test_benford_like_data_not_flagged(self, spark):
        """Exponential growth is the canonical Benford generator."""
        from datalake_indexes_spark.operators.cocoa import benford_audit

        # span EXACTLY three decades (1 → 1000): a geometric series over
        # whole decades is the canonical Benford generator; a partial
        # decade would bias the digit shares and chi2 flags it at this n
        k_max = int(3 * math.log(10) / math.log(1.002))
        vals = [round(1.002 ** k, 4) for k in range(k_max)]
        row = benford_audit(self._idx(spark, vals)).collect()[0]
        assert row.n_values == len(vals)
        assert not row.benford_flag
        # p1 should be near log10(2) ~ 0.301
        assert abs(row.p1 - 0.301) < 0.03

    def test_uniform_digits_flagged(self, spark):
        from datalake_indexes_spark.operators.cocoa import benford_audit

        # uniform over [100, 999]: first digits uniform, wildly non-Benford
        rng = random.Random(7)
        vals = [rng.randint(100, 999) for _ in range(2000)]
        row = benford_audit(self._idx(spark, vals)).collect()[0]
        assert row.benford_flag
        assert row.chi2 > 100

    def test_chi2_closed_form(self, spark):
        """chi2 matches the hand-computed statistic on a tiny fixed set."""
        from datalake_indexes_spark.operators.cocoa import (
            BENFORD_EXPECTED,
            benford_audit,
        )

        vals = ["1", "1.5", "-2", "0.003", "9", "19", "0", "0.0"]  # digits 1,1,2,3,9,1
        row = benford_audit(self._idx(spark, vals)).collect()[0]
        counts = {1: 3, 2: 1, 3: 1, 9: 1}
        n = 6
        chi2 = sum(
            (counts.get(d, 0) - n * e) ** 2 / (n * e)
            for d, e in enumerate(BENFORD_EXPECTED, start=1)
        )
        assert row.n_values == n  # "0"/"0.0" contribute no significant digit
        assert abs(row.chi2 - chi2) < 1e-3
        assert abs(row.p1 - 0.5) < 1e-6

    def test_negative_and_decimal_tokens(self, spark):
        from datalake_indexes_spark.operators.cocoa import benford_audit

        row = benford_audit(self._idx(spark, ["-703", "0.042", "12"])).collect()[0]
        # digits 7, 4, 1
        assert row.p7 == pytest.approx(1 / 3, abs=1e-6)
        assert row.p4 == pytest.approx(1 / 3, abs=1e-6)
        assert row.p1 == pytest.approx(1 / 3, abs=1e-6)


@pytest.mark.spark
class TestKsDrift:
    def _frames(self, spark, a, b):
        fa = spark.createDataFrame([(float(v),) for v in a], "x double")
        fb = spark.createDataFrame([(float(v),) for v in b], "x double")
        return fa, fb

    @staticmethod
    def _ks_brute(a, b):
        pooled = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        sa, sb = sorted(a), sorted(b)
        import bisect

        return max(
            abs(bisect.bisect_right(sa, v) / na - bisect.bisect_right(sb, v) / nb)
            for v in pooled
        )

    def test_matches_brute_force(self, spark):
        from datalake_indexes_spark.operators.cocoa import ks_drift

        rng = random.Random(3)
        a = [rng.gauss(0, 1) for _ in range(300)]
        b = [rng.gauss(0.5, 1.3) for _ in range(200)]
        fa, fb = self._frames(spark, a, b)
        row = ks_drift(fa, fb, ["x"]).collect()[0]
        assert row.n_a == 300 and row.n_b == 200
        assert row.ks_stat == pytest.approx(self._ks_brute(a, b), abs=1e-6)
        assert row.drift_flag  # half-sigma shift at n=500 is detectable

    def test_identical_distributions_not_flagged(self, spark):
        from datalake_indexes_spark.operators.cocoa import ks_drift

        rng = random.Random(11)
        a = [rng.gauss(0, 1) for _ in range(400)]
        fa, fb = self._frames(spark, a, a)
        row = ks_drift(fa, fb, ["x"]).collect()[0]
        assert row.ks_stat == 0.0
        assert not row.drift_flag

    def test_ties_grouped(self, spark):
        """Heavy ties: KS over {1,1,2} vs {1,2,2} = 1/3 exactly."""
        from datalake_indexes_spark.operators.cocoa import ks_drift

        fa, fb = self._frames(spark, [1, 1, 2], [1, 2, 2])
        row = ks_drift(fa, fb, ["x"]).collect()[0]
        assert row.ks_stat == pytest.approx(1 / 3, abs=1e-6)


@pytest.mark.spark
class TestRollingForecastBacktest:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, ts_us long, event_id long, value double"
        )

    def test_perfect_linear_series_zero_error(self, spark):
        """A perfectly linear series extrapolates exactly: mae = 0 and the
        skill vs the (always-one-step-behind) persistence forecast is 1."""
        from datalake_indexes_spark.operators.events import rolling_forecast_backtest

        rows = [(1, t * 10, t, 3.0 + 2.0 * t) for t in range(1, 21)]
        out = rolling_forecast_backtest(
            self._events(spark, rows), window_rows=5
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_forecasts == 20 - 5
        assert r.mae == 0.0
        assert r.naive_mae == pytest.approx(2.0, abs=1e-9)
        assert r.skill == 1.0

    def test_matches_pandas_reference(self, spark):
        from datalake_indexes_spark.operators.events import rolling_forecast_backtest

        rng = random.Random(5)
        rows = [(7, t * 100, t, round(rng.uniform(0, 50), 2)) for t in range(1, 40)]
        r = rolling_forecast_backtest(
            self._events(spark, rows), window_rows=5
        ).collect()[0]

        ys = [v for (_, _, _, v) in rows]
        errs, nerrs = [], []
        for i in range(5, len(ys)):  # 0-based current index, x = i+1
            xs = np.arange(i - 4, i + 1, dtype=float)  # the 5 preceding seqs
            yw = np.array(ys[i - 5 : i])
            slope, intercept = np.polyfit(xs, yw, 1)
            errs.append(ys[i] - (intercept + slope * (i + 1)))
            nerrs.append(ys[i] - ys[i - 1])
        assert r.n_forecasts == len(errs)
        assert r.mae == pytest.approx(np.mean(np.abs(errs)), abs=1e-3)
        assert r.rmse == pytest.approx(math.sqrt(np.mean(np.square(errs))), abs=1e-3)
        assert r.naive_mae == pytest.approx(np.mean(np.abs(nerrs)), abs=1e-3)

    def test_short_series_produces_nothing(self, spark):
        from datalake_indexes_spark.operators.events import rolling_forecast_backtest

        rows = [(1, t, t, float(t)) for t in range(1, 5)]  # 4 < window+1
        assert rolling_forecast_backtest(self._events(spark, rows), window_rows=5).count() == 0


@pytest.mark.spark
class TestNormalizeText:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_folds_and_collapses(self, spark):
        from datalake_indexes_spark.operators.text_analysis import normalize_text

        raw = "“Hi” — a\t\tb \nc​d …\n\n\n\ne"
        out = normalize_text(self._docs(spark, [raw])).collect()[0]
        assert out.normalized == '"Hi" - a b\ncd ...\n\ne'
        assert out.n_chars_before == len(raw)
        assert out.n_chars_after == len(out.normalized)

    def test_clean_ascii_is_fixed_point(self, spark):
        from datalake_indexes_spark.operators.text_analysis import normalize_text

        clean = "plain text with single spaces\nand one newline"
        out = normalize_text(self._docs(spark, [clean])).collect()[0]
        assert out.normalized == clean

    def test_idempotent(self, spark):
        """normalize(normalize(x)) == normalize(x) for noisy input."""
        from datalake_indexes_spark.operators.text_analysis import (
            PLANT_NOISE_PREFIX,
            PLANT_NOISE_SUFFIX,
            normalize_text,
        )

        raw = PLANT_NOISE_PREFIX + "body  text" + PLANT_NOISE_SUFFIX
        once = normalize_text(self._docs(spark, [raw])).collect()[0].normalized
        twice = normalize_text(self._docs(spark, [once])).collect()[0].normalized
        assert twice == once

    def test_output_has_no_targets_left(self, spark):
        from datalake_indexes_spark.operators.text_analysis import (
            NORMALIZE_CHAR_MAP,
            PLANT_NOISE_PREFIX,
            PLANT_NOISE_SUFFIX,
            normalize_text,
        )

        raw = PLANT_NOISE_PREFIX + "x" + PLANT_NOISE_SUFFIX
        out = normalize_text(self._docs(spark, [raw])).collect()[0].normalized
        for src, _ in NORMALIZE_CHAR_MAP:
            assert src not in out
        for ch in ("\u00A0", "\u200B", "\u0001", "\t"):
            assert ch not in out
        assert "  " not in out and "\n\n\n" not in out and " \n" not in out
        assert not any(unicodedata.category(c) == "Cc" and c != "\n" for c in out)


@pytest.mark.spark
class TestNewOpPlanShapes:
    """Scale-shape guard: none of the round-4 operators may plan a
    global (unpartitioned) window or a nested-loop join."""

    def test_ks_drift_windows_are_per_column(self, spark):
        from datalake_indexes_spark.operators.cocoa import ks_drift
        from datalake_indexes_spark.plans.audit import assert_scalable_plan

        df = spark.range(200).selectExpr(
            "cast(id as double) a", "cast(id % 7 as double) b"
        )
        out = ks_drift(df.filter("id % 2 = 0"), df.filter("id % 2 = 1"), ["a", "b"])
        assert_scalable_plan(out, max_global_windows=0)

    def test_benford_is_one_aggregate_no_window(self, spark):
        from datalake_indexes_spark.index.lake_index import LakeIndex
        from datalake_indexes_spark.operators.cocoa import benford_audit
        from datalake_indexes_spark.plans.audit import assert_scalable_plan, plan_report

        idx = LakeIndex(
            cells=spark.createDataFrame(
                [(1, 0, i, str(i + 1)) for i in range(50)],
                "table_id int, col_id int, row_id int, tokenized string",
            ),
            row_keys=None, column_headers=None, table_info=None,
        )
        out = benford_audit(idx)
        assert_scalable_plan(out, max_global_windows=0)
        assert plan_report(out)["n_global_windows"] == 0

    def test_forecast_windows_partitioned_by_key(self, spark):
        from datalake_indexes_spark.operators.events import rolling_forecast_backtest
        from datalake_indexes_spark.plans.audit import assert_scalable_plan

        ev = spark.range(300).selectExpr(
            "id % 9 as user_id", "id as ts_us", "id as event_id",
            "cast(id % 13 as double) as value",
        )
        assert_scalable_plan(
            rolling_forecast_backtest(ev, window_rows=5), max_global_windows=0
        )

    def test_normalize_text_is_map_only(self, spark):
        from datalake_indexes_spark.operators.text_analysis import normalize_text
        from datalake_indexes_spark.plans.audit import assert_scalable_plan

        docs = spark.range(20).selectExpr("id as doc_id", "repeat('a ', 30) as text")
        assert_scalable_plan(normalize_text(docs), max_exchanges=0)


@pytest.mark.spark
class TestSurvivalCurve:
    def test_km_hand_computed(self, spark):
        """Five users: churn at 2,2,5; censored at 8,9 (horizon 2, unit
        periods).  KM: S(2)=3/5, S(5)=3/5*(2/3)=2/5, flat after."""
        from datalake_indexes_spark.operators.events import survival_curve

        rows = []
        for uid, (first, last) in enumerate([(0, 2), (0, 2), (0, 5), (0, 8), (0, 9)]):
            rows += [(uid, first), (uid, last)]
        ev = spark.createDataFrame(rows, "user_id long, ts_us long")
        out = {
            r.duration: r
            for r in survival_curve(
                ev, period_us=1, censor_horizon_periods=2
            ).collect()
        }
        assert sorted(out) == [2, 5, 8, 9]
        assert out[2].n_at_risk == 5 and out[2].n_events == 2
        assert out[2].survival == pytest.approx(0.6, abs=1e-6)
        assert out[5].n_at_risk == 3 and out[5].survival == pytest.approx(0.4, abs=1e-6)
        assert out[8].n_censored == 1 and out[8].survival == pytest.approx(0.4, abs=1e-6)
        assert out[9].survival == pytest.approx(0.4, abs=1e-6)
        assert not out[8].is_event_time and out[2].is_event_time

    def test_all_churn_hits_zero(self, spark):
        """No censoring at all: the curve must reach exactly 0 (the
        ln(0)-is-NULL-in-Spark trap)."""
        from datalake_indexes_spark.operators.events import survival_curve

        rows = []
        for uid, last in enumerate([3, 3, 6]):
            rows += [(uid, 0), (uid, last)]
        # corpus_last=6, horizon 0 periods would censor last=6; use a
        # synthetic extra user far in the future so horizon misses everyone
        rows += [(99, 0), (99, 100)]
        ev = spark.createDataFrame(rows, "user_id long, ts_us long")
        out = {
            r.duration: r
            for r in survival_curve(ev, period_us=1, censor_horizon_periods=1).collect()
        }
        # users 0,1 churn at 3 (at_risk 4): S=0.5; user 2 at 6 (at_risk 2): S=0.25;
        # user 99 censored at 100
        assert out[3].survival == pytest.approx(0.5, abs=1e-6)
        assert out[6].survival == pytest.approx(0.25, abs=1e-6)
        assert out[100].n_censored == 1


@pytest.mark.spark
class TestCategoricalMutualInfo:
    def test_perfect_dependence(self, spark):
        from datalake_indexes_spark.operators.discovery import categorical_mutual_info

        df = spark.createDataFrame(
            [("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")], "a string, b string"
        )
        r = categorical_mutual_info(df, "a", "b").collect()[0]
        assert r.n == 4
        assert r.mi == pytest.approx(math.log(2), abs=1e-6)
        assert r.h_a == pytest.approx(math.log(2), abs=1e-6)
        assert r.nmi == pytest.approx(1.0, abs=1e-6)

    def test_independence_is_zero(self, spark):
        from datalake_indexes_spark.operators.discovery import categorical_mutual_info

        df = spark.createDataFrame(
            [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 3, "a string, b string"
        )
        r = categorical_mutual_info(df, "a", "b").collect()[0]
        assert r.mi == pytest.approx(0.0, abs=1e-9)
        assert r.nmi == pytest.approx(0.0, abs=1e-9)

    def test_nulls_are_a_level(self, spark):
        from datalake_indexes_spark.operators.discovery import categorical_mutual_info

        df = spark.createDataFrame(
            [("x", None), ("x", None), ("y", "q"), ("y", "q")], "a string, b string"
        )
        r = categorical_mutual_info(df, "a", "b").collect()[0]
        # NULL b perfectly tracks a=x: full dependence again
        assert r.nmi == pytest.approx(1.0, abs=1e-6)


@pytest.mark.spark
class TestAbConversionTest:
    def _events(self, spark, rows):
        return spark.createDataFrame(rows, "user_id long, event_type string")

    @staticmethod
    def _variant(uid: int) -> int:
        import hashlib

        return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2

    def test_z_matches_closed_form(self, spark):
        from datalake_indexes_spark.operators.events import ab_conversion_test

        rows = []
        # planted: even uids convert (more purchases than clicks), odd don't
        for uid in range(200):
            if uid % 2 == 0:
                rows += [(uid, "purchase"), (uid, "purchase"), (uid, "click")]
            else:
                rows += [(uid, "purchase"), (uid, "click"), (uid, "click")]
        r = ab_conversion_test(self._events(spark, rows)).collect()[0]
        # recompute from the known md5 assignment
        na = sum(1 for u in range(200) if self._variant(u) == 0)
        ca = sum(1 for u in range(200) if self._variant(u) == 0 and u % 2 == 0)
        nb, cb = 200 - na, sum(1 for u in range(200) if self._variant(u) == 1 and u % 2 == 0)
        assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (na, ca, nb, cb)
        pa, pb, pool = ca / na, cb / nb, (ca + cb) / 200
        z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
        assert r.z_score == pytest.approx(z, abs=1e-3)

    def test_degenerate_experiment_reports_nan(self, spark):
        from datalake_indexes_spark.operators.events import ab_conversion_test

        rows = [(u, "purchase") for u in range(40)]  # everyone converts
        r = ab_conversion_test(self._events(spark, rows)).collect()[0]
        assert r.rate_a == 1.0 and r.rate_b == 1.0
        assert math.isnan(r.z_score)
        assert r.significant is False

    def test_strong_effect_is_significant(self, spark):
        from datalake_indexes_spark.operators.events import ab_conversion_test

        rows = []
        for uid in range(400):
            # variant decides conversion almost perfectly: huge effect
            conv = self._variant(uid) == 0
            rows += [(uid, "purchase" if conv else "click")]
        r = ab_conversion_test(self._events(spark, rows)).collect()[0]
        assert r.significant
        assert abs(r.z_score) > 10


@pytest.mark.spark
class TestCusumChangepoints:
    def _events(self, spark, rows):
        return spark.createDataFrame(rows, "event_type string, ts_us long")

    def test_clean_step_detected_at_the_step(self, spark):
        """Rate 10/period for 20 periods then 2/period for 20: |CUSUM|
        peaks at the last high-rate period and the score clears the
        threshold."""
        from datalake_indexes_spark.operators.events import cusum_changepoints

        rows = []
        for p in range(40):
            n = 10 if p < 20 else 2
            rows += [("a", p * 100 + i) for i in range(n)]
        out = cusum_changepoints(self._events(spark, rows), period_us=100).collect()
        r = out[0]
        assert r.n_periods == 40
        assert r.change_period == 19
        # exact: mean 6, surplus 4/period for 20 periods = 80
        assert r.max_cusum_abs == pytest.approx(80.0, abs=1e-6)
        assert r.change_flag

    def test_constant_rate_not_flagged(self, spark):
        from datalake_indexes_spark.operators.events import cusum_changepoints

        rows = [("a", p * 100 + i) for p in range(30) for i in range(5)]
        r = cusum_changepoints(self._events(spark, rows), period_us=100).collect()[0]
        # perfectly constant: every CUSUM is exactly 0, score undefined (σ=0)
        assert r.max_cusum_abs == 0.0
        assert not r.change_flag

    def test_quiet_periods_count_as_zero(self, spark):
        """A type that stops emitting entirely IS a changepoint; the dense
        grid must include its silent tail."""
        from datalake_indexes_spark.operators.events import cusum_changepoints

        rows = [("a", p * 100 + i) for p in range(10) for i in range(8)]
        # keep the corpus alive for 10 more periods via another type
        rows += [("b", p * 100) for p in range(20)]
        out = {r.event_type: r for r in cusum_changepoints(
            self._events(spark, rows), period_us=100
        ).collect()}
        assert out["a"].n_periods == 20
        assert out["a"].change_period == 9
        assert out["a"].change_flag

    def test_tie_breaks_to_earliest_period(self, spark):
        from datalake_indexes_spark.operators.events import cusum_changepoints

        # symmetric single spike: |CUSUM| hits the same max before and
        # after the spike period; earliest wins
        rows = [("a", p * 100 + i) for p in range(5) for i in range(2)]
        rows += [("a", 200 + 50 + i) for i in range(6)]  # extra 6 in period 2
        r = cusum_changepoints(self._events(spark, rows), period_us=100).collect()[0]
        assert r.change_period <= 2


@pytest.mark.spark
class TestNormalizeCurationStage:
    def test_normalize_stage_composes(self, spark):
        """normalize as the first stage of a pipeline: the dirty duplicate
        only collapses onto the clean copy AFTER normalization."""
        from datalake_indexes_spark.operators.text_analysis import (
            PLANT_NOISE_PREFIX,
        )
        from datalake_indexes_spark.pipelines.curation import run_curation

        base = "the quick brown fox jumps over the lazy dog " * 3
        docs = spark.createDataFrame(
            [
                (1, base.strip()),
                (2, PLANT_NOISE_PREFIX + base.strip()),  # dirty variant
                (3, "completely different text about spark pipelines " * 3),
            ],
            "doc_id long, text string",
        )
        res = run_curation(docs, [{"stage": "normalize"}, {"stage": "dedup_exact"}])
        out = {r.doc_id: r.text for r in res.docs.collect()}
        # doc 2 normalizes to '"Q" - <base>' (prefix keeps quotes/dash) —
        # NOT equal to doc 1, so it survives; but a pure-noise wrapper that
        # normalizes to the same text must collapse:
        assert set(out) == {1, 2, 3}
        docs2 = spark.createDataFrame(
            [(1, base.strip()), (2, base.strip() + "  ​ "), (3, "x")],
            "doc_id long, text string",
        )
        res2 = run_curation(docs2, [{"stage": "normalize"}, {"stage": "dedup_exact"}])
        ids = {r.doc_id for r in res2.docs.collect()}
        assert ids == {1, 3}  # dirty twin collapsed onto the clean copy


@pytest.mark.spark
class TestProfilePsi:
    def _idx(self, spark, vals):
        from datalake_indexes_spark.index.lake_index import LakeIndex

        cells = [(1, 0, i, str(v)) for i, v in enumerate(vals)]
        return LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )

    def test_identical_snapshots_near_zero(self, spark):
        from datalake_indexes_spark.operators.cocoa import profile_psi

        vals = list(range(100))
        a, b = self._idx(spark, vals), self._idx(spark, vals)
        r = profile_psi(a, b).collect()[0]
        assert abs(r.psi) < 1e-9

    def test_shift_raises_psi_above_alert(self, spark):
        """A full-range shift (values +80 of a 0..99 base) moves most
        mass across buckets: PSI far above the 0.25 alert threshold."""
        from datalake_indexes_spark.operators.cocoa import profile_psi

        a = self._idx(spark, list(range(100)))
        b = self._idx(spark, [v + 80 for v in range(100)])
        r = profile_psi(a, b).collect()[0]
        assert r.psi > 0.25

    def test_matches_hand_computed(self, spark):
        """Two buckets, known masses: PSI = Σ (pa-pb)·ln(pa/pb) with
        eps smoothing, hand-checked."""
        from datalake_indexes_spark.operators.cocoa import profile_psi

        # range 0..10, nbins=2 → buckets [0,5) and [5,10]; a: 8 low 2 high,
        # b: 2 low 8 high
        a = self._idx(spark, [0, 1, 2, 3, 4, 0, 1, 2, 9, 10])
        b = self._idx(spark, [0, 1, 9, 10, 10, 9, 8, 7, 6, 10])
        r = profile_psi(a, b, nbins=2, eps=0.5).collect()[0]
        pa = [(8 + 0.5) / 11, (2 + 0.5) / 11]
        pb = [(2 + 0.5) / 11, (8 + 0.5) / 11]
        want = sum((x - y) * math.log(x / y) for x, y in zip(pa, pb))
        assert r.psi == pytest.approx(want, abs=1e-6)


@pytest.mark.spark
class TestEmbeddingDrift:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )

    def test_identical_cohorts(self, spark):
        from datalake_indexes_spark.operators.similarity import embedding_drift

        vecs = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [0.5, 0.5, 0.5]]
        a = self._emb(spark, vecs)
        r = embedding_drift(a, a).collect()[0]
        assert r.centroid_cosine == pytest.approx(1.0, abs=1e-9)
        assert r.norm_ratio == pytest.approx(1.0, abs=1e-9)
        assert r.dim == 3 and r.n_a == 3

    def test_orthogonal_centroids(self, spark):
        from datalake_indexes_spark.operators.similarity import embedding_drift

        a = self._emb(spark, [[1.0, 0.0], [1.0, 0.0]])
        b = self._emb(spark, [[0.0, 1.0], [0.0, 1.0]])
        r = embedding_drift(a, b).collect()[0]
        assert r.centroid_cosine == pytest.approx(0.0, abs=1e-9)

    def test_pure_rescale_caught_by_norm_ratio(self, spark):
        """Doubling every vector: cosine stays 1 (blind), norm ratio 2."""
        from datalake_indexes_spark.operators.similarity import embedding_drift

        vecs = [[1.0, 2.0], [3.0, 4.0]]
        a = self._emb(spark, vecs)
        b = self._emb(spark, [[2 * x for x in v] for v in vecs])
        r = embedding_drift(a, b).collect()[0]
        assert r.centroid_cosine == pytest.approx(1.0, abs=1e-9)
        assert r.norm_ratio == pytest.approx(2.0, abs=1e-9)


@pytest.mark.spark
class TestAbCupedTest:
    @staticmethod
    def _variant(uid: int) -> int:
        import hashlib

        return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2

    def test_cuped_recovers_effect_raw_misses(self, spark):
        """Heterogeneous per-user base rates drown a small treatment
        effect in the raw comparison; the pre-period covariate absorbs
        them, so the adjusted z flags the effect with high variance
        reduction."""
        from datalake_indexes_spark.operators.events import ab_cuped_test

        rows = []
        for uid in range(300):
            base = (uid % 20) * 2  # 0..38 purchases, per period
            effect = 3 if self._variant(uid) == 0 else 0
            # pre period: ts < 1000; post: ts >= 1000 (corpus spans 0..2000)
            rows += [(uid, "purchase", 10 + i) for i in range(base)]
            rows += [(uid, "purchase", 1500 + i) for i in range(base + effect)]
            rows += [(uid, "view", 0), (uid, "view", 2000)]  # pin the bounds
        ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
        r = ab_cuped_test(ev).collect()[0]
        # theta ~ 1 (y = x + effect), variance reduction enormous
        assert r.theta == pytest.approx(1.0, abs=0.05)
        assert r.var_reduction < 0.05
        assert abs(r.z_adj) > abs(r.z_raw)
        assert r.significant
        # adjusted means differ by ~the planted effect
        assert (r.mean_adj_a - r.mean_adj_b) == pytest.approx(3.0, abs=0.5)

    def test_no_effect_is_null(self, spark):
        from datalake_indexes_spark.operators.events import ab_cuped_test

        rows = []
        for uid in range(200):
            base = (uid % 10) * 3
            rows += [(uid, "purchase", 10 + i) for i in range(base)]
            rows += [(uid, "purchase", 1500 + i) for i in range(base)]
            rows += [(uid, "view", 0), (uid, "view", 2000)]
        ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
        r = ab_cuped_test(ev).collect()[0]
        # y == x exactly: perfect covariate, adjusted means equal
        assert r.var_reduction == pytest.approx(0.0, abs=1e-9)
        assert not r.significant


@pytest.mark.spark
class TestZipfFit:
    def test_exact_power_law_recovered(self, spark):
        """Plant freq(rank) = round(10000 * rank^-1): the ln-ln OLS must
        recover slope ~ -1 with r2 ~ 1."""
        from datalake_indexes_spark.operators.text_analysis import zipf_fit

        text = " ".join(
            " ".join([f"w{r:03d}"] * round(10000 / r)) for r in range(1, 51)
        )
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = zipf_fit(docs, top_n=50).collect()[0]
        assert r.top_n == 50 and r.vocab_size == 50
        assert r.slope == pytest.approx(-1.0, abs=0.01)
        assert r.r2 > 0.999

    def test_uniform_frequencies_flat(self, spark):
        from datalake_indexes_spark.operators.text_analysis import zipf_fit

        text = " ".join(" ".join([f"w{r}"] * 20) for r in range(30))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = zipf_fit(docs, top_n=30).collect()[0]
        assert r.slope == pytest.approx(0.0, abs=1e-9)

    def test_deterministic_tie_ranks(self, spark):
        """All-tied counts rank by word ASC — two runs agree exactly."""
        from datalake_indexes_spark.operators.text_analysis import zipf_fit

        text = "b a c b a c"
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r1 = zipf_fit(docs, top_n=3).collect()[0]
        r2 = zipf_fit(docs, top_n=3).collect()[0]
        assert r1 == r2 and r1.n_tokens == 6


@pytest.mark.spark
class TestFunnelTiming:
    def test_hand_computed_transitions(self, spark):
        from datalake_indexes_spark.operators.events import funnel_timing

        rows = [
            # user 1: full funnel, 10s then 20s gaps
            (1, "view", 0), (1, "click", 10_000_000), (1, "purchase", 30_000_000),
            # user 2: view → click only (5s)
            (2, "view", 0), (2, "click", 5_000_000),
            # user 3: view only
            (3, "view", 0),
            # user 4: click with no prior view — outside the funnel
            (4, "click", 0),
        ]
        ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
        out = {r.transition: r for r in funnel_timing(
            ev, ["view", "click", "purchase"]
        ).collect()}
        t1 = out["1:view->click"]
        assert (t1.n_from, t1.n_to) == (3, 2)
        assert t1.conversion_rate == pytest.approx(2 / 3, abs=1e-6)
        assert t1.median_s == pytest.approx(7.5, abs=1e-6)  # median of {10, 5}
        t2 = out["2:click->purchase"]
        assert (t2.n_from, t2.n_to) == (2, 1)
        assert t2.median_s == pytest.approx(20.0, abs=1e-6)


@pytest.mark.spark
class TestDropAudit:
    def test_first_failing_stage_wins(self, spark):
        from datalake_indexes_spark.pipelines.curation import drop_audit

        good = (
            "many developers write careful tests because reliable software "
            "needs the discipline of checking every assumption against real "
            "behavior over time with diverse tools and honest reviews"
        )
        docs = spark.createDataFrame(
            [
                (1, good),                        # survives (score ~0.89)
                (2, good),                        # exact dup of 1 -> dedup_exact
                (3, "aa aa aa aa aa " * 20),      # score ~0.28 -> quality gate
                (4, "spam ham spam ham " * 20),   # 0.35 quality, 0.5 bigram -> repetition
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.dropped_at for r in drop_audit(
            docs,
            [
                {"stage": "quality_min", "min_score": 0.3},
                {"stage": "max_repetition", "max_frac": 0.2},
                {"stage": "dedup_exact"},
            ],
        ).collect()}
        assert out[1] == "survived"
        assert out[2] == "dedup_exact"
        assert out[3] == "quality_min"
        assert out[4] == "max_repetition"
        assert len(out) == 4  # one row per INPUT doc

    def test_transform_stages_never_drop(self, spark):
        from datalake_indexes_spark.pipelines.curation import drop_audit

        docs = spark.createDataFrame(
            [(1, "reach me at a@b.co please " * 10)], "doc_id long, text string"
        )
        out = drop_audit(
            docs, [{"stage": "normalize"}, {"stage": "pii_scrub"}]
        ).collect()
        assert out[0].dropped_at == "survived"


@pytest.mark.spark
class TestDocNovelty:
    def test_planted_duplicates_score_zero(self, spark):
        from datalake_indexes_spark.operators.dedup import doc_novelty

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "alpha beta gamma delta epsilon zeta"),  # exact twin
                (3, "one two three four five six seven"),     # unique
                (4, "xy"),                                    # too short for n=3
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in doc_novelty(docs, n=3).collect()}
        assert out[1].novel_frac == 0.0 and out[2].novel_frac == 0.0
        assert out[3].novel_frac == 1.0
        assert out[4].n_shingles == 0 and out[4].novel_frac is None

    def test_partial_overlap(self, spark):
        """Doc sharing half its shingles with another scores 0.5."""
        from datalake_indexes_spark.operators.dedup import doc_novelty

        # doc 1: grams {a b c, b c d} — 'a b c' shared with doc 2
        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c")], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in doc_novelty(docs, n=3).collect()}
        assert out[1].n_shingles == 2
        assert out[1].novel_frac == pytest.approx(0.5, abs=1e-9)
        assert out[2].novel_frac == 0.0


@pytest.mark.spark
class TestParetoReport:
    def test_hand_computed_concentration(self, spark):
        """Weights 50, 30, 10, 5, 5 (total 100): 50% needs 1 key, 80%
        needs 2, 90% needs 3, 99% needs 5."""
        from datalake_indexes_spark.operators.discovery import pareto_report

        df = spark.createDataFrame(
            [("a", 50.0), ("b", 30.0), ("c", 10.0), ("d", 5.0), ("e", 5.0)],
            "k string, w double",
        )
        out = {r.target_share: r for r in pareto_report(df, "k", "w").collect()}
        assert out[0.5].n_keys == 1 and out[0.5].share_reached == 0.5
        assert out[0.8].n_keys == 2 and out[0.8].share_reached == 0.8
        assert out[0.9].n_keys == 3
        assert out[0.99].n_keys == 5 and out[0.99].key_frac == 1.0

    def test_matches_plain_sort_reference(self, spark):
        """The two-level prefix sum equals the obvious single-sort
        cumulative on randomized weights, including duplicate weights
        (tie-broken by key)."""
        import random

        from datalake_indexes_spark.operators.discovery import pareto_report

        rng = random.Random(13)
        rows = [(f"k{i:03d}", float(rng.randint(1, 40))) for i in range(120)]
        df = spark.createDataFrame(rows, "k string, w double")
        got = {r.target_share: (r.n_keys, r.share_reached) for r in
               pareto_report(df, "k", "w").collect()}
        # reference: plain sorted cumulative
        ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
        total = sum(w for _, w in rows)
        cum, ref = 0.0, {}
        shares = []
        for i, (_, w) in enumerate(ordered, start=1):
            cum += w
            shares.append((i, cum / total))
        for t in (0.5, 0.8, 0.9, 0.95, 0.99):
            n, s = next((i, sh) for i, sh in shares if sh >= t)
            ref[t] = (n, round(s, 6))
        for t, want in ref.items():
            assert got[t][0] == want[0], t
            assert got[t][1] == pytest.approx(want[1], abs=2e-6)

    def test_per_key_aggregation_first(self, spark):
        """Multiple rows per key sum before ranking."""
        from datalake_indexes_spark.operators.discovery import pareto_report

        df = spark.createDataFrame(
            [("a", 10.0), ("a", 40.0), ("b", 50.0)], "k string, w double"
        )
        out = {r.target_share: r for r in pareto_report(df, "k", "w").collect()}
        assert out[0.5].n_keys == 1  # both keys weigh 50 — one suffices


@pytest.mark.spark
class TestScd2Lookup:
    def test_point_in_time_semantics(self, spark):
        """Facts see the dimension version valid AT their ts: before the
        first interval → NULL, at a boundary → the new version, in a
        custom GAP → NULL (interval end checked, not just as-of start)."""
        from datalake_indexes_spark.operators.events import scd2_lookup

        hist = spark.createDataFrame(
            [
                (1, "bronze", 100, 200, 1),
                (1, "gold", 200, None, 2),
                # key 2: gapped custom history [100,150) then [300,...)
                (2, "silver", 100, 150, 1),
                (2, "gold", 300, None, 2),
            ],
            "user_id long, tier string, valid_from long, valid_to long, version int",
        )
        facts = spark.createDataFrame(
            [(10, 1, 50), (11, 1, 150), (12, 1, 200), (13, 1, 999),
             (20, 2, 120), (21, 2, 200), (22, 2, 350)],
            "event_id long, user_id long, ts_us long",
        )
        out = {r.event_id: (r.dim_tier, r.dim_version) for r in scd2_lookup(
            facts, hist, "user_id", "ts_us", ["tier"]
        ).collect()}
        assert out[10] == (None, None)          # before first interval
        assert out[11] == ("bronze", 1)
        assert out[12] == ("gold", 2)           # boundary: new version
        assert out[13] == ("gold", 2)           # open-ended current
        assert out[20] == ("silver", 1)
        assert out[21] == (None, None)          # the gap
        assert out[22] == ("gold", 2)

    def test_roundtrip_with_history_builder(self, spark):
        """scd2_history → scd2_lookup round trip: looking up each source
        observation returns its own attribute value."""
        from datalake_indexes_spark.operators.events import scd2_history, scd2_lookup

        obs = spark.createDataFrame(
            [(1, "a", 10, 1), (1, "a", 20, 2), (1, "b", 30, 3), (1, "a", 40, 4)],
            "user_id long, attr string, ts_us long, event_id long",
        )
        hist = scd2_history(obs, ["user_id"], ["attr"], seq_col="event_id")
        facts = obs.select("event_id", "user_id", "ts_us")
        out = {r.event_id: r.dim_attr for r in scd2_lookup(
            facts, hist, "user_id", "ts_us", ["attr"]
        ).collect()}
        assert out == {1: "a", 2: "a", 3: "b", 4: "a"}


@pytest.mark.spark
class TestRfmSegments:
    def test_known_grid(self, spark):
        """Five users with strictly ordered R/F/M: each lands in its own
        quintile, best user reads 555."""
        from datalake_indexes_spark.operators.events import rfm_segments

        rows = []
        for uid in range(1, 6):
            # uid 5: most recent (latest last-purchase), most frequent,
            # biggest spender
            for k in range(uid):
                rows.append((uid, "purchase", uid * 100 + k, 10.0 * uid))
        rows.append((9, "view", 1000, 0.0))  # pins corpus last timestamp
        ev = spark.createDataFrame(
            rows, "user_id long, event_type string, ts_us long, value double"
        )
        out = {r.key: r for r in rfm_segments(ev).collect()}
        assert len(out) == 5  # the view-only user has no purchases
        assert out[5].segment == "555"
        assert out[1].segment == "111"
        assert out[3].r == 3 and out[3].f == 3 and out[3].m == 3
        assert out[5].recency_us == 1000 - (5 * 100 + 4)
        assert out[4].frequency == 4
        assert out[2].monetary == pytest.approx(40.0)


@pytest.mark.spark
class TestRateCrossCorrelation:
    def test_planted_lead_detected(self, spark):
        """b's series is a's shifted by +2 periods: corr peaks at lag 2
        with corr ~ 1 (a LEADS b)."""
        from datalake_indexes_spark.operators.events import rate_cross_correlation

        rows = []
        # a: a varied rate pattern over 30 periods; b mirrors it 2 later
        for p in range(30):
            n = (p * 7) % 5 + 1
            rows += [("a", p * 100 + i) for i in range(n)]
            rows += [("b", (p + 2) * 100 + i) for i in range(n)]
        ev = spark.createDataFrame(rows, "event_type string, ts_us long")
        out = {r.lag: r for r in rate_cross_correlation(
            ev, "a", "b", max_lag=4, period_us=100
        ).collect()}
        assert len(out) == 9
        best = max(out.values(), key=lambda r: (r.corr if r.corr is not None else -2))
        assert best.lag == 2
        assert best.corr > 0.95
        # overlap shrinks with |lag|
        assert out[4].n_periods == out[0].n_periods - 4

    def test_self_correlation_is_one_at_zero_lag(self, spark):
        from datalake_indexes_spark.operators.events import rate_cross_correlation

        rows = [("a", p * 100 + i) for p in range(20) for i in range((p % 4) + 1)]
        ev = spark.createDataFrame(rows, "event_type string, ts_us long")
        out = {r.lag: r.corr for r in rate_cross_correlation(
            ev, "a", "a", max_lag=2, period_us=100
        ).collect()}
        assert out[0] == pytest.approx(1.0, abs=1e-9)


@pytest.mark.spark
class TestGlobalRank:
    def test_matches_window_row_number(self, spark):
        """The bucketed two-level rank equals row_number() over the same
        total order, including duplicates, negatives and zeros."""
        import random

        from pyspark.sql import Window
        from pyspark.sql import functions as F
        from datalake_indexes_spark.functions.ranking import global_rank

        rng = random.Random(17)
        rows = [(f"k{i:03d}", float(rng.choice([-5, -1, 0, 0, 2, 2, 7, 100])))
                for i in range(200)]
        df = spark.createDataFrame(rows, "k string, v double")
        for asc in (True, False):
            got = {
                r.k: r.rank
                for r in global_rank(df, "v", "k", ascending=asc).collect()
            }
            order = F.asc("v") if asc else F.desc("v")
            want = {
                r.k: r.rn
                for r in df.withColumn(
                    "rn", F.row_number().over(Window.orderBy(order, F.asc("k")))
                ).collect()
            }
            assert got == want, f"ascending={asc}"

    def test_ntile_from_rank_matches_engine_ntile(self, spark):
        """Closed-form allocation == ntile() for every (n, t) shape
        including n < t, n % t != 0 and exact division."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F
        from datalake_indexes_spark.functions.ranking import ntile_from_rank

        for n, t in [(10, 5), (11, 5), (7, 5), (3, 5), (5, 5), (23, 4)]:
            df = spark.range(1, n + 1).withColumnRenamed("id", "rank")
            got = df.select(
                "rank",
                ntile_from_rank(F.col("rank"), F.lit(n).cast("long"), t).alias("tile"),
            )
            want = spark.range(1, n + 1).select(
                F.col("id").alias("rank"),
                F.ntile(t).over(Window.orderBy("id")).alias("tile"),
            )
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, want.collect())
            ), (n, t)


@pytest.mark.spark
class TestReviewFixes:
    """Regression tests for the round's code-review findings."""

    def test_global_rank_null_values_do_not_corrupt(self, spark):
        from datalake_indexes_spark.functions.ranking import global_rank

        df = spark.createDataFrame(
            [("k1", 10.0), ("k2", None), ("k3", 5.0), ("k4", float("nan"))],
            "k string, v double",
        )
        out = {r.k: r.rank for r in global_rank(df, "v", "k").collect()}
        assert out == {"k3": 1, "k1": 2, "k2": None, "k4": None}

    def test_cusum_constant_series_never_flags(self, spark):
        """Perfectly constant rate: var == 0 exactly → score NULL,
        flag false (the NaN>crit trap)."""
        from datalake_indexes_spark.operators.events import cusum_changepoints

        rows = [("a", p * 100 + i) for p in range(20) for i in range(4)]
        ev = spark.createDataFrame(rows, "event_type string, ts_us long")
        r = cusum_changepoints(ev, period_us=100).collect()[0]
        assert r.score is None and not r.change_flag

    def test_cuped_zero_variance_not_significant(self, spark):
        from datalake_indexes_spark.operators.events import ab_cuped_test

        # every user identical: all variances 0 → z NULL, significant false
        rows = []
        for uid in range(50):
            rows += [(uid, "purchase", 10), (uid, "purchase", 1500),
                     (uid, "view", 0), (uid, "view", 2000)]
        ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
        r = ab_cuped_test(ev).collect()[0]
        assert r.z_adj is None and r.significant is False

    def test_normalize_crlf_text(self, spark):
        from datalake_indexes_spark.operators.text_analysis import normalize_text

        raw = "a \r\nb\r\n\r\n\r\n\r\nc"
        docs = spark.createDataFrame([(1, raw)], "doc_id long, text string")
        out = normalize_text(docs).collect()[0].normalized
        assert out == "a\nb\n\nc"

    def test_funnel_timing_quoted_step_name(self, spark):
        from datalake_indexes_spark.operators.events import funnel_timing

        rows = [(1, "view", 0), (1, "add's", 10), (2, "view", 5)]
        ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
        out = funnel_timing(ev, ["view", "add's"]).collect()
        assert len(out) == 1 and out[0].n_from == 2 and out[0].n_to == 1

    def test_ks_drift_quoted_column_name(self, spark):
        from datalake_indexes_spark.operators.cocoa import ks_drift

        df = spark.range(10).selectExpr("cast(id as double) as `odd'name`")
        row = ks_drift(df, df, ["odd'name"]).collect()[0]
        assert row.ks_stat == 0.0


@pytest.mark.spark
class TestFrameDiff:
    def test_reports_mismatch_and_presence(self, spark):
        from datalake_indexes_spark.operators.validate import frame_diff

        a = spark.createDataFrame(
            [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)], "k long, s string, v double"
        )
        b = spark.createDataFrame(
            [(1, "x", 1.0), (2, "y", 2.5), (4, "w", 4.0)], "k long, s string, v double"
        )
        out = {r.column_name: r for r in frame_diff(a, b, ["k"]).collect()}
        assert out["v"].n_only_a == 1 and out["v"].n_only_b == 1
        assert out["v"].n_compared == 2 and out["v"].n_mismatch == 1
        assert out["v"].example_key == "2"
        assert out["s"].n_mismatch == 0

    def test_tolerance_and_null_safety(self, spark):
        from datalake_indexes_spark.operators.validate import frame_diff

        a = spark.createDataFrame([(1, 1.0), (2, None), (3, 5.0)], "k long, v double")
        b = spark.createDataFrame([(1, 1.0005), (2, None), (3, 6.0)], "k long, v double")
        strict = {r.column_name: r.n_mismatch for r in frame_diff(a, b, ["k"]).collect()}
        assert strict["v"] == 2  # 1 vs 1.0005 and 5 vs 6 (NULL==NULL ok)
        loose = {r.column_name: r.n_mismatch for r in
                 frame_diff(a, b, ["k"], tol=0.001).collect()}
        assert loose["v"] == 1  # only 5 vs 6 survives the tolerance


@pytest.mark.spark
class TestMarkovAbsorption:
    def _ev(self, spark, rows):
        return spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")

    def test_hand_computed_chain(self, spark):
        """Two-state chain: from 'a', 50% → purchase, 50% → end.
        From 'b', always → a.  p(a) = 0.5, p(b) = 0.5."""
        from datalake_indexes_spark.operators.events import markov_absorption

        rows = []
        # user 1: a → purchase; user 2: a (→ END); users 3,4: b → a → ...
        rows += [(1, "a", 0), (1, "purchase", 1)]
        rows += [(2, "a", 0)]
        rows += [(3, "b", 0), (3, "a", 1), (3, "purchase", 2)]
        rows += [(4, "b", 0), (4, "a", 1)]
        out = {r.state: r for r in markov_absorption(self._ev(spark, rows)).collect()}
        assert out["purchase"].p_absorb == 1.0
        assert out["a"].p_absorb == pytest.approx(0.5, abs=1e-6)
        assert out["b"].p_absorb == pytest.approx(0.5, abs=1e-6)
        assert out["a"].n_out == 4 and out["b"].n_out == 2

    def test_multi_hop_converges(self, spark):
        """Deterministic chain c → b → a → purchase: every state 1.0."""
        from datalake_indexes_spark.operators.events import markov_absorption

        rows = [(1, "c", 0), (1, "b", 1), (1, "a", 2), (1, "purchase", 3)]
        out = {r.state: r.p_absorb for r in markov_absorption(
            self._ev(spark, rows)
        ).collect()}
        assert out == {"c": 1.0, "b": 1.0, "a": 1.0, "purchase": 1.0}

    def test_unreachable_state_is_zero(self, spark):
        from datalake_indexes_spark.operators.events import markov_absorption

        rows = [(1, "dead", 0), (2, "a", 0), (2, "purchase", 1)]
        out = {r.state: r.p_absorb for r in markov_absorption(
            self._ev(spark, rows)
        ).collect()}
        assert out["dead"] == 0.0 and out["a"] == 1.0


@pytest.mark.spark
class TestMarkovRemovalEffects:
    def _ev(self, spark, rows):
        return spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")

    def test_sole_gateway_channel_carries_everything(self, spark):
        """All conversion paths run through 'b': removing it kills
        conversion entirely; removing the side channel 'c' changes
        nothing."""
        from datalake_indexes_spark.operators.events import markov_removal_effects

        rows = []
        for uid in range(10):
            rows += [(uid, "a", 0), (uid, "b", 1), (uid, "purchase", 2)]
        rows += [(100, "c", 0)]  # a dead-end side channel
        out = {r.channel: r for r in markov_removal_effects(
            self._ev(spark, rows)
        ).collect()}
        assert out["b"].removal_effect == pytest.approx(1.0, abs=1e-6)
        assert out["c"].removal_effect == pytest.approx(0.0, abs=1e-6)
        # removing 'a' also kills it (every journey starts there)
        assert out["a"].removal_effect == pytest.approx(1.0, abs=1e-6)

    def test_redundant_channels_split_credit(self, spark):
        """Two parallel paths a→purchase and b→purchase, equal traffic:
        removing either halves conversion."""
        from datalake_indexes_spark.operators.events import markov_removal_effects

        rows = []
        for uid in range(10):
            ch = "a" if uid % 2 == 0 else "b"
            rows += [(uid, ch, 0), (uid, "purchase", 1)]
        out = {r.channel: r for r in markov_removal_effects(
            self._ev(spark, rows)
        ).collect()}
        assert out["a"].p_base == pytest.approx(1.0, abs=1e-6)
        assert out["a"].removal_effect == pytest.approx(0.5, abs=1e-6)
        assert out["b"].removal_effect == pytest.approx(0.5, abs=1e-6)


@pytest.mark.spark
class TestSecondReviewFixes:
    """Regression tests for the second review batch."""

    def test_frame_diff_null_vs_value_counts_under_tolerance(self, spark):
        from datalake_indexes_spark.operators.validate import frame_diff

        a = spark.createDataFrame([(3, 5.0)], "k long, v double")
        b = spark.createDataFrame([(3, None)], "k long, v double")
        r = frame_diff(a, b, ["k"], tol=0.001).collect()[0]
        assert r.n_mismatch == 1

    def test_frame_diff_null_keys_are_compared(self, spark):
        from datalake_indexes_spark.operators.validate import frame_diff

        a = spark.createDataFrame([(None, 1.0), (2, 2.0)], "k long, v double")
        b = spark.createDataFrame([(None, 9.0), (2, 2.0)], "k long, v double")
        r = frame_diff(a, b, ["k"]).collect()[0]
        assert r.n_compared == 2 and r.n_mismatch == 1

    def test_frame_diff_nan_equal_under_tolerance(self, spark):
        from datalake_indexes_spark.operators.validate import frame_diff

        nan = float("nan")
        a = spark.createDataFrame([(1, nan)], "k long, v double")
        r0 = frame_diff(a, a, ["k"]).collect()[0]
        r1 = frame_diff(a, a, ["k"], tol=0.001).collect()[0]
        assert r0.n_mismatch == 0 and r1.n_mismatch == 0

    def test_frame_diff_asymmetric_columns_raise(self, spark):
        import pytest as _pytest

        from datalake_indexes_spark.operators.validate import frame_diff

        a = spark.createDataFrame([(1, 1.0, "x")], "k long, v double, extra string")
        b = spark.createDataFrame([(1, 1.0)], "k long, v double")
        with _pytest.raises(ValueError, match="asymmetric"):
            frame_diff(a, b, ["k"])
        ok = frame_diff(a, b, ["k"], allow_asymmetric_columns=True).collect()
        assert [r.column_name for r in ok] == ["v"]

    def test_frame_diff_decimal_tolerance(self, spark):
        from datalake_indexes_spark.operators.validate import frame_diff

        a = spark.createDataFrame([(1, "1.000001")], "k long, v string").selectExpr(
            "k", "cast(v as decimal(18,6)) as v"
        )
        b = spark.createDataFrame([(1, "1.000002")], "k long, v string").selectExpr(
            "k", "cast(v as decimal(18,6)) as v"
        )
        assert frame_diff(a, b, ["k"], tol=1e-5).collect()[0].n_mismatch == 0
        assert frame_diff(a, b, ["k"]).collect()[0].n_mismatch == 1

    def test_markov_sentinel_collision_raises(self, spark):
        import pytest as _pytest

        from datalake_indexes_spark.operators.events import markov_absorption

        ev = spark.createDataFrame(
            [(1, "__END__", 0), (1, "purchase", 1)],
            "user_id long, event_type string, ts_us long",
        )
        with _pytest.raises(ValueError, match="sentinel"):
            markov_absorption(ev)

    def test_global_rank_null_rows_salted_not_single_partition(self, spark):
        """The invalid-row buckets spread across 64 salts (plan-level:
        no all-NULL single window partition)."""
        from datalake_indexes_spark.functions.ranking import global_rank

        df = spark.createDataFrame(
            [(f"k{i}", None if i % 2 else float(i)) for i in range(200)],
            "k string, v double",
        )
        out = global_rank(df, "v", "k").collect()
        ranked = sorted(r.rank for r in out if r.rank is not None)
        assert ranked == list(range(1, 101))
        assert sum(1 for r in out if r.rank is None) == 100


@pytest.mark.spark
class TestAdviceRegressionsR5:
    def test_frame_diff_dtype_drift_raises(self, spark):
        """A numeric column drifting to string in `b` must raise, not
        silently NULL-cast into an under-counted n_mismatch."""
        from datalake_indexes_spark.operators.validate import frame_diff

        a = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
        b = spark.createDataFrame([(1, "1.0"), (2, "oops")], "k long, v string")
        with pytest.raises(ValueError, match="dtype drift"):
            frame_diff(a, b, ["k"], tol=0.001)

    def test_frame_diff_numeric_widening_allowed(self, spark):
        """int vs double is lossless under the tol cast — no raise, and
        the comparison still counts real mismatches."""
        from datalake_indexes_spark.operators.validate import frame_diff

        a = spark.createDataFrame([(1, 1), (2, 2)], "k long, v int")
        b = spark.createDataFrame([(1, 1.0), (2, 3.0)], "k long, v double")
        out = {r.column_name: r for r in frame_diff(a, b, ["k"], tol=0.5).collect()}
        assert out["v"].n_mismatch == 1

    def test_mutual_info_null_level_does_not_collide(self, spark):
        """A genuine string value ' null' stays a distinct level from
        NULL: two separate levels of b => b fully determined by a only
        if they really align."""
        from datalake_indexes_spark.operators.discovery import categorical_mutual_info

        # b has three distinct levels: ' null' (string), NULL, 'q'
        df = spark.createDataFrame(
            [("x", " null"), ("y", None), ("z", "q")], "a string, b string"
        )
        r = categorical_mutual_info(df, "a", "b").collect()[0]
        assert r.h_b == pytest.approx(math.log(3), abs=1e-6)

    def test_chi2_null_level_does_not_collide(self, spark):
        from datalake_indexes_spark.operators.discovery import categorical_association

        df = spark.createDataFrame(
            [("x", " null"), ("x", None), ("y", "q"), ("y", "q")], "a string, b string"
        )
        r = categorical_association(df, "a", "b").collect()[0]
        # 3 levels of b, 2 of a -> dof = (2-1)*(3-1) = 2 (merged would be 1)
        assert r.dof == 2

    def test_rfm_all_null_monetary_gets_tile(self, spark):
        """A key whose purchase values are all NULL ranks as monetary 0,
        not NULL — the m tile and segment code stay populated."""
        from datalake_indexes_spark.operators.events import rfm_segments

        rows = [(1, "purchase", 100, None), (2, "purchase", 200, 50.0)]
        ev = spark.createDataFrame(
            rows, "user_id long, event_type string, ts_us long, value double"
        )
        out = {r.key: r for r in rfm_segments(ev).collect()}
        assert out[1].monetary == 0.0
        assert out[1].m is not None and out[1].segment is not None
        assert out[2].m > out[1].m or out[2].m == out[1].m  # ranked, not NULL

    def test_markov_removal_base_sentinel_guard(self, spark):
        from datalake_indexes_spark.operators.events import markov_removal_effects

        ev = spark.createDataFrame(
            [(1, "__BASE__", 0), (1, "purchase", 1)],
            "user_id long, event_type string, ts_us long",
        )
        with pytest.raises(ValueError, match="__BASE__"):
            markov_removal_effects(ev)


@pytest.mark.spark
class TestHoltForecast:
    def test_hand_computed_series(self, spark):
        """Two users, one with a clean +1/day trend (level tracks the
        last value, trend -> 1, rmse 0), one hand-stepped."""
        from datalake_indexes_spark.operators.events import holt_forecast

        day = 86_400_000_000
        rows = []
        # user 1: k events on day k (counts 1,2,3,4,5)
        for d in range(1, 6):
            rows += [(1, "e", d * day + i) for i in range(d)]
        # user 2: counts 4, 1, 7
        for d, c in [(1, 4), (2, 1), (3, 7)]:
            rows += [(2, "e", d * day + i) for i in range(c)]
        ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
        out = {r.key: r for r in
               holt_forecast(ev, alpha=0.5, beta=0.3, horizon=3).collect()}

        # linear series: one-step preds are exact every step
        assert out[1].rmse == 0.0
        assert out[1].level == pytest.approx(5.0)
        assert out[1].trend == pytest.approx(1.0)
        assert out[1].forecast == pytest.approx(8.0)

        # hand-step user 2: l1=4, b1=-3
        a, b_ = 0.5, 0.3
        lvl, tr, se = 4.0, -3.0, 0.0
        for y in [1.0, 7.0]:
            e = y - (lvl + tr)
            se += e * e
            l_new = a * y + (1 - a) * (lvl + tr)
            tr = b_ * (l_new - lvl) + (1 - b_) * tr
            lvl = l_new
        assert out[2].level == pytest.approx(lvl, abs=1e-6)
        assert out[2].trend == pytest.approx(tr, abs=1e-6)
        assert out[2].rmse == pytest.approx((se / 2) ** 0.5, abs=1e-6)
        assert out[2].forecast == pytest.approx(lvl + 3 * tr, abs=1e-6)

    def test_single_period_key_dropped(self, spark):
        from datalake_indexes_spark.operators.events import holt_forecast

        ev = spark.createDataFrame(
            [(1, "e", 10), (1, "e", 20), (2, "e", 99)],
            "user_id long, event_type string, ts_us long",
        )
        # user 1's two events share day 0 -> one period -> dropped too
        assert holt_forecast(ev).count() == 0

    def test_invalid_params_raise(self, spark):
        from datalake_indexes_spark.operators.events import holt_forecast

        ev = spark.createDataFrame([(1, "e", 0)], "user_id long, event_type string, ts_us long")
        with pytest.raises(ValueError, match="alpha"):
            holt_forecast(ev, alpha=0.0)


@pytest.mark.spark
class TestTheilSenTrend:
    def _ev(self, spark, day_counts, uid=1):
        day = 86_400_000_000
        rows = [
            (uid, "e", d * day + i)
            for d, c in day_counts
            for i in range(c)
        ]
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts_us long"
        )

    def test_outlier_day_ignored(self, spark):
        """y = x (counts 1..7) with one wild outlier day: the median
        slope stays 1 where OLS would tilt."""
        from datalake_indexes_spark.operators.events import theil_sen_trend

        days = [(d, d) for d in range(1, 8)]
        days[3] = (4, 100)  # outlier
        r = theil_sen_trend(self._ev(spark, days)).collect()[0]
        assert r.slope == pytest.approx(1.0, abs=1e-9)
        assert r.n_periods == 7 and r.n_pairs == 21

    def test_hand_computed_median_of_slopes(self, spark):
        import itertools
        import statistics

        from datalake_indexes_spark.operators.events import theil_sen_trend

        days = [(1, 3), (2, 1), (4, 9), (5, 2)]
        r = theil_sen_trend(self._ev(spark, days)).collect()[0]
        pts = [(p, float(c)) for p, c in days]
        slopes = sorted(
            (y2 - y1) / (x2 - x1)
            for (x1, y1), (x2, y2) in itertools.combinations(pts, 2)
        )
        want_slope = statistics.median(slopes)
        assert r.slope == pytest.approx(want_slope, abs=1e-9)
        resid = sorted(y - want_slope * x for x, y in pts)
        assert r.intercept == pytest.approx(statistics.median(resid), abs=1e-9)

    def test_single_period_key_dropped(self, spark):
        from datalake_indexes_spark.operators.events import theil_sen_trend

        assert theil_sen_trend(self._ev(spark, [(1, 4)])).count() == 0


@pytest.mark.spark
class TestMannKendall:
    def _ev(self, spark, day_counts, uid=1):
        day = 86_400_000_000
        return spark.createDataFrame(
            [(uid, "e", d * day + i) for d, c in day_counts for i in range(c)],
            "user_id long, event_type string, ts_us long",
        )

    def test_strictly_increasing(self, spark):
        """Counts 1..6: S = C(6,2) = 15, no ties, var = 6*5*17/18."""
        from datalake_indexes_spark.operators.events import mann_kendall_trend

        r = mann_kendall_trend(self._ev(spark, [(d, d) for d in range(1, 7)])).collect()[0]
        assert r.s_stat == 15 and r.n_periods == 6
        var = 6 * 5 * 17 / 18
        assert r.var_s == pytest.approx(var)
        assert r.z == pytest.approx(14 / var ** 0.5, abs=1e-9)

    def test_tie_correction_and_flat_series(self, spark):
        from datalake_indexes_spark.operators.events import mann_kendall_trend

        # all-tied: S = 0, var = 0, z = 0
        r = mann_kendall_trend(self._ev(spark, [(d, 3) for d in range(4)])).collect()[0]
        assert r.s_stat == 0 and r.var_s == 0.0 and r.z == 0.0
        # one tie pair: counts 1,2,2,5 -> tie term 2*1*9 = 18
        r2 = mann_kendall_trend(
            self._ev(spark, [(0, 1), (1, 2), (2, 2), (3, 5)])
        ).collect()[0]
        assert r2.s_stat == 5
        assert r2.var_s == pytest.approx((4 * 3 * 13 - 18) / 18)

    def test_decreasing_is_negative(self, spark):
        from datalake_indexes_spark.operators.events import mann_kendall_trend

        r = mann_kendall_trend(self._ev(spark, [(d, 7 - d) for d in range(1, 7)])).collect()[0]
        assert r.s_stat == -15 and r.z < 0


@pytest.mark.spark
class TestMannWhitneyU:
    def _df(self, spark, a_vals, b_vals):
        rows = [(i, 0, float(v)) for i, v in enumerate(a_vals)]
        rows += [(1000 + i, 1, float(v)) for i, v in enumerate(b_vals)]
        return spark.createDataFrame(rows, "event_id long, g int, value double")

    def test_matches_scipy_style_reference(self, spark):
        """Hand-computed U with ties against the closed forms."""
        from datalake_indexes_spark.operators.events import mann_whitney_u

        a, b = [1.0, 2.0, 3.0, 3.0], [3.0, 4.0, 5.0]
        r = mann_whitney_u(self._df(spark, a, b), "g", "value").collect()[0]
        # pooled sorted: 1,2,3,3,3,4,5 -> mid-ranks 1,2,4,4,4,6,7
        # R1 (group b) = 4 + 6 + 7 = 17; U1 = 17 - 3*4/2 = 11
        assert (r.n_0, r.n_1) == (4, 3)
        assert r.u_1 == pytest.approx(11.0)
        assert r.mu == pytest.approx(6.0)
        n, tie = 7, (3 ** 3 - 3)
        var = 4 * 3 / 12 * ((n + 1) - tie / (n * (n - 1)))
        assert r.sigma == pytest.approx(var ** 0.5, abs=1e-12)
        assert r.z == pytest.approx((11 - 6 - 0.5) / var ** 0.5, abs=1e-12)

    def test_identical_groups_z_zero_direction(self, spark):
        from datalake_indexes_spark.operators.events import mann_whitney_u

        r = mann_whitney_u(
            self._df(spark, [1, 2, 3], [1, 2, 3]), "g", "value"
        ).collect()[0]
        assert abs(r.z) < 1.0  # no real shift
        shifted = mann_whitney_u(
            self._df(spark, [1, 2, 3, 4], [10, 11, 12, 13]), "g", "value"
        ).collect()[0]
        assert shifted.u_1 == pytest.approx(16.0)  # complete separation
        assert shifted.z > 2.0

    def test_all_tied_reports_zero(self, spark):
        from datalake_indexes_spark.operators.events import mann_whitney_u

        r = mann_whitney_u(
            self._df(spark, [5, 5], [5, 5]), "g", "value"
        ).collect()[0]
        assert r.z == 0.0
