"""Property tests for the round-5 operators against independent
pure-Python references: Holt smoothing vs a direct recurrence, FS
u-probabilities vs the brute-force random-pair expectation, decay stats
vs explicit weight sums, clustering coefficients vs a dict-of-sets
reference — randomized tiny domains with heavy collision pressure."""

from __future__ import annotations

import math

import pytest


@pytest.mark.spark
class TestHoltHypothesis:
    def test_random_series_match_reference(self, spark):
        from hypothesis import given, settings, strategies as st

        from datalake_indexes_spark.operators.events import holt_forecast

        @settings(max_examples=8, deadline=None)
        @given(
            st.lists(
                st.integers(min_value=1, max_value=5),  # events per day
                min_size=2,
                max_size=12,
            ),
            st.floats(min_value=0.1, max_value=0.9),
            st.floats(min_value=0.0, max_value=0.9),
        )
        def check(counts, alpha, beta):
            day = 86_400_000_000
            rows = [
                (1, "e", d * day + i)
                for d, c in enumerate(counts)
                for i in range(c)
            ]
            ev = spark.createDataFrame(
                rows, "user_id long, event_type string, ts_us long"
            )
            out = holt_forecast(ev, alpha=alpha, beta=beta, horizon=2).collect()
            assert len(out) == 1
            r = out[0]
            y = [float(c) for c in counts]
            lvl, tr, se = y[0], y[1] - y[0], 0.0
            for t in range(1, len(y)):
                e = y[t] - (lvl + tr)
                se += e * e
                l_new = alpha * y[t] + (1.0 - alpha) * (lvl + tr)
                tr = beta * (l_new - lvl) + (1.0 - beta) * tr
                lvl = l_new
            assert r.n_periods == len(y)
            assert r.level == pytest.approx(lvl, abs=1e-5)
            assert r.trend == pytest.approx(tr, abs=1e-5)
            assert r.rmse == pytest.approx(math.sqrt(se / (len(y) - 1)), abs=1e-5)
            assert r.forecast == pytest.approx(lvl + 2 * tr, abs=1e-5)

        check()


@pytest.mark.spark
class TestFsUHypothesis:
    def test_u_equals_bruteforce_pair_expectation(self, spark):
        """u_f must equal P(agree) over the literal cross product of
        non-null values — checked by enumerating the pairs."""
        from hypothesis import given, settings, strategies as st

        from datalake_indexes_spark.operators.fuzzy import fs_field_u_probabilities

        vals = st.lists(
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
            min_size=1,
            max_size=8,
        )

        @settings(max_examples=8, deadline=None)
        @given(vals, vals)
        def check(xs, ys):
            a = spark.createDataFrame([(i, v) for i, v in enumerate(xs)], "a_id long, f string")
            b = spark.createDataFrame([(i, v) for i, v in enumerate(ys)], "b_id long, f string")
            rows = fs_field_u_probabilities(a, b, ["f"]).collect()
            xs_n = [v for v in xs if v is not None]
            ys_n = [v for v in ys if v is not None]
            agree = sum(1 for x in xs_n for y in ys_n if x == y)
            if agree == 0:
                # empty margins OR disjoint values: no u row — the caller
                # (fs_record_linkage) fills the 1e-9 floor for such fields
                assert rows == []
                return
            want = agree / (len(xs_n) * len(ys_n))
            want = min(1.0 - 1e-9, max(1e-9, want))
            assert rows[0].u == pytest.approx(want, abs=1e-12)

        check()


@pytest.mark.spark
class TestDecayHypothesis:
    def test_decay_stats_match_explicit_sums(self, spark):
        from hypothesis import given, settings, strategies as st

        from datalake_indexes_spark.operators.events import decay_weighted_stats

        events = st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),        # key
                st.integers(min_value=0, max_value=5000),     # ts
                st.one_of(st.none(), st.floats(min_value=-5, max_value=5,
                                               allow_nan=False)),
            ),
            min_size=1,
            max_size=20,
        )

        @settings(max_examples=8, deadline=None)
        @given(events, st.integers(min_value=10, max_value=2000))
        def check(evs, hl):
            rows = [(k, "e", t, v) for k, t, v in evs]
            df = spark.createDataFrame(
                rows, "user_id long, event_type string, ts_us long, value double"
            )
            out = {r.key: r for r in
                   decay_weighted_stats(df, half_life_us=hl).collect()}
            lam = math.log(2.0) / hl
            T = max(t for _, t, _ in evs)
            for k in {k for k, _, _ in evs}:
                mine = [(t, v) for kk, t, v in evs if kk == k]
                w_sum = sum(math.exp(-lam * (T - t)) for t, _ in mine)
                assert out[k].n == len(mine)
                assert out[k].weight_sum == pytest.approx(w_sum, abs=1e-5)
                vv = [(t, v) for t, v in mine if v is not None]
                if vv:
                    dv = sum(math.exp(-lam * (T - t)) * v for t, v in vv)
                    wv = sum(math.exp(-lam * (T - t)) for t, _ in vv)
                    assert out[k].decayed_value == pytest.approx(dv, abs=1e-5)
                    assert out[k].ewm_mean == pytest.approx(dv / wv, abs=1e-5)
                else:
                    assert out[k].decayed_value is None

        check()


@pytest.mark.spark
class TestClusteringHypothesis:
    def test_cc_matches_setwise_reference(self, spark):
        from hypothesis import given, settings, strategies as st

        from datalake_indexes_spark.operators.graph import clustering_coefficients

        edges_st = st.lists(
            st.tuples(st.integers(min_value=0, max_value=7),
                      st.integers(min_value=0, max_value=7)),
            min_size=1,
            max_size=20,
        )

        @settings(max_examples=8, deadline=None)
        @given(edges_st)
        def check(pairs):
            pairs = [(a, b) for a, b in pairs if a != b]
            if not pairs:
                return
            df = spark.createDataFrame(pairs, "src long, dst long")
            out = {r.node: r for r in clustering_coefficients(df).collect()}
            adj: dict[int, set[int]] = {}
            for a, b in pairs:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            for n, nb in adj.items():
                deg = len(nb)
                tri = sum(
                    1
                    for x in nb
                    for y in nb
                    if x < y and y in adj.get(x, set())
                )
                assert out[n].degree == deg
                assert out[n].n_triangles == tri
                want = 2.0 * tri / (deg * (deg - 1)) if deg >= 2 else 0.0
                assert out[n].local_cc == pytest.approx(want, abs=1e-6)

        check()
