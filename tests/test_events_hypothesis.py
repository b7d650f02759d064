"""Property tests: burst dedup and last-touch attribution vs pure-Python
reference implementations over randomized event sets (the closure-style
hypothesis pattern the other suites use)."""

from __future__ import annotations

import pytest

from datalake_indexes_spark.operators.events import (
    dedup_bursts,
    last_touch_attribution,
)

# (user_id, ts) pairs with heavy collision pressure: few users, small
# timestamp range so bursts, ties and window edges all occur
def _events_strategy(st):
    return st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)),
        min_size=1,
        max_size=25,
    )


def _ref_bursts(rows, tolerance):
    """rows: [(event_id, user_id, ts)] — reference chained-gap burst
    dedup per user; the burst's first (ts, id) event is kept.  Ties on
    ts order by id, matching the operator's (ts, seq) total order."""
    out = {}
    by_user: dict[int, list] = {}
    for eid, uid, ts in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    for uid, evs in by_user.items():
        evs.sort()
        burst = [evs[0]]
        bursts = []
        for prev, cur in zip(evs, evs[1:]):
            if cur[0] - prev[0] > tolerance:
                bursts.append(burst)
                burst = [cur]
            else:
                burst.append(cur)
        bursts.append(burst)
        for b in bursts:
            first_ts, first_id = b[0]
            out[(uid, first_id)] = (len(b), b[-1][0] - first_ts, first_ts)
    return out


def _ref_attribution(clicks, views, lookback):
    """Latest in-window view per click, ties to the larger view id."""
    out = {}
    for cid, cu, cts in clicks:
        best = None
        for vid, vu, vts in views:
            if vu == cu and cts - lookback <= vts <= cts:
                key = (vts, vid)
                if best is None or key > best:
                    best = key
        out[cid] = best
    return out


def test_bursts_match_reference_property(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(data=_events_strategy(st), tolerance=st.integers(0, 10))
    def check(data, tolerance):
        rows = [(i, uid, ts) for i, (uid, ts) in enumerate(data)]
        ev = spark.createDataFrame(
            [(eid, uid, "c", ts) for eid, uid, ts in rows],
            "event_id long, user_id long, event_type string, ts_us long",
        )
        got = {
            (r["user_id"], r["event_id"]): (
                r["burst_size"],
                r["burst_span_us"],
                r["ts_us"],
            )
            for r in dedup_bursts(
                ev, tolerance_us=tolerance, key_cols=["user_id"]
            ).collect()
        }
        assert got == _ref_bursts(rows, tolerance)

    check()


def test_attribution_matches_reference_property(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        clicks=_events_strategy(st),
        views=_events_strategy(st),
        lookback=st.integers(0, 10),
    )
    def check(clicks, views, lookback):
        c_rows = [(i, uid, ts) for i, (uid, ts) in enumerate(clicks)]
        v_rows = [(1000 + i, uid, ts) for i, (uid, ts) in enumerate(views)]
        c = spark.createDataFrame(
            c_rows, "event_id long, user_id long, ts_us long"
        )
        v = spark.createDataFrame(
            v_rows, "event_id long, user_id long, ts_us long"
        )
        got = {
            r["event_id"]: (
                (r["attributed_ts_us"], r["attributed_id"])
                if r["attributed_id"] is not None
                else None
            )
            for r in last_touch_attribution(
                c, v, lookback_us=lookback
            ).collect()
        }
        assert got == _ref_attribution(c_rows, v_rows, lookback)

    check()


@pytest.mark.spark
class TestDecayWeightedStats:
    def test_hand_computed_weights(self, spark):
        import math

        from datalake_indexes_spark.operators.events import decay_weighted_stats

        hl = 100
        ev = spark.createDataFrame(
            [(1, "e", 0, 10.0), (1, "e", 100, 20.0), (2, "e", 100, None)],
            "user_id long, event_type string, ts_us long, value double",
        )
        out = {r.key: r for r in decay_weighted_stats(ev, half_life_us=hl).collect()}
        # T = 100: weights exp(-ln2*1)=0.5 and 1.0
        assert out[1].weight_sum == pytest.approx(1.5, abs=1e-6)
        assert out[1].decayed_value == pytest.approx(0.5 * 10 + 1.0 * 20, abs=1e-6)
        assert out[1].ewm_mean == pytest.approx(25.0 / 1.5, abs=1e-6)
        # all-NULL-value key: mass counted, value stats NULL
        assert out[2].weight_sum == pytest.approx(1.0, abs=1e-6)
        assert out[2].decayed_value is None and out[2].ewm_mean is None

    def test_recency_dominates(self, spark):
        """Same totals, different timing: the recently-active key carries
        the higher decayed mass."""
        from datalake_indexes_spark.operators.events import decay_weighted_stats

        day = 86_400_000_000
        rows = [(1, "e", 30 * day, 1.0)] + [(2, "e", 1 * day, 1.0)]
        rows.append((3, "e", 30 * day, 1.0))  # pins T
        ev = spark.createDataFrame(
            rows, "user_id long, event_type string, ts_us long, value double"
        )
        out = {r.key: r.weight_sum
               for r in decay_weighted_stats(ev, half_life_us=7 * day).collect()}
        assert out[1] > out[2]

    def test_invalid_half_life_raises(self, spark):
        from datalake_indexes_spark.operators.events import decay_weighted_stats

        ev = spark.createDataFrame(
            [(1, "e", 0, 1.0)], "user_id long, event_type string, ts_us long, value double"
        )
        with pytest.raises(ValueError, match="half_life"):
            decay_weighted_stats(ev, half_life_us=0)
