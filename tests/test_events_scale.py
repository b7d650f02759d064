"""Scale shape of the round-11 event operators: burst dedup is ONE
shuffle keyed by the entity (pinned by Exchange count), and the
attribution interval join survives a 1M-event pass with a hot key
without a nested loop."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.events import (
    dedup_bursts,
    last_touch_attribution,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dedup_bursts_is_one_shuffle(spark):
    """lag + running sum + burst aggregate share the (user, type)
    partitioning — exactly one Exchange in the whole chain.  A refactor
    that re-keys any stage would double the corpus shuffle at 100 TB."""
    ev = spark.range(10_000).selectExpr(
        "id as event_id",
        "id % 50 as user_id",
        "'c' as event_type",
        "(id * 37) % 100000 as ts_us",
    )
    plan = _plan(dedup_bursts(ev, 100))
    assert plan.count("Exchange") == 1


def test_burst_and_attribution_1m_events_hot_key(spark):
    """1M events, 10% on ONE hot user: burst dedup and last-touch
    attribution both complete with correct global invariants (every
    event in exactly one burst; attributed view always the latest
    in-window one for spot-checked rows)."""
    n = 1_000_000
    # each user gets ~100 interleaved view/click events 100 µs apart
    # (views on even rounds, clicks on odd), so every click has a view
    # 100 µs before it; 10% of all events pile onto user 0 (the hot key)
    ev = spark.range(n).selectExpr(
        "id as event_id",
        "CASE WHEN id % 10 = 0 THEN 0 ELSE id % 10000 END as user_id",
        "CASE WHEN (id div 10000) % 2 = 0 THEN 'view' ELSE 'click' END"
        " as event_type",
        "(id % 10000) * 1000000 + (id div 10000) * 100 as ts_us",
    )
    # same-type events within a key sit 200 µs apart -> tolerance 200
    # chains them, so suppression is heavy and burst sizes are large
    kept = dedup_bursts(ev, tolerance_us=200, key_cols=["user_id", "event_type"])
    agg = kept.agg(
        F.count(F.lit(1)).alias("n_bursts"),
        F.sum("burst_size").alias("n_events"),
    ).collect()[0]
    assert agg["n_events"] == n  # every event lands in exactly one burst
    assert 0 < agg["n_bursts"] < n  # and suppression genuinely happened

    clicks = ev.filter("event_type = 'click'").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.filter("event_type = 'view'").select(
        "event_id", "user_id", "ts_us"
    )
    attr = last_touch_attribution(clicks, views, lookback_us=5000)
    # row preservation: one output row per click, matched or not
    assert attr.count() == clicks.count()
    # spot-check: the attributed view is in-window and none is later
    sample = attr.filter(F.col("attributed_id").isNotNull()).limit(50).collect()
    assert sample, "expected some attributed clicks"
    for r in sample:
        assert 0 <= r["attribution_lag_us"] <= 5000
        assert r["attributed_ts_us"] <= r["ts_us"]


def test_decay_stats_one_shuffle_1m_events(spark):
    """1M events over 10k keys (10% on one hot user): the whole chain is
    the keyed aggregate plus the broadcast anchor — ONE real exchange —
    and the hot key changes nothing (commutative sums, no window)."""
    from datalake_indexes_spark.operators.events import decay_weighted_stats

    n = 1_000_000
    ev = spark.range(n).selectExpr(
        "id as event_id",
        "CASE WHEN id % 10 = 0 THEN 0 ELSE id % 10000 END as user_id",
        "'e' as event_type",
        "id * 1000 as ts_us",
        "cast(id % 97 as double) as value",
    )
    out = decay_weighted_stats(ev, half_life_us=100_000_000)
    plan = _plan(out)
    # exactly ONE keyed exchange; the anchor is a scalar aggregate whose
    # tiny single-partition exchanges don't move the corpus
    assert plan.count("Exchange hashpartitioning") == 1
    rows = out.collect()
    # ids with id%10000 divisible by 10 remap onto the hot key 0:
    # 10000 - 1000 + 1 distinct keys survive
    assert len(rows) == 9_001
    hot = {r.key: r for r in rows}[0]
    assert hot.n == n // 10
    # most-recent event is user 0's (id 999990): its weight ~1 dominates
    assert hot.weight_sum > 1.0


def test_holt_1m_events_10k_keys(spark):
    """Holt over 10k per-key series (1M events, ~100 periods each)
    completes with per-key outputs and sane levels (counts ~ constant
    10/period -> trend ~ 0, level ~ 10)."""
    from datalake_indexes_spark.operators.events import holt_forecast

    n = 1_000_000
    day = 86_400_000_000
    ev = spark.range(n).selectExpr(
        "id % 10000 as user_id",
        "'e' as event_type",
        # each user: one event per day-slot, 10 slots per day
        f"(id div 10000) * {day // 10} as ts_us",
    )
    out = holt_forecast(ev, alpha=0.5, beta=0.3, horizon=3)
    rows = out.collect()
    assert len(rows) == 10_000
    import statistics

    levels = [r.level for r in rows]
    assert statistics.median(levels) == pytest.approx(10.0, abs=1.0)
    assert all(abs(r.trend) < 1.0 for r in rows)
