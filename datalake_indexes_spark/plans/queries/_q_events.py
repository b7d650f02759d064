"""Event-analytics pipelines.

Split from the former plans/queries.py (round 9) — pure rearrangement,
every definition verbatim; registry order pinned in ``_registry``.
"""

from __future__ import annotations
import os
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from datalake_indexes_spark.index.builder import build_index, with_global_row_number
from datalake_indexes_spark.index.lake_index import LakeIndex
from datalake_indexes_spark.operators.cocoa import COCOA, is_numeric_flags
from datalake_indexes_spark.operators.duplicates import DuplicateDetection
from datalake_indexes_spark.operators.mate import MATE
from datalake_indexes_spark.plans import oracle
from datalake_indexes_spark.functions.text import tokenize_col
from datalake_indexes_spark.sources.catalog import ALL_TABLE_NAMES, TESTDATA_LAKE_SPEC

from datalake_indexes_spark.plans.queries._base import BURST_TOLERANCE_US, FUNNEL_STEPS, RANGE_JOIN_WINDOW_US, TREND_X_ORIGIN_US, _ensure_session_confs, _events_us

def q_events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window aggregation over events (streaming-shaped agg on
    the batch table; the same plan runs under Structured Streaming)."""
    _ensure_session_confs(spark)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) read via nanosAsLong
        # integer math, not double `/`: above 2^53 ns a double quotient can
        # round an exact hour boundary down into the previous hour.  The
        # pmod form gives FLOOR division (`div` truncates toward zero),
        # so pre-1970 timestamps bucket into the same hour as the oracle's
        # date_trunc.
        hour_sec = (
            F.expr("(ts - pmod(ts, 3600000000000)) div 3600000000000") * F.lit(3600)
        )
        window_start = F.from_unixtime(hour_sec, "yyyy-MM-dd HH:mm:ss")
    else:
        window_start = F.date_format(
            F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
        )
    return ev.groupBy(
        window_start.alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (batch twin of the stateful streaming
    operator, streaming/sessionize.py)."""
    from datalake_indexes_spark.streaming.sessionize import sessionize_batch

    _ensure_session_confs(spark)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out = sessionize_batch(ev, gap_seconds=1800)
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
        "sum_value",
    )


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_session_confs(spark)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def q_events_json_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON key profiling over props WITH planted extra keys — the raw
    column is single-key `{"k": int}`, so profiling it unplanted would
    grade a one-row result (the J5/J6 vacuity trap).  Every 3rd/5th/7th/
    11th event gains a deterministic tag/score/flag/note key spanning all
    five type classes, mirrored by the oracle."""
    from datalake_indexes_spark.operators.discovery import json_key_profile

    _ensure_session_confs(spark)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    did = F.col("event_id")
    parts = F.array(
        F.concat(F.lit('"k": '), F.get_json_object("props", "$.k")),
        F.when(did % 3 == 0,
               F.concat(F.lit('"tag": "t'), (did % 7).cast("string"), F.lit('"'))),
        F.when(did % 5 == 0,
               F.concat(F.lit('"score": '), (did % 100).cast("string"), F.lit('.5'))),
        F.when(did % 7 == 0,
               F.when(did % 2 == 0, F.lit('"flag": true'))
               .otherwise(F.lit('"flag": false'))),
        F.when(did % 11 == 0, F.lit('"note": null')),
    )
    planted = ev.withColumn(
        "props", F.concat(F.lit("{"), F.concat_ws(", ", parts), F.lit("}"))
    )
    return json_key_profile(planted, "props")


def q_events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outliers against each event type's own hour-of-day cell."""
    from datalake_indexes_spark.operators.events import seasonal_anomalies

    return seasonal_anomalies(_events_us(spark, sf_dir))


def q_events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 trigram event-type paths across all sessions."""
    from datalake_indexes_spark.operators.events import session_paths

    return session_paths(_events_us(spark, sf_dir), gap_seconds=1800, n=3, k=20)


def q_events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day / day-of-week seasonality profiles per event type."""
    from datalake_indexes_spark.operators.events import seasonality_profile

    return seasonality_profile(_events_us(spark, sf_dir))


def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history: per-user event_type validity
    intervals — consecutive identical observations merge, each interval
    closes at the next change (NULL valid_to = current)."""
    from datalake_indexes_spark.operators.events import scd2_history

    ev = _events_us(spark, sf_dir)
    hist = scd2_history(
        ev.select("user_id", "event_type", "ts_us", "event_id"),
        ["user_id"],
        ["event_type"],
        ts_col="ts_us",
        seq_col="event_id",
    )
    # grading projection: NULL valid_to (current interval) -> -1 so the
    # oracle column stays integer through the pandas fetch (a nullable
    # BIGINT degrades to float64 and 1.7e15 µs loses precision)
    return hist.withColumn("valid_to", F.coalesce("valid_to", F.lit(-1)))


def q_events_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining at k=2: event-type pairs co-occurring in the
    same user's history, with support / confidence / lift (A-priori prune
    before the basket self-join)."""
    from datalake_indexes_spark.operators.events import frequent_event_pairs

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return frequent_event_pairs(ev, min_support=2)


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams."""
    from datalake_indexes_spark.operators.events import event_transitions

    ev = _events_us(spark, sf_dir)
    return event_transitions(
        ev.select("user_id", "event_type", "ts_us", "event_id"), seq_col="event_id"
    )


def q_events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent open sessions over time: sessionize → sweep-line with
    the distributed two-level prefix sum (no global window)."""
    from datalake_indexes_spark.operators.events import concurrency_curve
    from datalake_indexes_spark.streaming.sessionize import sessionize_batch

    _ensure_session_confs(spark)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    sess = sessionize_batch(ev, gap_seconds=1800).select(
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
    )
    return concurrency_curve(sess)


def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (interval-weighted, final
    observation excluded per the half-open convention)."""
    from datalake_indexes_spark.operators.events import time_weighted_avg

    ev = _events_us(spark, sf_dir)
    return time_weighted_avg(
        ev.select("user_id", "value", "ts_us", "event_id"), seq_col="event_id"
    )


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event gains the user's most recent purchase
    at or before it (backward inclusive, feature-store semantics)."""
    from datalake_indexes_spark.operators.events import asof_join

    ev = _events_us(spark, sf_dir)
    probe = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    build = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    out = asof_join(
        probe, build, key_col="user_id", ts_col="ts_us",
        build_cols=["event_id", "ts_us", "value"], seq_col="event_id",
    )
    # -1 sentinels instead of NULLs: pandas promotes a nullable int column
    # to float64+NaN on the oracle side, which would hash differently from
    # Spark's NULL; the sentinel keeps both engines in exact-int space.
    return out.select(
        "event_id", "user_id", "ts_us",
        F.coalesce("asof_event_id", F.lit(-1)).cast("long").alias("asof_event_id"),
        F.coalesce("asof_ts_us", F.lit(-1)).cast("long").alias("asof_ts_us"),
        F.coalesce("asof_value", F.lit(-1.0)).alias("asof_value"),
    )


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned sliding-interval join: for every purchase, the count and sum
    of the same user's clicks in the preceding hour (exclusive of t-1h,
    inclusive of t)."""
    from datalake_indexes_spark.operators.events import range_join_binned

    ev = _events_us(spark, sf_dir)
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    build = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", "value"
    )
    out = range_join_binned(
        probe, build, key_col="user_id", ts_col="ts_us",
        window=RANGE_JOIN_WINDOW_US, agg_cols={"value": "sum"},
    )
    return out.select(
        "event_id", "user_id", "ts_us", "win_n",
        F.round(F.coalesce("win_sum_value", F.lit(0.0)), 4).alias("win_sum_value"),
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step conversion funnel (view -> click -> purchase) with
    first-reach times per user."""
    from datalake_indexes_spark.operators.events import funnel

    return funnel(_events_us(spark, sf_dir), FUNNEL_STEPS)


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup over (event_type, hour): totals per type+hour, per
    type, and grand total in ONE Expand+aggregate pass."""
    from datalake_indexes_spark.operators.events import rollup_cube_agg

    _ensure_session_confs(spark)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(ev.dtypes)["ts"] == "bigint":
        hour_sec = (
            F.expr("(ts - pmod(ts, 3600000000000)) div 3600000000000") * F.lit(3600)
        )
        window_start = F.from_unixtime(hour_sec, "yyyy-MM-dd HH:mm:ss")
    else:
        window_start = F.date_format(
            F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
        )
    dims = ev.select("event_type", window_start.alias("window_start"), "value")
    return rollup_cube_agg(dims, ["event_type", "window_start"])


def q_events_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention triangle over events."""
    from datalake_indexes_spark.operators.events import cohort_retention

    return cohort_retention(_events_us(spark, sf_dir))


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > 2.5, population moments)."""
    from datalake_indexes_spark.operators.events import value_anomalies

    return value_anomalies(_events_us(spark, sf_dir))


def q_events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered rolling features (lag / trailing mean / running
    max) — the feature-store transform."""
    from datalake_indexes_spark.operators.events import rolling_features

    return rolling_features(_events_us(spark, sf_dir))


def q_events_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting (active / new / cumulative users)."""
    from datalake_indexes_spark.operators.events import growth_accounting

    return growth_accounting(_events_us(spark, sf_dir))


def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily resampling with forward fill across gaps."""
    from datalake_indexes_spark.operators.events import resample_forward_fill

    return resample_forward_fill(_events_us(spark, sf_dir))


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, hour): rollup's cross-level sibling — all
    2^d grouping sets from the same single Expand+aggregate plan."""
    from datalake_indexes_spark.operators.events import rollup_cube_agg

    _ensure_session_confs(spark)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(ev.dtypes)["ts"] == "bigint":
        hour_sec = (
            F.expr("(ts - pmod(ts, 3600000000000)) div 3600000000000") * F.lit(3600)
        )
        window_start = F.from_unixtime(hour_sec, "yyyy-MM-dd HH:mm:ss")
    else:
        window_start = F.date_format(
            F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
        )
    dims = ev.select("event_type", window_start.alias("window_start"), "value")
    return rollup_cube_agg(dims, ["event_type", "window_start"], mode="cube")


def q_events_anomaly_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user RUNNING z-score anomalies (prior-only expanding moments
    — the batch twin of the stateful streaming detector)."""
    from datalake_indexes_spark.streaming.anomaly_stream import (
        running_anomalies_batch,
    )

    return running_anomalies_batch(_events_us(spark, sf_dir), z_threshold=3.0)


def q_events_dedup_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst deduplication of the event stream: retried/double-fired
    events within 6 h of their predecessor (chained) collapse into the
    burst's first event.  ~10% of the sf0.01 events sit under this
    tolerance, so the suppression path is genuinely exercised."""
    from datalake_indexes_spark.operators.events import dedup_bursts

    return dedup_bursts(_events_us(spark, sf_dir), BURST_TOLERANCE_US)


def q_events_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time (slope per day,
    intercept at the window origin, r²) — closed form from one aggregate
    pass."""
    from datalake_indexes_spark.operators.events import value_trend

    return value_trend(
        _events_us(spark, sf_dir), x_origin_us=TREND_X_ORIGIN_US
    )


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every click gains the latest view by the
    same user within a 2 h lookback (NULLs when cold) — the batch
    reduction of the streaming interval join."""
    from datalake_indexes_spark.operators.events import last_touch_attribution

    ev = _events_us(spark, sf_dir)
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts_us")
    views = ev.filter("event_type = 'view'").select("event_id", "user_id", "ts_us")
    out = last_touch_attribution(clicks, views, lookback_us=7_200_000_000)
    # unattributed NULLs -> -1 sentinel: a nullable BIGINT round-trips
    # through the oracle's pandas bridge as float64, which loses epoch-us
    # precision in the value hash; the sentinel keeps both engines int64
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.coalesce("attributed_id", F.lit(-1)).alias("attributed_id"),
        F.coalesce("attributed_ts_us", F.lit(-1)).alias("attributed_ts_us"),
        F.coalesce("attribution_lag_us", F.lit(-1)).alias("attribution_lag_us"),
    )


def q_events_interval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The candidate-pair frame of the stream-stream interval join,
    graded on its batch execution (same plan batch or streaming —
    streaming/attribution_stream.py; stream==batch pinned in pytest):
    every (click, view) pair per user within the 2 h lookback."""
    from datalake_indexes_spark.streaming.attribution_stream import (
        interval_pairs_streaming,
    )

    return interval_pairs_streaming(
        _events_us(spark, sf_dir),
        "event_type = 'click'",
        "event_type = 'view'",
        lookback_us=7_200_000_000,
    )


def q_events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user one-step-ahead rolling-OLS forecast backtest (window 5)
    with lag-1 persistence skill score."""
    from datalake_indexes_spark.operators.events import rolling_forecast_backtest

    return rolling_forecast_backtest(_events_us(spark, sf_dir), window_rows=5)


def q_events_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend exponential smoothing of each user's daily
    event-count series — level/trend/rmse and a 3-period-ahead
    forecast, the geometric-discount forecaster next to the
    window-OLS backtest."""
    from datalake_indexes_spark.operators.events import holt_forecast

    return holt_forecast(_events_us(spark, sf_dir), alpha=0.5, beta=0.3, horizon=3)


def q_events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust per-user daily-count trend (median of pairwise
    slopes; outlier days can't drag it the way they drag OLS)."""
    from datalake_indexes_spark.operators.events import theil_sen_trend

    return theil_sen_trend(_events_us(spark, sf_dir))


def q_events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend significance per user's daily counts
    (integer S, tie-corrected variance, continuity-corrected z)."""
    from datalake_indexes_spark.operators.events import mann_kendall_trend

    return mann_kendall_trend(_events_us(spark, sf_dir))


def q_events_mwu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney rank-sum test: does the md5 B variant shift the
    event-value distribution (nonparametric A/B)."""
    from datalake_indexes_spark.functions.hashes import md5_bucket
    from datalake_indexes_spark.operators.events import mann_whitney_u

    ev = _events_us(spark, sf_dir).withColumn("__variant", md5_bucket("user_id", 2))
    return mann_whitney_u(ev, "__variant", "value")


def q_events_decay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay per-user activity mass and recency-weighted
    mean value (7-day half-life from the corpus's last timestamp)."""
    from datalake_indexes_spark.operators.events import decay_weighted_stats

    return decay_weighted_stats(_events_us(spark, sf_dir))


def q_events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user activity-span lifetimes
    (1-day periods, 7-day right-censoring horizon) over events WITH
    planted churn -- every user in the synthetic stream spans the whole
    window (all censored, survival identically 1: the J5/J6 vacuity
    trap), so each user's stream is truncated at a deterministic
    per-user cutoff of (user_id % 40 + 1) days from the corpus start,
    mirrored by the oracle: ~3/4 of users churn at varied durations,
    the rest stay censored."""
    from datalake_indexes_spark.operators.events import survival_curve

    day_us = 86_400_000_000
    ev = _events_us(spark, sf_dir)
    t0 = ev.agg(F.min("ts_us").alias("__t0"))
    cutoff = F.col("__t0") + ((F.col("user_id") % 40) + 1) * F.lit(day_us)
    planted = (
        ev.crossJoin(F.broadcast(t0)).filter(F.col("ts_us") < cutoff).drop("__t0")
    )
    return survival_curve(planted)


def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B conversion test: md5-split user variants,
    purchase conversion, pooled z at alpha = 0.05."""
    from datalake_indexes_spark.operators.events import ab_conversion_test

    return ab_conversion_test(_events_us(spark, sf_dir))


def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM event-rate changepoint per type over events WITH a planted
    rate shift -- the synthetic stream is rate-uniform (no changepoint
    anywhere: near-vacuous flags), so click events in the LATER half of
    the corpus are thinned to 1-in-5 by the deterministic rule
    (event_id % 5 = 0), mirrored by the oracle: the click series gains a
    real mid-corpus changepoint, every other series stays honest-null."""
    from datalake_indexes_spark.operators.events import cusum_changepoints

    ev = _events_us(spark, sf_dir)
    # integer midpoint: min+max ~ 3.4e18 exceeds double's 2^53 exact
    # range, so float division here could disagree with the oracle's
    # integer // near the boundary
    mid = ev.agg(F.min("ts_us").alias("__lo"), F.max("ts_us").alias("__hi")).select(
        F.expr("(__lo + __hi) div 2").alias("__mid")
    )
    keep = (
        (F.col("event_type") != "click")
        | (F.col("ts_us") < F.col("__mid"))
        | (F.col("event_id") % 5 == 0)
    )
    planted = ev.crossJoin(F.broadcast(mid)).filter(keep)
    return cusum_changepoints(planted)


def q_events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B test on the purchase-count metric:
    pre-midpoint counts as the covariate, md5 variants, Welch-style z on
    adjusted means."""
    from datalake_indexes_spark.operators.events import ab_cuped_test

    return ab_cuped_test(_events_us(spark, sf_dir))


def q_events_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transition funnel conversion + time-to-convert percentiles
    over the view -> click -> purchase funnel."""
    from datalake_indexes_spark.operators.events import funnel_timing

    return funnel_timing(_events_us(spark, sf_dir), FUNNEL_STEPS)


def q_events_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase event gains the
    user's signup-value tier (SCD2 interval) valid AT the purchase
    timestamp -- leakage-free feature-store join; DuckDB's native ASOF
    JOIN is the independent oracle."""
    from datalake_indexes_spark.operators.events import scd2_history, scd2_lookup

    ev = _events_us(spark, sf_dir)
    obs = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.floor(F.col("value") / 20.0).cast("long").alias("tier"),
        "ts_us",
        "event_id",
    )
    hist = scd2_history(obs, ["user_id"], ["tier"], ts_col="ts_us", seq_col="event_id")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    out = scd2_lookup(facts, hist, "user_id", "ts_us", ["tier"])
    # -1 sentinels instead of NULLs (same reason as q_events_asof_join:
    # pandas promotes nullable ints to float64+NaN on the oracle side)
    return out.select(
        "event_id", "user_id", "ts_us",
        F.coalesce("dim_tier", F.lit(-1)).cast("long").alias("dim_tier"),
        F.coalesce("dim_version", F.lit(-1)).cast("int").alias("dim_version"),
    )


def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over purchase events (quintile grid,
    555 = recent + frequent + big spender)."""
    from datalake_indexes_spark.operators.events import rfm_segments

    return rfm_segments(_events_us(spark, sf_dir))


def q_events_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the signup and purchase daily
    rate series (does one lead the other?)."""
    from datalake_indexes_spark.operators.events import rate_cross_correlation

    return rate_cross_correlation(_events_us(spark, sf_dir), "signup", "purchase")


def q_events_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov absorption: per event type, the probability of reaching a
    purchase before the user's stream ends (50 fixed-point iterations,
    the cross-engine parity contract)."""
    from datalake_indexes_spark.operators.events import markov_absorption

    return markov_absorption(_events_us(spark, sf_dir), seq_col="event_id")


def q_events_removal_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain attribution: per channel, the conversion probability
    lost when that channel is removed (50 fixed-point iterations per
    variant, recursive-CTE oracle)."""
    from datalake_indexes_spark.operators.events import markov_removal_effects

    return markov_removal_effects(_events_us(spark, sf_dir), seq_col="event_id")


def q_events_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day + stickiness
    (DAU/WAU) via the contribute-forward decomposition."""
    from datalake_indexes_spark.operators.events import rolling_active_users

    return rolling_active_users(_events_us(spark, sf_dir), window_periods=7)


def q_events_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gap distribution (mean/p50/p95/max
    seconds) over a (ts, event_id) total order."""
    from datalake_indexes_spark.operators.events import inter_arrival_stats

    return inter_arrival_stats(_events_us(spark, sf_dir))


