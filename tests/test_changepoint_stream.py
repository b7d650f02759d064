"""Streaming changepoint monitor (streaming/changepoint_stream.py):
stream == batch parity of the CUSUM readout (additive count partials,
shared scan code), retry idempotency, availableNow end-to-end run."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.streaming.changepoint_stream import (
    changepoint_estimate,
    changepoint_monitor_stream,
    make_changepoint_batch_processor,
)

PERIOD = 100


def _events(spark):
    rows = []
    for p in range(40):
        n = 10 if p < 20 else 2  # planted rate drop at period 19→20
        rows += [("a", p * PERIOD + i) for i in range(n)]
        rows += [("b", p * PERIOD + i) for i in range(5)]  # constant control
    return spark.createDataFrame(rows, "event_type string, ts_us long")


def _rows(df):
    return sorted(
        (r.event_type, r.n_periods, r.change_period, r.max_cusum_abs, r.score, r.change_flag)
        for r in df.collect()
    )


def test_stream_partials_match_batch_detector(spark):
    from datalake_indexes_spark.operators.events import cusum_changepoints

    df = _events(spark).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="cpstream_")
    try:
        process = make_changepoint_batch_processor(f"{work}/state", period_us=PERIOD)
        # three uneven batches; periods straddle batch boundaries so the
        # counts only become conclusive after the fold
        process(df.filter(F.col("__i") % 3 == 0).drop("__i"), 0)
        process(df.filter(F.col("__i") % 3 == 1).drop("__i"), 1)
        process(df.filter(F.col("__i") % 3 == 2).drop("__i"), 2)
        got = _rows(changepoint_estimate(spark, f"{work}/state"))
        want = _rows(cusum_changepoints(_events(spark), period_us=PERIOD))
        assert got == want
        # and the planted shift is actually detected through the stream
        by_type = {t: flag for (t, _, _, _, _, flag) in got}
        assert by_type["a"] and not by_type["b"]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    df = _events(spark).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="cpretry_")
    try:
        process = make_changepoint_batch_processor(f"{work}/state", period_us=PERIOD)
        process(df.filter(F.col("__i") % 2 == 0).drop("__i"), 0)
        process(df.filter(F.col("__i") % 2 == 1).drop("__i"), 1)
        once = _rows(changepoint_estimate(spark, f"{work}/state"))
        process(df.filter(F.col("__i") % 2 == 1).drop("__i"), 1)  # replay
        assert _rows(changepoint_estimate(spark, f"{work}/state")) == once
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_available_now_file_stream(spark):
    from datalake_indexes_spark.operators.events import cusum_changepoints

    df = _events(spark)
    work = tempfile.mkdtemp(prefix="cpfiles_")
    try:
        df.write.parquet(f"{work}/in")
        q = changepoint_monitor_stream(
            spark, f"{work}/in", df.schema, f"{work}/state", f"{work}/ckpt",
            period_us=PERIOD,
        )
        q.awaitTermination(120)
        assert _rows(changepoint_estimate(spark, f"{work}/state")) == _rows(
            cusum_changepoints(df, period_us=PERIOD)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_missing_state_raises(spark):
    with pytest.raises(FileNotFoundError):
        changepoint_estimate(spark, "/tmp/definitely-not-a-cp-state-dir")
