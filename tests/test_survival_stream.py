"""Streaming KM monitor (streaming/survival_stream.py): stream == batch
parity of the survival readout (min/max span partials fold exactly),
retry idempotency, availableNow end-to-end run."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.streaming.survival_stream import (
    make_survival_batch_processor,
    survival_estimate,
    survival_monitor_stream,
)


def _events(spark):
    rows = []
    for uid in range(60):
        first = uid % 3
        last = first + (uid % 25)  # varied span lengths, some censored
        rows += [(uid, first * 100), (uid, (first + last) // 2 * 100), (uid, last * 100)]
    return spark.createDataFrame(rows, "user_id long, ts_us long")


def _rows(df):
    return sorted(
        (r.duration, r.n_at_risk, r.n_events, r.n_censored, r.survival)
        for r in df.collect()
    )


def test_stream_partials_match_batch_estimator(spark):
    from datalake_indexes_spark.operators.events import survival_curve

    df = _events(spark).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="kmstream_")
    try:
        process = make_survival_batch_processor(f"{work}/state")
        # three uneven batches: a user's first/last events land in
        # different batches, so spans only close after the min/max fold
        process(df.filter(F.col("__i") % 3 == 0).drop("__i"), 0)
        process(df.filter(F.col("__i") % 3 == 1).drop("__i"), 1)
        process(df.filter(F.col("__i") % 3 == 2).drop("__i"), 2)
        got = _rows(survival_estimate(spark, f"{work}/state", period_us=100,
                                      censor_horizon_periods=2))
        want = _rows(survival_curve(_events(spark), period_us=100,
                                    censor_horizon_periods=2))
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    df = _events(spark).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="kmretry_")
    try:
        process = make_survival_batch_processor(f"{work}/state")
        process(df.filter(F.col("__i") % 2 == 0).drop("__i"), 0)
        process(df.filter(F.col("__i") % 2 == 1).drop("__i"), 1)
        once = _rows(survival_estimate(spark, f"{work}/state", period_us=100))
        process(df.filter(F.col("__i") % 2 == 1).drop("__i"), 1)  # replay
        assert _rows(survival_estimate(spark, f"{work}/state", period_us=100)) == once
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_available_now_file_stream(spark):
    from datalake_indexes_spark.operators.events import survival_curve

    df = _events(spark)
    work = tempfile.mkdtemp(prefix="kmfiles_")
    try:
        df.write.parquet(f"{work}/in")
        q = survival_monitor_stream(
            spark, f"{work}/in", df.schema, f"{work}/state", f"{work}/ckpt"
        )
        q.awaitTermination(120)
        got = _rows(survival_estimate(spark, f"{work}/state", period_us=100,
                                      censor_horizon_periods=2))
        want = _rows(survival_curve(df, period_us=100, censor_horizon_periods=2))
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_missing_state_raises(spark):
    with pytest.raises(FileNotFoundError):
        survival_estimate(spark, "/tmp/no-such-km-state")
