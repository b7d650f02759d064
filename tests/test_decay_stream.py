"""Streaming decay stats (streaming/decay_stream.py): anchored partials
rescale-merge to the batch operator's answer; retry idempotency; missing
state raises."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.events import decay_weighted_stats
from datalake_indexes_spark.streaming.decay_stream import (
    decay_estimate,
    make_decay_batch_processor,
)

HL = 1000  # microseconds — small so decay is visible across the fixture


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_us long, value double"
    )


def _rows():
    rows = []
    for uid in (1, 2, 3):
        for t in range(0, 5000, 700):
            rows.append((uid, "e", t + uid * 13, float(uid) * t if t % 1400 else None))
    return rows


@pytest.mark.spark
def test_stream_matches_batch(spark):
    rows = _rows()
    df = _frame(spark, rows).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="decaystream_")
    try:
        process = make_decay_batch_processor(f"{work}/state", HL)
        # three time-skewed slices: anchors differ per batch, so the
        # readout's rescaling is actually exercised
        process(df.filter(F.col("ts_us") < 1500).drop("__i"), 0)
        process(df.filter((F.col("ts_us") >= 1500) & (F.col("ts_us") < 3000)).drop("__i"), 1)
        process(df.filter(F.col("ts_us") >= 3000).drop("__i"), 2)

        got = {r.key: r for r in decay_estimate(spark, f"{work}/state", HL).collect()}
        want = {r.key: r for r in decay_weighted_stats(
            _frame(spark, rows), half_life_us=HL).collect()}
        assert set(got) == set(want)
        for k in want:
            assert got[k].n == want[k].n
            assert got[k].weight_sum == pytest.approx(want[k].weight_sum, abs=2e-6)
            if want[k].decayed_value is None:
                assert got[k].decayed_value is None
            else:
                assert got[k].decayed_value == pytest.approx(
                    want[k].decayed_value, abs=2e-6
                )
                assert got[k].ewm_mean == pytest.approx(want[k].ewm_mean, abs=2e-6)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.spark
def test_retry_idempotent(spark):
    df = _frame(spark, _rows())
    work = tempfile.mkdtemp(prefix="decaystream_")
    try:
        process = make_decay_batch_processor(f"{work}/state", HL)
        process(df, 0)
        once = sorted(map(tuple, decay_estimate(spark, f"{work}/state", HL).collect()))
        process(df, 0)  # retried batch replaces, not duplicates
        twice = sorted(map(tuple, decay_estimate(spark, f"{work}/state", HL).collect()))
        assert once == twice
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.spark
def test_missing_state_raises(spark):
    with pytest.raises(FileNotFoundError):
        decay_estimate(spark, "/tmp/no-such-decay-state", HL)
