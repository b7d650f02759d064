"""Streaming drift monitor (streaming/drift_stream.py): stream == batch
parity of the folded histogram, PSI/TV readout vs hand-computed values,
retry idempotency, planted-shift detection through the stream."""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.streaming.drift_stream import (
    drift_estimate,
    drift_monitor_stream,
    histogram_counts,
    make_drift_batch_processor,
)

LO, HI, NBINS = 0.0, 100.0, 10


def _frame(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


def test_stream_partials_match_single_shot(spark):
    vals = [i % 100 for i in range(600)] + [250.0, -30.0]  # incl. clamped
    df = _frame(spark, vals).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="driftstream_")
    try:
        process = make_drift_batch_processor(f"{work}/state", "v", LO, HI, NBINS)
        process(df.filter(F.col("__i") % 3 == 0).drop("__i"), 0)
        process(df.filter(F.col("__i") % 3 == 1).drop("__i"), 1)
        process(df.filter(F.col("__i") % 3 == 2).drop("__i"), 2)
        folded = {
            r.bucket: r[1]
            for r in spark.read.parquet(f"{work}/state")
            .groupBy("bucket").agg(F.sum("c")).collect()
        }
        want = {
            r.bucket: r.c for r in histogram_counts(
                _frame(spark, vals), "v", LO, HI, NBINS
            ).collect()
        }
        assert folded == want
        # readout vs an identical baseline: PSI ~ 0, TV = 0
        out = drift_estimate(
            spark, f"{work}/state",
            histogram_counts(_frame(spark, vals), "v", LO, HI, NBINS), NBINS,
        ).collect()[0]
        assert out.n_ref == out.n_live == len(vals)
        assert abs(out.psi) < 1e-9 and out.tv_distance == 0.0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_planted_shift_detected_and_psi_hand_checked(spark):
    base = [5.0] * 80 + [95.0] * 20   # 80/20 across buckets 0 and 9
    live = [5.0] * 20 + [95.0] * 80   # reversed
    work = tempfile.mkdtemp(prefix="driftshift_")
    try:
        process = make_drift_batch_processor(f"{work}/state", "v", LO, HI, NBINS)
        process(_frame(spark, live), 0)
        out = drift_estimate(
            spark, f"{work}/state",
            histogram_counts(_frame(spark, base), "v", LO, HI, NBINS), NBINS,
        ).collect()[0]
        # hand-computed: buckets 0 and 9 carry (80,20) vs (20,80), the
        # other 8 buckets are 0/0; eps=0.5, N+5 = 105
        def p(n):
            return (n + 0.5) / 105.0
        psi = (p(80) - p(20)) * math.log(p(80) / p(20)) * 2 \
            + (p(0) - p(0)) * math.log(1.0) * 8
        assert out.psi == pytest.approx(psi, abs=1e-6)
        assert out.tv_distance == pytest.approx(0.6, abs=1e-9)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retry_idempotent_and_available_now(spark):
    vals = list(range(100))
    df = _frame(spark, vals)
    work = tempfile.mkdtemp(prefix="driftfiles_")
    try:
        df.write.parquet(f"{work}/in")
        q = drift_monitor_stream(
            spark, f"{work}/in", df.schema, f"{work}/state", f"{work}/ckpt",
            "v", LO, HI, NBINS,
        )
        q.awaitTermination(120)
        base = histogram_counts(df, "v", LO, HI, NBINS)
        once = drift_estimate(spark, f"{work}/state", base, NBINS).collect()
        # replay batch 0 by hand — the dynamic overwrite must keep state identical
        make_drift_batch_processor(f"{work}/state", "v", LO, HI, NBINS)(df, 0)
        twice = drift_estimate(spark, f"{work}/state", base, NBINS).collect()
        assert once == twice
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_missing_state_raises(spark):
    with pytest.raises(FileNotFoundError):
        drift_estimate(spark, "/tmp/no-such-drift-state", _frame(spark, [1.0]))


def test_nan_rows_excluded_like_null(spark):
    """NaN passes isNotNull but must not be bucketed: the frozen batch
    baseline excludes NaN, so counting it live would bias PSI/TV."""
    vals = [5.0, float("nan"), 95.0, float("nan")]
    counts = {
        r.bucket: r.c
        for r in histogram_counts(_frame(spark, vals), "v", LO, HI, NBINS).collect()
    }
    assert sum(counts.values()) == 2
