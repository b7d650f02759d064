"""Streaming A/B monitor (streaming/ab_stream.py): stream == batch parity
of the z readout (additive count partials, shared readout code), retry
idempotency, and an availableNow file-stream run end to end."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.streaming.ab_stream import (
    ab_estimate,
    ab_monitor_stream,
    make_ab_batch_processor,
)


def _events(spark):
    rows = []
    for uid in range(120):
        # mixed per-user outcomes: uid mod 3 decides the purchase/click tilt
        n_p, n_c = (3, 1) if uid % 3 == 0 else (1, 2)
        rows += [(uid, "purchase")] * n_p + [(uid, "click")] * n_c
        rows.append((uid, "view"))
    return spark.createDataFrame(rows, "user_id long, event_type string")


def _row(df):
    r = df.collect()[0]
    return (r.n_a, r.n_b, r.conv_a, r.conv_b, r.rate_a, r.rate_b, r.z_score, r.significant)


def test_stream_partials_match_batch_test(spark):
    from datalake_indexes_spark.operators.events import ab_conversion_test

    df = _events(spark).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="abstream_")
    try:
        process = make_ab_batch_processor(f"{work}/state")
        # three uneven batches, users straddling batch boundaries (the
        # per-user counts only become conclusive after the fold)
        process(df.filter(F.col("__i") % 3 == 0).drop("__i"), 0)
        process(df.filter(F.col("__i") % 3 == 1).drop("__i"), 1)
        process(df.filter(F.col("__i") % 3 == 2).drop("__i"), 2)
        got = _row(ab_estimate(spark, f"{work}/state"))
        want = _row(ab_conversion_test(_events(spark)))
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    df = _events(spark).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="abretry_")
    try:
        process = make_ab_batch_processor(f"{work}/state")
        process(df.filter(F.col("__i") % 2 == 0).drop("__i"), 0)
        process(df.filter(F.col("__i") % 2 == 1).drop("__i"), 1)
        once = _row(ab_estimate(spark, f"{work}/state"))
        process(df.filter(F.col("__i") % 2 == 1).drop("__i"), 1)  # replay
        twice = _row(ab_estimate(spark, f"{work}/state"))
        assert once == twice
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_available_now_file_stream(spark):
    from datalake_indexes_spark.operators.events import ab_conversion_test

    df = _events(spark)
    work = tempfile.mkdtemp(prefix="abfiles_")
    try:
        df.write.parquet(f"{work}/in")
        q = ab_monitor_stream(
            spark, f"{work}/in", df.schema, f"{work}/state", f"{work}/ckpt"
        )
        q.awaitTermination(120)
        assert _row(ab_estimate(spark, f"{work}/state")) == _row(
            ab_conversion_test(df)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_missing_state_raises(spark):
    with pytest.raises(FileNotFoundError):
        ab_estimate(spark, "/tmp/definitely-not-a-state-dir-xyz")
