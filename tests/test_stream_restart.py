"""Crash-recovery for the stateful streaming twins: a query is run to
termination on the FIRST half of the input (availableNow), the process's
in-memory query object is discarded — the crash — and a brand-new query
is started from the SAME checkpoint over a directory that now also
contains the second half.  Recovery must (a) restore the operator state
(anomaly: the applyInPandasWithState state store inside the checkpoint;
A/B + changepoint: the batch-id-partitioned partial store), (b) resume
file-source offsets so the first half is NOT reprocessed, and (c) leave
the final answer equal to the one-shot batch computation over the full
input.  This crosses a QUERY RESTART, not just a micro-batch boundary —
the gap the stream==batch parity tests left open.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------- anomaly
# applyInPandasWithState: the per-user moments live in the Spark state
# store under the checkpoint; the restarted query must resume them.


def _anomaly_events(spark):
    rows = []
    eid = 0
    for u in (1, 2):
        for i in range(40):
            v = 10.0 + (i % 3) * 0.5 + (50.0 if i in (20, 33) else 0.0)
            rows.append((eid, u, i * 1_000_000, v))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )


def test_anomaly_stream_checkpoint_restart(spark):
    from datalake_indexes_spark.streaming.anomaly_stream import (
        anomaly_stream,
        running_anomalies_batch,
    )

    thresh, min_obs = 2.5, 4
    ev = _anomaly_events(spark)
    expected = sorted(
        (r["event_id"], r["key"], r["value"], r["z"])
        for r in running_anomalies_batch(
            ev, z_threshold=thresh, min_obs=min_obs
        ).collect()
    )
    assert expected, "planted spikes must flag"
    # both halves contribute flags, so recovery is observable on output
    # AND the second half's z-scores need the first half's moments
    first_half = {e for e, *_ in expected if e % 40 < 25}
    second_half = {e for e, *_ in expected if e % 40 >= 25}
    assert first_half and second_half

    work = tempfile.mkdtemp(prefix="anomrestart_")
    try:
        # a FILE sink (unlike memory) supports checkpoint recovery — the
        # exactly-once contract a production run would rely on
        def run():
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{work}/in/*")
            )
            q = (
                anomaly_stream(stream, z_threshold=thresh, min_obs=min_obs)
                .writeStream.format("parquet")
                .option("path", f"{work}/out")
                .outputMode("append")
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return spark.read.parquet(f"{work}/out").collect()

        ev.filter(F.col("ts_us") < 25_000_000).coalesce(1).write.parquet(
            f"{work}/in/f1"
        )
        got1 = run()  # terminates; the query object dies here
        ev.filter(F.col("ts_us") >= 25_000_000).coalesce(1).write.parquet(
            f"{work}/in/f2"
        )
        got2 = run()  # fresh query, same checkpoint

        # offsets resumed: the restart emitted only second-half events,
        # scored against state recovered from the checkpoint store
        new_ids = {r["event_id"] for r in got2} - {r["event_id"] for r in got1}
        assert {r["event_id"] for r in got1} == first_half
        assert new_ids == second_half
        got = sorted((r["event_id"], r["key"], r["value"], r["z"]) for r in got2)
        assert got == expected
    finally:
        shutil.rmtree(work, ignore_errors=True)


# -------------------------------------------------------------------- A/B
# foreachBatch + partial store: restart must resume batch ids past the
# committed ones (no double-count of the first half) and the readout
# must fold to the batch answer.


def _ab_events(spark):
    rows = []
    for uid in range(120):
        n_p, n_c = (3, 1) if uid % 3 == 0 else (1, 2)
        rows += [(uid, "purchase")] * n_p + [(uid, "click")] * n_c
        rows.append((uid, "view"))
    return spark.createDataFrame(rows, "user_id long, event_type string")


def test_ab_stream_checkpoint_restart(spark):
    from datalake_indexes_spark.operators.events import ab_conversion_test
    from datalake_indexes_spark.streaming.ab_stream import (
        ab_estimate,
        ab_monitor_stream,
    )

    df = _ab_events(spark).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="abrestart_")
    try:
        # users straddle the two halves, so the fold is only correct if
        # BOTH halves' partials survive the restart exactly once
        df.filter(F.col("__i") % 2 == 0).drop("__i").write.parquet(f"{work}/in/f1")
        q = ab_monitor_stream(
            spark, f"{work}/in/*", _ab_events(spark).schema,
            f"{work}/state", f"{work}/ckpt",
        )
        q.awaitTermination(120)
        df.filter(F.col("__i") % 2 == 1).drop("__i").write.parquet(f"{work}/in/f2")
        q2 = ab_monitor_stream(
            spark, f"{work}/in/*", _ab_events(spark).schema,
            f"{work}/state", f"{work}/ckpt",
        )
        q2.awaitTermination(120)

        def row(d):
            r = d.collect()[0]
            return (
                r.n_a, r.n_b, r.conv_a, r.conv_b,
                r.rate_a, r.rate_b, r.z_score, r.significant,
            )

        assert row(ab_estimate(spark, f"{work}/state")) == row(
            ab_conversion_test(_ab_events(spark))
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ------------------------------------------------------------ changepoint


def _cp_events(spark, period=100):
    rows = []
    for p in range(40):
        n = 10 if p < 20 else 2
        rows += [("a", p * period + i) for i in range(n)]
        rows += [("b", p * period + i) for i in range(5)]
    return spark.createDataFrame(rows, "event_type string, ts_us long")


def test_changepoint_stream_checkpoint_restart(spark):
    from datalake_indexes_spark.operators.events import cusum_changepoints
    from datalake_indexes_spark.streaming.changepoint_stream import (
        changepoint_estimate,
        changepoint_monitor_stream,
    )

    period = 100
    df = _cp_events(spark, period)
    work = tempfile.mkdtemp(prefix="cprestart_")
    try:
        # split INSIDE the pre-change regime: the detector only sees the
        # planted drop if the restarted run folds against phase-1 state
        df.filter(F.col("ts_us") < 10 * period).write.parquet(f"{work}/in/f1")
        q = changepoint_monitor_stream(
            spark, f"{work}/in/*", df.schema,
            f"{work}/state", f"{work}/ckpt", period_us=period,
        )
        q.awaitTermination(120)
        df.filter(F.col("ts_us") >= 10 * period).write.parquet(f"{work}/in/f2")
        q2 = changepoint_monitor_stream(
            spark, f"{work}/in/*", df.schema,
            f"{work}/state", f"{work}/ckpt", period_us=period,
        )
        q2.awaitTermination(120)

        def rows(d):
            return sorted(
                (
                    r.event_type, r.n_periods, r.change_period,
                    r.max_cusum_abs, r.score, r.change_flag,
                )
                for r in d.collect()
            )

        got = rows(changepoint_estimate(spark, f"{work}/state"))
        assert got == rows(cusum_changepoints(df, period_us=period))
        by_type = {t: flag for (t, _, _, _, _, flag) in got}
        assert by_type["a"] and not by_type["b"]
    finally:
        shutil.rmtree(work, ignore_errors=True)
