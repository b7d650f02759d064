"""Stateful running-anomaly detection: the streaming detector
(applyInPandasWithState, additive-moment state) emits exactly what the
batch twin computes — including across batch boundaries, where state
carries the earlier batches' moments."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.streaming.anomaly_stream import (
    anomaly_stream,
    running_anomalies_batch,
)

THRESH, MIN_OBS = 2.5, 4


def _events(spark):
    rows = []
    eid = 0
    for u in (1, 2):
        for i in range(40):
            # stable series with planted spikes at i = 20 and 33
            v = 10.0 + (i % 3) * 0.5 + (50.0 if i in (20, 33) else 0.0)
            rows.append((eid, u, i * 1_000_000, v))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )


def _norm(rows):
    return sorted((r["event_id"], r["key"], r["value"], r["z"]) for r in rows)


@pytest.mark.spark
def test_batch_twin_flags_planted_spikes(spark):
    ev = _events(spark)
    out = running_anomalies_batch(
        ev, z_threshold=THRESH, min_obs=MIN_OBS
    ).collect()
    flagged = {(r.key, r.event_id) for r in out}
    # both users' spikes, nothing else near them
    assert (1, 20) in flagged and (2, 60) in flagged
    assert all(r.z > THRESH for r in out)  # spikes are upward


@pytest.mark.spark
def test_stream_matches_batch_across_batches(spark):
    ev = _events(spark)
    expected = _norm(
        running_anomalies_batch(ev, z_threshold=THRESH, min_obs=MIN_OBS).collect()
    )
    assert expected, "planted spikes must flag"

    work = tempfile.mkdtemp(prefix="anom_")
    try:
        # two time-ordered files -> two micro-batches (maxFilesPerTrigger=1):
        # the second batch's scores depend on STATE from the first
        ev.filter(F.col("ts_us") < 25_000_000).coalesce(1).write.parquet(
            f"{work}/in/f1"
        )
        ev.filter(F.col("ts_us") >= 25_000_000).coalesce(1).write.parquet(
            f"{work}/in/f2"
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{work}/in/*")
        )
        q = (
            anomaly_stream(stream, z_threshold=THRESH, min_obs=MIN_OBS)
            .writeStream.format("memory")
            .queryName("anomalies")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = _norm(spark.sql("SELECT * FROM anomalies").collect())
        assert got == expected
    finally:
        shutil.rmtree(work, ignore_errors=True)
