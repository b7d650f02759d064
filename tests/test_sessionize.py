"""Stateful sessionization: streaming (applyInPandasWithState) emits exactly
the sessions the batch twin computes."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from datalake_indexes_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

GAP = 1800


@pytest.mark.spark
def test_stream_sessions_match_batch(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in sessionize_batch(events, GAP).collect()
    }
    assert batch, "no batch sessions"

    work = tempfile.mkdtemp(prefix="sess_")
    try:
        events.write.parquet(f"{work}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{work}/in")
        q = (
            sessionize_stream(stream, GAP)
            .writeStream.format("memory")
            .queryName("sessions")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        emitted = spark.sql("SELECT * FROM sessions").collect()
        # append mode emits sessions closed in-batch (gap exceeded by a later
        # event); still-open per-user tails stay in state until a timeout
        # batch — every emitted session must match its batch twin exactly
        assert emitted, "stream emitted no closed sessions"
        for r in emitted:
            key = (r["user_id"], r["session_start"], r["session_end"])
            assert key in batch, f"streamed session {key} not in batch result"
            assert batch[key] == (r["n_events"], r["sum_value"]), key
    finally:
        shutil.rmtree(work, ignore_errors=True)
