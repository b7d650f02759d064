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


def test_seasonality_profile_hand_check(spark):
    """Two users, fixed epoch-µs stamps: hour buckets, Thursday dow
    anchor, and uniformity lift verified by hand."""
    from datalake_indexes_spark.operators.events import seasonality_profile

    hour = 3_600_000_000
    day = 24 * hour
    rows = [
        # type 'a': 3 events all at hour 5 of epoch day 0 (Thursday=4)
        (1, "a", 5 * hour, 1.0), (2, "a", 5 * hour + 1, 3.0), (3, "a", 5 * hour + 2, 5.0),
        # type 'b': one Thursday (day 0) + one Friday (day 1, dow 5)
        (4, "b", 0, 2.0), (5, "b", day + 2 * hour, 4.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts_us long, value double")
    out = {(r.grp, r.period_type, r.bucket): r for r in seasonality_profile(ev).collect()}
    a_hod = out[("a", "hod", 5)]
    assert (a_hod.n_events, a_hod.avg_value, a_hod.lift) == (3, 3.0, 24.0)
    assert out[("a", "dow", 4)].lift == 7.0
    assert out[("b", "dow", 4)].n_events == 1 and out[("b", "dow", 5)].n_events == 1
    assert out[("b", "dow", 4)].lift == 3.5  # 1 * 7 / 2
    assert ("a", "hod", 6) not in out


def test_session_paths_hand_check(spark):
    """One user, two sessions split by a >30min gap: trigrams stay inside
    sessions, counts aggregate across sessions, short sessions drop."""
    from datalake_indexes_spark.operators.events import session_paths

    m = 60_000_000  # one minute in µs
    rows = [
        # session 1: a b c d  → a>b>c, b>c>d
        (1, 1, "a", 0), (2, 1, "b", m), (3, 1, "c", 2 * m), (4, 1, "d", 3 * m),
        # session 2 (gap 40min): a b c → a>b>c
        (5, 1, "a", 43 * m), (6, 1, "b", 44 * m), (7, 1, "c", 45 * m),
        # user 2: too short for a trigram
        (8, 2, "x", 0), (9, 2, "y", m),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, ts_us long")
    out = {r.path: (r.n_occurrences, r.rank) for r in session_paths(ev, n=3, k=10).collect()}
    assert out == {"a>b>c": (2, 1), "b>c>d": (1, 2)}
