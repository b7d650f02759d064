"""Streaming as-of enrichment (streaming/asof_stream.py): stream == batch
twin under the ordered-batches contract, cross-batch state matching,
one-row-per-key state compaction, retry idempotency."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.events import asof_join
from datalake_indexes_spark.streaming.asof_stream import (
    compact_latest,
    make_asof_batch_processor,
)

PROBE = "event_type = 'click'"
BUILD = "event_type = 'purchase'"


def _events(spark):
    """Interleaved clicks/purchases for 2 users, event-time increasing.
    Purchases: u1@100(v=5), u1@300(v=7), u2@250(v=9).
    Clicks: u1@150, u1@300 (tie -> inclusive), u2@200 (before u2's first
    purchase -> NULL), u1@400, u2@500."""
    rows = [
        (10, 1, 100, "purchase", 5.0),
        (1, 1, 150, "click", 0.0),
        (2, 2, 200, "click", 0.0),
        (11, 2, 250, "purchase", 9.0),
        (12, 1, 300, "purchase", 7.0),
        (3, 1, 300, "click", 0.0),
        (4, 1, 400, "click", 0.0),
        (5, 2, 500, "click", 0.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string, value double"
    )


def _expected(ev):
    return asof_join(
        ev.filter(F.expr(PROBE)).select("event_id", "user_id", "ts_us"),
        ev.filter(F.expr(BUILD)).select("event_id", "user_id", "ts_us", "value"),
        "user_id",
        "ts_us",
        ["event_id", "value"],
        "event_id",
    )


def _norm(rows):
    return sorted(
        (r["event_id"], r["asof_event_id"], r["asof_value"]) for r in rows
    )


def _run_batches(spark, ev, work, splits):
    process = make_asof_batch_processor(
        f"{work}/store",
        f"{work}/out",
        key_col="user_id",
        ts_col="ts_us",
        build_cols=["event_id", "value"],
        seq_col="event_id",
        probe_filter=PROBE,
        build_filter=BUILD,
        probe_cols=["event_id", "user_id", "ts_us"],
    )
    for i, (lo, hi) in enumerate(splits):
        process(ev.filter((F.col("ts_us") >= lo) & (F.col("ts_us") < hi)), i)
    return process


def test_stream_matches_batch_twin(spark):
    ev = _events(spark)
    expected = _norm(_expected(ev).collect())
    assert any(m is not None for _, m, _ in expected)
    assert any(m is None for _, m, _ in expected)  # u2@200 has no prior purchase

    work = tempfile.mkdtemp(prefix="asofstream_")
    try:
        # event-time-ordered batches, boundaries chosen so click u1@400
        # must match a purchase from TWO batches earlier via the store
        _run_batches(spark, ev, work, [(0, 200), (200, 350), (350, 600)])
        got = _norm(spark.read.parquet(f"{work}/out").collect())
        assert got == expected
        # the tie click u1@300 matched the same-batch purchase inclusively
        assert (3, 12, 7.0) in got
        # the late click u2@500 matched via state (purchase from batch 1)
        assert (5, 11, 9.0) in got
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_state_is_one_row_per_key(spark):
    ev = _events(spark)
    work = tempfile.mkdtemp(prefix="asofstate_")
    try:
        _run_batches(spark, ev, work, [(0, 200), (200, 350), (350, 600)])
        snaps = spark.read.parquet(f"{work}/store")
        last = snaps.agg(F.max("batch_id")).first()[0]
        state = snaps.filter(F.col("batch_id") == last)
        assert state.count() == state.select("user_id").distinct().count()
        # and it holds the LATEST purchase per user
        vals = {r["user_id"]: r["event_id"] for r in state.collect()}
        assert vals == {1: 12, 2: 11}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    ev = _events(spark)
    work = tempfile.mkdtemp(prefix="asofretry_")
    try:
        process = _run_batches(spark, ev, work, [(0, 200), (200, 350), (350, 600)])
        once = _norm(spark.read.parquet(f"{work}/out").collect())
        # replay the middle batch (speculative re-execution)
        process(
            ev.filter((F.col("ts_us") >= 200) & (F.col("ts_us") < 350)), 1
        )
        twice = _norm(spark.read.parquet(f"{work}/out").collect())
        assert once == twice
        state = spark.read.parquet(f"{work}/store")
        per_snap = state.groupBy("batch_id", "user_id").count()
        assert per_snap.filter(F.col("count") > 1).count() == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_compact_latest_resolves_seq_ties(spark):
    builds = spark.createDataFrame(
        [(20, 1, 100, 1.0), (21, 1, 100, 2.0), (22, 2, 50, 3.0)],
        "event_id long, user_id long, ts_us long, value double",
    )
    out = {
        r["user_id"]: r["event_id"]
        for r in compact_latest(builds, "user_id", "ts_us", "event_id").collect()
    }
    assert out == {1: 21, 2: 22}
