"""Native stream-stream watermarked interval join
(streaming/attribution_stream.py): the streamed candidate-pair set equals
the batch interval join over the same events, including pairs whose probe
and build sides arrive in different files."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.events import interval_join_pairs
from datalake_indexes_spark.streaming.attribution_stream import (
    attribution_stream,
    interval_pairs_streaming,
)

SCHEMA = "event_id long, user_id long, ts_us long, event_type string"
LOOKBACK = 100  # µs — tiny synthetic timeline


def _events(spark):
    """Clicks/views for 2 users.  In-window pairs (lookback 100,
    inclusive both ends): u1 click@150 <- views@60,100,150; u1 click@300
    <- view@250; u2 click@400 <- view@350; u2 click@90 <- view@10;
    view@600 matches nothing (after the last click)."""
    rows = [
        (1, 1, 60, "view"),
        (2, 1, 100, "view"),
        (3, 1, 150, "click"),
        (4, 1, 150, "view"),
        (5, 1, 250, "view"),
        (6, 1, 300, "click"),
        (7, 2, 10, "view"),
        (8, 2, 90, "click"),
        (9, 2, 350, "view"),
        (10, 2, 400, "click"),
        (11, 2, 600, "view"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _norm(rows):
    return sorted((r["probe_id"], r["build_id"]) for r in rows)


def _batch_pairs(spark, ev):
    return interval_join_pairs(
        ev.filter("event_type = 'click'").select("event_id", "user_id", "ts_us"),
        ev.filter("event_type = 'view'").select("event_id", "user_id", "ts_us"),
        lookback_us=LOOKBACK,
        probe_cols=["event_id"],
        build_cols=["event_id"],
    ).select(
        F.col("event_id").alias("probe_id"),
        F.col("b_event_id").alias("build_id"),
    )


def test_batch_interval_pairs_semantics(spark):
    pairs = _norm(_batch_pairs(spark, _events(spark)).collect())
    assert pairs == [(3, 1), (3, 2), (3, 4), (6, 5), (8, 7), (10, 9)]


def test_stream_equals_batch_across_files(spark):
    """Events split into 3 files, ONE FILE PER MICRO-BATCH
    (maxFilesPerTrigger=1 — availableNow honors it and runs three
    batches), so probe/build pairs split across files genuinely cross
    join-state batch boundaries.  The watermark must cover the arrival
    skew for the cross-batch guarantee (module docstring): with a large
    delay no build is evicted before its probe arrives, and the streamed
    pair set equals the batch join exactly."""
    ev = _events(spark)
    work = tempfile.mkdtemp(prefix="attr_stream_")
    try:
        in_dir = os.path.join(work, "in")
        os.makedirs(in_dir)
        rows = ev.collect()
        for i, chunk in enumerate((rows[:4], rows[4:9], rows[9:])):
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
                os.path.join(in_dir, f"f{i}")
            )
        # register each file dir as one glob level for the file source
        q = attribution_stream(
            spark,
            os.path.join(in_dir, "*"),
            SCHEMA,
            out_dir=os.path.join(work, "out"),
            checkpoint_dir=os.path.join(work, "ck"),
            lookback_us=LOOKBACK,
            watermark="1 hour",
            max_files_per_trigger=1,
        )
        q.awaitTermination(240)
        got = _norm(spark.read.parquet(os.path.join(work, "out")).collect())
        want = _norm(_batch_pairs(spark, ev).collect())
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_plan_is_stream_stream_join(spark):
    """The streaming frame really is a stream-stream join (not a
    foreachBatch emulation): both join children are streaming."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(tempfile.mkdtemp(prefix="attr_probe_"))
    )
    pairs = interval_pairs_streaming(
        stream, "event_type = 'click'", "event_type = 'view'",
        lookback_us=LOOKBACK,
    )
    assert pairs.isStreaming
