"""Native watermarked stream-stream interval join — live attribution
(extension surface; the one Structured Streaming join shape the rest of
the streaming package doesn't exercise: every other stream here is
foreachBatch-against-a-store, this one is Spark's own symmetric-hash
stream-stream join with watermark state eviction).

Semantics: every probe event (e.g. a click) is paired with EVERY build
event (e.g. an impression) of the same key whose event time falls in
``[probe_ts - lookback, probe_ts]`` — the candidate set of
:func:`..operators.events.interval_join_pairs`, emitted live.  INNER
join: candidates only; last-touch reduction is a batch concern
(:func:`..operators.events.last_touch_attribution`) because "latest
within the window" can change until the window closes.

Why this scales: Spark keeps both sides' state keyed by the join key and
the time-range condition lets the engine evict state older than
``watermark + lookback`` — bounded memory on an unbounded stream.
Without the range condition the state would grow forever (and Spark
would warn); the lookback IS the state bound.

Stream == batch parity is pinned by ``tests/test_attribution_stream.py``:
the streamed pair set equals the batch interval join over the same
events, including pairs whose probe and build arrive in DIFFERENT
micro-batches (forced via ``maxFilesPerTrigger=1``).  The cross-batch
guarantee is conditional exactly like any watermarked join: the
watermark delay must cover the probe/build ARRIVAL skew — with a zero
watermark, a build event arriving a batch after a later-timestamped
probe is already below the eviction line and the pair is (correctly,
per late-data semantics) dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def interval_pairs_streaming(
    events: DataFrame,
    probe_filter: str,
    build_filter: str,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    seq_col: str = "event_id",
    lookback_us: int = 7_200_000_000,
    watermark: str = "2 hours",
) -> DataFrame:
    """The joined frame (works on a streaming OR batch ``events`` — same
    plan, which is what the parity test leans on): (probe seq/key/ts,
    build seq/ts) candidate pairs.

    Both sides are filtered views of ONE input frame (a stream-stream
    self-join); each gets its own watermark so late arrivals on either
    side are bounded independently.
    """
    with_time = events.withColumn("__t", F.timestamp_micros(F.col(ts_col)))
    probe = (
        with_time.filter(F.expr(probe_filter))
        .select(
            F.col(seq_col).alias("probe_id"),
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("probe_ts_us"),
            F.col("__t").alias("probe_t"),
        )
    )
    build = (
        with_time.filter(F.expr(build_filter))
        .select(
            F.col(seq_col).alias("build_id"),
            F.col(key_col).alias("__bkey"),
            F.col(ts_col).alias("build_ts_us"),
            F.col("__t").alias("build_t"),
        )
    )
    if events.isStreaming:
        probe = probe.withWatermark("probe_t", watermark)
        build = build.withWatermark("build_t", watermark)
    lookback_expr = f"INTERVAL {lookback_us} MICROSECOND"
    joined = probe.join(
        build,
        F.expr(
            f"key = __bkey AND build_t <= probe_t "
            f"AND build_t >= probe_t - {lookback_expr}"
        ),
    )
    return joined.select(
        "probe_id", "key", "probe_ts_us", "build_id", "build_ts_us"
    )


def attribution_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    probe_filter: str = "event_type = 'click'",
    build_filter: str = "event_type = 'view'",
    lookback_us: int = 7_200_000_000,
    watermark: str = "2 hours",
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
    **kwargs,
) -> StreamingQuery:
    """Wire the interval join to a parquet file stream, appending live
    candidate pairs to ``out_dir`` (append mode is exactly right for an
    inner stream-stream join: a pair is emitted once, when both sides
    have arrived).  ``max_files_per_trigger`` bounds each micro-batch
    (availableNow honors it and runs several batches) — the tests use 1
    to force genuinely cross-batch pairs through the join state."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    pairs = interval_pairs_streaming(
        stream,
        probe_filter,
        build_filter,
        lookback_us=lookback_us,
        watermark=watermark,
        **kwargs,
    )
    writer = (
        pairs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
