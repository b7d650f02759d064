"""Streaming exponential time-decay stats — the incremental twin of
:func:`..operators.events.decay_weighted_stats`.

Decay from a FIXED anchor is commutative algebra, which makes the per-key
partials mergeable across batches: each batch stores its sums anchored at
its OWN max timestamp, and the readout rescales every partial to the
newest anchor with one multiply — w@T = w@a · exp(−λ·(T−a)) — before the
final per-key sum.  Anchoring per batch (instead of at epoch 0) is what
keeps the arithmetic finite: exp(+λ·t) for an absolute microsecond
timestamp overflows a double at any realistic λ, while (T−a) spans only
the stream's duration.

State layout mirrors the package's other foreachBatch monitors
(drift_stream, dedup_stream): one parquet partial per batch under
``batch_id=N``, written with dynamic partition overwrite so a retried
batch replaces itself (retry-idempotent), merged only at query time.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _lam(half_life_us: int) -> float:
    if half_life_us <= 0:
        raise ValueError("decay stream: half_life_us must be positive")
    return math.log(2.0) / float(half_life_us)


def decay_partial(
    df: DataFrame,
    half_life_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Per-key decayed sums anchored at THIS frame's max timestamp:
    (key, n, w_sum, wv_sum, vw_sum, anchor).  ``w_sum`` spans all events,
    ``wv_sum``/``vw_sum`` (Σ w·v and Σ w over non-NULL v) feed the mean."""
    lam = _lam(half_life_us)
    anchor = df.agg(F.max(ts_col).alias("__a"))
    w = F.exp(-F.lit(lam) * (F.col("__a") - F.col(ts_col)))
    v = F.col(value_col).cast("double")
    return (
        df.crossJoin(F.broadcast(anchor))
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(w).alias("w_sum"),
            F.sum(F.when(v.isNotNull(), w * v)).alias("wv_sum"),
            F.sum(F.when(v.isNotNull(), w)).alias("vw_sum"),
            F.first(F.col("__a")).alias("anchor"),
        )
    )


def make_decay_batch_processor(
    state_dir: str,
    half_life_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
):
    """foreachBatch processor: append this batch's anchored per-key
    partial under ``batch_id=N`` (dynamic overwrite — retry-idempotent)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            decay_partial(batch_df, half_life_us, key_col, ts_col, value_col)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return process


def decay_monitor_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    half_life_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain the decayed-stats state over a file stream."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_decay_batch_processor(
        state_dir, half_life_us, key_col, ts_col, value_col
    )
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def decay_estimate(
    spark: SparkSession, state_dir: str, half_life_us: int
) -> DataFrame:
    """Query-time readout: rescale every batch partial to the newest
    anchor (one multiply per partial row), merge per key, and emit the
    batch operator's exact output shape (key, n, weight_sum,
    decayed_value, ewm_mean) — values agree with the batch twin up to
    float merge order (≪ the 6-decimal rounding)."""
    if not os.path.isdir(state_dir):
        raise FileNotFoundError(f"no decay state at {state_dir}")
    lam = _lam(half_life_us)
    partials = spark.read.parquet(state_dir)
    t_max = partials.agg(F.max("anchor").alias("__T"))
    scale = F.exp(-F.lit(lam) * (F.col("__T") - F.col("anchor")))
    return (
        partials.crossJoin(F.broadcast(t_max))
        .groupBy("key")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum(scale * F.col("w_sum")), 6).alias("weight_sum"),
            F.round(F.sum(scale * F.col("wv_sum")), 6).alias("decayed_value"),
            F.round(
                F.sum(scale * F.col("wv_sum"))
                / F.nullif(F.sum(scale * F.col("vw_sum")), F.lit(0.0)),
                6,
            ).alias("ewm_mean"),
        )
    )
