"""Streaming event-rate changepoint monitor — the live counterpart of
``operators/events.cusum_changepoints``.

Per-period event counts are ADDITIVE: each micro-batch writes its
(event_type, period, c) count partial and the readout folds partials
with one sum before running the SAME CUSUM scan the batch detector uses
(``events.cusum_readout`` — one definition of the statistic, so stream
== batch is a testable equation, tests/test_changepoint_stream.py).
Per-batch state is O(types × periods touched by the batch); history is
never re-read row-wise.

Idempotency: partials are partitioned by ``batch_id`` and written with
dynamic partition overwrite — a retried batch replaces its own partial,
changing nothing (the same discipline every sink in this package uses).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.events import _period_bucket


def _partial(
    df: DataFrame, period_us: int, type_col: str, ts_col: str
) -> DataFrame:
    period = _period_bucket(ts_col, period_us).cast("long")
    return df.select(
        F.col(type_col).alias("event_type"), period.alias("period")
    ).groupBy("event_type", "period").agg(F.count(F.lit(1)).alias("c"))


def make_changepoint_batch_processor(
    state_dir: str,
    period_us: int = 86_400_000_000,
    type_col: str = "event_type",
    ts_col: str = "ts_us",
):
    """foreachBatch processor: append this batch's per-period count
    partial under ``batch_id=N`` (dynamic overwrite — retry-idempotent)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            _partial(batch_df, period_us, type_col, ts_col)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return process


def changepoint_monitor_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    period_us: int = 86_400_000_000,
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain the per-period count state over a file stream of events."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_changepoint_batch_processor(state_dir, period_us, type_col, ts_col)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def changepoint_estimate(
    spark: SparkSession, state_dir: str, score_crit: float = 1.358
) -> DataFrame:
    """Query-time readout: fold the count partials per (type, period) and
    hand the folded frame to the SAME ``cusum_readout`` the batch
    detector uses."""
    from datalake_indexes_spark.operators.events import cusum_readout

    if not os.path.isdir(state_dir):
        raise FileNotFoundError(f"no changepoint state at {state_dir}")
    partials = spark.read.parquet(state_dir)
    counts = partials.groupBy("event_type", "period").agg(F.sum("c").alias("c"))
    return cusum_readout(counts, score_crit=score_crit)
