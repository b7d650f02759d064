"""Streaming user-lifetime (Kaplan–Meier) monitor — the live counterpart
of ``operators/events.survival_curve``.

Per-key activity spans are MERGEABLE: min(first) and max(last) fold
across micro-batches exactly (min/max are idempotent, commutative,
associative), so each batch writes its per-user (first, last) partial and
the readout folds them with one aggregate before running the SAME KM
scan the batch estimator uses (``events.survival_from_spans`` — one
definition of the statistic, stream == batch pinned by
tests/test_survival_stream.py).  Per-batch state is O(active users in
the batch); history is never re-read row-wise.

Idempotency: partials are partitioned by ``batch_id`` and written with
dynamic partition overwrite — a retried batch replaces its own partial,
changing nothing (the same discipline every sink in this package uses).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _partial(df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    return df.groupBy(F.col(key_col).alias("__k")).agg(
        F.min(ts_col).alias("__first"), F.max(ts_col).alias("__last")
    )


def make_survival_batch_processor(
    state_dir: str, key_col: str = "user_id", ts_col: str = "ts_us"
):
    """foreachBatch processor: append this batch's per-user span partial
    under ``batch_id=N`` (dynamic overwrite — retry-idempotent)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            _partial(batch_df, key_col, ts_col)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return process


def survival_monitor_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain the per-user span state over a file stream of events."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_survival_batch_processor(state_dir, key_col, ts_col)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def survival_estimate(
    spark: SparkSession,
    state_dir: str,
    period_us: int = 86_400_000_000,
    censor_horizon_periods: int = 7,
) -> DataFrame:
    """Query-time readout: fold the span partials per user (min/max
    merge) and hand the folded frame to the SAME ``survival_from_spans``
    the batch estimator uses."""
    from datalake_indexes_spark.operators.events import survival_from_spans

    if not os.path.isdir(state_dir):
        raise FileNotFoundError(f"no survival state at {state_dir}")
    partials = spark.read.parquet(state_dir)
    spans = partials.groupBy("__k").agg(
        F.min("__first").alias("__first"), F.max("__last").alias("__last")
    )
    return survival_from_spans(
        spans, period_us=period_us, censor_horizon_periods=censor_horizon_periods
    )
