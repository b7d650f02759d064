"""Streaming A/B experiment monitor — the live counterpart of
``operators/events.ab_conversion_test``.

The two-proportion z readout needs per-user event counts, and counts are
ADDITIVE: each micro-batch writes its per-user (convert, baseline) count
partial and the readout folds partials with one sum — history is never
re-read row-wise, per-batch state is O(active users in the batch), and
the roll-up input grows with batch count × users, not event count.  The
conversion rule (more convert-type than baseline-type events) and the md5
variant assignment live in ONE place (``events.ab_readout``), so the
stream readout and the batch test surface the identical statistic —
stream == batch is a testable equation (tests/test_ab_stream.py).

Idempotency: partials are partitioned by ``batch_id`` and written with
dynamic partition overwrite — a retried batch replaces its own partial,
changing nothing (the same discipline every sink in this package uses).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _partial(
    df: DataFrame, convert_type: str, baseline_type: str, key_col: str, type_col: str
) -> DataFrame:
    return df.groupBy(F.col(key_col).alias("__k")).agg(
        F.sum((F.col(type_col) == convert_type).cast("long")).alias("n_convert"),
        F.sum((F.col(type_col) == baseline_type).cast("long")).alias("n_baseline"),
    )


def make_ab_batch_processor(
    state_dir: str,
    convert_type: str = "purchase",
    baseline_type: str = "click",
    key_col: str = "user_id",
    type_col: str = "event_type",
):
    """foreachBatch processor: append this batch's per-user count partial
    under ``batch_id=N`` (dynamic overwrite — retry-idempotent)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            _partial(batch_df, convert_type, baseline_type, key_col, type_col)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return process


def ab_monitor_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    convert_type: str = "purchase",
    baseline_type: str = "click",
    key_col: str = "user_id",
    type_col: str = "event_type",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain the experiment-count state over a file stream of events."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_ab_batch_processor(
        state_dir, convert_type, baseline_type, key_col, type_col
    )
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ab_estimate(
    spark: SparkSession, state_dir: str, z_crit: float = 1.959963984540054
) -> DataFrame:
    """Query-time readout: fold the count partials per user, apply the
    shared conversion rule, and hand the per-user frame to the SAME
    ``ab_readout`` the batch test uses."""
    from datalake_indexes_spark.operators.events import ab_readout

    if not os.path.isdir(state_dir):
        raise FileNotFoundError(f"no A/B state at {state_dir}")
    partials = spark.read.parquet(state_dir)
    per_user = partials.groupBy("__k").agg(
        (F.sum("n_convert") > F.sum("n_baseline")).cast("long").alias("__conv")
    )
    return ab_readout(per_user, z_crit=z_crit)
