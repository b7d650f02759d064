"""Streaming lake-profile maintenance via mergeable sketches — the live
counterpart of ``operators/cocoa.column_profiles_approx``.

Exact distinct counts cannot be maintained incrementally without keeping
every seen value; HLL++ sketches can: ``union(sketch(A), sketch(B)) ==
sketch(A ∪ B)`` holds REGISTER-EXACTLY for HLL (merge = per-register
max), so per-batch sketch partials fold into the same estimate a
single-shot build over all data would produce — not approximately the
same, the identical binary sketch.  That is the property that makes this
a 100 TB design: each micro-batch writes O(keys × sketch_size) bytes,
history is never re-read, and the roll-up aggregates partials whose
count grows with batch count, not row count.

Per micro-batch, per profile key:

- ``sketch``  (key..., batch_id, hll BINARY)   — HLL++ partial,
- additive moments (n, n_null, min_v, max_v, sum_v) — all mergeable.

Idempotency: partials are partitioned by ``batch_id`` and written with
dynamic partition overwrite — a retried batch replaces its own partial,
changing nothing (the same discipline every sink in this package uses).

``profile_estimate`` is the query-time roll-up; ``profile_batch`` is the
single-shot twin over a static frame, so stream == batch parity is a
testable equation (tests/test_profile_stream.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partial(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    v = F.col(value_col)
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(v.cast("string")).alias("hll"),
        F.count(F.lit(1)).alias("n"),
        F.sum(v.isNull().cast("long")).alias("n_null"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v.cast("double")).alias("sum_v"),
    )


def make_profile_batch_processor(
    profile_dir: str, key_cols: list[str], value_col: str
):
    """foreachBatch processor: append this batch's sketch+moment partial
    under ``batch_id=N`` (dynamic overwrite — retry-idempotent)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            _partial(batch_df, key_cols, value_col)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(profile_dir, "partials"))
        )

    return process


def profile_estimate(
    spark: SparkSession, profile_dir: str, key_cols: list[str]
) -> DataFrame:
    """Roll the batch partials up into the current profile:
    (key..., n_distinct, n, n_null, min_v, max_v, mean_v)."""
    p = spark.read.parquet(os.path.join(profile_dir, "partials"))
    return p.groupBy(*key_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("n_distinct"),
        F.sum("n").alias("n"),
        F.sum("n_null").alias("n_null"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        (F.sum("sum_v") / F.sum("n")).alias("mean_v"),
    )


def profile_batch(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """Single-shot twin of :func:`profile_estimate` over a static frame —
    the stream == batch parity target."""
    return _partial(df, key_cols, value_col).select(
        *key_cols,
        F.hll_sketch_estimate("hll").alias("n_distinct"),
        "n",
        "n_null",
        "min_v",
        "max_v",
        (F.col("sum_v") / F.col("n")).alias("mean_v"),
    )


def profile_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    profile_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    value_col: str,
    trigger_available_now: bool = True,
):
    """Wire the partial writer to a parquet file stream."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_profile_batch_processor(profile_dir, key_cols, value_col)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
