"""Streaming distribution-drift monitor — the live counterpart of
``operators/cocoa.profile_psi`` for ONE numeric column against a frozen
baseline.

The baseline snapshot fixes the bucket grid (lo, hi, nbins) up front —
the standard monitoring deployment: bins are frozen when the reference
window is chosen, so per-batch bucket counts are ADDITIVE and each
micro-batch writes O(nbins) rows.  The readout folds partials with one
sum and computes PSI and TV against the baseline histogram with the same
Laplace smoothing as the batch operator.

Idempotency: partials are partitioned by ``batch_id`` and written with
dynamic partition overwrite — a retried batch replaces its own partial,
changing nothing (the same discipline every sink in this package uses).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def histogram_counts(
    df: DataFrame, value_col: str, lo: float, hi: float, nbins: int = 10
) -> DataFrame:
    """(bucket, c) equi-width histogram on the FROZEN [lo, hi] grid —
    values outside the range clamp to the edge buckets (a drifted stream
    must still land somewhere visible, not vanish)."""
    v = F.col(value_col).cast("double")
    width = (hi - lo) / nbins
    raw = F.floor((v - F.lit(lo)) / F.lit(width))
    bucket = F.greatest(F.lit(0), F.least(F.lit(nbins - 1), raw)).cast("int")
    # NaN passes isNotNull but floor(NaN) would land in an edge bucket,
    # counting NaN rows the batch baseline excludes — drop it like NULL.
    return (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def make_drift_batch_processor(
    state_dir: str, value_col: str, lo: float, hi: float, nbins: int = 10
):
    """foreachBatch processor: append this batch's bucket-count partial
    under ``batch_id=N`` (dynamic overwrite — retry-idempotent)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            histogram_counts(batch_df, value_col, lo, hi, nbins)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return process


def drift_monitor_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int = 10,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain the live histogram state over a file stream."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_drift_batch_processor(state_dir, value_col, lo, hi, nbins)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drift_estimate(
    spark: SparkSession,
    state_dir: str,
    baseline: DataFrame,
    nbins: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """Query-time readout: fold the live partials, compare against the
    ``baseline`` histogram ((bucket, c) on the SAME grid): one row
    (n_ref, n_live, psi, tv_distance) with the batch operator's Laplace
    smoothing for PSI and the plain half-L1 for TV."""
    if not os.path.isdir(state_dir):
        raise FileNotFoundError(f"no drift state at {state_dir}")
    live = (
        spark.read.parquet(state_dir)
        .groupBy("bucket")
        .agg(F.sum("c").alias("__n_b"))
    )
    ref = baseline.select("bucket", F.col("c").alias("__n_a"))
    joined = ref.join(live, "bucket", "full_outer").fillna(
        0, subset=["__n_a", "__n_b"]
    )
    tot = joined.agg(
        F.sum("__n_a").alias("n_ref"), F.sum("__n_b").alias("n_live")
    )
    both = joined.crossJoin(F.broadcast(tot))
    pa = (F.col("__n_a") + F.lit(eps)) / (F.col("n_ref") + F.lit(eps * nbins))
    pb = (F.col("__n_b") + F.lit(eps)) / (F.col("n_live") + F.lit(eps * nbins))
    tv = F.abs(
        F.col("__n_a") / F.col("n_ref") - F.col("__n_b") / F.col("n_live")
    )
    return both.groupBy().agg(
        F.first("n_ref").alias("n_ref"),
        F.first("n_live").alias("n_live"),
        F.round(F.sum((pa - pb) * F.ln(pa / pb)), 6).alias("psi"),
        F.round(F.sum(tv) / F.lit(2.0), 6).alias("tv_distance"),
    )
