"""Streaming as-of enrichment — the feature-store lookup at ingest time
(extension surface; the live counterpart of ``operators/events.asof_join``).

One event stream carries both sides (e.g. clicks to enrich, purchases to
learn from).  Per micro-batch: probe rows are as-of joined against the
union of (a) the persisted per-key state store from prior batches and
(b) the build rows arriving in the same batch, then the state store is
compacted to the LATEST build row per key and snapshotted.  State is one
row per key — the "current feature value" table — regardless of stream
length; that compaction is what makes the operator deployable on an
unbounded stream (keeping full build history would grow state forever).

Why compacting to one row per key is sufficient: micro-batches replay in
event-time order across batch boundaries (the file-stream / ordered-log
case this targets — the contract below), so every build row in the store
is at or before every timestamp of the current batch; a probe can
therefore only ever match either the per-key latest store row or a
same-batch build row, and :func:`operators.events.asof_join` already
resolves the within-batch ordering exactly.

Contract (documented, pinned by tests): batches must be event-time
ordered ACROSS batch boundaries; ordering WITHIN a batch is free.  An
out-of-order late build (earlier ts than an already-processed probe)
cannot retroactively enrich that probe — the standard streaming-join
trade-off; the batch twin run over the full table is the repair job.

Idempotency: the enrichment output is partitioned by ``batch_id`` with
dynamic partition overwrite, and the state store is SNAPSHOTTED per batch
(``batch_id=N`` holds the state AFTER batch N, computed from the newest
snapshot strictly below N) — a retried batch re-reads its predecessor's
snapshot and overwrites only its own leaves, emitting identical rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.events import asof_join


def compact_latest(
    builds: DataFrame, key_col: str, ts_col: str, seq_col: str
) -> DataFrame:
    """One row per key: the build row with the greatest (ts, seq)."""
    w = Window.partitionBy(key_col).orderBy(
        F.desc(ts_col), F.desc(seq_col)
    )
    return (
        builds.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def make_asof_batch_processor(
    store_dir: str,
    out_dir: str,
    key_col: str,
    ts_col: str,
    build_cols: list[str],
    seq_col: str,
    probe_filter: str,
    build_filter: str,
    probe_cols: list[str] | None = None,
):
    """``foreachBatch`` worker: splits the arriving batch into probe/build
    rows by the two SQL predicates, enriches probes against state ∪
    same-batch builds, appends the enriched output, and snapshots the
    compacted state."""
    from pyspark.errors import AnalysisException

    state_cols = list(dict.fromkeys([key_col, ts_col, seq_col] + build_cols))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        probes = batch_df.filter(F.expr(probe_filter))
        if probe_cols:
            probes = probes.select(*probe_cols)
        builds = batch_df.filter(F.expr(build_filter)).select(*state_cols)

        prior: DataFrame | None = None
        try:
            snaps = sess.read.parquet(store_dir).filter(F.col("batch_id") < batch_id)
            latest = snaps.agg(F.max("batch_id")).first()[0]
            if latest is not None:
                prior = snaps.filter(F.col("batch_id") == latest).drop("batch_id")
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
                raise

        all_builds = builds if prior is None else prior.unionByName(builds)
        enriched = asof_join(
            probes, all_builds, key_col, ts_col, build_cols, seq_col
        )
        (
            enriched.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        (
            compact_latest(all_builds, key_col, ts_col, seq_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_dir)
        )

    return process


def asof_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Wire the processor to a parquet file stream of events."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_asof_batch_processor(store_dir, out_dir, **kwargs)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
