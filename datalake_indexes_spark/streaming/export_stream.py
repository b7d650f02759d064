"""Streaming delivery-sink maintenance: a live corpus stream keeps a
sharded JSONL export continuously fresh (extension surface — the batch
side is ``sources/export.py``; this is its Structured Streaming twin,
following the staging + foreachBatch pattern of ``incremental.py``).

Two-tier design, chosen for idempotency AND bounded per-batch work:

1. **Staging corpus** — arriving documents append to a parquet sink
   partitioned by ``batch_id`` (dynamic partition overwrite: a retried
   micro-batch replaces its own leaf, so the accumulated corpus is
   exactly-once without any dedup pass).
2. **Shard refresh** — after staging, the batch worker runs the
   fingerprint-gated incremental export over the ACCUMULATED corpus:
   per-shard md5 fingerprints are diffed against the delivery manifest
   and only shards whose membership changed are rewritten.  A
   micro-batch of b documents touches at most min(b, n_shards) shards,
   so steady-state per-batch write cost is proportional to the batch,
   not the corpus — while the delivery directory is always a complete,
   consistent export of everything ingested so far.

The refresh reads the staging sink (columnar, pruned to the export
columns), never the raw stream, so a crash between staging and refresh
self-heals: the next batch's refresh exports the already-staged rows.
Stream == batch parity: after any prefix of batches, the delivery equals
``export_jsonl_shards`` run over the same documents (pinned by test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pyspark.sql import functions as F

from datalake_indexes_spark.sources.export import (
    export_jsonl_shards_incremental,
)


def make_delivery_processor(
    staging_dir: str,
    delivery_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    cols: list[str] | None = None,
):
    """``foreachBatch`` worker: stage the arriving docs, then refresh only
    the delivery shards whose fingerprint changed."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(staging_dir)
        )
        corpus = sess.read.parquet(staging_dir).drop("batch_id")
        if cols:
            corpus = corpus.select(id_col, *[c for c in cols if c != id_col])
        export_jsonl_shards_incremental(
            corpus, delivery_dir, n_shards=n_shards, id_col=id_col
        )

    return process


def delivery_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    staging_dir: str,
    delivery_dir: str,
    checkpoint_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain a sharded JSONL delivery from a stream of document files."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_delivery_processor(
        staging_dir, delivery_dir, n_shards=n_shards, id_col=id_col
    )
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
