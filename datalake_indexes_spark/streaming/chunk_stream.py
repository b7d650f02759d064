"""Streaming chunk-frequency maintenance — the live-ingest counterpart of
batch cross-document chunk dedup (``operators/dedup.py chunk_dedup``),
following the additive-partials pattern of ``text_index_stream.py``.

The chunk document-frequency aggregate is ADDITIVE over disjoint document
sets: per micro-batch we write (chunk, doc_cnt) partials — the number of
ARRIVING docs containing each chunk — partitioned by ``batch_id``;
``load_chunk_store`` folds the partials with one sum.  Because documents
arrive exactly once (each doc lives in one batch; the id space never
repeats), the folded store equals the batch operator's global
``count_distinct(doc_id)`` per chunk, register-exactly.

Cleaning is deliberately decoupled from ingestion: boilerplate is a
GLOBAL property (a banner only becomes boilerplate once enough documents
carry it), so a doc cleaned at arrival time could keep chunks that later
turn boilerplate.  The store answers "clean this corpus against
everything seen so far" at any point — ``clean_against_store`` — and
equals batch ``chunk_dedup`` run over all ingested docs (the parity the
tests pin).

Idempotency: the partial sink is partitioned by ``batch_id`` with dynamic
partition overwrite — a retried batch replaces its own leaf and the fold
is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import doc_chunks, reassemble_chunks


def make_chunk_store_processor(
    store_dir: str,
    chunk_words: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """``foreachBatch`` worker: append the arriving docs' (chunk, doc_cnt)
    partials under the batch's partition."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = (
            doc_chunks(batch_df, chunk_words, text_col=text_col, id_col=id_col)
            .groupBy("chunk")
            .agg(F.count_distinct("doc_id").alias("doc_cnt"))
        )
        (
            partial.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_dir)
        )

    return process


def load_chunk_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Fold the per-batch partials: (chunk, df) with df = total distinct
    documents ever seen containing the chunk."""
    return (
        spark.read.parquet(store_dir)
        .groupBy("chunk")
        .agg(F.sum("doc_cnt").alias("df"))
    )


def clean_against_store(
    docs: DataFrame,
    store: DataFrame,
    chunk_words: int = 4,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove store-boilerplate chunks (df >= min_doc_freq) from ``docs``
    and reassemble — same output contract as batch ``chunk_dedup``."""
    boiler = store.filter(F.col("df") >= min_doc_freq).select("chunk")
    exploded = doc_chunks(docs, chunk_words, text_col=text_col, id_col=id_col)
    return reassemble_chunks(exploded, boiler)


def chunk_store_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    store_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Wire the processor to a parquet file stream of documents."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_chunk_store_processor(store_dir, **kwargs)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
