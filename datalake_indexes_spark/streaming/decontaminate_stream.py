"""Streaming span-level decontamination — the live-ingest counterpart of
batch ``operators/dedup.py decontaminate_spans`` (cut verbatim benchmark
spans out of arriving documents, keep the documents).

Unlike the near-dup / chunk stores there is NO cross-batch state: the
benchmark set is static and each document is decontaminated
independently, so the stream is a pure per-batch transform — stream
output over any batch split equals the batch operator over the union,
row-for-row (the parity the tests pin).  The benchmark frame is captured
once by the processor closure; inside every micro-batch it broadcasts
exactly like the batch plan, so arriving documents never shuffle for the
span join.

Idempotency: the cleaned sink is partitioned by ``batch_id`` and written
with dynamic partition overwrite — a retried batch replaces its own leaf
with byte-identical rows (every underlying hash is deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import decontaminate_spans


def make_decontaminate_processor(
    benchmark: DataFrame,
    out_dir: str,
    k: int = 5,
    min_words: int = 10,
    max_ref_gram_freq: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str = "text",
    ref_id_col: str = "ref_id",
):
    """``foreachBatch`` worker: write the arriving docs' cleaned rows
    (doc_id, n_words_before, n_words_removed, text_cleaned) under the
    batch's partition."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cleaned = decontaminate_spans(
            batch_df,
            benchmark,
            k=k,
            min_words=min_words,
            max_ref_gram_freq=max_ref_gram_freq,
            text_col=text_col,
            id_col=id_col,
            ref_text_col=ref_text_col,
            ref_id_col=ref_id_col,
        )
        (
            cleaned.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return process


def load_cleaned(spark: SparkSession, out_dir: str) -> DataFrame:
    """All decontaminated documents written so far (batch_id dropped —
    each doc lives in exactly one batch).  A stream that has only seen
    empty batches never creates the sink (the processor's isEmpty
    early-return), so a missing directory reads as an EMPTY frame — the
    batch twin's output for the same input — not an AnalysisException."""
    import os

    if not os.path.isdir(out_dir):
        return spark.createDataFrame(
            [],
            "doc_id long, n_words_before long, n_words_removed long, "
            "text_cleaned string",
        )
    return spark.read.parquet(out_dir).drop("batch_id")


def decontaminate_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Wire the processor to a parquet file stream of documents."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_decontaminate_processor(benchmark, out_dir, **kwargs)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
