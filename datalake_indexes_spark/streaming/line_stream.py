"""Streaming line-frequency maintenance — the live-ingest counterpart of
batch corpus-frequency line dedup (``operators/dedup.py line_census`` /
``line_dedup``), the line-granularity sibling of ``chunk_stream.py``.

The trimmed-line document-frequency aggregate is ADDITIVE over disjoint
document sets: per micro-batch we write (line_norm, doc_cnt) partials —
the number of ARRIVING docs containing each non-empty trimmed line —
partitioned by ``batch_id``; ``load_line_store`` folds the partials with
one sum, equal to batch ``line_census``'s ``count_distinct(doc_id)``
register-exactly (each doc lives in exactly one batch).

Boilerplate is a GLOBAL property — a banner only becomes boilerplate
once enough documents carry it — so cleaning is decoupled from
ingestion: ``clean_against_store`` answers "strip this corpus against
everything seen so far" at any point and equals batch ``line_dedup``
over all ingested docs (the parity the tests pin, including the case
where a line crosses the threshold only after a later batch).

Idempotency: the partial sink is partitioned by ``batch_id`` with
dynamic partition overwrite — a retried batch replaces its own leaf and
the fold is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _line_partials(
    batch_df: DataFrame, text_col: str, id_col: str, sep: str
) -> DataFrame:
    lines = batch_df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), sep)).alias("__line"),
    ).select("doc_id", F.trim(F.col("__line")).alias("line_norm"))
    return (
        lines.filter(F.col("line_norm") != "")
        .groupBy("line_norm")
        .agg(F.count_distinct("doc_id").alias("doc_cnt"))
    )


def make_line_store_processor(
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
):
    """``foreachBatch`` worker: append the arriving docs' (line_norm,
    doc_cnt) partials under the batch's partition."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            _line_partials(batch_df, text_col, id_col, sep)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_dir)
        )

    return process


def load_line_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Fold the per-batch partials: (line_norm, df) with df = total
    distinct documents ever seen containing the line."""
    return (
        spark.read.parquet(store_dir)
        .groupBy("line_norm")
        .agg(F.sum("doc_cnt").alias("df"))
    )


def clean_against_store(
    docs: DataFrame,
    store: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Strip store-boilerplate lines (df >= min_docs) plus empty lines
    from ``docs`` and reassemble — same output contract as batch
    ``line_dedup`` (every doc keeps a row); the strip/reassemble body is
    the shared :func:`..operators.dedup.strip_lines`."""
    from datalake_indexes_spark.operators.dedup import strip_lines

    boiler = store.filter(F.col("df") >= min_docs).select("line_norm")
    return strip_lines(docs, boiler, text_col=text_col, id_col=id_col, sep=sep)


def line_store_stream(
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
    process = make_line_store_processor(store_dir, **kwargs)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
