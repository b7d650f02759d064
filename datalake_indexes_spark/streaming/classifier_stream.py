"""Streaming Naive Bayes model maintenance — incremental training for the
hashed classifier (``operators/ml.py hashed_nb_classify``), following the
additive-partials pattern of ``chunk_stream.py`` / ``text_index_stream.py``.

Both halves of the NB model are ADDITIVE over disjoint document sets:
per micro-batch we write (cls, bucket, cnt) token partials and
(cls, n_docs) prior partials partitioned by ``batch_id``;
``load_nb_model`` folds each with one sum.  Because documents arrive
exactly once, the folded model equals the batch model trained on all
ingested documents register-exactly — so scoring any corpus through
``nb_classify_with_model`` against the folded tables equals batch
``hashed_nb_classify`` over the full ingest (the parity the tests pin).
This is the "model keeps learning while inference ships" lifecycle: the
classifier a curation pipeline trains continuously on labelled arrivals
and applies at any checkpoint without retraining from scratch.

Idempotency: both sinks are partitioned by ``batch_id`` with dynamic
partition overwrite — a crash-retried micro-batch replaces its own leaf
and the fold is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.ml import nb_class_docs, nb_token_counts


def make_nb_model_processor(
    model_dir: str,
    label_col: str = "lang",
    text_col: str = "text",
    n_buckets: int = 512,
):
    """``foreachBatch`` worker: append the arriving labelled docs'
    (cls, bucket, cnt) and (cls, n_docs) partials under the batch's
    partition."""
    tokens_path = os.path.join(model_dir, "tokens")
    classes_path = os.path.join(model_dir, "classes")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        for partial, path in (
            (
                nb_token_counts(
                    batch_df,
                    label_col=label_col,
                    text_col=text_col,
                    n_buckets=n_buckets,
                ),
                tokens_path,
            ),
            (nb_class_docs(batch_df, label_col=label_col), classes_path),
        ):
            (
                partial.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(path)
            )

    return process


def load_nb_model(
    spark: SparkSession, model_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Fold the per-batch partials into (token_counts, class_docs) —
    directly consumable by ``nb_classify_with_model``."""
    token_counts = (
        spark.read.parquet(os.path.join(model_dir, "tokens"))
        .groupBy("cls", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    class_docs = (
        spark.read.parquet(os.path.join(model_dir, "classes"))
        .groupBy("cls")
        .agg(F.sum("n_docs").alias("n_docs"))
    )
    return token_counts, class_docs


def nb_model_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    model_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Wire the processor to a parquet file stream of labelled documents."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_nb_model_processor(model_dir, **kwargs)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
