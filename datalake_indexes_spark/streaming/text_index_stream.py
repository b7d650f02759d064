"""Streaming inverted-text-index maintenance — the ingest-time half of the
keyword-search story (live counterpart of ``operators/search.build_text_index``).

Per micro-batch the arriving documents contribute three ADDITIVE deltas:

- ``postings``  (term, doc_id, tf, dl)   — per-batch leaf, term-sorted,
- ``df``        (term, df)               — per-batch partial document counts,
- ``stats``     (n, sum_dl)              — per-batch corpus partials,
- ``positions`` (term, doc_id, positions) — per-batch leaf (opt-in via
  ``positional=True``, mirroring the batch builder) for phrase/proximity
  probes on the live corpus.

Document frequency and corpus statistics are sums over batch partials, so
the index never rewrites history: query time folds the tiny ``df``/``stats``
partials (one aggregate over batches × distinct-query-terms rows) and
probes the postings leaves with the same IN-list pushdown as the batch
index.  :func:`bm25_topk_streamed` therefore returns EXACTLY what
``bm25_topk`` computes over the union of all ingested batches — parity is
pinned by ``tests/test_text_index_stream.py``.

Contract: each document id arrives in exactly one batch (the ingest
stream; exact re-crawls are the upstream dedup stream's job).  Additivity
breaks if the same doc_id lands in two DIFFERENT batches — df would count
it twice, matching what the batch build over the duplicated corpus would
also do.

Idempotency: every artifact is partitioned by ``batch_id`` and written
with dynamic partition overwrite — a retried batch replaces its own
leaves and partials, changing nothing."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def make_text_index_batch_processor(
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    positional: bool = False,
):
    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        words = F.split(F.col(text_col), " ")
        base = batch_df.select(
            F.col(id_col).alias("doc_id"),
            words.alias("__w"),
            F.size(words).cast("double").alias("dl"),
        )
        tf = (
            base.select("doc_id", "dl", F.explode("__w").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"), F.first("dl").alias("dl"))
            .persist()
        )
        try:
            (
                tf.sortWithinPartitions("term")
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(os.path.join(index_dir, "postings"))
            )
            (
                tf.groupBy("term")
                .agg(F.count(F.lit(1)).cast("double").alias("df"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(os.path.join(index_dir, "df"))
            )
            (
                base.agg(
                    F.count(F.lit(1)).cast("double").alias("n"),
                    F.sum("dl").alias("sum_dl"),
                )
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(os.path.join(index_dir, "stats"))
            )
            if positional:
                # positional layer (same lifecycle as the batch
                # build_text_index(positional=True)): a doc's position
                # lists are FINAL in its arrival batch — docs arrive
                # exactly once, so the union of batch leaves IS the
                # batch-built positions table, and the batch proximity
                # probe works on a stream-built index unchanged
                # (partitioned reads ignore batch_id).
                pos = (
                    batch_df.select(
                        F.col(id_col).alias("doc_id"),
                        F.posexplode(F.split(F.col(text_col), " ")).alias(
                            "pos", "term"
                        ),
                    )
                    .groupBy("doc_id", "term")
                    .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
                )
                (
                    pos.sortWithinPartitions("term")
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(os.path.join(index_dir, "positions"))
                )
        finally:
            tf.unpersist()

    return process


def proximity_topk_streamed(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int = 10,
) -> DataFrame:
    """MinCover proximity over everything ingested so far — identical
    results to the batch :func:`operators.search.proximity_topk` over
    the union of all ingested batches (parity pinned in
    ``tests/test_text_index_stream.py``).  Positions are per-(doc,
    term) facts finalized at arrival, so unlike df/stats there are no
    partials to fold: this simply probes the accumulated leaves via
    the batch :func:`operators.search.proximity_topk_indexed`."""
    from datalake_indexes_spark.operators.search import proximity_topk_indexed

    if not os.path.isdir(os.path.join(index_dir, "positions")):
        raise ValueError(
            f"no positions layer under {index_dir!r}: the stream must be "
            "built with make_text_index_batch_processor(..., positional=True)"
        )
    return proximity_topk_indexed(spark, index_dir, query_terms, k=k)


def bm25_topk_streamed(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 over everything ingested so far: fold the additive partials,
    probe the postings leaves — identical results to the batch
    :func:`operators.search.bm25_topk` over the same documents."""
    from datalake_indexes_spark.operators.search import _bm25_rank

    terms = sorted(set(query_terms))
    postings = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .filter(F.col("term").isin(terms))
        .select(
            "doc_id",
            F.col("term").alias("__term"),
            F.col("tf").alias("__tf"),
            F.col("dl").alias("__dl"),
        )
    )
    df_ = (
        spark.read.parquet(os.path.join(index_dir, "df"))
        .filter(F.col("term").isin(terms))
        .groupBy(F.col("term").alias("__term"))
        .agg(F.sum("df").alias("__df"))
    )
    stats = spark.read.parquet(os.path.join(index_dir, "stats")).agg(
        F.sum("n").alias("__n"),
        (F.sum("sum_dl") / F.sum("n")).alias("__avgdl"),
    )
    return _bm25_rank(postings, df_, stats, k=k, k1=k1, b=b)


def text_index_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    index_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Wire the processor to a parquet file stream of documents."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_text_index_batch_processor(index_dir, **kwargs)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
