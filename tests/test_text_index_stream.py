"""Streaming text-index maintenance (streaming/text_index_stream.py):
stream == batch BM25 parity over additive partials, retry idempotency,
and a real availableNow file-stream run end to end."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.search import bm25_topk
from datalake_indexes_spark.streaming.text_index_stream import (
    bm25_topk_streamed,
    make_text_index_batch_processor,
    text_index_stream,
)

TERMS = ["spark", "join", "window"]


def _docs(spark):
    rows = [
        (1, "spark spark join window runs fast"),
        (2, "spark join window"),
        (3, "unrelated words entirely here now"),
        (4, "window window window spark"),
        (5, "join join spark"),
        (6, "more unrelated filler text rows"),
        (7, "spark"),
        (8, "join window join window spark spark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _norm(rows):
    return sorted((r["doc_id"], r["score"], r["rank"]) for r in rows)


def test_stream_matches_batch_bm25(spark):
    docs = _docs(spark)
    expected = _norm(bm25_topk(docs, TERMS, k=5).collect())
    work = tempfile.mkdtemp(prefix="tidxstream_")
    try:
        process = make_text_index_batch_processor(f"{work}/idx")
        process(docs.filter(F.col("doc_id") <= 3), 0)
        process(docs.filter((F.col("doc_id") > 3) & (F.col("doc_id") <= 6)), 1)
        process(docs.filter(F.col("doc_id") > 6), 2)
        got = _norm(bm25_topk_streamed(spark, f"{work}/idx", TERMS, k=5).collect())
        assert got == expected
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="tidxretry_")
    try:
        process = make_text_index_batch_processor(f"{work}/idx")
        process(docs.filter(F.col("doc_id") <= 4), 0)
        process(docs.filter(F.col("doc_id") > 4), 1)
        once = _norm(bm25_topk_streamed(spark, f"{work}/idx", TERMS, k=5).collect())
        process(docs.filter(F.col("doc_id") > 4), 1)  # speculative replay
        twice = _norm(bm25_topk_streamed(spark, f"{work}/idx", TERMS, k=5).collect())
        assert once == twice
        stats = spark.read.parquet(f"{work}/idx/stats")
        assert stats.count() == 2  # one partial per batch, not three
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_available_now_file_stream(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="tidxfiles_")
    try:
        docs.write.parquet(f"{work}/in")
        q = text_index_stream(
            spark,
            f"{work}/in",
            docs.schema,
            f"{work}/idx",
            f"{work}/ckpt",
        )
        q.awaitTermination(120)
        got = _norm(bm25_topk_streamed(spark, f"{work}/idx", TERMS, k=5).collect())
        expected = _norm(bm25_topk(docs, TERMS, k=5).collect())
        assert got == expected
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_stream_positions_match_batch_proximity(spark):
    # r7 verdict task #6: positional lifecycle parity — the stream
    # maintains the positions layer, and BOTH the streamed probe and
    # the batch indexed probe return exactly what the batch
    # proximity_topk computes over the union of all ingested batches.
    from datalake_indexes_spark.operators.search import (
        proximity_topk,
        proximity_topk_indexed,
    )
    from datalake_indexes_spark.streaming.text_index_stream import (
        proximity_topk_streamed,
    )

    docs = _docs(spark)
    expected = sorted(
        (r["doc_id"], r["min_span"], r["rank"])
        for r in proximity_topk(docs, TERMS, k=5).collect()
    )
    work = tempfile.mkdtemp(prefix="tidxpos_")
    try:
        process = make_text_index_batch_processor(f"{work}/idx", positional=True)
        process(docs.filter(F.col("doc_id") <= 3), 0)
        process(docs.filter((F.col("doc_id") > 3) & (F.col("doc_id") <= 6)), 1)
        process(docs.filter(F.col("doc_id") > 6), 2)
        streamed = sorted(
            (r["doc_id"], r["min_span"], r["rank"])
            for r in proximity_topk_streamed(spark, f"{work}/idx", TERMS, k=5).collect()
        )
        assert streamed == expected
        # the BATCH indexed probe works unchanged on the stream-built
        # index (partitioned reads ignore the batch_id layout)
        indexed = sorted(
            (r["doc_id"], r["min_span"], r["rank"])
            for r in proximity_topk_indexed(
                spark, f"{work}/idx", TERMS, k=5
            ).collect()
        )
        assert indexed == expected
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_positions_retry_idempotent(spark):
    from datalake_indexes_spark.streaming.text_index_stream import (
        proximity_topk_streamed,
    )

    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="tidxposretry_")
    try:
        process = make_text_index_batch_processor(f"{work}/idx", positional=True)
        process(docs.filter(F.col("doc_id") <= 4), 0)
        process(docs.filter(F.col("doc_id") > 4), 1)
        once = sorted(
            map(tuple, proximity_topk_streamed(spark, f"{work}/idx", TERMS).collect())
        )
        process(docs.filter(F.col("doc_id") > 4), 1)  # speculative replay
        twice = sorted(
            map(tuple, proximity_topk_streamed(spark, f"{work}/idx", TERMS).collect())
        )
        assert once == twice
        pos = spark.read.parquet(f"{work}/idx/positions")
        # one leaf set per batch — the replay replaced, not appended
        assert pos.select("doc_id").distinct().count() == 8
    finally:
        shutil.rmtree(work, ignore_errors=True)
