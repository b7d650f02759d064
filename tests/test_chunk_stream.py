"""Streaming chunk-frequency store (streaming/chunk_stream.py):
stream-folded df == batch df, cleaning parity with batch chunk_dedup,
retry idempotency, and a real availableNow file-stream run."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import chunk_dedup
from datalake_indexes_spark.streaming.chunk_stream import (
    chunk_store_stream,
    clean_against_store,
    load_chunk_store,
    make_chunk_store_processor,
)

BANNER = "all rights reserved inc"


def _docs(spark):
    rows = [
        (1, f"{BANNER} alpha beta gamma delta"),
        (2, f"{BANNER} epsilon zeta eta theta"),
        (3, "iota kappa lam mu nu xi omicron pi"),
        (4, f"rho sigma tau ups {BANNER}"),
        (5, BANNER),
        (6, "phi chi psi omega"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _norm(rows):
    return sorted(
        (r["doc_id"], r["text_clean"], r["kept_chunks"], r["dropped_chunks"])
        for r in rows
    )


def test_stream_store_and_cleaning_match_batch(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="chunkstream_")
    try:
        process = make_chunk_store_processor(f"{work}/store")
        process(docs.filter(F.col("doc_id") <= 2), 0)
        process(docs.filter((F.col("doc_id") > 2) & (F.col("doc_id") <= 4)), 1)
        process(docs.filter(F.col("doc_id") > 4), 2)

        store = load_chunk_store(spark, f"{work}/store")
        # folded store == batch count_distinct per chunk
        from datalake_indexes_spark.operators.dedup import doc_chunks

        batch_freq = (
            doc_chunks(docs)
            .groupBy("chunk")
            .agg(F.count_distinct("doc_id").alias("df"))
        )
        assert sorted((r["chunk"], r["df"]) for r in store.collect()) == sorted(
            (r["chunk"], r["df"]) for r in batch_freq.collect()
        )

        got = _norm(clean_against_store(docs, store).collect())
        want = _norm(chunk_dedup(docs).collect())
        assert got == want
        assert all(BANNER not in t for _, t, _k, _d in got)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="chunkretry_")
    try:
        process = make_chunk_store_processor(f"{work}/store")
        process(docs.filter(F.col("doc_id") <= 3), 0)
        process(docs.filter(F.col("doc_id") > 3), 1)
        before = sorted(
            (r["chunk"], r["df"])
            for r in load_chunk_store(spark, f"{work}/store").collect()
        )
        process(docs.filter(F.col("doc_id") > 3), 1)  # crash-retry replay
        after = sorted(
            (r["chunk"], r["df"])
            for r in load_chunk_store(spark, f"{work}/store").collect()
        )
        assert before == after
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_available_now_file_stream(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="chunkfs_")
    try:
        docs.write.parquet(f"{work}/in")
        q = chunk_store_stream(
            spark,
            f"{work}/in",
            docs.schema,
            f"{work}/store",
            f"{work}/ckpt",
        )
        q.awaitTermination(120)
        got = _norm(
            clean_against_store(docs, load_chunk_store(spark, f"{work}/store")).collect()
        )
        assert got == _norm(chunk_dedup(docs).collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)
