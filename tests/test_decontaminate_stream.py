"""Streaming span decontamination (streaming/decontaminate_stream.py):
stream output over any batch split == batch decontaminate_spans over
the union, retry idempotency, and a real availableNow file-stream run."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import decontaminate_spans
from datalake_indexes_spark.streaming.decontaminate_stream import (
    decontaminate_stream,
    load_cleaned,
    make_decontaminate_processor,
)

Q = "which benchmark question leaked verbatim into the training corpus today"


def _docs(spark):
    rows = [
        (1, "prefix words here " + Q + " suffix words tail"),
        (2, "a clean document with entirely original content in it ok"),
        (3, Q),
        (4, "another clean doc that shares nothing with the benchmark set"),
        (5, Q + " plus trailing context after the leak words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame([(0, Q)], "ref_id long, text string")


def _norm(rows):
    return sorted(
        (r["doc_id"], r["n_words_before"], r["n_words_removed"], r["text_cleaned"])
        for r in rows
    )


def test_stream_split_matches_batch(spark):
    docs, bench = _docs(spark), _bench(spark)
    work = tempfile.mkdtemp(prefix="decon_stream_")
    try:
        process = make_decontaminate_processor(bench, f"{work}/out")
        process(docs.filter(F.col("doc_id") <= 2), 0)
        process(docs.filter((F.col("doc_id") > 2) & (F.col("doc_id") <= 4)), 1)
        process(docs.filter(F.col("doc_id") > 4), 2)

        got = _norm(load_cleaned(spark, f"{work}/out").collect())
        want = _norm(decontaminate_spans(docs, bench).collect())
        assert got == want
        assert all(Q not in t for _, _b, _r, t in got)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    docs, bench = _docs(spark), _bench(spark)
    work = tempfile.mkdtemp(prefix="decon_retry_")
    try:
        process = make_decontaminate_processor(bench, f"{work}/out")
        process(docs.filter(F.col("doc_id") <= 3), 0)
        process(docs.filter(F.col("doc_id") > 3), 1)
        before = _norm(load_cleaned(spark, f"{work}/out").collect())
        process(docs.filter(F.col("doc_id") > 3), 1)  # crash-retry replay
        after = _norm(load_cleaned(spark, f"{work}/out").collect())
        assert before == after
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_available_now_file_stream(spark):
    docs, bench = _docs(spark), _bench(spark)
    work = tempfile.mkdtemp(prefix="decon_fs_")
    try:
        docs.write.parquet(f"{work}/in")
        q = decontaminate_stream(
            spark,
            f"{work}/in",
            docs.schema,
            bench,
            f"{work}/out",
            f"{work}/ckpt",
        )
        q.awaitTermination(120)
        got = _norm(load_cleaned(spark, f"{work}/out").collect())
        assert got == _norm(decontaminate_spans(docs, bench).collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_load_cleaned_before_any_write_is_empty(spark):
    """Only-empty-batches stream: the sink was never created; loading it
    is the batch twin's answer (an empty frame), not an exception."""
    work = tempfile.mkdtemp(prefix="decon_empty_")
    try:
        process = make_decontaminate_processor(_bench(spark), f"{work}/out")
        process(_docs(spark).limit(0), 0)  # empty batch -> early return
        out = load_cleaned(spark, f"{work}/out")
        assert out.count() == 0
        assert set(out.columns) == {
            "doc_id", "n_words_before", "n_words_removed", "text_cleaned"
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
