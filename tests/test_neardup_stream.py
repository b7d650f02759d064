"""Streaming MinHash+LSH near-dup (streaming/neardup_stream.py): stream ==
batch twin, cross-batch detection against the persisted store, retry
idempotency."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.streaming.neardup_stream import (
    make_neardup_batch_processor,
    neardup_pairs_est,
)


def _corpus(spark):
    """12 docs: three near-dup families (shared long prefix, small tail
    edits) + unrelated fillers."""
    base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    rows = []
    for i in range(4):
        rows.append((i, base + f" tail{i % 2}"))          # family A
    for i in range(4, 7):
        rows.append((i, "completely different text number %d with its own words entirely" % i))
    for i in range(7, 10):
        rows.append((i, base.replace("fox", "cat") + " tail9"))  # family B
    rows.append((10, "yet another unrelated document about spark physical plans"))
    rows.append((11, base + " tail0"))                    # late copy of family A
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_matches_batch_twin(spark):
    docs = _corpus(spark)
    batch_pairs = {
        (r["doc_id_1"], r["doc_id_2"], r["est_jaccard"])
        for r in neardup_pairs_est(docs, threshold=0.5).collect()
    }
    assert batch_pairs  # fixture actually produces near-dups

    work = tempfile.mkdtemp(prefix="neardup_")
    try:
        process = make_neardup_batch_processor(
            f"{work}/store", f"{work}/out", threshold=0.5
        )
        process(docs.filter(F.col("doc_id") < 6), 0)
        process(docs.filter((F.col("doc_id") >= 6) & (F.col("doc_id") < 10)), 1)
        process(docs.filter(F.col("doc_id") >= 10), 2)
        out = spark.read.parquet(f"{work}/out")
        stream_pairs = {
            (min(r["doc_id"], r["dup_of"]), max(r["doc_id"], r["dup_of"]), r["est_jaccard"])
            for r in out.collect()
        }
        assert stream_pairs == batch_pairs
        # the late copy (11) was flagged against docs from TWO batches ago
        assert any(a == 0 or b == 11 for a, b, _ in stream_pairs)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    docs = _corpus(spark)
    work = tempfile.mkdtemp(prefix="neardupretry_")
    try:
        process = make_neardup_batch_processor(
            f"{work}/store", f"{work}/out", threshold=0.5
        )
        process(docs.filter(F.col("doc_id") < 6), 0)
        process(docs.filter(F.col("doc_id") >= 6), 1)
        once = sorted(
            map(tuple, spark.read.parquet(f"{work}/out").collect())
        )
        process(docs.filter(F.col("doc_id") >= 6), 1)  # retry replays batch 1
        twice = sorted(
            map(tuple, spark.read.parquet(f"{work}/out").collect())
        )
        assert once == twice
        bands = spark.read.parquet(f"{work}/store/bands")
        assert bands.count() == bands.distinct().count()  # no duplicated store rows
    finally:
        shutil.rmtree(work, ignore_errors=True)
